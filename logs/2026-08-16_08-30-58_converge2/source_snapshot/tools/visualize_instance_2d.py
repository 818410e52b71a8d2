"""Instance-mask inspector CLI (reference tools/visualize_instance_2d.py).

    python tools/visualize_instance_2d.py path/to/123.instance-filt.png

Prints the instance ids present (with pixel counts) and writes a labeled
color overlay next to the input (non-interactive replacement for the
reference's on-click id picker).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv):
    from object_nerf_tpu.tools.visualize import visualize_instance_2d

    if not argv:
        raise SystemExit("usage: visualize_instance_2d.py <instance.png> [out.png]")
    out, ids = visualize_instance_2d(argv[0], argv[1] if len(argv) > 1 else None)
    print(f"wrote {out}")


if __name__ == "__main__":
    main(sys.argv[1:])
