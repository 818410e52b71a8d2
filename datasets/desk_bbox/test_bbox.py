"""ToyDesk bbox sanity viewer (reference datasets/desk_bbox/test_bbox.py:6-30).

The reference pops an open3d window per labeled box over the desk mesh;
here the same check writes ONE interactive standalone HTML viewer (all
boxes + id labels + the mesh/point cloud if provided) — open it in any
browser, no dependencies.

    python datasets/desk_bbox/test_bbox.py [desk=desk1] [mesh=model.ply] \
        [out=desk_bbox_vis.html]
"""

import json
import os
import sys

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
)


def _quat_to_rot(q):
    x, y, z, w = [float(v) for v in q]
    n = (x * x + y * y + z * z + w * w) ** 0.5 or 1.0
    x, y, z, w = x / n, y / n, z / n, w / n
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
            [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
            [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
        ]
    )


def main(argv):
    from object_nerf_tpu.tools.visualize import SceneVisualizer
    from object_nerf_tpu.data.ply_io import read_ply

    opts = dict(a.split("=", 1) for a in argv if "=" in a)
    desk = opts.get("desk", "desk1")
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, desk, "bbox.json")) as f:
        labels = json.load(f)["labels"]
    print(f"{len(labels)} labels in {desk}/bbox.json")

    vis = SceneVisualizer()
    mesh_f = opts.get("mesh")
    if mesh_f:
        m = read_ply(mesh_f)
        if m.get("faces") is not None:
            vis.add_mesh(m["points"], m["faces"], colors=m.get("colors"))
        else:
            vis.add_points(m["points"], colors=m.get("colors"))

    for l in labels:
        if "position" not in l["data"]:
            continue
        pos = np.asarray(l["data"]["position"], float)
        rmat = _quat_to_rot(l["data"]["quaternion"])
        scale = np.asarray(l["data"]["scale"], float)
        T = np.eye(4)
        T[:3, :3] = rmat
        T[:3, 3] = pos
        vis.add_bbox(
            np.stack([-scale / 2, scale / 2]), transform=T, color=(1, 0.3, 0.2)
        )
        vis.add_label(pos, f"obj {l['id']}")
        print(l["id"], pos.tolist())

    out = opts.get("out", f"desk_bbox_{desk}.html")
    vis.save(out)
    print(f"wrote {out}")


if __name__ == "__main__":
    main(sys.argv[1:])
