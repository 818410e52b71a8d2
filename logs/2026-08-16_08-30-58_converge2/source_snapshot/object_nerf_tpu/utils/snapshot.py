"""Run provenance: copy the source tree into the log dir.

Parity with the reference's `make_source_code_snapshot`
(utils/util.py:65-87, invoked at train start, train.py:270) — every run
carries the exact code that produced it.
"""

from __future__ import annotations

import shutil
from pathlib import Path

_EXCLUDE = ("logs", "data", "debug", ".git", "__pycache__", ".pytest_cache",
            ".claude")


def make_source_code_snapshot(log_dir, repo_root=None) -> Path:
    root = Path(repo_root) if repo_root else Path(__file__).resolve().parents[2]
    dest = Path(log_dir) / "source_snapshot"

    def ignore(directory, names):
        return [n for n in names if n in _EXCLUDE or n.endswith(".npz")]

    shutil.copytree(root, dest, ignore=ignore, dirs_exist_ok=True)
    return dest
