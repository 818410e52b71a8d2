"""Checkpoint save/load + config snapshots.

The reference relies on Lightning's ModelCheckpoint (train.py:241-251) and
re-reads the training config snapshot `run_config_snapshot.yaml` at edit
time (editable_renderer.py:32-40). Here:

* checkpoints are Orbax (param pytree + optimizer state + step + the voxel
  topology buffers — structural state that prune/subdivide mutate);
* `run_config_snapshot.yaml` is written next to the checkpoints with the
  exact reference filename so edit-time config recovery works identically;
* `load_any_checkpoint` also accepts the reference's PyTorch Lightning
  `.ckpt` files (via train/torch_convert.py), so released object_nerf
  checkpoints drop straight into this framework.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import numpy as np

SNAPSHOT_NAME = "run_config_snapshot.yaml"


def save_config_snapshot(log_dir, config) -> None:
    Path(log_dir).mkdir(parents=True, exist_ok=True)
    config.save(Path(log_dir) / SNAPSHOT_NAME)


def save_checkpoint(ckpt_dir, state, voxel_topo=None, voxel_static=None,
                    step: Optional[int] = None, name: Optional[str] = None):
    """Save TrainState (+ voxel topology & shape metadata) with Orbax.

    `name` overrides the default `step_{step}` directory name — the train
    CLI uses it for the reference's per-epoch (`epoch_{n}`) and `last`
    checkpoint files (reference train.py:241-251: every epoch +
    save_last)."""
    import orbax.checkpoint as ocp

    ckpt_dir = Path(ckpt_dir).absolute()
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    payload = {
        "params": jax.device_get(state.params),
        "opt_state": jax.device_get(state.opt_state),
        "step": int(state.step),
    }
    if voxel_topo is not None:
        payload["voxel_topo"] = jax.device_get(voxel_topo._asdict())
    if voxel_static is not None:
        payload["voxel_static"] = {
            "shape": np.asarray(voxel_static.shape, np.int32),
            "channels": voxel_static.channels,
            "n_freq_voxel": voxel_static.n_freq_voxel,
            "n_max_voxels": voxel_static.n_max_voxels,
        }
    step = step if step is not None else int(state.step)
    name = name if name is not None else f"step_{step}"
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(ckpt_dir / name, payload, force=True)
    return ckpt_dir / name


def load_checkpoint(path) -> Dict[str, Any]:
    import orbax.checkpoint as ocp

    with ocp.PyTreeCheckpointer() as ckptr:
        return ckptr.restore(Path(path).absolute())


def latest_checkpoint(ckpt_dir) -> Optional[Path]:
    ckpt_dir = Path(ckpt_dir)
    if not ckpt_dir.exists():
        return None
    steps = sorted(
        (int(p.name.split("_")[1]), p)
        for p in ckpt_dir.glob("step_*")
        if p.name.split("_")[1].isdigit()
    )
    return steps[-1][1] if steps else None


def load_any_checkpoint(path, model_cfg) -> Dict[str, Any]:
    """Load params from either our Orbax ckpt or a reference .ckpt file.

    Returns {"params": ..., "voxel_topo": ...|None, "step": int}.
    """
    path = str(path)
    if path.endswith(".ckpt") or path.endswith(".pt") or path.endswith(".pth"):
        from .torch_convert import load_torch_ckpt

        params = load_torch_ckpt(path, model_cfg)
        voxel = params.pop("voxel", None)
        return {"params": params, "voxel_torch": voxel, "step": 0}
    restored = load_checkpoint(path)
    return {
        "params": restored["params"],
        "opt_state": restored.get("opt_state"),
        "voxel_topo": restored.get("voxel_topo"),
        "voxel_static": restored.get("voxel_static"),
        "step": restored.get("step", 0),
    }
