"""PyTorch (Lightning) checkpoint → JAX param pytree converter.

The reference saves Lightning checkpoints whose `state_dict` keys look like
(train.py:239, models/nerf_model.py:48-95, models/code_library.py:13):

    nerf_coarse.xyz_encoding_1.0.weight        # Sequential(Linear, act) → .0
    nerf_coarse.xyz_encoding_final.weight
    nerf_coarse.sigma.weight
    nerf_coarse.dir_encoding.0.weight
    nerf_coarse.rgb.0.weight                   # Sequential(Linear, Sigmoid)
    nerf_coarse.instance_encoding_1.0.weight
    nerf_coarse.instance_encoding_final.0.weight
    nerf_coarse.instance_sigma.weight
    nerf_coarse.inst_dir_encoding.0.weight
    nerf_coarse.inst_rgb.0.weight
    nerf_fine.*                                 (same layout)
    code_library.embedding_instance.weight
    embedding_xyz.embedding_space_ftr.weight    (voxel feature table)
    embedding_xyz.voxel_*                       (voxel grid buffers)

torch Linear stores weight as (out, in); our pytree stores (in, out), so
every weight is transposed. Works on raw state dicts (numpy or torch
tensors) and on full Lightning ckpt files via `load_torch_ckpt`.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np
import jax.numpy as jnp


def _to_np(v) -> np.ndarray:
    if isinstance(v, np.ndarray):
        return v
    # torch tensor (cpu) — avoid importing torch unless needed
    return v.detach().cpu().numpy()


def _linear(sd: Mapping[str, Any], prefix: str) -> Dict[str, jnp.ndarray]:
    w = _to_np(sd[f"{prefix}.weight"]).astype(np.float32)
    b = _to_np(sd[f"{prefix}.bias"]).astype(np.float32)
    return {"w": jnp.asarray(w.T), "b": jnp.asarray(b)}


def convert_object_nerf(sd: Mapping[str, Any], prefix: str, inst_D: int, D: int):
    """One ObjectNeRF module (e.g. prefix='nerf_coarse') → our MLP pytree."""
    scene = {
        "trunk": [_linear(sd, f"{prefix}.xyz_encoding_{i + 1}.0") for i in range(D)],
        "final": _linear(sd, f"{prefix}.xyz_encoding_final"),
        "sigma": _linear(sd, f"{prefix}.sigma"),
        "dir": _linear(sd, f"{prefix}.dir_encoding.0"),
        "rgb": _linear(sd, f"{prefix}.rgb.0"),
    }
    obj = {
        "trunk": [
            _linear(sd, f"{prefix}.instance_encoding_{i + 1}.0") for i in range(inst_D)
        ],
        "final": _linear(sd, f"{prefix}.instance_encoding_final.0"),
        "sigma": _linear(sd, f"{prefix}.instance_sigma"),
        "dir": _linear(sd, f"{prefix}.inst_dir_encoding.0"),
        "rgb": _linear(sd, f"{prefix}.inst_rgb.0"),
    }
    return {"scene": scene, "object": obj}


def convert_state_dict(sd: Mapping[str, Any], model_cfg) -> Dict[str, Any]:
    """Full reference state dict → our param pytree.

    model_cfg: the `model:` config block (D, inst_D, N_importance, ...).
    Voxel buffers, if present, are returned under "voxel" for the voxel-grid
    loader to consume.
    """
    D, inst_D = int(model_cfg["D"]), int(model_cfg["inst_D"])
    params: Dict[str, Any] = {
        "coarse": convert_object_nerf(sd, "nerf_coarse", inst_D, D)
    }
    if any(k.startswith("nerf_fine.") for k in sd):
        params["fine"] = convert_object_nerf(sd, "nerf_fine", inst_D, D)
    if "code_library.embedding_instance.weight" in sd:
        params["code_library"] = jnp.asarray(
            _to_np(sd["code_library.embedding_instance.weight"]).astype(np.float32)
        )
    if "embedding_xyz.embedding_space_ftr.weight" in sd:
        voxel = {
            "features": jnp.asarray(
                _to_np(sd["embedding_xyz.embedding_space_ftr.weight"]).astype(
                    np.float32
                )
            )
        }
        for name in (
            "voxel_size",
            "bounds",
            "voxel_offset",
            "voxel_shape",
            "voxel_occupancy",
            "voxel_idx_map",
        ):
            k = f"embedding_xyz.{name}"
            if k in sd:
                voxel[name] = jnp.asarray(_to_np(sd[k]))
        params["voxel"] = voxel
    return params


def load_torch_ckpt(path: str, model_cfg, prefixes_to_ignore=("loss",)):
    """Load a Lightning .ckpt file and convert (utils/__init__.py:85-100)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt)
    sd = {
        k: v
        for k, v in sd.items()
        if not any(k.startswith(p) for p in prefixes_to_ignore)
    }
    return convert_state_dict(sd, model_cfg)
