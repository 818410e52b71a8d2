"""Two-branch ObjectNeRF MLP as pure JAX functions over a param pytree.

Feature/behavior parity with the reference `ObjectNeRF` module
(models/nerf_model.py:6-152):

* Scene branch: D layers of width W with LeakyReLU(0.01) and a skip
  (input re-concatenated *before* the layer indices in `skips`), a sigma
  head `Linear(W, 1)` straight off the trunk, a no-activation
  `xyz_encoding_final Linear(W, W)`, a view-direction head
  `LeakyReLU(Linear(W + C_dir, W//2))` and `sigmoid(Linear(W//2, 3))` rgb.
* Object branch: same topology with inst_D/inst_W/inst_skips; its input is
  `concat([emb_xyz, obj_voxel?, obj_code])` (nerf_model.py:128-132).

Design differences from the reference (TPU-first, not a port):

* Parameters are a plain nested dict of `(in, out)` weight matrices — apply
  is `x @ W + b`, which XLA tiles straight onto the MXU. No modules, no
  state; `jax.grad` and `pjit` see one flat pytree.
* An optional `compute_dtype` (bfloat16) casts activations for the matmul
  while accumulating in float32 via `preferred_element_type`.
* Both branches evaluate over the flattened (rays×samples, C) axis in one
  shot; chunking is the renderer's concern, not the model's.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp

from .embedding import freq_encode_channels

Params = Dict[str, Any]

LEAKY_SLOPE = 0.01  # torch.nn.LeakyReLU default, used throughout the reference


@dataclasses.dataclass(frozen=True)
class ObjectNeRFConfig:
    """Static architecture config (hashable → usable as a jit static arg).

    Field names mirror the reference `model:` config block
    (config/default_conf.yml:8-36) so `from_config` is a direct mapping.
    """

    D: int = 8
    W: int = 256
    skips: tuple = (4,)
    inst_D: int = 4
    inst_W: int = 128
    inst_skips: tuple = (2,)
    N_freq_xyz: int = 10
    N_freq_dir: int = 4
    N_freq_voxel: int = 6
    N_scn_voxel_size: int = 16
    N_obj_voxel_size: int = 8
    N_obj_code_length: int = 64
    use_voxel_embedding: bool = True
    compute_dtype: Any = jnp.float32

    @classmethod
    def from_config(cls, model_cfg, compute_dtype=jnp.float32) -> "ObjectNeRFConfig":
        return cls(
            D=int(model_cfg["D"]),
            W=int(model_cfg["W"]),
            skips=tuple(model_cfg["skips"]),
            inst_D=int(model_cfg["inst_D"]),
            inst_W=int(model_cfg["inst_W"]),
            inst_skips=tuple(model_cfg["inst_skips"]),
            N_freq_xyz=int(model_cfg["N_freq_xyz"]),
            N_freq_dir=int(model_cfg["N_freq_dir"]),
            N_freq_voxel=int(model_cfg["N_freq_voxel"]),
            N_scn_voxel_size=int(model_cfg.get("N_scn_voxel_size", 0)),
            N_obj_voxel_size=int(model_cfg.get("N_obj_voxel_size", 0)),
            N_obj_code_length=int(model_cfg["N_obj_code_length"]),
            use_voxel_embedding=bool(model_cfg.get("use_voxel_embedding", True)),
            compute_dtype=compute_dtype,
        )

    # -- derived channel counts (nerf_model.py:24-36,60-72) -----------------
    @property
    def scn_voxel_emb_size(self) -> int:
        if not self.use_voxel_embedding:
            return 0
        return freq_encode_channels(self.N_scn_voxel_size, self.N_freq_voxel)

    @property
    def obj_voxel_emb_size(self) -> int:
        if not self.use_voxel_embedding:
            return 0
        return freq_encode_channels(self.N_obj_voxel_size, self.N_freq_voxel)

    @property
    def xyz_pe_size(self) -> int:
        return freq_encode_channels(3, self.N_freq_xyz)

    @property
    def in_channels_xyz(self) -> int:
        return self.xyz_pe_size + self.scn_voxel_emb_size

    @property
    def in_channels_dir(self) -> int:
        return freq_encode_channels(3, self.N_freq_dir)

    @property
    def inst_channel_in(self) -> int:
        return self.in_channels_xyz + self.N_obj_code_length + self.obj_voxel_emb_size


# ---------------------------------------------------------------------------
# Initialization
# ---------------------------------------------------------------------------


def _init_linear(key, fan_in: int, fan_out: int) -> Params:
    """U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for both W and b.

    Matches torch.nn.Linear's default (kaiming_uniform(a=√5) reduces to this
    bound), keeping init statistics comparable with the reference.
    """
    kw, kb = jax.random.split(key)
    bound = 1.0 / (fan_in**0.5)
    return {
        "w": jax.random.uniform(kw, (fan_in, fan_out), jnp.float32, -bound, bound),
        "b": jax.random.uniform(kb, (fan_out,), jnp.float32, -bound, bound),
    }


def _init_trunk(key, depth: int, width: int, c_in: int, skips: Sequence[int]):
    layers = []
    keys = jax.random.split(key, depth)
    for i in range(depth):
        if i == 0:
            fan_in = c_in
        elif i in skips:
            fan_in = width + c_in
        else:
            fan_in = width
        layers.append(_init_linear(keys[i], fan_in, width))
    return layers


def init_object_nerf(key, cfg: ObjectNeRFConfig) -> Params:
    """Initialize both branches; returns {"scene": ..., "object": ...}."""
    ks = jax.random.split(key, 10)
    scene = {
        "trunk": _init_trunk(ks[0], cfg.D, cfg.W, cfg.in_channels_xyz, cfg.skips),
        "final": _init_linear(ks[1], cfg.W, cfg.W),
        "sigma": _init_linear(ks[2], cfg.W, 1),
        "dir": _init_linear(ks[3], cfg.W + cfg.in_channels_dir, cfg.W // 2),
        "rgb": _init_linear(ks[4], cfg.W // 2, 3),
    }
    obj = {
        "trunk": _init_trunk(
            ks[5], cfg.inst_D, cfg.inst_W, cfg.inst_channel_in, cfg.inst_skips
        ),
        "final": _init_linear(ks[6], cfg.inst_W, cfg.inst_W),
        "sigma": _init_linear(ks[7], cfg.inst_W, 1),
        "dir": _init_linear(ks[8], cfg.inst_W + cfg.in_channels_dir, cfg.inst_W // 2),
        "rgb": _init_linear(ks[9], cfg.inst_W // 2, 3),
    }
    return {"scene": scene, "object": obj}


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _linear(p: Params, x: jnp.ndarray, dtype) -> jnp.ndarray:
    """x @ W + b with f32 accumulation regardless of compute dtype."""
    y = jnp.dot(
        x.astype(dtype), p["w"].astype(dtype), preferred_element_type=jnp.float32
    )
    return y + p["b"]


def _leaky_relu(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(x >= 0, x, LEAKY_SLOPE * x)


def _run_branch(
    branch: Params,
    input_x: jnp.ndarray,
    emb_dir: jnp.ndarray | None,
    skips: Sequence[int],
    dtype,
    sigma_only: bool,
):
    """Shared trunk/heads topology for both branches (nerf_model.py:97-152)."""
    x = input_x
    for i, layer in enumerate(branch["trunk"]):
        if i in skips:
            x = jnp.concatenate([input_x, x], axis=-1)
        x = _leaky_relu(_linear(layer, x, dtype))
    sigma = _linear(branch["sigma"], x, dtype)[..., 0]
    if sigma_only:
        return sigma, None
    x_final = _linear(branch["final"], x, dtype)
    d_in = jnp.concatenate([x_final, emb_dir], axis=-1)
    d_enc = _leaky_relu(_linear(branch["dir"], d_in, dtype))
    rgb = jax.nn.sigmoid(_linear(branch["rgb"], d_enc, dtype))
    return sigma, rgb


def scene_forward(
    params: Params,
    cfg: ObjectNeRFConfig,
    emb_xyz: jnp.ndarray,
    emb_dir: jnp.ndarray | None = None,
    sigma_only: bool = False,
):
    """Scene branch. emb_xyz: (N, in_channels_xyz); emb_dir: (N, in_channels_dir).

    Returns (sigma (N,), rgb (N,3) or None).
    """
    return _run_branch(
        params["scene"], emb_xyz, emb_dir, cfg.skips, cfg.compute_dtype, sigma_only
    )


def instance_forward(
    params: Params,
    cfg: ObjectNeRFConfig,
    emb_xyz: jnp.ndarray,
    obj_code: jnp.ndarray,
    obj_voxel: jnp.ndarray | None = None,
    emb_dir: jnp.ndarray | None = None,
    sigma_only: bool = False,
):
    """Object branch; input = [emb_xyz, obj_voxel?, obj_code] (nerf_model.py:128-132)."""
    if cfg.use_voxel_embedding:
        if obj_voxel is None:
            raise ValueError("obj_voxel required when use_voxel_embedding")
        input_x = jnp.concatenate([emb_xyz, obj_voxel, obj_code], axis=-1)
    else:
        input_x = jnp.concatenate([emb_xyz, obj_code], axis=-1)
    return _run_branch(
        params["object"], input_x, emb_dir, cfg.inst_skips, cfg.compute_dtype, sigma_only
    )
