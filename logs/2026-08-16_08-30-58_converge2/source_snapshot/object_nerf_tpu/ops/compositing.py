"""Alpha compositing (volume rendering quadrature).

Behavioral parity with the reference `inference_model` compositing block
(models/rendering.py:140-229):

* deltas from consecutive z values; last delta is 1e10 ("infinite") for the
  scene pass in training, or 0 in the multi-object edit path and always 0
  for the instance pass (rendering.py:143-153).
* alpha = 1 - exp(-delta * relu(sigma + noise)), noise ~ N(0, noise_std²).
* transmittance via exclusive cumprod of (1 - alpha + 1e-10).
* rgb/depth/opacity maps as weighted sums; optional white background for the
  scene, *always* white background for the instance map (rendering.py:223).
* instance occlusion suppression: during training, instance alphas at depths
  beyond (scene depth + frustum_bound_th) are zeroed unless the ray is in
  the pass-through mask (rendering.py:192-202).

All functions are pure, static-shape, and take explicit PRNG keys.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

T_EPS = 1e-10  # transmittance epsilon (rendering.py:160)
DELTA_INF = 1e10  # "infinite" last delta (rendering.py:144)


class CompositeOut(NamedTuple):
    weights: jnp.ndarray  # (N_rays, N_samples)
    opacity: jnp.ndarray  # (N_rays,)
    rgb: jnp.ndarray  # (N_rays, 3)
    depth: jnp.ndarray  # (N_rays,)


def compute_deltas(z_vals: jnp.ndarray, last_delta_inf: bool) -> jnp.ndarray:
    d = z_vals[:, 1:] - z_vals[:, :-1]
    last = jnp.full_like(d[:, :1], DELTA_INF if last_delta_inf else 0.0)
    return jnp.concatenate([d, last], axis=-1)


def alphas_from_sigmas(
    sigmas: jnp.ndarray,
    deltas: jnp.ndarray,
    key=None,
    noise_std: float = 0.0,
) -> jnp.ndarray:
    if noise_std > 0.0 and key is not None:
        sigmas = sigmas + jax.random.normal(key, sigmas.shape, sigmas.dtype) * noise_std
    return 1.0 - jnp.exp(-deltas * jax.nn.relu(sigmas))


def weights_from_alphas(alphas: jnp.ndarray) -> jnp.ndarray:
    """w_i = a_i * prod_{j<i} (1 - a_j + eps)   (exclusive transmittance)."""
    trans = jnp.cumprod(1.0 - alphas + T_EPS, axis=-1)
    trans = jnp.concatenate([jnp.ones_like(trans[:, :1]), trans[:, :-1]], axis=-1)
    return alphas * trans


def composite(
    sigmas: jnp.ndarray,
    rgbs: jnp.ndarray,
    z_vals: jnp.ndarray,
    key=None,
    noise_std: float = 0.0,
    last_delta_inf: bool = True,
    white_back: bool = False,
) -> CompositeOut:
    """Scene-branch compositing. sigmas (N,S), rgbs (N,S,3), z_vals (N,S)."""
    deltas = compute_deltas(z_vals, last_delta_inf)
    alphas = alphas_from_sigmas(sigmas, deltas, key, noise_std)
    weights = weights_from_alphas(alphas)
    opacity = jnp.sum(weights, axis=-1)
    rgb = jnp.sum(weights[..., None] * rgbs, axis=-2)
    depth = jnp.sum(weights * z_vals, axis=-1)
    if white_back:
        rgb = rgb + (1.0 - opacity[..., None])
    return CompositeOut(weights, opacity, rgb, depth)


def composite_instance(
    inst_sigmas: jnp.ndarray,
    inst_rgbs: jnp.ndarray,
    z_vals: jnp.ndarray,
    scene_depth: jnp.ndarray,
    key=None,
    noise_std: float = 0.0,
    frustum_bound_th: float = 0.0,
    pass_through_mask: jnp.ndarray | None = None,
    apply_occlusion: bool = True,
) -> CompositeOut:
    """Instance-branch compositing with occlusion-aware alpha suppression.

    Last delta is always zero for the instance pass (rendering.py:146-148);
    the instance rgb map is always white-backed (rendering.py:221-223).
    pass_through_mask: (N_rays,) or (N_rays,1) bool — rays whose instance
    alphas are never suppressed.
    """
    deltas = compute_deltas(z_vals, last_delta_inf=False)
    alphas = alphas_from_sigmas(inst_sigmas, deltas, key, noise_std)

    if apply_occlusion and frustum_bound_th > 0:
        occluded = (scene_depth[:, None] + frustum_bound_th) < z_vals
        if pass_through_mask is not None:
            pt = pass_through_mask.reshape(-1, 1).astype(bool)
            occluded = jnp.logical_and(occluded, jnp.logical_not(pt))
        alphas = jnp.where(occluded, 0.0, alphas)

    weights = weights_from_alphas(alphas)
    opacity = jnp.sum(weights, axis=-1)
    rgb = jnp.sum(weights[..., None] * inst_rgbs, axis=-2)
    depth = jnp.sum(weights * z_vals, axis=-1)
    rgb = rgb + (1.0 - opacity[..., None])  # always white back for objects
    return CompositeOut(weights, opacity, rgb, depth)
