"""Training losses.

Behavioral parity with the reference (models/losses.py:1-139):

* scene color: masked MSE over valid pixels (coarse + fine summed);
* scene depth: MSE where GT depth > 0 and valid;
* opacity: MSE of clamped instance opacity vs the 2D instance mask,
  weighted by per-pixel rebalance weights;
* instance color / depth: masked to the instance and weighted;
* every term "skips" (contributes 0) when its mask is empty — the reference
  returns None (losses.py:13-14,44-50,80-81); here the masked mean is
  guarded so empty masks contribute exactly 0 without dynamic shapes;
* the returned log dict divides each term by its weight (losses.py:131-133).

All functions are pure and static-shape: boolean indexing becomes
`sum(err·mask)/max(sum(mask), 1)`.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp


def _masked_mean(err: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Mean of err over mask-selected elements; 0 when mask is empty."""
    mask = mask.astype(err.dtype)
    total = jnp.sum(mask)
    return jnp.sum(err * mask) / jnp.maximum(total, 1.0)


def color_loss(results, batch, typ_keys=("rgb_coarse", "rgb_fine")) -> jnp.ndarray:
    targets = batch["rgbs"].reshape(-1, 3)
    mask = batch["valid_mask"].reshape(-1, 1)
    loss = 0.0
    for k in typ_keys:
        if k in results:
            err = (results[k] - targets) ** 2
            loss = loss + _masked_mean(err, jnp.broadcast_to(mask, err.shape))
    return loss


def depth_loss(results, batch) -> jnp.ndarray:
    targets = batch["depths"].reshape(-1)
    mask = batch["valid_mask"].reshape(-1) * (targets > 0)
    loss = 0.0
    for k in ("depth_coarse", "depth_fine"):
        if k in results:
            err = (results[k] - targets) ** 2
            loss = loss + _masked_mean(err, mask)
    return loss


def opacity_loss(results, batch) -> jnp.ndarray:
    valid = batch["valid_mask"].reshape(-1)
    inst = batch["instance_mask"].reshape(-1).astype(jnp.float32)
    w = batch["instance_mask_weight"].reshape(-1)
    loss = 0.0
    for k in ("opacity_instance_coarse", "opacity_instance_fine"):
        if k in results:
            err = (jnp.clip(results[k], 0.0, 1.0) - inst) ** 2 * w
            loss = loss + _masked_mean(err, valid)
    return loss


def instance_color_loss(results, batch) -> jnp.ndarray:
    targets = batch["rgbs"].reshape(-1, 3)
    mask = (batch["valid_mask"] * batch["instance_mask"]).reshape(-1, 1)
    w = batch["instance_mask_weight"].reshape(-1, 1)
    loss = 0.0
    for k in ("rgb_instance_coarse", "rgb_instance_fine"):
        if k in results:
            err = (results[k] - targets) ** 2 * w
            loss = loss + _masked_mean(err, jnp.broadcast_to(mask, err.shape))
    return loss


def instance_depth_loss(results, batch) -> jnp.ndarray:
    targets = batch["depths"].reshape(-1)
    mask = (
        batch["valid_mask"].reshape(-1)
        * (targets > 0)
        * batch["instance_mask"].reshape(-1)
    )
    w = batch["instance_mask_weight"].reshape(-1)
    loss = 0.0
    for k in ("depth_instance_coarse", "depth_instance_fine"):
        if k in results:
            err = (results[k] - targets) ** 2 * w
            loss = loss + _masked_mean(err, mask)
    return loss


def total_loss(
    results: Dict[str, jnp.ndarray],
    batch: Dict[str, jnp.ndarray],
    weights: Dict[str, float],
    use_instance: bool = True,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Weighted sum of all applicable terms + de-weighted log dict.

    weights: the `loss:` config block (color_loss_weight, ...).
    """
    terms: Dict[str, jnp.ndarray] = {}
    terms["color_loss"] = weights["color_loss_weight"] * color_loss(results, batch)
    if "depths" in batch:
        terms["depth_loss"] = weights["depth_loss_weight"] * depth_loss(results, batch)
    if use_instance and "instance_mask" in batch:
        terms["opacity_loss"] = weights["opacity_loss_weight"] * opacity_loss(
            results, batch
        )
        terms["instance_color_loss"] = weights[
            "instance_color_loss_weight"
        ] * instance_color_loss(results, batch)
        if "depths" in batch:
            terms["instance_depth_loss"] = weights[
                "instance_depth_loss_weight"
            ] * instance_depth_loss(results, batch)

    loss_sum = sum(terms.values())
    log_dict = {k: v / weights[f"{k}_weight"] for k, v in terms.items()}
    return loss_sum, log_dict
