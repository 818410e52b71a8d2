"""Instance-mask weighting utilities.

Parity with the reference (datasets/image_utils.py:8-59):

* `rebalance_mask` — per-pixel weights that rebalance foreground/background.
  Strategies: count-ratio (default: each side weighted by N/(2·N_side)) or
  fixed fg/bg weights (the shipped configs use fg=1.0 / bg=0.05,
  default_conf.yml:75-78).
* `compute_distance_transform_weights` — boundary-softened weights via a
  distance transform (cv2), clamped to [0.1·w, 10·w] bands like the
  reference's min/max clipping.
"""

from __future__ import annotations

import numpy as np


def rebalance_mask(
    mask: np.ndarray, fg_weight: float | None = None, bg_weight: float | None = None
) -> np.ndarray:
    """Per-pixel rebalance weights for a boolean fg mask (H, W)."""
    if fg_weight is None and bg_weight is None:
        n = mask.size
        n_fg = int(mask.sum())
        n_bg = n - n_fg
        weight = np.zeros_like(mask, dtype=np.float32)
        if n_fg > 0:
            weight[mask] = n / (2.0 * n_fg)
        if n_bg > 0:
            weight[~mask] = n / (2.0 * n_bg)
        return weight
    weight = np.full(mask.shape, bg_weight, dtype=np.float32)
    weight[mask] = fg_weight
    return weight


def compute_distance_transform_weights(
    mask: np.ndarray, uncertain_pixel_distance: float = 15.0
) -> np.ndarray:
    """Down-weight pixels near the mask boundary using a distance transform."""
    import cv2

    m = mask.astype(np.uint8)
    dist_fg = cv2.distanceTransform(m, cv2.DIST_L2, 3)
    dist_bg = cv2.distanceTransform(1 - m, cv2.DIST_L2, 3)
    dist = np.where(mask, dist_fg, dist_bg).astype(np.float32)
    w = np.clip(dist / uncertain_pixel_distance, 0.1, 1.0)
    return w
