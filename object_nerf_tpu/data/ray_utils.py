"""Pinhole ray generation (numpy, host-side; device math happens downstream).

Parity with the reference (datasets/ray_utils.py:5-95): camera-space
directions use the OpenGL-ish convention [(i - W/2)/f, -(j - H/2)/f, -1]
with NO +0.5 pixel centering (ray_utils.py:19-22), world directions are
normalized, origins broadcast from the camera center. NDC rays are kept for
API completeness (unused by the shipped configs).
"""

from __future__ import annotations

import numpy as np


def get_ray_directions(h: int, w: int, focal: float) -> np.ndarray:
    """(H, W, 3) per-pixel ray directions in camera coordinates."""
    j, i = np.meshgrid(
        np.arange(h, dtype=np.float32), np.arange(w, dtype=np.float32), indexing="ij"
    )
    return np.stack(
        [(i - w / 2) / focal, -(j - h / 2) / focal, -np.ones_like(i)], axis=-1
    )


def get_rays(directions: np.ndarray, c2w: np.ndarray):
    """World-space rays. directions (H, W, 3); c2w (3, 4).

    Returns rays_o, rays_d each (H*W, 3); rays_d normalized.
    """
    rays_d = directions @ c2w[:, :3].T
    rays_d = rays_d / np.linalg.norm(rays_d, axis=-1, keepdims=True)
    rays_o = np.broadcast_to(c2w[:, 3], rays_d.shape)
    return rays_o.reshape(-1, 3).copy(), rays_d.reshape(-1, 3)


def get_ndc_rays(h, w, focal, near, rays_o, rays_d):
    """Shift rays into NDC space (ray_utils.py:54-95 semantics)."""
    t = -(near + rays_o[..., 2]) / rays_d[..., 2]
    rays_o = rays_o + t[..., None] * rays_d

    ox_oz = rays_o[..., 0] / rays_o[..., 2]
    oy_oz = rays_o[..., 1] / rays_o[..., 2]
    o0 = -1.0 / (w / (2.0 * focal)) * ox_oz
    o1 = -1.0 / (h / (2.0 * focal)) * oy_oz
    o2 = 1.0 + 2.0 * near / rays_o[..., 2]
    d0 = -1.0 / (w / (2.0 * focal)) * (rays_d[..., 0] / rays_d[..., 2] - ox_oz)
    d1 = -1.0 / (h / (2.0 * focal)) * (rays_d[..., 1] / rays_d[..., 2] - oy_oz)
    d2 = 1.0 - o2
    return np.stack([o0, o1, o2], -1), np.stack([d0, d1, d2], -1)
