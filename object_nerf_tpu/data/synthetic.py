"""Procedural RGB-D scene for tests and benchmarks.

The reference repo can only be exercised with downloaded ScanNet/ToyDesk
data; this module provides a self-contained stand-in: an analytic scene
(lambertian spheres over a ground plane inside a box) ray-traced in numpy to
produce exactly the batch schema of `GenericDataset` — rays (N, 8), rgbs,
depths, instance masks with rebalance weights, pass-through masks, and
per-ray instance ids. Cameras orbit the scene center.

Useful properties: ground-truth depth is exact, instance masks are exact,
and a NeRF trained on it converges quickly, so integration tests can assert
"PSNR improves under training" deterministically.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from .ray_utils import get_ray_directions, get_rays
from .image_utils import rebalance_mask
from . import register_dataset


@dataclasses.dataclass
class Sphere:
    center: np.ndarray
    radius: float
    color: np.ndarray
    instance_id: int


def _default_spheres():
    return [
        Sphere(np.array([0.3, 0.0, 0.25]), 0.25, np.array([0.9, 0.2, 0.2]), 1),
        Sphere(np.array([-0.35, 0.2, 0.2]), 0.2, np.array([0.2, 0.5, 0.9]), 2),
        Sphere(np.array([0.0, -0.35, 0.15]), 0.15, np.array([0.2, 0.8, 0.3]), 3),
    ]


def _detail_spheres(seed: int = 7, n_small: int = 36):
    """The default scene plus a lawn of SMALL spheres (r ≈ 0.04-0.07) with
    striped colors — geometric + appearance detail finer than a 0.3-unit
    (and mostly finer than a 0.15-unit) voxel, for progressive-training
    A/Bs that need sub-voxel structure to resolve
    (scripts/progressive_ab.py --detail)."""
    rng = np.random.RandomState(seed)
    spheres = _default_spheres()
    grid = int(np.ceil(np.sqrt(n_small)))
    k = 0
    for gy in range(grid):
        for gx in range(grid):
            if k >= n_small:
                break
            r = 0.04 + 0.03 * rng.rand()
            cx = -0.9 + 1.8 * (gx + 0.5) / grid + 0.05 * rng.randn()
            cy = -0.9 + 1.8 * (gy + 0.5) / grid + 0.05 * rng.randn()
            # skip the big spheres' footprints
            if min(np.hypot(cx - s.center[0], cy - s.center[1])
                   for s in spheres[:3]) < 0.3:
                continue
            color = np.array([0.25 + 0.7 * rng.rand() for _ in range(3)])
            # instance id 0: detail spheres belong to the background scene
            spheres.append(Sphere(np.array([cx, cy, r]), r, color, 0))
            k += 1
    return spheres


def _ray_sphere(o, d, c, r):
    """Nearest positive hit t or +inf. o,d: (N,3)."""
    oc = o - c
    b = np.sum(oc * d, -1)
    cc = np.sum(oc * oc, -1) - r * r
    disc = b * b - cc
    t = np.where(disc >= 0, -b - np.sqrt(np.maximum(disc, 0)), np.inf)
    return np.where(t > 1e-4, t, np.inf)


def _ray_plane_z(o, d, z=0.0):
    t = (z - o[:, 2]) / np.where(np.abs(d[:, 2]) < 1e-9, 1e-9, d[:, 2])
    return np.where(t > 1e-4, t, np.inf)


def _shade(points, normals, base_color):
    light = np.array([0.4, 0.3, 0.85])
    light = light / np.linalg.norm(light)
    lam = np.clip(normals @ light, 0.0, 1.0)[:, None]
    return np.clip(base_color * (0.35 + 0.65 * lam), 0.0, 1.0)


def _checker(points, scale: float = 4.0):
    c = ((np.floor(points[:, 0] * scale) + np.floor(points[:, 1] * scale))
         % 2)[:, None]
    return 0.35 + 0.3 * c * np.ones((len(points), 3))


def trace(rays_o, rays_d, spheres, checker_scale: float = 4.0):
    """Returns (rgb (N,3), depth (N,), inst_id (N,) int)."""
    n = len(rays_o)
    best_t = _ray_plane_z(rays_o, rays_d, 0.0)
    hit_plane = np.isfinite(best_t)
    rgb = np.zeros((n, 3))
    inst = np.zeros((n,), np.int64)
    t_safe = np.where(np.isfinite(best_t), best_t, 0.0)
    p = rays_o + t_safe[:, None] * rays_d
    rgb[hit_plane] = _checker(p[hit_plane], checker_scale)
    # background: gradient sky
    sky = ~hit_plane
    rgb[sky] = np.stack(
        [0.6 + 0.2 * rays_d[sky, 2], 0.7 + 0.2 * rays_d[sky, 2],
         0.9 * np.ones(sky.sum())], -1
    ).clip(0, 1)
    # miss ⇒ depth 0 (invalid, excluded by the depth>0 loss mask — the
    # reference uses the same convention for clipped depths,
    # generic_dataset.py:391)
    best_t = np.where(hit_plane, best_t, 0.0)

    for s in spheres:
        t = _ray_sphere(rays_o, rays_d, s.center, s.radius)
        closer = t < best_t
        if closer.any():
            pt = rays_o[closer] + t[closer, None] * rays_d[closer]
            nrm = (pt - s.center) / s.radius
            rgb[closer] = _shade(pt, nrm, s.color)
            inst[closer] = s.instance_id
            best_t = np.where(closer, t, best_t)
    return rgb.astype(np.float32), best_t.astype(np.float32), inst


def look_at(eye, target, up=np.array([0.0, 0.0, 1.0])):
    """c2w (3,4) with the reference camera convention (x right, y up, -z fwd)."""
    fwd = target - eye
    fwd = fwd / np.linalg.norm(fwd)
    right = np.cross(fwd, up)
    right = right / np.linalg.norm(right)
    cam_up = np.cross(right, fwd)
    return np.stack([right, cam_up, -fwd, eye], axis=1).astype(np.float32)


@register_dataset("synthetic")
class SyntheticDataset:
    """Drop-in dataset with the GenericDataset batch contract."""

    def __init__(
        self,
        split: str = "train",
        img_wh=(80, 60),
        dataset_extra=None,
        n_frames: int = 12,
        seed: int = 0,
    ):
        extra = dataset_extra or {}
        self.split = split
        self.img_wh = tuple(img_wh)
        self.near = float(extra.get("near", 0.5))
        self.far = float(extra.get("far", 5.0))
        self.white_back = False
        self.spheres = _default_spheres()
        self.instance_ids = sorted(s.instance_id for s in self.spheres)
        fg_w = float(extra.get("fg_weight", 1.0))
        bg_w = float(extra.get("bg_weight", 0.05))

        w, h = self.img_wh
        focal = 0.7 * w
        directions = get_ray_directions(h, w, focal)
        rng = np.random.RandomState(seed if split == "train" else seed + 999)

        n = n_frames if split == "train" else 1
        rays_all, rgbs_all, depths_all = [], [], []
        inst_masks_all, inst_w_all, pass_all = [], [], []
        self.poses = []
        for i in range(n):
            ang = 2 * np.pi * i / max(n, 1) + (0.0 if split == "train" else 0.37)
            radius = 1.8 + 0.2 * np.sin(3 * ang)
            eye = np.array(
                [radius * np.cos(ang), radius * np.sin(ang), 1.1 + 0.2 * np.cos(2 * ang)]
            )
            c2w = look_at(eye, np.array([0.0, 0.0, 0.2]))
            self.poses.append(c2w)
            rays_o, rays_d = get_rays(directions, c2w)
            rgb, depth, inst = trace(rays_o, rays_d, self.spheres)
            # depths beyond the far plane are unfittable → mark invalid (0),
            # mirroring the reference's >4 m depth clip (generic_dataset.py:391)
            depth = np.where(depth > self.far, 0.0, depth)
            near = np.full((len(rays_o), 1), self.near, np.float32)
            far = np.full((len(rays_o), 1), self.far, np.float32)
            rays = np.concatenate(
                [rays_o.astype(np.float32), rays_d.astype(np.float32), near, far], -1
            )
            rays_all.append(rays)
            rgbs_all.append(rgb)
            depths_all.append(depth)

            # per-instance masks + weights, flattened per frame (H*W, K)
            masks, wts, passes = [], [], []
            for sid in self.instance_ids:
                m = inst == sid
                m2d = m.reshape(h, w)
                masks.append(m)
                wts.append(rebalance_mask(m2d, fg_w, bg_w).reshape(-1))
                passes.append(m | (inst == 0))  # bg + self pass through
            inst_masks_all.append(np.stack(masks, -1))
            inst_w_all.append(np.stack(wts, -1))
            pass_all.append(np.stack(passes, -1))

        self.rays = np.concatenate(rays_all)
        self.rgbs = np.concatenate(rgbs_all)
        self.depths = np.concatenate(depths_all)
        self.instance_masks = np.concatenate(inst_masks_all)  # (N, K) bool
        self.instance_weights = np.concatenate(inst_w_all)
        self.pass_through = np.concatenate(pass_all)
        self.valid_mask = np.ones(len(self.rays), bool)
        self._rng = rng

    def __len__(self):
        return len(self.rays)

    def is_rays_in_bbox(self):
        return False

    def sample_batch(self, batch_size: int, rng: np.random.RandomState | None = None):
        """Random ray batch with a random instance per ray
        (generic_dataset.py:475-490 semantics)."""
        rng = rng or self._rng
        idx = rng.randint(0, len(self.rays), size=batch_size)
        k = rng.randint(0, len(self.instance_ids), size=batch_size)
        sel = np.arange(batch_size)
        return {
            "rays": self.rays[idx],
            "rgbs": self.rgbs[idx],
            "depths": self.depths[idx],
            "valid_mask": self.valid_mask[idx],
            "instance_mask": self.instance_masks[idx, :][sel, k],
            "instance_mask_weight": self.instance_weights[idx, :][sel, k],
            "pass_through_mask": self.pass_through[idx, :][sel, k],
            "instance_ids": np.asarray(self.instance_ids)[k].astype(np.int64),
        }

    def whole_image_batch(self, frame: int = 0):
        w, h = self.img_wh
        n = w * h
        lo, hi = frame * n, (frame + 1) * n
        k = 0  # fixed first instance for val, like validate_idx semantics
        return {
            "rays": self.rays[lo:hi],
            "rgbs": self.rgbs[lo:hi],
            "depths": self.depths[lo:hi],
            "valid_mask": self.valid_mask[lo:hi],
            "instance_mask": self.instance_masks[lo:hi, k],
            "instance_mask_weight": self.instance_weights[lo:hi, k],
            "pass_through_mask": self.pass_through[lo:hi, k],
            "instance_ids": np.full((n,), self.instance_ids[k], np.int64),
        }
