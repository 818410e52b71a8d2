"""NeRF-style RGB-D dataset (ScanNet / ToyDesk) with instance masks.

Behavioral parity with the reference `GenericDataset`
(datasets/generic_dataset.py:23-502):

* reads `transforms_full.json`, computes focal from `camera_angle_x`;
* train-frame filtering: split file ∩ idx range ∩ validate-idx exclusion ∩
  NaN/Inf pose rejection ∩ observation angle/distance check ∩ skip step ∩
  max size (generic_dataset.py:148-203); val = the single `validate_idx`;
* per frame: OpenCV→NDC rotation fix, pose centering by `scene_center` and
  `scale_factor`, LANCZOS-resized RGB, 16-bit depth /1000 clipped >4 m and
  converted z-depth→ray-depth via direction norms, per-instance masks with
  rebalance weights and bg+self pass-through masks, border-20px valid mask,
  optional per-ray near/far from bbox intersection (generic_dataset.py:312-459);
* rays packed `(H*W, 8) = [o, d, near, far]`;
* training samples one random instance per ray (generic_dataset.py:475-490).

TPU-first design differences:

* everything is numpy (no torch/DataLoader); the entire ray buffer is built
  once and sampled with fancy indexing — batches land on device via the
  trainer's sharded `device_put`;
* the per-ray Numba bbox loop is the vectorized slab test in geo_utils;
* the built buffers can be cached to an `.npz` keyed on the config, so a
  30-epoch run pays the (formerly minutes-long) preprocessing once.
"""

from __future__ import annotations

import hashlib
import json
import os
from pathlib import Path

import numpy as np

from . import register_dataset
from .ray_utils import get_ray_directions, get_rays
from .geo_utils import ray_aabb_intersect, center_pose_from_avg, observe_angle_distance
from .image_utils import rebalance_mask, compute_distance_transform_weights

FIX_ROT = np.array([1, 0, 0, 0, -1, 0, 0, 0, -1], dtype=np.float64).reshape(3, 3)


def _load_image_rgb(path, img_wh):
    from PIL import Image

    img = Image.open(path)
    img = img.resize(img_wh, Image.LANCZOS)
    arr = np.asarray(img, dtype=np.float32) / 255.0
    if arr.ndim == 2:
        arr = np.stack([arr] * 3, -1)
    return arr[..., :3].reshape(-1, 3)


def _load_depth(path, img_wh, scale_factor, dir_norm):
    import cv2

    depth = cv2.imread(str(path), cv2.IMREAD_ANYDEPTH)
    if depth is None:
        return np.zeros(img_wh[0] * img_wh[1], np.float32)
    depth = cv2.resize(depth, img_wh, interpolation=cv2.INTER_NEAREST) * 1e-3
    depth[depth > 4] = 0
    depth = depth.astype(np.float32).reshape(-1)
    return depth / scale_factor * dir_norm


def _load_instance_map(path, img_wh):
    import cv2

    inst = cv2.imread(str(path), cv2.IMREAD_ANYDEPTH)
    if inst is None:
        return None
    return cv2.resize(inst, img_wh, interpolation=cv2.INTER_NEAREST)


@register_dataset("generic_dataset")
@register_dataset("scannet_base")
@register_dataset("toydesk")
class GenericDataset:
    def __init__(self, split="train", img_wh=(640, 480), dataset_extra=None,
                 cache_dir=None):
        self.split = split
        self.img_wh = tuple(img_wh)
        self.conf = dataset_extra
        self.root_dir = self.conf["root_dir"]
        self.scene_id = self.conf.get("scene_id", "")
        self.scale_factor = float(self.conf["scale_factor"])
        self.near = float(self.conf["near"])
        self.far = float(self.conf["far"])
        self.white_back = False

        self.pose_avg = np.concatenate(
            [np.eye(3), np.array(self.conf["scene_center"], np.float64)[:, None]], 1
        )

        # border-20 valid mask (generic_dataset.py:44-52)
        border = 20
        w, h = self.img_wh
        bmask = np.ones((h, w), bool)
        bmask[:border] = bmask[-border:] = False
        bmask[:, :border] = bmask[:, -border:] = False
        self.bmask = bmask.reshape(-1)

        self.use_bbox = bool(self.conf.get("use_bbox", False))
        if self.use_bbox:
            self.read_bbox_info()

        self.bg_instance_ids = list(self.conf.get("bg_instance_id", []))
        self.instance_ids = list(self.conf.get("instance_id", [0]))

        self._read_meta(cache_dir)

    # -- bbox ----------------------------------------------------------------
    def read_bbox_info(self):
        """ScanNet axisAlignment + per-instance detection bbox
        (generic_dataset.py:66-89)."""
        scene_info_file = os.path.join(
            self.conf["scans_dir"], f"{self.scene_id}/{self.scene_id}.txt"
        )
        for line in open(scene_info_file):
            if "axisAlignment" in line:
                vals = [
                    float(x)
                    for x in line.rstrip().strip("axisAlignment = ").split(" ")
                ]
                self.axis_align_mat = np.array(vals).reshape(4, 4)
                break
        scene_bbox = np.load(
            os.path.join(self.conf["bbox_dir"], f"{self.scene_id}_bbox.npy")
        )
        for b in scene_bbox:
            if int(b[6]) != int(self.conf["val_instance_id"]):
                continue
            half = np.array([b[3], b[4], b[5]]) * 0.5
            center = np.array([b[0], b[1], b[2]])
            self.bbox_bounds = np.array([center - half, center + half])

    def transform_rays_to_bbox_coordinates(self, rays_o, rays_d):
        rays_o = rays_o * self.scale_factor
        T = self.pose_avg
        rays_o = rays_o @ T[:3, :3].T + T[:3, 3]
        rays_d_w = rays_d @ T[:3, :3].T
        A = self.axis_align_mat
        rays_o = rays_o @ A[:3, :3].T + A[:3, 3]
        # NOTE: reference applies axis_align to the *unrotated* directions
        # (generic_dataset.py:103) — kept for parity
        rays_d_b = rays_d @ A[:3, :3].T
        return rays_o, rays_d_b

    def is_rays_in_bbox(self):
        if self.conf.get("use_bbox_only_for_test", False) and self.split == "train":
            return False
        return self.use_bbox

    # -- meta ----------------------------------------------------------------
    def _filtered_frames(self):
        with open(os.path.join(self.root_dir, "transforms_full.json")) as f:
            self.meta = json.load(f)
        frames = self.meta["frames"]
        validate_idx = self.conf.get("validate_idx", -1)

        if self.split == "train":
            split_file = os.path.join(self.conf["split"], "train.txt")
            if os.path.exists(split_file):
                split_inds = set(np.loadtxt(split_file).astype(int).tolist())
                frames = [f for f in frames if f["idx"] in split_inds]
            start = self.conf.get("train_start_idx", 0)
            frames = [
                f for f in frames if f["idx"] >= start and f["idx"] != validate_idx
            ]

            def obs_ok(f):
                T = np.array(f["transform_matrix"])
                if not np.isfinite(T).all():
                    return False
                if not self.conf.get("enable_observation_check", False):
                    return True
                angle, dist = observe_angle_distance(T, self.pose_avg[:3, 3])
                return (
                    angle < self.conf["max_obs_angle"]
                    and dist < self.conf["max_obs_distance"]
                )

            frames = [f for f in frames if obs_ok(f)]
            skip = int(self.conf.get("train_skip_step", 1))
            frames = frames[::skip]
            frames = frames[: int(self.conf.get("train_max_size", 10**9))]
        elif self.split == "val":
            frames = [f for f in frames if f["idx"] == validate_idx]
        return frames

    def _cache_key(self):
        payload = json.dumps(
            {
                "split": self.split,
                "img_wh": self.img_wh,
                "conf": {k: str(v) for k, v in sorted(dict(self.conf).items())},
            },
            sort_keys=True,
        )
        return hashlib.sha1(payload.encode()).hexdigest()[:16]

    def _read_meta(self, cache_dir):
        frames = self._filtered_frames()
        w, h = self.img_wh
        self.focal = 0.5 * w / np.tan(0.5 * self.meta["camera_angle_x"])
        self.directions = get_ray_directions(h, w, self.focal)
        self.dir_norm = np.linalg.norm(self.directions, axis=-1).reshape(-1)
        self.frames = frames

        if self.split != "train":
            return  # val/test builds frames on demand

        cache_path = None
        if cache_dir:
            cache_path = Path(cache_dir) / f"rays_{self._cache_key()}.npz"
            if cache_path.exists():
                data = np.load(cache_path)
                for k in data.files:
                    setattr(self, k, data[k])
                return

        buffers = {k: [] for k in (
            "rays", "rgbs", "depths", "valid_mask", "frame_indices",
            "instance_masks", "instance_weights", "pass_through", "inst_ids",
        )}
        for idx, frame in enumerate(frames):
            sample = self.read_frame_data(frame, self.instance_ids[0])
            if sample is None:
                continue
            masks, wts, passes, ids = [], [], [], []
            ok = True
            for i_inst, inst_id in enumerate(self.instance_ids):
                if i_inst == 0:
                    s = sample
                else:
                    s = self.read_frame_data(frame, inst_id, instance_only=True)
                if s is None:
                    ok = False
                    break
                masks.append(s["instance_mask"])
                wts.append(s["instance_mask_weight"])
                passes.append(s["pass_through_mask"])
                ids.append(np.full(len(s["instance_mask"]), inst_id, np.int64))
            if not ok:
                continue
            buffers["rays"].append(sample["rays"])
            buffers["rgbs"].append(sample["rgbs"])
            buffers["depths"].append(sample["depths"])
            buffers["valid_mask"].append(sample["valid_mask"])
            buffers["frame_indices"].append(
                np.full(len(sample["rays"]), idx, np.int64)
            )
            buffers["instance_masks"].append(np.stack(masks, -1))
            buffers["instance_weights"].append(np.stack(wts, -1))
            buffers["pass_through"].append(np.stack(passes, -1))
            buffers["inst_ids"].append(np.stack(ids, -1))

        self.rays = np.concatenate(buffers["rays"]).astype(np.float32)
        self.rgbs = np.concatenate(buffers["rgbs"]).astype(np.float32)
        self.depths = np.concatenate(buffers["depths"]).astype(np.float32)
        self.valid_mask = np.concatenate(buffers["valid_mask"])
        self.frame_indices = np.concatenate(buffers["frame_indices"])
        self.instance_masks = np.concatenate(buffers["instance_masks"])
        self.instance_weights = np.concatenate(buffers["instance_weights"]).astype(
            np.float32
        )
        self.pass_through = np.concatenate(buffers["pass_through"])
        self.inst_ids = np.concatenate(buffers["inst_ids"])

        if cache_path:
            cache_path.parent.mkdir(parents=True, exist_ok=True)
            np.savez_compressed(
                cache_path,
                rays=self.rays, rgbs=self.rgbs, depths=self.depths,
                valid_mask=self.valid_mask, frame_indices=self.frame_indices,
                instance_masks=self.instance_masks,
                instance_weights=self.instance_weights,
                pass_through=self.pass_through, inst_ids=self.inst_ids,
            )

    # -- per-frame ------------------------------------------------------------
    def _instance_mask_of(self, inst_map, instance_id):
        if isinstance(instance_id, (list, tuple)):
            m = np.zeros(inst_map.shape, bool)
            for i in instance_id:
                m |= inst_map == i
            return m
        return inst_map == instance_id

    def read_frame_data(self, frame, instance_id, instance_only=False):
        w, h = self.img_wh
        n = w * h

        if self.conf.get("use_instance_mask", False) and instance_id != 0:
            inst_path = os.path.join(
                self.root_dir,
                f"{frame['file_path']}.{self.conf['inst_seg_tag']}.png",
            )
            inst_map = _load_instance_map(inst_path, self.img_wh)
            if inst_map is None:
                return None
            instance_mask = self._instance_mask_of(inst_map, instance_id)
            strategy = self.conf.get("mask_rebalance_strategy", "fg_bg_reweight")
            if strategy == "fg_bg_reweight":
                weight = rebalance_mask(
                    instance_mask,
                    fg_weight=self.conf.get("fg_weight", 1.0),
                    bg_weight=self.conf.get("bg_weight", 0.05),
                )
            else:
                weight = compute_distance_transform_weights(
                    instance_mask, uncertain_pixel_distance=0.05 * w
                )
            pass_through = self._instance_mask_of(
                inst_map, self.bg_instance_ids + [instance_id]
            )
            instance_mask = instance_mask.reshape(-1)
            weight = weight.reshape(-1)
            pass_through = pass_through.reshape(-1)
        else:
            instance_mask = np.ones(n, bool)
            weight = np.zeros(n, np.float32)
            pass_through = instance_mask.copy()

        if instance_only:
            return {
                "instance_mask": instance_mask,
                "instance_mask_weight": weight,
                "pass_through_mask": pass_through,
                "instance_ids": np.full(n, instance_id, np.int64),
            }

        pose = np.array(frame["transform_matrix"], np.float64)
        pose[:3, :3] = pose[:3, :3] @ FIX_ROT
        pose = center_pose_from_avg(self.pose_avg, pose)
        pose[:, 3] /= self.scale_factor
        c2w = pose[:3, :4].astype(np.float32)

        img_path = os.path.join(self.root_dir, f"{frame['file_path']}.png")
        if not os.path.exists(img_path):
            return None
        rgbs = _load_image_rgb(img_path, self.img_wh)
        depths = _load_depth(
            os.path.join(self.root_dir, f"{frame['file_path']}.depth.png"),
            self.img_wh, self.scale_factor, self.dir_norm,
        )

        rays_o, rays_d = get_rays(self.directions, c2w)

        if self.use_bbox and not (
            self.conf.get("use_bbox_only_for_test", False) and self.split == "train"
        ):
            o_b, d_b = self.transform_rays_to_bbox_coordinates(rays_o, rays_d)
            hit, tmin, tmax = ray_aabb_intersect(self.bbox_bounds, o_b, d_b)
            near = (tmin / self.scale_factor)[:, None].astype(np.float32)
            far = (tmax / self.scale_factor)[:, None].astype(np.float32)
            if self.conf.get("use_instance_mask", False):
                instance_mask = instance_mask & hit
            if self.conf.get("use_bbox_only_for_test", False):
                near[~hit] = 0.0
                far[~hit] = 0.0
            else:
                near[~hit] = self.near / self.scale_factor
                far[~hit] = self.far / self.scale_factor
        else:
            near = np.full((n, 1), self.near / self.scale_factor, np.float32)
            far = np.full((n, 1), self.far / self.scale_factor, np.float32)

        rays = np.concatenate(
            [rays_o.astype(np.float32), rays_d.astype(np.float32), near, far], -1
        )
        return {
            "rays": rays,
            "rgbs": rgbs,
            "depths": depths,
            "c2w": c2w,
            "valid_mask": self.bmask.copy(),
            "instance_mask": instance_mask,
            "instance_mask_weight": weight,
            "pass_through_mask": pass_through,
            "instance_ids": np.full(n, instance_id, np.int64),
        }

    # -- batch API -------------------------------------------------------------
    def __len__(self):
        if self.split == "train":
            return len(self.rays)
        return max(1, len(self.frames))

    def sample_batch(self, batch_size: int, rng=None):
        """Random rays, each with a random instance
        (generic_dataset.py:475-490)."""
        rng = rng or np.random
        idx = rng.randint(0, len(self.rays), size=batch_size)
        k = rng.randint(0, self.instance_masks.shape[-1], size=batch_size)
        sel = np.arange(batch_size)
        return {
            "rays": self.rays[idx],
            "rgbs": self.rgbs[idx],
            "depths": self.depths[idx],
            "valid_mask": self.valid_mask[idx],
            "instance_mask": self.instance_masks[idx][sel, k],
            "instance_mask_weight": self.instance_weights[idx][sel, k],
            "pass_through_mask": self.pass_through[idx][sel, k],
            "instance_ids": self.inst_ids[idx][sel, k],
            # per-ray source frame (generic_dataset.py:487 'frame_idx' —
            # reserved for appearance conditioning)
            "frame_idx": self.frame_indices[idx],
        }

    def whole_image_batch(self, frame: int = 0):
        """One full validation image (val_instance_id semantics)."""
        f = self.frames[frame if self.split != "val" else 0]
        sample = self.read_frame_data(f, self.conf.get("val_instance_id", 0))
        assert sample is not None, "val frame unreadable"
        return sample
