"""GenericDataset: full on-disk loading path with a synthetic NeRF-style
dataset (json + png + depth + instance masks), mirroring the reference's
data layout (datasets/generic_dataset.py)."""

import json

import numpy as np
import pytest

from object_nerf_tpu.config import Config
from object_nerf_tpu.data.generic_dataset import GenericDataset
from object_nerf_tpu.data.synthetic import SyntheticDataset, trace, look_at
from object_nerf_tpu.data.ray_utils import get_ray_directions, get_rays


W, H = 32, 24
N_FRAMES = 6


@pytest.fixture(scope="module")
def disk_dataset(tmp_path_factory):
    """Write a tiny NeRF-style dataset rendered from the synthetic scene."""
    import cv2

    root = tmp_path_factory.mktemp("scene")
    (root / "full").mkdir()
    focal = 0.7 * W
    fov_x = 2 * np.arctan(W / 2 / focal)
    directions = get_ray_directions(H, W, focal)
    ds = SyntheticDataset("train", img_wh=(W, H), n_frames=1)
    spheres = ds.spheres

    frames = []
    for i in range(N_FRAMES):
        ang = 2 * np.pi * i / N_FRAMES
        eye = np.array([1.8 * np.cos(ang), 1.8 * np.sin(ang), 1.1])
        c2w = look_at(eye, np.array([0.0, 0.0, 0.2]))
        rays_o, rays_d = get_rays(directions, c2w)
        rgb, depth, inst = trace(rays_o, rays_d, spheres)
        cv2.imwrite(
            str(root / "full" / f"{i}.png"),
            (rgb.reshape(H, W, 3)[..., ::-1] * 255).astype(np.uint8),
        )
        # depth as 16-bit mm; z-depth = ray-depth / |direction|
        dirs_norm = np.linalg.norm(directions.reshape(-1, 3), axis=-1)
        zdepth = depth / dirs_norm
        cv2.imwrite(
            str(root / "full" / f"{i}.depth.png"),
            (zdepth.reshape(H, W) * 1000).astype(np.uint16),
        )
        cv2.imwrite(
            str(root / "full" / f"{i}.instance.png"),
            inst.reshape(H, W).astype(np.uint16),
        )
        # dataset poses are OpenCV-convention: undo the fix_rot the loader applies
        fix_rot = np.array([1, 0, 0, 0, -1, 0, 0, 0, -1]).reshape(3, 3)
        pose_cv = np.eye(4)
        pose_cv[:3, :3] = c2w[:3, :3] @ fix_rot  # fix_rot is its own inverse
        pose_cv[:3, 3] = c2w[:3, 3]
        frames.append(
            {"file_path": f"./full/{i}", "transform_matrix": pose_cv.tolist(),
             "idx": i}
        )
    meta = {"camera_angle_x": float(fov_x), "frames": frames}
    (root / "transforms_full.json").write_text(json.dumps(meta))
    return root


def _conf(root, **over):
    c = Config(
        dict(
            root_dir=str(root),
            near=0.5, far=5.0, scale_factor=1.0,
            scene_center=[0.0, 0.0, 0.0],
            train_start_idx=0, train_skip_step=1, train_max_size=999,
            validate_idx=3,
            split=str(root / "nonexistent_split"),  # no split file → all frames
            enable_observation_check=False,
            use_instance_mask=True,
            use_bbox=False, use_bbox_only_for_test=True,
            inst_seg_tag="instance",
            val_instance_id=1,
            instance_id=[1, 2],
            bg_instance_id=[0],
            mask_rebalance_strategy="fg_bg_reweight",
            fg_weight=1.0, bg_weight=0.05,
        )
    )
    c.merge(over)
    return c


def test_train_buffer_schema_and_geometry(disk_dataset):
    ds = GenericDataset("train", img_wh=(W, H), dataset_extra=_conf(disk_dataset))
    n_expected = (N_FRAMES - 1) * W * H  # validate_idx excluded
    assert len(ds) == n_expected
    assert ds.rays.shape == (n_expected, 8)
    assert ds.rgbs.shape == (n_expected, 3)
    assert ds.instance_masks.shape == (n_expected, 2)

    # ray directions are unit norm; near/far scaled
    d = ds.rays[:, 3:6]
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-5)
    np.testing.assert_allclose(ds.rays[:, 6], 0.5, atol=1e-6)
    np.testing.assert_allclose(ds.rays[:, 7], 5.0, atol=1e-6)

    # geometric consistency: o + d*depth lands on the traced surface
    # (depth stored = ray-depth after the z→ray conversion)
    sel = (ds.depths > 0.1) & (ds.depths < 3.9)
    pts = ds.rays[sel, :3] + ds.rays[sel, 3:6] * ds.depths[sel, None]
    # scene content lies in z ∈ [0, ~0.55] (plane + spheres)
    assert np.percentile(pts[:, 2], 95) < 0.8
    assert np.percentile(pts[:, 2], 5) > -0.15

    # border-20px valid mask: at 32×24 everything is border → all invalid
    assert not ds.valid_mask.any()


def test_instance_masks_and_weights(disk_dataset):
    ds = GenericDataset("train", img_wh=(W, H), dataset_extra=_conf(disk_dataset))
    # masks for instance 1 should be non-empty in some frames
    assert ds.instance_masks[:, 0].sum() > 0
    # weights: fg=1.0, bg=0.05 where masks exist
    m = ds.instance_masks[:, 0]
    w = ds.instance_weights[:, 0]
    assert np.allclose(np.unique(w[m]), [1.0])
    assert np.allclose(np.unique(w[~m]), [0.05])
    # pass-through contains the instance and background
    pt = ds.pass_through[:, 0]
    assert (pt | ~m).all()  # mask ⊆ pass_through

    batch = ds.sample_batch(64, np.random.RandomState(0))
    assert set(batch) >= {
        "rays", "rgbs", "depths", "valid_mask", "instance_mask",
        "instance_mask_weight", "pass_through_mask", "instance_ids",
    }
    assert set(np.unique(batch["instance_ids"])) <= {1, 2}


def test_val_split_single_frame(disk_dataset):
    ds = GenericDataset("val", img_wh=(W, H), dataset_extra=_conf(disk_dataset))
    assert len(ds.frames) == 1
    assert ds.frames[0]["idx"] == 3
    sample = ds.whole_image_batch()
    assert sample["rays"].shape == (W * H, 8)
    assert sample["instance_ids"][0] == 1  # val_instance_id


def test_split_file_filtering(disk_dataset, tmp_path):
    split_dir = tmp_path / "split"
    split_dir.mkdir()
    (split_dir / "train.txt").write_text("0\n2\n4\n")
    conf = _conf(disk_dataset, split=str(split_dir))
    ds = GenericDataset("train", img_wh=(W, H), dataset_extra=conf)
    assert len(ds) == 3 * W * H
    assert set(np.unique(ds.frame_indices)) == {0, 1, 2}


def test_npz_cache_roundtrip(disk_dataset, tmp_path):
    conf = _conf(disk_dataset)
    ds1 = GenericDataset("train", img_wh=(W, H), dataset_extra=conf,
                         cache_dir=tmp_path / "cache")
    ds2 = GenericDataset("train", img_wh=(W, H), dataset_extra=conf,
                         cache_dir=tmp_path / "cache")
    np.testing.assert_array_equal(ds1.rays, ds2.rays)
    np.testing.assert_array_equal(ds1.instance_masks, ds2.instance_masks)
    assert len(list((tmp_path / "cache").glob("*.npz"))) == 1
