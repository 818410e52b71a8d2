"""Script-layer coverage: dataset generator chain + demo edit-pose helpers."""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "scripts"))
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def test_make_synthetic_dataset_loads_via_generic_dataset(tmp_path):
    from make_synthetic_dataset import make_dataset
    from object_nerf_tpu.config import Config
    from object_nerf_tpu.data.generic_dataset import GenericDataset
    from object_nerf_tpu.data.ply_io import read_ply
    from object_nerf_tpu.edit.bbox import BBoxRayHelper

    out = make_dataset(tmp_path / "scene", img_wh=(24, 18), n_frames=5)
    conf = Config(
        dict(
            root_dir=str(out), near=0.5, far=5.0, scale_factor=1.0,
            scene_center=[0.0, 0.0, 0.0],
            train_start_idx=0, train_skip_step=1, train_max_size=99,
            validate_idx=4, split=str(Path(out) / "split"),
            enable_observation_check=False, use_instance_mask=True,
            use_bbox=False, use_bbox_only_for_test=True,
            inst_seg_tag="instance", val_instance_id=1,
            instance_id=[1, 2, 3], bg_instance_id=[0],
            bbox_dir=str(Path(out) / "bbox.json"),
            mask_rebalance_strategy="fg_bg_reweight",
            fg_weight=1.0, bg_weight=0.05,
        )
    )
    ds = GenericDataset("train", img_wh=(24, 18), dataset_extra=conf)
    # split excludes last two frames; validate_idx=4 also excluded → 3 frames
    assert len(ds) == 3 * 24 * 18
    batch = ds.sample_batch(32, np.random.RandomState(0))
    assert batch["rays"].shape == (32, 8)
    assert np.isfinite(batch["rgbs"]).all()

    # point cloud + bboxes usable downstream
    assert read_ply(Path(out) / "pcd.ply")["points"].shape[0] > 1000
    helper = BBoxRayHelper(
        Config({"dataset_name": "toydesk", "dataset_extra": conf}), 1
    )
    assert helper.bbox_bounds.shape == (2, 3)


def test_demo_pose_helpers():
    from demo_editable_render import (
        get_pure_rotation,
        get_transformation_with_duplication_offset,
        move_camera_pose,
    )

    rot = get_pure_rotation(0.5, max_angle=180)  # 90°
    np.testing.assert_allclose(rot[:3, :3] @ rot[:3, :3].T, np.eye(3), atol=1e-9)
    np.testing.assert_allclose(rot[0, 0], 0.0, atol=1e-9)  # cos 90°
    np.testing.assert_allclose(np.linalg.det(rot[:3, :3]), 1.0, atol=1e-9)

    t0 = get_transformation_with_duplication_offset(0.25, 0)
    t1 = get_transformation_with_duplication_offset(0.25, 1)
    # the two duplications are offset in opposite y directions
    assert t0[1, 3] > 0 and t1[1, 3] < 0

    pose = np.eye(4)[:3].astype(float)
    moved = move_camera_pose(pose.copy(), 0.3)
    assert np.abs(moved[:3, 3] - pose[:3, 3]).max() > 0
    assert np.abs(moved[:3, 3] - pose[:3, 3]).max() < 0.05  # small spiral step


def test_desk_bbox_sanity_viewer(tmp_path, capsys):
    """datasets/desk_bbox/test_bbox.py (reference :6-30) writes an
    interactive viewer with one labeled box per annotation."""
    import importlib.util
    import json as _json
    import re

    spec = importlib.util.spec_from_file_location(
        "desk_test_bbox",
        Path(__file__).resolve().parents[1] / "datasets/desk_bbox/test_bbox.py",
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    out = tmp_path / "desk1.html"
    mod.main([f"out={out}"])
    html = out.read_text()
    data = _json.loads(re.search(r"const DATA=(\[.*?\]), LABELS", html).group(1))
    labels = _json.loads(
        re.search(r"LABELS=(\[.*?\]), CENTER", html).group(1)
    )
    names = {d["name"] for d in data}
    assert "lines" in names
    # desk1 has 4 positioned boxes -> 4 labels, 4*12 edges = 96 endpoints
    assert len(labels) == 4
    assert next(d for d in data if d["name"] == "lines")["n"] == 96
