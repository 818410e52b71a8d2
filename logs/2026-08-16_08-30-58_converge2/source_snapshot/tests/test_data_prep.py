"""Data preparation: .sens round-trip, NeRF-style conversion, label export."""

import json
import zlib

import numpy as np
import pytest

from object_nerf_tpu.data_prep.sens_reader import (
    SensorData, RGBDFrame, write_sens,
)
from object_nerf_tpu.data_prep.convert_nerf import convert, split_tags
from object_nerf_tpu.data_prep import scannet_labels
from object_nerf_tpu.data.ply_io import write_ply


def _fake_sens(tmp_path, n_frames=3, dw=8, dh=6):
    import imageio.v2 as imageio
    import io

    sd = SensorData()
    sd.sensor_name = "fake"
    sd.intrinsic_color = np.diag([500.0, 500.0, 1, 1]).astype(np.float32)
    sd.extrinsic_color = np.eye(4, dtype=np.float32)
    sd.intrinsic_depth = np.diag([250.0, 250.0, 1, 1]).astype(np.float32)
    sd.extrinsic_depth = np.eye(4, dtype=np.float32)
    sd.color_width, sd.color_height = 16, 12
    sd.depth_width, sd.depth_height = dw, dh
    rng = np.random.RandomState(0)
    for i in range(n_frames):
        img = (rng.rand(12, 16, 3) * 255).astype(np.uint8)
        buf = io.BytesIO()
        imageio.imwrite(buf, img, format="jpeg")
        depth = (rng.rand(dh, dw) * 4000).astype(np.uint16)
        pose = np.eye(4, dtype=np.float32)
        pose[:3, 3] = [i, 0, 0]
        sd.frames.append(
            RGBDFrame(pose, i, i, buf.getvalue(), zlib.compress(depth.tobytes()))
        )
    path = tmp_path / "scan.sens"
    write_sens(path, sd)
    return path, sd


def test_sens_roundtrip_and_export(tmp_path):
    path, orig = _fake_sens(tmp_path)
    sd = SensorData.load(path)
    assert sd.sensor_name == "fake"
    assert len(sd.frames) == 3
    np.testing.assert_allclose(sd.intrinsic_color, orig.intrinsic_color)
    np.testing.assert_allclose(
        sd.frames[2].camera_to_world[:3, 3], [2, 0, 0]
    )
    out = tmp_path / "export"
    sd.export_depth_images(out / "depth")
    sd.export_color_images(out / "color")
    sd.export_poses(out / "pose")
    sd.export_intrinsics(out / "intrinsic")
    assert (out / "depth" / "0.png").exists()
    assert (out / "color" / "2.jpg").exists()
    pose2 = np.loadtxt(out / "pose" / "2.txt")
    np.testing.assert_allclose(pose2[:3, 3], [2, 0, 0])
    # depth content survives
    import imageio.v2 as imageio

    d0 = imageio.imread(out / "depth" / "0.png")
    raw = np.frombuffer(
        orig.frames[0].decompress_depth("zlib_ushort"), np.uint16
    ).reshape(6, 8)
    np.testing.assert_array_equal(d0, raw)


def test_split_rule_matches_reference():
    # every 100th → test; ±10 of a multiple → val; >±20 → train
    assert split_tags(0) == ["test"]
    assert split_tags(100) == ["test"]
    assert split_tags(10) == ["val"]
    assert split_tags(90) == ["val"]
    assert split_tags(110) == ["val"]
    assert split_tags(15) == []  # inside test bound, not val
    assert split_tags(50) == ["train"]
    assert split_tags(121) == ["train"]


def test_convert_nerf_style(tmp_path):
    path, sd = _fake_sens(tmp_path, n_frames=3)
    unpack = tmp_path / "unpack"
    sd_loaded = SensorData.load(path)
    sd_loaded.export_depth_images(unpack / "depth")
    sd_loaded.export_color_images(unpack / "color")
    sd_loaded.export_poses(unpack / "pose")
    sd_loaded.export_intrinsics(unpack / "intrinsic")

    out = tmp_path / "nerf"
    infos = convert(unpack, out, img_wh=(32, 24))
    assert (out / "transforms_full.json").exists()
    full = json.loads((out / "transforms_full.json").read_text())
    assert len(full["frames"]) == 3
    assert full["frames"][1]["file_path"] == "./full/1"
    assert full["frames"][1]["idx"] == 1
    # fov from intrinsics: 2*atan(16/2/500)
    np.testing.assert_allclose(
        full["camera_angle_x"], 2 * np.arctan(16 / 2 / 500), rtol=1e-6
    )
    assert (out / "full" / "0.png").exists()
    assert (out / "full" / "0.depth.png").exists()
    test = json.loads((out / "transforms_test.json").read_text())
    assert [f["idx"] for f in test["frames"]] == [0]


def test_scannet_label_export(tmp_path):
    # tiny scene: 6 vertices, 2 segments, 2 objects
    verts = np.array(
        [[0, 0, 0], [1, 0, 0], [0, 1, 0], [5, 5, 5], [6, 5, 5], [5, 6, 5]],
        np.float32,
    )
    colors = np.ones((6, 3), np.float32) * 0.5
    mesh_file = tmp_path / "scene_vh_clean_2.ply"
    write_ply(mesh_file, verts, colors=colors)

    agg = {
        "segGroups": [
            {"objectId": 0, "label": "chair", "segments": [11]},
            {"objectId": 1, "label": "table", "segments": [22]},
        ]
    }
    (tmp_path / "scene.aggregation.json").write_text(json.dumps(agg))
    segs = {"segIndices": [11, 11, 11, 22, 22, 22]}
    (tmp_path / "scene.segs.json").write_text(json.dumps(segs))
    (tmp_path / "scene.txt").write_text(
        "axisAlignment = 1 0 0 0 0 1 0 0 0 0 1 0 0 0 0 1\n"
    )
    (tmp_path / "labels.tsv").write_text(
        "raw_category\tnyu40id\nchair\t5\ntable\t7\n"
    )

    mesh_v, labels, instances, bboxes, obj2label = scannet_labels.export(
        str(mesh_file),
        str(tmp_path / "scene.aggregation.json"),
        str(tmp_path / "scene.segs.json"),
        str(tmp_path / "scene.txt"),
        str(tmp_path / "labels.tsv"),
        output_file=str(tmp_path / "scene"),
    )
    np.testing.assert_array_equal(labels, [5, 5, 5, 7, 7, 7])
    np.testing.assert_array_equal(instances, [1, 1, 1, 2, 2, 2])
    assert obj2label == {1: 5, 2: 7}
    # bbox of object 2: center (5.5, 5.5, 5), extents (1, 1, 0)
    np.testing.assert_allclose(bboxes[1], [5.5, 5.5, 5, 1, 1, 0, 2])
    saved = np.load(tmp_path / "scene_bbox.npy")
    np.testing.assert_allclose(saved, bboxes)
