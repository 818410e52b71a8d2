import numpy as np

from object_nerf_tpu.tools.visualize import (
    SceneVisualizer, visualize_instance_2d,
)
from object_nerf_tpu.data.ply_io import read_ply
from object_nerf_tpu.utils.train_helper import visualize_val_image, visualize_depth


def test_scene_visualizer_ply(tmp_path):
    vis = SceneVisualizer()
    vis.add_points(np.random.rand(50, 3))
    vis.add_bbox(np.array([[0, 0, 0], [1, 1, 1]]), color=(1, 0, 0))
    pose = np.eye(4)[:3]
    vis.add_camera(pose)
    vis.add_trajectory([np.eye(4)[:3], np.eye(4)[:3] + 0.1])
    out = vis.save(tmp_path / "vis.ply")
    m = read_ply(out)
    assert m["points"].shape[0] > 50
    assert m["colors"] is not None


def test_instance_2d_overlay(tmp_path):
    import cv2

    inst = np.zeros((24, 32), np.uint16)
    inst[5:15, 5:15] = 3
    inst[2:6, 20:30] = 7
    p = tmp_path / "0.instance.png"
    cv2.imwrite(str(p), inst)
    out, ids = visualize_instance_2d(p, tmp_path / "overlay.png")
    assert set(ids) == {0, 3, 7}
    assert (tmp_path / "overlay.png").exists()


def test_val_panels():
    h, w = 6, 8
    n = h * w
    batch = {"rgbs": np.random.rand(n, 3), "depths": np.random.rand(n)}
    results = {
        "rgb_fine": np.random.rand(n, 3),
        "depth_fine": np.random.rand(n),
        "rgb_instance_fine": np.random.rand(n, 3),
        "depth_instance_fine": np.random.rand(n),
        "opacity_instance_fine": np.random.rand(n),
    }
    stack = visualize_val_image((w, h), batch, results)
    assert stack.shape == (7, h, w, 3)  # the 7-panel reference layout
    assert stack.min() >= 0 and stack.max() <= 1


def test_depth_colormap_handles_zeros():
    d = np.zeros((4, 4))
    img = visualize_depth(d)
    assert img.shape == (4, 4, 3)


def test_scene_visualizer_html(tmp_path):
    """The standalone WebGL viewer embeds every layer + labels."""
    import base64

    from object_nerf_tpu.tools.visualize import SceneVisualizer

    vis = SceneVisualizer()
    pts = np.random.RandomState(0).rand(100, 3).astype(np.float32)
    vis.add_points(pts, colors=np.ones((100, 3), np.float32) * 0.5)
    vis.add_bbox(np.array([[0, 0, 0], [1, 1, 1]], np.float32))
    vis.add_camera(np.eye(4))
    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32)
    faces = np.array([[0, 1, 2], [0, 1, 3]])
    vis.add_mesh(verts, faces)
    vis.add_label([0.5, 0.5, 0.5], "obj 4")

    out = vis.save(str(tmp_path / "scene.html"))
    html = open(out).read()
    assert "<canvas" in html and "webgl" in html
    assert "obj 4" in html  # label text embedded

    import json as _json
    import re

    data = _json.loads(re.search(r"const DATA=(\[.*?\]), LABELS", html).group(1))
    kinds = {d["name"]: d for d in data}
    assert kinds["points"]["n"] == 100
    # 12 bbox edges + 4 camera frustum edges = 16 segments = 32 endpoints
    assert kinds["lines"]["n"] == 32
    assert kinds["mesh_0"]["n"] == 6  # 2 triangles
    # buffers decode to n*3 float32
    for d in data:
        raw = base64.b64decode(d["pos"])
        assert len(raw) == d["n"] * 3 * 4


def test_scene_visualizer_ply_unchanged_by_html_features(tmp_path):
    """PLY export still flattens lines into 32-pt strips (old contract)."""
    from object_nerf_tpu.data.ply_io import read_ply
    from object_nerf_tpu.tools.visualize import SceneVisualizer

    vis = SceneVisualizer()
    vis.add_points(np.zeros((10, 3), np.float32))
    vis.add_line([0, 0, 0], [1, 1, 1])
    vis.add_label([0, 0, 1], "ignored in ply")
    out = vis.save(str(tmp_path / "scene.ply"))
    m = read_ply(out)
    assert m["points"].shape == (10 + 32, 3)
