"""Editable renderer: edit-state machinery, ray counter-transform, rendering."""

import json

import numpy as np
import jax
import pytest

from object_nerf_tpu.config import Config
from object_nerf_tpu.models.mlp import ObjectNeRFConfig, init_object_nerf
from object_nerf_tpu.models.code_library import init_code_library
from object_nerf_tpu.edit.editable_renderer import EditableRenderer
from object_nerf_tpu.edit.bbox import BBoxRayHelper


@pytest.fixture
def desk_setup(tmp_path):
    bbox = {
        "labels": [
            {"id": 1, "data": {"position": [0.3, 0.0, 0.25],
                               "quaternion": [0, 0, 0, 1],
                               "scale": [0.5, 0.5, 0.5]}},
            {"id": 2, "data": {"position": [-0.35, 0.2, 0.2],
                               "quaternion": [0, 0, 0, 1],
                               "scale": [0.4, 0.4, 0.4]}},
        ]
    }
    bbox_path = tmp_path / "bbox.json"
    bbox_path.write_text(json.dumps(bbox))

    ckpt_config = {
        "dataset_name": "toydesk",
        "model": {
            "use_voxel_embedding": False,
            "D": 2, "W": 32, "skips": [1],
            "inst_D": 2, "inst_W": 16, "inst_skips": [1],
            "N_freq_xyz": 10, "N_freq_dir": 4, "N_freq_voxel": 6,
            "N_scn_voxel_size": 16, "N_obj_voxel_size": 8,
            "N_samples": 8, "N_importance": 4,
            "frustum_bound": -1, "use_disp": False,
            "perturb": 0, "noise_std": 0,
            "N_max_objs": 16, "N_obj_code_length": 8,
        },
        "dataset_extra": {
            "near": 0.5, "far": 5.0, "scale_factor": 1.0,
            "scene_center": [0.0, 0.0, 0.0],
            "bbox_dir": str(bbox_path),
        },
    }
    cfg = Config({"ckpt_config": ckpt_config, "chunk": 512})
    mlp_cfg = ObjectNeRFConfig(
        D=2, W=32, skips=(1,), inst_D=2, inst_W=16, inst_skips=(1,),
        use_voxel_embedding=False, N_obj_code_length=8,
    )
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    params = {
        "coarse": init_object_nerf(k1, mlp_cfg),
        "fine": init_object_nerf(k2, mlp_cfg),
        "code_library": init_code_library(k3, 16, 8),
    }
    return cfg, params


def test_bbox_helper_desk(desk_setup):
    cfg, _ = desk_setup
    helper = BBoxRayHelper(
        Config({"dataset_name": "toydesk",
                "dataset_extra": cfg.ckpt_config.dataset_extra}), 1
    )
    # ray straight at the box from +z
    o = np.array([[0.3, 0.0, 3.0]])
    d = np.array([[0.0, 0.0, -1.0]])
    hit, near, far = helper.get_ray_bbox_intersections(o, d, scale_factor=1.0)
    assert hit[0]
    np.testing.assert_allclose(near[0, 0], 3.0 - 0.5, atol=1e-5)
    np.testing.assert_allclose(far[0, 0], 3.0, atol=1e-5)
    # miss
    o2 = np.array([[5.0, 5.0, 3.0]])
    hit2, _, _ = helper.get_ray_bbox_intersections(o2, d, scale_factor=1.0)
    assert not hit2[0]


def test_render_edit_duplication_and_rotation(desk_setup):
    cfg, params = desk_setup
    r = EditableRenderer(cfg, params=params)

    def rot_z(deg):
        t = np.deg2rad(deg)
        m = np.eye(4)
        m[0, 0] = m[1, 1] = np.cos(t)
        m[0, 1] = -np.sin(t)
        m[1, 0] = np.sin(t)
        return m

    r.set_object_pose_transform(1, rot_z(30), 0)
    dup = np.eye(4)
    dup[:3, 3] = [0.0, 0.4, 0.0]
    r.set_object_pose_transform(1, dup, 1)  # duplicate, shifted

    Twc = np.eye(4)
    Twc[:3, 3] = [0.0, -2.0, 0.5]
    Twc[:3, :3] = np.array([[1, 0, 0], [0, 0, 1], [0, -1, 0]], float)

    out = r.render_edit(h=12, w=16, camera_pose_Twc=Twc, fovx_deg=70, chunk=64)
    assert out["rgb_fine"].shape == (12 * 16, 3)
    assert np.isfinite(out["rgb_fine"]).all()
    # three ray sets were active: background + 2 duplications
    assert r.active_object_ids == [0, 1, 1]


def test_pure_rotation_moves_object_keeps_background(desk_setup):
    """The demo's pure_rotation edit (demo_editable_render.py helpers):
    rotated-object pixels change, rays that never touch a bbox are
    bit-identical (reference test/demo_editable_render.py:64-90)."""
    import sys, os
    sys.path.insert(
        0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "scripts")
    )
    from demo_editable_render import get_pure_rotation

    cfg, params = desk_setup
    # bit-exactness of untouched background pixels is a property of the
    # DENSE composite; hit compaction moves all-miss chunks onto the
    # background-only program, which differs at the +1e-10 transmittance
    # epsilon (~1e-8) — covered by its own equivalence test
    # (test_multi_split.test_editable_renderer_compaction_matches_dense)
    cfg.merge({"tpu": {"compact_edit_rays": False}})
    r = EditableRenderer(cfg, params=params)
    assert not r.compact_rays
    Twc = np.eye(4)
    Twc[:3, 3] = [0.3, -2.0, 0.25]
    # camera -z (view direction, NeRF convention) points along world +y
    Twc[:3, :3] = np.array([[1, 0, 0], [0, 0, -1], [0, 1, 0]], float)
    h, w = 12, 16

    def render(deg):
        r.set_object_pose_transform(1, get_pure_rotation(deg / 180.0), 0)
        out = r.render_edit(h=h, w=w, camera_pose_Twc=Twc, fovx_deg=70,
                            chunk=64)
        r.reset_active_object_ids()
        return np.asarray(out["rgb_fine"]).reshape(h, w, 3)

    a, b = render(0.0), render(120.0)
    diff = np.abs(a - b).mean(-1)

    # rotation-invariant object region: the bbox's bounding sphere. Rays
    # whose line stays outside it can never touch the object at ANY angle.
    from object_nerf_tpu.data.ray_utils import get_ray_directions, get_rays
    focal = 0.5 * w / np.tan(0.5 * np.deg2rad(70))
    dirs = get_ray_directions(h, w, focal)
    rays_o = np.asarray(get_rays(dirs, Twc[:3])[0]).reshape(-1, 3)
    rays_d = np.asarray(get_rays(dirs, Twc[:3])[1]).reshape(-1, 3)
    center = np.array([0.3, 0.0, 0.25])
    radius = np.linalg.norm([0.5, 0.5, 0.5]) / 2  # bbox bounding sphere
    to_c = center - rays_o
    t = np.sum(to_c * rays_d, -1) / np.sum(rays_d * rays_d, -1)
    dist = np.linalg.norm(to_c - t[:, None] * rays_d, axis=-1)
    inside = (dist < radius).reshape(h, w)
    outside = (dist > radius * 1.05).reshape(h, w)
    assert inside.any() and outside.any()
    assert diff[inside].max() > 1e-4, "rotation changed nothing in the object"
    np.testing.assert_array_equal(diff[outside], 0.0)


def test_render_origin_and_removal(desk_setup):
    cfg, params = desk_setup
    r = EditableRenderer(cfg, params=params)
    Twc = np.eye(4)
    Twc[:3, 3] = [0.0, -2.0, 0.5]

    out0 = r.render_origin(h=8, w=8, camera_pose_Twc=Twc, chunk=64)
    assert out0["rgb_fine"].shape == (64, 3)

    r.remove_scene_object_by_ids([2])
    out1 = r.render_edit(h=8, w=8, camera_pose_Twc=Twc, render_bg_only=True,
                         chunk=64)
    assert out1["rgb_fine"].shape == (64, 3)
    assert np.isfinite(out1["rgb_fine"]).all()


def test_checkpoint_roundtrip(tmp_path, desk_setup):
    import jax.numpy as jnp
    from object_nerf_tpu.train.checkpoint import (
        save_checkpoint, load_any_checkpoint, save_config_snapshot,
        latest_checkpoint,
    )
    from object_nerf_tpu.train.system import TrainState

    cfg, params = desk_setup
    state = TrainState(params, {"dummy": jnp.zeros(3)}, jnp.int32(7))
    save_checkpoint(tmp_path / "ckpts", state, step=7)
    save_config_snapshot(tmp_path / "ckpts", cfg)
    path = latest_checkpoint(tmp_path / "ckpts")
    assert path is not None and path.name == "step_7"
    restored = load_any_checkpoint(path, cfg.ckpt_config.model)
    assert restored["step"] == 7
    w0 = np.asarray(params["coarse"]["scene"]["trunk"][0]["w"])
    w1 = np.asarray(restored["params"]["coarse"]["scene"]["trunk"][0]["w"])
    np.testing.assert_array_equal(w0, w1)
