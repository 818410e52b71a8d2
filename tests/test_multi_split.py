"""Split-program multi-object eval (render/multi.make_multi_eval_stages).

The staged renderer moves program boundaries only — same mute/composite/
pdf helpers on the same inputs as the monolithic `render_rays_multi` —
so its maps must match the monolithic XLA path to fused-kernel tolerance
(the kernels reassociate matmul accumulation; same tolerances as
test_multi_render.test_pallas_path_matches_xla).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from object_nerf_tpu.config import Config
from object_nerf_tpu.models.mlp import ObjectNeRFConfig, init_object_nerf
from object_nerf_tpu.models.code_library import init_code_library
from object_nerf_tpu.render.renderer import RenderSettings
from object_nerf_tpu.render.multi import (
    render_rays_multi,
    make_multi_eval_stages,
)

CFG = ObjectNeRFConfig(
    D=2, W=32, skips=(1,), inst_D=2, inst_W=16, inst_skips=(1,),
    use_voxel_embedding=False, N_obj_code_length=8,
)
SETTINGS = RenderSettings(
    mlp=CFG, N_samples=12, N_importance=6, perturb=0.0, noise_std=0.0,
    is_eval=True,
)
# interpret-mode f32 kernels: the CPU-testable stand-in for the TPU path
SETTINGS_SPLIT = dataclasses.replace(
    SETTINGS, use_pallas=True, pallas_interpret=True, pallas_dtype="float32",
)
FINAL_KEYS = ("rgb_fine", "depth_fine", "opacity_fine")


def _params(cfg=CFG):
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    return {
        "coarse": init_object_nerf(k1, cfg),
        "fine": init_object_nerf(k2, cfg),
        "code_library": init_code_library(k3, 16, cfg.N_obj_code_length),
    }


def _rays(n=6, near=0.5, far=3.0, seed=0):
    rng = np.random.RandomState(seed)
    o = rng.randn(n, 3).astype(np.float32) * 0.05
    d = rng.randn(n, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(np.concatenate(
        [o, d, np.full((n, 1), near, np.float32),
         np.full((n, 1), far, np.float32)], -1,
    ))


def _assert_matches(got, ref, keys=FINAL_KEYS, **tol):
    tol = tol or dict(rtol=1e-3, atol=5e-4)
    for key in keys:
        np.testing.assert_allclose(
            np.asarray(got[key]), np.asarray(ref[key]), err_msg=key, **tol,
        )


def test_split_matches_monolithic_two_objects():
    params = _params()
    rays = _rays()
    rays2 = _rays(seed=3)
    ref = render_rays_multi(
        params, [rays, rays2], (0, 5), jax.random.PRNGKey(0), SETTINGS,
    )
    chunk_fn = make_multi_eval_stages(SETTINGS_SPLIT, (0, 5))
    got = chunk_fn(params, jnp.stack([rays, rays2]))
    _assert_matches(got, ref)


def test_split_muted_rays_transparent():
    rays = np.asarray(_rays()).copy()
    rays[:3, 6:8] = 0.0  # bbox miss ⇒ muted
    chunk_fn = make_multi_eval_stages(SETTINGS_SPLIT, (0,))
    got = chunk_fn(_params(), jnp.stack([jnp.asarray(rays)]))
    assert np.all(np.asarray(got["opacity_fine"])[:3] < 1e-5)


def test_split_removal_boxes_mute_background():
    params = _params()
    rays = _rays()
    affine = jnp.eye(4)[None]
    bounds = jnp.asarray([[[-100.0, -100, -100], [100, 100, 100]]])
    skip = (affine, bounds, 1.0)
    ref = render_rays_multi(
        params, [rays], (0,), jax.random.PRNGKey(0), SETTINGS,
        skip_boxes=skip,
    )
    chunk_fn = make_multi_eval_stages(SETTINGS_SPLIT, (0,))
    got = chunk_fn(params, jnp.stack([rays]), skip_boxes=skip)
    assert float(np.asarray(got["opacity_fine"]).max()) < 1e-5
    _assert_matches(got, ref)


def test_split_coarse_only():
    params = _params()
    rays = _rays()
    s = dataclasses.replace(SETTINGS, N_importance=0)
    ref = render_rays_multi(params, [rays], (0,), jax.random.PRNGKey(0), s)
    chunk_fn = make_multi_eval_stages(
        dataclasses.replace(SETTINGS_SPLIT, N_importance=0), (0,),
    )
    got = chunk_fn(params, jnp.stack([rays]))
    _assert_matches(
        got, ref, keys=("rgb_coarse", "depth_coarse", "opacity_coarse"),
    )


def test_split_voxel_path():
    from object_nerf_tpu.models import voxel_grid as vg

    cfg = dataclasses.replace(CFG, use_voxel_embedding=True, N_freq_voxel=2)
    pts = np.random.RandomState(0).rand(400, 3) * 3 - 1.5
    features, topo, static = vg.build_voxel_grid(
        pts, [0, 0, 0], 1.0, 0.4, 3, 24, 2, 20000,
        key=jax.random.PRNGKey(4),
    )
    assert vg._dense_path_ok(static)
    params = _params(cfg)
    params["voxel_features"] = features
    rays = _rays(8)
    rays2 = _rays(8, seed=5)
    settings = dataclasses.replace(SETTINGS, mlp=cfg)
    ref = render_rays_multi(
        params, [rays, rays2], (0, 3), jax.random.PRNGKey(0), settings,
        voxel_ctx=(features, topo, static),
    )
    chunk_fn = make_multi_eval_stages(
        dataclasses.replace(SETTINGS_SPLIT, mlp=cfg), (0, 3),
        voxel_static=static,
    )
    ct = vg.make_corner_table(features, topo, static)
    got = chunk_fn(params, jnp.stack([rays, rays2]), voxel_topo=topo, ct=ct)
    _assert_matches(got, ref)


def test_split_shard_mesh_matches_single_device():
    """Multi-chip production path: with settings.shard_mesh set, the
    kernel-only stage programs shard_map over the 8-device data mesh
    (GSPMD can't partition tpu_custom_call) and must reproduce the
    unsharded split render bit-closely, with the per-ray outputs actually
    sharded over the mesh."""
    from jax.sharding import Mesh

    mesh = Mesh(np.asarray(jax.devices()[:8]), ("data",))
    params = _params()
    rays = _rays(16)
    rays2 = _rays(16, seed=3)

    ref_fn = make_multi_eval_stages(SETTINGS_SPLIT, (0, 5))
    ref = ref_fn(params, jnp.stack([rays, rays2]))

    sharded = dataclasses.replace(SETTINGS_SPLIT, shard_mesh=mesh)
    got_fn = make_multi_eval_stages(sharded, (0, 5))
    got = got_fn(params, jnp.stack([rays, rays2]))

    _assert_matches(got, ref, rtol=1e-5, atol=1e-6)
    shapes = {s.data.shape for s in got["rgb_fine"].addressable_shards}
    assert shapes == {(2, 3)}, shapes  # 16 rays / 8 devices


def test_editable_renderer_routes_split_path():
    """EditableRenderer._render_multi with pallas settings dispatches the
    staged path (incl. corner-table prebuild) and matches the XLA path."""
    from object_nerf_tpu.edit.editable_renderer import EditableRenderer
    from object_nerf_tpu.models import voxel_grid as vg
    from object_nerf_tpu.config import Config

    cfg = dataclasses.replace(CFG, use_voxel_embedding=True, N_freq_voxel=2)
    pts = np.random.RandomState(1).rand(400, 3) * 3 - 1.5
    features, topo, static = vg.build_voxel_grid(
        pts, [0, 0, 0], 1.0, 0.4, 3, 24, 2, 20000,
        key=jax.random.PRNGKey(7),
    )
    params = _params(cfg)
    params["voxel_features"] = features

    conf = Config({
        "ckpt_config": {
            "dataset_name": "toydesk",
            "model": {
                "use_voxel_embedding": True,
                "D": 2, "W": 32, "skips": [1],
                "inst_D": 2, "inst_W": 16, "inst_skips": [1],
                "N_freq_xyz": 10, "N_freq_dir": 4, "N_freq_voxel": 2,
                "N_scn_voxel_size": 16, "N_obj_voxel_size": 8,
                "N_samples": 12, "N_importance": 6,
                "frustum_bound": -1, "use_disp": False,
                "perturb": 0, "noise_std": 0,
                "N_max_objs": 16, "N_obj_code_length": 8,
            },
            "dataset_extra": {
                "near": 0.5, "far": 3.0, "scale_factor": 1.0,
                "scene_center": [0.0, 0.0, 0.0],
            },
        },
    })
    r = EditableRenderer(conf, params=params,
                         voxel=(features, topo, static))
    r.settings = dataclasses.replace(SETTINGS_SPLIT, mlp=cfg)

    pose = np.eye(4)
    got = r.render_origin(4, 6, pose, fovx_deg=70, chunk=8)
    assert set(got) == set(FINAL_KEYS)
    assert got["rgb_fine"].shape == (24, 3)
    # the renderer cached a staged chunk fn under a use_split=True sig
    assert any(sig[-1] for sig in r._chunk_fns)

    r_xla = EditableRenderer(conf, params=params,
                             voxel=(features, topo, static))
    r_xla.settings = dataclasses.replace(SETTINGS, mlp=cfg)
    ref = r_xla.render_origin(4, 6, pose, fovx_deg=70, chunk=8)
    _assert_matches(got, ref)


def _edit_conf(extra=None):
    conf = Config({
        "ckpt_config": {
            "dataset_name": "toydesk",
            "model": {
                "use_voxel_embedding": False,
                "D": 2, "W": 32, "skips": [1],
                "inst_D": 2, "inst_W": 16, "inst_skips": [1],
                "N_freq_xyz": 10, "N_freq_dir": 4, "N_freq_voxel": 6,
                "N_scn_voxel_size": 16, "N_obj_voxel_size": 8,
                "N_samples": 12, "N_importance": 6,
                "frustum_bound": -1, "use_disp": False,
                "perturb": 0, "noise_std": 0,
                "N_max_objs": 16, "N_obj_code_length": 8,
            },
            "dataset_extra": {
                "near": 0.5, "far": 3.0, "scale_factor": 1.0,
                "scene_center": [0.0, 0.0, 0.0],
            },
        },
    })
    if extra:
        conf.merge(extra)
    return conf


def test_editable_renderer_tpu_config_hooks():
    """The `tpu.*` hooks (use_pallas / pallas_interpret) drive
    EditableRenderer.render_edit through make_multi_eval_stages in
    interpreter mode on CPU — same single-entry-point contract as
    ObjectNeRFSystem (reference render_tools/editable_renderer.py:52-79)."""
    import json as _json
    from object_nerf_tpu.edit.editable_renderer import EditableRenderer

    params = _params()
    conf = _edit_conf({"tpu": {"use_pallas": True, "pallas_interpret": True}})
    # a bbox for object 1 so render_edit can clip its rays
    import tempfile, os
    bbox = {"labels": [{"id": 1, "data": {
        "position": [0.3, 0.0, 0.25], "quaternion": [0, 0, 0, 1],
        "scale": [0.5, 0.5, 0.5]}}]}
    td = tempfile.mkdtemp()
    bbox_path = os.path.join(td, "bbox.json")
    with open(bbox_path, "w") as f:
        _json.dump(bbox, f)
    conf.ckpt_config["dataset_extra"]["bbox_dir"] = bbox_path

    r = EditableRenderer(conf, params=params)
    assert r.settings.use_pallas and r.settings.pallas_interpret
    assert r.settings.pallas_dtype == "float32"

    pose = np.eye(4)
    r.set_object_pose_transform(1, pose, 0)
    Twc = np.eye(4)
    Twc[:3, 3] = [0.0, -2.0, 0.5]
    got = r.render_edit(h=4, w=6, camera_pose_Twc=Twc, fovx_deg=70, chunk=8)
    assert got["rgb_fine"].shape == (24, 3)
    # the staged (split-program) path was actually taken
    assert any(sig[-1] for sig in r._chunk_fns), r._chunk_fns.keys()

    # and it matches the default XLA renderer on the same edit
    conf_xla = _edit_conf()
    conf_xla.ckpt_config["dataset_extra"]["bbox_dir"] = bbox_path
    r_xla = EditableRenderer(conf_xla, params=params)
    assert not r_xla.settings.use_pallas
    r_xla.set_object_pose_transform(1, pose, 0)
    ref = r_xla.render_edit(h=4, w=6, camera_pose_Twc=Twc, fovx_deg=70,
                            chunk=8)
    _assert_matches(got, ref)


def test_editable_renderer_multichip_matches_single_device():
    """EditableRenderer on an 8-device mesh (rays sharded per chunk, params
    replicated, kernel stages shard_map'd via settings.shard_mesh) must
    reproduce the 1-device render — the reference's DDP semantics
    (train.py:261-262) extended to the L5 edit path."""
    from jax.sharding import Mesh
    from object_nerf_tpu.edit.editable_renderer import EditableRenderer

    params = _params()
    tpu = {"tpu": {"use_pallas": True, "pallas_interpret": True}}
    mesh1 = Mesh(np.asarray(jax.devices()[:1]), ("data",))
    mesh8 = Mesh(np.asarray(jax.devices()[:8]), ("data",))

    Twc = np.eye(4)
    Twc[:3, 3] = [0.0, -2.0, 0.5]

    def render(mesh):
        r = EditableRenderer(_edit_conf(dict(tpu)), params=params, mesh=mesh)
        return r, r.render_origin(h=8, w=8, camera_pose_Twc=Twc, chunk=16)

    r8, got = render(mesh8)
    assert r8.settings.shard_mesh is mesh8
    assert r8._stack_sharding is not None
    r1, ref = render(mesh1)
    assert r1.settings.shard_mesh is None and r1._stack_sharding is None
    # sharding the input stack changes GSPMD fusion in the glue programs;
    # the ~1e-7 f32 drift gets amplified at inverse-CDF bin boundaries (a
    # fine z sample moves discontinuously) — one depth element per ~64
    # rays can move ~1.5e-3, same bounded mode as the XLA half below
    _assert_matches(got, ref, rtol=1e-3, atol=2e-3)

    # the XLA (non-pallas) monolithic path also shards cleanly (same
    # amplification mode: one fine sample per ~64 rays crossing a CDF bin
    # boundary moves depth by ~2e-3 — bounded, not a correctness drift)
    g2 = EditableRenderer(_edit_conf(), params=params, mesh=mesh8)
    ref2 = EditableRenderer(_edit_conf(), params=params, mesh=mesh1)
    out2 = g2.render_origin(h=8, w=8, camera_pose_Twc=Twc, chunk=16)
    exp2 = ref2.render_origin(h=8, w=8, camera_pose_Twc=Twc, chunk=16)
    _assert_matches(out2, exp2, rtol=1e-3, atol=2e-3)


def test_split_ten_channel_mask_clip_matches_monolithic():
    """(N, 10) rays (bbox mask interval in ch 8:10) clip fine samples the
    same way in the split stages as in render_rays_multi."""
    params = _params()
    rays8 = _rays()
    rays10 = jnp.concatenate(
        [rays8, jnp.full((rays8.shape[0], 1), 1.0),
         jnp.full((rays8.shape[0], 1), 2.0)], -1,
    )
    ref = render_rays_multi(
        params, [rays10], (0,), jax.random.PRNGKey(0), SETTINGS,
    )
    chunk_fn = make_multi_eval_stages(SETTINGS_SPLIT, (0,))
    got = chunk_fn(params, jnp.stack([rays10]))
    _assert_matches(got, ref)
    # and the clip actually changed the render vs plain 8-ch rays
    plain = chunk_fn(params, jnp.stack([jnp.concatenate(
        [rays8, jnp.zeros((rays8.shape[0], 2))], -1)]))
    assert float(np.abs(np.asarray(got["rgb_fine"])
                        - np.asarray(plain["rgb_fine"])).max()) > 1e-6


def test_compact_hit_order_planner():
    """Host-side hit-compaction planner: stable hits-first permutation,
    ceil(hits/chunk) mixed chunks, None when inapplicable."""
    from object_nerf_tpu.render.multi import compact_hit_order

    n, chunk = 20, 4
    bg = np.asarray(_rays(n))
    ob = np.asarray(_rays(n, seed=3)).copy()
    miss = np.ones(n, bool)
    miss[[2, 7, 8, 15, 16]] = False  # 5 hit rays
    ob[miss, 6:8] = 0.0
    perm, n_mixed = compact_hit_order([bg, ob], (0, 5), chunk)
    assert n_mixed == 2  # ceil(5/4)
    assert set(perm[:5].tolist()) == {2, 7, 8, 15, 16}
    # stable within both groups (pixel order preserved)
    assert perm[:5].tolist() == sorted(perm[:5].tolist())
    assert perm[5:].tolist() == sorted(perm[5:].tolist())

    # inapplicable: single set, background not leading, all rays hit
    assert compact_hit_order([bg], (0,), chunk) is None
    assert compact_hit_order([ob, bg], (5, 0), chunk) is None
    assert compact_hit_order(
        [bg, np.asarray(_rays(n, seed=3))], (0, 5), chunk) is None
    # all-miss: zero mixed chunks
    ob_none = np.asarray(_rays(n, seed=3)).copy()
    ob_none[:, 6:8] = 0.0
    _, nm = compact_hit_order([bg, ob_none], (0, 5), chunk)
    assert nm == 0


def test_editable_renderer_compaction_matches_dense():
    """Hit compaction (background-only programs for all-miss chunks) must
    match the dense render within the documented epsilon budget (muted
    samples contribute only the reference's +1e-10 transmittance epsilon,
    rendering.py:160) — and must actually dispatch both chunk kinds."""
    import json as _json
    import os
    import tempfile

    from object_nerf_tpu.edit.editable_renderer import EditableRenderer

    params = _params()
    bbox = {"labels": [{"id": 1, "data": {
        "position": [0.3, 0.0, 0.25], "quaternion": [0, 0, 0, 1],
        "scale": [0.5, 0.5, 0.5]}}]}
    td = tempfile.mkdtemp()
    bbox_path = os.path.join(td, "bbox.json")
    with open(bbox_path, "w") as f:
        _json.dump(bbox, f)

    Twc = np.eye(4)
    Twc[:3, 3] = [0.3, -2.0, 0.25]
    Twc[:3, :3] = np.array([[1, 0, 0], [0, 0, -1], [0, 1, 0]], float)

    outs = {}
    for compact in (True, False):
        conf = _edit_conf({"tpu": {"compact_edit_rays": compact}})
        conf.ckpt_config["dataset_extra"]["bbox_dir"] = bbox_path
        r = EditableRenderer(conf, params=params)
        assert r.compact_rays is compact
        # removal + duplication (the reference demo's edit state): the
        # background-only program must still see the skip boxes
        r.remove_scene_object_by_ids([1])
        r.set_object_pose_transform(1, np.eye(4), 0)
        outs[compact] = r.render_edit(h=8, w=12, camera_pose_Twc=Twc,
                                      fovx_deg=70, chunk=16)
        if compact:
            sigs = list(r._chunk_fns)
            assert any(s[0] == (0,) for s in sigs), sigs
            assert any(s[0] == (0, 1) for s in sigs), sigs
            assert all(s[3] for s in sigs), sigs  # has_skip in every sig
    _assert_matches(outs[True], outs[False], rtol=1e-6, atol=1e-6)
