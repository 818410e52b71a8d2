"""Fully-fused render (MLP+compositing kernel) vs the XLA eval pipeline."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from object_nerf_tpu.models.mlp import ObjectNeRFConfig, init_object_nerf
from object_nerf_tpu.models.code_library import init_code_library, lookup_codes
from object_nerf_tpu.render.renderer import (
    RenderSettings, render_rays, render_rays_fused_eval,
)

CFG = ObjectNeRFConfig(
    D=3, W=64, skips=(1,), inst_D=2, inst_W=32, inst_skips=(1,),
    use_voxel_embedding=False, N_obj_code_length=16,
)
SETTINGS = RenderSettings(
    mlp=CFG, N_samples=16, N_importance=8, perturb=0.0, noise_std=0.0,
    forward_instance=True, is_eval=True,
)


def _params():
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    return {
        "coarse": init_object_nerf(k1, CFG),
        "fine": init_object_nerf(k2, CFG),
        "code_library": init_code_library(k3, 8, 16),
    }


def _rays(n=16):
    rng = np.random.RandomState(0)
    o = rng.randn(n, 3).astype(np.float32) * 0.1
    d = rng.randn(n, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(
        np.concatenate(
            [o, d, np.full((n, 1), 0.5, np.float32),
             np.full((n, 1), 3.0, np.float32)], -1,
        )
    )


def test_fused_eval_matches_xla_pipeline():
    params = _params()
    rays = _rays()
    codes = lookup_codes(params["code_library"], jnp.zeros((16,), jnp.int32))

    ref = render_rays(
        params, rays, jax.random.PRNGKey(0), SETTINGS,
        embedding_instance=codes,
    )
    got = render_rays_fused_eval(
        params, rays, SETTINGS, embedding_instance=codes, interpret=True,
    )
    for key in ("rgb_fine", "depth_fine", "opacity_fine",
                "rgb_instance_fine", "depth_instance_fine",
                "opacity_instance_fine"):
        np.testing.assert_allclose(
            np.asarray(got[key]), np.asarray(ref[key]),
            rtol=1e-3, atol=5e-4, err_msg=key,
        )


def test_classical_split_stages_match_xla():
    """The classical split-program renderer (kernel-only programs, the TPU
    fast path) vs the XLA pipeline."""
    from object_nerf_tpu.render.renderer import make_fused_eval_stages

    params = _params()
    rays = _rays()
    codes = lookup_codes(params["code_library"], jnp.zeros((16,), jnp.int32))
    ref = render_rays(
        params, rays, jax.random.PRNGKey(0), SETTINGS,
        embedding_instance=codes,
    )
    settings_i = dataclasses.replace(
        SETTINGS, use_pallas=True, pallas_interpret=True,
        pallas_dtype="float32",
    )
    stages = make_fused_eval_stages(settings_i)
    got = stages(params, rays, codes)
    for key in ("rgb_fine", "depth_fine", "opacity_fine",
                "rgb_instance_fine", "depth_instance_fine",
                "opacity_instance_fine"):
        np.testing.assert_allclose(
            np.asarray(got[key]), np.asarray(ref[key]),
            rtol=1e-3, atol=5e-4, err_msg=f"classical-split:{key}",
        )


def test_split_stages_shard_mesh_matches_single_device():
    """Sharded split eval (VERDICT r3 #1): with settings.shard_mesh set,
    the kernel-only stage programs shard_map their ray axis over the
    8-device mesh and must reproduce the unsharded stages, with outputs
    ray-sharded across the mesh."""
    from jax.sharding import Mesh
    from object_nerf_tpu.render.renderer import make_fused_eval_stages

    mesh = Mesh(np.asarray(jax.devices()[:8]), ("data",))
    params = _params()
    rays = _rays()
    codes = lookup_codes(params["code_library"], jnp.zeros((16,), jnp.int32))
    settings_i = dataclasses.replace(
        SETTINGS, use_pallas=True, pallas_interpret=True,
        pallas_dtype="float32",
    )
    ref = make_fused_eval_stages(settings_i)(params, rays, codes)
    sharded = dataclasses.replace(settings_i, shard_mesh=mesh)
    got = make_fused_eval_stages(sharded)(params, rays, codes)
    for key in ref:
        np.testing.assert_allclose(
            np.asarray(got[key]), np.asarray(ref[key]),
            rtol=1e-5, atol=1e-6, err_msg=f"sharded-split:{key}",
        )
    shapes = {s.data.shape for s in got["rgb_fine"].addressable_shards}
    assert shapes == {(2, 3)}, shapes  # 16 rays / 8 devices


def test_fused_eval_voxel_path():
    import numpy as onp
    from object_nerf_tpu.models import voxel_grid as vg

    cfg = dataclasses.replace(CFG, use_voxel_embedding=True, N_freq_voxel=2)
    k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(1), 4)
    pts = onp.random.RandomState(0).rand(400, 3) * 3 - 1.5
    features, topo, static = vg.build_voxel_grid(
        pts, [0, 0, 0], 1.0, 0.4, 3, 24, 2, 20000, key=k4,
    )
    params = {
        "coarse": init_object_nerf(k1, cfg),
        "fine": init_object_nerf(k2, cfg),
        "code_library": init_code_library(k3, 8, 16),
    }
    settings = dataclasses.replace(SETTINGS, mlp=cfg)
    rays = _rays(8)
    codes = lookup_codes(params["code_library"], jnp.zeros((8,), jnp.int32))
    voxel_ctx = (features, topo, static)
    ref = render_rays(
        params, rays, jax.random.PRNGKey(0), settings, voxel_ctx=voxel_ctx,
        embedding_instance=codes,
    )
    got = render_rays_fused_eval(
        params, rays, settings, voxel_ctx=voxel_ctx,
        embedding_instance=codes, interpret=True,
    )
    for key in ("rgb_fine", "opacity_fine", "rgb_instance_fine"):
        np.testing.assert_allclose(
            np.asarray(got[key]), np.asarray(ref[key]),
            rtol=1e-3, atol=5e-4, err_msg=key,
        )

    # the split-program renderer (gathers isolated from kernel programs,
    # the TPU fast path make_render_fn routes voxel eval through) must
    # produce the same maps
    from object_nerf_tpu.render.renderer import make_fused_eval_stages

    settings_i = dataclasses.replace(
        settings, use_pallas=True, pallas_interpret=True,
        pallas_dtype="float32",
    )
    ct = vg.make_corner_table(features, topo, static, lowp=False)
    stages = make_fused_eval_stages(settings_i, static)
    got_split = stages(params, rays, codes, topo, ct)
    for key in ("rgb_fine", "depth_fine", "opacity_fine",
                "rgb_instance_fine", "depth_instance_fine",
                "opacity_instance_fine"):
        np.testing.assert_allclose(
            np.asarray(got_split[key]), np.asarray(ref[key]),
            rtol=1e-3, atol=5e-4, err_msg=f"split:{key}",
        )


def test_fused_eval_coarse_only_white_back():
    params = _params()
    settings = dataclasses.replace(
        SETTINGS, N_importance=0, white_back=True, forward_instance=False
    )
    rays = _rays(8)
    ref = render_rays(params, rays, jax.random.PRNGKey(0), settings)
    got = render_rays_fused_eval(params, rays, settings, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got["rgb_coarse"]), np.asarray(ref["rgb_coarse"]),
        rtol=1e-3, atol=2e-4,
    )


def test_coarse_weights_kernel_matches_full_kernel_weights():
    """The sigma-only pdf-weights kernel must agree with the full render
    kernel's want_weights output (shared _composite_weights scan + same
    trunk math) — this is what keeps the hierarchical sampler honest."""
    from object_nerf_tpu.models.embedding import freq_encode
    from object_nerf_tpu.ops.pallas_mlp import (
        fused_coarse_weights, fused_render_tiles,
    )

    params = _params()
    rays = _rays(16)
    rays_o, rays_d = rays[:, 0:3], rays[:, 3:6]
    z = jnp.linspace(0.5, 3.0, SETTINGS.N_samples)[None, :].repeat(16, 0)
    z = z + jnp.linspace(0, 0.01, 16)[:, None]  # de-degenerate rows
    xyz = rays_o[:, None, :] + rays_d[:, None, :] * z[..., None]
    dir_pe = freq_encode(rays_d, CFG.N_freq_dir)

    full = fused_render_tiles(
        params["coarse"], CFG, xyz, z, dir_pe,
        forward_instance=True, want_weights=True, interpret=True,
    )
    weights = fused_coarse_weights(
        params["coarse"], CFG, xyz, z, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(weights), np.asarray(full["weights"]), rtol=2e-3,
        atol=1e-5,
    )


def test_bwd_kernel_voxel_scene_only_grad():
    """Regression: voxel embedding + forward_instance=False through the
    custom-VJP op must be differentiable (the ivox PE only exists when the
    instance branch runs)."""
    import dataclasses

    from object_nerf_tpu.ops.pallas_mlp_vjp import make_fused_mlp_op

    cfg = dataclasses.replace(CFG, use_voxel_embedding=True, N_freq_voxel=2)
    k1 = jax.random.PRNGKey(3)
    from object_nerf_tpu.models.mlp import init_object_nerf

    params = init_object_nerf(k1, cfg)
    op = make_fused_mlp_op(cfg, forward_instance=False, interpret=True)
    n, s = 4, 16
    xyz = jax.random.normal(k1, (n, s, 3))
    dir_pe = jax.random.normal(k1, (n, 27))
    codes = jnp.zeros((n, cfg.N_obj_code_length))
    vox = jax.random.normal(k1, (n, s, 24)) * 0.1

    def loss(p, v):
        sigma, rgb, _, _ = op(p, xyz, dir_pe, codes, v)
        return jnp.sum(sigma**2) + jnp.sum(rgb)

    g_p, g_v = jax.grad(loss, argnums=(0, 1))(params, vox)
    assert np.isfinite(float(jnp.sum(g_v)))
    assert np.isfinite(
        float(jnp.sum(g_p["scene"]["trunk"][0]["w"]))
    )


def test_single_program_fused_eval_rejects_rays_in_bbox():
    """The single-program fused eval derives the fine pdf from SCENE
    weights and cannot honor rays_in_bbox's instance-weight pdf semantics
    (reference rendering.py:228-229) — it must refuse, not silently
    diverge. (The split stages DO carry it — next test.)"""
    import pytest

    bbox_settings = dataclasses.replace(SETTINGS, rays_in_bbox=True)
    with pytest.raises(ValueError, match="rays_in_bbox"):
        render_rays_fused_eval(_params(), _rays(), bbox_settings,
                               interpret=True)


def test_split_stages_rays_in_bbox_matches_xla():
    """VERDICT r3 #6: bbox-bounded eval (toy_desk use_bbox) on the fast
    split path — the coarse pass runs the full kernel and the glue routes
    the INSTANCE weights into the fine pdf, matching the monolithic
    render_rays under rays_in_bbox settings (rendering.py:228-229)."""
    from object_nerf_tpu.render.renderer import make_fused_eval_stages

    params = _params()
    rays = _rays()
    codes = lookup_codes(params["code_library"], jnp.zeros((16,), jnp.int32))
    bbox = dataclasses.replace(SETTINGS, rays_in_bbox=True)
    ref = render_rays(
        params, rays, jax.random.PRNGKey(0), bbox, embedding_instance=codes,
    )
    # sanity: under these weights the pdf routing actually changes the fine
    # samples vs scene-weight routing (otherwise this test proves nothing)
    ref_scene = render_rays(
        params, rays, jax.random.PRNGKey(0), SETTINGS,
        embedding_instance=codes,
    )
    assert not np.allclose(
        np.asarray(ref["rgb_fine"]), np.asarray(ref_scene["rgb_fine"]),
        atol=1e-6,
    )
    stages = make_fused_eval_stages(
        dataclasses.replace(bbox, use_pallas=True, pallas_interpret=True,
                            pallas_dtype="float32")
    )
    got = stages(params, rays, codes)
    for key in ("rgb_fine", "depth_fine", "opacity_fine",
                "rgb_instance_fine", "depth_instance_fine",
                "opacity_instance_fine"):
        np.testing.assert_allclose(
            np.asarray(got[key]), np.asarray(ref[key]),
            rtol=1e-3, atol=5e-4, err_msg=f"bbox-split:{key}",
        )


def test_make_render_fn_voxel_beyond_dense_limit_interprets(monkeypatch):
    """Regression: when the voxel grid exceeds the dense corner-table limit,
    make_render_fn falls back from the split-program path to the monolithic
    render_rays_fused_eval — which must receive settings.pallas_interpret
    (it used not to, crashing interpret-mode/CPU sessions on exactly this
    fallback)."""
    import dataclasses

    import numpy as onp
    from object_nerf_tpu.models import voxel_grid as vg
    from object_nerf_tpu.train import system as system_mod

    cfg = dataclasses.replace(CFG, use_voxel_embedding=True, N_freq_voxel=2)
    k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(1), 4)
    pts = onp.random.RandomState(0).rand(400, 3) * 3 - 1.5
    features, topo, static = vg.build_voxel_grid(
        pts, [0, 0, 0], 1.0, 0.4, 3, 24, 2, 20000, key=k4,
    )
    params = {
        "coarse": init_object_nerf(k1, cfg),
        "fine": init_object_nerf(k2, cfg),
        "code_library": init_code_library(k3, 8, 16),
        "voxel_features": features,
    }
    settings = dataclasses.replace(
        SETTINGS, mlp=cfg, use_pallas=True, pallas_interpret=True,
        pallas_dtype="float32",
    )
    # pretend the grid is too big for the prebuilt dense corner table
    monkeypatch.setattr(vg, "_dense_path_ok", lambda s: False)
    render = system_mod.make_render_fn(settings, static, chunk=16)

    rays = _rays(16)
    ids = jnp.zeros((16,), jnp.int32)
    got = render(params, rays, jax.random.PRNGKey(0), ids, topo)

    codes = lookup_codes(params["code_library"], ids)
    ref = render_rays(
        params, rays, jax.random.PRNGKey(0), settings,
        voxel_ctx=(features, topo, static), embedding_instance=codes,
    )
    for key in ("rgb_fine", "depth_fine", "opacity_fine",
                "rgb_instance_fine", "opacity_instance_fine"):
        np.testing.assert_allclose(
            np.asarray(got[key]), np.asarray(ref[key]),
            rtol=1e-3, atol=5e-4, err_msg=key,
        )
