"""Fully-fused train render (MLP + train-mode compositing, custom VJP) vs
the XLA pipeline — forward maps AND gradients, classical + voxel, with
noise, perturbation, occlusion suppression, and pass-through masks."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from object_nerf_tpu.models.mlp import ObjectNeRFConfig, init_object_nerf
from object_nerf_tpu.models.code_library import init_code_library, lookup_codes
from object_nerf_tpu.render.renderer import RenderSettings, render_rays
from object_nerf_tpu.train.losses import total_loss

CFG = ObjectNeRFConfig(
    D=3, W=64, skips=(1,), inst_D=2, inst_W=32, inst_skips=(1,),
    use_voxel_embedding=False, N_obj_code_length=16,
)
LOSS_W = {
    "color_loss_weight": 1.0, "depth_loss_weight": 0.1,
    "opacity_loss_weight": 10.0, "instance_color_loss_weight": 1.0,
    "instance_depth_loss_weight": 0.1,
}


def _settings(**over):
    kw = dict(
        mlp=CFG, N_samples=16, N_importance=8, perturb=1.0, noise_std=1.0,
        forward_instance=True, is_eval=False, frustum_bound_th=0.1,
        pallas_dtype="float32", pallas_interpret=True, fuse_composite=True,
    )
    kw.update(over)
    return RenderSettings(**kw)


def _params(cfg=CFG):
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    return {
        "coarse": init_object_nerf(k1, cfg),
        "fine": init_object_nerf(k2, cfg),
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


def _batch(n, seed=5):
    rng = np.random.RandomState(seed)
    return {
        "rgbs": jnp.asarray(rng.rand(n, 3).astype(np.float32)),
        "depths": jnp.asarray(
            (rng.rand(n).astype(np.float32) * 2) * (rng.rand(n) > 0.3)
        ),
        "valid_mask": jnp.asarray(rng.rand(n) > 0.1),
        "instance_mask": jnp.asarray(rng.rand(n) > 0.5),
        "instance_mask_weight": jnp.asarray(rng.rand(n).astype(np.float32)),
    }


TRAIN_KEYS = (
    "rgb_coarse", "depth_coarse", "opacity_coarse", "weights_coarse",
    "rgb_instance_coarse", "depth_instance_coarse",
    "opacity_instance_coarse",
    "rgb_fine", "depth_fine", "opacity_fine",
    "rgb_instance_fine", "depth_instance_fine", "opacity_instance_fine",
    "z_vals_fine",
)


def test_fused_train_forward_matches_xla():
    """Same key ⇒ same noise/perturb draws ⇒ identical maps."""
    params = _params()
    rays = _rays()
    codes = lookup_codes(params["code_library"], jnp.zeros((16,), jnp.int32))
    pt = jnp.asarray(np.random.RandomState(2).rand(16) > 0.7)

    s_fused = _settings(use_pallas=True)
    s_xla = _settings(use_pallas=False)
    key = jax.random.PRNGKey(4)
    got = render_rays(params, rays, key, s_fused, embedding_instance=codes,
                      pass_through_mask=pt)
    ref = render_rays(params, rays, key, s_xla, embedding_instance=codes,
                      pass_through_mask=pt)
    for k in TRAIN_KEYS:
        np.testing.assert_allclose(
            np.asarray(got[k]), np.asarray(ref[k]), rtol=2e-4, atol=1e-5,
            err_msg=k,
        )


def test_fused_train_gradients_match_xla():
    """jax.grad of the full train loss: fused custom-VJP vs XLA autodiff."""
    params = _params()
    rays = _rays()
    batch = _batch(16)
    pt = jnp.asarray(np.random.RandomState(2).rand(16) > 0.7)
    key = jax.random.PRNGKey(4)

    def loss(p, settings):
        codes = lookup_codes(p["code_library"], jnp.zeros((16,), jnp.int32))
        out = render_rays(p, rays, key, settings, embedding_instance=codes,
                          pass_through_mask=pt)
        lv, _ = total_loss(out, batch, LOSS_W, True)
        return lv

    lf, gf = jax.value_and_grad(lambda p: loss(p, _settings(use_pallas=True)))(params)
    lx, gx = jax.value_and_grad(lambda p: loss(p, _settings(use_pallas=False)))(params)
    np.testing.assert_allclose(float(lf), float(lx), rtol=1e-5)
    flat_x = dict(jax.tree_util.tree_leaves_with_path(gx))
    for path, leaf in jax.tree_util.tree_leaves_with_path(gf):
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(flat_x[path]), rtol=2e-3, atol=2e-6,
            err_msg=jax.tree_util.keystr(path),
        )


def test_fused_train_voxel_gradients_match_xla():
    import numpy as onp

    from object_nerf_tpu.models import voxel_grid as vg

    cfg = dataclasses.replace(CFG, use_voxel_embedding=True, N_freq_voxel=2)
    k4 = jax.random.PRNGKey(7)
    pts = onp.random.RandomState(0).rand(400, 3) * 3 - 1.5
    features, topo, static = vg.build_voxel_grid(
        pts, [0, 0, 0], 1.0, 0.4, 3, 24, 2, 20000, key=k4,
    )
    params = _params(cfg)
    rays = _rays(8)
    batch = _batch(8)
    key = jax.random.PRNGKey(11)

    def loss(p, ftr, settings):
        codes = lookup_codes(p["code_library"], jnp.zeros((8,), jnp.int32))
        out = render_rays(p, rays, key, settings,
                          voxel_ctx=(ftr, topo, static),
                          embedding_instance=codes)
        lv, _ = total_loss(out, batch, LOSS_W, True)
        return lv

    def settings(use_pallas):
        return _settings(mlp=cfg, use_pallas=use_pallas, N_samples=12,
                         N_importance=4)

    grads_f = jax.value_and_grad(
        lambda p, f: loss(p, f, settings(True)), argnums=(0, 1)
    )(params, features)
    grads_x = jax.value_and_grad(
        lambda p, f: loss(p, f, settings(False)), argnums=(0, 1)
    )(params, features)
    np.testing.assert_allclose(
        float(grads_f[0]), float(grads_x[0]), rtol=1e-5
    )
    gfp, gff = grads_f[1]
    gxp, gxf = grads_x[1]
    np.testing.assert_allclose(
        np.asarray(gff), np.asarray(gxf), rtol=2e-3, atol=2e-6
    )
    flat_x = dict(jax.tree_util.tree_leaves_with_path(gxp))
    for path, leaf in jax.tree_util.tree_leaves_with_path(gfp):
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(flat_x[path]), rtol=2e-3,
            atol=2e-6, err_msg=jax.tree_util.keystr(path),
        )


def test_fused_train_rays_in_bbox_weights():
    """rays_in_bbox routes INSTANCE weights into the pdf on both paths."""
    params = _params()
    rays = _rays(8)
    codes = lookup_codes(params["code_library"], jnp.zeros((8,), jnp.int32))
    key = jax.random.PRNGKey(3)
    s_bbox = _settings(use_pallas=True, rays_in_bbox=True,
                       perturb=0.0, noise_std=0.0)
    s_ref = _settings(use_pallas=False, rays_in_bbox=True,
                      perturb=0.0, noise_std=0.0)
    got = render_rays(params, rays, key, s_bbox, embedding_instance=codes)
    ref = render_rays(params, rays, key, s_ref, embedding_instance=codes)
    np.testing.assert_allclose(
        np.asarray(got["weights_coarse"]),
        np.asarray(ref["weights_coarse"]), rtol=2e-4, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(got["z_vals_fine"]),
        np.asarray(ref["z_vals_fine"]), rtol=1e-5, atol=1e-6,
    )


def test_fused_train_rays_in_bbox_without_instance_branch():
    """Regression: rays_in_bbox + forward_instance=False must not crash
    (falls back to scene weights, matching the XLA path's behavior)."""
    params = _params()
    rays = _rays(8)
    key = jax.random.PRNGKey(3)
    s_fused = _settings(use_pallas=True, rays_in_bbox=True,
                        forward_instance=False, perturb=0.0, noise_std=0.0)
    s_ref = _settings(use_pallas=False, rays_in_bbox=True,
                      forward_instance=False, perturb=0.0, noise_std=0.0)
    got = render_rays(params, rays, key, s_fused)
    ref = render_rays(params, rays, key, s_ref)
    np.testing.assert_allclose(
        np.asarray(got["rgb_fine"]), np.asarray(ref["rgb_fine"]),
        rtol=2e-4, atol=1e-5,
    )
