"""Rows-mode voxel kernels (in-kernel trilinear reduce, direct rows
cotangent) vs the XLA pipeline — f32 interpret, gradient-exact.

The critical surface: the feature-TABLE gradient must be identical whether
the trilinear weighted sum (and its expansion VJP) runs in XLA
(voxel_lookup_dense + plain op) or inside the kernels
(voxel_lookup_rows + vox_rows_mode op). Covers out-of-grid samples (their
weights are zeroed, reproducing the masking) and the invalid-corner zero
rows.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from object_nerf_tpu.models import voxel_grid as vg
from object_nerf_tpu.models.embedding import freq_encode
from object_nerf_tpu.models.mlp import (
    ObjectNeRFConfig, init_object_nerf, instance_forward, scene_forward,
)
from object_nerf_tpu.ops.pallas_mlp_vjp import make_fused_mlp_op

CFG = ObjectNeRFConfig(
    D=2, W=32, skips=(1,), inst_D=2, inst_W=32, inst_skips=(1,),
    use_voxel_embedding=True, N_obj_code_length=16, N_freq_voxel=2,
    N_scn_voxel_size=16, N_obj_voxel_size=8,
)


def _fixtures():
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(3), 3)
    pts = np.random.RandomState(0).rand(400, 3) * 3 - 1.5
    features, topo, static = vg.build_voxel_grid(
        pts, [0, 0, 0], 1.0, 0.4, 3, 24, 2, 20000, key=k3,
    )
    params = {"mlp": init_object_nerf(k1, CFG), "features": features}
    n, s = 8, 6
    rng = np.random.RandomState(1)
    # mix of in-grid and (deliberately) out-of-grid sample positions
    xyz = rng.randn(n, s, 3).astype(np.float32) * 1.2
    xyz[0, 0] = [9.0, 9.0, 9.0]
    dirs = rng.randn(n, 3).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    codes = rng.randn(n, 16).astype(np.float32) * 0.3
    return (params, topo, static, jnp.asarray(xyz),
            freq_encode(jnp.asarray(dirs), CFG.N_freq_dir),
            jnp.asarray(codes))


def _out_loss(sig, rgb, isig, irgb):
    return (jnp.sum(jnp.tanh(sig) * 0.3) + jnp.sum(rgb)
            + jnp.sum(jnp.tanh(isig) * 0.1) + jnp.sum(irgb * 0.7))


def test_rows_mode_matches_xla_forward_and_grads():
    params, topo, static, xyz, dir_pe, codes = _fixtures()
    n, s, _ = xyz.shape

    op_rows = make_fused_mlp_op(CFG, True, dtype=jnp.float32,
                                interpret=True, vox_rows_mode=True)

    def loss_rows(p):
        rows, wts = vg.voxel_lookup_rows(
            p["features"], topo, static, xyz.reshape(-1, 3), lowp=False)
        sig, rgb, isig, irgb = op_rows(
            p["mlp"], xyz, dir_pe, codes,
            rows.reshape(n, s, -1), wts.reshape(n, s, 8))
        return _out_loss(sig, rgb, isig, irgb)

    def loss_xla(p):
        raw, _ = vg.voxel_lookup_raw(
            p["features"], topo, static, xyz.reshape(-1, 3), trilinear=True)
        emb = jnp.concatenate(
            [freq_encode(raw[:, :16], CFG.N_freq_voxel),
             freq_encode(xyz.reshape(-1, 3), CFG.N_freq_xyz)], -1)
        obj_vox = freq_encode(raw[:, 16:], CFG.N_freq_voxel)
        dflat = jnp.repeat(dir_pe, s, axis=0)
        cflat = jnp.repeat(codes, s, axis=0)
        sig, rgb = scene_forward(p["mlp"], CFG, emb, dflat)
        isig, irgb = instance_forward(p["mlp"], CFG, emb, cflat, obj_vox,
                                      dflat)
        return _out_loss(sig, rgb, isig, irgb)

    lr, gr = jax.value_and_grad(loss_rows)(params)
    lx, gx = jax.value_and_grad(loss_xla)(params)
    np.testing.assert_allclose(float(lr), float(lx), rtol=1e-5)
    # feature-TABLE gradient through the rows-mode path
    np.testing.assert_allclose(
        np.asarray(gr["features"]), np.asarray(gx["features"]),
        rtol=1e-4, atol=1e-6,
    )
    flat_x = dict(jax.tree_util.tree_leaves_with_path(gx["mlp"]))
    for path, leaf in jax.tree_util.tree_leaves_with_path(gr["mlp"]):
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(flat_x[path]),
            rtol=1e-4, atol=1e-6, err_msg=jax.tree_util.keystr(path),
        )


def test_rows_mode_through_render_settings():
    """render_rays with pallas_vox_rows routes the train path through the
    rows-mode op and matches the plain XLA render + grads."""
    from object_nerf_tpu.render.renderer import RenderSettings, render_rays

    params, topo, static, xyz, dir_pe, codes = _fixtures()
    rparams = {"coarse": params["mlp"],
               "fine": init_object_nerf(jax.random.PRNGKey(9), CFG),
               "voxel_features": params["features"]}
    n = 8
    rng = np.random.RandomState(2)
    o = rng.randn(n, 3).astype(np.float32) * 0.1
    d = rng.randn(n, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays = jnp.asarray(np.concatenate(
        [o, d, np.full((n, 1), 0.4, np.float32),
         np.full((n, 1), 2.5, np.float32)], -1))

    base = RenderSettings(
        mlp=CFG, N_samples=8, N_importance=4, perturb=0.0, noise_std=0.0,
        forward_instance=True,
    )
    pallas = dataclasses.replace(
        base, use_pallas=True, pallas_interpret=True,
        pallas_dtype="float32", pallas_vox_rows=True,
    )

    def loss(settings):
        def f(p):
            out = render_rays(
                p, rays, jax.random.PRNGKey(0), settings,
                voxel_ctx=(p["voxel_features"], topo, static),
                embedding_instance=codes,
            )
            return (jnp.sum(out["rgb_fine"]) + jnp.sum(out["rgb_coarse"])
                    + jnp.sum(out["opacity_instance_fine"]))
        return jax.value_and_grad(f)(rparams)

    lx, gx = loss(base)
    lr, gr = loss(pallas)
    # f32 summation-order drift (one concat matmul vs XLA's split matmuls)
    # — same tolerance class as the other fused-vs-XLA render tests
    np.testing.assert_allclose(float(lr), float(lx), rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(gr["voxel_features"]), np.asarray(gx["voxel_features"]),
        rtol=1e-3, atol=1e-5,
    )
