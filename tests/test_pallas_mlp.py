"""Fused Pallas MLP kernel vs the reference XLA path (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from object_nerf_tpu.models.mlp import (
    ObjectNeRFConfig, init_object_nerf, scene_forward, instance_forward,
)
from object_nerf_tpu.models.embedding import freq_encode
from object_nerf_tpu.ops.pallas_mlp import fused_mlp_eval

CFG = ObjectNeRFConfig(use_voxel_embedding=False)


def _xla_reference(params, cfg, xyz, dir_pe, codes):
    n_rays, s, _ = xyz.shape
    flat = xyz.reshape(-1, 3)
    emb = freq_encode(flat, cfg.N_freq_xyz)
    d = jnp.repeat(dir_pe, s, axis=0)
    c = jnp.repeat(codes, s, axis=0)
    sigma, rgb = scene_forward(params, cfg, emb, d)
    isigma, irgb = instance_forward(params, cfg, emb, c, None, d)
    return (
        sigma.reshape(n_rays, s),
        rgb.reshape(n_rays, s, 3),
        isigma.reshape(n_rays, s),
        irgb.reshape(n_rays, s, 3),
    )


def test_fused_matches_xla_classical():
    params = init_object_nerf(jax.random.PRNGKey(0), CFG)
    rng = np.random.RandomState(1)
    n_rays, s = 8, 16
    xyz = jnp.asarray(rng.randn(n_rays, s, 3).astype(np.float32) * 0.5)
    dirs = rng.randn(n_rays, 3).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    dir_pe = freq_encode(jnp.asarray(dirs), CFG.N_freq_dir)
    codes = jnp.asarray(rng.randn(n_rays, 64).astype(np.float32) * 0.1)

    ref = _xla_reference(params, CFG, xyz, dir_pe, codes)
    got = fused_mlp_eval(
        params, CFG, xyz, dir_pe, codes,
        forward_instance=True, rays_per_tile=4,
        dtype=jnp.float32, interpret=True,
    )
    for r, g, name in zip(ref, got, ("sigma", "rgb", "isigma", "irgb")):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(r), rtol=2e-4, atol=2e-4, err_msg=name
        )


def test_fused_voxel_path():
    cfg = ObjectNeRFConfig(use_voxel_embedding=True)
    params = init_object_nerf(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(2)
    n_rays, s = 4, 8
    xyz = jnp.asarray(rng.randn(n_rays, s, 3).astype(np.float32) * 0.5)
    dirs = rng.randn(n_rays, 3).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    dir_pe = freq_encode(jnp.asarray(dirs), cfg.N_freq_dir)
    codes = jnp.asarray(rng.randn(n_rays, 64).astype(np.float32) * 0.1)
    voxel_raw = jnp.asarray(
        rng.randn(n_rays, s, cfg.N_scn_voxel_size + cfg.N_obj_voxel_size)
        .astype(np.float32) * 0.1
    )

    # XLA reference: emb_xyz = [PE(scene_ftr), PE(xyz)], obj_voxel = PE(inst)
    flat = xyz.reshape(-1, 3)
    raw = voxel_raw.reshape(flat.shape[0], -1)
    scene_emb = freq_encode(raw[:, : cfg.N_scn_voxel_size], cfg.N_freq_voxel)
    inst_emb = freq_encode(raw[:, cfg.N_scn_voxel_size :], cfg.N_freq_voxel)
    emb = jnp.concatenate([scene_emb, freq_encode(flat, cfg.N_freq_xyz)], -1)
    d = jnp.repeat(dir_pe, s, axis=0)
    c = jnp.repeat(codes, s, axis=0)
    sigma, rgb = scene_forward(params, cfg, emb, d)
    isigma, irgb = instance_forward(params, cfg, emb, c, inst_emb, d)

    got = fused_mlp_eval(
        params, cfg, xyz, dir_pe, codes, voxel_raw,
        forward_instance=True, rays_per_tile=2,
        dtype=jnp.float32, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(got[0]), np.asarray(sigma.reshape(n_rays, s)),
        rtol=2e-4, atol=2e-4,
    )
    np.testing.assert_allclose(
        np.asarray(got[3]), np.asarray(irgb.reshape(n_rays, s, 3)),
        rtol=2e-4, atol=2e-4,
    )


def test_scene_only_zeros_instance():
    params = init_object_nerf(jax.random.PRNGKey(0), CFG)
    xyz = jnp.zeros((4, 8, 3))
    dir_pe = freq_encode(jnp.ones((4, 3)), CFG.N_freq_dir)
    got = fused_mlp_eval(
        params, CFG, xyz, dir_pe, None,
        forward_instance=False, rays_per_tile=2,
        dtype=jnp.float32, interpret=True,
    )
    assert float(jnp.abs(got[2]).max()) == 0.0


def test_trans_from_alphas_helper():
    """Unit coverage for the in-kernel Hillis-Steele transmittance scan
    (jnp.cumprod is not lowerable on TPU Pallas), incl. a
    non-power-of-two lane count (the fine pass has s = N_samples +
    N_importance, e.g. 24)."""
    import jax.numpy as jnp

    from object_nerf_tpu.ops.pallas_mlp import _trans_from_alphas

    rng = np.random.RandomState(0)
    for r, s in ((4, 24), (8, 16), (3, 7)):
        a = jnp.asarray(rng.rand(r, s).astype(np.float32)) * 0.9
        trans = np.asarray(_trans_from_alphas(a, r, s))
        ref_t = np.cumprod(1.0 - np.asarray(a) + 1e-10, -1)
        ref_t = np.concatenate([np.ones((r, 1)), ref_t[:, :-1]], -1)
        np.testing.assert_allclose(trans, ref_t, rtol=1e-5, atol=1e-7)
