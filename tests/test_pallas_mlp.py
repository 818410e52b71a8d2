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


def test_shard_map_mesh_matches_single_device():
    """mesh= shard_maps the launch over the ray axis (the multi-chip
    production path — GSPMD can't partition tpu_custom_call): outputs must
    equal the unsharded launch, stay ray-sharded across the mesh, and the
    guard must decline meshes that don't divide the rays."""
    import numpy as np
    from jax.sharding import Mesh
    from object_nerf_tpu.ops.pallas_mlp import shard_over_rays

    mesh = Mesh(np.asarray(jax.devices()[:8]), ("data",))
    assert shard_over_rays(mesh, 16) and not shard_over_rays(mesh, 12)
    assert not shard_over_rays(None, 16)

    params = init_object_nerf(jax.random.PRNGKey(0), CFG)
    rng = np.random.RandomState(1)
    n_rays, s = 16, 8
    xyz = jnp.asarray(rng.randn(n_rays, s, 3).astype(np.float32) * 0.5)
    dirs = rng.randn(n_rays, 3).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    dir_pe = freq_encode(jnp.asarray(dirs), CFG.N_freq_dir)
    codes = jnp.asarray(rng.randn(n_rays, 64).astype(np.float32) * 0.1)

    kw = dict(forward_instance=True, dtype=jnp.float32, interpret=True)
    ref = fused_mlp_eval(params, CFG, xyz, dir_pe, codes, **kw)
    got = jax.jit(
        lambda p, x, d, c: fused_mlp_eval(p, CFG, x, d, c, mesh=mesh, **kw)
    )(params, xyz, dir_pe, codes)
    for r, g, name in zip(ref, got, ("sigma", "rgb", "isigma", "irgb")):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(r), rtol=1e-5, atol=1e-6, err_msg=name
        )
        shapes = {sh.data.shape for sh in g.addressable_shards}
        assert len(shapes) == 1 and next(iter(shapes))[0] == 2, (name, shapes)


def test_ray_tile_semantics():
    """Tile-size policy: explicit tiles honored in interpret mode (so the
    kernel tests above really run multi-tile grids), the no-aligned-divisor
    fallback clamps to r=8 instead of silently compiling an n_rays·S-row
    tile over the VMEM budget, and unclampable big shapes fail loudly."""
    from object_nerf_tpu.ops.pallas_mlp import _ray_tile

    # interpret mode honors an exact divisor tile → grid=(2,) in the
    # classical test above (n_rays=8, rays_per_tile=4)
    assert _ray_tile(8, 16, 4 * 16, interpret=True, exact=4) == 4
    assert _ray_tile(4, 8, 2 * 8, interpret=True, exact=2) == 2
    # normal aligned case: largest 8-multiple divisor under budget
    assert _ray_tile(7680, 128, 1536) == 8  # 1536//128=12 → align down to 8
    assert _ray_tile(7680, 64, 2048) == 32
    # budget smaller than one aligned tile: clamp to r=8, never r=n_rays
    # (ADVICE r3: s=256 at budget 1536 used to yield one 7680·256-row tile)
    assert _ray_tile(7680, 256, 1536) == 8
    # tiny unaligned CPU shapes still fall back to one whole-array tile
    assert _ray_tile(7, 16, 32, interpret=True) == 7
    assert _ray_tile(4, 8, 64) == 4
    # big unaligned shapes on the compiled path refuse instead of blowing
    # the VMEM budget
    import pytest

    with pytest.raises(ValueError, match="8-aligned"):
        _ray_tile(7681, 256, 1536)


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


def test_fused_sigma_eval_matches_xla():
    """Mesh-extraction density query (fused_sigma_eval): scene AND
    instance branches, classical AND voxel-conditioned, vs the XLA
    forward — plus the sharded variant over the 8-device mesh."""
    from jax.sharding import Mesh
    from object_nerf_tpu.ops.pallas_mlp import fused_sigma_eval

    rng = np.random.RandomState(3)
    n, s = 256, 16
    pts = jnp.asarray(rng.randn(n, 3).astype(np.float32) * 0.5)

    # classical, scene branch
    params = init_object_nerf(jax.random.PRNGKey(0), CFG)
    emb = freq_encode(pts, CFG.N_freq_xyz)
    ref, _ = scene_forward(params, CFG, emb, None, sigma_only=True)
    got = fused_sigma_eval(params, CFG, pts, samples_per_row=s,
                           dtype=jnp.float32, interpret=True)
    assert got.shape == (n,)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref).reshape(-1),
                               rtol=2e-4, atol=2e-4)

    # classical, instance branch with per-row codes
    codes = jnp.asarray(rng.randn(n // s, 64).astype(np.float32) * 0.1)
    c_flat = jnp.repeat(codes, s, axis=0)
    iref, _ = instance_forward(params, CFG, emb, c_flat, None, None,
                               sigma_only=True)
    igot = fused_sigma_eval(params, CFG, pts, obj_codes=codes,
                            branch="instance", samples_per_row=s,
                            dtype=jnp.float32, interpret=True)
    np.testing.assert_allclose(np.asarray(igot), np.asarray(iref).reshape(-1),
                               rtol=2e-4, atol=2e-4)

    # voxel-conditioned, both branches
    cfg = ObjectNeRFConfig(use_voxel_embedding=True)
    vparams = init_object_nerf(jax.random.PRNGKey(1), cfg)
    raw = jnp.asarray(
        rng.randn(n, cfg.N_scn_voxel_size + cfg.N_obj_voxel_size)
        .astype(np.float32) * 0.1
    )
    scene_emb = freq_encode(raw[:, : cfg.N_scn_voxel_size], cfg.N_freq_voxel)
    inst_emb = freq_encode(raw[:, cfg.N_scn_voxel_size :], cfg.N_freq_voxel)
    vemb = jnp.concatenate([scene_emb, freq_encode(pts, cfg.N_freq_xyz)], -1)
    vref, _ = scene_forward(vparams, cfg, vemb, None, sigma_only=True)
    vgot = fused_sigma_eval(vparams, cfg, pts, voxel_raw=raw,
                            samples_per_row=s, dtype=jnp.float32,
                            interpret=True)
    np.testing.assert_allclose(np.asarray(vgot), np.asarray(vref).reshape(-1),
                               rtol=2e-4, atol=2e-4)
    viref, _ = instance_forward(vparams, cfg, vemb, c_flat, inst_emb, None,
                                sigma_only=True)
    vigot = fused_sigma_eval(vparams, cfg, pts, voxel_raw=raw,
                             obj_codes=codes, branch="instance",
                             samples_per_row=s, dtype=jnp.float32,
                             interpret=True)
    np.testing.assert_allclose(np.asarray(vigot),
                               np.asarray(viref).reshape(-1),
                               rtol=2e-4, atol=2e-4)

    # sharded over the 8-device mesh (mesh-extraction on a pod slice)
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("data",))
    sgot = fused_sigma_eval(params, CFG, pts, samples_per_row=s,
                            dtype=jnp.float32, interpret=True, mesh=mesh)
    np.testing.assert_allclose(np.asarray(sgot), np.asarray(got),
                               rtol=1e-6, atol=1e-6)
