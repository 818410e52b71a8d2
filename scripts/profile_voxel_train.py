"""Voxel train-step profiling: where do the milliseconds go, and does a
lower Pallas VMEM limit fix the in-program gather slowdown?

Times a train-shaped grad program (coarse+fine fused ops with the voxel
lookup composed in-program, grads wrt MLP params AND the feature table —
the same structure as the real jitted train step) under VMEM-limit
variants, plus the isolated pieces.

Usage: python scripts/profile_voxel_train.py
"""

import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.profile_voxel_render import timeit  # noqa: E402


def main():
    from object_nerf_tpu.config import load_config
    from object_nerf_tpu.render.renderer import RenderSettings
    from object_nerf_tpu.train.system import init_params
    from object_nerf_tpu.models import voxel_grid as vg
    from object_nerf_tpu.models.embedding import freq_encode
    from object_nerf_tpu.ops.pallas_mlp_vjp import make_fused_mlp_op

    cfg = load_config()
    cfg.model.use_voxel_embedding = True
    cfg.dataset_extra.merge(dict(scale_factor=1.0, near=0.5, far=5.0,
                                 scene_center=[0.0, 0.0, 0.0],
                                 voxel_size=0.1, neighbor_marks=3))
    # the bench scene (plane + 2 spheres), voxel table ~16k rows
    rng = np.random.RandomState(0)
    pts = [rng.rand(8000, 3) * [2.4, 2.4, 0.0] - [1.2, 1.2, 0.0]]
    for c, r in ([[0.3, 0.0, 0.25], 0.25], [[-0.35, 0.2, 0.2], 0.2]):
        d = rng.randn(6000, 3)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        pts.append(np.asarray(c) + r * d)
    pcd = np.concatenate(pts).astype(np.float32)

    settings = RenderSettings.from_config(cfg, is_eval=False, use_pallas=True)
    features, topo, static = vg.build_voxel_grid_from_config(
        pcd, cfg, key=jax.random.PRNGKey(2))
    params = jax.device_put(
        init_params(jax.random.PRNGKey(0), settings, cfg.model, features))
    mlp = settings.mlp
    print(f"grid shape={static.shape} occ={int(topo.n_occupied)} "
          f"cap={static.n_max_voxels}")

    n, s_c, s_f = 2048, 64, 128
    rng = np.random.RandomState(1)
    xyz_c = jnp.asarray((rng.rand(n, s_c, 3) * 2 - 1).astype(np.float32))
    xyz_f = jnp.asarray((rng.rand(n, s_f, 3) * 2 - 1).astype(np.float32))
    dirs = rng.randn(n, 3).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    dir_pe = jax.jit(lambda d: freq_encode(d, mlp.N_freq_dir))(
        jnp.asarray(dirs))
    codes = jnp.asarray(rng.randn(n, mlp.N_obj_code_length)
                        .astype(np.float32) * 0.3)

    def lookup(feats, x):
        raw, _ = vg.voxel_lookup_raw(feats, topo, static, x.reshape(-1, 3),
                                     trilinear=True, lowp=True)
        return raw.reshape(x.shape[0], x.shape[1], -1)

    def make_step(fwd_mb, bwd_mb, bwd_rows):
        op = make_fused_mlp_op(mlp, True, bwd_rows_budget=bwd_rows,
                               fwd_vmem_limit_mb=fwd_mb,
                               bwd_vmem_limit_mb=bwd_mb)

        def loss_fn(p):
            feats = p["voxel_features"]
            tot = 0.0
            for xyz, key in ((xyz_c, "coarse"), (xyz_f, "fine")):
                vox = lookup(feats, xyz)
                sig, rgb, isig, irgb = op(p[key], xyz, dir_pe, codes, vox)
                tot = tot + (jnp.mean(rgb) + jnp.mean(jnp.tanh(sig))
                             + jnp.mean(irgb) + jnp.mean(jnp.tanh(isig)))
            return tot

        return jax.jit(jax.grad(loss_fn))

    base = dict(fwd_mb=100, bwd_mb=117, bwd_rows=4096)
    variants = [
        ("current  f100/b117/r4096", base),
        ("fwd32    f32 /b117/r4096", dict(base, fwd_mb=32)),
        ("both64   f32 /b64 /r2048", dict(fwd_mb=32, bwd_mb=64,
                                          bwd_rows=2048)),
        ("b90r3072 f32 /b90 /r3072", dict(fwd_mb=32, bwd_mb=90,
                                          bwd_rows=3072)),
    ]
    for name, kw in variants:
        try:
            step = make_step(**kw)
            t = timeit(lambda: step(params), iters=15)
            print(f"{name}: {t:7.2f} ms  ({2048 / t * 1000:,.0f} rays/s)")
        except Exception as e:
            print(f"{name}: FAILED {str(e)[:140]}")

    # isolated pieces at the winning config (defaults) for the breakdown
    op = make_fused_mlp_op(mlp, True)
    vox_c = jax.jit(lookup)(params["voxel_features"], xyz_c)
    vox_f = jax.jit(lookup)(params["voxel_features"], xyz_f)
    fwd = jax.jit(lambda p: op(p["fine"], xyz_f, dir_pe, codes, vox_f)[1])
    print(f"fwd kernel fine alone: {timeit(lambda: fwd(params)):7.2f} ms")

    def bwd_only(p):
        sig, rgb, isig, irgb = op(p["fine"], xyz_f, dir_pe, codes, vox_f)
        return jnp.mean(rgb) + jnp.mean(jnp.tanh(sig)) + jnp.mean(irgb)
    bwd = jax.jit(jax.grad(bwd_only))
    print(f"fwd+bwd fine alone (no lookup): "
          f"{timeit(lambda: bwd(params)):7.2f} ms")

    lk = jax.jit(lambda p: lookup(p["voxel_features"], xyz_f))
    print(f"lookup fine alone:     {timeit(lambda: lk(params)):7.2f} ms")

    def lk_grad_fn(p):
        return jnp.sum(lookup(p["voxel_features"], xyz_f) ** 2)
    lkg = jax.jit(jax.grad(lk_grad_fn))
    print(f"lookup fine fwd+grad:  {timeit(lambda: lkg(params)):7.2f} ms")


if __name__ == "__main__":
    main()
