"""Component-level timing of the voxel-conditioned eval render (one chunk).

Times each stage of the 7680-ray chunk pipeline in isolation on the real
device: corner-table build, row gather, trilinear weighted-sum, full
lookup, sigma-only coarse kernel (with/without voxel), fused fine kernel
(with/without voxel), and the end-to-end chunk program. Host-fetches a
scalar after every timed program (block_until_ready is async on axon).

Usage: python scripts/profile_voxel_render.py
"""

import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def fetch(x):
    return float(np.asarray(jax.tree_util.tree_leaves(x)[0].sum()))


def timeit(fn, iters=20, warmup=3):
    """Async-pipelined timing: dispatch `iters` programs back-to-back and
    host-fetch only the last result. Device execution is serialized, so the
    total covers all programs while the per-dispatch tunnel round-trip
    (~25 ms on axon, measured) overlaps device compute — the same regime
    the real chunked renderer runs in."""
    for _ in range(warmup):
        out = fn()
    fetch(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    fetch(out)
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def main():
    from object_nerf_tpu.config import load_config
    from object_nerf_tpu.render.renderer import (
        RenderSettings, render_rays_fused_eval,
    )
    from object_nerf_tpu.train.system import init_params
    from object_nerf_tpu.models import voxel_grid as vg
    import bench

    cfg = load_config()
    cfg.model.use_voxel_embedding = True
    cfg.dataset_extra.merge(dict(scale_factor=2.5,
                                 scene_center=[0.0, 0.0, 1.25],
                                 voxel_size=0.1, neighbor_marks=3))

    # same scene construction as bench._bench_voxel_render
    rng = np.random.RandomState(0)
    pts = []
    f = rng.rand(60000, 3).astype(np.float32)
    pts.append(f * [6.0, 6.0, 0.0] - [3.0, 3.0, 0.0])
    for ax, sgn in ((0, -3.0), (0, 3.0), (1, -3.0), (1, 3.0)):
        wpts = rng.rand(25000, 3).astype(np.float32) * [6.0, 6.0, 2.5]
        wpts[:, :2] -= 3.0
        wpts[:, ax] = sgn
        pts.append(wpts)
    for c, r in ([[0.8, 0.0, 0.6], 0.6], [[-0.9, 0.5, 0.45], 0.45]):
        d = rng.randn(20000, 3)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        pts.append((np.asarray(c) + r * d).astype(np.float32))
    pcd = np.concatenate(pts)

    settings = RenderSettings.from_config(cfg, is_eval=True, use_pallas=True)
    features, topo, static = vg.build_voxel_grid_from_config(
        pcd, cfg, key=jax.random.PRNGKey(2)
    )
    params = jax.device_put(
        init_params(jax.random.PRNGKey(0), settings, cfg.model, features)
    )
    print(f"grid shape={static.shape} occ={int(topo.n_occupied)} "
          f"cap={static.n_max_voxels}")

    n, s_c, s_f = 7680, 64, 128
    rng = np.random.RandomState(1)
    xyz_c = (rng.rand(n, s_c, 3).astype(np.float32) * 2.0 - 1.0) * 1.1
    xyz_f = (rng.rand(n, s_f, 3).astype(np.float32) * 2.0 - 1.0) * 1.1
    xyz_c_d, xyz_f_d = jnp.asarray(xyz_c), jnp.asarray(xyz_f)

    # 1. corner-table build (+bf16 cast)
    build = jax.jit(lambda f: vg.make_corner_table(f, topo, static,
                                                   lowp=True))
    ct = build(params["voxel_features"])
    print(f"ct: {ct.shape} {ct.dtype} "
          f"({ct.size * ct.dtype.itemsize / 1e6:.0f} MB)")
    print(f"ct build+cast: {timeit(lambda: build(params['voxel_features'])):8.2f} ms")

    # 2. row gather alone (fine-pass size)
    Y, Z = static.shape[1], static.shape[2]
    flat_f = jnp.asarray(
        rng.randint(0, (static.shape[0] + 1) * (Y + 1) * (Z + 1),
                    size=(n * s_f,), dtype=np.int32))
    gather = jax.jit(lambda t, i: jnp.take(t, i, axis=0))
    print(f"gather {n*s_f} rows x {ct.shape[1]}ch bf16: "
          f"{timeit(lambda: gather(ct, flat_f)):8.2f} ms")
    # narrower gather for comparison: 24-ch rows from the feature table
    feat_bf16 = params["voxel_features"].astype(jnp.bfloat16)
    flat_cap = jnp.asarray(rng.randint(0, static.n_max_voxels,
                                       size=(n * s_f,), dtype=np.int32))
    print(f"gather {n*s_f} rows x 24ch bf16:  "
          f"{timeit(lambda: gather(feat_bf16, flat_cap)):8.2f} ms")

    # 3. full dense lookup (fine size), prebuilt ct
    lookup = jax.jit(
        lambda f, x: vg.voxel_lookup_dense(f, topo, static,
                                           x.reshape(-1, 3), lowp=True,
                                           ct=ct)[0])
    print(f"full lookup fine ({n*s_f} samples): "
          f"{timeit(lambda: lookup(params['voxel_features'], xyz_f_d)):8.2f} ms")
    lookup_c = jax.jit(
        lambda f, x: vg.voxel_lookup_dense(f, topo, static,
                                           x.reshape(-1, 3), lowp=True,
                                           ct=ct)[0])
    print(f"full lookup coarse ({n*s_c} samples): "
          f"{timeit(lambda: lookup_c(params['voxel_features'], xyz_c_d)):8.2f} ms")

    # 4. kernels with and without voxel conditioning
    from object_nerf_tpu.ops.pallas_mlp import (
        fused_coarse_weights, fused_render_tiles,
    )
    from object_nerf_tpu.models.embedding import freq_encode

    z_c = jnp.broadcast_to(jnp.linspace(0.05, 2.4, s_c)[None], (n, s_c))
    z_f = jnp.broadcast_to(jnp.linspace(0.05, 2.4, s_f)[None], (n, s_f))
    dirs = rng.randn(n, 3).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    dir_pe = freq_encode(jnp.asarray(dirs), settings.mlp.N_freq_dir)
    codes = jnp.zeros((n, settings.mlp.N_obj_code_length), jnp.float32)
    vox_c = lookup_c(params["voxel_features"], xyz_c_d).reshape(n, s_c, -1)
    vox_f = lookup(params["voxel_features"], xyz_f_d).reshape(n, s_f, -1)

    mlp_vox = settings.mlp
    coarse_k = jax.jit(lambda p, x, z, v: fused_coarse_weights(
        p, mlp_vox, x, z, voxel_raw=v))
    print(f"coarse sigma kernel (voxel): "
          f"{timeit(lambda: coarse_k(params['coarse'], xyz_c_d, z_c, vox_c)):8.2f} ms")
    fine_k = jax.jit(lambda p, x, z, v: fused_render_tiles(
        p, mlp_vox, x, z, dir_pe, obj_codes=codes, voxel_raw=v,
        forward_instance=True)["rgb"])
    print(f"fine full kernel (voxel):    "
          f"{timeit(lambda: fine_k(params['fine'], xyz_f_d, z_f, vox_f)):8.2f} ms")

    import dataclasses
    mlp_cls = dataclasses.replace(mlp_vox, use_voxel_embedding=False)
    params_cls = jax.device_put(init_params(
        jax.random.PRNGKey(0),
        dataclasses.replace(settings, mlp=mlp_cls), cfg.model))
    coarse_cls = jax.jit(lambda p, x, z: fused_coarse_weights(
        p, mlp_cls, x, z))
    print(f"coarse sigma kernel (classical): "
          f"{timeit(lambda: coarse_cls(params_cls['coarse'], xyz_c_d, z_c)):8.2f} ms")
    fine_cls = jax.jit(lambda p, x, z: fused_render_tiles(
        p, mlp_cls, x, z, dir_pe, obj_codes=codes,
        forward_instance=True)["rgb"])
    print(f"fine full kernel (classical):    "
          f"{timeit(lambda: fine_cls(params_cls['fine'], xyz_f_d, z_f)):8.2f} ms")

    # 5. end-to-end chunk program (as make_render_fn builds it)
    rays = np.concatenate([
        np.zeros((n, 3), np.float32), dirs,
        np.full((n, 1), 0.05, np.float32), np.full((n, 1), 2.4, np.float32),
    ], -1)
    rays_d = jnp.asarray(rays)

    chunk_fn = jax.jit(lambda p, r: render_rays_fused_eval(
        p, r, settings, voxel_ctx=(p["voxel_features"], topo, static, ct),
        embedding_instance=codes)["rgb_fine"])
    print(f"chunk e2e (voxel, prebuilt ct): "
          f"{timeit(lambda: chunk_fn(params, rays_d)):8.2f} ms")
    chunk_nct = jax.jit(lambda p, r: render_rays_fused_eval(
        p, r, settings, voxel_ctx=(p["voxel_features"], topo, static),
        embedding_instance=codes)["rgb_fine"])
    print(f"chunk e2e (voxel, in-program ct): "
          f"{timeit(lambda: chunk_nct(params, rays_d)):8.2f} ms")

    settings_cls = dataclasses.replace(settings, mlp=mlp_cls)
    chunk_cls = jax.jit(lambda p, r: render_rays_fused_eval(
        p, r, settings_cls, embedding_instance=codes)["rgb_fine"])
    print(f"chunk e2e (classical): "
          f"{timeit(lambda: chunk_cls(params_cls, rays_d)):8.2f} ms")


if __name__ == "__main__":
    main()
