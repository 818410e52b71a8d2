"""Why is the fine kernel slower inside the composed program?

Variants of the fine-pass stage, all at 7680 rays x 128 samples:
  A. kernel alone, all inputs jit args (baseline)
  B. kernel with inputs multiplied by 1.0 in-program (forces producer ops)
  C. lookup (prebuilt ct) + kernel composed in one jit
  D. xyz from z in-program + lookup + kernel
  E. C but with the lookup output cast to bf16 before the kernel

Usage: python scripts/profile_voxel_compose.py
"""

import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.profile_voxel_render import fetch, timeit  # noqa: E402


def main():
    from object_nerf_tpu.config import load_config
    from object_nerf_tpu.render.renderer import RenderSettings
    from object_nerf_tpu.train.system import init_params
    from object_nerf_tpu.models import voxel_grid as vg
    from object_nerf_tpu.models.embedding import freq_encode
    from object_nerf_tpu.ops.pallas_mlp import fused_render_tiles

    cfg = load_config()
    cfg.model.use_voxel_embedding = True
    cfg.dataset_extra.merge(dict(scale_factor=2.5,
                                 scene_center=[0.0, 0.0, 1.25],
                                 voxel_size=0.1, neighbor_marks=3))
    rng = np.random.RandomState(0)
    pts = [rng.rand(60000, 3).astype(np.float32) * [6, 6, 0] - [3, 3, 0]]
    for ax, sgn in ((0, -3.0), (0, 3.0), (1, -3.0), (1, 3.0)):
        w = rng.rand(25000, 3).astype(np.float32) * [6.0, 6.0, 2.5]
        w[:, :2] -= 3.0
        w[:, ax] = sgn
        pts.append(w)
    pcd = np.concatenate(pts)

    settings = RenderSettings.from_config(cfg, is_eval=True, use_pallas=True)
    features, topo, static = vg.build_voxel_grid_from_config(
        pcd, cfg, key=jax.random.PRNGKey(2))
    params = jax.device_put(
        init_params(jax.random.PRNGKey(0), settings, cfg.model, features))
    mlp = settings.mlp

    n, s = 7680, 128
    rng = np.random.RandomState(1)
    dirs = rng.randn(n, 3).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    rays_d = jnp.asarray(dirs)
    z = jnp.asarray(np.linspace(0.05, 2.4, s, dtype=np.float32)[None]
                    * np.ones((n, 1), np.float32))
    xyz = jnp.asarray(np.zeros((n, 1, 3), np.float32)
                      + dirs[:, None] * np.asarray(z)[..., None])
    dir_pe = jax.jit(lambda d: freq_encode(d, mlp.N_freq_dir))(rays_d)
    codes = jnp.zeros((n, mlp.N_obj_code_length), jnp.float32)
    ct = jax.jit(lambda f: vg.make_corner_table(f, topo, static, lowp=True))(
        params["voxel_features"])

    def lookup(feats, x):
        raw, _ = vg.voxel_lookup_dense(
            feats, topo, static, x.reshape(-1, 3), lowp=True, ct=ct)
        return raw.reshape(x.shape[0], x.shape[1], -1)

    vox = jax.jit(lookup)(params["voxel_features"], xyz)

    def kernel(p, x, zz, v, dpe):
        return fused_render_tiles(
            p, mlp, x, zz, dpe, obj_codes=codes, voxel_raw=v,
            forward_instance=True)["rgb"]

    A = jax.jit(kernel)
    print(f"A kernel alone:          "
          f"{timeit(lambda: A(params['fine'], xyz, z, vox, dir_pe)):8.2f} ms")

    B = jax.jit(lambda p, x, zz, v, dpe: kernel(
        p, x * 1.0 + 1e-9, zz, v * 1.0 + 1e-9, dpe))
    print(f"B producer-op inputs:    "
          f"{timeit(lambda: B(params['fine'], xyz, z, vox, dir_pe)):8.2f} ms")

    C = jax.jit(lambda p, f, x, zz, dpe: kernel(p, x, zz, lookup(f, x), dpe))
    print(f"C lookup+kernel:         "
          f"{timeit(lambda: C(params['fine'], params['voxel_features'], xyz, z, dir_pe)):8.2f} ms")

    def D_fn(p, f, d, zz, dpe):
        x = d[:, None] * zz[..., None]
        return kernel(p, x, zz, lookup(f, x), dpe)
    D = jax.jit(D_fn)
    print(f"D xyz+lookup+kernel:     "
          f"{timeit(lambda: D(params['fine'], params['voxel_features'], rays_d, z, dir_pe)):8.2f} ms")

    E = jax.jit(lambda p, f, x, zz, dpe: kernel(
        p, x, zz, lookup(f, x).astype(jnp.bfloat16), dpe))
    print(f"E lookup(bf16)+kernel:   "
          f"{timeit(lambda: E(params['fine'], params['voxel_features'], xyz, z, dir_pe)):8.2f} ms")

    F = jax.jit(lambda p, f, x, zz, dpe: kernel(
        p, x, zz, jax.lax.optimization_barrier(lookup(f, x)), dpe))
    print(f"F lookup+barrier+kernel: "
          f"{timeit(lambda: F(params['fine'], params['voxel_features'], xyz, z, dir_pe)):8.2f} ms")

    # G: gather only (no weighted sum) + kernel — is the gather or the
    # trilinear reduce the part that degrades when consumed?
    def lookup_nosum(feats, x):
        xs = (x.reshape(-1, 3) + topo.voxel_offset) / topo.voxel_size
        base = jnp.floor(xs)
        pb = jnp.clip(base.astype(jnp.int32) + 1, 0,
                      jnp.asarray(static.shape, jnp.int32))
        Y, Z = static.shape[1], static.shape[2]
        flat = (pb[:, 0] * (Y + 1) + pb[:, 1]) * (Z + 1) + pb[:, 2]
        rows = jnp.take(ct, flat, axis=0)
        return rows[:, :24].astype(jnp.float32).reshape(
            x.shape[0], x.shape[1], -1)
    G = jax.jit(lambda p, f, x, zz, dpe: kernel(
        p, x, zz, lookup_nosum(f, x), dpe))
    print(f"G gather-only+kernel:    "
          f"{timeit(lambda: G(params['fine'], params['voxel_features'], xyz, z, dir_pe)):8.2f} ms")

    # H: barrier immediately after the raw gather, BEFORE the trilinear
    # weighted sum — breaks the gather↔consumer fusion specifically
    def lookup_barrier(feats, x):
        xs = (x.reshape(-1, 3) + topo.voxel_offset) / topo.voxel_size
        base = jnp.floor(xs)
        q0 = base.astype(jnp.int32)
        shp = jnp.asarray(static.shape, jnp.int32)
        valid = jnp.all((q0 >= -1) & (q0 <= shp - 1), axis=-1)
        pb = jnp.clip(q0 + 1, 0, shp)
        Y, Z = static.shape[1], static.shape[2]
        flat = (pb[:, 0] * (Y + 1) + pb[:, 1]) * (Z + 1) + pb[:, 2]
        rows = jax.lax.optimization_barrier(jnp.take(ct, flat, axis=0))
        u, v, w = xs[:, 0:1] - base[:, 0:1], xs[:, 1:2] - base[:, 1:2], xs[:, 2:3] - base[:, 2:3]
        lu, lv, lw = 1 - u, 1 - v, 1 - w
        wts = jnp.concatenate(
            [lu*lv*lw, lu*lv*w, lu*v*lw, lu*v*w,
             u*lv*lw, u*lv*w, u*v*lw, u*v*w], -1)
        out = jnp.sum(rows.reshape(-1, 8, 24).astype(jnp.float32)
                      * wts[..., None], axis=1)
        out = jnp.where(valid[:, None], out, 0.0)
        return out.reshape(x.shape[0], x.shape[1], -1)
    H = jax.jit(lambda p, f, x, zz, dpe: kernel(
        p, x, zz, lookup_barrier(f, x), dpe))
    print(f"H gather|barrier|sum+kernel: "
          f"{timeit(lambda: H(params['fine'], params['voxel_features'], xyz, z, dir_pe)):8.2f} ms")


if __name__ == "__main__":
    main()
