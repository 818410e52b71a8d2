"""Does lowering the Pallas kernel's vmem_limit fix the in-program gather?

Hypothesis from the scoped-vmem OOM message: a large-VMEM Pallas call in
the same program squeezes the staging buffers XLA gives the row gather
(they may be scheduled concurrently), slowing the gather 2-4x. Sweep the
fine kernel's vmem_limit_mb in the composed lookup+kernel program.

Usage: python scripts/profile_vmem_sweep.py
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

    for mb in (100, 64, 48, 32, 24):
        def kernel(p, x, zz, v, dpe, mb=mb):
            return fused_render_tiles(
                p, mlp, x, zz, dpe, obj_codes=codes, voxel_raw=v,
                forward_instance=True, vmem_limit_mb=mb)["rgb"]
        try:
            A = jax.jit(kernel)
            a = timeit(lambda: A(params['fine'], xyz, z, vox, dir_pe))
            C = jax.jit(lambda p, f, x, zz, dpe: kernel(
                p, x, zz, lookup(f, x), dpe))
            c = timeit(lambda: C(params['fine'], params['voxel_features'],
                                 xyz, z, dir_pe))
            print(f"vmem {mb:3d} MB: kernel alone {a:7.2f} ms | "
                  f"lookup+kernel {c:7.2f} ms")
        except Exception as e:
            print(f"vmem {mb:3d} MB: FAILED {str(e)[:120]}")


if __name__ == "__main__":
    main()
