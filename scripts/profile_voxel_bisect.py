"""Bisect the voxel e2e chunk program: incrementally add stages and time.

Usage: python scripts/profile_voxel_bisect.py
"""

import os
import sys
import time

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
    from object_nerf_tpu.ops.sampling import (
        stratified_sample, sample_pdf, merge_z_vals,
    )
    from object_nerf_tpu.ops.pallas_mlp import (
        fused_coarse_weights, fused_render_tiles,
    )

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

    n, s_c, s_f = 7680, 64, 64
    s_all = s_c + s_f
    rng = np.random.RandomState(1)
    dirs = rng.randn(n, 3).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    rays_o = jnp.zeros((n, 3), jnp.float32)
    rays_d = jnp.asarray(dirs)
    near = jnp.full((n, 1), 0.05, jnp.float32)
    far = jnp.full((n, 1), 2.4, jnp.float32)
    codes = jnp.zeros((n, mlp.N_obj_code_length), jnp.float32)

    ct = jax.jit(lambda f: vg.make_corner_table(f, topo, static, lowp=True))(
        params["voxel_features"])

    def lookup(feats, xyz):
        raw, _ = vg.voxel_lookup_dense(
            feats, topo, static, xyz.reshape(-1, 3), lowp=True, ct=ct)
        return raw.reshape(xyz.shape[0], xyz.shape[1], -1)

    def stage(upto):
        def f(params):
            feats = params["voxel_features"]
            z_vals = stratified_sample(None, near, far, s_c, False, 0.0)
            xyz_c = rays_o[:, None] + rays_d[:, None] * z_vals[..., None]
            if upto == "xyz":
                return xyz_c
            vox_c = lookup(feats, xyz_c)
            if upto == "lookup_c":
                return vox_c
            wts = fused_coarse_weights(
                params["coarse"], mlp, xyz_c, z_vals, voxel_raw=vox_c)
            if upto == "coarse":
                return wts
            z_mid = 0.5 * (z_vals[:, :-1] + z_vals[:, 1:])
            z_fine = sample_pdf(None, z_mid, wts[:, 1:-1], s_f, det=True)
            z_all = merge_z_vals(z_vals, z_fine)
            xyz_f = rays_o[:, None] + rays_d[:, None] * z_all[..., None]
            if upto == "pdf":
                return xyz_f
            vox_f = lookup(feats, xyz_f)
            if upto == "lookup_f":
                return vox_f
            dir_pe = freq_encode(rays_d, mlp.N_freq_dir)
            out = fused_render_tiles(
                params["fine"], mlp, xyz_f, z_all, dir_pe, obj_codes=codes,
                voxel_raw=vox_f, forward_instance=True)
            return out["rgb"]
        return jax.jit(f)

    for upto in ("xyz", "lookup_c", "coarse", "pdf", "lookup_f", "fine"):
        fn = stage(upto)
        print(f"upto {upto:10s}: {timeit(lambda: fn(params)):8.2f} ms")


if __name__ == "__main__":
    main()
