"""Does splitting gathers from Pallas kernels at the PROGRAM boundary
remove the composition penalty?

Variants for the full 7680-ray voxel chunk (64 coarse + 64 importance):
  single : one jit program (current render_rays_fused_eval)
  split  : 4 programs — P1 lookup_c, P2 coarse kernel+pdf glue,
           P3 lookup_f, P4 fine kernel — dispatched back-to-back
  dummy  : gather + a trivial pallas kernel in ONE program (is the
           penalty pallas-specific or kernel-size-specific?)
  floor  : trivial program dispatch rate (host dispatch floor)

Usage: python scripts/profile_voxel_split.py
"""

import functools
import os
import sys

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.profile_voxel_render import fetch, timeit  # noqa: E402


def main():
    from object_nerf_tpu.config import load_config
    from object_nerf_tpu.render.renderer import (
        RenderSettings, render_rays_fused_eval,
    )
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

    n, s_c, s_i = 7680, 64, 64
    rng = np.random.RandomState(1)
    dirs = rng.randn(n, 3).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    rays_np = np.concatenate([
        np.zeros((n, 3), np.float32), dirs,
        np.full((n, 1), 0.05, np.float32), np.full((n, 1), 2.4, np.float32),
    ], -1)
    rays = jnp.asarray(rays_np)
    rays_o, rays_d = rays[:, 0:3], rays[:, 3:6]
    near, far = rays[:, 6:7], rays[:, 7:8]
    codes = jnp.zeros((n, mlp.N_obj_code_length), jnp.float32)
    ct = jax.jit(lambda f: vg.make_corner_table(f, topo, static, lowp=True))(
        params["voxel_features"])

    # ---- single program --------------------------------------------------
    single = jax.jit(lambda p, r: render_rays_fused_eval(
        p, r, settings, voxel_ctx=(p["voxel_features"], topo, static, ct),
        embedding_instance=codes)["rgb_fine"])
    print(f"single : {timeit(lambda: single(params, rays)):8.2f} ms")

    # ---- split programs --------------------------------------------------
    def lookup(x):
        raw, _ = vg.voxel_lookup_dense(
            params["voxel_features"], topo, static, x.reshape(-1, 3),
            lowp=True, ct=ct)
        return raw.reshape(x.shape[0], x.shape[1], -1)

    @jax.jit
    def p1(r_o, r_d, nr, fr):
        z = stratified_sample(None, nr, fr, s_c, False, 0.0)
        xyz = r_o[:, None] + r_d[:, None] * z[..., None]
        return z, xyz, lookup(xyz)

    @jax.jit
    def p2(p, z, xyz, vox, r_o, r_d):
        wts = fused_coarse_weights(p["coarse"], mlp, xyz, z, voxel_raw=vox)
        z_mid = 0.5 * (z[:, :-1] + z[:, 1:])
        z_f = sample_pdf(None, z_mid, wts[:, 1:-1], s_i, det=True)
        z_all = merge_z_vals(z, z_f)
        xyz_f = r_o[:, None] + r_d[:, None] * z_all[..., None]
        return z_all, xyz_f

    p3 = jax.jit(lookup)

    @jax.jit
    def p4(p, xyz_f, z_all, vox_f, r_d):
        dpe = freq_encode(r_d, mlp.N_freq_dir)
        return fused_render_tiles(
            p["fine"], mlp, xyz_f, z_all, dpe, obj_codes=codes,
            voxel_raw=vox_f, forward_instance=True)["rgb"]

    def split():
        z, xyz, vox = p1(rays_o, rays_d, near, far)
        z_all, xyz_f = p2(params, z, xyz, vox, rays_o, rays_d)
        vox_f = p3(xyz_f)
        return p4(params, xyz_f, z_all, vox_f, rays_d)

    print(f"split  : {timeit(split):8.2f} ms")

    # ---- gather + dummy pallas kernel in one program ---------------------
    def dummy_kernel(x_ref, o_ref):
        o_ref[:] = x_ref[:] * 2.0

    def dummy_pallas(x):
        return pl.pallas_call(
            dummy_kernel,
            grid=(x.shape[0] // 32768,),
            in_specs=[pl.BlockSpec((32768, x.shape[1]), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((32768, x.shape[1]), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(x.shape, jnp.float32),
        )(x)

    flat = jnp.asarray(
        np.random.RandomState(3).randint(
            0, ct.shape[0], size=(n * 128,), dtype=np.int32))

    gather_alone = jax.jit(lambda c, i: jnp.take(c, i, axis=0))
    print(f"gather alone   : {timeit(lambda: gather_alone(ct, flat)):8.2f} ms")

    @jax.jit
    def gather_dummy(c, i):
        rows = jnp.take(c, i, axis=0)
        return dummy_pallas(rows[:, :24].astype(jnp.float32))
    print(f"gather + dummy : {timeit(lambda: gather_dummy(ct, flat)):8.2f} ms")

    @jax.jit
    def gather_sum(c, i):
        rows = jnp.take(c, i, axis=0)
        return jnp.sum(rows[:, :24].astype(jnp.float32), axis=-1)
    print(f"gather + sum   : {timeit(lambda: gather_sum(ct, flat)):8.2f} ms")

    # ---- dispatch floor --------------------------------------------------
    tiny = jax.jit(lambda x: x + 1.0)
    xs = jnp.zeros((128, 128), jnp.float32)
    print(f"dispatch floor : {timeit(lambda: tiny(xs), iters=50):8.2f} ms")


if __name__ == "__main__":
    main()
