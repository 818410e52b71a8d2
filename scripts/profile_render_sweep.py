"""Classical eval render: chunk-size x rows_budget sweep (post poly-sin).

The 7680-ray chunk / 2048-row tile combination was tuned in round 2 with
the builtin-sin kernels; the poly-sin change shifts the MXU/VPU balance,
so re-sweep. Reports ms/frame and rays/s at 640x480, 64+64.

Usage: python scripts/profile_render_sweep.py
"""

import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from object_nerf_tpu.config import load_config
    from object_nerf_tpu.render.renderer import (
        RenderSettings, render_rays_fused_eval,
    )
    from object_nerf_tpu.train.system import init_params
    import object_nerf_tpu.ops.pallas_mlp as pm

    cfg = load_config()
    cfg.model.use_voxel_embedding = False
    settings = RenderSettings.from_config(cfg, is_eval=True, use_pallas=True)
    params = jax.device_put(
        init_params(jax.random.PRNGKey(0), settings, cfg.model))

    W, H = 640, 480
    n = W * H
    rng = np.random.RandomState(0)
    d = rng.randn(n, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays = jnp.asarray(np.concatenate(
        [np.zeros((n, 3), np.float32), d,
         np.full((n, 1), 0.5, np.float32),
         np.full((n, 1), 4.0, np.float32)], -1))
    codes = jnp.zeros((n, settings.mlp.N_obj_code_length), jnp.float32)

    orig_coarse, orig_tiles = pm.fused_coarse_weights, pm.fused_render_tiles

    def frame(chunk, rows_budget):
        import functools

        def patched_coarse(*a, **k):
            k.setdefault("rows_budget", rows_budget)
            return orig_coarse(*a, **k)

        def patched_tiles(*a, **k):
            k.setdefault("rows_budget", rows_budget)
            return orig_tiles(*a, **k)

        pm.fused_coarse_weights = patched_coarse
        pm.fused_render_tiles = patched_tiles
        # renderer binds via module attr at call time? it imports inside
        # the function, so patching the module works
        chunk_fn = jax.jit(lambda p, r, c: render_rays_fused_eval(
            p, r, settings, embedding_instance=c)["rgb_fine"])

        def run():
            outs = []
            for i in range(0, n, chunk):
                outs.append(chunk_fn(params, rays[i:i + chunk],
                                     codes[i:i + chunk]))
            return float(np.asarray(outs[-1][0].sum()))

        try:
            run()  # compile
            t0 = time.perf_counter()
            iters = 3
            for _ in range(iters):
                run()
            dt = (time.perf_counter() - t0) / iters
            print(f"chunk {chunk:6d} rows {rows_budget:5d}: "
                  f"{dt * 1e3:7.1f} ms/frame  {n / dt:10,.0f} rays/s",
                  flush=True)
        except Exception as e:
            print(f"chunk {chunk:6d} rows {rows_budget:5d}: FAILED "
                  f"{str(e)[:100]}", flush=True)
        finally:
            pm.fused_coarse_weights = orig_coarse
            pm.fused_render_tiles = orig_tiles

    for rows_budget in (2048, 3072, 4096):
        for chunk in (7680, 15360):
            frame(chunk, rows_budget)

    # split-classical: [coarse kernel] [pdf glue] [fine kernel] as separate
    # programs — does isolating the XLA glue from the pallas calls help the
    # no-gather path too?
    from object_nerf_tpu.models.embedding import freq_encode
    from object_nerf_tpu.ops.sampling import (
        stratified_sample, sample_pdf, merge_z_vals,
    )

    mlp = settings.mlp
    s_c, s_i = settings.N_samples, settings.N_importance

    @jax.jit
    def p_coarse(p, r):
        near, far = r[:, 6:7], r[:, 7:8]
        z = stratified_sample(None, near, far, s_c, False, 0.0)
        xyz = r[:, None, 0:3] + r[:, None, 3:6] * z[..., None]
        w = pm.fused_coarse_weights(p["coarse"], mlp, xyz, z)
        return z, w

    @jax.jit
    def p_glue(r, z, w):
        z_mid = 0.5 * (z[:, :-1] + z[:, 1:])
        z_f = sample_pdf(None, z_mid, w[:, 1:-1], s_i, det=True)
        z_all = merge_z_vals(z, z_f)
        xyz_f = r[:, None, 0:3] + r[:, None, 3:6] * z_all[..., None]
        return z_all, xyz_f

    @jax.jit
    def p_fine(p, r, z_all, xyz_f, c):
        dpe = freq_encode(r[:, 3:6], mlp.N_freq_dir)
        return pm.fused_render_tiles(
            p["fine"], mlp, xyz_f, z_all, dpe, obj_codes=c,
            forward_instance=True)["rgb"]

    def split_frame(chunk):
        def run():
            outs = []
            for i in range(0, n, chunk):
                r, c = rays[i:i + chunk], codes[i:i + chunk]
                z, w = p_coarse(params, r)
                z_all, xyz_f = p_glue(r, z, w)
                outs.append(p_fine(params, r, z_all, xyz_f, c))
            return float(np.asarray(outs[-1][0].sum()))

        run()
        t0 = time.perf_counter()
        for _ in range(3):
            run()
        dt = (time.perf_counter() - t0) / 3
        print(f"SPLIT chunk {chunk:6d}: {dt * 1e3:7.1f} ms/frame  "
              f"{n / dt:10,.0f} rays/s", flush=True)

    for chunk in (7680, 15360):
        split_frame(chunk)


if __name__ == "__main__":
    main()
