"""Editable (multi-object) render throughput: monolithic vs split programs.

Times a 320×240 edit-demo frame (the reference demo resolution and chunk,
test/config/edit_scannet_0113.yaml:4-7) with TWO ray sets — background
scene + one moved object with bbox-clipped near/far (~35% hit rays) —
through both dispatch strategies of EditableRenderer._render_multi:

* mono: the whole `render_rays_multi` chunk as ONE jitted program
  (kernels + sampling/sort/gather glue together);
* split: `make_multi_eval_stages` — kernel-only programs, glue in
  kernel-free programs (2K+3 programs/chunk).

Classical-PE and voxel-conditioned (ScanNet-scale grid) variants.

Usage: python scripts/profile_edit_render.py [chunk ...]
"""

import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

W, H = 320, 240
ITERS = 8


def fetch(x):
    return float(np.asarray(jax.tree_util.tree_leaves(x)[0].sum()))


def timeit(frame_fn, iters=ITERS, warmup=2):
    for _ in range(warmup):
        out = frame_fn()
    fetch(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = frame_fn()
    fetch(out)
    return (time.perf_counter() - t0) / iters * 1e3  # ms/frame


def make_rays(n, seed, near, far, hit_frac=1.0):
    rng = np.random.RandomState(seed)
    o = np.zeros((n, 3), np.float32)
    d = rng.randn(n, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    nearc = np.full((n, 1), near, np.float32)
    farc = np.full((n, 1), far, np.float32)
    if hit_frac < 1.0:
        miss = rng.rand(n) >= hit_frac
        nearc[miss] = 0.0
        farc[miss] = 0.0
    return jnp.asarray(np.concatenate([o, d, nearc, farc], -1))


def run_variant(name, cfg, voxel, chunks):
    from object_nerf_tpu.render.renderer import RenderSettings
    from object_nerf_tpu.render.multi import (
        render_rays_multi, make_multi_eval_stages,
    )
    from object_nerf_tpu.train.system import init_params
    from object_nerf_tpu.models import voxel_grid as vg

    cfg = cfg.copy()
    cfg.model.use_voxel_embedding = voxel
    use_pallas = jax.default_backend() == "tpu"
    pallas_kw = {}
    if not use_pallas:
        # the split variant dispatches pltpu pallas_calls unconditionally —
        # off-TPU they must run interpreter-mode or the call crashes in
        # lowering (timings are then NOT meaningful; this keeps the
        # profiler importable/smoke-runnable on the CPU mesh)
        pallas_kw = dict(pallas_interpret=True, pallas_dtype="float32")
        print(
            "[profile_edit_render] no TPU backend: split-variant kernels "
            "run in interpreter mode — use timings for smoke only",
            flush=True,
        )
    settings = RenderSettings.from_config(
        cfg, is_eval=True, use_pallas=use_pallas, **pallas_kw,
    )
    ids = (0, 4)

    features = topo = static = ct = None
    voxel_ctx = None
    if voxel:
        import bench

        cfg.dataset_extra.merge(dict(scale_factor=2.5,
                                     scene_center=[0.0, 0.0, 1.25],
                                     voxel_size=0.1, neighbor_marks=3))
        features, topo, static = vg.build_voxel_grid_from_config(
            bench.scannet_scale_pcd(), cfg, key=jax.random.PRNGKey(2)
        )
        assert vg._dense_path_ok(static)
    params = jax.device_put(
        init_params(jax.random.PRNGKey(0), settings, cfg.model, features)
    )
    if voxel:
        voxel_ctx = (params["voxel_features"], topo, static)
        lowp = settings.pallas_dtype == "bfloat16"
        ct = jax.jit(
            lambda f: vg.make_corner_table(f, topo, static, lowp=lowp)
        )(params["voxel_features"])

    n = W * H
    # bg rays bounded inside the (voxel) room; object set ~35% bbox hits
    rays_bg = make_rays(n, 0, 0.05, 2.4)
    rays_ob = make_rays(n, 1, 0.6, 1.4, hit_frac=0.35)

    for chunk in chunks:
        stacks = []
        for i in range(0, n, chunk):
            sl = [r[i : i + chunk] for r in (rays_bg, rays_ob)]
            if sl[0].shape[0] < chunk:
                p = chunk - sl[0].shape[0]
                sl = [jnp.concatenate([r, jnp.repeat(r[-1:], p, 0)]) for r in sl]
            stacks.append(jnp.stack(sl))
        stacks = [jax.device_put(s) for s in stacks]

        @jax.jit
        def mono_fn(params, rays_stack, key):
            out = render_rays_multi(
                params, list(rays_stack), ids, key, settings,
                voxel_ctx=voxel_ctx,
            )
            return {k: out[k] for k in
                    ("rgb_fine", "depth_fine", "opacity_fine")}

        key = jax.random.PRNGKey(1)

        def mono_frame():
            outs = [mono_fn(params, s, key) for s in stacks]
            return outs[-1]

        split_fn = make_multi_eval_stages(settings, ids, voxel_static=static)

        def split_frame():
            outs = [
                split_fn(params, s, voxel_topo=topo, ct=ct) for s in stacks
            ]
            return outs[-1]

        ms_split = timeit(split_frame)
        ms_mono = timeit(mono_frame)
        print(
            f"[{name}] chunk {chunk}: mono {ms_mono:7.1f} ms/frame "
            f"({n/ms_mono*1e3:9,.0f} rays/s)  split {ms_split:7.1f} ms/frame "
            f"({n/ms_split*1e3:9,.0f} rays/s)  speedup ×{ms_mono/ms_split:.2f}",
            flush=True,
        )


def main():
    from object_nerf_tpu.config import load_config

    chunks = [int(a) for a in sys.argv[1:]] or [4096, 7680]
    cfg = load_config()
    print(f"device: {jax.devices()[0]}", flush=True)
    run_variant("classical K=2", cfg, voxel=False, chunks=chunks)
    run_variant("voxel     K=2", cfg, voxel=True, chunks=chunks)


if __name__ == "__main__":
    main()
