"""Where do background-only edit chunks spend their time?

Hit compaction routes all-miss chunks to a K=1 `make_multi_eval_stages`
program. This probe times, on the same 4096-ray voxel-conditioned chunks:

  multi K=1   — render/multi.make_multi_eval_stages((0,))  (edit path)
  single-eval — renderer.make_fused_eval_stages             (eval path)

The single-scene eval path is the most-optimized renderer in the repo
(BASELINE.md: 249k rays/s at 7680-ray chunks); if the multi K=1 path is
materially slower on identical work, bg-only chunks should ride the
single-scene stages instead.

Usage: python scripts/profile_edit_bg_chunks.py [chunk ...]
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


def main():
    from object_nerf_tpu.config import load_config
    from object_nerf_tpu.render.renderer import (
        RenderSettings, make_fused_eval_stages,
    )
    from object_nerf_tpu.render.multi import make_multi_eval_stages
    from object_nerf_tpu.train.system import init_params
    from object_nerf_tpu.models import voxel_grid as vg
    import bench

    chunks = [int(a) for a in sys.argv[1:]
              if not a.startswith("-")] or [4096, 7680]
    cfg = load_config()
    cfg.model.use_voxel_embedding = True
    cfg.dataset_extra.merge(dict(scale_factor=2.5,
                                 scene_center=[0.0, 0.0, 1.25],
                                 voxel_size=0.1, neighbor_marks=3))
    use_pallas = jax.default_backend() == "tpu"
    pallas_kw = {} if use_pallas else dict(
        pallas_interpret=True, pallas_dtype="float32")
    settings = RenderSettings.from_config(
        cfg, is_eval=True, use_pallas=use_pallas, **pallas_kw,
    )
    print(f"device: {jax.devices()[0]}", flush=True)

    features, topo, static = vg.build_voxel_grid_from_config(
        bench.scannet_scale_pcd(), cfg, key=jax.random.PRNGKey(2)
    )
    params = jax.device_put(
        init_params(jax.random.PRNGKey(0), settings, cfg.model, features)
    )
    lowp = settings.pallas_dtype == "bfloat16"
    ct = jax.jit(
        lambda f: vg.make_corner_table(f, topo, static, lowp=lowp)
    )(params["voxel_features"])

    n = W * H
    rng = np.random.RandomState(0)
    o = np.zeros((n, 3), np.float32)
    d = rng.randn(n, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays = jnp.asarray(np.concatenate(
        [o, d, np.full((n, 1), 0.05, np.float32),
         np.full((n, 1), 2.4, np.float32)], -1))

    for chunk in chunks:
        stacks, flats = [], []
        for i in range(0, n, chunk):
            sl = rays[i : i + chunk]
            if sl.shape[0] < chunk:
                sl = jnp.concatenate(
                    [sl, jnp.repeat(sl[-1:], chunk - sl.shape[0], 0)])
            stacks.append(jax.device_put(sl[None]))
            flats.append(jax.device_put(sl))

        multi_fn = make_multi_eval_stages(settings, (0,), voxel_static=static)

        def multi_frame():
            return [multi_fn(params, s, voxel_topo=topo, ct=ct)
                    for s in stacks][-1]

        # scene-branch only, like the bg-only edit chunk (obj id 0)
        import dataclasses

        eval_settings = dataclasses.replace(settings, forward_instance=False)
        eval_fn = make_fused_eval_stages(eval_settings, static)

        def eval_frame():
            return [eval_fn(params, r, None, topo, ct) for r in flats][-1]

        ms_multi = timeit(multi_frame)
        ms_eval = timeit(eval_frame)
        nc = len(stacks)
        print(
            f"chunk {chunk} ({nc} chunks): multi-K=1 {ms_multi:7.1f} ms "
            f"({ms_multi/nc:6.1f} ms/chunk)  single-eval {ms_eval:7.1f} ms "
            f"({ms_eval/nc:6.1f} ms/chunk)  ratio ×{ms_multi/ms_eval:.2f}",
            flush=True,
        )

        if "--stages" not in sys.argv:
            continue
        # per-stage standalone timings (each is its own dispatched program;
        # per-call sync adds the ~ms tunnel round-trip — compare ratios)
        st = multi_fn.stages
        stack0 = stacks[0]
        prep = st["prep"](params, stack0, topo, ct, None)
        coarse = [st["scene_sigma"](params["coarse"], prep[0][1],
                                    prep[0][2], None)]
        fine_meta = st["merge"](stack0, (prep[0][0],), (prep[0][4],),
                                (coarse[0],), topo, ct, None)
        fine = [st["scene_kernel"](params["fine"], stack0[0],
                                   fine_meta[0][1], fine_meta[0][2])]

        def t(fn, *a, iters=16):
            fetch(fn(*a))
            t0 = time.perf_counter()
            for _ in range(iters):
                out = fn(*a)
            fetch(out)
            return (time.perf_counter() - t0) / iters * 1e3

        ms = {
            "prep (sample+gather)": t(st["prep"], params, stack0, topo, ct,
                                      None),
            "coarse sigma kernel": t(st["scene_sigma"], params["coarse"],
                                     prep[0][1], prep[0][2], None),
            "merge (pdf+gather)": t(st["merge"], stack0, (prep[0][0],),
                                    (prep[0][4],), (coarse[0],), topo, ct,
                                    None),
            "fine full kernel": t(st["scene_kernel"], params["fine"],
                                  stack0[0], fine_meta[0][1],
                                  fine_meta[0][2]),
            "final composite": t(st["final"], (fine_meta[0][0],),
                                 (fine_meta[0][4],), fine),
        }
        tot = sum(ms.values())
        for k, v in ms.items():
            print(f"    {k:22s} {v:6.2f} ms", flush=True)
        print(f"    {'sum':22s} {tot:6.2f} ms (pipelined chunk: "
              f"{ms_multi/nc:.1f} ms)", flush=True)


if __name__ == "__main__":
    main()
