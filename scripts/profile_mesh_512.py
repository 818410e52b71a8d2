"""Time STEADY-STATE 512³ sigma grids for mesh extraction (both arms).

The end-to-end reference-default timing (N_grid=512, marching, largest-CC,
PLY) is measured through the real CLI on a classical ckpt
(tools/extract_mesh.py — BASELINE.md "512³ mesh extraction" row), but its
sigma timer includes the remote-tunnel compile queue. This profiler
isolates the compute: it warms the 65536-point chunk programs with a 256³
sweep (256² slab == the 64k chunk, so the program shapes match 512³
exactly), then times the 512³ = 134M-point sweep — for the classical
model AND the voxel-conditioned arm the reference's flagship extraction
implies (/root/reference/tools/extract_mesh.py:78-111 queries the fine
model that config/scannet_base_0113.yml conditions on the voxel
embedding), at the ScanNet-scale grid bench.py uses (6×6×2.5 m room,
0.1 m voxels).

Usage:
    python scripts/profile_mesh_512.py [--n-grid 512] [--chunk 65536]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-grid", type=int, default=512)
    ap.add_argument("--chunk", type=int, default=64 * 1024)
    ap.add_argument("--out", default="debug/mesh512_voxel.json")
    args = ap.parse_args()

    import jax

    import bench
    from object_nerf_tpu.config import load_config
    from object_nerf_tpu.models import voxel_grid as vg
    from object_nerf_tpu.render.renderer import RenderSettings
    from object_nerf_tpu.train.system import init_params
    from tools.extract_mesh import extract_sigma_grid

    cfg = load_config(cli_args=["dataset_config=config/synthetic.yml"])
    cfg.model.use_voxel_embedding = True
    cfg.dataset_extra.merge(dict(scale_factor=2.5,
                                 scene_center=[0.0, 0.0, 1.25],
                                 voxel_size=0.1, neighbor_marks=3))

    use_pallas = jax.default_backend() == "tpu"
    cfg_classical = cfg.copy()
    cfg_classical.model.use_voxel_embedding = False
    settings_classical = RenderSettings.from_config(
        cfg_classical, is_eval=True, use_pallas=use_pallas)
    settings = RenderSettings.from_config(cfg, is_eval=True,
                                          use_pallas=use_pallas)
    features, topo, static = vg.build_voxel_grid_from_config(
        bench.scannet_scale_pcd(), cfg, key=jax.random.PRNGKey(2)
    )
    params = jax.device_put(
        init_params(jax.random.PRNGKey(0), settings, cfg.model, features)
    )
    # the classical trunk has different input dims (PE only, no voxel
    # features) — separate params
    params_classical = jax.device_put(
        init_params(jax.random.PRNGKey(0), settings_classical,
                    cfg_classical.model, None)
    )
    print(f"voxel grid: shape={static.shape} occupied={int(topo.n_occupied)} "
          f"capacity={static.n_max_voxels}", flush=True)

    # the normalized room spans ~[-1.2, 1.2]² × [-0.5, 0.5]
    cfg.merge(dict(chunk=args.chunk,
                   x_range=[-1.2, 1.2], y_range=[-1.2, 1.2],
                   z_range=[-0.5, 0.5]))
    voxel_ctx = (params["voxel_features"], topo, static)

    record = {"chunk": args.chunk, "n_grid": args.n_grid,
              "use_pallas": bool(settings.use_pallas),
              "grid_shape": list(static.shape),
              "n_occupied": int(topo.n_occupied), "arms": {}}
    # warm with a 256³ sweep when the real 512³ shapes apply (256² slab ==
    # the 64k chunk, so program shapes match); for small smoke grids warm
    # with a half-size sweep instead of a 16.7M-point one
    if args.chunk == 64 * 1024 and args.n_grid >= 256:
        warm_n = 256
    else:
        warm_n = max(args.n_grid // 2, 2)
    for arm, arm_params, arm_settings, ctx in (
            ("classical", params_classical, settings_classical, None),
            ("voxel", params, settings, voxel_ctx)):
        cfg.merge(dict(N_grid=warm_n))
        extract_sigma_grid(arm_params, arm_settings, ctx, cfg, obj_id=0)
        cfg.merge(dict(N_grid=args.n_grid))
        t0 = time.perf_counter()
        sigma = extract_sigma_grid(arm_params, arm_settings, ctx, cfg,
                                   obj_id=0)
        dt = time.perf_counter() - t0
        n_pts = args.n_grid ** 3
        print(f"sigma grid {args.n_grid}^3 {arm}: {dt:.1f}s "
              f"({n_pts / dt / 1e6:.1f} M pts/s, "
              f"pallas={arm_settings.use_pallas}); "
              f"sigma mean {float(sigma.mean()):.3f}", flush=True)
        record["arms"][arm] = {"sigma_grid_s": round(dt, 2),
                               "mpts_per_s": round(n_pts / dt / 1e6, 2)}

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(record, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
