"""A/B the merged backward program (split_step merge_bwd=True).

The split train step dispatches 8 programs; P6 (fine bwd kernel) and P7
(coarse bwd kernel) are both kernel-only and adjacent in the dependency
chain, so they can share ONE XLA program without violating the measured
"no XLA glue in a kernel program" rule. That saves one dispatch per step
— worth ~0 at today's ~1 ms/program tunnel latency (the classical step
has ~0.8 ms of dispatch slack over its 19.6 ms kernel floor) but up to
~3 ms when the tunnel drifts to ~3 ms/program (the documented 81-102k
rays/s spread). Risk to measure: two large-VMEM pallas calls in one
program may hit the same scoped-VMEM staging competition that slows
XLA ops sharing a program with a kernel (BASELINE.md, round 3).

Usage: python scripts/profile_bwd_merge.py
"""

import os
import sys

import numpy as np
import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.profile_voxel_render import timeit  # noqa: E402
from scripts.profile_split_train import make_system  # noqa: E402


def main():
    from object_nerf_tpu.config import load_config
    from object_nerf_tpu.train import split_step as ss

    cfg = load_config()
    for use_voxel in (False, True):
        tag = "voxel" if use_voxel else "classical"
        system, ds = make_system(cfg, use_voxel)
        rng = np.random.RandomState(0)
        batch = system._device_batch(ds.sample_batch(2048, rng))
        key = jax.random.PRNGKey(7)

        for merge in (False, True):
            maker = ss.make_split_train_step(
                system.settings, dict(system.config.loss),
                system.optimizer, system.voxel_static,
                system.lr_schedule, donate=False, merge_bwd=merge,
            )
            state = system.state
            _, m = maker(state, batch, key, system.voxel_topo)
            float(np.asarray(m["train/loss"]))  # compile + sync

            def step():
                _, m = maker(state, batch, key, system.voxel_topo)
                return m["train/loss"]

            t = timeit(step, iters=30)
            progs = 7 if merge else 8
            print(f"[{tag}] merge_bwd={merge}: {t:7.2f} ms/step "
                  f"({2048 / t * 1000:,.0f} rays/s, {progs} programs)",
                  flush=True)


if __name__ == "__main__":
    main()
