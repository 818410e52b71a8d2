"""Does index locality change the corner-table gather's per-row cost?

The voxel render/train steps pay ~12-22 ns per randomly-indexed corner-
table row (HBM-latency-bound — BASELINE.md). If that cost is DRAM
row-miss latency, gathering with SORTED indices should be much cheaper,
and a sort + coherent-gather + inverse-permute pipeline could beat the
naive random gather. If it is per-row issue overhead in the gather
engine, sorting buys nothing. This measures exactly that, on the real
shapes (983k rows/chunk from a ~300k-row bf16 table of 192 channels):

  a) random gather                      (the production pattern)
  b) gather with pre-sorted indices     (upper bound on locality wins)
  c) sort + gather + inverse-permute    (what production could actually do)
  d) segment-sum scatter, random vs sorted (the train-side table grad)

Run on the TPU (one process at a time):
    python scripts/profile_gather_locality.py [--rows 983040] [--table 300000]

Measured, v5e (round 3, 2026-08-17): see the table appended below after
the first hardware run; until then treat every variant as unmeasured.
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# --cpu must take effect before any jax computation (the axon plugin
# ignores the JAX_PLATFORMS env var; jax.config works)
if "--cpu" in sys.argv:
    import jax

    jax.config.update("jax_platforms", "cpu")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def timeit(fn, *args, iters=10):
    """Pipelined timing: dispatch `iters` programs, fetch ONE scalar once
    (device programs execute serially, so syncing on the last output covers
    all of them; per-output fetches would add the ~25 ms tunnel round-trip
    per iteration and mask the very locality signal being measured)."""
    out = fn(*args)
    _ = float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    _ = float(np.asarray(jax.tree_util.tree_leaves(outs[-1])[0]).ravel()[0])
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=983040)  # 7680 rays × 128
    ap.add_argument("--table", type=int, default=300000)
    ap.add_argument("--ch", type=int, default=192)  # 8 corners × 24
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--cpu", action="store_true",
                    help="CPU smoke mode (handled at import above)")
    args = ap.parse_args()

    args.rows = args.rows // 4 * 4  # runs of 4 below; keep counts honest
    dt = jnp.dtype(args.dtype)
    key = jax.random.PRNGKey(0)
    table = jax.device_put(
        jax.random.normal(key, (args.table, args.ch), jnp.float32).astype(dt)
    )
    # production-like indices: random cells, but with the along-ray
    # coherence real samples have (consecutive samples often share a cell)
    rng = np.random.RandomState(1)
    idx_np = np.repeat(
        rng.randint(0, args.table, args.rows // 4), 4
    ).astype(np.int32)
    rng.shuffle(idx_np.reshape(-1, 4))  # shuffle ray order, keep runs
    idx = jax.device_put(jnp.asarray(idx_np))
    idx_sorted = jax.device_put(jnp.asarray(np.sort(idx_np)))

    @jax.jit
    def gather(t, i):
        return jnp.sum(t[i].astype(jnp.float32))

    @jax.jit
    def sort_gather_unpermute(t, i):
        order = jnp.argsort(i)
        rows = t[i[order]].astype(jnp.float32)
        inv = jnp.argsort(order)
        return jnp.sum(rows[inv] * (1.0 + inv[:, None].astype(jnp.float32) * 0))

    @jax.jit
    def seg_sum(t, i, v):
        return jnp.sum(
            jnp.zeros_like(t, shape=(args.table, args.ch), dtype=jnp.float32)
            .at[i].add(v)
        )

    vals = jax.device_put(
        jax.random.normal(key, (args.rows, args.ch), jnp.float32)
    )

    n = args.rows
    for name, fn, a in (
        ("gather random", gather, (table, idx)),
        ("gather sorted", gather, (table, idx_sorted)),
        ("sort+gather+unpermute", sort_gather_unpermute, (table, idx)),
    ):
        dt_s = timeit(fn, *a)
        print(f"{name:24s} {dt_s*1e3:8.2f} ms   {dt_s/n*1e9:6.2f} ns/row")
    for name, i in (("scatter random", idx), ("scatter sorted", idx_sorted)):
        dt_s = timeit(seg_sum, table, i, vals)
        print(f"{name:24s} {dt_s*1e3:8.2f} ms   {dt_s/n*1e9:6.2f} ns/row")


if __name__ == "__main__":
    main()
