"""Measure a Pallas DMA-pipelined row gather vs the XLA gather floor.

VERDICT r3 weak #3 / next #5: the voxel corner-table fetch costs
~12-22 ns/row at the XLA gather's HBM-latency-bound issue rate (~13 ms of
gather programs per 7680-ray eval chunk, ~10 ms per voxel train step —
BASELINE.md). The one unmeasured lever is a dedicated Pallas gather kernel
that keeps MANY row DMAs outstanding (`pltpu.make_async_copy` over a
semaphore ring) instead of relying on the gather unit's serial issue.

This script times, on the real corner-table shape of the ScanNet-scale
bench grid (≈890k rows × 8·24 ch, bf16 and f32) with the bench's per-chunk
index count (7680 rays × 128 samples ≈ 983k random rows):

  xla    — `jnp.take(ct, flat, axis=0)` (the shipped path)
  dma<K> — Pallas kernel: per-tile indices in SMEM, table resident in
           HBM, K outstanding per-row DMAs into the VMEM output tile

Each gather runs as its own XLA program whose full (N, C) output feeds a
separate reduce program — the split-program structure the renderer
actually uses — and dispatches are pipelined with one final host fetch
(axon tunnel methodology, scripts/profile_voxel_render.timeit).

Run on the TPU:  python scripts/profile_dma_gather.py [n_idx [rows]]

The accept/reject record lives in BASELINE.md (gather analysis section).
"""

import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def dma_gather(idx, table, rows_per_tile=2048, n_outstanding=8):
    """(N, C) = table[idx] via per-row DMAs, K outstanding.

    table: (R, C) stays in HBM (never enters VMEM wholesale); idx: (N,)
    int32, N % rows_per_tile == 0. Each grid step fills one
    (rows_per_tile, C) VMEM output block; row i's DMA starts as soon as
    slot (i mod K) frees, so up to K row copies are in flight at once.
    """
    n = idx.shape[0]
    c = table.shape[1]
    r = rows_per_tile
    assert n % r == 0
    k = min(n_outstanding, r)

    def kernel(idx_ref, table_ref, out_ref, sems):
        def copy(i, slot):
            return pltpu.make_async_copy(
                table_ref.at[pl.ds(idx_ref[i], 1), :],
                out_ref.at[pl.ds(i, 1), :],
                sems.at[slot],
            )

        def prime(i, _):
            copy(i, i % k).start()
            return 0

        jax.lax.fori_loop(0, k, prime, 0)

        def body(i, _):
            copy(i, i % k).wait()

            @pl.when(i + k < r)
            def _():
                copy(i + k, (i + k) % k).start()

            return 0

        jax.lax.fori_loop(0, r, body, 0)

    return pl.pallas_call(
        kernel,
        grid=(n // r,),
        in_specs=[
            pl.BlockSpec((r,), lambda t: (t,), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),  # table stays in HBM
        ],
        out_specs=pl.BlockSpec((r, c), lambda t: (t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, c), table.dtype),
        scratch_shapes=[pltpu.SemaphoreType.DMA((k,))],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(idx, table)


REDUCE = jax.jit(lambda x: jnp.sum(x.astype(jnp.float32)))


def timeit(fn, iters=8):
    REDUCE(fn())  # compile both programs
    t0 = time.perf_counter()
    outs = [REDUCE(fn()) for _ in range(iters)]
    # ONE host fetch forces the whole pipelined chain (axon block_until_
    # ready is async; scalars keep only 8 bytes alive per iteration)
    vals = [float(np.asarray(o)) for o in outs]
    dt = (time.perf_counter() - t0) / iters * 1e3
    assert np.isfinite(vals[-1])
    return dt


def main():
    n_idx = int(sys.argv[1]) if len(sys.argv) > 1 else 983040  # 7680×128
    rows = int(sys.argv[2]) if len(sys.argv) > 2 else 890000
    c = 8 * 24
    rng = np.random.RandomState(0)
    idx = jnp.asarray(rng.randint(0, rows, size=(n_idx,)).astype(np.int32))
    print(f"device: {jax.devices()[0]}; table ({rows}, {c}), idx {n_idx}",
          flush=True)

    for dtype, tag in ((jnp.bfloat16, "bf16"), (jnp.float32, "f32 ")):
        table = jnp.asarray(
            rng.randn(rows, c).astype(np.float32)
        ).astype(dtype)

        xla = jax.jit(lambda t, i: jnp.take(t, i, axis=0))
        ms = timeit(lambda: xla(table, idx))
        print(f"[{tag}] xla take raw  : {ms:7.2f} ms  "
              f"({ms * 1e6 / n_idx:5.1f} ns/row)", flush=True)

        # the PRODUCTION shape: gather + trilinear corner reduce fused in
        # one program, (N, C/8) f32 out — voxel_lookup_dense's actual form.
        # (Materializing the raw (N, C) bf16 gather is pathologically slow
        # standalone — XLA's fusion of the reduce into the gather consumer
        # is what keeps the shipped path at the ns/row floor.)
        wts = jnp.asarray(rng.rand(n_idx, 8).astype(np.float32))

        def take_reduce(t, i, w):
            rows = jnp.take(t, i, axis=0)
            return jnp.sum(
                rows.reshape(-1, 8, c // 8).astype(jnp.float32)
                * w[..., None], axis=1,
            )

        tr = jax.jit(take_reduce)
        ms = timeit(lambda: tr(table, idx, wts))
        print(f"[{tag}] xla take+tril : {ms:7.2f} ms  "
              f"({ms * 1e6 / n_idx:5.1f} ns/row)  <- production shape",
              flush=True)

        # MEASURED REJECTION (round 4): the DMA kernel cannot be built on
        # this toolchain — ANY `pltpu.make_async_copy` inside a kernel
        # (even one static 8-row VMEM→VMEM copy, no dynamic index, no
        # semaphore ring) crashes the remote TPU compiler with
        # "tpu_compile_helper subprocess exit code 1", while the same
        # kernel minus the copy compiles, DMA-semaphore scratch alone
        # compiles, and interpret mode validates the kernel's semantics.
        # One config is kept as the reproducer; flip the sweep back on if
        # the toolchain ever gains DMA support.
        for k, rpt in ((8, 2048),):
            try:
                fn = jax.jit(functools.partial(
                    dma_gather, rows_per_tile=rpt, n_outstanding=k,
                ))
                ms = timeit(lambda: fn(idx, table))
                print(
                    f"[{tag}] dma k={k:2d} r={rpt:5d}: {ms:7.2f} ms  "
                    f"({ms * 1e6 / n_idx:5.1f} ns/row)", flush=True,
                )
            except Exception as e:
                msg = str(e).splitlines()[0][:120]
                print(f"[{tag}] dma k={k:2d} r={rpt:5d}: FAILED {msg}",
                      flush=True)


if __name__ == "__main__":
    main()
