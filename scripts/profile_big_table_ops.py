"""Decompose the post-subdivision voxel step's table-sized operations.

profile_big_grid measured 307 ms/step at the (166,166,64) / 1.3 GiB-table
scale vs 73 ms pre-subdivision — ~240 ms of surplus that batch-sized work
(kernels, 393k gather rows) cannot explain. This times each table-sized
candidate standalone, pipelined, at exactly the step's shapes:

  build_f32 / build_bf16   P1's per-step corner-table build
  gather+tril              P1+P3's sample fetches (coarse+fine rows)
  d_rows                   P8's (N,192) cotangent-row materialization
  segsum                   P8's d_ct segment-sum into 1.87M padded cells
  build_vjp                P8's transpose of the corner-table build
  table_grad               P8's whole table-gradient chain

Run on the TPU:  python scripts/profile_big_table_ops.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from scripts.profile_big_grid import room_pcd
from scripts.profile_voxel_render import timeit


def main():
    from object_nerf_tpu.models import voxel_grid as vg

    # the post-subdivision flagship grid (profile_big_grid)
    features, topo, static = vg.build_voxel_grid(
        room_pcd(), [0.0, 0.0, 1.5], 3.2, 0.05, 3, 24, 6, 800000,
        key=jax.random.PRNGKey(0),
    )
    feats = jax.device_put(features)
    n_pcells = (static.shape[0] + 1) * (static.shape[1] + 1) * (static.shape[2] + 1)
    print(
        f"grid {static.shape} occupied {int(topo.n_occupied)} "
        f"capacity {static.n_max_voxels} padded cells {n_pcells} "
        f"table {vg.dense_table_bytes(static) / (1 << 30):.2f} GiB",
        flush=True,
    )

    n_rows = 2048 * (64 + 128)  # coarse + fine sample rows per train step
    rng = np.random.RandomState(0)
    flat = jnp.asarray(rng.randint(0, n_pcells, (n_rows,)).astype(np.int32))
    wts = jnp.asarray(rng.rand(n_rows, 8).astype(np.float32))
    d_flat = jnp.asarray(rng.randn(n_rows, 24).astype(np.float32))

    build32 = jax.jit(lambda f: vg.make_corner_table(f, topo, static))
    build16 = jax.jit(
        lambda f: vg.make_corner_table(f, topo, static, lowp=True)
    )
    print(f"build_f32 : {timeit(lambda: build32(feats)):8.2f} ms", flush=True)
    print(f"build_bf16: {timeit(lambda: build16(feats)):8.2f} ms", flush=True)

    ct16 = build16(feats)

    @jax.jit
    def gather_tril(ct, flat, wts):
        rows = jnp.take(ct, flat, axis=0)
        return jnp.sum(
            rows.reshape(-1, 8, 24).astype(jnp.float32) * wts[..., None], 1
        )

    print(f"gather+tril ({n_rows} rows): "
          f"{timeit(lambda: gather_tril(ct16, flat, wts)):8.2f} ms",
          flush=True)

    @jax.jit
    def d_rows_fn(d_flat, wts):
        return (d_flat[:, None, :] * wts[:, :, None]).reshape(-1, 192)

    print(f"d_rows    : {timeit(lambda: d_rows_fn(d_flat, wts)):8.2f} ms",
          flush=True)

    drows = d_rows_fn(d_flat, wts)

    @jax.jit
    def segsum(drows, flat):
        return jax.ops.segment_sum(drows, flat, num_segments=n_pcells)

    print(f"segsum    : {timeit(lambda: segsum(drows, flat)):8.2f} ms",
          flush=True)

    d_ct = segsum(drows, flat)

    def build(f):
        return vg._cell_corner_table(f, topo, static)

    @jax.jit
    def build_vjp_fn(f, d_ct):
        _, bv = jax.vjp(build, f)
        return bv(d_ct)[0]

    print(f"build_vjp : {timeit(lambda: build_vjp_fn(feats, d_ct)):8.2f} ms",
          flush=True)

    transpose = jax.jit(
        lambda d: vg.corner_table_transpose(d, topo.row_to_cell, static)
    )
    print(f"transpose : {timeit(lambda: transpose(d_ct)):8.2f} ms",
          flush=True)

    @jax.jit
    def table_grad_whole(d_flat, wts, flat):
        # the shipped P8 chain (split_step.table_grad): segsum + the
        # hand-written transpose, NO forward build
        drows = (d_flat[:, None, :] * wts[:, :, None]).reshape(-1, 192)
        d_ct = jax.ops.segment_sum(drows, flat, num_segments=n_pcells)
        return vg.corner_table_transpose(d_ct, topo.row_to_cell, static)

    print(
        f"table_grad: "
        f"{timeit(lambda: table_grad_whole(d_flat, wts, flat)):8.2f}"
        f" ms", flush=True,
    )


if __name__ == "__main__":
    main()
