"""Microbench: are small-K PE matmuls the voxel kernels' overhead?

Per kernel tile the voxel path runs 3 small-K matmuls (xyz 3->60,
svox 16->192, ivox 8->96) + 3 sins; the combined variant runs ONE
block-diagonal (27 -> 348) matmul + one sin. Both are followed by an
8-layer 256-wide chain to emulate the trunk, over the fine-pass tile
count (7680 rays x 128 samples / 2048-row tiles, 2 halves each).

Usage: python scripts/profile_pe_micro.py
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

from scripts.profile_voxel_render import timeit  # noqa: E402


def _dot(a, w, dt=jnp.bfloat16):
    return jax.lax.dot_general(
        a.astype(dt), w.astype(dt),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _sin_turns(u):
    """sin(2*pi*u) via round-based range reduction + odd minimax poly.

    The PE matrix is prescaled by 1/(2*pi) so `u` arrives in turns; the
    reduction is a single round+sub. Degree-11 odd polynomial on
    [-0.5, 0.5] (coefficients from a least-squares fit of sin(2*pi*z)),
    abs error ~2e-6 — far below the bf16 cast noise downstream.
    """
    z = u - jnp.round(u)
    w = z * z
    p = -12.27205003
    p = p * w + 41.20590088
    p = p * w - 76.58021788
    p = p * w + 81.59619567
    p = p * w - 41.34142188
    p = p * w + 6.28318282
    return p * z


def make_kernel(mode):
    def kernel(x_ref, s_xyz, s_svox, s_ivox, s_all, *wrefs):
        trunk = wrefs[:-1]
        out_ref = wrefs[-1]
        rows = x_ref.shape[0]
        blk = rows // 2
        acc = None
        for k in range(2):
            x = x_ref[k * blk:(k + 1) * blk]
            if mode == "split":
                pes = [jnp.sin(_dot(x[:, :3], s_xyz[:])),
                       jnp.sin(_dot(x[:, 3:19], s_svox[:])),
                       jnp.sin(_dot(x[:, 19:27], s_ivox[:]))]
                cat = jnp.concatenate(
                    [x.astype(jnp.bfloat16)]
                    + [p.astype(jnp.bfloat16) for p in pes], axis=-1)
            elif mode == "split_nosin":
                pes = [_dot(x[:, :3], s_xyz[:]),
                       _dot(x[:, 3:19], s_svox[:]),
                       _dot(x[:, 19:27], s_ivox[:])]
                cat = jnp.concatenate(
                    [x.astype(jnp.bfloat16)]
                    + [p.astype(jnp.bfloat16) for p in pes], axis=-1)
            elif mode == "combined":
                sin_all = jnp.sin(_dot(x, s_all[:]))
                cat = jnp.concatenate(
                    [x.astype(jnp.bfloat16),
                     sin_all.astype(jnp.bfloat16)], axis=-1)
            elif mode == "combined_polysin":
                sin_all = _sin_turns(_dot(x, s_all[:]))
                cat = jnp.concatenate(
                    [x.astype(jnp.bfloat16),
                     sin_all.astype(jnp.bfloat16)], axis=-1)
            elif mode == "split_polysin":
                pes = [_sin_turns(_dot(x[:, :3], s_xyz[:])),
                       _sin_turns(_dot(x[:, 3:19], s_svox[:])),
                       _sin_turns(_dot(x[:, 19:27], s_ivox[:]))]
                cat = jnp.concatenate(
                    [x.astype(jnp.bfloat16)]
                    + [p.astype(jnp.bfloat16) for p in pes], axis=-1)
            elif mode == "combined_nosin":
                sin_all = _dot(x, s_all[:])
                cat = jnp.concatenate(
                    [x.astype(jnp.bfloat16),
                     sin_all.astype(jnp.bfloat16)], axis=-1)
            elif mode == "xyz_only":  # what the classical kernel pays
                pe = jnp.sin(_dot(x[:, :3], s_xyz[:]))
                cat = jnp.concatenate(
                    [x.astype(jnp.bfloat16), pe.astype(jnp.bfloat16),
                     jnp.zeros((blk, 288), jnp.bfloat16)], axis=-1)
            else:  # none: no PE at all (pure trunk chain, lower bound)
                cat = jnp.concatenate(
                    [x.astype(jnp.bfloat16),
                     jnp.zeros((blk, 348), jnp.bfloat16)], axis=-1)
            h = jnp.maximum(_dot(cat, trunk[0][:]), 0.0).astype(jnp.bfloat16)
            for w in trunk[1:]:
                h = jnp.maximum(_dot(h, w[:]), 0.0).astype(jnp.bfloat16)
            part = jnp.sum(h.astype(jnp.float32), axis=-1, keepdims=True)
            acc = part if acc is None else jnp.concatenate([acc, part], 0)
        out_ref[:] = acc
    return kernel


def main():
    n_rows = 7680 * 128
    tile = 2048
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(n_rows, 27).astype(np.float32))

    def S(c_in, c_out):
        return jnp.asarray(rng.randn(c_in, c_out).astype(np.float32))

    s_xyz, s_svox, s_ivox = S(3, 60), S(16, 192), S(8, 96)
    s_all = S(27, 348)
    trunk = [jnp.asarray(rng.randn(27 + 348, 256).astype(np.float32) * 0.05)]
    for _ in range(7):
        trunk.append(jnp.asarray(rng.randn(256, 256).astype(np.float32) * 0.05))

    for mode in ("none", "combined", "combined_polysin", "split_polysin"):
        kern = make_kernel(mode)
        f = jax.jit(functools.partial(
            pl.pallas_call,
            kern,
            grid=(n_rows // tile,),
            in_specs=[pl.BlockSpec((tile, 27), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)]
            + [pl.BlockSpec(memory_space=pltpu.VMEM)] * (4 + len(trunk)),
            out_specs=pl.BlockSpec((tile, 1), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_rows, 1), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )())
        g = lambda: f(x, s_xyz, s_svox, s_ivox, s_all, *trunk)  # noqa: E731
        print(f"{mode:9s}: {timeit(g):8.2f} ms")


if __name__ == "__main__":
    main()
