"""Frequency (NeRF positional) encoding.

Behavioral parity with the reference `Embedding` module
(models/embedding_helper.py:40-74): output layout is
``[x, sin(f0·x), cos(f0·x), sin(f1·x), cos(f1·x), ...]`` with the identity
first and per-frequency sin/cos interleaved — this exact channel order is
what the reference MLP weights consume, so the PyTorch checkpoint converter
relies on it.

TPU notes: this is pure VPU elementwise work; XLA fuses it into the first
matmul of the consuming MLP, so no Pallas kernel is needed for the encoding
alone (the fused render kernel re-implements it in-kernel instead).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def freq_bands(n_freqs: int, logscale: bool = True) -> np.ndarray:
    """Frequency multipliers: 2^0..2^(n-1) (logscale) or linear 1..2^(n-1)."""
    if n_freqs <= 0:
        return np.zeros((0,), dtype=np.float32)
    if logscale:
        return (2.0 ** np.arange(n_freqs)).astype(np.float32)
    return np.linspace(1.0, 2.0 ** (n_freqs - 1), n_freqs).astype(np.float32)


def freq_encode_channels(in_channels: int, n_freqs: int) -> int:
    """Output channel count: C * (2*N_freqs + 1)."""
    return in_channels * (2 * n_freqs + 1)


def freq_encode(x: jnp.ndarray, n_freqs: int, logscale: bool = True) -> jnp.ndarray:
    """Encode ``x`` (..., C) -> (..., C*(2*n_freqs+1)).

    Layout: [x, sin(f0 x), cos(f0 x), sin(f1 x), cos(f1 x), ...] where each
    block keeps the original C channels contiguous.
    """
    if n_freqs == 0:
        return x
    bands = freq_bands(n_freqs, logscale)
    parts = [x]
    for f in bands:
        fx = f * x
        parts.append(jnp.sin(fx))
        parts.append(jnp.cos(fx))
    return jnp.concatenate(parts, axis=-1)
