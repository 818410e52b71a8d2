import numpy as np
import jax.numpy as jnp

from object_nerf_tpu.models.embedding import (
    freq_encode,
    freq_encode_channels,
    freq_bands,
)


def test_channel_count():
    assert freq_encode_channels(3, 10) == 63
    assert freq_encode_channels(3, 4) == 27
    assert freq_encode_channels(16, 6) == 208
    assert freq_encode_channels(8, 6) == 104


def test_layout_identity_then_sincos():
    """Layout must be [x, sin(2^0 x), cos(2^0 x), sin(2 x), cos(2 x), ...]."""
    x = np.random.RandomState(0).randn(5, 3).astype(np.float32)
    out = np.asarray(freq_encode(jnp.asarray(x), 4))
    assert out.shape == (5, 27)
    np.testing.assert_allclose(out[:, :3], x, rtol=1e-6)
    for k in range(4):
        f = 2.0**k
        np.testing.assert_allclose(
            out[:, 3 + 6 * k : 6 + 6 * k], np.sin(f * x), rtol=1e-5, atol=1e-6
        )
        np.testing.assert_allclose(
            out[:, 6 + 6 * k : 9 + 6 * k], np.cos(f * x), rtol=1e-5, atol=1e-6
        )


def test_linear_bands():
    b = freq_bands(4, logscale=False)
    np.testing.assert_allclose(b, np.linspace(1, 8, 4))


def test_zero_freqs_is_identity():
    x = jnp.ones((2, 3))
    assert freq_encode(x, 0).shape == (2, 3)
