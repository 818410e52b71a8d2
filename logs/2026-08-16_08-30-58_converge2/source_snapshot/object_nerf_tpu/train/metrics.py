"""Image quality metrics (masked PSNR, SSIM).

Parity with utils/metrics.py:5-23 in the reference: PSNR is -10·log10 of the
(optionally masked) MSE. SSIM follows the standard Gaussian-window formula
(the reference routes through kornia's `ssim` with window 3); implemented
here directly in JAX with a uniform window of the same size.
"""

from __future__ import annotations

import jax.numpy as jnp
import jax


def mse(pred: jnp.ndarray, gt: jnp.ndarray, valid_mask=None) -> jnp.ndarray:
    err = (pred - gt) ** 2
    if valid_mask is None:
        return jnp.mean(err)
    m = jnp.broadcast_to(valid_mask.astype(err.dtype).reshape(err.shape[0], -1), err.shape)
    return jnp.sum(err * m) / jnp.maximum(jnp.sum(m), 1.0)


def psnr(pred: jnp.ndarray, gt: jnp.ndarray, valid_mask=None) -> jnp.ndarray:
    return -10.0 * jnp.log10(mse(pred, gt, valid_mask))


def ssim(pred: jnp.ndarray, gt: jnp.ndarray, window: int = 3) -> jnp.ndarray:
    """SSIM over (H, W, 3) images in [0,1]; returns the mean index in [-1,1]."""
    c1, c2 = 0.01**2, 0.03**2

    def blur(x):
        k = jnp.ones((window, window, 1, 1), x.dtype) / (window * window)
        x4 = x.transpose(2, 0, 1)[..., None]  # (3, H, W, 1)
        y = jax.lax.conv_general_dilated(
            x4, k, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
        return y[..., 0].transpose(1, 2, 0)

    mu_p, mu_g = blur(pred), blur(gt)
    var_p = blur(pred * pred) - mu_p**2
    var_g = blur(gt * gt) - mu_g**2
    cov = blur(pred * gt) - mu_p * mu_g
    s = ((2 * mu_p * mu_g + c1) * (2 * cov + c2)) / (
        (mu_p**2 + mu_g**2 + c1) * (var_p + var_g + c2)
    )
    return jnp.mean(s)
