"""Image quality metrics (masked PSNR, SSIM).

Parity with utils/metrics.py:5-23 in the reference: PSNR is -10·log10 of the
(optionally masked) MSE. SSIM replicates the reference's exact pipeline —
kornia==0.4.1 `kornia.losses.ssim(img1, img2, 3, "mean")` (3×3 gaussian
window, sigma 1.5, zero-padded same conv, per-channel, DSSIM clamp) followed
by the reference's `1 - 2·dssim` un-mapping — so val/ssim numbers are
directly comparable to reference-side logs.
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


def _gaussian_kernel2d(window: int, sigma: float = 1.5) -> jnp.ndarray:
    """kornia 0.4.1 get_gaussian_kernel2d: normalized separable gaussian."""
    x = jnp.arange(window, dtype=jnp.float32) - window // 2
    if window % 2 == 0:
        x = x + 0.5
    g = jnp.exp(-(x**2) / (2.0 * sigma**2))
    g = g / g.sum()
    return jnp.outer(g, g)


def ssim_map(
    pred: jnp.ndarray, gt: jnp.ndarray, window: int = 3, max_val: float = 1.0
) -> jnp.ndarray:
    """Per-pixel SSIM index map (H, W, 3) — kornia 0.4.1 math: gaussian
    window sigma 1.5, zero-padded same conv per channel, C=(0.01·max)²,
    (0.03·max)². Exposed so tests can validate the interior against an
    independent valid-window implementation (tf.image.ssim)."""
    c1, c2 = (0.01 * max_val) ** 2, (0.03 * max_val) ** 2
    pad = (window - 1) // 2
    k = _gaussian_kernel2d(window).astype(pred.dtype)[..., None, None]

    def blur(x):
        x4 = x.transpose(2, 0, 1)[..., None]  # (3, H, W, 1): channels as batch
        y = jax.lax.conv_general_dilated(
            x4, k, (1, 1), [(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y[..., 0].transpose(1, 2, 0)

    mu_p, mu_g = blur(pred), blur(gt)
    var_p = blur(pred * pred) - mu_p**2
    var_g = blur(gt * gt) - mu_g**2
    cov = blur(pred * gt) - mu_p * mu_g
    return ((2 * mu_p * mu_g + c1) * (2 * cov + c2)) / (
        (mu_p**2 + mu_g**2 + c1) * (var_p + var_g + c2)
    )


def ssim(
    pred: jnp.ndarray, gt: jnp.ndarray, window: int = 3, max_val: float = 1.0
) -> jnp.ndarray:
    """SSIM over (H, W, 3) images in [0,1]; returns the mean index in [-1,1].

    Bit-faithful to the reference metric (utils/metrics.py:18-23): kornia
    0.4.1 SSIM (`ssim_map` above) then `clamp((1-s)/2, 0, 1)` DSSIM and
    the reference's `1 - 2·dssim` back to an index.
    """
    s = ssim_map(pred, gt, window=window, max_val=max_val)
    dssim = jnp.clip((1.0 - s) / 2.0, 0.0, 1.0)
    return 1.0 - 2.0 * jnp.mean(dssim)
