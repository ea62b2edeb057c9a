"""Image losses and metrics: L1/L2, PSNR, windowed SSIM.

Counterparts of utils/loss_utils.py and utils/image_utils.py in the reference.
SSIM uses the same 11x11 sigma=1.5 separable Gaussian window; on TPU we run it
channels-last as two depthwise 1-D convolutions (separable — cheaper than the
reference's fused 2-D conv and maps onto the VPU/MXU cleanly).

Images here are (H, W, C) or batched (..., H, W, C), float in [0, 1].
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def l1_loss(pred: jax.Array, target: jax.Array) -> jax.Array:
    return jnp.mean(jnp.abs(pred - target))


def l2_loss(pred: jax.Array, target: jax.Array) -> jax.Array:
    return jnp.mean((pred - target) ** 2)


def mse(pred: jax.Array, target: jax.Array) -> jax.Array:
    return jnp.mean((pred - target) ** 2)


def psnr(pred: jax.Array, target: jax.Array) -> jax.Array:
    """Peak signal-to-noise ratio in dB (utils/image_utils.py:19-21 semantics:
    per-image MSE over flattened pixels)."""
    m = jnp.mean((pred - target) ** 2)
    return 20.0 * jnp.log10(1.0 / jnp.sqrt(jnp.maximum(m, 1e-20)))


def kl_divergence(mu0, logvar0, mu1, logvar1) -> jax.Array:
    """Gaussian KL (reference utils/loss_utils.py:24-39, kept for parity)."""
    return 0.5 * jnp.mean(
        logvar1 - logvar0
        + (jnp.exp(logvar0) + (mu0 - mu1) ** 2) / jnp.exp(logvar1)
        - 1.0
    )


@functools.lru_cache(maxsize=8)
def _gaussian_window(size: int, sigma: float):
    # cache a NUMPY constant: any jnp array materialized inside a jit trace
    # is a tracer, and caching one across traces leaks it
    import numpy as np
    x = np.arange(size, dtype=np.float32) - size // 2
    g = np.exp(-(x ** 2) / (2 * sigma ** 2))
    return g / g.sum()


def _blur(img: jax.Array, window: jax.Array) -> jax.Array:
    """Separable depthwise blur of (H, W, C) with SAME padding."""
    size = window.shape[0]
    c = img.shape[-1]
    x = img[None]  # NHWC
    kh = jnp.tile(window.reshape(size, 1, 1, 1), (1, 1, 1, c))
    kw = jnp.tile(window.reshape(1, size, 1, 1), (1, 1, 1, c))
    dn = jax.lax.conv_dimension_numbers(x.shape, kh.shape, ("NHWC", "HWIO", "NHWC"))
    x = jax.lax.conv_general_dilated(x, kh, (1, 1), "SAME", dimension_numbers=dn,
                                     feature_group_count=c)
    x = jax.lax.conv_general_dilated(x, kw, (1, 1), "SAME", dimension_numbers=dn,
                                     feature_group_count=c)
    return x[0]


def ssim(img1: jax.Array, img2: jax.Array, window_size: int = 11,
         sigma: float = 1.5) -> jax.Array:
    """Mean SSIM over an (H, W, C) image pair.

    Same constants and window as the reference (utils/loss_utils.py:42-73):
    C1 = 0.01^2, C2 = 0.03^2, uniform average over all pixels/channels.
    """
    window = _gaussian_window(window_size, sigma)
    mu1 = _blur(img1, window)
    mu2 = _blur(img2, window)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = _blur(img1 * img1, window) - mu1_sq
    sigma2_sq = _blur(img2 * img2, window) - mu2_sq
    sigma12 = _blur(img1 * img2, window) - mu1_mu2
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    ssim_map = ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2))
    return jnp.mean(ssim_map)


def photometric_loss(pred: jax.Array, target: jax.Array,
                     lambda_dssim: float) -> jax.Array:
    """(1-λ)·L1 + λ·(1-SSIM), the training objective (train.py:245-247)."""
    return (1.0 - lambda_dssim) * l1_loss(pred, target) + lambda_dssim * (
        1.0 - ssim(pred, target))
