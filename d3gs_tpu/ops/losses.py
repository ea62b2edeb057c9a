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


@functools.lru_cache(maxsize=8)
def _band_matrix(dim: int, size: int, sigma: float):
    """(dim, dim) banded Gaussian blur matrix with SAME zero padding —
    separable blur as two MXU matmuls instead of grouped convolutions
    (3-channel depthwise convs waste the TPU conv unit; a (H,H)@(H,W·K)
    matmul runs at MXU speed)."""
    import numpy as np
    g = _gaussian_window(size, sigma)
    b = np.zeros((dim, dim), np.float32)
    half = size // 2
    for o in range(-half, half + 1):
        v = g[o + half]
        d = np.eye(dim, k=o, dtype=np.float32) * v
        b += d
    return b


def _blur(img: jax.Array, size: int, sigma: float) -> jax.Array:
    """Separable blur of (H, W, C) with SAME padding via banded matmuls.

    HIGHEST precision always: SSIM's variances are blur(x²) − μ² — a
    cancellation of nearly-equal terms. At the TPU default single-bf16-pass
    matmul precision the rounding noise exceeds the true variance in
    near-flat regions, producing negative variances, near-zero denominators
    and SSIM values far outside [-1, 1] (observed 6.6 on real renders).
    The two 400×400-scale matmuls cost microseconds at full precision."""
    h, w = img.shape[0], img.shape[1]
    bh = jnp.asarray(_band_matrix(h, size, sigma))
    bw = jnp.asarray(_band_matrix(w, size, sigma))
    x = jnp.einsum("Hh,hwc->Hwc", bh, img,
                   preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
    return jnp.einsum("hwc,wW->hWc", x, bw,
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)


def ssim_map(img1: jax.Array, img2: jax.Array, window_size: int = 11,
             sigma: float = 1.5) -> jax.Array:
    """Per-pixel SSIM map of an (H, W, C) image pair (`ssim` is its mean).

    Exposed separately so sharded losses can blur a halo-extended image
    strip and crop (parallel/sharded.py): a strip plus `window_size//2`
    rows of true neighbor pixels reproduces the full-image map exactly
    (zero halos at the outermost strips = the blur's SAME zero padding).
    """
    stack = jnp.concatenate(
        [img1, img2, img1 * img1, img2 * img2, img1 * img2], axis=-1)
    blurred = _blur(stack, window_size, sigma)
    c = img1.shape[-1]
    mu1, mu2 = blurred[..., 0:c], blurred[..., c:2 * c]
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = blurred[..., 2 * c:3 * c] - mu1_sq
    sigma2_sq = blurred[..., 3 * c:4 * c] - mu2_sq
    sigma12 = blurred[..., 4 * c:5 * c] - mu1_mu2
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    return ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2))


def ssim(img1: jax.Array, img2: jax.Array, window_size: int = 11,
         sigma: float = 1.5) -> jax.Array:
    """Mean SSIM over an (H, W, C) image pair.

    Same constants and window as the reference (utils/loss_utils.py:42-73):
    C1 = 0.01^2, C2 = 0.03^2, uniform average over all pixels/channels.
    All five blurred maps are computed in ONE pair of banded matmuls by
    stacking along channels.
    """
    return jnp.mean(ssim_map(img1, img2, window_size, sigma))


def photometric_loss(pred: jax.Array, target: jax.Array,
                     lambda_dssim: float) -> jax.Array:
    """(1-λ)·L1 + λ·(1-SSIM), the training objective (train.py:245-247)."""
    return (1.0 - lambda_dssim) * l1_loss(pred, target) + lambda_dssim * (
        1.0 - ssim(pred, target))
