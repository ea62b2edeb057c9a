"""LPIPS (Learned Perceptual Image Patch Similarity) in pure JAX.

Counterpart of the reference's vendored lpipsPyTorch/ (modules/lpips.py,
networks.py: VGG16 backbone, unit-normalized feature differences, 1x1
linear heads, spatial average, layer sum) and of the pip `lpips` package
that metrics.py actually uses (reference metrics.py:18-19).

The v0.1 weights (VGG16 conv stack + 5 linear heads) are NOT shipped —
this environment has no egress — so weights load from an .npz produced by
`export_weights_from_torch()` on any machine with torchvision + lpips
installed, or from LPIPS_WEIGHTS env var. Without weights, callers fall
back to reporting LPIPS as null (render_eval/metrics.py), exactly like the
reference when its download fails.

Layout: images are (H, W, 3) float in [0, 1], channels-last throughout
(TPU-friendly); convs are lax.conv_general_dilated NHWC.
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

# VGG16 feature config: (out_channels, n_convs) per stage; LPIPS taps the
# output of the last relu in each stage (relu1_2, 2_2, 3_3, 4_3, 5_3)
_VGG_STAGES = [(64, 2), (128, 2), (256, 3), (512, 3), (512, 3)]

# ImageNet scaling used by LPIPS v0.1 (modules/utils.py normalize_tensor +
# scaling layer constants)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def _conv(x, w, b):
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    x = jax.lax.conv_general_dilated(x, w, (1, 1), "SAME",
                                     dimension_numbers=dn)
    return x + b[None, None, None, :]


def vgg16_features(params: dict, x: jax.Array) -> list[jax.Array]:
    """x: (N, H, W, 3) in LPIPS-normalized space. Returns the 5 tap
    activations."""
    taps = []
    i = 0
    for si, (ch, n_convs) in enumerate(_VGG_STAGES):
        for ci in range(n_convs):
            x = _conv(x, params[f"conv{i}_w"], params[f"conv{i}_b"])
            x = jax.nn.relu(x)
            i += 1
        taps.append(x)
        if si < len(_VGG_STAGES) - 1:
            x = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                      (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
    return taps


def lpips(params: dict, img1: jax.Array, img2: jax.Array) -> jax.Array:
    """LPIPS distance between two (H, W, 3) images in [0, 1]."""
    def prep(im):
        im = im * 2.0 - 1.0                       # [-1, 1], lpips convention
        im = (im - _SHIFT[None, None, :]) / _SCALE[None, None, :]
        return im[None]

    f1 = vgg16_features(params, prep(img1))
    f2 = vgg16_features(params, prep(img2))
    total = jnp.asarray(0.0)
    for li, (a, b) in enumerate(zip(f1, f2)):
        a = a / jnp.maximum(
            jnp.linalg.norm(a, axis=-1, keepdims=True), 1e-10)
        b = b / jnp.maximum(
            jnp.linalg.norm(b, axis=-1, keepdims=True), 1e-10)
        d = (a - b) ** 2                          # (1, h, w, c)
        w = params[f"lin{li}_w"]                  # (c,) 1x1 head, >= 0
        total = total + jnp.mean(jnp.sum(d * w[None, None, None, :],
                                         axis=-1))
    return total


def load_params(path: Optional[str] = None) -> Optional[dict]:
    """Load LPIPS vgg weights from npz (path arg, LPIPS_WEIGHTS env, or
    ./lpips_vgg.npz).

    Fails LOUDLY when weights were explicitly requested (a `path` argument
    or the LPIPS_WEIGHTS env var) but cannot be loaded; returns None only
    for the implicit default path, where the caller degrades to
    LPIPS=null like the reference does when its download fails."""
    explicit = path or os.environ.get("LPIPS_WEIGHTS")
    path = explicit or "lpips_vgg.npz"
    if not os.path.exists(path):
        if explicit:
            raise FileNotFoundError(
                f"LPIPS weights requested ({path}) but not found — export "
                "them with lpips_jax.export_weights_from_torch() on a "
                "machine with the pip lpips package, then point "
                "LPIPS_WEIGHTS at the npz")
        return None
    raw = dict(np.load(path))
    n_convs = sum(n for _, n in _VGG_STAGES)
    missing = [k for k in
               [f"conv{i}_{s}" for i in range(n_convs) for s in "wb"]
               + [f"lin{i}_w" for i in range(len(_VGG_STAGES))]
               if k not in raw]
    if missing:
        raise ValueError(f"LPIPS npz {path} is missing keys {missing[:4]}"
                         f"{'…' if len(missing) > 4 else ''}")
    return {k: jnp.asarray(v) for k, v in raw.items()}


def export_weights_from_torch(out_path: str = "lpips_vgg.npz"):
    """One-time converter (run where torchvision+lpips are installed):
    dumps VGG16 conv weights (HWIO) + LPIPS v0.1 linear heads to npz."""
    import lpips as lpips_pkg                     # type: ignore
    net = lpips_pkg.LPIPS(net="vgg")
    out = {}
    convs = [m for m in net.net.slice1] + [m for m in net.net.slice2] + \
            [m for m in net.net.slice3] + [m for m in net.net.slice4] + \
            [m for m in net.net.slice5]
    i = 0
    for m in convs:
        if m.__class__.__name__ == "Conv2d":
            out[f"conv{i}_w"] = m.weight.detach().numpy().transpose(
                2, 3, 1, 0)                        # OIHW -> HWIO
            out[f"conv{i}_b"] = m.bias.detach().numpy()
            i += 1
    for li, lin in enumerate(net.lins):
        w = lin.model[-1].weight.detach().numpy()  # (1, C, 1, 1)
        out[f"lin{li}_w"] = w[0, :, 0, 0]
    np.savez(out_path, **out)
    return out_path
