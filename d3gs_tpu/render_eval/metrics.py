"""Offline metric harness: PSNR / SSIM / LPIPS over render dumps.

Counterpart of the reference metrics.py:26-98: reads renders/ and gt/
folders produced by the render CLI, computes per-view and mean metrics, and
writes results.json + per_view.json in the same layout.

LPIPS needs pretrained VGG/Alex weights; in a zero-egress environment those
may be unavailable, so LPIPS is computed when the `lpips` package (or
cached torchvision weights) can load and reported as null otherwise.
"""
from __future__ import annotations

import json
import os
from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..ops.losses import psnr as psnr_fn, ssim as ssim_fn


def _read_images(renders_dir: str, gt_dir: str):
    import imageio.v2 as imageio
    names = sorted(os.listdir(renders_dir))
    renders, gts = [], []
    for fname in names:
        r = np.asarray(imageio.imread(os.path.join(renders_dir, fname)),
                       np.float32) / 255.0
        g = np.asarray(imageio.imread(os.path.join(gt_dir, fname)),
                       np.float32) / 255.0
        renders.append(r[..., :3])
        gts.append(g[..., :3])
    return renders, gts, names


def _try_lpips():
    # 1st choice: the pure-JAX LPIPS (render_eval/lpips_jax.py) with v0.1
    # VGG weights from an npz (LPIPS_WEIGHTS env or ./lpips_vgg.npz).
    # An explicitly-set LPIPS_WEIGHTS that fails to load RAISES (loud) —
    # only the implicit default degrades to null.
    import jax
    from . import lpips_jax
    params = lpips_jax.load_params()
    if params is not None:
        f_jit = jax.jit(lambda a, b: lpips_jax.lpips(params, a, b))
        return lambda a, b: float(f_jit(jnp.asarray(a), jnp.asarray(b)))
    # fallback: the pip lpips package (what reference metrics.py:18-19 uses)
    try:
        import lpips  # noqa
        import torch
        net = lpips.LPIPS(net="vgg")
        def f(a, b):
            ta = torch.tensor(a).permute(2, 0, 1)[None] * 2 - 1
            tb = torch.tensor(b).permute(2, 0, 1)[None] * 2 - 1
            with torch.no_grad():
                return float(net(ta, tb))
        return f
    except Exception:
        return None


def evaluate_dir(method_dir: str) -> dict:
    """Evaluate one ours_<iter> directory -> metric dict."""
    renders, gts, names = _read_images(os.path.join(method_dir, "renders"),
                                       os.path.join(method_dir, "gt"))
    lp = _try_lpips()
    if lp is None:
        print("metrics: no LPIPS weights (set LPIPS_WEIGHTS or install the "
              "pip lpips package) — reporting LPIPS as null")
    per_view = {"PSNR": {}, "SSIM": {}, "LPIPS": {}}
    psnrs, ssims, lpipss = [], [], []
    for r, g, n in zip(renders, gts, names):
        p = float(psnr_fn(jnp.asarray(r), jnp.asarray(g)))
        s = float(ssim_fn(jnp.asarray(r), jnp.asarray(g)))
        psnrs.append(p)
        ssims.append(s)
        per_view["PSNR"][n] = p
        per_view["SSIM"][n] = s
        if lp is not None:
            l = lp(r, g)
            lpipss.append(l)
            per_view["LPIPS"][n] = l
    out = {
        "PSNR": float(np.mean(psnrs)) if psnrs else None,
        "SSIM": float(np.mean(ssims)) if ssims else None,
        "LPIPS": float(np.mean(lpipss)) if lpipss else None,
    }
    return out, per_view


def evaluate_model_paths(model_paths: list[str]) -> dict:
    """metrics.py::evaluate — results.json / per_view.json per model dir."""
    all_results = {}
    for mp in model_paths:
        test_dir = os.path.join(mp, "test")
        results, per_views = {}, {}
        if os.path.isdir(test_dir):
            for method in sorted(os.listdir(test_dir)):
                mdir = os.path.join(test_dir, method)
                if not os.path.isdir(os.path.join(mdir, "renders")):
                    continue
                res, pv = evaluate_dir(mdir)
                results[method] = res
                per_views[method] = pv
        with open(os.path.join(mp, "results.json"), "w") as f:
            json.dump(results, f, indent=2)
        with open(os.path.join(mp, "per_view.json"), "w") as f:
            json.dump(per_views, f, indent=2)
        all_results[mp] = results
    return all_results
