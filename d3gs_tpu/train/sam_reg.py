"""Mask-consistency regularization (SAM-variant trainer).

Counterpart of the reference train_baseline_sam.py: SAM2 automatic masks
are cached per training image (:177-198), Gaussians are projected to pixels
via the camera's full projection (:79-99), and for every mask the variance
of the deformation outputs (δx, δr, δs) over the Gaussians landing inside
it is penalized (compute_mask_regularization :45-152, weight 0.5 :272) —
"things on the same object should move rigidly".

TPU re-design: masks enter as a per-image int32 LABEL MAP (H, W) with
`num_masks` segments (0 = background / no mask) instead of a list of
boolean masks, so membership is one gather and the per-mask variances are
segment statistics — fully jittable, no per-mask Python loop. SAM2 itself
is an external model; `load_label_maps` reads precomputed maps (the
reference also caches masks to disk), and any segmentation source works.
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def project_to_pixels(xyz: jax.Array, full_proj: jax.Array, width: int,
                      height: int):
    """Project points with the camera's full transform to pixel coords
    (reference train_baseline_sam.py:79-99). Returns (px (N,2) float,
    in_frame (N,) bool)."""
    n = xyz.shape[0]
    hom = jnp.concatenate([xyz, jnp.ones((n, 1), xyz.dtype)], axis=1)
    p = hom @ full_proj
    w = p[:, 3:4]
    ndc = p[:, :3] / jnp.where(jnp.abs(w) < 1e-7, 1e-7, w)
    px = ((ndc[:, 0] + 1) * width - 1) * 0.5
    py = ((ndc[:, 1] + 1) * height - 1) * 0.5
    in_frame = (w[:, 0] > 0) & (px >= 0) & (px < width) & (py >= 0) & \
        (py < height)
    return jnp.stack([px, py], axis=-1), in_frame


def _masked_variance(values: jax.Array, seg_ids: jax.Array,
                     weights: jax.Array, num_segments: int) -> jax.Array:
    """Mean per-segment variance of `values` (N, D), weighted membership.
    Returns the summed variance over segments and dims (the reference sums
    torch.var over each mask's members and components)."""
    w = weights
    cnt = jax.ops.segment_sum(w, seg_ids, num_segments)             # (S,)
    s1 = jax.ops.segment_sum(values * w[:, None], seg_ids, num_segments)
    s2 = jax.ops.segment_sum(values ** 2 * w[:, None], seg_ids,
                             num_segments)
    safe = jnp.maximum(cnt, 2.0)[:, None]
    mean = s1 / safe
    var = s2 / safe - mean ** 2
    valid = (cnt >= 2.0)[:, None]
    return jnp.sum(jnp.where(valid, jnp.maximum(var, 0.0), 0.0))


def mask_regularization(
    labels: jax.Array,          # (H, W) int32, 0 = unassigned
    num_masks: int,             # static upper bound on label count
    xyz: jax.Array,             # (N, 3) DEFORMED positions
    full_proj: jax.Array,       # (4, 4)
    d_xyz, d_rotation, d_scaling,
    alive: jax.Array,
    width: int, height: int,
) -> jax.Array:
    """Σ_masks Σ_components var(deform outputs of member Gaussians)."""
    px, in_frame = project_to_pixels(xyz, full_proj, width, height)
    xi = jnp.clip(px[:, 0].astype(jnp.int32), 0, width - 1)
    yi = jnp.clip(px[:, 1].astype(jnp.int32), 0, height - 1)
    seg = labels[yi, xi]
    member = in_frame & alive & (seg > 0)
    wgt = member.astype(jnp.float32)

    total = 0.0
    for comp in (d_xyz, d_rotation, d_scaling):
        if isinstance(comp, jax.Array) and comp.ndim >= 2:
            vals = comp.reshape(comp.shape[0], -1)
            total = total + _masked_variance(vals, seg, wgt, num_masks + 1)
    return total


def load_label_maps(mask_dir: str, image_names: list[str],
                    num_masks: int = 64) -> dict[str, np.ndarray]:
    """Load per-image precomputed segmentation label maps. Accepts
    <name>.npy int maps or <name>.png paletted images (the reference caches
    SAM2 masks similarly, train_baseline_sam.py:177-198). Labels are
    clipped to num_masks."""
    out = {}
    for name in image_names:
        npy = os.path.join(mask_dir, name + ".npy")
        png = os.path.join(mask_dir, name + ".png")
        if os.path.exists(npy):
            lab = np.load(npy)
        elif os.path.exists(png):
            from PIL import Image
            lab = np.asarray(Image.open(png), dtype=np.int64)
            if lab.ndim == 3:
                lab = lab[..., 0]
        else:
            continue
        out[name] = np.clip(lab, 0, num_masks).astype(np.int32)
    return out


def grid_label_map(height: int, width: int, cells: int = 8) -> np.ndarray:
    """Fallback segmentation: regular grid labels (useful for tests and as
    a weak rigidity prior when no SAM masks are available)."""
    ys = (np.arange(height)[:, None] * cells) // height
    xs = (np.arange(width)[None, :] * cells) // width
    return (ys * cells + xs + 1).astype(np.int32)
