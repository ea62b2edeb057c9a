"""Per-Gaussian preprocessing: frustum cull, EWA projection, conic, tile bbox.

This is the TPU-native equivalent of the reference CUDA rasterizer's
`preprocessCUDA` stage (submodules/depth-diff-gaussian-rasterization; API
reconstructed in SURVEY.md §2.3). Instead of one CUDA thread per Gaussian, the
whole stage is batched jnp over the N axis — XLA fuses the chain (view
transform → perspective → EWA Jacobian → 2x2 inverse → radius/bbox) into a
few vectorized kernels, and the N axis shards trivially over a device mesh.

Conventions (identical to the reference so outputs are comparable):
  * view/proj matrices are ROW-VECTOR convention (x_row @ M), as cached by the
    reference Camera (scene/cameras.py:55-61).
  * frustum cull at view-space z <= 0.2.
  * EWA 2D covariance gets a +0.3 pixel dilation on the diagonal.
  * radius = ceil(3·sqrt(max eigenvalue of dilated cov2d)).
  * optional Mip-Splatting-style opacity compensation `sqrt(det_raw/det_dil)`
    (the fork's rasterizer branch is named `filter-norm`; gate via flag).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

TILE = 16  # pixels per tile side


class ProjectedSplats(NamedTuple):
    """Per-Gaussian screen-space quantities, all padded to N."""
    means2d: jax.Array      # (N, 2) pixel coords
    depths: jax.Array       # (N,) view-space z
    conics: jax.Array       # (N, 3) inverse 2D covariance, packed (a, b, c)
    radii: jax.Array        # (N,) int32 pixel radius, 0 => culled
    colors: jax.Array       # (N, 3) RGB after SH eval (or passthrough)
    opacities: jax.Array    # (N,) after activation (+ optional compensation)
    tile_min: jax.Array     # (N, 2) int32 inclusive tile bbox min (x, y)
    tile_max: jax.Array     # (N, 2) int32 exclusive tile bbox max (x, y)
    visible: jax.Array      # (N,) bool
    cull_radius: jax.Array  # (N,) f32 EXACT alpha radius sqrt(2·λ1·ln(255·
    #                         opa)) in pixels (unclamped): beyond it alpha <
    #                         1/255 at every pixel, so binning may drop
    #                         bbox-corner tiles output-exactly


def ndc_to_pixel(ndc: jax.Array, size: jax.Array | int) -> jax.Array:
    """((ndc + 1)·S - 1) / 2, the reference rasterizer's pixel mapping."""
    return ((ndc + 1.0) * size - 1.0) * 0.5


def project_gaussians(
    means3d: jax.Array,        # (N, 3)
    cov3d: jax.Array,          # (N, 6) packed upper-tri (or None, see below)
    opacities: jax.Array,      # (N,)
    colors: jax.Array,         # (N, 3) precomputed RGB
    viewmatrix: jax.Array,     # (4, 4) row-vector convention
    projmatrix: jax.Array,     # (4, 4) full (view @ proj), row-vector
    tanfovx: float | jax.Array,
    tanfovy: float | jax.Array,
    width: int,
    height: int,
    *,
    antialias: bool = False,
    alive: jax.Array | None = None,  # (N,) bool padding mask
    scales: jax.Array | None = None,      # (N, 3) ACTIVATED scales and
    rotations: jax.Array | None = None,   # (N, 4) quats: cancellation-free
    #   EWA path (see below); cov3d may then be None
) -> ProjectedSplats:
    """EWA-project Gaussians to screen space. Static width/height.

    When `scales`/`rotations` are given, the 2D covariance is computed from
    the FACTOR A = T·R·diag(s) (2x3) instead of the packed Σ:
    a=|A₀|², c=|A₁|², b=A₀·A₁, and by Cauchy-Binet
        det_raw = Σ_{i<j} (A₀ᵢA₁ⱼ − A₀ⱼA₁ᵢ)²  (sum of squares, ≥ 0)
        det     = det_raw + 0.3·(a+c) + 0.09   (≥ 0.09 by construction).
    The classic `a·c − b²` form cancels catastrophically in f32 once cov2d
    entries reach ~1e6 (high focal × near/inflated splats — routine during
    the deform warm-up transition at 400px+), and the backward's 1/det²
    then overflows to NaN. The factored form has no cancelling terms, so
    det and its gradients stay well-conditioned for ANY splat."""
    n = means3d.shape[0]
    focal_x = width / (2.0 * tanfovx)
    focal_y = height / (2.0 * tanfovy)

    ones = jnp.ones((n, 1), means3d.dtype)
    hom = jnp.concatenate([means3d, ones], axis=-1)
    p_view = hom @ viewmatrix            # (N, 4) row-vector transform
    p_hom = hom @ projmatrix             # (N, 4)
    p_w = 1.0 / (p_hom[:, 3] + 1e-7)
    p_proj = p_hom[:, :3] * p_w[:, None]

    tz = p_view[:, 2]
    in_front = tz > 0.2

    # EWA: clamp view-space x/y to 1.3·tanfov (limits Jacobian blowup at edges)
    txtz = jnp.clip(p_view[:, 0] / tz, -1.3 * tanfovx, 1.3 * tanfovx)
    tytz = jnp.clip(p_view[:, 1] / tz, -1.3 * tanfovy, 1.3 * tanfovy)
    tx, ty = txtz * tz, tytz * tz

    safe_tz = jnp.where(in_front, tz, 1.0)
    # J: Jacobian of (x, y) pixel-scaled perspective at the clamped point
    j00 = focal_x / safe_tz
    j11 = focal_y / safe_tz
    j02 = -focal_x * tx / (safe_tz * safe_tz)
    j12 = -focal_y * ty / (safe_tz * safe_tz)

    # W: rotation part of world→view, row-vector convention means the 3x3
    # upper-left of viewmatrix is R^T as stored; T = J @ W^T acts on the
    # world-frame covariance: cov2d = T Σ Tᵀ. Expanded as scalar channels
    # (J is [[j00,0,j02],[0,j11,j12]], W^T is a per-camera constant): the
    # batched (N,2,3)@(N,3,3) form lowers to padded TPU convolutions that
    # cost ~ms at N=44k; the channel form is one fused elementwise pass.
    Wr = viewmatrix[:3, :3].T  # (3, 3): world→view linear map, column conv.
    t00 = j00 * Wr[0, 0] + j02 * Wr[2, 0]
    t01 = j00 * Wr[0, 1] + j02 * Wr[2, 1]
    t02 = j00 * Wr[0, 2] + j02 * Wr[2, 2]
    t10 = j11 * Wr[1, 0] + j12 * Wr[2, 0]
    t11 = j11 * Wr[1, 1] + j12 * Wr[2, 1]
    t12 = j11 * Wr[1, 2] + j12 * Wr[2, 2]

    if scales is not None:
        from .transforms import quat_to_rotmat_cols
        r00, r01, r02, r10, r11, r12, r20, r21, r22 = \
            quat_to_rotmat_cols(rotations)
        s0, s1, s2 = scales[:, 0], scales[:, 1], scales[:, 2]
        # A = T R diag(s), scalar channels; A[i,j] = (tᵢ · R[:,j]) sⱼ
        a0 = (t00 * r00 + t01 * r10 + t02 * r20) * s0
        a1 = (t00 * r01 + t01 * r11 + t02 * r21) * s1
        a2 = (t00 * r02 + t01 * r12 + t02 * r22) * s2
        c0 = (t10 * r00 + t11 * r10 + t12 * r20) * s0
        c1 = (t10 * r01 + t11 * r11 + t12 * r21) * s1
        c2 = (t10 * r02 + t11 * r12 + t12 * r22) * s2
        a_raw = a0 * a0 + a1 * a1 + a2 * a2
        c_raw = c0 * c0 + c1 * c1 + c2 * c2
        b_raw = a0 * c0 + a1 * c1 + a2 * c2
        m01 = a0 * c1 - a1 * c0
        m02 = a0 * c2 - a2 * c0
        m12 = a1 * c2 - a2 * c1
        det_raw = m01 * m01 + m02 * m02 + m12 * m12
        a, c = a_raw + 0.3, c_raw + 0.3
        b = b_raw
        det = det_raw + 0.3 * (a_raw + c_raw) + 0.09   # >= 0.09 always
        det_ok = det > 0.0
        inv_det = 1.0 / det
    else:
        xx, xy, xz, yy, yz, zz = (cov3d[:, i] for i in range(6))
        a_raw = (t00 * t00 * xx + t01 * t01 * yy + t02 * t02 * zz
                 + 2.0 * (t00 * t01 * xy + t00 * t02 * xz + t01 * t02 * yz))
        b_raw = (t00 * t10 * xx + t01 * t11 * yy + t02 * t12 * zz
                 + (t00 * t11 + t01 * t10) * xy
                 + (t00 * t12 + t02 * t10) * xz
                 + (t01 * t12 + t02 * t11) * yz)
        c_raw = (t10 * t10 * xx + t11 * t11 * yy + t12 * t12 * zz
                 + 2.0 * (t10 * t11 * xy + t10 * t12 * xz + t11 * t12 * yz))
        det_raw = a_raw * c_raw - b_raw * b_raw
        a, c = a_raw + 0.3, c_raw + 0.3
        b = b_raw
        det = a * c - b * b
        det_ok = det > 0.0
        inv_det = 1.0 / jnp.where(det_ok, det, 1.0)
    conic = jnp.stack([c * inv_det, -b * inv_det, a * inv_det], axis=-1)

    if antialias:
        comp = jnp.sqrt(jnp.maximum(det_raw, 0.0) * inv_det)
        opacities = opacities * comp

    # radius from eigenvalues of the dilated cov2d. The reference uses a
    # fixed 3σ; we additionally clamp to the alpha-aware radius
    # σ·sqrt(2·ln(255·opa)) beyond which alpha < 1/255 at EVERY pixel (the
    # blend's alpha-min test skips such splats without consuming
    # transmittance), so the shrink is output-exact and cuts the duplicate
    # count at the source — especially after opacity resets.
    mid = 0.5 * (a + c)
    lam1 = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    sig = jnp.sqrt(lam1)
    # the log argument clamp keeps opa < 1/255 from producing sqrt(<0)=NaN
    # (such splats pass no alpha-min test anywhere: radius 0 is exact)
    sigma_exact = jnp.sqrt(jnp.maximum(
        2.0 * jnp.log(jnp.maximum(opacities, 1e-30) * 255.0), 0.0))
    sigma_mul = jnp.minimum(3.0, sigma_exact)
    radius = jnp.ceil(sigma_mul * sig)
    # exact alpha radius in pixels (UNclamped): alpha < 1/255 everywhere
    # beyond it, so binning's corner-tile cull may use it output-exactly
    # even where the rect itself is the reference's 3σ clamp
    cull_radius = sigma_exact * sig
    # per-axis alpha-aware extents: the max of the Gaussian exponent along a
    # pixel column at |dx| from the mean is -dx²/(2·a) (a = dilated cov_xx),
    # so columns beyond sigma_exact·sqrt(a) have alpha < 1/255 everywhere —
    # dropping them is output-exact. Clamped to the circle radius so the
    # rect never exceeds the reference's 3σ-clamped bbox semantics.
    rx = jnp.minimum(radius, jnp.ceil(sigma_exact * jnp.sqrt(a)))
    ry = jnp.minimum(radius, jnp.ceil(sigma_exact * jnp.sqrt(c)))
    # reference 3σ radius (diff-gaussian-rasterization forward.cu
    # computeCov2D): reported in `radii` so max_radii2d / size-prune /
    # densification stats see reference semantics even though tile binning
    # uses the tighter alpha-aware radius above (output-exact shrink)
    radius3 = jnp.ceil(3.0 * sig)

    mean2d = jnp.stack([
        ndc_to_pixel(p_proj[:, 0], width),
        ndc_to_pixel(p_proj[:, 1], height),
    ], axis=-1)

    tiles_x = (width + TILE - 1) // TILE
    tiles_y = (height + TILE - 1) // TILE
    tmin_x = jnp.clip(((mean2d[:, 0] - rx) / TILE).astype(jnp.int32), 0, tiles_x)
    tmin_y = jnp.clip(((mean2d[:, 1] - ry) / TILE).astype(jnp.int32), 0, tiles_y)
    # exclusive tile-bbox max
    tmax_x = jnp.clip(jnp.floor((mean2d[:, 0] + rx) / TILE).astype(jnp.int32) + 1, 0, tiles_x)
    tmax_y = jnp.clip(jnp.floor((mean2d[:, 1] + ry) / TILE).astype(jnp.int32) + 1, 0, tiles_y)

    nonempty = (tmax_x > tmin_x) & (tmax_y > tmin_y)
    visible = in_front & det_ok & nonempty & (radius > 0)
    if alive is not None:
        visible = visible & alive

    # stats visibility matches the reference's `radii > 0` filter
    # (in-frustum, valid cov, non-empty 3σ tile rect, alive) independent of
    # the alpha-aware clamp used for binning
    n3min_x = jnp.clip(((mean2d[:, 0] - radius3) / TILE).astype(jnp.int32),
                       0, tiles_x)
    n3min_y = jnp.clip(((mean2d[:, 1] - radius3) / TILE).astype(jnp.int32),
                       0, tiles_y)
    n3max_x = jnp.clip(jnp.floor((mean2d[:, 0] + radius3) / TILE)
                       .astype(jnp.int32) + 1, 0, tiles_x)
    n3max_y = jnp.clip(jnp.floor((mean2d[:, 1] + radius3) / TILE)
                       .astype(jnp.int32) + 1, 0, tiles_y)
    vis_stats = in_front & det_ok & (radius3 > 0) \
        & (n3max_x > n3min_x) & (n3max_y > n3min_y)
    if alive is not None:
        vis_stats = vis_stats & alive
    radii = jnp.where(vis_stats, radius3, 0.0).astype(jnp.int32)
    return ProjectedSplats(
        means2d=mean2d,
        depths=tz,
        conics=conic,
        radii=radii,
        colors=colors,
        opacities=jnp.where(visible, opacities, 0.0),
        tile_min=jnp.stack([tmin_x, tmin_y], axis=-1),
        tile_max=jnp.stack([tmax_x, tmax_y], axis=-1),
        visible=visible,
        cull_radius=jnp.where(visible, cull_radius, 0.0),
    )
