"""Differentiable tile-based alpha blending + the full rasterize pipeline.

TPU-first re-design of the reference CUDA rasterizer's `renderCUDA`
(front-to-back blend; SURVEY.md §2.3). Key idea: with per-tile depth-ordered
lists of capacity K (see binning.py), the sequential transmittance recurrence
    C += T·α·c ;  T *= (1-α)
becomes, per 16×16 tile, a dense computation:
    α   : (K, 256) from conics/means vs pixel grid      (VPU)
    logT: exclusive cumsum of log1p(-α) along K          (VPU, log-space)
    w   : T·α·include                                    (VPU)
    img : wᵀ @ colors  — a (256, K) @ (K, 3) matmul      (MXU)
which is exactly differentiable by JAX autodiff (the contributor set, like the
CUDA early-termination, is treated as non-differentiable). Tiles are processed
in chunks under `jax.checkpoint`, so backward memory is O(chunk) not O(image).

Early-termination semantics match the reference: a contribution is included
iff no prior (depth-ordered) splat in the tile drove T·(1-α) below 1e-4, and
splats with α < 1/255 are skipped without consuming transmittance.

Outputs image (H, W, 3), expected depth (H, W), accumulated alpha (H, W), and
per-Gaussian radii — the reference API's outputs (image, radii, depth) plus
alpha (gaussian_renderer/__init__.py:115-133).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .binning import (RecordBins, TileBins, bin_splats, bin_splats_records,
                      bin_splats_sorted)
from .projection import TILE, ProjectedSplats, project_gaussians

_T_EPS = 1e-4       # transmittance early-termination threshold
_ALPHA_MIN = 1.0 / 255.0
_ALPHA_MAX = 0.99

# packed blend record: [mean2d.x, mean2d.y, conic.a, conic.b, conic.c,
#                       r, g, b, opacity, depth, <6 pad>]
RECORD_WIDTH = 16


def pack_records(splats: ProjectedSplats) -> jax.Array:
    """(N, 16) f32 packed per-Gaussian blend record. TPU rationale: gathers
    cost per index, not per byte — one 64 B row fetch replaces five scalar
    gathers in the blend hot loop."""
    n = splats.depths.shape[0]
    pad = jnp.zeros((n, RECORD_WIDTH - 10), jnp.float32)
    return jnp.concatenate([
        splats.means2d,
        splats.conics,
        splats.colors,
        splats.opacities[:, None],
        splats.depths[:, None],
        pad,
    ], axis=-1)


def pack_records_full(splats: ProjectedSplats) -> jax.Array:
    """`pack_records` plus the binning fields in the pad lanes (10-14:
    tile_min x/y, tile_max x/y, visible — small ints, exact in f32). One
    (N, 16) row then carries everything a remote shard needs, so the
    sharded k-camera pipeline all-gathers ONE array per camera instead of
    the nine-leaf ProjectedSplats tree (parallel/sharded.py). The blend
    kernels read only lanes 0-9, so the same array feeds them directly."""
    return jnp.concatenate([
        pack_records(splats)[:, :10],
        splats.tile_min.astype(jnp.float32),
        splats.tile_max.astype(jnp.float32),
        splats.visible.astype(jnp.float32)[:, None],
        splats.cull_radius[:, None],
    ], axis=-1)


def unpack_records_full(rec: jax.Array) -> ProjectedSplats:
    """Inverse of `pack_records_full` (radii are not carried: the stats
    radii stay on the owning shard)."""
    n = rec.shape[0]
    return ProjectedSplats(
        means2d=rec[:, 0:2], depths=rec[:, 9], conics=rec[:, 2:5],
        radii=jnp.zeros((n,), jnp.int32), colors=rec[:, 5:8],
        opacities=rec[:, 8],
        tile_min=rec[:, 10:12].astype(jnp.int32),
        tile_max=rec[:, 12:14].astype(jnp.int32),
        visible=rec[:, 14] > 0.5,
        cull_radius=rec[:, 15])


class RenderOutput(NamedTuple):
    image: jax.Array    # (H, W, 3)
    depth: jax.Array    # (H, W) expected depth (unnormalized, like the fork)
    alpha: jax.Array    # (H, W) accumulated opacity
    radii: jax.Array    # (N,) int32, 0 => not visible
    counts: jax.Array   # (T,) per-tile intersection counts (overflow diag)


def _blend_tile_chunk(
    idx: jax.Array,        # (Tc, K) indices into padded gaussian arrays
    origin: jax.Array,     # (Tc, 2) tile pixel origin (x, y)
    means2d: jax.Array,    # (N+1, 2) padded with a zero row at N
    conics: jax.Array,     # (N+1, 3)
    colors: jax.Array,     # (N+1, 3)
    opacities: jax.Array,  # (N+1,)  padded row = 0 => no contribution
    depths: jax.Array,     # (N+1,)
    bg: jax.Array,         # (3,)
):
    tc, k = idx.shape
    mu = means2d[idx]            # (Tc, K, 2)
    con = conics[idx]            # (Tc, K, 3)
    rgb = colors[idx]            # (Tc, K, 3)
    opa = opacities[idx]         # (Tc, K)
    dep = depths[idx]            # (Tc, K)

    # pixel grid: integer pixel coordinates; layout (Tc, K, P) keeps the
    # transmittance recurrence on the sublane axis and P=256 on the lanes
    ly = jax.lax.broadcasted_iota(jnp.float32, (TILE, TILE), 0).reshape(-1)
    lx = jax.lax.broadcasted_iota(jnp.float32, (TILE, TILE), 1).reshape(-1)
    px = origin[:, None, 0:1] + lx[None, None, :]    # (Tc, 1, P)
    py = origin[:, None, 1:2] + ly[None, None, :]

    dx = mu[:, :, 0:1] - px                          # (Tc, K, P)
    dy = mu[:, :, 1:2] - py
    a = con[:, :, 0:1]
    b = con[:, :, 1:2]
    c = con[:, :, 2:3]
    power = -0.5 * (a * dx * dx + c * dy * dy) - b * dx * dy
    alpha = jnp.minimum(_ALPHA_MAX, opa[:, :, None] * jnp.exp(power))
    alpha = jnp.where((power > 0.0) | (alpha < _ALPHA_MIN), 0.0, alpha)

    # transmittance: exclusive cumprod of (1-α) along K — alpha ≤ 0.99 keeps
    # (1-α) ≥ 0.01, so the product (and its autodiff) is well-conditioned,
    # and one exp per element is the only transcendental in the kernel.
    om = 1.0 - alpha                                  # (Tc, K, P)
    om_shift = jnp.concatenate(
        [jnp.ones_like(om[:, :1]), om[:, :-1]], axis=1)
    t_before = jnp.cumprod(om_shift, axis=1)          # exclusive
    t_incl = t_before * om                            # inclusive (monotone ↓)
    include = t_incl >= _T_EPS                        # early-termination set

    w = t_before * alpha * include.astype(alpha.dtype)        # (Tc, K, P)
    img = jnp.einsum("tkp,tkc->tpc", w, rgb,
                     preferred_element_type=jnp.float32)       # MXU
    depth_img = jnp.einsum("tkp,tk->tp", w, dep,
                           preferred_element_type=jnp.float32)
    t_final = jnp.min(jnp.where(include, t_incl, 1.0), axis=1)  # (Tc, P)
    img = img + t_final[..., None] * bg[None, None, :]
    alpha_img = 1.0 - t_final
    return img, depth_img, alpha_img                           # (Tc,P,3),(Tc,P),(Tc,P)


@functools.partial(
    jax.jit, static_argnames=("tiles_x", "tiles_y", "width", "height",
                              "tile_chunk"))
def blend(
    splats: ProjectedSplats,
    bins: TileBins,
    bg: jax.Array,
    *,
    tiles_x: int,
    tiles_y: int,
    width: int,
    height: int,
    tile_chunk: int = 40,
    tile_y0: jax.Array | int = 0,
):
    """Blend all tiles and assemble the final (H, W, ...) images.

    With `tile_y0`, blends only tile rows [tile_y0, tile_y0+tiles_y) and
    returns that horizontal image strip (tile-sharded multi-device path)."""
    n = splats.depths.shape[0]
    num_tiles = tiles_x * tiles_y
    k = bins.tile_lists.shape[1]

    pad_row = lambda x: jnp.concatenate(
        [x, jnp.zeros((1,) + x.shape[1:], x.dtype)], axis=0)
    means2d = pad_row(splats.means2d)
    conics = pad_row(splats.conics)
    colors = pad_row(splats.colors)
    opac = pad_row(splats.opacities)
    depths = pad_row(splats.depths)

    tile_ox = (jnp.arange(num_tiles, dtype=jnp.int32) % tiles_x) * TILE
    tile_oy = (jnp.arange(num_tiles, dtype=jnp.int32) // tiles_x
               + tile_y0) * TILE
    origins = jnp.stack([tile_ox, tile_oy], axis=-1).astype(jnp.float32)

    tpad = (-num_tiles) % tile_chunk
    idx_all = jnp.pad(bins.tile_lists, ((0, tpad), (0, 0)), constant_values=n)
    org_all = jnp.pad(origins, ((0, tpad), (0, 0)))
    steps = (num_tiles + tpad) // tile_chunk
    idx_all = idx_all.reshape(steps, tile_chunk, k)
    org_all = org_all.reshape(steps, tile_chunk, 2)

    blend_fn = jax.checkpoint(
        lambda i, o: _blend_tile_chunk(i, o, means2d, conics, colors, opac,
                                       depths, bg))

    def body(_, inp):
        i, o = inp
        return None, blend_fn(i, o)

    _, (img, dep, alp) = jax.lax.scan(body, None, (idx_all, org_all))
    # (steps, Tc, P, C) -> (num_tiles_padded, P, C) -> (H, W, C)
    def assemble(x):
        ch = x.shape[3:]
        x = x.reshape((steps * tile_chunk, TILE, TILE) + ch)[:num_tiles]
        x = x.reshape((tiles_y, tiles_x, TILE, TILE) + ch)
        x = jnp.swapaxes(x, 1, 2)  # (ty, TILE, tx, TILE, C)
        x = x.reshape((tiles_y * TILE, tiles_x * TILE) + ch)
        return x[:height, :width]

    return assemble(img), assemble(dep), assemble(alp)


def _blend_record_core(slab, origin, count, bg):
    """Forward blend of one tile chunk from packed record slabs; also
    returns the intermediates the analytic backward needs."""
    tc, kk, _ = slab.shape
    k_ids = jax.lax.broadcasted_iota(jnp.int32, (tc, kk), 1)
    live = (k_ids < count[:, None]).astype(jnp.float32)[..., None]  # (Tc,K,1)

    mu = slab[..., 0:2]
    con = slab[..., 2:5]
    rgb = slab[..., 5:8]
    opa = slab[..., 8:9] * live
    dep = slab[..., 9:10]

    ly = jax.lax.broadcasted_iota(jnp.float32, (TILE, TILE), 0).reshape(-1)
    lx = jax.lax.broadcasted_iota(jnp.float32, (TILE, TILE), 1).reshape(-1)
    px = origin[:, None, 0:1] + lx[None, None, :]    # (Tc, 1, P)
    py = origin[:, None, 1:2] + ly[None, None, :]

    dx = mu[..., 0:1] - px                           # (Tc, K, P)
    dy = mu[..., 1:2] - py
    power = -0.5 * (con[..., 0:1] * dx * dx + con[..., 2:3] * dy * dy) \
        - con[..., 1:2] * dx * dy
    expp = jnp.exp(power)
    raw = opa * expp
    clamped = (raw > _ALPHA_MAX) | (power > 0.0) | (raw < _ALPHA_MIN)
    alpha = jnp.where((power > 0.0) | (raw < _ALPHA_MIN), 0.0,
                      jnp.minimum(_ALPHA_MAX, raw))

    om = 1.0 - alpha
    om_shift = jnp.concatenate(
        [jnp.ones_like(om[:, :1]), om[:, :-1]], axis=1)
    t_before = jnp.cumprod(om_shift, axis=1)
    t_incl = t_before * om
    include = (t_incl >= _T_EPS).astype(alpha.dtype)

    w = t_before * alpha * include
    img = jnp.einsum("tkp,tkc->tpc", w, rgb,
                     preferred_element_type=jnp.float32)
    depth_img = jnp.einsum("tkp,tk->tp", w, dep[..., 0],
                           preferred_element_type=jnp.float32)
    t_final = jnp.min(jnp.where(include > 0, t_incl, 1.0), axis=1)
    img = img + t_final[..., None] * bg[None, None, :]
    inter = (alpha, t_before, include, w, expp, clamped, dx, dy, rgb, dep,
             con, t_final)
    return img, depth_img, 1.0 - t_final, inter


@jax.custom_vjp
def _blend_record_chunk(slab, origin, count, bg):
    """Blend one chunk of tiles. Custom VJP: the generic AD of cumprod +
    min-reduction costs several extra (Tc,K,P) passes; the hand-derived
    backward below is the classic suffix-sum form of the 3DGS blend
    gradient (one reverse cumsum + elementwise + two matmuls):
        dL/dα_k = G_w_k·T_k − (S_k + g_tf·t_final·I_k)/(1−α_k),
        S_k = Σ_{m>k} G_w_m·w_m  (reverse exclusive cumsum).
    """
    img, depth_img, alpha_img, _ = _blend_record_core(slab, origin, count, bg)
    return img, depth_img, alpha_img


def _blend_fwd(slab, origin, count, bg):
    img, depth_img, alpha_img, _ = _blend_record_core(slab, origin, count, bg)
    # rematerialize in the backward: residuals are just the inputs
    return (img, depth_img, alpha_img), (slab, origin, count, bg)


def _blend_bwd(res, grads):
    """Analytic backward. The five spatial reductions (∂L/∂conic, ∂L/∂mean)
    are polynomials in the LOCAL pixel coordinates (lx, ly), so they all
    collapse into one MXU contraction of g_power against the shared monomial
    basis {1, lx, ly, lx², lx·ly, ly²}: a (Tc·K, P) @ (P, 6) matmul replaces
    five elementwise-reduce passes over (Tc, K, P)."""
    slab, origin, count, bg = res
    g_img, g_dep, g_alpha_img = grads
    _, _, _, inter = _blend_record_core(slab, origin, count, bg)
    (alpha, t_before, include, w, expp, clamped, dx, dy, rgb, dep, con,
     t_final) = inter

    g_tf = -g_alpha_img + jnp.einsum("tpc,c->tp", g_img, bg)      # (Tc, P)

    G_w = jnp.einsum("tpc,tkc->tkp", g_img, rgb,
                     preferred_element_type=jnp.float32) \
        + g_dep[:, None, :] * dep                                  # (Tc,K,P)

    G_rgb = jnp.einsum("tkp,tpc->tkc", w, g_img,
                       preferred_element_type=jnp.float32)
    G_dep_k = jnp.einsum("tkp,tp->tk", w, g_dep,
                         preferred_element_type=jnp.float32)[..., None]

    # suffix sum S_k = Σ_{m>k} G_w_m w_m  (reverse exclusive cumsum over K)
    gw_w = G_w * w
    suffix = jnp.cumsum(gw_w[:, ::-1], axis=1)[:, ::-1] - gw_w     # (Tc,K,P)

    inv_om = 1.0 / (1.0 - alpha)                                   # α ≤ 0.99
    g_alpha = G_w * t_before * include \
        - (suffix + g_tf[:, None, :] * t_final[:, None, :] * include) * inv_om

    # through the clamp: α = opa·exp(power) where not clamped
    g_raw = jnp.where(clamped, 0.0, g_alpha)
    g_power = g_raw * alpha                                        # (Tc,K,P)

    # monomial moments: M_j[t,k] = Σ_p g_power · {1, lx, ly, lx², lxly, ly²}
    ly = jax.lax.broadcasted_iota(jnp.float32, (TILE, TILE), 0).reshape(-1)
    lx = jax.lax.broadcasted_iota(jnp.float32, (TILE, TILE), 1).reshape(-1)
    mono = jnp.stack([jnp.ones_like(lx), lx, ly, lx * lx, lx * ly, ly * ly],
                     axis=-1)                                      # (P, 6)
    # HIGHEST precision (see pallas_blend._bwd_kernel): the moment
    # differences below cancel for in-tile gaussians and amplify bf16 MXU
    # rounding into divergent mean/conic gradients
    M = jnp.einsum("tkp,pj->tkj", g_power, mono,
                   preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)            # (Tc,K,6)
    M1, Mx, My, Mxx, Mxy, Myy = (M[..., i] for i in range(6))

    # dx = ux - lx, dy = uy - ly with ux = mu_x - origin_x (per record)
    ux = slab[..., 0] - origin[:, None, 0]
    uy = slab[..., 1] - origin[:, None, 1]
    ca, cb, cc = slab[..., 2], slab[..., 3], slab[..., 4]

    # Σ g_power·dx = ux·M1 - Mx, etc.
    Sdx = ux * M1 - Mx
    Sdy = uy * M1 - My
    Sdxx = ux * ux * M1 - 2 * ux * Mx + Mxx
    Sdyy = uy * uy * M1 - 2 * uy * My + Myy
    Sdxy = ux * uy * M1 - ux * My - uy * Mx + Mxy

    g_a = -0.5 * Sdxx
    g_b = -Sdxy
    g_c = -0.5 * Sdyy
    g_mux = -(ca * Sdx + cb * Sdy)
    g_muy = -(cc * Sdy + cb * Sdx)

    # g_opa = Σ_p g_raw·expp = (Σ_p g_power)/opa where opa > 0
    opa = slab[..., 8:9]
    g_opa = jnp.where(jnp.abs(opa) > 1e-12, M1[..., None] / opa, 0.0)

    tc, kk, _ = slab.shape
    k_ids = jax.lax.broadcasted_iota(jnp.int32, (tc, kk), 1)
    live = (k_ids < count[:, None]).astype(jnp.float32)[..., None]
    g_slab = jnp.concatenate([
        g_mux[..., None], g_muy[..., None],
        g_a[..., None], g_b[..., None], g_c[..., None],
        G_rgb,
        g_opa * live,           # opa entered as slab[...,8] * live
        G_dep_k,
        jnp.zeros(slab.shape[:2] + (slab.shape[2] - 10,), slab.dtype),
    ], axis=-1)
    g_bg = jnp.einsum("tp,tpc->c", t_final, g_img,
                      preferred_element_type=jnp.float32)
    return g_slab, None, None, g_bg


_blend_record_chunk.defvjp(_blend_fwd, _blend_bwd)


@functools.partial(
    jax.jit, static_argnames=("tiles_x", "tiles_y", "width", "height",
                              "tile_capacity", "tile_chunk"))
def blend_records(
    records: jax.Array,          # (N, 16) packed, ORIGINAL gaussian order
    bins: RecordBins,
    bg: jax.Array,
    *,
    tiles_x: int,
    tiles_y: int,
    width: int,
    height: int,
    tile_capacity: int = 1024,
    tile_chunk: int = 40,
    tile_y0: jax.Array | int = 0,
):
    """Packed-record blend: per tile chunk, gather (Tc, K) depth-ranks from
    the sorted duplicate list (contiguous segments), then ONE row-gather of
    (Tc·K, 16) records. Two index streams per tile slot total, vs five in
    the legacy tile-list path."""
    n = records.shape[0]
    num_tiles = tiles_x * tiles_y
    kcap = tile_capacity
    m_cap = bins.rank_sorted.shape[0]

    rec_by_depth = records[bins.order]               # (N, 16), N-index gather
    rec_by_depth = jnp.concatenate(
        [rec_by_depth, jnp.zeros((1, records.shape[1]), records.dtype)],
        axis=0)

    tile_ox = (jnp.arange(num_tiles, dtype=jnp.int32) % tiles_x) * TILE
    tile_oy = (jnp.arange(num_tiles, dtype=jnp.int32) // tiles_x
               + tile_y0) * TILE
    origins = jnp.stack([tile_ox, tile_oy], axis=-1).astype(jnp.float32)

    counts = jnp.minimum(bins.counts, kcap)
    starts = bins.starts[:-1]

    tpad = (-num_tiles) % tile_chunk
    if tpad:
        starts = jnp.pad(starts, (0, tpad))
        counts = jnp.pad(counts, (0, tpad))
        origins = jnp.pad(origins, ((0, tpad), (0, 0)))
    steps = (num_tiles + tpad) // tile_chunk
    starts = starts.reshape(steps, tile_chunk)
    counts = counts.reshape(steps, tile_chunk)
    origins = origins.reshape(steps, tile_chunk, 2)

    k_arange = jnp.arange(kcap, dtype=jnp.int32)

    def chunk_fn(st, ct, org):
        pos = jnp.clip(st[:, None] + k_arange[None, :], 0, m_cap - 1)
        rank = bins.rank_sorted[pos]                     # (Tc, K) int gather
        row = jnp.where(k_arange[None, :] < ct[:, None], rank, n)
        slab = rec_by_depth[row]                         # (Tc, K, 16) rows
        # no jax.checkpoint here: _blend_record_chunk's custom VJP saves the
        # slab (cheap) and rematerializes the (Tc,K,P) intermediates itself,
        # so the gathers run once
        return _blend_record_chunk(slab, org, ct, bg)

    def body(_, inp):
        st, ct, org = inp
        return None, chunk_fn(st, ct, org)

    _, (img, dep, alp) = jax.lax.scan(body, None, (starts, counts, origins))

    def assemble(x):
        ch = x.shape[3:]
        x = x.reshape((steps * tile_chunk, TILE, TILE) + ch)[:num_tiles]
        x = x.reshape((tiles_y, tiles_x, TILE, TILE) + ch)
        x = jnp.swapaxes(x, 1, 2)
        x = x.reshape((tiles_y * TILE, tiles_x * TILE) + ch)
        return x[:height, :width]

    return assemble(img), assemble(dep), assemble(alp)


def rasterize(
    means3d: jax.Array,
    cov3d: jax.Array,
    colors: jax.Array,
    opacities: jax.Array,
    *,
    viewmatrix: jax.Array,
    projmatrix: jax.Array,
    tanfovx,
    tanfovy,
    width: int,
    height: int,
    bg: jax.Array,
    capacity: int = 1024,
    tile_chunk: int = 40,
    bin_chunk: int = 2048,
    antialias: bool = False,
    alive: jax.Array | None = None,
    binning: str = "packed",
    dup_capacity: int = 0,
) -> RenderOutput:
    """Full pipeline: project → bin → blend. Differentiable w.r.t. all float
    inputs (binning indices are integer and act as a fixed gather pattern,
    exactly like the CUDA sort)."""
    tiles_x = (width + TILE - 1) // TILE
    tiles_y = (height + TILE - 1) // TILE
    splats = project_gaussians(
        means3d, cov3d, opacities, colors, viewmatrix, projmatrix,
        tanfovx, tanfovy, width, height, antialias=antialias, alive=alive)
    if binning == "packed":
        rbins = bin_splats_records(
            jax.lax.stop_gradient(splats),
            tiles_x=tiles_x, tiles_y=tiles_y, dup_capacity=dup_capacity)
        records = pack_records(splats)
        image, depth, alpha = blend_records(
            records, rbins, bg, tiles_x=tiles_x, tiles_y=tiles_y,
            width=width, height=height, tile_capacity=capacity,
            tile_chunk=tile_chunk)
        return RenderOutput(image=image, depth=depth, alpha=alpha,
                            radii=splats.radii, counts=rbins.counts)
    if binning == "sort":
        bins = bin_splats_sorted(
            jax.lax.stop_gradient(splats),
            tiles_x=tiles_x, tiles_y=tiles_y, capacity=capacity,
            dup_capacity=dup_capacity)
    else:
        bins = bin_splats(
            jax.lax.stop_gradient(splats),
            tiles_x=tiles_x, tiles_y=tiles_y, capacity=capacity,
            chunk=bin_chunk)
    image, depth, alpha = blend(
        splats, bins, bg,
        tiles_x=tiles_x, tiles_y=tiles_y, width=width, height=height,
        tile_chunk=tile_chunk)
    return RenderOutput(image=image, depth=depth, alpha=alpha,
                        radii=splats.radii, counts=bins.counts)
