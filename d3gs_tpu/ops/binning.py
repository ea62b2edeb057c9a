"""Depth-ordered tile binning with static shapes.

TPU-native replacement for the CUDA rasterizer's (tile, depth)-key global
radix sort + per-tile range identification (SURVEY.md §2.3). A global radix
sort over duplicated keys is a poor fit for XLA; instead we exploit that the
per-tile lists we ultimately need are just *depth-ordered prefixes*:

  1. one global depth argsort over Gaussians (XLA sort, O(N log N));
  2. a scan over fixed-size chunks of the sorted order; each chunk computes
     its (chunk, tiles) intersection mask from the precomputed tile bboxes,
     ranks hits per tile with an exclusive cumsum (+ carried per-tile counts),
     and scatters Gaussian indices into a flat (tiles*capacity,) list with
     `mode="drop"` handling both capacity overflow and non-hits.

Because chunks are consumed in depth order and ranks accumulate, every tile's
list comes out front-to-back sorted with no per-tile sort. Capacity overflow
drops the *deepest* (most occluded) splats — the benign failure mode.

All shapes are static: (N, T, K) fixed ⇒ zero recompilation as Gaussian
counts change under densification (padding handled by `visible`).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .projection import TILE, ProjectedSplats


class TileBins(NamedTuple):
    # (T, K) int32 indices into the ORIGINAL Gaussian arrays, front-to-back
    # per tile; slots beyond the tile's count hold N (sentinel).
    tile_lists: jax.Array
    counts: jax.Array        # (T,) int32 true intersection counts (pre-cap)
    order: jax.Array         # (N,) the global depth order (diagnostics)


def bin_splats_sorted(
    splats: ProjectedSplats,
    *,
    tiles_x: int,
    tiles_y: int,
    capacity: int,
    dup_capacity: int = 0,
    tile_y0: jax.Array | int = 0,
) -> TileBins:
    """Sort-based binning — the fast path (vs. the scan/scatter fallback
    below, which it matches exactly up to duplicate-budget overflow).

    The CUDA rasterizer expands each Gaussian into one (tile, depth) key per
    covered tile and radix-sorts the expanded list (SURVEY.md §2.3). XLA:TPU
    has a fast sort but no fast data-dependent expansion, so the ragged
    expand is done with static shapes:

      1. global depth argsort (rank r = depth position);
      2. exclusive cumsum of per-Gaussian covered-tile counts in depth
         order → `offsets`; duplicate slot m belongs to the Gaussian with
         offsets[i] <= m < offsets[i+1], recovered by a vectorized
         searchsorted — a ragged expand with a static budget `dup_capacity`
         (deepest Gaussians drop first on overflow, the benign direction);
      3. ONE int32 key sort, key = local_tile_id·(N+1) + depth_rank — after
         sorting, entries are grouped by tile and front-to-back inside;
      4. per-tile segment starts by searchsorted; within-tile position =
         index − start; ONE unique-index scatter into the (T, K) lists.

    Cost: O(M log M) sort + O(M log N) searchsorted + O(M) scatter with
    unique targets, M = dup_capacity — no (chunk × tiles) intersection
    matrix and no serialized scatter, ~20× faster than the scan fallback at
    43k Gaussians / 625 tiles.
    """
    n = splats.depths.shape[0]
    num_tiles = tiles_x * tiles_y
    if dup_capacity <= 0:
        dup_capacity = 16 * n
    m_cap = dup_capacity

    # TPU has no hardware integer divide — all / and % below are either by
    # powers of two (bit shifts) or via exact float32 division + correction.
    shift = max(int(n).bit_length(), 1)      # 2^shift > n  => rank fits
    assert (num_tiles + 1) << shift < 2 ** 31, \
        "tile/rank key exceeds int32; reduce tiles or gaussian capacity"

    # clip bboxes to this shard's tile-row range [tile_y0, tile_y0+tiles_y)
    # BEFORE sorting, so zero-coverage Gaussians can be pushed to the end of
    # the depth order and the alive ones tile [0, total) contiguously.
    y0 = jnp.asarray(tile_y0, jnp.int32)
    ty_lo_u = jnp.maximum(splats.tile_min[:, 1], y0)
    ty_hi_u = jnp.minimum(splats.tile_max[:, 1], y0 + tiles_y)
    bw_u = (splats.tile_max[:, 0] - splats.tile_min[:, 0]).astype(jnp.int32)
    bh_u = jnp.maximum(ty_hi_u - ty_lo_u, 0).astype(jnp.int32)
    cnt_u = jnp.where(splats.visible, bw_u * bh_u, 0)

    depth_key = jnp.where(cnt_u > 0, splats.depths, jnp.inf)
    order = jnp.argsort(depth_key)            # rank -> gaussian id

    tmin = splats.tile_min[order]
    ty_lo = ty_lo_u[order]
    bw = bw_u[order]
    cnt = cnt_u[order]
    offsets = jnp.cumsum(cnt) - cnt           # exclusive, (N,)
    total = offsets[-1] + cnt[-1]

    # ragged expand WITHOUT searchsorted (whose per-query binary search is
    # ~20 gather passes over M — measured 84 ms at M=704k): scatter one mark
    # at each alive segment start, then src = cumsum(marks) - 1. Alive
    # segments are contiguous from 0, so marks are unique positions.
    m = jnp.arange(m_cap, dtype=jnp.int32)
    mark_tgt = jnp.where(cnt > 0, offsets, m_cap)
    marks = jnp.zeros(m_cap, jnp.int32).at[mark_tgt].add(1, mode="drop")
    src = jnp.cumsum(marks) - 1
    valid = (m < total) & (src >= 0)
    src = jnp.clip(src, 0, n - 1)
    # gathers cost per index on TPU: fetch (offset, tmin_x, ty_lo, bw)
    # as ONE 4-int row instead of four scalar gathers
    expand_tab = jnp.stack(
        [offsets, tmin[:, 0], ty_lo, jnp.maximum(bw, 1)], axis=-1)
    row4 = expand_tab[src]                                 # (M, 4)
    j = m - row4[:, 0]
    w_src = row4[:, 3]
    # j // w and j % w with a per-entry divisor, via exact f32 division
    # (j < 2^24 so the float path is exact up to one ulp, corrected below)
    q = jnp.floor(j.astype(jnp.float32) / w_src.astype(jnp.float32)) \
        .astype(jnp.int32)
    r = j - q * w_src
    q = jnp.where(r < 0, q - 1, jnp.where(r >= w_src, q + 1, q))
    r = jnp.where(r < 0, r + w_src, jnp.where(r >= w_src, r - w_src, r))
    tx = row4[:, 1] + r
    ty = row4[:, 2] + q
    local_tile = (ty - tile_y0) * tiles_x + tx          # (M,)

    big = (num_tiles << shift)
    key = jnp.where(valid, (local_tile << shift) | src, big)
    key_sorted = jnp.sort(key)

    tile_of = key_sorted >> shift
    rank_of = key_sorted & ((1 << shift) - 1)           # depth rank
    starts = jnp.searchsorted(
        key_sorted, jnp.arange(num_tiles + 1) << shift,
        side="left").astype(jnp.int32)
    counts = jnp.diff(starts)
    # list construction is a pure gather: tile t's k-th entry sits at
    # sorted position starts[t] + k
    gauss_sorted = order[jnp.minimum(rank_of, n - 1)].astype(jnp.int32)
    k = jnp.arange(capacity, dtype=jnp.int32)
    idx = jnp.clip(starts[:-1, None] + k[None, :], 0, m_cap - 1)
    lists = jnp.where(k[None, :] < jnp.minimum(counts, capacity)[:, None],
                      gauss_sorted[idx], n)
    return TileBins(tile_lists=lists, counts=counts, order=order)


class RecordBins(NamedTuple):
    """Binning output for the packed-record blend path."""
    rank_sorted: jax.Array   # (M,) depth rank of each sorted duplicate
    starts: jax.Array        # (T+1,) segment start of each tile
    counts: jax.Array        # (T,)
    order: jax.Array         # (N,) depth order (rank -> gaussian id)
    rank_bounds: jax.Array   # (N+1,) exclusive cumsum of SURVIVING dup
    #                          counts per rank (last entry = total): the
    #                          blend backward's per-rank segment boundaries
    #                          after its stable re-group-by-rank sort


def _tile_max_power(mux, muy, ca, cb, cc, tx, ty):
    """Max of the Gaussian exponent over tile (tx, ty)'s pixel rect.

    Closed form: 0 if the mean is inside the rect, else the max over the
    four edges (per-edge 1D quadratic, optimum clamped to the segment).
    Matches the 'tight culling' trick in modern 3DGS rasterizers: a
    duplicate whose max alpha over its tile is < 1/255 is skipped by every
    pixel's alpha-min test AND consumes no transmittance, so dropping it is
    output-exact."""
    x0 = (tx * TILE).astype(jnp.float32)
    x1 = x0 + (TILE - 1)
    y0 = (ty * TILE).astype(jnp.float32)
    y1 = y0 + (TILE - 1)

    def power(dx, dy):
        return -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy

    def vedge(xe):
        dx = xe - mux
        dy = jnp.clip(-cb * dx / jnp.maximum(cc, 1e-12),
                      y0 - muy, y1 - muy)
        return power(dx, dy)

    def hedge(ye):
        dy = ye - muy
        dx = jnp.clip(-cb * dy / jnp.maximum(ca, 1e-12),
                      x0 - mux, x1 - mux)
        return power(dx, dy)

    pmax = jnp.maximum(jnp.maximum(vedge(x0), vedge(x1)),
                       jnp.maximum(hedge(y0), hedge(y1)))
    inside = (mux >= x0) & (mux <= x1) & (muy >= y0) & (muy <= y1)
    return jnp.where(inside, 0.0, pmax)


def _scan_rows(x2: jax.Array, op) -> jax.Array:
    """Inclusive log-depth prefix (Hillis–Steele) along axis 1.

    `jnp.cumsum`/`lax.cummax` along a 512-wide axis lower to an O(width)
    reduce-window sweep on TPU (~0.3 ms each at M=393k — the dominant cost
    of the whole expand); log2(width) shifted-combine passes are exact for
    ints and ~10x cheaper."""
    rows, row = x2.shape
    d = 1
    while d < row:
        shifted = jnp.pad(x2, ((0, 0), (d, 0)))[:, :row]
        x2 = op(x2, shifted)
        d *= 2
    return x2


def _cumsum_2d(x: jax.Array, row: int = 512) -> jax.Array:
    """Inclusive cumsum over a 1-D int/f32 array via a (rows, row) reshape:
    log-depth within rows + a short cross-row carry. Exact for ints (s32
    adds). Caller guarantees len(x) % row == 0."""
    x2 = _scan_rows(x.reshape(-1, row), jnp.add)
    rowsum = x2[:, -1]
    carry = jnp.cumsum(rowsum) - rowsum          # (rows,) — tiny
    return (x2 + carry[:, None]).reshape(-1)


def _cummax_2d(x: jax.Array, row: int = 512) -> jax.Array:
    """Inclusive cumulative max of a 1-D int array, same two-level scheme.
    The pad's zero fill is safe: inputs here are >= -1 positions where the
    only negative value (-1) also lower-bounds the pad lanes' influence —
    but to stay generic the shifted pad lanes are masked to the dtype min."""
    mn = jnp.iinfo(x.dtype).min
    x2 = x.reshape(-1, row)
    rows, row_ = x2.shape
    d = 1
    while d < row_:
        shifted = jnp.pad(x2, ((0, 0), (d, 0)), constant_values=mn)[:, :row_]
        x2 = jnp.maximum(x2, shifted)
        d *= 2
    rowmax = x2[:, -1]
    carry = jax.lax.cummax(rowmax, axis=0)
    carry = jnp.concatenate([jnp.full((1,), mn, x.dtype), carry[:-1]])
    return jnp.maximum(x2, carry[:, None]).reshape(-1)


def bin_splats_records(
    splats: ProjectedSplats,
    *,
    tiles_x: int,
    tiles_y: int,
    dup_capacity: int = 0,
    tile_y0: jax.Array | int = 0,
    tight_cull: bool = False,
) -> RecordBins:
    """Sort-based binning for the packed-record blend (rasterize.py
    blend_records): ragged expansion + one (tile, rank) key sort; the output
    is the sorted duplicate list itself (depth ranks + per-tile segment
    starts) — no (T, K) index lists, no capacity cap.

    (A quantized bbox-corner cull — dropping duplicates whose tile rect
    lies beyond the splat's exact alpha radius, output-exact — was built
    and A/B'd in rounds 3-5: it removes only ~7% of duplicates at the
    bench scene while its extra delta channel + M-scale validity cumsum
    cost ~0.3 ms; net slower in every measured configuration, removed.)

    TPU re-design notes (vs the CUDA (tile,depth) radix sort, SURVEY §2.3):
    the ragged expand materializes NO per-duplicate gather and NO wide
    scatter (XLA:TPU scatter cost is per scattered ELEMENT — a 5-channel
    f32 row scatter measured 1.8 ms at N=44k, a 1-channel s32 one 0.3 ms).
    Two 1-channel s32 scatters at the segment-start positions carry
    everything:
      * a mark (1): its two-level cumsum is src+1, and the cumulative MAX
        of (mark ? position : -1) recovers the segment start itself, so
        j = m - last_mark_pos needs no per-duplicate `offsets` fill;
      * the delta of packed (tile_min_x | ty_lo<<7 | bw<<14): in depth
        order the alive Gaussians form a contiguous prefix, so the running
        sum reproduces packed[src[m]] exactly (s32, exact) and three bit
        ops unpack it.
    All O(M) elementwise work then runs on contiguous 1-D arrays."""
    n = splats.depths.shape[0]
    num_tiles = tiles_x * tiles_y
    if dup_capacity <= 0:
        dup_capacity = 16 * n
    m_cap = ((dup_capacity + 511) // 512) * 512
    shift = max(int(n).bit_length(), 1)
    assert (num_tiles + 1) << shift < 2 ** 31
    assert m_cap < 2 ** 24, "dup_capacity >= 2^24 breaks the f32 j//bw path"
    assert tiles_x < 128 and tiles_y < 128, \
        "packed-geometry binning supports < 128 tiles per axis (2032 px); " \
        "use the scan path (bin_splats) beyond that"

    y0 = jnp.asarray(tile_y0, jnp.int32)
    ty_lo_u = jnp.maximum(splats.tile_min[:, 1], y0)
    ty_hi_u = jnp.minimum(splats.tile_max[:, 1], y0 + tiles_y)
    bw_u = (splats.tile_max[:, 0] - splats.tile_min[:, 0]).astype(jnp.int32)
    bh_u = jnp.maximum(ty_hi_u - ty_lo_u, 0).astype(jnp.int32)
    cnt_u = jnp.where(splats.visible, bw_u * bh_u, 0)

    depth_key = jnp.where(cnt_u > 0, splats.depths, jnp.inf)

    bw1 = jnp.maximum(bw_u, 1)
    packed_u = (splats.tile_min[:, 0] | (ty_lo_u << 7) | (bw1 << 14)) \
        .astype(jnp.int32)
    # cnt/packed ride the depth argsort as sort PAYLOADS: a separate
    # `cnt_u[order]` gather costs ~7 ns/element on TPU (0.3 ms each at
    # N=44k) while an extra sort operand at N-scale is ~free
    out = jax.lax.sort(
        (depth_key, jnp.arange(n, dtype=jnp.int32), cnt_u, packed_u),
        num_keys=1)
    order, cnt, packed = out[1], out[2], out[3]
    offsets = jnp.cumsum(cnt) - cnt
    total = offsets[-1] + cnt[-1]

    packed_prev = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), packed[:-1]])
    d_packed = packed - packed_prev
    mark_tgt = jnp.where(cnt > 0, offsets, m_cap)
    marks = jnp.zeros((m_cap,), jnp.int32) \
        .at[mark_tgt].add(1, mode="drop")
    geo = jnp.zeros((m_cap,), jnp.int32) \
        .at[mark_tgt].add(d_packed, mode="drop")

    m = jnp.arange(m_cap, dtype=jnp.int32)
    src_p1 = _cumsum_2d(marks)                             # src + 1
    last_pos = _cummax_2d(jnp.where(marks > 0, m, -1))     # offsets[src]
    packed_m = _cumsum_2d(geo)                             # packed[src]
    tminx_m = packed_m & 127
    tylo_m = (packed_m >> 7) & 127
    bw_m = packed_m >> 14

    j = (m - last_pos).astype(jnp.float32)
    # j // bw and j % bw with a per-entry divisor via f32 division (exact
    # inputs < 2^24; the +/-1 correction absorbs the one-ulp rounding)
    bw_f = jnp.maximum(bw_m, 1).astype(jnp.float32)
    q = jnp.floor(j / bw_f).astype(jnp.int32)
    bw_i = jnp.maximum(bw_m, 1)
    ji = m - last_pos
    r = ji - q * bw_i
    q = jnp.where(r < 0, q - 1, jnp.where(r >= bw_i, q + 1, q))
    r = jnp.where(r < 0, r + bw_i, jnp.where(r >= bw_i, r - bw_i, r))
    tx = tminx_m + r
    ty = tylo_m + q
    src = jnp.clip(src_p1 - 1, 0, n - 1)
    local_tile = (ty - y0) * tiles_x + tx
    valid = (m < total) & (src_p1 > 0)


    if tight_cull:
        # real f32 fields can't be delta-encoded exactly; tight_cull stays
        # opt-in and pays an (M, 6) row gather from an N-scale table
        ctab = jnp.stack(
            [splats.means2d[:, 0], splats.means2d[:, 1],
             splats.conics[:, 0], splats.conics[:, 1], splats.conics[:, 2],
             jnp.log(jnp.maximum(splats.opacities, 1e-30))],
            axis=-1)[order]
        row = ctab[src]
        pmax = _tile_max_power(row[:, 0], row[:, 1], row[:, 2], row[:, 3],
                               row[:, 4], tx.astype(jnp.float32),
                               ty.astype(jnp.float32))
        valid = valid & (pmax + row[:, 5] >= jnp.log(1.0 / 255.0))

    big = num_tiles << shift
    key = jnp.where(valid, (local_tile << shift) | src, big)
    # KEYS-ONLY sort: the blend backward re-groups gradient rows by depth
    # rank with its own stable keys+iota sort of rank_sorted
    # (pallas_blend.py) — the depth-dup permutation is never materialized.
    key_sorted = jnp.sort(key)
    rank_sorted = key_sorted & ((1 << shift) - 1)
    starts = jnp.searchsorted(
        key_sorted, jnp.arange(num_tiles + 1) << shift,
        side="left").astype(jnp.int32)
    counts = jnp.diff(starts)
    # per-rank SURVIVING duplicate counts: without culling, validity is
    # just position < min(total, m_cap), so each rank survives
    # clip(off+cnt) - clip(off) — O(N), no M-scale pass at all. The culls
    # drop data-dependently and need the M-scale valid cumsum.
    if tight_cull:
        vcs = _cumsum_2d(valid.astype(jnp.int32))
        vcsz = jnp.concatenate([jnp.zeros((1,), jnp.int32), vcs])
        lo = jnp.clip(offsets, 0, m_cap)
        hi = jnp.clip(offsets + cnt, 0, m_cap)
        cnt_surv = vcsz[hi] - vcsz[lo]                     # (N,)
    else:
        lim = jnp.minimum(total, m_cap)
        cnt_surv = jnp.clip(offsets + cnt, 0, lim) - jnp.clip(offsets, 0, lim)
    cs_surv = jnp.cumsum(cnt_surv)
    rank_bounds = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), cs_surv]).astype(jnp.int32)  # (N+1,)
    return RecordBins(rank_sorted=rank_sorted, starts=starts, counts=counts,
                      order=order, rank_bounds=rank_bounds)


@functools.partial(jax.jit, static_argnames=("tiles_x", "tiles_y", "capacity",
                                              "chunk"))
def bin_splats(
    splats: ProjectedSplats,
    *,
    tiles_x: int,
    tiles_y: int,
    capacity: int,
    chunk: int = 2048,
    tile_y0: jax.Array | int = 0,
) -> TileBins:
    """`tile_y0` (may be traced, e.g. an axis_index) restricts binning to
    tile rows [tile_y0, tile_y0+tiles_y): used by tile-sharded multi-device
    blending (parallel/)."""
    n = splats.depths.shape[0]
    num_tiles = tiles_x * tiles_y

    depth_key = jnp.where(splats.visible, splats.depths, jnp.inf)
    order = jnp.argsort(depth_key)  # ascending depth, invisible last

    tmin = splats.tile_min[order]          # (N, 2)
    tmax = splats.tile_max[order]
    vis = splats.visible[order]

    tile_x = jnp.arange(num_tiles, dtype=jnp.int32) % tiles_x  # (T,)
    tile_y = jnp.arange(num_tiles, dtype=jnp.int32) // tiles_x + tile_y0

    pad = (-n) % chunk
    if pad:
        tmin = jnp.pad(tmin, ((0, pad), (0, 0)))
        tmax = jnp.pad(tmax, ((0, pad), (0, 0)))
        vis = jnp.pad(vis, (0, pad))
        order_p = jnp.pad(order, (0, pad), constant_values=n)
    else:
        order_p = order
    steps = (n + pad) // chunk

    tmin = tmin.reshape(steps, chunk, 2)
    tmax = tmax.reshape(steps, chunk, 2)
    vis = vis.reshape(steps, chunk)
    order_p = order_p.reshape(steps, chunk)

    def body(carry, inp):
        counts, flat = carry                     # (T,), (T*K,)
        cmin, cmax, cvis, cidx = inp
        hit = (
            cvis[:, None]
            & (tile_x[None, :] >= cmin[:, 0:1])
            & (tile_x[None, :] < cmax[:, 0:1])
            & (tile_y[None, :] >= cmin[:, 1:2])
            & (tile_y[None, :] < cmax[:, 1:2])
        )  # (chunk, T)
        hit_i = hit.astype(jnp.int32)
        rank = counts[None, :] + jnp.cumsum(hit_i, axis=0) - hit_i  # exclusive
        # flat position; misses/overflow pushed out-of-bounds => dropped
        tgt = jnp.where(
            hit & (rank < capacity),
            jnp.arange(num_tiles, dtype=jnp.int32)[None, :] * capacity + rank,
            num_tiles * capacity,
        )
        src = jnp.broadcast_to(cidx[:, None], tgt.shape)
        flat = flat.at[tgt.reshape(-1)].set(src.reshape(-1).astype(jnp.int32),
                                            mode="drop")
        counts = counts + jnp.sum(hit_i, axis=0)
        return (counts, flat), None

    init = (
        jnp.zeros((num_tiles,), jnp.int32),
        jnp.full((num_tiles * capacity,), n, jnp.int32),
    )
    (counts, flat), _ = jax.lax.scan(body, init, (tmin, tmax, vis, order_p))
    return TileBins(tile_lists=flat.reshape(num_tiles, capacity),
                    counts=counts, order=order)
