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

    depth_key = jnp.where(splats.visible, splats.depths, jnp.inf)
    order = jnp.argsort(depth_key)            # rank -> gaussian id

    tmin = splats.tile_min[order]
    tmax = splats.tile_max[order]
    vis = splats.visible[order]

    # clip each bbox to this shard's tile-row range [tile_y0, tile_y0+tiles_y)
    ty_lo = jnp.maximum(tmin[:, 1], jnp.asarray(tile_y0, jnp.int32))
    ty_hi = jnp.minimum(tmax[:, 1], jnp.asarray(tile_y0, jnp.int32) + tiles_y)
    bw = (tmax[:, 0] - tmin[:, 0]).astype(jnp.int32)
    bh = jnp.maximum(ty_hi - ty_lo, 0).astype(jnp.int32)
    cnt = jnp.where(vis, bw * bh, 0)
    offsets = jnp.cumsum(cnt) - cnt           # exclusive, (N,)
    total = offsets[-1] + cnt[-1]

    m = jnp.arange(m_cap, dtype=jnp.int32)
    src = jnp.searchsorted(offsets, m, side="right").astype(jnp.int32) - 1
    src = jnp.clip(src, 0, n - 1)
    valid = (m < total) & (cnt[src] > 0)
    j = m - offsets[src]
    w_src = jnp.maximum(bw[src], 1)
    tx = tmin[src, 0] + j % w_src
    ty = ty_lo[src] + j // w_src
    local_tile = (ty - tile_y0) * tiles_x + tx          # (M,)

    stride = n + 1
    big = num_tiles * stride
    key = jnp.where(valid, local_tile * stride + src, big)
    if (num_tiles + 1) * stride >= 2 ** 31:
        key = key.astype(jnp.int64)
        stride = jnp.int64(stride)
    key_sorted = jnp.sort(key)

    tile_of = (key_sorted // stride).astype(jnp.int32)
    rank_of = (key_sorted % stride).astype(jnp.int32)   # depth rank
    starts = jnp.searchsorted(
        key_sorted, (jnp.arange(num_tiles + 1) * stride).astype(key_sorted.dtype),
        side="left").astype(jnp.int32)
    counts = jnp.diff(starts)
    pos = m - starts[jnp.minimum(tile_of, num_tiles - 1)]
    ok = (key_sorted < big) & (pos < capacity)
    tgt = jnp.where(ok, tile_of * capacity + pos, num_tiles * capacity)
    gauss = order[jnp.minimum(rank_of, n - 1)].astype(jnp.int32)

    flat = jnp.full((num_tiles * capacity,), n, jnp.int32)
    flat = flat.at[tgt].set(gauss, mode="drop", unique_indices=True)
    return TileBins(tile_lists=flat.reshape(num_tiles, capacity),
                    counts=counts, order=order)


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
