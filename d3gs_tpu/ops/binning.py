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
