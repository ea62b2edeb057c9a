"""k-nearest-neighbor mean squared distance for Gaussian scale init.

TPU-native replacement for the reference's simple-knn CUDA extension
(`distCUDA2`, scene/gaussian_model.py:20,105-106): the mean squared distance
from each point to its 3 nearest neighbors, used once at model init to size
the initial Gaussians.

Strategy: chunked brute force. Init-time only (N ≲ 200k), so an O(N²) pass in
C-chunks of the distance matrix is fast on the MXU: ‖a-b‖² = ‖a‖² + ‖b‖² -
2a·b turns the dominant cost into an (C, 3)x(3, N) matmul per chunk. A C++
host fallback lives in d3gs_tpu/native for very large N.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _auto_chunk(n: int) -> int:
    """Bound the (chunk, N) distance-matrix tile to ~256 MB."""
    return max(256, min(4096, (64 * 1024 * 1024) // max(n, 1)))


@functools.partial(jax.jit, static_argnames=("k", "chunk"))
def knn_mean_sq_dist(points: jax.Array, k: int = 3, chunk: int = 0) -> jax.Array:
    """(N, 3) points -> (N,) mean squared distance to the k nearest neighbors.

    Self-distances are excluded. Matches simple-knn's distCUDA2 semantics for
    k=3.
    """
    n = points.shape[0]
    if chunk == 0:
        chunk = _auto_chunk(n)
    pad = (-n) % chunk
    pts = jnp.pad(points, ((0, pad), (0, 0)))
    sq_norms = jnp.sum(pts * pts, axis=-1)  # (Np,)
    valid = jnp.arange(n + pad) < n

    def body(carry, chunk_start):
        del carry
        rows = jax.lax.dynamic_slice(pts, (chunk_start, 0), (chunk, 3))
        row_sq = jax.lax.dynamic_slice(sq_norms, (chunk_start,), (chunk,))
        row_idx = chunk_start + jnp.arange(chunk)
        # (chunk, Np) squared distances via matmul
        d2 = row_sq[:, None] + sq_norms[None, :] - 2.0 * rows @ pts.T
        d2 = jnp.maximum(d2, 0.0)
        # mask self and padding
        col_idx = jnp.arange(n + pad)
        mask = (col_idx[None, :] == row_idx[:, None]) | ~valid[None, :]
        d2 = jnp.where(mask, jnp.inf, d2)
        # k smallest via top_k on negated distances
        neg_topk, _ = jax.lax.top_k(-d2, k)
        return None, jnp.mean(-neg_topk, axis=-1)

    starts = jnp.arange(0, n + pad, chunk)
    _, out = jax.lax.scan(body, None, starts)
    return out.reshape(-1)[:n]


def knn_mean_sq_dist_np(points: np.ndarray, k: int = 3) -> np.ndarray:
    """Host-side reference implementation (numpy, O(N²) chunked)."""
    n = points.shape[0]
    out = np.empty(n, dtype=np.float32)
    sq = np.sum(points ** 2, axis=-1)
    for s in range(0, n, 2048):
        e = min(s + 2048, n)
        d2 = sq[s:e, None] + sq[None, :] - 2.0 * points[s:e] @ points.T
        np.maximum(d2, 0.0, out=d2)
        d2[np.arange(s, e) - s, np.arange(s, e)] = np.inf
        part = np.partition(d2, k, axis=-1)[:, :k]
        out[s:e] = part.mean(axis=-1)
    return out
