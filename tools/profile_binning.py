"""Stage-truncated profile of bin_splats_records at the bench config.

Re-implements the binning pipeline with an early-exit `stage` knob so each
incremental cost is visible (device-true fori_loop timing, best-of-2,
two lengths differenced). Stages:
  1 argsort(depth)
  2 + N-scale take/cumsum (cnt, packed, offsets)
  3 + expand scatters + M-scale cumsum/cummax + tile arithmetic (key built)
  4 + M-scale key sort
  5 + searchsorted starts/counts + rank extraction
  6 + rank_bounds (full pipeline)
"""
import math
import time

import jax
import jax.numpy as jnp
import numpy as np

from d3gs_tpu.models import gaussians as G
from d3gs_tpu.ops.camera_math import perspective_projection, world_to_view
from d3gs_tpu.ops.projection import project_gaussians
from d3gs_tpu.ops.binning import _cumsum_2d, _cummax_2d

W = H = 400
N = 43_132
CAP = 44_032
TX, TY = (W + 15) // 16, (H + 15) // 16
T = TX * TY
DUP = 393_216

rng = np.random.default_rng(0)
pts = (rng.random((N, 3)) * 2.6 - 1.3).astype(np.float32)
cols = rng.uniform(0, 1, (N, 3)).astype(np.float32)
state = G.create_from_pcd(pts, cols, sh_degree=3, capacity=CAP)
state = state.replace(params=state.params._replace(
    opacity=jnp.full((CAP, 1), 0.5)))

V = world_to_view(np.eye(3), np.array([0, 0, 4.0])).T
fov = math.radians(60)
P4 = perspective_projection(0.01, 100.0, fov, fov).T
tan = math.tan(fov / 2)

from d3gs_tpu.ops.transforms import cov3d_packed
cov = cov3d_packed(state.get_scaling, state.params.rotation)
splats = jax.jit(lambda: project_gaussians(
    state.params.xyz, cov, state.get_opacity[:, 0],
    jnp.broadcast_to(jnp.array([0.5, 0.5, 0.5]), (CAP, 3)),
    jnp.asarray(V, jnp.float32), jnp.asarray(V @ P4, jnp.float32),
    tan, tan, W, H, alive=state.alive))()


def staged(splats, stage, tiles_x=TX, tiles_y=TY, m_cap=DUP):
    n = splats.depths.shape[0]
    num_tiles = tiles_x * tiles_y
    shift = max(int(n).bit_length(), 1)

    ty_lo_u = jnp.maximum(splats.tile_min[:, 1], 0)
    ty_hi_u = jnp.minimum(splats.tile_max[:, 1], tiles_y)
    bw_u = (splats.tile_max[:, 0] - splats.tile_min[:, 0]).astype(jnp.int32)
    bh_u = jnp.maximum(ty_hi_u - ty_lo_u, 0).astype(jnp.int32)
    cnt_u = jnp.where(splats.visible, bw_u * bh_u, 0)
    depth_key = jnp.where(cnt_u > 0, splats.depths, jnp.inf)
    order = jnp.argsort(depth_key)
    if stage == 1:
        return jnp.sum(order)

    bw1 = jnp.maximum(bw_u, 1)
    packed_u = (splats.tile_min[:, 0] | (ty_lo_u << 7) | (bw1 << 14)) \
        .astype(jnp.int32)
    cnt = cnt_u[order]
    packed = packed_u[order]
    offsets = jnp.cumsum(cnt) - cnt
    total = offsets[-1] + cnt[-1]
    if stage == 2:
        return jnp.sum(offsets) + total

    packed_prev = jnp.concatenate([jnp.zeros((1,), jnp.int32), packed[:-1]])
    d_packed = packed - packed_prev
    mark_tgt = jnp.where(cnt > 0, offsets, m_cap)
    marks = jnp.zeros((m_cap,), jnp.int32).at[mark_tgt].add(1, mode="drop")
    geo = jnp.zeros((m_cap,), jnp.int32).at[mark_tgt].add(
        d_packed, mode="drop")
    m = jnp.arange(m_cap, dtype=jnp.int32)
    src_p1 = _cumsum_2d(marks)
    last_pos = _cummax_2d(jnp.where(marks > 0, m, -1))
    packed_m = _cumsum_2d(geo)
    tminx_m = packed_m & 127
    tylo_m = (packed_m >> 7) & 127
    bw_m = packed_m >> 14
    j = (m - last_pos).astype(jnp.float32)
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
    local_tile = ty * tiles_x + tx
    valid = (m < total) & (src_p1 > 0)
    big = num_tiles << shift
    key = jnp.where(valid, (local_tile << shift) | src, big)
    if stage == 3:
        return jnp.sum(key)

    key_sorted = jnp.sort(key)
    if stage == 4:
        return jnp.sum(key_sorted)

    rank_sorted = key_sorted & ((1 << shift) - 1)
    starts = jnp.searchsorted(
        key_sorted, jnp.arange(num_tiles + 1) << shift,
        side="left").astype(jnp.int32)
    counts = jnp.diff(starts)
    if stage == 5:
        return jnp.sum(rank_sorted) + jnp.sum(starts) + jnp.sum(counts)

    lim = jnp.minimum(total, m_cap)
    cnt_surv = jnp.clip(offsets + cnt, 0, lim) - jnp.clip(offsets, 0, lim)
    cs_surv = jnp.cumsum(cnt_surv)
    rank_bounds = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), cs_surv]).astype(jnp.int32)
    return (jnp.sum(rank_sorted) + jnp.sum(starts) + jnp.sum(counts)
            + jnp.sum(rank_bounds))


def device_time(name, body, init, n_lo=4, n_hi=24):
    times = {}
    for n in (n_lo, n_hi):
        f = jax.jit(lambda c, n=n: jax.lax.fori_loop(
            0, n, lambda i, c: body(c), c))
        r = f(init)
        float(jnp.sum(r))
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            r = f(init)
            float(jnp.sum(r))
            best = min(best, time.perf_counter() - t0)
        times[n] = best
    per = (times[n_hi] - times[n_lo]) / (n_hi - n_lo)
    print(f"{name:40s} {per*1000:8.3f} ms/iter", flush=True)
    return per


for stage in range(1, 7):
    def body(c, stage=stage):
        s = splats._replace(depths=splats.depths + c * 0)
        return staged(s, stage).astype(jnp.float32) * 1e-12
    device_time(f"binning through stage {stage}", body, jnp.asarray(0.0))
