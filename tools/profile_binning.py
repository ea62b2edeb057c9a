"""Micro-profile of bin_splats_sorted sub-stages on TPU (dev tool)."""
import math, time
import jax, jax.numpy as jnp, numpy as np
from d3gs_tpu.models import gaussians as G
from d3gs_tpu.data.cameras import Camera
from d3gs_tpu.ops.camera_math import perspective_projection, world_to_view
from d3gs_tpu.ops.projection import project_gaussians

W = H = 400; N = 43_132; CAP = 44_032
TX, TY = 25, 25; KCAP = 1024; MCAP = 16 * CAP

rng = np.random.default_rng(0)
pts = (rng.random((N, 3)) * 2.6 - 1.3).astype(np.float32)
cols = rng.uniform(0, 1, (N, 3)).astype(np.float32)
state = G.create_from_pcd(pts, cols, sh_degree=3, capacity=CAP)
state = state.replace(params=state.params._replace(opacity=jnp.full((CAP, 1), 0.5)))
V = world_to_view(np.eye(3), np.array([0, 0, 4.0])).T
fov = math.radians(60)
P = perspective_projection(0.01, 100.0, fov, fov).T
tan = math.tan(fov / 2)
cov = state.get_covariance()
splats = jax.jit(lambda: project_gaussians(
    state.params.xyz, cov, state.get_opacity[:, 0], jnp.zeros((CAP, 3)),
    jnp.asarray(V, jnp.float32), jnp.asarray(V @ P, jnp.float32),
    tan, tan, W, H, alive=state.alive))()

def timeit(name, f, *args, iters=5):
    out = f(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters): out = f(*args)
    jax.block_until_ready(out)
    print(f"{name:34s} {(time.perf_counter()-t0)/iters*1000:8.2f} ms")
    return out

n = CAP; num_tiles = TX * TY

@jax.jit
def stage1(splats):
    depth_key = jnp.where(splats.visible, splats.depths, jnp.inf)
    order = jnp.argsort(depth_key)
    tmin = splats.tile_min[order]; tmax = splats.tile_max[order]
    vis = splats.visible[order]
    bw = (tmax[:, 0] - tmin[:, 0]); bh = jnp.maximum(tmax[:, 1] - tmin[:, 1], 0)
    cnt = jnp.where(vis, bw * bh, 0)
    offsets = jnp.cumsum(cnt) - cnt
    return order, tmin, bw, cnt, offsets

order, tmin, bw, cnt, offsets = timeit("argsort+cumsum", stage1, splats)

@jax.jit
def stage2(offsets, cnt, tmin, bw):
    m = jnp.arange(MCAP, dtype=jnp.int32)
    src = jnp.searchsorted(offsets, m, side="right").astype(jnp.int32) - 1
    src = jnp.clip(src, 0, n - 1)
    j = m - offsets[src]
    w_src = jnp.maximum(bw[src], 1)
    tx = tmin[src, 0] + j % w_src
    ty = tmin[src, 1] + j // w_src
    return src, (ty * TX + tx)

src, tile = timeit("searchsorted expand", stage2, offsets, cnt, tmin, bw)

stride = n + 1
@jax.jit
def stage3(tile, src, cnt):
    valid = cnt[src] > 0
    total = offsets[-1] + cnt[-1]
    valid = valid & (jnp.arange(MCAP) < total)
    key = jnp.where(valid, tile * stride + src, num_tiles * stride)
    return jnp.sort(key)

key_sorted = timeit("key sort (704k i32)", stage3, tile, src, cnt)

@jax.jit
def stage4(key_sorted, order):
    starts = jnp.searchsorted(key_sorted,
        (jnp.arange(num_tiles + 1) * stride).astype(key_sorted.dtype)).astype(jnp.int32)
    counts = jnp.diff(starts)
    rank_of = (key_sorted % stride).astype(jnp.int32)
    gauss = order[jnp.minimum(rank_of, n - 1)].astype(jnp.int32)
    k = jnp.arange(KCAP, dtype=jnp.int32)
    idx = jnp.clip(starts[:-1, None] + k[None, :], 0, MCAP - 1)
    lists = jnp.where(k[None, :] < jnp.minimum(counts, KCAP)[:, None],
                      gauss[idx], n)
    return lists, counts

lists, counts = timeit("gather lists", stage4, key_sorted, order)

@jax.jit
def stage4_scatter(key_sorted, order):
    starts = jnp.searchsorted(key_sorted,
        (jnp.arange(num_tiles + 1) * stride).astype(key_sorted.dtype)).astype(jnp.int32)
    tile_of = (key_sorted // stride).astype(jnp.int32)
    rank_of = (key_sorted % stride).astype(jnp.int32)
    gauss = order[jnp.minimum(rank_of, n - 1)].astype(jnp.int32)
    m = jnp.arange(MCAP, dtype=jnp.int32)
    pos = m - starts[jnp.minimum(tile_of, num_tiles - 1)]
    ok = (key_sorted < num_tiles * stride) & (pos < KCAP)
    tgt = jnp.where(ok, tile_of * KCAP + pos, num_tiles * KCAP)
    flat = jnp.full((num_tiles * KCAP,), n, jnp.int32)
    return flat.at[tgt].set(gauss, mode="drop", unique_indices=True)

timeit("scatter lists (old)", stage4_scatter, key_sorted, order)
print("lists equal:", bool((lists.reshape(-1) == stage4_scatter(key_sorted, order)).all()) if False else "skip")
