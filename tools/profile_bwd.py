"""Isolate backward costs of the packed blend path."""
import math, time
import jax, jax.numpy as jnp, numpy as np
from d3gs_tpu.models import gaussians as G
from d3gs_tpu.ops.camera_math import perspective_projection, world_to_view
from d3gs_tpu.ops.projection import project_gaussians
from d3gs_tpu.ops.binning import bin_splats_records
from d3gs_tpu.ops.rasterize import blend_records, pack_records

W = H = 400; N = 43_132; CAP = 44_032
TX = TY = 25; KCAP = 1024; ITERS = 10
rng = np.random.default_rng(0)
pts = (rng.random((N, 3)) * 2.6 - 1.3).astype(np.float32)
cols = rng.uniform(0, 1, (N, 3)).astype(np.float32)
state = G.create_from_pcd(pts, cols, sh_degree=3, capacity=CAP)
state = state.replace(params=state.params._replace(opacity=jnp.full((CAP, 1), 0.5)))
V = jnp.asarray(world_to_view(np.eye(3), np.array([0, 0, 4.0])).T, jnp.float32)
fov = math.radians(60)
P = jnp.asarray(np.asarray(V) @ np.asarray(perspective_projection(0.01, 100.0, fov, fov).T), jnp.float32)
tan = math.tan(fov / 2)
cov = state.get_covariance()
colors = jnp.broadcast_to(jnp.array([0.5, 0.5, 0.5]), (CAP, 3))
bg = jnp.zeros(3)
splats = jax.jit(lambda: project_gaussians(
    state.params.xyz, cov, state.get_opacity[:, 0], colors, V, P, tan, tan,
    W, H, alive=state.alive))()
bins = jax.jit(lambda s: bin_splats_records(s, tiles_x=TX, tiles_y=TY))(splats)
records0 = jax.jit(pack_records)(splats)

def bench(name, body_fn, x0):
    @jax.jit
    def run(x):
        def body(i, carry):
            xx, acc = carry
            return (xx, acc + body_fn(xx + acc * 1e-20))
        return jax.lax.fori_loop(0, ITERS, body, (x, jnp.float32(0)))[1]
    v = float(run(x0))
    t0 = time.perf_counter()
    v = float(run(x0))
    print(f"{name:44s} {(time.perf_counter()-t0)/ITERS*1000:8.2f} ms (acc {v:.2f})")

def blend_only(rec):
    img, dep, alp = blend_records(rec, bins, bg, tiles_x=TX, tiles_y=TY,
                                  width=W, height=H, tile_capacity=KCAP,
                                  tile_chunk=25)
    return jnp.sum(img) * 1e-7

bench("blend fwd (fixed bins)", blend_only, records0)
bench("blend fwd+bwd wrt records",
      lambda r: jnp.sum(jax.grad(blend_only)(r)) * 1e-3, records0)

# raw scatter-add cost: transpose of the slab row-gather
row_idx = jnp.asarray(rng.integers(0, N, (TX*TY, KCAP)).astype(np.int32))
gsl = jnp.asarray(rng.random((TX*TY, KCAP, 16)).astype(np.float32))
def scatter_add(x):
    out = jnp.zeros((CAP + 1, 16)).at[row_idx].add(gsl + x[0, 0] * 1e-20)
    return jnp.sum(out) * 1e-7
bench("scatter-add 640k rows -> (44k,16)", scatter_add, records0)

rank_sorted = bins.rank_sorted
def scatter_unique(x):
    g = jnp.asarray(gsl).reshape(-1, 16)[:rank_sorted.shape[0] // 1]
    out = jnp.zeros((rank_sorted.shape[0], 16)).at[
        jnp.arange(rank_sorted.shape[0])].add(g[:rank_sorted.shape[0]] + x[0, 0] * 1e-20
        ) if False else None
    # unique scatter via permutation
    perm = jnp.argsort(rank_sorted)
    out = jnp.zeros((rank_sorted.shape[0], 16)).at[perm].set(
        jnp.ones((rank_sorted.shape[0], 16)) + x[0, 0] * 1e-20,
        unique_indices=True)
    return jnp.sum(out) * 1e-7
bench("unique scatter 704k rows", scatter_unique, records0)

def cumsum16(x):
    big = jnp.broadcast_to(x[:1], (704512 // 16, 16 * 16)).reshape(-1, 16)
    return jnp.sum(jnp.cumsum(big[:704512] + x[0, 0] * 1e-20, axis=0)[-1]) * 1e-9
bench("cumsum (704k,16)", cumsum16, records0)
