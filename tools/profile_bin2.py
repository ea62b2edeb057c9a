import math, time
import jax, jax.numpy as jnp, numpy as np
from d3gs_tpu.models import gaussians as G
from d3gs_tpu.ops.camera_math import perspective_projection, world_to_view
from d3gs_tpu.ops.projection import project_gaussians
from d3gs_tpu.ops.binning import bin_splats_sorted
from d3gs_tpu.ops.rasterize import blend

W = H = 400; N = 43_132; CAP = 44_032
TX = TY = 25; KCAP = 1024
rng = np.random.default_rng(0)
pts = (rng.random((N, 3)) * 2.6 - 1.3).astype(np.float32)
cols = rng.uniform(0, 1, (N, 3)).astype(np.float32)
state = G.create_from_pcd(pts, cols, sh_degree=3, capacity=CAP)
state = state.replace(params=state.params._replace(opacity=jnp.full((CAP, 1), 0.5)))
V = world_to_view(np.eye(3), np.array([0, 0, 4.0])).T
fov = math.radians(60); P = perspective_projection(0.01, 100.0, fov, fov).T
tan = math.tan(fov / 2)
cov = state.get_covariance()
colors = jnp.broadcast_to(jnp.array([0.5, 0.5, 0.5]), (CAP, 3))
bg = jnp.zeros(3)

@jax.jit
def pipeline(xyz, shiftval):
    s = project_gaussians(xyz + shiftval, cov, state.get_opacity[:, 0], colors,
                          jnp.asarray(V, jnp.float32), jnp.asarray(V @ P, jnp.float32),
                          tan, tan, W, H, alive=state.alive)
    bins = bin_splats_sorted(s, tiles_x=TX, tiles_y=TY, capacity=KCAP)
    return bins.tile_lists

@jax.jit
def pipeline_blend(xyz, shiftval):
    s = project_gaussians(xyz + shiftval, cov, state.get_opacity[:, 0], colors,
                          jnp.asarray(V, jnp.float32), jnp.asarray(V @ P, jnp.float32),
                          tan, tan, W, H, alive=state.alive)
    bins = bin_splats_sorted(s, tiles_x=TX, tiles_y=TY, capacity=KCAP)
    img, dep, alp = blend(s, bins, bg, tiles_x=TX, tiles_y=TY, width=W, height=H,
                          tile_chunk=25)
    return img

def timeit(name, f, iters=10):
    out = f(state.params.xyz, 0.0); jax.block_until_ready(out)
    t0 = time.perf_counter()
    shift = 0.0
    for i in range(iters):
        out = f(state.params.xyz, shift)
        shift = out.reshape(-1)[0].astype(jnp.float32) * 1e-20  # dependency
    s = float(jnp.sum(out))
    print(f"{name:34s} {(time.perf_counter()-t0)/iters*1000:8.2f} ms (sum {s:.0f})")

timeit("project+bin (chained)", pipeline)
timeit("project+bin+blend fwd (chained)", pipeline_blend)
