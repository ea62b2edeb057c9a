"""fori-loop profile of the packed-record path on TPU."""
import math, time
import jax, jax.numpy as jnp, numpy as np
from d3gs_tpu.models import gaussians as G
from d3gs_tpu.ops.camera_math import perspective_projection, world_to_view
from d3gs_tpu.ops.projection import project_gaussians
from d3gs_tpu.ops.binning import bin_splats_records
from d3gs_tpu.ops.rasterize import blend_records, pack_records
from d3gs_tpu.ops.losses import ssim, l1_loss

W = H = 400; N = 43_132; CAP = 44_032
TX = TY = 25; KCAP = 1024; ITERS = 10

rng = np.random.default_rng(0)
pts = (rng.random((N, 3)) * 2.6 - 1.3).astype(np.float32)
cols = rng.uniform(0, 1, (N, 3)).astype(np.float32)
state = G.create_from_pcd(pts, cols, sh_degree=3, capacity=CAP)
state = state.replace(params=state.params._replace(opacity=jnp.full((CAP, 1), 0.5)))
V = jnp.asarray(world_to_view(np.eye(3), np.array([0, 0, 4.0])).T, jnp.float32)
fov = math.radians(60)
P = jnp.asarray(np.asarray(V) @ np.asarray(
    perspective_projection(0.01, 100.0, fov, fov).T), jnp.float32)
tan = math.tan(fov / 2)
cov = state.get_covariance()
colors = jnp.broadcast_to(jnp.array([0.5, 0.5, 0.5]), (CAP, 3))
bg = jnp.zeros(3)
gt_img = jnp.asarray(rng.random((H, W, 3)), jnp.float32)
xyz0 = state.params.xyz

def bench(name, body_fn):
    @jax.jit
    def run(x0):
        def body(i, carry):
            x, acc = carry
            return (x, acc + body_fn(x + acc * 1e-20))
        return jax.lax.fori_loop(0, ITERS, body, (x0, jnp.float32(0)))[1]
    v = float(run(xyz0))
    t0 = time.perf_counter()
    v = float(run(xyz0))
    print(f"{name:40s} {(time.perf_counter()-t0)/ITERS*1000:8.2f} ms/iter (acc {v:.1f})")

def proj(x):
    return project_gaussians(x, cov, state.get_opacity[:, 0], colors, V, P,
                             tan, tan, W, H, alive=state.alive)

def full_fwd(x):
    s = proj(x)
    b = bin_splats_records(s, tiles_x=TX, tiles_y=TY)
    img, dep, alp = blend_records(pack_records(s), b, bg, tiles_x=TX,
                                  tiles_y=TY, width=W, height=H,
                                  tile_capacity=KCAP, tile_chunk=25)
    return jnp.sum(img) * 1e-9

def bin_fwd(x):
    s = proj(x)
    b = bin_splats_records(s, tiles_x=TX, tiles_y=TY)
    return jnp.sum(b.counts).astype(jnp.float32) * 1e-9

def full_loss(x):
    s = proj(x)
    b = bin_splats_records(s, tiles_x=TX, tiles_y=TY)
    img, dep, alp = blend_records(pack_records(s), b, bg, tiles_x=TX,
                                  tiles_y=TY, width=W, height=H,
                                  tile_capacity=KCAP, tile_chunk=25)
    return 0.8 * l1_loss(img, gt_img) + 0.2 * (1 - ssim(img, gt_img))

bench("proj+bin fwd (packed)", bin_fwd)
bench("full fwd (packed)", full_fwd)
bench("render+loss fwd+bwd (packed)",
      lambda x: jnp.sum(jax.grad(full_loss)(x)) * 1e-6)
