"""Fine-grained TPU profiling of the packed blend path (dev tool)."""
import math
import time

import jax
import jax.numpy as jnp
import numpy as np

from d3gs_tpu.models import gaussians as G
from d3gs_tpu.data.cameras import Camera
from d3gs_tpu.ops.camera_math import perspective_projection, world_to_view
from d3gs_tpu.ops.projection import project_gaussians, TILE
from d3gs_tpu.ops.binning import bin_splats_records
from d3gs_tpu.ops.rasterize import blend_records, pack_records

W = H = 400
N = 43_132
CAP = 44_032
TX, TY = (W + 15) // 16, (H + 15) // 16
KCAP = 1024

rng = np.random.default_rng(0)
pts = (rng.random((N, 3)) * 2.6 - 1.3).astype(np.float32)
cols = rng.uniform(0, 1, (N, 3)).astype(np.float32)
state = G.create_from_pcd(pts, cols, sh_degree=3, capacity=CAP)
state = state.replace(params=state.params._replace(
    opacity=jnp.full((CAP, 1), 0.5)))

V = world_to_view(np.eye(3), np.array([0, 0, 4.0])).T
fov = math.radians(60)
P = perspective_projection(0.01, 100.0, fov, fov).T
cam = Camera(viewmatrix=jnp.asarray(V, jnp.float32),
             projmatrix=jnp.asarray(V @ P, jnp.float32),
             campos=jnp.asarray(np.linalg.inv(V)[3, :3], jnp.float32),
             fid=jnp.asarray(0.5),
             image=jnp.asarray(rng.random((H, W, 3)), jnp.float32),
             width=W, height=H, fovx=fov, fovy=fov)
bg = jnp.zeros(3)
tan = math.tan(fov / 2)


def timeit(name, f, *args, iters=10):
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:44s} {dt*1000:8.2f} ms")
    return out


from d3gs_tpu.ops.transforms import cov3d_packed

cov = cov3d_packed(state.get_scaling, state.params.rotation)
opac = state.get_opacity[:, 0]
colors = jnp.broadcast_to(jnp.array([0.5, 0.5, 0.5]), (CAP, 3))

proj = jax.jit(lambda: project_gaussians(
    state.params.xyz, cov, opac, colors, cam.viewmatrix, cam.projmatrix,
    tan, tan, W, H, alive=state.alive))
splats = timeit("project fwd", proj)

binf = jax.jit(lambda s: bin_splats_records(s, tiles_x=TX, tiles_y=TY))
rbins = timeit("bin_splats_records", binf, splats)
M = rbins.rank_sorted.shape[0]
print("dup capacity M =", M, " total =", int(rbins.counts.sum()),
      " max tile count =", int(rbins.counts.max()))

packf = jax.jit(pack_records)
records = timeit("pack_records", packf, splats)

blendf = jax.jit(lambda r, b: blend_records(
    r, b, bg, tiles_x=TX, tiles_y=TY, width=W, height=H,
    tile_capacity=KCAP, tile_chunk=25))
timeit("blend_records fwd", blendf, records, rbins)


def loss(r):
    img, dep, alp = blend_records(r, rbins, bg, tiles_x=TX, tiles_y=TY,
                                  width=W, height=H, tile_capacity=KCAP,
                                  tile_chunk=25)
    return jnp.sum(img ** 2)


timeit("blend_records fwd+bwd", jax.jit(jax.grad(loss)), records)

# --- microbenchmarks ---
key = jax.random.PRNGKey(0)
idx = jax.random.randint(key, (M,), 0, N)
tab = jax.random.normal(key, (N, 16))

g16 = jax.jit(lambda t, i: t[i])
timeit(f"gather {M}x16 rows", g16, tab, idx)

tab1 = jax.random.normal(key, (N,))
g1 = jax.jit(lambda t, i: t[i])
timeit(f"gather {M}x1", g1, tab1, idx)

# scatter-add M rows of 16 into N
sc = jax.jit(lambda t, i: jnp.zeros((N + 1, 16)).at[i].add(t))
big = jax.random.normal(key, (M, 16))
timeit(f"scatter-add {M}x16 -> {N}", sc, big, idx)

# segment-sum after sort (sorted ids)
idx_sorted = jnp.sort(idx)
timeit(f"scatter-add {M}x16 sorted ids", sc, big, idx_sorted)

# sort with payload
keys = jax.random.randint(key, (M,), 0, 1 << 30)
payload = jax.random.normal(key, (M, 16))


def sort_payload(k, p):
    ops = (k,) + tuple(p[:, i] for i in range(16))
    out = jax.lax.sort(ops, num_keys=1)
    return out[1]


timeit("lax.sort key+16 payload", jax.jit(sort_payload), keys, payload)
timeit("jnp.sort key only", jax.jit(jnp.sort), keys)
timeit("argsort key", jax.jit(jnp.argsort), keys)

# cumsum over M
timeit("cumsum M", jax.jit(jnp.cumsum), keys)

# dense VPU pass over (625, 1024, 256) f32: one elementwise op
x = jax.random.normal(key, (25, 1024, 256))


def vpu_pass(x):
    return jnp.sum(jnp.exp(x) * x, axis=1)


timeit("exp+mul+reduce (25,1024,256)", jax.jit(vpu_pass), x)
