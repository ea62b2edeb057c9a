"""Stage-by-stage TPU profiling of the render/train pipeline (dev tool)."""
import json
import math
import time

import jax
import jax.numpy as jnp
import numpy as np

from d3gs_tpu.models import gaussians as G
from d3gs_tpu.models.deform import DeformFieldSpec, create_deform_field
from d3gs_tpu.data.cameras import Camera
from d3gs_tpu.ops.camera_math import perspective_projection, world_to_view
from d3gs_tpu.ops.projection import project_gaussians, TILE
from d3gs_tpu.ops.binning import bin_splats, bin_splats_sorted
from d3gs_tpu.ops.rasterize import blend
from d3gs_tpu.ops.transforms import cov3d_packed
from d3gs_tpu.ops.losses import ssim, l1_loss

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


def timeit(name, f, *args, iters=5):
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:40s} {dt*1000:8.2f} ms")
    return out


cov = cov3d_packed(state.get_scaling, state.params.rotation)
opac = state.get_opacity[:, 0]
colors = jnp.broadcast_to(jnp.array([0.5, 0.5, 0.5]), (CAP, 3))

proj = jax.jit(lambda: project_gaussians(
    state.params.xyz, cov, opac, colors, cam.viewmatrix, cam.projmatrix,
    tan, tan, W, H, alive=state.alive))
splats = timeit("project fwd", proj)

bins = timeit("bin_splats (scan)", jax.jit(lambda s: bin_splats(
    s, tiles_x=TX, tiles_y=TY, capacity=KCAP, chunk=2048)), splats)
bins = timeit("bin_splats (sort)", jax.jit(lambda s: bin_splats_sorted(
    s, tiles_x=TX, tiles_y=TY, capacity=KCAP)), splats)
print("max count", int(bins.counts.max()))

blend_f = jax.jit(lambda s: blend(s, bins, bg, tiles_x=TX, tiles_y=TY,
                                  width=W, height=H, tile_chunk=25))
timeit("blend fwd", blend_f, splats)


def blend_loss(means2d, conics, colors_, opac_):
    s = splats._replace(means2d=means2d, conics=conics, colors=colors_,
                        opacities=opac_)
    img, dep, alp = blend(s, bins, bg, tiles_x=TX, tiles_y=TY, width=W,
                          height=H, tile_chunk=25)
    return jnp.sum(img ** 2)


blend_bwd = jax.jit(jax.grad(blend_loss, argnums=(0, 1, 2, 3)))
timeit("blend fwd+bwd", blend_bwd, splats.means2d, splats.conics,
       splats.colors, splats.opacities)


def full_loss(xyz):
    cov_ = cov3d_packed(state.get_scaling, state.params.rotation)
    s = project_gaussians(xyz, cov_, opac, colors, cam.viewmatrix,
                          cam.projmatrix, tan, tan, W, H, alive=state.alive)
    img, dep, alp = blend(s, bins, bg, tiles_x=TX, tiles_y=TY, width=W,
                          height=H, tile_chunk=25)
    ll1 = l1_loss(img, cam.image)
    return (1 - 0.2) * ll1 + 0.2 * (1 - ssim(img, cam.image))


timeit("proj+blend+loss fwd+bwd (fixed bins)", jax.jit(jax.grad(full_loss)),
       state.params.xyz)

# deform MLP
spec = DeformFieldSpec(kind="baseline", is_blender=True)
dstate, field = create_deform_field(spec, jax.random.PRNGKey(0))
dfwd = jax.jit(lambda p: field.step(p, state.params.xyz, jnp.asarray(0.5))[0])
timeit("deform MLP fwd", dfwd, dstate.params)
dgrad = jax.jit(jax.grad(lambda p: jnp.sum(
    field.step(p, state.params.xyz, jnp.asarray(0.5))[0] ** 2)))
timeit("deform MLP fwd+bwd", dgrad, dstate.params)

timeit("ssim alone", jax.jit(lambda a: ssim(a, cam.image)), cam.image * 0.5)
