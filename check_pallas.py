"""Dev check: pallas blend vs XLA packed blend — fwd + grads on TPU."""
import math

import jax
import jax.numpy as jnp
import numpy as np

from d3gs_tpu.models import gaussians as G
from d3gs_tpu.data.cameras import Camera
from d3gs_tpu.ops.camera_math import perspective_projection, world_to_view
from d3gs_tpu.ops.projection import project_gaussians, TILE
from d3gs_tpu.ops.binning import bin_splats_records
from d3gs_tpu.ops.rasterize import blend_records, pack_records
from d3gs_tpu.ops.pallas_blend import blend_records_pallas
from d3gs_tpu.ops.transforms import cov3d_packed

W = H = 160
N = 3000
CAP = 3072
TX, TY = (W + 15) // 16, (H + 15) // 16

rng = np.random.default_rng(0)
pts = (rng.random((N, 3)) * 2.6 - 1.3).astype(np.float32)
cols = rng.uniform(0, 1, (N, 3)).astype(np.float32)
state = G.create_from_pcd(pts, cols, sh_degree=1, capacity=CAP)
state = state.replace(params=state.params._replace(
    opacity=jnp.asarray(rng.uniform(-2, 2, (CAP, 1)), jnp.float32)))

V = world_to_view(np.eye(3), np.array([0, 0, 4.0])).T
fov = math.radians(60)
P_ = perspective_projection(0.01, 100.0, fov, fov).T
cam = Camera(viewmatrix=jnp.asarray(V, jnp.float32),
             projmatrix=jnp.asarray(V @ P_, jnp.float32),
             campos=jnp.asarray(np.linalg.inv(V)[3, :3], jnp.float32),
             fid=jnp.asarray(0.5),
             image=jnp.asarray(rng.random((H, W, 3)), jnp.float32),
             width=W, height=H, fovx=fov, fovy=fov)
bg = jnp.asarray([0.2, 0.3, 0.4])
tan = math.tan(fov / 2)

cov = cov3d_packed(state.get_scaling, state.params.rotation)
opac = state.get_opacity[:, 0]
colors = jnp.asarray(rng.uniform(0, 1, (CAP, 3)), jnp.float32)

splats = jax.jit(lambda: project_gaussians(
    state.params.xyz, cov, opac, colors, cam.viewmatrix, cam.projmatrix,
    tan, tan, W, H, alive=state.alive))()
rbins = jax.jit(lambda s: bin_splats_records(
    s, tiles_x=TX, tiles_y=TY))(splats)
records = jax.jit(pack_records)(splats)
print("total dups:", int(rbins.counts.sum()), "max tile:",
      int(rbins.counts.max()))

ref = jax.jit(lambda r: blend_records(
    r, rbins, bg, tiles_x=TX, tiles_y=TY, width=W, height=H,
    tile_capacity=2048, tile_chunk=25))(records)
new = jax.jit(lambda r: blend_records_pallas(
    r, rbins, bg, tiles_x=TX, tiles_y=TY, width=W, height=H))(records)

for name, a, b in zip(("img", "dep", "alpha"), ref, new):
    a, b = np.asarray(a), np.asarray(b)
    print(f"fwd {name}: max|d|={np.abs(a-b).max():.3e} "
          f"mean|ref|={np.abs(a).mean():.3e}")

tgt = jnp.asarray(rng.random((H, W, 3)), jnp.float32)


def loss_ref(r, b):
    img, dep, alp = blend_records(r, rbins, b, tiles_x=TX, tiles_y=TY,
                                  width=W, height=H, tile_capacity=2048,
                                  tile_chunk=25)
    return jnp.sum((img - tgt) ** 2) + jnp.sum(dep * 0.01) + jnp.sum(alp * 0.02)


def loss_new(r, b):
    img, dep, alp = blend_records_pallas(r, rbins, b, tiles_x=TX, tiles_y=TY,
                                         width=W, height=H)
    return jnp.sum((img - tgt) ** 2) + jnp.sum(dep * 0.01) + jnp.sum(alp * 0.02)


gr, gbr = jax.jit(jax.grad(loss_ref, argnums=(0, 1)))(records, bg)
gn, gbn = jax.jit(jax.grad(loss_new, argnums=(0, 1)))(records, bg)
gr, gn = np.asarray(gr), np.asarray(gn)
for i, nm in enumerate(["mux", "muy", "ca", "cb", "cc", "r", "g", "b",
                        "opa", "dep"]):
    d = np.abs(gr[:, i] - gn[:, i]).max()
    s = np.abs(gr[:, i]).max() + 1e-12
    print(f"grad {nm:4s}: max|d|={d:.3e}  rel={d/s:.3e}")
print("grad bg:", np.abs(np.asarray(gbr) - np.asarray(gbn)).max())
