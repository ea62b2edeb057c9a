"""Measure corner_cull's surviving-duplicate fraction + step time at the
bench config (dev tool)."""
import math
import time

import jax
import jax.numpy as jnp
import numpy as np

from d3gs_tpu.models import gaussians as G
from d3gs_tpu.data.cameras import Camera
from d3gs_tpu.ops.camera_math import perspective_projection, world_to_view
from d3gs_tpu.ops.projection import project_gaussians
from d3gs_tpu.ops.binning import bin_splats_records
from d3gs_tpu.ops.transforms import cov3d_packed

W = H = 400
N = 43_132
CAP = 44_032
TX, TY = 25, 25

rng = np.random.default_rng(0)
pts = (rng.random((N, 3)) * 2.6 - 1.3).astype(np.float32)
cols = rng.uniform(0, 1, (N, 3)).astype(np.float32)
state = G.create_from_pcd(pts, cols, sh_degree=3, capacity=CAP)
state = state.replace(params=state.params._replace(
    opacity=jnp.full((CAP, 1), 0.5)))

V = world_to_view(np.eye(3), np.array([0, 0, 4.0])).T
fov = math.radians(60)
P = perspective_projection(0.01, 100.0, fov, fov).T
tan = math.tan(fov / 2)
cov = cov3d_packed(state.get_scaling, state.params.rotation)
opac = state.get_opacity[:, 0]
colors = jnp.broadcast_to(jnp.array([0.5, 0.5, 0.5]), (CAP, 3))
Vj = jnp.asarray(V, jnp.float32)
Pj = jnp.asarray(V @ P, jnp.float32)

splats = jax.jit(lambda: project_gaussians(
    state.params.xyz, cov, opac, colors, Vj, Pj, tan, tan, W, H,
    alive=state.alive))()

for cc in (False, True):
    bins = jax.jit(lambda s, cc=cc: bin_splats_records(
        s, tiles_x=TX, tiles_y=TY, corner_cull=cc))(splats)
    tot = int(jnp.sum(bins.counts))
    mx = int(jnp.max(bins.counts))
    print(f"corner_cull={cc}: surviving dups={tot}  max/tile={mx}")
