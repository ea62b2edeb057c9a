"""Device-true timing of the flagship k-camera step (lax.map loop).

Bench-scale scene (43k gaussians, 400x400) with k = num_cams_per_iter
cameras per iteration; reports ms/iter and ms/camera for both paths.
"""
import math
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from d3gs_tpu.config import ModelParams, OptimizationParams, PipelineParams
from d3gs_tpu.data.cameras import Camera, stack_cameras
from d3gs_tpu.models import gaussians as G
from d3gs_tpu.models.deform import create_deform_field
from d3gs_tpu.ops.camera_math import perspective_projection, world_to_view
from d3gs_tpu.train.flagship import make_batched_step, pick_field_spec

W = H = 400
N = 43_132
CAP = 44_032
K = int(sys.argv[1]) if len(sys.argv) > 1 else 10

rng = np.random.default_rng(0)
pts = (rng.random((N, 3)) * 2.6 - 1.3).astype(np.float32)
cols = rng.uniform(0, 1, (N, 3)).astype(np.float32)
state = G.create_from_pcd(pts, cols, sh_degree=3, capacity=CAP,
                          spatial_lr_scale=4.0)
state = state.replace(
    active_sh_degree=jnp.asarray(3, jnp.int32),
    params=state.params._replace(opacity=jnp.full((CAP, 1), 0.5)))

fov = math.radians(60)
P = perspective_projection(0.01, 100.0, fov, fov).T
cams = []
for i in range(K):
    V = world_to_view(np.eye(3), np.array([0.1 * i, -0.1 * i, 4.0 + 0.2 * i])).T
    cams.append(Camera(
        viewmatrix=jnp.asarray(V, jnp.float32),
        projmatrix=jnp.asarray(V @ P, jnp.float32),
        campos=jnp.asarray(np.linalg.inv(V)[3, :3], jnp.float32),
        fid=jnp.asarray(i / max(K - 1, 1)),
        image=jnp.asarray(rng.random((H, W, 3)), jnp.float32),
        width=W, height=H, fovx=fov, fovy=fov))
batch = stack_cameras(cams)

model_cfg = ModelParams(is_blender=True)
opt_cfg = OptimizationParams(num_cams_per_iter=K)
spec = pick_field_spec(model_cfg, opt_cfg)
dstate, field = create_deform_field(spec, jax.random.PRNGKey(0), opt_cfg)
key = jax.random.PRNGKey(0)
bg = jnp.zeros(3)


def time_step(name, pipe_cfg):
    step = make_batched_step(
        opt_cfg=opt_cfg, pipe_cfg=pipe_cfg, model_cfg=model_cfg,
        field=field, update_gaussians=True, update_deform=True,
        use_deform=True)
    times = {}
    for n in (2, 8):
        @jax.jit
        def run(st, dst):
            def body(i, c):
                s, d, it = c
                s2, d2, loss, ll1, ovf = step(s, d, batch, 3001.0 + it,
                                              key, bg)
                return (s2, d2, it + 1.0)
            return jax.lax.fori_loop(0, n, body,
                                     (st, dst, jnp.asarray(0.0)))
        out = run(state, dstate)
        float(jnp.sum(out[0].params.xyz))
        t0 = time.perf_counter()
        out = run(state, dstate)
        float(jnp.sum(out[0].params.xyz))
        times[n] = time.perf_counter() - t0
    per = (times[8] - times[2]) / 6.0
    print(f"{name:30s} {per*1000:9.2f} ms/iter  {per*1000/K:7.2f} ms/cam",
          flush=True)


time_step(f"flagship lax.map (k={K})",
          PipelineParams(dup_capacity=393_216))
