"""Device-true timing of the pallas blend kernels: paired vs unpaired.

Same fori_loop methodology as profile_true.py (the axon tunnel's
block_until_ready does not synchronize).
"""
import math
import time

import jax
import jax.numpy as jnp
import numpy as np

from d3gs_tpu.models import gaussians as G
from d3gs_tpu.ops.camera_math import perspective_projection, world_to_view
from d3gs_tpu.ops.projection import project_gaussians
from d3gs_tpu.ops.binning import bin_splats_records
from d3gs_tpu.ops.rasterize import pack_records
from d3gs_tpu.ops.pallas_blend import blend_records_pallas
from d3gs_tpu.ops.transforms import cov3d_packed

W = H = 400
N = 43_132
CAP = 44_032
TX, TY = (W + 15) // 16, (H + 15) // 16

rng = np.random.default_rng(0)
pts = (rng.random((N, 3)) * 2.6 - 1.3).astype(np.float32)
state = G.create_from_pcd(pts, np.full((N, 3), 0.5, np.float32),
                          sh_degree=3, capacity=CAP)
state = state.replace(params=state.params._replace(
    opacity=jnp.full((CAP, 1), 0.5)))

V = world_to_view(np.eye(3), np.array([0, 0, 4.0])).T
fov = math.radians(60)
P = perspective_projection(0.01, 100.0, fov, fov).T
tan = math.tan(fov / 2)
bg = jnp.zeros(3)

cov = cov3d_packed(state.get_scaling, state.params.rotation)
splats = jax.jit(lambda: project_gaussians(
    state.params.xyz, cov, state.get_opacity[:, 0],
    jnp.broadcast_to(jnp.array([0.5, 0.5, 0.5]), (CAP, 3)),
    jnp.asarray(V, jnp.float32), jnp.asarray(V @ P, jnp.float32),
    tan, tan, W, H, alive=state.alive))()
rbins = jax.jit(lambda: bin_splats_records(
    splats, tiles_x=TX, tiles_y=TY, dup_capacity=393_216))()
records = jax.jit(pack_records)(splats)


def device_time(name, make_body, n_lo=4, n_hi=24):
    times = {}
    for n in (n_lo, n_hi):
        body, init = make_body()
        f = jax.jit(lambda c, n=n, body=body: jax.lax.fori_loop(
            0, n, lambda i, c: body(c), c))
        r = f(init)
        float(jnp.sum(jnp.asarray(r)))
        t0 = time.perf_counter()
        r = f(init)
        float(jnp.sum(jnp.asarray(r)))
        times[n] = time.perf_counter() - t0
    per = (times[n_hi] - times[n_lo]) / (n_hi - n_lo)
    print(f"{name:44s} {per*1000:8.3f} ms/iter", flush=True)
    return per


def mk_fwd(pair):
    def body(c):
        img, dep, alp = blend_records_pallas(
            records + c * 1e-20, rbins, bg, tiles_x=TX, tiles_y=TY,
            width=W, height=H, pair=pair)
        return jnp.sum(img) * 1e-12
    return body, jnp.asarray(0.0)


def mk_grad(pair):
    g = jax.grad(lambda r: jnp.sum(blend_records_pallas(
        r, rbins, bg, tiles_x=TX, tiles_y=TY, width=W, height=H,
        pair=pair)[0] ** 2))

    def body(c):
        return jnp.sum(g(records + c * 1e-20)) * 1e-12
    return body, jnp.asarray(0.0)


import sys
which = sys.argv[1] if len(sys.argv) > 1 else "all"


def mk_bin():
    def body(c):
        s = splats._replace(depths=splats.depths + c * 1e-20)
        rb = bin_splats_records(s, tiles_x=TX, tiles_y=TY,
                                dup_capacity=393_216)
        return jnp.sum(rb.counts).astype(jnp.float32) * 1e-12
    return body, jnp.asarray(0.0)


if which in ("all", "bin"):
    device_time("bin_records (dup=384k)", mk_bin)
for pair in (False, True):
    if which in ("all", "fwd"):
        device_time(f"pallas blend fwd (pair={pair})", lambda: mk_fwd(pair))
for pair in (False, True):
    if which in ("all", "bwd"):
        device_time(f"pallas blend fwd+bwd (pair={pair})",
                    lambda: mk_grad(pair), n_lo=2, n_hi=10)
