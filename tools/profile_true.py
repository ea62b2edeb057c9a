"""TRUE device-time profiling via on-device fori_loop repetition.

The axon tunnel's block_until_ready does not synchronize, so wall-clock
timing of individual dispatches measures host/tunnel overhead. This tool
chains K iterations of each op inside ONE jit (carry-dependent so nothing
can be hoisted/CSE'd), fetches one scalar, and differences two K values to
cancel the fixed roundtrip.
"""
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
from d3gs_tpu.ops.binning import bin_splats_records
from d3gs_tpu.ops.rasterize import blend_records, pack_records
from d3gs_tpu.ops.transforms import cov3d_packed
from d3gs_tpu.ops.losses import ssim, l1_loss
from d3gs_tpu.config import OptimizationParams, PipelineParams
from d3gs_tpu.train.step import make_train_step

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


def device_time(name, make_body, n_lo=4, n_hi=24):
    """make_body() -> (body, init) with body(carry)->carry, carry a scalar-
    reducible pytree; we time fori_loop(n) for two n and difference.
    Best-of-3 per length: tunnel jitter is one-sided (delays only), and a
    delayed n_lo run silently UNDERSTATES the per-iter time."""
    times = {}
    for n in (n_lo, n_hi):
        body, init = make_body()
        f = jax.jit(lambda c, n=n, body=body: jax.lax.fori_loop(
            0, n, lambda i, c: body(c), c))
        r = f(init)
        float(jax.tree_util.tree_reduce(
            lambda a, x: a + jnp.sum(x.astype(jnp.float32)),
            jax.tree.leaves(r), 0.0))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            r = f(init)
            float(jax.tree_util.tree_reduce(
                lambda a, x: a + jnp.sum(x.astype(jnp.float32)),
                jax.tree.leaves(r), 0.0))
            best = min(best, time.perf_counter() - t0)
        times[n] = best
    per = (times[n_hi] - times[n_lo]) / (n_hi - n_lo)
    print(f"{name:44s} {per*1000:8.3f} ms/iter", flush=True)
    return per


cov = cov3d_packed(state.get_scaling, state.params.rotation)
opac = state.get_opacity[:, 0]
colors = jnp.broadcast_to(jnp.array([0.5, 0.5, 0.5]), (CAP, 3))
xyz = state.params.xyz


# --- projection fwd ---
def mk_proj():
    def body(c):
        s = project_gaussians(xyz + c * 0, cov, opac, colors, cam.viewmatrix,
                              cam.projmatrix, tan, tan, W, H,
                              alive=state.alive)
        return jnp.sum(s.means2d) * 1e-12
    return body, jnp.asarray(0.0)


device_time("project fwd", mk_proj)


# --- binning ---
splats0 = jax.jit(lambda: project_gaussians(
    xyz, cov, opac, colors, cam.viewmatrix, cam.projmatrix, tan, tan, W, H,
    alive=state.alive))()


def mk_bin(dup):
    def body(c):
        s = splats0._replace(depths=splats0.depths + c * 0)
        rb = bin_splats_records(s, tiles_x=TX, tiles_y=TY, dup_capacity=dup)
        return jnp.sum(rb.counts).astype(jnp.float32) * 1e-12
    return body, jnp.asarray(0.0)


device_time("bin_records (dup=16N)", lambda: mk_bin(0))
device_time("bin_records (dup=384k)", lambda: mk_bin(385024))

rbins0 = jax.jit(lambda: bin_splats_records(
    splats0, tiles_x=TX, tiles_y=TY))()
records0 = jax.jit(pack_records)(splats0)


# --- blend fwd ---
def mk_blend():
    def body(c):
        img, dep, alp = blend_records(
            records0 + c * 0, rbins0, bg, tiles_x=TX, tiles_y=TY,
            width=W, height=H, tile_capacity=KCAP, tile_chunk=25)
        return jnp.sum(img) * 1e-12
    return body, jnp.asarray(0.0)


device_time("blend_records fwd", mk_blend)


# --- blend fwd+bwd ---
def mk_blend_grad():
    g = jax.grad(lambda r: jnp.sum(blend_records(
        r, rbins0, bg, tiles_x=TX, tiles_y=TY, width=W, height=H,
        tile_capacity=KCAP, tile_chunk=25)[0] ** 2))

    def body(c):
        return jnp.sum(g(records0 + c * 0)) * 1e-12
    return body, jnp.asarray(0.0)


device_time("blend_records fwd+bwd", mk_blend_grad, n_lo=2, n_hi=10)


# --- full train step ---
spec = DeformFieldSpec(kind="baseline", is_blender=True)
dstate, field = create_deform_field(spec, jax.random.PRNGKey(0))
opt_cfg = OptimizationParams()
pipe_cfg = PipelineParams(tile_capacity=KCAP, tile_chunk=25)


def deform_fn(d_params, x, fid, iteration, key):
    return field.step(d_params, x, fid)


step = make_train_step(opt_cfg=opt_cfg, pipe_cfg=pipe_cfg,
                       deform_fn=deform_fn, deform_update_fn=field.update,
                       donate=False)
key = jax.random.PRNGKey(0)


def mk_step():
    def body(carry):
        st, dst, i = carry
        st2, dst2, aux = step(st, dst, cam, 3001.0 + i, key, bg)
        return (st2, dst2, i + 1.0)
    return (lambda c: (lambda st, dst, i: (
        lambda o: (o[0], o[1], i + 1.0))(step(st, dst, cam, 3001.0 + i,
                                              key, bg)))(*c)), \
        (state, dstate, jnp.asarray(0.0))


def mk_step2():
    def body(carry):
        st, dst, i = carry
        st2, dst2, aux = step(st, dst, cam, 3001.0 + i, key, bg)
        return (st2, dst2, i + 1.0)
    return body, (state, dstate, jnp.asarray(0.0))


device_time("FULL train step", mk_step2, n_lo=2, n_hi=10)


# --- deform mlp fwd+bwd ---
def mk_mlp():
    g = jax.grad(lambda p, c: jnp.sum(
        field.step(p, xyz + c, jnp.asarray(0.5))[0] ** 2), argnums=1)

    def body(c):
        return jnp.sum(g(dstate.params, c)) * 1e-12
    return body, jnp.asarray(0.0)


device_time("deform MLP fwd+bwd", mk_mlp)


# --- ssim fwd+bwd ---
img0 = cam.image * 0.5


def mk_ssim():
    g = jax.grad(lambda x: (1 - ssim(x, cam.image)) + l1_loss(x, cam.image))

    def body(c):
        return jnp.sum(g(img0 + c * 0)) * 1e-9
    return body, jnp.asarray(0.0)


device_time("ssim+l1 fwd+bwd", mk_ssim)
