"""Device-true timing of the train step's non-blend parts at bench config:
projection+SH fwd+bwd, pack+reorder, Adam+densify stats, deform update.
Complements profile_core (blend) and profile_true (binning/MLP/SSIM).
"""
import math
import time

import jax
import jax.numpy as jnp
import numpy as np

from d3gs_tpu.config import OptimizationParams
from d3gs_tpu.models import gaussians as G
from d3gs_tpu.models.deform import DeformFieldSpec, create_deform_field
from d3gs_tpu.ops.camera_math import perspective_projection, world_to_view
from d3gs_tpu.ops.projection import project_gaussians
from d3gs_tpu.ops.rasterize import pack_records
from d3gs_tpu.ops.sh import eval_sh_upto

W = H = 400
N = 43_132
CAP = 44_032

rng = np.random.default_rng(0)
pts = (rng.random((N, 3)) * 2.6 - 1.3).astype(np.float32)
cols = rng.uniform(0, 1, (N, 3)).astype(np.float32)
state = G.create_from_pcd(pts, cols, sh_degree=3, capacity=CAP,
                          spatial_lr_scale=4.0)
state = state.replace(
    active_sh_degree=jnp.asarray(3, jnp.int32),
    params=state.params._replace(
        opacity=jnp.full((CAP, 1), 0.5, jnp.float32)))

V = world_to_view(np.eye(3), np.array([0, 0, 4.0])).T
fov = math.radians(60)
P4 = perspective_projection(0.01, 100.0, fov, fov).T
vm = jnp.asarray(V, jnp.float32)
pm = jnp.asarray(V @ P4, jnp.float32)
campos = jnp.asarray(np.linalg.inv(V)[3, :3], jnp.float32)
tan = math.tan(fov / 2)


def device_time(name, body, init, n_lo=4, n_hi=24):
    times = {}
    for n in (n_lo, n_hi):
        f = jax.jit(lambda c, n=n: jax.lax.fori_loop(
            0, n, lambda i, c: body(c), c))
        r = f(init)
        float(jax.tree_util.tree_reduce(
            lambda a, x: a + jnp.sum(x.astype(jnp.float32)),
            jax.tree.leaves(r), 0.0))
        best = float("inf")
        for _ in range(2):
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


# --- projection (+SH +pack) fwd+bwd, the exact train-step preprocessing ---
def preproc(params, tap):
    st = state.replace(params=params)
    means3d = params.xyz
    dirs = means3d - campos[None, :]
    dirs = dirs / jnp.maximum(jnp.linalg.norm(dirs, axis=-1, keepdims=True),
                              1e-8)
    colors = eval_sh_upto(3, state.active_sh_degree, st.get_features, dirs)
    colors = jnp.maximum(colors + 0.5, 0.0)
    s = project_gaussians(
        means3d, None, st.get_opacity[:, 0], colors, vm, pm, tan, tan, W, H,
        alive=st.alive, scales=st.get_scaling, rotations=st.get_rotation)
    s = s._replace(means2d=s.means2d + tap)
    return pack_records(s)


def mk_pre():
    tap0 = jnp.zeros((CAP, 2))
    g_rec = jnp.ones((CAP, 16)) * 1e-4

    def f(params, tap):
        return jnp.sum(preproc(params, tap) * g_rec)

    grad = jax.grad(f, argnums=(0, 1))

    def body(c):
        p = state.params._replace(xyz=state.params.xyz + c * 0)
        g, gt = grad(p, tap0)
        return jnp.sum(g.xyz) * 1e-12 + jnp.sum(gt) * 1e-12
    return body


device_time("projection+SH+pack fwd+bwd", mk_pre(), jnp.asarray(0.0))


# --- Adam + densify stats ---
opt_cfg = OptimizationParams()


def mk_adam():
    grads = jax.tree.map(lambda x: jnp.full_like(x, 1e-6), state.params)
    tapg = jnp.full((CAP, 2), 1e-6)
    radii = jnp.full((CAP,), 3, jnp.int32)

    def body(c):
        lrs = G.group_learning_rates(opt_cfg, 3001.0 + c * 0.0,
                                     state.spatial_lr_scale)
        p2, o2 = G.adam_step(state.params, grads, state.opt, lrs,
                             mask=state.alive)
        st = state.replace(params=p2, opt=o2)
        st = G.add_densification_stats(st, tapg, radii)
        return jnp.sum(st.params.xyz) * 1e-12 + c * 0
    return body


device_time("adam_step + densify stats", mk_adam(), jnp.asarray(0.0))


# --- deform field update (optax side) ---
spec = DeformFieldSpec(kind="baseline", is_blender=True)
dstate, field = create_deform_field(spec, jax.random.PRNGKey(0))


def mk_dupdate():
    grads = jax.tree.map(lambda x: jnp.full_like(x, 1e-6), dstate.params)

    def body(carry):
        dst, c = carry
        dst2 = field.update(dst, grads, 3001.0 + c)
        return (dst2, c + 1.0)
    return body


device_time("deform optax update", mk_dupdate(),
             (dstate, jnp.asarray(0.0)))


# --- full render + photometric loss fwd+bwd (no deform MLP) ---
from d3gs_tpu.models.renderer import render
from d3gs_tpu.ops.losses import l1_loss, ssim
from d3gs_tpu.data.cameras import Camera

cam = Camera(viewmatrix=vm, projmatrix=pm, campos=campos,
             fid=jnp.asarray(0.5),
             image=jnp.asarray(rng.random((H, W, 3)), jnp.float32),
             width=W, height=H, fovx=fov, fovy=fov)
bg = jnp.zeros(3)


def mk_render_loss():
    tap0 = jnp.zeros((CAP, 2))

    def f(params, tap):
        st = state.replace(params=params)
        out = render(st, cam, bg=bg, means2d_tap=tap,
                     tile_capacity=1024, tile_chunk=25,
                     dup_capacity=393_216)
        ll1 = l1_loss(out.image, cam.image)
        return 0.8 * ll1 + 0.2 * (1.0 - ssim(out.image, cam.image))

    grad = jax.value_and_grad(f, argnums=(0, 1))

    def body(c):
        p = state.params._replace(xyz=state.params.xyz + c * 0)
        (_, (g, gt)) = grad(p, tap0)
        return jnp.sum(g.xyz) * 1e-12 + jnp.sum(gt) * 1e-12
    return body


device_time("render+loss fwd+bwd (no deform)", mk_render_loss(),
             jnp.asarray(0.0), n_lo=2, n_hi=10)
