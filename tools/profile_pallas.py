"""Fine-grained device-time profile of the PALLAS blend path (dev tool).

Pieces measured separately at the bench config (43k gaussians, 400x400,
dup_capacity 393216):
  * pallas fwd kernel (incl. _make_blocks slab gather)
  * pallas fwd+bwd end-to-end (custom VJP: bwd kernel + XLA reduction)
  * the XLA-side duplicate->per-record gradient reduction alone
    (sort + gather + blocked cumsum + segment diff on a fake g_all)
  * binning fwd
Timing: on-device fori_loop differencing (see profile_true.py).
"""
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
from d3gs_tpu.ops.rasterize import pack_records
from d3gs_tpu.ops import pallas_blend as PB
from d3gs_tpu.ops.transforms import cov3d_packed

W = H = 400
N = 43_132
CAP = 44_032
TX, TY = (W + 15) // 16, (H + 15) // 16
DUP = 393_216

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


def device_time(name, make_body, n_lo=2, n_hi=10):
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

splats0 = jax.jit(lambda: project_gaussians(
    xyz, cov, opac, colors, cam.viewmatrix, cam.projmatrix, tan, tan, W, H,
    alive=state.alive))()
rbins0 = jax.jit(lambda: bin_splats_records(
    splats0, tiles_x=TX, tiles_y=TY, dup_capacity=DUP))()
records0 = jax.jit(pack_records)(splats0)
tot = int(rbins0.starts[-1])
print(f"duplicates: {tot} (capacity {DUP}), "
      f"max tile count {int(jnp.max(rbins0.counts))}", flush=True)


def mk_bin():
    def body(c):
        s = splats0._replace(depths=splats0.depths + c * 0)
        rb = bin_splats_records(s, tiles_x=TX, tiles_y=TY, dup_capacity=DUP)
        return jnp.sum(rb.counts).astype(jnp.float32) * 1e-12
    return body, jnp.asarray(0.0)


device_time("bin_records", mk_bin, n_lo=4, n_hi=24)


def mk_pallas_fwd():
    def body(c):
        img, dep, alp = PB.blend_records_pallas(
            records0 + c * 0, rbins0, bg, tiles_x=TX, tiles_y=TY,
            width=W, height=H)
        return jnp.sum(img) * 1e-12
    return body, jnp.asarray(0.0)


device_time("pallas blend fwd", mk_pallas_fwd, n_lo=4, n_hi=24)


def mk_pallas_grad():
    g = jax.grad(lambda r: jnp.sum(PB.blend_records_pallas(
        r, rbins0, bg, tiles_x=TX, tiles_y=TY, width=W, height=H)[0] ** 2))

    def body(c):
        return jnp.sum(g(records0 + c * 0)) * 1e-12
    return body, jnp.asarray(0.0)


device_time("pallas blend fwd+bwd", mk_pallas_grad)


# --- the XLA reduction alone, on a synthetic g_all ---
mpad = ((DUP + PB.KB - 1) // PB.KB) * PB.KB
mb = mpad // PB.KB
n1 = CAP + 1
g_all0 = jnp.asarray(rng.random((mb, PB._REC, PB.KB)), jnp.float32)
marange = jnp.arange(mpad, dtype=jnp.int32)
rank_pad0 = jnp.where(
    marange < tot,
    jnp.pad(rbins0.rank_sorted.astype(jnp.int32), (0, mpad - DUP)), CAP)
rank_bounds0 = rbins0.rank_bounds.astype(jnp.int32)


def reduction(g_all, rank_pad, rank_bounds):
    g_flat = g_all.transpose(0, 2, 1).reshape(mpad, PB._REC)
    iota = jnp.arange(mpad, dtype=jnp.int32)
    _, invperm = jax.lax.sort((rank_pad, iota), num_keys=1)
    g_dd = g_flat[invperm]
    g3 = g_dd.reshape(mb, PB.KB, PB._REC)
    tri = jnp.tril(jnp.ones((PB.KB, PB.KB), jnp.float32))
    within = jax.lax.dot_general(
        tri, g3, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)
    within = jnp.swapaxes(within, 0, 1)
    bsum = g3.sum(axis=1)
    bpre = jnp.cumsum(bsum, axis=0) - bsum
    cs = (within + bpre[:, None, :]).reshape(mpad, PB._REC)
    csz = jnp.concatenate([jnp.zeros((1, PB._REC), jnp.float32), cs], axis=0)
    bounds = jnp.concatenate(
        [rank_bounds, jnp.full((1,), mpad, jnp.int32)])
    return csz[bounds[1:]] - csz[bounds[:-1]]


def mk_reduction():
    def body(c):
        d = reduction(g_all0 + c * 0, rank_pad0, rank_bounds0)
        return jnp.sum(d) * 1e-12
    return body, jnp.asarray(0.0)


device_time("XLA duplicate-grad reduction", mk_reduction, n_lo=4, n_hi=24)


# pieces of the reduction
def mk_sort():
    def body(c):
        iota = jnp.arange(mpad, dtype=jnp.int32)
        _, invperm = jax.lax.sort((rank_pad0 + (c * 0).astype(jnp.int32),
                                   iota), num_keys=1)
        return jnp.sum(invperm).astype(jnp.float32) * 1e-12
    return body, jnp.asarray(0.0)


device_time("  sort (rank, iota)", mk_sort, n_lo=4, n_hi=24)

invperm0 = jax.jit(lambda: jax.lax.sort(
    (rank_pad0, jnp.arange(mpad, dtype=jnp.int32)), num_keys=1)[1])()


def mk_gather():
    g_flat0 = g_all0.transpose(0, 2, 1).reshape(mpad, PB._REC)

    def body(c):
        g = (g_flat0 + c * 0)[invperm0]
        return jnp.sum(g) * 1e-12
    return body, jnp.asarray(0.0)


device_time("  M x 16 row gather", mk_gather, n_lo=4, n_hi=24)


# _make_blocks slab gather (fwd-side M x 16 gather)
def mk_make_blocks():
    rec_pad0 = jnp.concatenate(
        [records0[rbins0.order], jnp.zeros((1, 16), jnp.float32)], axis=0)

    def body(c):
        blocks = PB._make_blocks(rec_pad0 + c * 0, rank_pad0)
        return jnp.sum(blocks) * 1e-12
    return body, jnp.asarray(0.0)


device_time("  _make_blocks slab gather", mk_make_blocks, n_lo=4, n_hi=24)
