"""Micro-profile of the pallas blend path stages at the bench config.

Device-true timing (on-device fori_loop chaining, two lengths differenced —
the axon tunnel's block_until_ready does not synchronize; see README).

Stages:
  binning            bin_splats_records (dup=393216)
  binning (nograd)   same minus the rank_bounds machinery (fwd-only render)
  slab gather        rec_pad[rank_pad] + block reshape (_make_blocks)
  fwd kernel         _fwd_pallas on a prebuilt slab
  bwd kernel         _bwd_pallas on prebuilt slab + cotangent
  bwd reduction      the XLA-side rank-group sort + gather + cumsum
  core fwd           full _core forward (gather + kernel)
  core fwd+bwd       full custom_vjp round trip
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
T = TX * TY
DUP = 393_216

rng = np.random.default_rng(0)
pts = (rng.random((N, 3)) * 2.6 - 1.3).astype(np.float32)
cols = rng.uniform(0, 1, (N, 3)).astype(np.float32)
state = G.create_from_pcd(pts, cols, sh_degree=3, capacity=CAP)
state = state.replace(params=state.params._replace(
    opacity=jnp.full((CAP, 1), 0.5)))

V = world_to_view(np.eye(3), np.array([0, 0, 4.0])).T
fov = math.radians(60)
P4 = perspective_projection(0.01, 100.0, fov, fov).T
vm = jnp.asarray(V, jnp.float32)
pm = jnp.asarray(V @ P4, jnp.float32)
campos = jnp.asarray(np.linalg.inv(V)[3, :3], jnp.float32)
tan = math.tan(fov / 2)
bg = jnp.zeros(3)

cov = cov3d_packed(state.get_scaling, state.params.rotation)
opac = state.get_opacity[:, 0]
colors = jnp.broadcast_to(jnp.array([0.5, 0.5, 0.5]), (CAP, 3))
xyz = state.params.xyz

splats0 = jax.jit(lambda: project_gaussians(
    xyz, cov, opac, colors, vm, pm, tan, tan, W, H,
    alive=state.alive))()
bins0 = jax.jit(lambda: bin_splats_records(
    splats0, tiles_x=TX, tiles_y=TY, dup_capacity=DUP))()
records0 = jax.jit(pack_records)(splats0)
print("dup total:", int(bins0.starts[T]), " max tile:", int(bins0.counts.max()))

n1 = CAP + 1
rec_pad0 = jnp.concatenate([records0[bins0.order],
                            jnp.zeros((1, 16), jnp.float32)], axis=0)
mpad = ((DUP + PB.KB - 1) // PB.KB) * PB.KB
marange = jnp.arange(mpad, dtype=jnp.int32)
total0 = bins0.starts[T]
rank_pad0 = jnp.where(marange < total0,
                      jnp.pad(bins0.rank_sorted.astype(jnp.int32),
                              (0, mpad - DUP)), CAP)
slab0 = jax.jit(PB._make_blocks)(rec_pad0, rank_pad0)
tids = jnp.arange(T, dtype=jnp.int32)
ox = (tids % TX) * TILE
oy = (tids // TX) * TILE
starts0 = bins0.starts.astype(jnp.int32)
out0 = jax.jit(lambda s: PB._fwd_pallas(s, starts0, ox, oy, num_tiles=T,
                                        interpret=False))(slab0)
g0 = jnp.ones_like(out0) * 1e-3


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
    print(f"{name:44s} {per*1000:8.3f} ms/iter")
    return per


# --- binning ---
def bin_body(c):
    s = splats0._replace(depths=splats0.depths + c * 0)
    rb = bin_splats_records(s, tiles_x=TX, tiles_y=TY, dup_capacity=DUP)
    return (jnp.sum(rb.counts) + jnp.sum(rb.rank_bounds)).astype(
        jnp.float32) * 1e-12


device_time("binning (records, dup=384k)", bin_body, jnp.asarray(0.0))


# --- slab gather ---
def gather_body(c):
    slab = PB._make_blocks(rec_pad0 + c * 0, rank_pad0)
    return jnp.sum(slab[:, 0, :]) * 1e-12


device_time("slab gather (_make_blocks)", gather_body, jnp.asarray(0.0))


# --- fwd kernel only ---
def fwdk_body(c):
    out = PB._fwd_pallas(slab0 + c * 0, starts0, ox, oy, num_tiles=T,
                         interpret=False)
    return jnp.sum(out[:, :, 0]) * 1e-12


device_time("fwd pallas kernel", fwdk_body, jnp.asarray(0.0))


# --- bwd kernel only ---
def bwdk_body(c):
    [g_all] = PB._bwd_pallas(slab0 + c * 0, starts0, ox, oy, g0, out0,
                             num_tiles=T, interpret=False)
    return jnp.sum(g_all[:, 0, :]) * 1e-12


device_time("bwd pallas kernel", bwdk_body, jnp.asarray(0.0))


# --- reduction only ---
g_all0 = jax.jit(lambda: PB._bwd_pallas(
    slab0, starts0, ox, oy, g0, out0, num_tiles=T, interpret=False)[0])()
rb0 = bins0.rank_bounds.astype(jnp.int32)
mb = slab0.shape[0]


def red_body(c):
    g_all = g_all0 + c * 0
    g_flat = g_all.transpose(0, 2, 1).reshape(mb * PB.KB, 16)
    iota = jnp.arange(mpad, dtype=jnp.int32)
    _, invperm = jax.lax.sort((rank_pad0, iota), num_keys=1)
    g_dd = g_flat[invperm]
    cs = jnp.cumsum(g_dd, axis=0)
    csz = jnp.concatenate([jnp.zeros((1, 16), jnp.float32), cs], axis=0)
    bounds = jnp.concatenate([rb0, jnp.full((1,), mpad, jnp.int32)])
    d_rec = csz[bounds[1:]] - csz[bounds[:-1]]
    return jnp.sum(d_rec) * 1e-12


device_time("bwd XLA reduction", red_body, jnp.asarray(0.0))


# --- full core fwd+bwd ---
def core_body(c):
    def f(rp):
        out = PB._core(rp, rank_pad0, rb0, starts0, ox, oy, T, False, False, False)
        return jnp.sum(out[:, :, 0] ** 2)
    return jnp.sum(jax.grad(f)(rec_pad0 + c * 0)) * 1e-12


device_time("core fwd+bwd (vjp round trip)", core_body, jnp.asarray(0.0),
             n_lo=2, n_hi=10)
