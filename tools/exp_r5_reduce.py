"""Round-5 A/B: blend-backward duplicate-reduction variants (dev tool).

The current reduction (sort (rank,iota) -> row-gather (M,16) -> blocked
tri-cumsum -> boundary diff) costs ~3.3 ms/step at bench scale, dominated
by a gather XLA lays out column-major. Variants measured here:

  V0: current chain (as in pallas_blend._core_bwd)
  V1: sort-payload — lax.sort((rank, 9 channels)) + per-channel log-depth
      cumsum + restack + boundary row-gather + diff
  V2: V0 with the permutation gather forced row-major via a pallas
      identity kernel on the input
  V3: V0 with the tri-cumsum in 3 exact bf16 chunks instead of HIGHEST

Timing: on-device fori_loop differencing (see profile_true.py).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M = 393_216
N1 = 44_033
KB = 128
MB = M // KB
REC = 16
LIVE = 9

rng = np.random.default_rng(0)
# realistic rank_pad: 625 ascending runs (per-tile), values < N1-1
tiles = 625
bounds = np.sort(rng.choice(M - 1, tiles - 1, replace=False) + 1)
runs = np.split(np.arange(M), bounds)
rank_np = np.concatenate([np.sort(rng.integers(0, N1 - 1, len(r)))
                          for r in runs]).astype(np.int32)
rank_pad = jnp.asarray(rank_np)
# per-rank segment bounds in rank-major order
cnt = np.bincount(rank_np, minlength=N1)
rb_np = np.concatenate([[0], np.cumsum(cnt)]).astype(np.int32)
rank_bounds = jnp.asarray(rb_np[:N1])          # (N1,)
g_all = jnp.asarray(rng.standard_normal((MB, REC, KB)), jnp.float32)


def device_time(name, make_body, n_lo=4, n_hi=16):
    times = {}
    for n in (n_lo, n_hi):
        body, init = make_body()
        f = jax.jit(lambda c, n=n, body=body: jax.lax.fori_loop(
            0, n, lambda i, c: body(c), c))
        r = f(init)
        float(jnp.sum(r))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            r = f(init)
            float(jnp.sum(r))
            best = min(best, time.perf_counter() - t0)
        times[n] = best
    per = (times[n_hi] - times[n_lo]) / (n_hi - n_lo)
    print(f"{name:44s} {per*1000:8.3f} ms/iter", flush=True)
    return per


def boundary_diff(cs, bounds_all):
    def at_prev(idx):
        row = cs[jnp.maximum(idx - 1, 0)]
        return jnp.where((idx > 0)[:, None], row, 0.0)
    return at_prev(bounds_all[1:]) - at_prev(bounds_all[:-1])


bounds_all = jnp.concatenate([rank_bounds, jnp.full((2,), M, jnp.int32)])


def v0(g):
    g_flat = g.transpose(0, 2, 1).reshape(M, REC)
    iota = jnp.arange(M, dtype=jnp.int32)
    _, invperm = jax.lax.sort((rank_pad, iota), num_keys=1)
    g_dd = g_flat[invperm]
    g3 = g_dd.reshape(MB, KB, REC)
    tri = jnp.tril(jnp.ones((KB, KB), jnp.float32))
    within = jax.lax.dot_general(
        tri, g3, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)
    within = jnp.swapaxes(within, 0, 1)
    bsum = g3.sum(axis=1)
    bpre = jnp.cumsum(bsum, axis=0) - bsum
    cs = (within + bpre[:, None, :]).reshape(M, REC)
    return boundary_diff(cs, bounds_all)


def _split3(x):
    x1 = x.astype(jnp.bfloat16)
    r1 = x - x1.astype(jnp.float32)
    x2 = r1.astype(jnp.bfloat16)
    x3 = (r1 - x2.astype(jnp.float32)).astype(jnp.bfloat16)
    return x1, x2, x3


def tri_cumsum_bf16(g3):
    tri = jnp.tril(jnp.ones((KB, KB), jnp.bfloat16))
    a1, a2, a3 = _split3(g3)

    def d(a):
        return jax.lax.dot_general(
            tri, a, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
    within = d(a1) + (d(a2) + d(a3))
    return jnp.swapaxes(within, 0, 1)


def v3(g):
    g_flat = g.transpose(0, 2, 1).reshape(M, REC)
    iota = jnp.arange(M, dtype=jnp.int32)
    _, invperm = jax.lax.sort((rank_pad, iota), num_keys=1)
    g_dd = g_flat[invperm]
    g3 = g_dd.reshape(MB, KB, REC)
    within = tri_cumsum_bf16(g3)
    bsum = g3.sum(axis=1)
    bpre = jnp.cumsum(bsum, axis=0) - bsum
    cs = (within + bpre[:, None, :]).reshape(M, REC)
    return boundary_diff(cs, bounds_all)


def logdepth_cumsum_1d(x):
    x2 = x.reshape(-1, 512)
    d = 1
    while d < 512:
        x2 = x2 + jnp.pad(x2, ((0, 0), (d, 0)))[:, :512]
        d *= 2
    rowsum = x2[:, -1]
    carry = jnp.cumsum(rowsum) - rowsum
    return (x2 + carry[:, None]).reshape(-1)


def v1(g):
    chans = [g[:, c, :].reshape(M) for c in range(LIVE)]
    out = jax.lax.sort((rank_pad, *chans), num_keys=1)
    cs_ch = [logdepth_cumsum_1d(c) for c in out[1:]]
    cs = jnp.stack(cs_ch, axis=1)                     # (M, 9)
    return boundary_diff(cs, bounds_all)


def _id_kernel(x_ref, o_ref):
    o_ref[...] = x_ref[...]


def force_rowmajor(x):
    return pl.pallas_call(
        _id_kernel,
        grid=(MB // 8,),
        in_specs=[pl.BlockSpec((KB * 8, REC), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((KB * 8, REC), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, REC), x.dtype),
    )(x)


def v2(g):
    g_flat = force_rowmajor(g.transpose(0, 2, 1).reshape(M, REC))
    iota = jnp.arange(M, dtype=jnp.int32)
    _, invperm = jax.lax.sort((rank_pad, iota), num_keys=1)
    g_dd = g_flat[invperm]
    g3 = g_dd.reshape(MB, KB, REC)
    within = tri_cumsum_bf16(g3)
    bsum = g3.sum(axis=1)
    bpre = jnp.cumsum(bsum, axis=0) - bsum
    cs = (within + bpre[:, None, :]).reshape(M, REC)
    return boundary_diff(cs, bounds_all)


# correctness cross-check (CPU-level, via the TPU values)
r0 = jax.jit(v0)(g_all)
r1 = jax.jit(v1)(g_all)
r2 = jax.jit(v2)(g_all)
d01 = float(jnp.max(jnp.abs(r0[:, :LIVE] - r1)))
d02 = float(jnp.max(jnp.abs(r0 - r2)))
print(f"max|v0-v1| = {d01:.3e}   max|v0-v2| = {d02:.3e}")


def mk(f):
    def make():
        def body(c):
            return jnp.sum(f(g_all + c * 0)) * 1e-9
        return body, jnp.asarray(0.0)
    return make


device_time("V0 current (sort+gather+HIGHEST tri)", mk(v0))
device_time("V3 = V0 with bf16x3 tri", mk(v3))
device_time("V2 = V3 + pallas-forced row-major", mk(v2))
device_time("V1 sort-payload (9ch)", mk(v1))

# pieces
device_time("  piece: sort (rank, iota)", mk(
    lambda g: jax.lax.sort(
        (rank_pad + jnp.int32(jnp.sum(g[0, 0, :1]) * 0),
         jnp.arange(M, dtype=jnp.int32)), num_keys=1)[1]))
device_time("  piece: 10-op sort", mk(
    lambda g: jax.lax.sort(
        (rank_pad, *[g[:, c, :].reshape(M) for c in range(LIVE)]),
        num_keys=1)[1]))
device_time("  piece: transpose to (M,16)", mk(
    lambda g: g.transpose(0, 2, 1).reshape(M, REC) * 1.0))
device_time("  piece: 9ch extract only", mk(
    lambda g: sum(g[:, c, :].reshape(M) for c in range(LIVE))))
