"""Round-5 A/B part 2: decompose V1 (sort-payload reduction) and try a
3-D direct gather (dev tool)."""
import time

import jax
import jax.numpy as jnp
import numpy as np

M = 393_216
N1 = 44_033
KB = 128
MB = M // KB
REC = 16
LIVE = 9

rng = np.random.default_rng(0)
tiles = 625
bounds = np.sort(rng.choice(M - 1, tiles - 1, replace=False) + 1)
runs = np.split(np.arange(M), bounds)
rank_np = np.concatenate([np.sort(rng.integers(0, N1 - 1, len(r)))
                          for r in runs]).astype(np.int32)
rank_pad = jnp.asarray(rank_np)
cnt = np.bincount(rank_np, minlength=N1)
rb_np = np.concatenate([[0], np.cumsum(cnt)]).astype(np.int32)
rank_bounds = jnp.asarray(rb_np[:N1])
g_all = jnp.asarray(rng.standard_normal((MB, REC, KB)), jnp.float32)
bounds_all = jnp.concatenate([rank_bounds, jnp.full((2,), M, jnp.int32)])


def device_time(name, f, n_lo=4, n_hi=16):
    times = {}
    for n in (n_lo, n_hi):
        fj = jax.jit(lambda c, n=n: jax.lax.fori_loop(
            0, n, lambda i, c: jnp.sum(f(g_all + c * 0)) * 1e-9, c))
        r = fj(jnp.asarray(0.0))
        float(r)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            r = fj(jnp.asarray(0.0))
            float(r)
            best = min(best, time.perf_counter() - t0)
        times[n] = best
    per = (times[n_hi] - times[n_lo]) / (n_hi - n_lo)
    print(f"{name:46s} {per*1000:8.3f} ms/iter", flush=True)


def logdepth_cumsum_1d(x):
    x2 = x.reshape(-1, 512)
    d = 1
    while d < 512:
        x2 = x2 + jnp.pad(x2, ((0, 0), (d, 0)))[:, :512]
        d *= 2
    rowsum = x2[:, -1]
    carry = jnp.cumsum(rowsum) - rowsum
    return (x2 + carry[:, None]).reshape(-1)


def extract(g):
    return [g[:, c, :].reshape(M) for c in range(LIVE)]


def boundary_diff(cs, ba):
    def at_prev(idx):
        row = cs[jnp.maximum(idx - 1, 0)]
        return jnp.where((idx > 0)[:, None], row, 0.0)
    return at_prev(ba[1:]) - at_prev(ba[:-1])


def s_sort(g):
    out = jax.lax.sort((rank_pad, *extract(g)), num_keys=1)
    return sum(out[1:])


def s_cumsum(g):
    out = jax.lax.sort((rank_pad, *extract(g)), num_keys=1)
    return sum(logdepth_cumsum_1d(c) for c in out[1:])


def s_stack(g):
    out = jax.lax.sort((rank_pad, *extract(g)), num_keys=1)
    cs = jnp.stack([logdepth_cumsum_1d(c) for c in out[1:]], axis=1)
    return cs[:8]


def s_full(g):
    out = jax.lax.sort((rank_pad, *extract(g)), num_keys=1)
    cs = jnp.stack([logdepth_cumsum_1d(c) for c in out[1:]], axis=1)
    return boundary_diff(cs, bounds_all)


def s_full_nostack(g):
    """boundary diff per channel via N-scale 1-D gathers."""
    out = jax.lax.sort((rank_pad, *extract(g)), num_keys=1)
    res = []
    hi = bounds_all[1:]
    lo = bounds_all[:-1]
    for c in out[1:]:
        cs = logdepth_cumsum_1d(c)
        a = jnp.where(hi > 0, cs[jnp.maximum(hi - 1, 0)], 0.0)
        b = jnp.where(lo > 0, cs[jnp.maximum(lo - 1, 0)], 0.0)
        res.append(a - b)
    return jnp.stack(res, axis=1)


def s_cumsum2d(g):
    """sort payloads, then ONE (M,16)-shaped blocked tri cumsum like V0."""
    out = jax.lax.sort((rank_pad, *extract(g)), num_keys=1)
    cs = jnp.stack(out[1:], axis=1)                   # (M, 9)
    g3 = cs.reshape(MB, KB, LIVE)
    tri = jnp.tril(jnp.ones((KB, KB), jnp.float32))
    within = jax.lax.dot_general(
        tri, g3, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)
    within = jnp.swapaxes(within, 0, 1)
    bsum = g3.sum(axis=1)
    bpre = jnp.cumsum(bsum, axis=0) - bsum
    cs2 = (within + bpre[:, None, :]).reshape(M, LIVE)
    return boundary_diff(cs2, bounds_all)


def v6(g):
    """direct 3-D gather from the block layout (no flatten/transpose)."""
    iota = jnp.arange(M, dtype=jnp.int32)
    _, invperm = jax.lax.sort((rank_pad, iota), num_keys=1)
    g_dd = g[invperm >> 7, :, invperm & 127]          # (M, 16)
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


device_time("sort10 only", s_sort)
device_time("sort10 + 9x cumsum", s_cumsum)
device_time("sort10 + cumsum + stack", s_stack)
device_time("V1 full (stack + row-gather diff)", s_full)
device_time("V1 nostack (per-chan 1-D diff)", s_full_nostack)
device_time("V1b sort + stack + tri-cumsum + diff", s_cumsum2d)
device_time("V6 3-D gather + tri", v6)
