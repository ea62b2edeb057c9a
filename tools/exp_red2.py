"""A/B the bwd duplicate-gradient reduction formulations at bench scale.

old: stable sort (rank, iota) -> row gather -> blocked tri cumsum -> diff
new: 17-operand payload sort -> channel-plane cumsum -> transpose -> diff
plus isolation variants to attribute the new path's cost.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

M = 352_256
KB = 128
MB = M // KB
REC = 16
N1 = 44_033

rng = np.random.default_rng(0)
g_all = jnp.asarray(rng.random((MB, REC, KB)), jnp.float32)
rank_pad = jnp.asarray(rng.integers(0, N1, M).astype(np.int32))
rank_bounds = jnp.asarray(
    np.sort(rng.integers(0, M, N1)).astype(np.int32))
tri_lo = jnp.tril(jnp.ones((KB, KB), jnp.float32))
tri_up = jnp.triu(jnp.ones((KB, KB), jnp.float32))
bounds = jnp.concatenate([rank_bounds, jnp.full((1,), M, jnp.int32)])


def device_time(name, body, n_lo=4, n_hi=16):
    times = {}
    for n in (n_lo, n_hi):
        f = jax.jit(lambda c, n=n: jax.lax.fori_loop(
            0, n, lambda i, c: body(c), c))
        r = f(jnp.asarray(0.0))
        float(jnp.sum(r))
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            r = f(jnp.asarray(0.0))
            float(jnp.sum(r))
            best = min(best, time.perf_counter() - t0)
        times[n] = best
    per = (times[n_hi] - times[n_lo]) / (n_hi - n_lo)
    print(f"{name:52s} {per*1000:8.3f} ms/iter", flush=True)
    return per


def old_red(c):
    g = g_all.at[0, 0, 0].add(c)
    g_flat = g.transpose(0, 2, 1).reshape(M, REC)
    iota = jnp.arange(M, dtype=jnp.int32)
    _, invperm = jax.lax.sort((rank_pad, iota), num_keys=1)
    g_dd = g_flat[invperm]
    g3 = g_dd.reshape(MB, KB, REC)
    within = jax.lax.dot_general(
        tri_lo, g3, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)
    within = jnp.swapaxes(within, 0, 1)
    bsum = g3.sum(axis=1)
    bpre = jnp.cumsum(bsum, axis=0) - bsum
    cs = (within + bpre[:, None, :]).reshape(M, REC)
    csz = jnp.concatenate([jnp.zeros((1, REC), jnp.float32), cs], axis=0)
    d_rec = csz[bounds[1:]] - csz[bounds[:-1]]
    return jnp.sum(d_rec) * 1e-12


def new_red(c):
    g = g_all.at[0, 0, 0].add(c)
    cols = tuple(g[:, ch, :].reshape(M) for ch in range(REC))
    sorted_ops = jax.lax.sort((rank_pad,) + cols, num_keys=1,
                              is_stable=False)
    g3 = jnp.stack(sorted_ops[1:], axis=0).reshape(REC, MB, KB)
    within = jax.lax.dot_general(
        g3, tri_up, (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGH)
    bsum = g3.sum(axis=2)
    bpre = jnp.cumsum(bsum, axis=1) - bsum
    cs = (within + bpre[:, :, None]).reshape(REC, M)
    csz = jnp.concatenate(
        [jnp.zeros((1, REC), jnp.float32), cs.T], axis=0)
    d_rec = csz[bounds[1:]] - csz[bounds[:-1]]
    return jnp.sum(d_rec) * 1e-12


def sort_only(c):
    g = g_all.at[0, 0, 0].add(c)
    cols = tuple(g[:, ch, :].reshape(M) for ch in range(REC))
    sorted_ops = jax.lax.sort((rank_pad,) + cols, num_keys=1,
                              is_stable=False)
    return sum(jnp.sum(o) for o in sorted_ops[1:]) * 1e-12


def sort_stack(c):
    g = g_all.at[0, 0, 0].add(c)
    cols = tuple(g[:, ch, :].reshape(M) for ch in range(REC))
    sorted_ops = jax.lax.sort((rank_pad,) + cols, num_keys=1,
                              is_stable=False)
    g3 = jnp.stack(sorted_ops[1:], axis=0)
    return jnp.sum(g3[:, ::7]) * 1e-12


def no_transpose(c):
    g = g_all.at[0, 0, 0].add(c)
    cols = tuple(g[:, ch, :].reshape(M) for ch in range(REC))
    sorted_ops = jax.lax.sort((rank_pad,) + cols, num_keys=1,
                              is_stable=False)
    g3 = jnp.stack(sorted_ops[1:], axis=0).reshape(REC, MB, KB)
    within = jax.lax.dot_general(
        g3, tri_up, (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGH)
    bsum = g3.sum(axis=2)
    bpre = jnp.cumsum(bsum, axis=1) - bsum
    cs = (within + bpre[:, :, None]).reshape(REC, M)
    return jnp.sum(cs[:, ::7]) * 1e-12


device_time("OLD: sort+iota, gather, cumsum, diff", old_red)
device_time("NEW: 17-op sort, plane cumsum, T, diff", new_red)
device_time("  17-op sort only (+slices)", sort_only)
device_time("  17-op sort + stack", sort_stack)
device_time("  NEW minus final transpose/diff", no_transpose)
