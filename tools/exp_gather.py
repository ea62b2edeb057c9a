"""Microbench: TPU gather/sort cost models at the bench M-scale.

Anti-folding: each iteration perturbs ONE element of the gathered table (or
adds the carry to every sort key) so XLA cannot hoist the op out of the
timing loop — the first version of this benchmark used `x * 0` and produced
hoisted (zero-cost) sorts and a bogus 30x-fast 1-channel gather.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

M = 393_216
N = 44_032

rng = np.random.default_rng(0)
perm = jnp.asarray(rng.permutation(M).astype(np.int32))
idx_n = jnp.asarray(rng.integers(0, N, M).astype(np.int32))


def device_time(name, make_body, n_lo=4, n_hi=24):
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


for c, cidx in ((1, None), (8, None), (10, None), (16, None)):
    g0 = jnp.asarray(rng.random((M, c)), jnp.float32)

    def mk(g0=g0):
        def body(x):
            g = g0.at[0, 0].add(x)          # tiny dep: defeats hoisting
            return jnp.sum(g[perm]) * 1e-12
        return body, jnp.asarray(0.0)

    device_time(f"(M,{c}) f32 row gather (M-table)", mk)

tab = jnp.asarray(rng.random((N, 16)), jnp.float32)


def mk_tab():
    def body(x):
        t = tab.at[0, 0].add(x)
        return jnp.sum(t[idx_n]) * 1e-12
    return body, jnp.asarray(0.0)


device_time("(M,) gather of (N,16) rows", mk_tab)

tab1 = jnp.asarray(rng.random(N), jnp.float32)


def mk_tab1():
    def body(x):
        t = tab1.at[0].add(x)
        return jnp.sum(t[idx_n]) * 1e-12
    return body, jnp.asarray(0.0)


device_time("(M,) 1-ch f32 gather from (N,) table", mk_tab1)

flat1 = jnp.asarray(rng.random(M), jnp.float32)


def mk_flat1():
    def body(x):
        t = flat1.at[0].add(x)
        return jnp.sum(t[perm]) * 1e-12
    return body, jnp.asarray(0.0)


device_time("(M,) 1-ch f32 gather from (M,) table", mk_flat1)

keys = jnp.asarray(rng.integers(0, 2**24, M).astype(np.int32))
pay = jnp.asarray(rng.random((M, 16)), jnp.float32)


def mk_sort_only():
    def body(x):
        out = jnp.sort(keys + x.astype(jnp.int32))
        return jnp.sum(out).astype(jnp.float32) * 1e-12
    return body, jnp.asarray(0.0)


device_time("sort keys only", mk_sort_only)


def mk_sort_iota():
    def body(x):
        _, inv = jax.lax.sort((keys + x.astype(jnp.int32),
                               jnp.arange(M, dtype=jnp.int32)), num_keys=1)
        return jnp.sum(inv).astype(jnp.float32) * 1e-12
    return body, jnp.asarray(0.0)


device_time("sort keys + iota payload", mk_sort_iota)


def mk_sort_pay(k):
    ops = [pay[:, i] for i in range(k)]

    def body(x):
        out = jax.lax.sort([keys + x.astype(jnp.int32)] + ops, num_keys=1)
        return jnp.sum(out[1]) * 1e-12
    return lambda: (body, jnp.asarray(0.0))


device_time("sort keys + 4 f32 payloads", mk_sort_pay(4))
device_time("sort keys + 10 f32 payloads", mk_sort_pay(10))
device_time("sort keys + 16 f32 payloads", mk_sort_pay(16))


def mk_argsort_n():
    d = jnp.asarray(rng.random(N), jnp.float32)

    def body(x):
        o = jnp.argsort(d + x)
        return jnp.sum(o).astype(jnp.float32) * 1e-12
    return body, jnp.asarray(0.0)


device_time("argsort (N,) f32", mk_argsort_n)
