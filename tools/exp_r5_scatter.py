"""A/B: two s32 scatters vs one complex64 scatter for the binning expand
(dev tool)."""
import time

import jax
import jax.numpy as jnp
import numpy as np

N = 44_032
M = 352_256

rng = np.random.default_rng(0)
tgt = jnp.asarray(np.sort(rng.choice(M, N, replace=False)), jnp.int32)
dpk = jnp.asarray(rng.integers(-(2**20), 2**20, N), jnp.int32)


def device_time(name, f, n_lo=8, n_hi=48):
    times = {}
    for n in (n_lo, n_hi):
        fj = jax.jit(lambda c, n=n: jax.lax.fori_loop(
            0, n, lambda i, c: jnp.sum(f(c)) * 1e-9 + c * 0, c))
        r = fj(jnp.asarray(0.0))
        float(r)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(fj(jnp.asarray(0.0)))
            best = min(best, time.perf_counter() - t0)
        times[n] = best
    per = (times[n_hi] - times[n_lo]) / (n_hi - n_lo)
    print(f"{name:40s} {per*1000:8.3f} ms/iter", flush=True)


def two_scatters(c):
    t = tgt + jnp.int32(c * 0)
    marks = jnp.zeros((M,), jnp.int32).at[t].add(1, mode="drop")
    geo = jnp.zeros((M,), jnp.int32).at[t].add(dpk, mode="drop")
    return marks + geo


def c64_scatter(c):
    t = tgt + jnp.int32(c * 0)
    val = jax.lax.complex(jnp.ones((N,), jnp.float32),
                          dpk.astype(jnp.float32))
    z = jnp.zeros((M,), jnp.complex64).at[t].add(val, mode="drop")
    return jnp.real(z).astype(jnp.int32) + jnp.imag(z).astype(jnp.int32)


def f32x2_scatter(c):
    """one scatter of (N, 2) f32 rows."""
    t = tgt + jnp.int32(c * 0)
    val = jnp.stack([jnp.ones((N,), jnp.float32),
                     dpk.astype(jnp.float32)], axis=1)
    z = jnp.zeros((M, 2), jnp.float32).at[t].add(val, mode="drop")
    return z[:, 0].astype(jnp.int32) + z[:, 1].astype(jnp.int32)


device_time("two s32 scatters", two_scatters)
device_time("one c64 scatter", c64_scatter)
device_time("one (N,2) f32 row scatter", f32x2_scatter)
