"""One-off experiments for the bwd-reduction & binning-expand constants.

Times isolated XLA formulations on the TPU (device-true loop timing):
  gather row-major vs transposed source
  cumsum (M,16): jnp.cumsum vs blocked MXU triangular matmul
  elementwise expand arithmetic: (M,) 1-D vs (M/512, 512) 2-D
  sort: keys-only vs (key, iota) pair
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

M = 393_216
MB = M // 128

rng = np.random.default_rng(0)
g_row = jnp.asarray(rng.random((M, 16)), jnp.float32)           # row-major
g_blocks = jnp.asarray(rng.random((MB, 16, 128)), jnp.float32)  # kernel layout
perm = jnp.asarray(rng.permutation(M).astype(np.int32))
bounds = jnp.asarray(np.sort(rng.integers(0, M, 44_033)).astype(np.int32))


def device_time(name, body, init, n_lo=4, n_hi=24):
    times = {}
    for n in (n_lo, n_hi):
        f = jax.jit(lambda c, n=n: jax.lax.fori_loop(
            0, n, lambda i, c: body(c), c))
        r = f(init)
        float(jnp.sum(r))
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            r = f(init)
            float(jnp.sum(r))
            best = min(best, time.perf_counter() - t0)
        times[n] = best
    per = (times[n_hi] - times[n_lo]) / (n_hi - n_lo)
    print(f"{name:52s} {per*1000:8.3f} ms/iter", flush=True)
    return per


# 1. gather from the kernel's transposed layout (current behavior)
def gather_transposed(c):
    src = (g_blocks + c).transpose(0, 2, 1).reshape(M, 16)
    return jnp.sum(src[perm]) * 1e-12


device_time("gather (M,16) from (Mb,16,KB) transposed src", gather_transposed,
            jnp.asarray(0.0))


# 2. gather from a row-major source
def gather_row(c):
    return jnp.sum((g_row + c)[perm]) * 1e-12


device_time("gather (M,16) row-major src", gather_row, jnp.asarray(0.0))


# 3. jnp.cumsum + bounds diff (current)
def cumsum_plain(c):
    cs = jnp.cumsum(g_row + c, axis=0)
    csz = jnp.concatenate([jnp.zeros((1, 16), jnp.float32), cs], axis=0)
    d = csz[bounds[1:]] - csz[bounds[:-1]]
    return jnp.sum(d) * 1e-12


device_time("segment sums: jnp.cumsum + bounds diff", cumsum_plain,
            jnp.asarray(0.0))


# 4. blocked MXU cumsum + bounds diff
L = jnp.tril(jnp.ones((128, 128), jnp.float32))


def cumsum_mxu(c):
    x = (g_row + c).reshape(MB, 128, 16)
    within = jax.lax.dot_general(
        L, x, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)      # (128, MB, 16)
    within = jnp.swapaxes(within, 0, 1)           # (MB, 128, 16)
    bsum = jnp.sum(x, axis=1)                     # (MB, 16)
    bpre = jnp.cumsum(bsum, axis=0) - bsum        # exclusive
    cs = (within + bpre[:, None, :]).reshape(M, 16)
    csz = jnp.concatenate([jnp.zeros((1, 16), jnp.float32), cs], axis=0)
    d = csz[bounds[1:]] - csz[bounds[:-1]]
    return jnp.sum(d) * 1e-12


device_time("segment sums: MXU tri-matmul blocked cumsum", cumsum_mxu,
            jnp.asarray(0.0))


# 5. expand arithmetic 1-D vs 2-D
j1 = jnp.asarray(rng.integers(0, 600, M).astype(np.int32))
w1 = jnp.asarray(rng.integers(1, 25, M).astype(np.int32))
r1 = 1.0 / w1.astype(jnp.float32)


def expand_1d(c):
    j = j1 + c
    q = jnp.floor(j.astype(jnp.float32) * r1).astype(jnp.int32)
    r = j - q * w1
    q = jnp.where(r < 0, q - 1, jnp.where(r >= w1, q + 1, q))
    r = jnp.where(r < 0, r + w1, jnp.where(r >= w1, r - w1, r))
    key = ((r * 25 + q) << 16) | jnp.minimum(j, 65535)
    return jnp.sum(key) % 1000


device_time("expand arith (M,) 1-D", expand_1d, jnp.asarray(0, jnp.int32))

j2 = j1.reshape(-1, 512)
w2 = w1.reshape(-1, 512)
r2 = r1.reshape(-1, 512)


def expand_2d(c):
    j = j2 + c
    q = jnp.floor(j.astype(jnp.float32) * r2).astype(jnp.int32)
    r = j - q * w2
    q = jnp.where(r < 0, q - 1, jnp.where(r >= w2, q + 1, q))
    r = jnp.where(r < 0, r + w2, jnp.where(r >= w2, r - w2, r))
    key = ((r * 25 + q) << 16) | jnp.minimum(j, 65535)
    return jnp.sum(key) % 1000


device_time("expand arith (M/512, 512) 2-D", expand_2d,
            jnp.asarray(0, jnp.int32))


# 6. sorts
keys = jnp.asarray(rng.integers(0, 2 ** 30, M).astype(np.int32))
iota = jnp.arange(M, dtype=jnp.int32)


def sort_keys(c):
    return jnp.sum(jnp.sort(keys + c)) % 1000


device_time("sort keys-only (M,) i32", sort_keys, jnp.asarray(0, jnp.int32))


def sort_pair(c):
    a, b = jax.lax.sort((keys + c, iota), num_keys=1)
    return (jnp.sum(a) + jnp.sum(b)) % 1000


device_time("sort (key, iota) pair", sort_pair, jnp.asarray(0, jnp.int32))


# 7. cumsum of int marks 1-D vs 2-D (the expand's src construction)
marks = jnp.asarray((rng.random(M) < 0.11).astype(np.int32))


def marks_1d(c):
    return jnp.sum(jnp.cumsum(marks + c * 0)) % 1000


device_time("cumsum marks (M,) 1-D", marks_1d, jnp.asarray(0, jnp.int32))


def marks_2d(c):
    m2 = (marks + c * 0).reshape(-1, 512)
    within = jnp.cumsum(m2, axis=1)
    rowsum = within[:, -1]
    pre = jnp.cumsum(rowsum) - rowsum
    return jnp.sum(within + pre[:, None]) % 1000


device_time("cumsum marks (M/512,512) 2-D rows+carry", marks_2d,
            jnp.asarray(0, jnp.int32))
