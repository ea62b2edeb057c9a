import time
import jax, jax.numpy as jnp, numpy as np

N, M = 44_032, 16 * 44_032
rng = np.random.default_rng(0)
cnt_np = rng.integers(0, 16, N).astype(np.int32)
offsets = jnp.asarray(np.cumsum(cnt_np) - cnt_np)
cnt = jnp.asarray(cnt_np)
table = jnp.asarray(rng.integers(1, 2**20, N).astype(np.int32))

def timeit(name, f, x0, iters=10):
    x = f(x0); jax.block_until_ready(x)
    t0 = time.perf_counter()
    x = x0
    for _ in range(iters):
        x = f(x)          # dependency chain
    s = float(jnp.sum(x)) # force fetch
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:40s} {dt*1000:8.2f} ms   (sum {s:.1f})")

m = jnp.arange(M, dtype=jnp.int32)

@jax.jit
def f_searchsorted(x):
    q = (m + x[0].astype(jnp.int32)) % M
    return jnp.searchsorted(offsets, q, side="right").astype(jnp.int32)

timeit("searchsorted scan (chained)", f_searchsorted, m)

@jax.jit
def f_gather(x):
    s = jnp.clip(x, 0, N - 1)
    return table[s] + x % 7

timeit("gather 704k (chained)", f_gather, m % N)

@jax.jit
def f_sort(x):
    return jnp.sort(x ^ 12345)

timeit("sort 704k i32 (chained)", f_sort, m)

@jax.jit
def f_floordiv(x):
    w = jnp.maximum(x & 15, 1)
    j = x >> 4
    q = jnp.floor(j.astype(jnp.float32) / w.astype(jnp.float32)).astype(jnp.int32)
    return q + x

timeit("float-div 704k (chained)", f_floordiv, m)

@jax.jit
def f_intdiv(x):
    w = jnp.maximum(x & 15, 1)
    return (x >> 4) // w + (x >> 4) % w + x

timeit("int-div 704k (chained)", f_intdiv, m)

@jax.jit
def f_cumsum(x):
    return jnp.cumsum(x & 1) + x

timeit("cumsum 704k (chained)", f_cumsum, m)
