import time
import jax, jax.numpy as jnp, numpy as np

N, M = 44_032, 16 * 44_032
rng = np.random.default_rng(0)
cnt = rng.integers(0, 30, N).astype(np.int32)
offsets = jnp.asarray(np.cumsum(cnt) - cnt)
table = jnp.asarray(rng.integers(0, 2**29, N).astype(np.int32))

def timeit(name, f, *args, iters=10):
    out = f(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters): out = f(*args)
    jax.block_until_ready(out)
    print(f"{name:36s} {(time.perf_counter()-t0)/iters*1000:8.2f} ms")
    return out

m = jnp.arange(M, dtype=jnp.int32)
for method in ["scan", "scan_unrolled", "sort", "compare_all"]:
    if method == "compare_all":
        continue
    timeit(f"searchsorted[{method}]",
           jax.jit(lambda o, mm, meth=method: jnp.searchsorted(
               o, mm, side="right", method=meth)), offsets, m)

src = jnp.clip(jnp.searchsorted(offsets, m, side="right") - 1, 0, N - 1)
timeit("gather 704k from 44k (int32)",
       jax.jit(lambda t, s: t[s]), table, src)
timeit("4x gather 704k",
       jax.jit(lambda t, s: (t[s], t[s] + t[s], (t * 2)[s], (t + 1)[s])), table, src)

# mark + cumsum alternative for src
@jax.jit
def mark_cumsum(offsets, cnt_):
    tgt = jnp.where(cnt_ > 0, offsets, M)
    mark = jnp.zeros(M, jnp.int32).at[tgt].add(1, mode="drop")
    return jnp.cumsum(mark) - 1
timeit("mark+cumsum src", mark_cumsum, offsets, jnp.asarray(cnt))

# cummax segment-start fill (int32)
@jax.jit
def cummax_fill(offsets, cnt_):
    tgt = jnp.where(cnt_ > 0, offsets, M)
    seed = jnp.full(M, -1, jnp.int32).at[tgt].max(
        jnp.arange(N, dtype=jnp.int32), mode="drop")
    return jax.lax.cummax(seed)
timeit("scatter+cummax fill", cummax_fill, offsets, jnp.asarray(cnt))
