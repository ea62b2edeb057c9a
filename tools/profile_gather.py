import time
import jax, jax.numpy as jnp, numpy as np

N, M = 44_032, 16 * 44_032
T, K = 640, 1024
rng = np.random.default_rng(0)
table1 = jnp.asarray(rng.random(N).astype(np.float32))
table16 = jnp.asarray(rng.random((N, 16)).astype(np.float32))
tableM = jnp.asarray(rng.random(M).astype(np.float32))
idx_rand = jnp.asarray(rng.integers(0, N, M).astype(np.int32))
idx_mono = jnp.sort(idx_rand)
starts = jnp.asarray(np.sort(rng.integers(0, M - K, T)).astype(np.int32))
keys = jnp.asarray(rng.integers(0, 2**30, M).astype(np.int32))
pay1 = jnp.asarray(rng.random(M).astype(np.float32))
pay2 = jnp.asarray(rng.random(M).astype(np.float32))
pay3 = jnp.asarray(rng.random(M).astype(np.float32))
ITERS = 10

def bench(name, fn, *args):
    @jax.jit
    def run(*a):
        def body(i, acc):
            return acc + fn(*a, acc)
        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0))
    v = float(run(*args))
    t0 = time.perf_counter()
    v = float(run(*args))
    print(f"{name:42s} {(time.perf_counter()-t0)/ITERS*1000:8.2f} ms (v {v:.1f})")

bench("gather 704k rand from (44k,)",
      lambda t, i, acc: jnp.sum(t[(i + acc.astype(jnp.int32)) % N]) * 1e-9,
      table1, idx_rand)
bench("gather 704k monotone from (44k,)",
      lambda t, i, acc: jnp.sum(t[jnp.minimum(i + acc.astype(jnp.int32), N-1)]) * 1e-9,
      table1, idx_mono)
bench("gather 704k rows from (44k,16)",
      lambda t, i, acc: jnp.sum(t[(i + acc.astype(jnp.int32)) % N]) * 1e-9,
      table16, idx_rand)
bench("contig-run gather (640,1024) from 704k",
      lambda t, s, acc: jnp.sum(
          t[jnp.clip(s[:, None] + jnp.arange(K)[None, :] +
                     acc.astype(jnp.int32), 0, M - 1)]) * 1e-9,
      tableM, starts)
bench("sort keys only 704k",
      lambda k, acc: jnp.sum(jnp.sort(k ^ acc.astype(jnp.int32))) * 1e-12,
      keys)
def sort_payload(k, p1, p2, p3, acc):
    out = jax.lax.sort((k ^ acc.astype(jnp.int32), p1, p2, p3), num_keys=1)
    return (jnp.sum(out[1]) + jnp.sum(out[3])) * 1e-9
bench("sort 704k + 3 f32 payloads", sort_payload, keys, pay1, pay2, pay3)
def argsort_gather(k, p1, p2, p3, acc):
    o = jnp.argsort(k ^ acc.astype(jnp.int32))
    return (jnp.sum(p1[o]) + jnp.sum(p2[o]) + jnp.sum(p3[o])) * 1e-9
bench("argsort 704k + 3 gathers", argsort_gather, keys, pay1, pay2, pay3)
