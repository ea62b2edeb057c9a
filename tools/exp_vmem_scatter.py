"""Microbench: in-kernel VMEM scatter-accumulate for the dup-grad reduction.

The CUDA rasterizer backward reduces per-duplicate gradients with in-kernel
atomicAdd. The TPU analogue: keep a (N1, 16) f32 accumulator resident in
VMEM scratch across the sequential grid and RMW one row per record with a
dynamic sublane index (rank DMA'd HBM->SMEM per block for scalar reads).
This measures the per-row RMW rate to decide whether that design can beat
the XLA sort+gather+cumsum reduction (~2.5 ms at M=352k).
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M = 352_256
KB = 128
MB = M // KB
REC = 16
N1 = 44_032

rng = np.random.default_rng(0)
g_rows = jnp.asarray(rng.random((MB, KB, REC)), jnp.float32)
ranks = jnp.asarray(rng.integers(0, N1, M).astype(np.int32))
ranks2d = ranks.reshape(MB, KB)


def kern(ranks_hbm, g_ref, out_ref, acc, rk, sem, *, unroll):
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    @pl.when(b % 8 == 0)
    def _():
        cp = pltpu.make_async_copy(
            ranks_hbm.at[pl.ds((b // 8) * 8, 8), :], rk, sem)
        cp.start()
        cp.wait()
    sub = b % 8

    def body(j, carry):
        for u in range(unroll):
            r = rk[sub, j + u]
            acc[u % 2, pl.ds(r, 1), :] += g_ref[0, pl.ds(j + u, 1), :]
        return carry

    jax.lax.fori_loop(0, KB // unroll, lambda i, c: body(i * unroll, c), 0,
                      unroll=False)

    @pl.when(b == MB - 1)
    def _():
        out_ref[:] = acc[0] + acc[1]


def run(unroll):
    f = pl.pallas_call(
        functools.partial(kern, unroll=unroll),
        grid=(MB,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec((1, KB, REC), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((N1, REC), lambda b: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((2, N1, REC), jnp.float32),
                        pltpu.SMEM((8, KB), jnp.int32),
                        pltpu.SemaphoreType.DMA],
        out_shape=jax.ShapeDtypeStruct((N1, REC), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )

    def wrapped(g, c):
        gg = g.at[0, 0, 0].add(c)
        return f(ranks2d, gg)

    # correctness check once
    out = jax.jit(wrapped)(g_rows, jnp.asarray(0.0))
    want = jax.ops.segment_sum(g_rows.reshape(M, REC), ranks,
                               num_segments=N1)
    err = float(jnp.max(jnp.abs(out - want)))
    print(f"unroll={unroll}  max err vs segment_sum: {err:.2e}", flush=True)

    for n_lo, n_hi in ((2, 8),):
        times = {}
        for n in (n_lo, n_hi):
            fn = jax.jit(lambda c, n=n: jax.lax.fori_loop(
                0, n, lambda i, c: c + jnp.sum(wrapped(g_rows, c)) * 1e-12,
                c))
            r = fn(jnp.asarray(0.0)); float(r)
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                float(fn(jnp.asarray(0.0)))
                best = min(best, time.perf_counter() - t0)
            times[n] = best
        per = (times[n_hi] - times[n_lo]) / (n_hi - n_lo)
        print(f"  vmem RMW reduce: {per*1000:8.3f} ms/iter "
              f"({per/M*1e9:.2f} ns/row)", flush=True)


for u in (4, 8, 16):
    run(u)
