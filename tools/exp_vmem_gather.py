"""Probe: can Mosaic lower a dynamic per-lane row gather from VMEM?

If a Pallas kernel can do `table[idx]` (table (N,16) f32 VMEM-resident,
idx (KB,) i32) at VPU speed, the blend slab (per-duplicate record copy in
HBM) and its two M-scale XLA gathers become unnecessary: kernels would
gather rows on the fly from a 2.8 MB VMEM table.

Variants probed:
  A. jnp.take(table, idx, axis=0) inside the kernel
  B. table[idx] advanced indexing inside the kernel
  C. per-row fori_loop of dynamic slices (known-lowerable baseline)
Each is timed on a (4096, 128)-index gather per grid step over 512 steps
(= M=64k rows/call) and checked for correctness.
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 44_032
REC = 16
KB = 128
STEPS = 512          # gathered rows per call = STEPS * KB


ROWS = 8          # grid steps process 8*KB indices


def kernel_take(idx_ref, table_ref, out_ref):
    idx = idx_ref[:]                          # (ROWS, KB)
    flat = jnp.take(table_ref[:], idx.reshape(-1), axis=0)
    out_ref[:] = flat.reshape(ROWS, KB, REC)


def kernel_loop(idx_ref, table_ref, out_ref):
    def body(i, _):
        r = i // KB
        k = i % KB
        out_ref[r, k, :] = table_ref[idx_ref[r, k], :]
        return 0
    jax.lax.fori_loop(0, ROWS * KB, body, 0)


def build(kernel):
    return pl.pallas_call(
        kernel,
        grid=(STEPS // ROWS,),
        in_specs=[
            pl.BlockSpec((ROWS, KB), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N, REC), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ROWS, KB, REC), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((STEPS, KB, REC), jnp.float32),
    )


def main():
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.random((N, REC)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, N, (STEPS, KB)).astype(np.int32))
    want = np.asarray(table)[np.asarray(idx)]

    for name, kern in (("A jnp.take", kernel_take),
                       ("C row loop", kernel_loop)):
        try:
            fn = jax.jit(build(kern))
            got = np.asarray(fn(idx, table))
            ok = np.allclose(got, want)
            print(f"{name}: compiles, correct={ok}")
            if not ok:
                continue
            # device-true timing
            def body(c, fn=fn):
                o = fn(idx, table + c * 0)
                return jnp.sum(o[:, 0, 0]) * 1e-12
            for n_iters in (4, 24):
                f = jax.jit(lambda c, n=n_iters: jax.lax.fori_loop(
                    0, n, lambda i, c: body(c), c))
                float(f(jnp.asarray(0.0)))
            t = {}
            for n_iters in (4, 24):
                f = jax.jit(lambda c, n=n_iters: jax.lax.fori_loop(
                    0, n, lambda i, c: body(c), c))
                float(f(jnp.asarray(0.0)))
                best = float("inf")
                for _ in range(2):
                    t0 = time.perf_counter()
                    float(f(jnp.asarray(0.0)))
                    best = min(best, time.perf_counter() - t0)
                t[n_iters] = best
            per = (t[24] - t[4]) / 20
            rows = STEPS * KB
            print(f"   {per*1e3:.3f} ms / {rows} rows = "
                  f"{per*1e9/rows:.2f} ns/row")
        except Exception as e:
            print(f"{name}: FAILED — {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
