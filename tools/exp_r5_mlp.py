"""A/B: deform-MLP fwd+bwd cost vs activation/matmul precision (dev tool).

The round-5 per-stage table attributes ~3.0 ms/step to the deform MLP
fwd+bwd — the single largest stage. With f32 activations the stage sits
at its HBM bandwidth floor (~2.2 GB of activation traffic across fwd /
dgrad / wgrad at N=44k, W=256, D=8), so the only levers are (a) the
matmul pass count (f32 inputs may compile to multi-pass bf16 on the MXU
depending on the default precision) and (b) activation storage bytes
(bf16 halves every stream).

Variants:
  f32/default     — the shipping config
  f32/bf16-mm     — f32 activations, default_matmul_precision('bfloat16')
                    (single-pass bf16 inputs, f32 accumulate)
  f32/highest-mm  — f32 activations, 6-pass bf16 (reference precision)
  bf16            — spec.compute_dtype='bfloat16' (the opt-in)
"""
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from d3gs_tpu.models.deform import DeformFieldSpec, create_deform_field

N = 43_132
CAP = 44_032

rng = np.random.default_rng(0)
xyz = jnp.asarray((rng.random((CAP, 3)) * 2.6 - 1.3).astype(np.float32))
fid = jnp.asarray(0.5)


def device_time(name, make_body, n_lo=4, n_hi=24):
    times = {}
    for n in (n_lo, n_hi):
        body, init = make_body()
        f = jax.jit(lambda c, n=n, body=body: jax.lax.fori_loop(
            0, n, lambda i, c: body(c), c))
        r = f(init)
        float(jnp.sum(r))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            r = f(init)
            float(jnp.sum(r))
            best = min(best, time.perf_counter() - t0)
        times[n] = best
    per = (times[n_hi] - times[n_lo]) / (n_hi - n_lo)
    print(f"{name:44s} {per*1000:8.3f} ms/iter", flush=True)
    return per


def run(tag, compute_dtype, precision):
    spec = DeformFieldSpec(kind="baseline", is_blender=True,
                           compute_dtype=compute_dtype)
    dstate, field = create_deform_field(spec, jax.random.PRNGKey(0))
    params = dstate.params

    def loss_fn(p, x):
        dx, dr, ds = field.step(p, x, fid)
        return (jnp.sum(dx * dx) + jnp.sum(dr * dr) + jnp.sum(ds * ds))

    def mk_fwd():
        def body(c):
            with jax.default_matmul_precision(precision):
                dx, dr, ds = field.step(params, xyz + c * 0, fid)
            return jnp.sum(dx) * 1e-9
        return body, jnp.asarray(0.0)

    def mk_fwdbwd():
        def body(c):
            with jax.default_matmul_precision(precision):
                l, (gp, gx) = jax.value_and_grad(loss_fn, argnums=(0, 1))(
                    params, xyz + c * 0)
            acc = sum(jnp.sum(g).astype(jnp.float32)
                      for g in jax.tree.leaves(gp))
            return (l + acc + jnp.sum(gx)) * 1e-9
        return body, jnp.asarray(0.0)

    device_time(f"{tag} fwd", mk_fwd)
    device_time(f"{tag} fwd+bwd", mk_fwdbwd)


if __name__ == "__main__":
    run("f32/default ", "float32", "default")
    run("f32/bf16-mm ", "float32", "bfloat16")
    run("f32/highest ", "float32", "highest")
    run("bf16        ", "bfloat16", "default")
