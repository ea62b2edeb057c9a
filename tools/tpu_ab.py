"""In-process A/B of train-step variants on the device-true timing loop.

Run-to-run sigma across processes is 4-8% on the tunnel, so flag decisions
(e.g. tight_cull) must be measured in ONE process, interleaved
(A, B, A, B) with the fori-loop chaining methodology bench.py uses.

  python tools/tpu_ab.py                     # bench-scale, all variants
  python tools/tpu_ab.py --size 64 --n 2048  # tiny smoke (CPU-safe)
  python tools/tpu_ab.py --variants base tight_cull

Prints one JSON line per variant: {"variant", "ms_per_step", "vs_base"}.
"""
from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

VARIANTS = {
    "base": {},
    "tight_cull": {"tight_cull": True},
    "highest": {"train_matmul_precision": "highest"},
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=400)
    ap.add_argument("--n", type=int, default=43_132)
    ap.add_argument("--iters", type=int, default=20,
                    help="timed steps per measurement (plus a 3-step base)")
    ap.add_argument("--reps", type=int, default=3,
                    help="interleaved measurement rounds per variant")
    ap.add_argument("--variants", nargs="*", default=list(VARIANTS))
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from d3gs_tpu.config import OptimizationParams, PipelineParams
    from d3gs_tpu.data.cameras import Camera
    from d3gs_tpu.models import gaussians as G
    from d3gs_tpu.models.deform import DeformFieldSpec, create_deform_field
    from d3gs_tpu.ops.camera_math import (perspective_projection,
                                          world_to_view)
    from d3gs_tpu.train.step import make_train_step

    size, n = args.size, args.n
    cap = -(-n // 1024) * 1024
    rng = np.random.default_rng(0)
    pts = (rng.random((n, 3)) * 2.6 - 1.3).astype(np.float32)
    cols = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    state = G.create_from_pcd(pts, cols, sh_degree=3, capacity=cap,
                              spatial_lr_scale=4.0)
    state = state.replace(
        active_sh_degree=jnp.asarray(3, jnp.int32),
        params=state.params._replace(
            opacity=jnp.full((cap, 1), 0.5, jnp.float32)))
    V = world_to_view(np.eye(3), np.array([0.0, 0.0, 4.0])).T
    fov = math.radians(60)
    P = perspective_projection(0.01, 100.0, fov, fov).T
    cam = Camera(
        viewmatrix=jnp.asarray(V, jnp.float32),
        projmatrix=jnp.asarray(V @ P, jnp.float32),
        campos=jnp.asarray(np.linalg.inv(V)[3, :3], jnp.float32),
        fid=jnp.asarray(0.5),
        image=jnp.asarray(rng.random((size, size, 3)), jnp.float32),
        width=size, height=size, fovx=fov, fovy=fov)
    spec = DeformFieldSpec(kind="baseline", is_blender=True)
    dstate, field = create_deform_field(spec, jax.random.PRNGKey(0))
    opt_cfg = OptimizationParams()
    bg = jnp.zeros(3)
    key = jax.random.PRNGKey(0)

    def deform_fn(d_params, xyz, fid, iteration, k):
        return field.step(d_params, xyz, fid)

    def build(overrides):
        pipe = dict(tile_capacity=1024 if size >= 256 else 256,
                    tile_chunk=25 if size >= 256 else 8,
                    dup_capacity=393_216 if size >= 256 else 65_536)
        pipe.update(overrides)
        pipe_cfg = PipelineParams(**pipe)
        step = make_train_step(opt_cfg=opt_cfg, pipe_cfg=pipe_cfg,
                               deform_fn=deform_fn,
                               deform_update_fn=field.update, donate=False)

        def make_loop(n_iters):
            def body(carry):
                st, dst, it = carry
                st2, dst2, aux = step(st, dst, cam, 3001.0 + it, key, bg)
                return (st2, dst2, it + 1.0)
            return jax.jit(lambda c, k=n_iters: jax.lax.fori_loop(
                0, k, lambda i, c: body(c), c))
        return make_loop(3), make_loop(3 + args.iters)

    init = (state, dstate, jnp.asarray(0.0))
    loops = {v: build(VARIANTS[v]) for v in args.variants}
    # compile + warm every loop first
    for v, (lo, hi) in loops.items():
        float(jnp.sum(lo(init)[0].params.xyz))
        float(jnp.sum(hi(init)[0].params.xyz))
        print(f"# compiled {v}", file=sys.stderr)

    best = {v: float("inf") for v in args.variants}
    for _ in range(args.reps):                 # interleave variants
        for v, (lo, hi) in loops.items():
            t0 = time.perf_counter()
            float(jnp.sum(lo(init)[0].params.xyz))
            t_lo = time.perf_counter() - t0
            t0 = time.perf_counter()
            float(jnp.sum(hi(init)[0].params.xyz))
            t_hi = time.perf_counter() - t0
            best[v] = min(best[v], (t_hi - t_lo) / args.iters)

    base_ms = best.get("base", next(iter(best.values()))) * 1e3
    for v in args.variants:
        ms = best[v] * 1e3
        print(json.dumps({"variant": v, "ms_per_step": round(ms, 3),
                          "vs_base": round(ms / base_ms, 4)}))


if __name__ == "__main__":
    main()
