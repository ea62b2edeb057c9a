"""MEASURE multi-chip scaling on real hardware (real-slice-day harness).

`tools/scaling_model.py` quantifies scaling from measured collective BYTES
plus a ring-bandwidth model — the best evidence a single chip can produce.
This tool is its measurement counterpart, ready for the day a multi-chip
slice exists: it runs the actual sharded flagship steps at every divisor
device count and reports device-true per-step times + scaling efficiency,
replacing the modeled numbers (and validating the model's overlap claim —
whether XLA really hides the splat all-gather behind the blend).

  python tools/measure_scaling.py [--k 8] [--cap 44032] [--res 400]

On a single-chip host it exits with a message (nothing to measure). On a
CPU host it runs the 8-virtual-device mesh purely as a code-path check
(CPU timings are meaningless for efficiency claims and are labeled so).

Timing: steps chain on-device inside one fori_loop, two loop lengths
differenced (see tools/profile_true.py — block_until_ready does not
synchronize through the axon tunnel).
"""
from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def build_scene(cap, k, res):
    from d3gs_tpu.config import (ModelParams, OptimizationParams,
                                 PipelineParams)
    from d3gs_tpu.data.cameras import Camera, stack_cameras
    from d3gs_tpu.models import gaussians as G
    from d3gs_tpu.models.deform import create_deform_field
    from d3gs_tpu.ops.camera_math import perspective_projection, world_to_view
    from d3gs_tpu.train.flagship import pick_field_spec

    n = cap - 900
    rng = np.random.default_rng(0)
    pts = (rng.random((n, 3)) * 2.6 - 1.3).astype(np.float32)
    cols = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    state = G.create_from_pcd(pts, cols, sh_degree=3, capacity=cap,
                              spatial_lr_scale=4.0)
    state = state.replace(
        active_sh_degree=jnp.asarray(3, jnp.int32),
        params=state.params._replace(opacity=jnp.full((cap, 1), 0.5)))
    fov = math.radians(60)
    P = perspective_projection(0.01, 100.0, fov, fov).T
    cams = []
    for i in range(k):
        V = world_to_view(np.eye(3),
                          np.array([0.1 * i, -0.1 * i, 4.0 + 0.2 * i])).T
        cams.append(Camera(
            viewmatrix=jnp.asarray(V, jnp.float32),
            projmatrix=jnp.asarray(V @ P, jnp.float32),
            campos=jnp.asarray(np.linalg.inv(V)[3, :3], jnp.float32),
            fid=jnp.asarray(i / max(k - 1, 1)),
            image=jnp.asarray(rng.random((res, res, 3)), jnp.float32),
            width=res, height=res, fovx=fov, fovy=fov))
    model_cfg = ModelParams(is_blender=True)
    opt_cfg = OptimizationParams(num_cams_per_iter=k)
    pipe_cfg = PipelineParams(dup_capacity=8 * n)
    spec = pick_field_spec(model_cfg, opt_cfg)
    dstate, field = create_deform_field(spec, jax.random.PRNGKey(0), opt_cfg)
    return (state, dstate, field, stack_cameras(cams), model_cfg, opt_cfg,
            pipe_cfg)


def time_step(step, state, dstate, batch, n_lo=2, n_hi=8):
    key = jax.random.PRNGKey(0)
    bg = jnp.zeros(3)
    times = {}
    for n in (n_lo, n_hi):
        @jax.jit
        def run(st, dst, n=n):
            def body(i, c):
                s, d, it = c
                s2, d2, *_ = step(s, d, batch, 3001.0 + it, key, bg)
                return (s2, d2, it + 1.0)
            return jax.lax.fori_loop(0, n, body,
                                     (st, dst, jnp.asarray(0.0)))
        out = run(state, dstate)
        float(jnp.sum(out[0].params.xyz))
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            out = run(state, dstate)
            float(jnp.sum(out[0].params.xyz))
            best = min(best, time.perf_counter() - t0)
        times[n] = best
    return (times[n_hi] - times[n_lo]) / (n_hi - n_lo)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--cap", type=int, default=44_032)
    ap.add_argument("--res", type=int, default=400)
    args = ap.parse_args()

    backend = jax.default_backend()
    n_dev = jax.device_count()
    if backend != "tpu" and n_dev < 2:
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                                   " --xla_force_host_platform_device_count=8")
        print("single CPU device: re-run with the env var above for a "
              "code-path check")
        return
    if backend == "tpu" and n_dev < 2:
        print(f"only {n_dev} TPU chip visible — nothing to measure; "
              "run this on a multi-chip slice (the modeled numbers live "
              "in parallel/COMMS.md / tools/scaling_model.py)")
        return
    label = "device-true" if backend == "tpu" else \
        "CPU CODE-PATH CHECK (timings NOT meaningful for efficiency)"
    print(f"backend={backend} devices={n_dev}: {label}")

    from d3gs_tpu.parallel.mesh import (make_mesh, replicate,
                                        shard_gaussian_state)
    from d3gs_tpu.parallel.sharded import (make_flagship_camera_parallel_step,
                                           make_flagship_gauss_tile_step)
    from d3gs_tpu.train.flagship import make_batched_step

    (state, dstate, field, batch, model_cfg, opt_cfg,
     pipe_cfg) = build_scene(args.cap, args.k, args.res)

    single = make_batched_step(
        opt_cfg=opt_cfg, pipe_cfg=pipe_cfg, model_cfg=model_cfg, field=field,
        update_gaussians=True, update_deform=True, use_deform=True)
    t1 = time_step(single, state, dstate, batch)
    print(f"D=1 single-chip flagship: {t1*1000:8.2f} ms/iter")

    divs = [d for d in (2, 4, 8, 16, 32) if d <= n_dev and args.k % d == 0]
    for d in divs:
        mesh = make_mesh(jax.devices()[:d])
        for mode, mk in (("camera", make_flagship_camera_parallel_step),
                         ("gauss_tile", make_flagship_gauss_tile_step)):
            kw = dict(mesh=mesh, opt_cfg=opt_cfg, pipe_cfg=pipe_cfg,
                      model_cfg=model_cfg, field=field, use_deform=True)
            if mode == "gauss_tile":
                kw.update(width=args.res, height=args.res)
                st_d = shard_gaussian_state(state, mesh)
                dst_d = replicate(dstate, mesh)
            else:
                st_d = replicate(state, mesh)
                dst_d = replicate(dstate, mesh)
            step = mk(**kw)
            td = time_step(step, st_d, dst_d, batch)
            eff = t1 / (td * d)
            print(f"D={d} {mode:10s}: {td*1000:8.2f} ms/iter  "
                  f"efficiency={eff:5.2f}")
            print(json.dumps({"layout": mode, "devices": d,
                              "ms_per_iter": round(td * 1000, 3),
                              "efficiency": round(eff, 4),
                              "measured": backend == "tpu"}))


if __name__ == "__main__":
    main()
