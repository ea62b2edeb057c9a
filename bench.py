"""Benchmark: full training-step throughput at the reference's headline
config (D-NeRF 400x400, ~43k Gaussians — the reference README's average
Gaussian count, BASELINE.md).

Measures the COMPLETE jitted train iteration — deform MLP forward, EWA
projection, tile binning, pallas blend, L1+DSSIM loss, full backward
(params + screenspace tap), both Adam updates — and reports Mrays/s
(pixels/s) per chip. The reference baseline is 28.6 Mrays/s RENDER-ONLY
(179 FPS x 160k px on its GPU, BASELINE.md); we report fwd+bwd+opt against
that render-only bar, so vs_baseline understates the true speedup.

Timing methodology: this platform's host tunnel does not synchronize in
`block_until_ready`, so per-dispatch wall timing measures host overhead.
Steps are chained on-device inside one jitted `lax.fori_loop` (the carry
feeds each next step, so nothing can be elided) and ONE scalar is fetched;
two loop lengths are differenced to cancel the fixed roundtrip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import json
import math
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from d3gs_tpu.config import OptimizationParams, PipelineParams
    from d3gs_tpu.models import gaussians as G
    from d3gs_tpu.models.deform import DeformFieldSpec, create_deform_field
    from d3gs_tpu.data.cameras import Camera
    from d3gs_tpu.ops.camera_math import perspective_projection, world_to_view
    from d3gs_tpu.train.step import make_train_step

    WIDTH = HEIGHT = 400
    N = 43_132                      # reference average Gaussian count
    CAP = 44_032                    # padded to 1024 multiple

    rng = np.random.default_rng(0)
    pts = (rng.random((N, 3)) * 2.6 - 1.3).astype(np.float32)
    cols = rng.uniform(0, 1, (N, 3)).astype(np.float32)
    state = G.create_from_pcd(pts, cols, sh_degree=3, capacity=CAP,
                              spatial_lr_scale=4.0)
    # activate full SH + plausible opacities so the blend does real work
    state = state.replace(
        active_sh_degree=jnp.asarray(3, jnp.int32),
        params=state.params._replace(
            opacity=jnp.full((CAP, 1), 0.5, jnp.float32)))

    V = world_to_view(np.eye(3), np.array([0.0, 0.0, 4.0])).T
    fov = math.radians(60)
    P = perspective_projection(0.01, 100.0, fov, fov).T
    cam = Camera(
        viewmatrix=jnp.asarray(V, jnp.float32),
        projmatrix=jnp.asarray(V @ P, jnp.float32),
        campos=jnp.asarray(np.linalg.inv(V)[3, :3], jnp.float32),
        fid=jnp.asarray(0.5),
        image=jnp.asarray(rng.random((HEIGHT, WIDTH, 3)), jnp.float32),
        width=WIDTH, height=HEIGHT, fovx=fov, fovy=fov)

    spec = DeformFieldSpec(kind="baseline", is_blender=True)
    dstate, field = create_deform_field(spec, jax.random.PRNGKey(0))

    opt_cfg = OptimizationParams()
    # dup budget: the scene is steady-state (no densify in the timed loop),
    # observed duplicate total is ~332k; 352k = 6% headroom. Every
    # M-proportional stage (expand, key sort, slab gather, grad reduction)
    # scales with this budget, so the 2x headroom the training auto-tuner
    # keeps for evolving scenes would be pure overhead here.
    pipe_cfg = PipelineParams(tile_capacity=1024, tile_chunk=25,
                              dup_capacity=352_256)

    def deform_fn(d_params, xyz, fid, iteration, key):
        return field.step(d_params, xyz, fid)

    step = make_train_step(opt_cfg=opt_cfg, pipe_cfg=pipe_cfg,
                           deform_fn=deform_fn,
                           deform_update_fn=field.update, donate=False)

    bg = jnp.zeros(3)
    key = jax.random.PRNGKey(0)

    def run(n_iters):
        f = jax.jit(lambda c, n=n_iters: jax.lax.fori_loop(
            0, n, lambda i, c: body(c), c))

        def body(carry):
            st, dst, it = carry
            st2, dst2, aux = step(st, dst, cam, 3001.0 + it, key, bg)
            return (st2, dst2, it + 1.0)

        init = (state, dstate, jnp.asarray(0.0))
        out = f(init)                       # compile + run
        float(jnp.sum(out[0].params.xyz))   # true sync
        best = float("inf")
        for _ in range(2):                  # best-of-2: tunnel jitter is
            t0 = time.perf_counter()        # one-sided (delays only)
            out = f(init)
            float(jnp.sum(out[0].params.xyz))
            best = min(best, time.perf_counter() - t0)
        return best

    t_lo, t_hi = run(3), run(23)
    dt = (t_hi - t_lo) / 20.0

    # ---- render-only (forward) throughput at the same config: deform MLP
    # forward + projection + binning + pallas blend + assemble, chained
    # on-device like the train loop (the carry feeds each frame's fid so
    # nothing can be elided). The reference's comparable figure is its
    # render FPS benchmark (render_baseline.py:57-74 -> README 179 FPS avg).
    import dataclasses as _dc
    from d3gs_tpu.models.renderer import render as _render

    def render_body(carry):
        acc, it = carry
        fid = jnp.asarray(0.5) + acc * 0.0
        dx, dr, ds = field.step(dstate.params, state.params.xyz, fid)
        out = _render(state, _dc.replace(cam, fid=fid),
                      d_xyz=dx, d_rotation=dr, d_scaling=ds, bg=bg,
                      dup_capacity=pipe_cfg.dup_capacity,
                      tile_capacity=pipe_cfg.tile_capacity,
                      tile_chunk=pipe_cfg.tile_chunk)
        return (jnp.sum(out.image[0]) * 1e-9, it + 1.0)

    def run_render(n_iters):
        f = jax.jit(lambda c, n=n_iters: jax.lax.fori_loop(
            0, n, lambda i, c: render_body(c), c))
        init = (jnp.asarray(0.0), jnp.asarray(0.0))
        out = f(init)
        float(out[0])
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            out = f(init)
            float(out[0])
            best = min(best, time.perf_counter() - t0)
        return best

    try:
        r_lo, r_hi = run_render(4), run_render(44)
        dt_render = (r_hi - r_lo) / 40.0
    except Exception:           # extras must never sink the main metric
        dt_render = None

    # ---- flagship k-camera step (the reference's headline configuration,
    # train.py:224-251): per-camera cost of the batched trainer at k=10
    from d3gs_tpu.config import ModelParams
    from d3gs_tpu.data.cameras import stack_cameras
    from d3gs_tpu.train.flagship import make_batched_step, pick_field_spec

    K = 10
    cams = []
    for i in range(K):
        Vi = world_to_view(np.eye(3),
                           np.array([0.1 * i, -0.1 * i, 4.0 + 0.2 * i])).T
        cams.append(Camera(
            viewmatrix=jnp.asarray(Vi, jnp.float32),
            projmatrix=jnp.asarray(Vi @ P, jnp.float32),
            campos=jnp.asarray(np.linalg.inv(Vi)[3, :3], jnp.float32),
            fid=jnp.asarray(i / (K - 1)),
            image=jnp.asarray(rng.random((HEIGHT, WIDTH, 3)), jnp.float32),
            width=WIDTH, height=HEIGHT, fovx=fov, fovy=fov))
    batch = stack_cameras(cams)
    model_cfg = ModelParams(is_blender=True)
    fopt = OptimizationParams(num_cams_per_iter=K)
    fspec = pick_field_spec(model_cfg, fopt)
    fdstate, ffield = create_deform_field(fspec, jax.random.PRNGKey(0), fopt)
    fstep = make_batched_step(
        opt_cfg=fopt, pipe_cfg=pipe_cfg, model_cfg=model_cfg, field=ffield,
        update_gaussians=True, update_deform=True, use_deform=True)

    def run_flagship(n_iters):
        @jax.jit
        def f(st, dst):
            def body(i, c):
                s, d, it = c
                s2, d2, *_ = fstep(s, d, batch, 3001.0 + it, key, bg)
                return (s2, d2, it + 1.0)
            return jax.lax.fori_loop(0, n_iters, body,
                                     (st, dst, jnp.asarray(0.0)))
        out = f(state, fdstate)
        float(jnp.sum(out[0].params.xyz))
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            out = f(state, fdstate)
            float(jnp.sum(out[0].params.xyz))
            best = min(best, time.perf_counter() - t0)
        return best

    try:
        f_lo, f_hi = run_flagship(2), run_flagship(8)
        dt_flag = (f_hi - f_lo) / 6.0
    except Exception:
        dt_flag = None

    mrays = WIDTH * HEIGHT / dt / 1e6
    baseline = 28.6  # render-only Mrays/s of the reference GPU (BASELINE.md)
    out = {
        "metric": "train_step_throughput_43k_gaussians_400x400",
        "value": round(mrays, 3),
        "unit": "Mrays/s/chip (fwd+bwd+opt)",
        "vs_baseline": round(mrays / baseline, 3),
        "train_step_ms": round(dt * 1000, 3),
    }
    if dt_render is not None:
        render_mrays = WIDTH * HEIGHT / dt_render / 1e6
        out["render_only_mrays"] = round(render_mrays, 3)
        out["render_only_fps"] = round(1.0 / dt_render, 1)
        out["render_vs_baseline"] = round(render_mrays / baseline, 3)
    if dt_flag is not None:
        out["flagship_ms_per_cam_k10"] = round(dt_flag * 1000 / K, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    import os
    import threading

    def _watchdog():
        # a dead axon tunnel HANGS inside a single non-returning PJRT C
        # call, where a SIGALRM python handler would never run (the main
        # thread never re-enters the eval loop). A daemon THREAD can still
        # print the error JSON line and hard-exit the process so the
        # driver is never left without output.
        print(json.dumps({
            "metric": "train_step_throughput_43k_gaussians_400x400",
            "value": 0.0,
            "unit": "Mrays/s/chip (fwd+bwd+opt)",
            "vs_baseline": 0.0,
            "error": "bench watchdog: no result within 40 min (TPU "
                     "tunnel unreachable or compile stuck)"[:300],
        }), flush=True)
        os._exit(0)

    timer = threading.Timer(2400, _watchdog)
    timer.daemon = True
    timer.start()
    try:
        main()
        timer.cancel()
    except Exception as e:  # never leave the driver without a JSON line
        timer.cancel()
        print(json.dumps({
            "metric": "train_step_throughput_43k_gaussians_400x400",
            "value": 0.0,
            "unit": "Mrays/s/chip (fwd+bwd+opt)",
            "vs_baseline": 0.0,
            "error": f"{type(e).__name__}: {e}"[:300],
        }))
        sys.exit(0)
