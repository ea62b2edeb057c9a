"""CLI: offline rendering of a trained model (reference render.py:399-474).

Modes: render | time | view | pose | all | original.
"""
from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp

from d3gs_tpu import config as C


def main(argv=None):
    parser = argparse.ArgumentParser(description="TPU deformable-3DGS renderer")
    C.add_group_args(parser, C.ModelParams, fill_none=True)
    C.add_group_args(parser, C.PipelineParams)
    parser.add_argument("--iteration", default=-1, type=int)
    parser.add_argument("--skip_train", action="store_true")
    parser.add_argument("--skip_test", action="store_true")
    parser.add_argument("--mode", default="render",
                        choices=["render", "time", "view", "all", "pose",
                                 "original"])
    parser.add_argument("--trajectories", action="store_true",
                        help="also export + plot Gaussian trajectories")
    parser.add_argument("--benchmark", action="store_true",
                        help="render-only FPS benchmark "
                             "(reference render_baseline.py:57-74)")
    args = C.get_combined_args(parser, argv)

    model_cfg = C.extract_group(args, C.ModelParams)
    pipe_cfg = C.extract_group(args, C.PipelineParams)

    from d3gs_tpu.data.scene import Scene
    from d3gs_tpu.models.deform import create_deform_field
    from d3gs_tpu.models.deform.fields import load_deform_weights
    from d3gs_tpu.render_eval import render_modes as RM
    from d3gs_tpu.train.flagship import pick_field_spec

    scene = Scene(model_cfg, load_iteration=args.iteration, shuffle=False,
                  capacity=pipe_cfg.capacity)
    state = scene.gaussians
    iteration = scene.loaded_iter

    opt_cfg = C.OptimizationParams()
    spec = pick_field_spec(model_cfg, opt_cfg)
    dstate, field = create_deform_field(spec, jax.random.PRNGKey(0), opt_cfg)
    dstate = load_deform_weights(model_cfg.model_path, dstate, args.iteration)

    bg = jnp.ones(3) if model_cfg.white_background else jnp.zeros(3)
    direct = spec.kind in ("ode", "simple", "simple_start")
    render_at = RM.make_render_fn(state, field, pipe_cfg,
                                  is_6dof=model_cfg.is_6dof,
                                  direct_compute=direct)

    train_views = scene.get_train_cameras()
    test_views = scene.get_test_cameras() or train_views[:5]
    mp = model_cfg.model_path

    if args.mode == "render":
        if not args.skip_train:
            RM.render_split(mp, "train", iteration, train_views, state,
                            dstate.params, render_at, bg)
        if not args.skip_test:
            RM.render_split(mp, "test", iteration, test_views, state,
                            dstate.params, render_at, bg)
    elif args.mode == "time":
        RM.interpolate_time(mp, "test", iteration, test_views, state,
                            dstate.params, render_at, bg)
    elif args.mode == "view":
        import numpy as np
        v = test_views[0]
        Vt = np.asarray(v.viewmatrix).T
        R = Vt[:3, :3].T
        T = Vt[:3, 3]
        RM.interpolate_view(mp, "test", iteration, test_views, state,
                            dstate.params, render_at, bg, R, T)
    elif args.mode == "pose":
        RM.interpolate_poses(mp, "test", iteration, test_views, state,
                             dstate.params, render_at, bg)
    elif args.mode == "all":
        RM.interpolate_all(mp, "test", iteration, test_views, state,
                           dstate.params, render_at, bg)
    elif args.mode == "original":
        RM.interpolate_view_original(mp, "test", iteration, test_views,
                                     state, dstate.params, render_at, bg)

    if args.benchmark:
        # device-true timing: block_until_ready does not synchronize on
        # this platform's tunnel — chain frames on-device in one fori_loop
        # (carry-dependent fid so nothing is elided) and fetch one scalar;
        # difference two loop lengths to cancel the fixed roundtrip
        import time
        view = test_views[0]

        def frame(c):
            out = render_at(state, dstate.params,
                            RM.camera_with_fid(view, jnp.abs(
                                jnp.sin(c + 0.5))), bg)
            return jnp.sum(out.image) * 1e-12

        def run(n):
            f = jax.jit(lambda c, n=n: jax.lax.fori_loop(
                0, n, lambda i, c2: frame(c2), c))
            float(f(jnp.asarray(0.0)))          # compile + sync
            t0 = time.perf_counter()
            float(f(jnp.asarray(0.0)))
            return time.perf_counter() - t0

        t_lo, t_hi = run(5), run(55)
        dt = (t_hi - t_lo) / 50.0
        mrays = view.width * view.height / dt / 1e6
        print(f"render-only: {1.0 / dt:.1f} FPS, {mrays:.1f} Mrays/s "
              f"@ {view.width}x{view.height}")

    if args.trajectories:
        from d3gs_tpu.render_eval.trajectories import (export_trajectories,
                                                       plot_trajectories)
        traj, _ = export_trajectories(mp, state, field, dstate.params)
        plot_trajectories(os.path.join(mp, "trajectories.png"), traj)


if __name__ == "__main__":
    main()
