"""CLI: export Gaussian trajectories (T, N, 3) + plot
(reference sample_trajectories.py:26-110) — feeds the forecasting pipeline."""
import argparse
import os

import jax

from d3gs_tpu import config as C


def main(argv=None):
    parser = argparse.ArgumentParser()
    C.add_group_args(parser, C.ModelParams, fill_none=True)
    C.add_group_args(parser, C.PipelineParams)
    parser.add_argument("--iteration", default=-1, type=int)
    parser.add_argument("--num_timesteps", default=150, type=int)
    parser.add_argument("--output_dir", default="", type=str)
    args = C.get_combined_args(parser, argv)

    model_cfg = C.extract_group(args, C.ModelParams)
    pipe_cfg = C.extract_group(args, C.PipelineParams)

    from d3gs_tpu.data.scene import Scene
    from d3gs_tpu.models.deform import create_deform_field
    from d3gs_tpu.models.deform.fields import load_deform_weights
    from d3gs_tpu.render_eval.trajectories import (export_trajectories,
                                                   plot_trajectories)
    from d3gs_tpu.train.flagship import pick_field_spec

    scene = Scene(model_cfg, load_iteration=args.iteration, shuffle=False,
                  capacity=pipe_cfg.capacity)
    opt_cfg = C.OptimizationParams()
    spec = pick_field_spec(model_cfg, opt_cfg)
    dstate, field = create_deform_field(spec, jax.random.PRNGKey(0), opt_cfg)
    dstate = load_deform_weights(model_cfg.model_path, dstate, args.iteration)

    out_dir = args.output_dir or model_cfg.model_path
    traj, ts = export_trajectories(out_dir, scene.gaussians, field,
                                   dstate.params,
                                   num_timesteps=args.num_timesteps)
    plot_trajectories(os.path.join(out_dir, "trajectories.png"), traj)
    print(f"exported {traj.shape} trajectories to {out_dir}")


if __name__ == "__main__":
    main()
