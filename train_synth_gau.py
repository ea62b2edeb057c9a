"""CLI: trajectory distillation — teach an ODE field a pretrained baseline
deformation MLP's trajectories without rendering.

Counterpart of the reference train_synth_gau.py::training() (:47-238): load
the frozen teacher (baseline deform MLP + its Gaussians) from
--base_model_path, sample random time windows, roll the teacher out, anchor
the student ODE at the window start and L1 the trajectories. Periodic
rendered-PSNR eval reuses the rasterizer on the scene's test cameras.

Example:
  python train_synth_gau.py -s /data/dnerf/hellwarrior \
      --base_model_path output/hell_baseline -m output/hell_distill \
      --iterations 2000 --is_blender --use_torch_ode
"""
from __future__ import annotations

import argparse
import json
import os

from d3gs_tpu import config as C


def main(argv=None):
    parser = argparse.ArgumentParser(description="ODE trajectory distillation")
    C.add_group_args(parser, C.ModelParams)
    C.add_group_args(parser, C.PipelineParams)
    C.add_group_args(parser, C.OptimizationParams)
    parser.add_argument("--base_model_path", type=str, required=True,
                        help="trained baseline run (teacher)")
    parser.add_argument("--distill_iterations", type=int, default=2000)
    parser.add_argument("--data_size", type=int, default=150,
                        help="virtual trajectory length (window domain)")
    parser.add_argument("--batch_time", type=int, default=10)
    parser.add_argument("--test_iterations", nargs="+", type=int,
                        default=[500, 1000, 2000])
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--quiet", action="store_true")
    args = parser.parse_args(argv)

    model_cfg = C.extract_group(args, C.ModelParams)
    pipe_cfg = C.extract_group(args, C.PipelineParams)
    opt_cfg = C.extract_group(args, C.OptimizationParams)

    import jax

    from d3gs_tpu.data.scene import (Scene, load_gaussians_ply,
                                     search_for_max_iteration)
    from d3gs_tpu.models.deform import DeformFieldSpec, create_deform_field
    from d3gs_tpu.models.deform.fields import (load_deform_weights,
                                               save_deform_weights)
    from d3gs_tpu.train.distill import train_distill

    scene = Scene(model_cfg, capacity=pipe_cfg.capacity, seed=args.seed)
    it = search_for_max_iteration(
        os.path.join(args.base_model_path, "point_cloud"))
    gaussians = load_gaussians_ply(
        os.path.join(args.base_model_path, "point_cloud",
                     f"iteration_{it}", "point_cloud.ply"),
        sh_degree=model_cfg.sh_degree,
        spatial_lr_scale=scene.cameras_extent,
        max_gaussians=model_cfg.max_gaussians,
        capacity=pipe_cfg.capacity)

    # teacher: baseline MLP with the pretrained weights
    tspec = DeformFieldSpec(kind="baseline", is_blender=model_cfg.is_blender,
                            is_6dof=model_cfg.is_6dof, D=model_cfg.D,
                            W=model_cfg.W, multires=model_cfg.multires)
    tstate, tfield = create_deform_field(tspec, jax.random.PRNGKey(0))
    tstate = load_deform_weights(args.base_model_path, tstate)

    if not model_cfg.model_path:
        model_cfg.model_path = args.base_model_path.rstrip("/") + "_distill"
    os.makedirs(model_cfg.model_path, exist_ok=True)
    C.save_cfg_args(model_cfg.model_path, model_cfg)

    result = train_distill(
        gaussians=gaussians, teacher_field=tfield, teacher_state=tstate,
        model_cfg=model_cfg, opt_cfg=opt_cfg, pipe_cfg=pipe_cfg,
        test_cams=scene.get_test_cameras(), data_size=args.data_size,
        batch_time=args.batch_time, iterations=args.distill_iterations,
        test_iterations=set(args.test_iterations), seed=args.seed,
        progress=not args.quiet)

    save_deform_weights(model_cfg.model_path, args.distill_iterations,
                        result.deform_state)
    with open(os.path.join(model_cfg.model_path, "distill_result.json"),
              "w") as f:
        json.dump({"losses": result.losses,
                   "test_psnrs": result.test_psnrs,
                   "best_psnr": result.best_psnr}, f, indent=2)
    print(f"Best PSNR = {result.best_psnr:.2f} "
          f"in Iteration {result.best_iteration}")
    return result


if __name__ == "__main__":
    main()
