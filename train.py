"""CLI: train a deformable-3DGS model (TPU-native).

Mirrors the reference's train.py / train_baseline.py entry points
(reference train.py:425-458): same flags via the reflection config system,
cfg_args persistence, test/save iteration grids. `--trainer baseline` is the
paper-faithful single-camera loop; `--trainer flagship` the batched
multi-camera/ODE loop (the reference's default train.py).

Example:
  python train.py -s /data/dnerf/hellwarrior -m output/hell --is_blender \
      --trainer baseline --iterations 40000
"""
from __future__ import annotations

import argparse
import os

from d3gs_tpu import config as C


def main(argv=None):
    parser = argparse.ArgumentParser(description="TPU deformable-3DGS trainer")
    C.add_group_args(parser, C.ModelParams)
    C.add_group_args(parser, C.PipelineParams)
    C.add_group_args(parser, C.OptimizationParams)
    parser.add_argument("--trainer", choices=["baseline", "flagship"],
                        default="baseline")
    parser.add_argument("--test_iterations", nargs="+", type=int,
                        default=[5000, 6000, 7000] + list(
                            range(10000, 40001, 1000)))
    parser.add_argument("--save_iterations", nargs="+", type=int,
                        default=[7000, 10000, 20000, 30000, 40000])
    parser.add_argument("--quiet", action="store_true")
    parser.add_argument("--detect_anomaly", action="store_true",
                        help="jax_debug_nans: fail fast on NaN/Inf "
                             "(reference torch.autograd.set_detect_anomaly,"
                             " train.py:457)")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--configs", type=str, default="",
                        help="python config overlay (replaces mmcv configs)")
    parser.add_argument("--base_model_path", type=str, default="",
                        help="warm-start from a pretrained run; freezes "
                             "gaussians (train.py:72-79 semantics)")
    args = parser.parse_args(argv)

    if args.detect_anomaly:
        import jax
        jax.config.update("jax_debug_nans", True)

    model_cfg = C.extract_group(args, C.ModelParams)
    pipe_cfg = C.extract_group(args, C.PipelineParams)
    opt_cfg = C.extract_group(args, C.OptimizationParams)
    if args.configs:
        C.apply_config_file(args.configs, {"model": model_cfg,
                                           "pipeline": pipe_cfg,
                                           "optimization": opt_cfg})

    if not model_cfg.model_path:
        import uuid
        model_cfg.model_path = os.path.join("./output", str(uuid.uuid4())[:10])
    os.makedirs(model_cfg.model_path, exist_ok=True)
    C.save_cfg_args(model_cfg.model_path, model_cfg)
    print(f"Output folder: {model_cfg.model_path}")

    tb_writer = None
    try:
        from torch.utils.tensorboard import SummaryWriter
        tb_writer = SummaryWriter(model_cfg.model_path)
    except Exception:
        print("Tensorboard not available; not logging progress")

    from d3gs_tpu.data.scene import Scene, load_gaussians_ply

    if args.base_model_path:
        # warm start: load the pretrained run's point cloud, freeze
        scene = Scene(model_cfg, capacity=pipe_cfg.capacity, seed=args.seed)
        from d3gs_tpu.data.scene import search_for_max_iteration
        it = search_for_max_iteration(
            os.path.join(args.base_model_path, "point_cloud"))
        scene.gaussians = load_gaussians_ply(
            os.path.join(args.base_model_path, "point_cloud",
                         f"iteration_{it}", "point_cloud.ply"),
            sh_degree=model_cfg.sh_degree,
            spatial_lr_scale=scene.cameras_extent,
            max_gaussians=model_cfg.max_gaussians,
            capacity=pipe_cfg.capacity)
        opt_cfg.freeze_gaussians = True
        frozen = True
    else:
        scene = Scene(model_cfg, capacity=pipe_cfg.capacity, seed=args.seed)
        frozen = False

    common = dict(
        gaussians=scene.gaussians,
        train_cams=scene.get_train_cameras(),
        test_cams=scene.get_test_cameras(),
        cameras_extent=scene.cameras_extent,
        model_cfg=model_cfg, opt_cfg=opt_cfg, pipe_cfg=pipe_cfg,
        test_iterations=set(args.test_iterations),
        save_iterations=set(args.save_iterations + [opt_cfg.iterations]),
        model_path=model_cfg.model_path, seed=args.seed,
        tb_writer=tb_writer, progress=not args.quiet)

    mesh = None
    if pipe_cfg.mesh_shape:
        import jax
        from d3gs_tpu.parallel.mesh import make_mesh, make_mesh_2d
        parts = [int(p) for p in pipe_cfg.mesh_shape.lower().split("x")]
        n = 1
        for p in parts:
            n *= p
        assert len(jax.devices()) >= n, \
            f"--mesh_shape {pipe_cfg.mesh_shape} needs {n} devices"
        if len(parts) == 2 and pipe_cfg.mesh_mode == "gauss_tile":
            # composed layout: cameras over axis 0, gauss+tile over axis 1
            mesh = make_mesh_2d(jax.devices(), parts[0], parts[1])
        else:
            mesh = make_mesh(jax.devices()[:n])

    if args.trainer == "baseline":
        if mesh is not None:
            print("note: --mesh_shape applies to the flagship trainer; "
                  "baseline runs single-device")
        from d3gs_tpu.train.baseline import train_baseline
        result = train_baseline(**common)
    else:
        from d3gs_tpu.train.flagship import train_flagship
        result = train_flagship(base_model_frozen=frozen, mesh=mesh,
                                **common)

    print(f"Best PSNR = {result.best_psnr:.2f} "
          f"in Iteration {result.best_iteration}")
    return result


if __name__ == "__main__":
    main()
