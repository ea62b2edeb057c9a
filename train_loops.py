"""CLI: sweep the flagship trainer across sequence lengths
(reference train_loops.py:46-68: one output subdir per sequence_length)."""
import argparse
import copy
import os

from d3gs_tpu import config as C


def main(argv=None):
    parser = argparse.ArgumentParser()
    C.add_group_args(parser, C.ModelParams)
    C.add_group_args(parser, C.PipelineParams)
    C.add_group_args(parser, C.OptimizationParams)
    parser.add_argument("--sequence_lengths", nargs="+", type=int,
                        default=[30, 40, 50, 60])
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--quiet", action="store_true")
    args = parser.parse_args(argv)

    model_cfg = C.extract_group(args, C.ModelParams)
    pipe_cfg = C.extract_group(args, C.PipelineParams)
    opt_cfg = C.extract_group(args, C.OptimizationParams)
    base_path = model_cfg.model_path or "./output/sweep"

    from d3gs_tpu.data.scene import Scene
    from d3gs_tpu.train.flagship import train_flagship

    results = {}
    for seq_len in args.sequence_lengths:
        m = copy.deepcopy(model_cfg)
        o = copy.deepcopy(opt_cfg)
        o.sequence_length = seq_len
        m.model_path = os.path.join(base_path, f"seq_{seq_len}")
        os.makedirs(m.model_path, exist_ok=True)
        C.save_cfg_args(m.model_path, m)
        scene = Scene(m, capacity=pipe_cfg.capacity, seed=args.seed)
        res = train_flagship(
            gaussians=scene.gaussians,
            train_cams=scene.get_train_cameras(),
            test_cams=scene.get_test_cameras(),
            cameras_extent=scene.cameras_extent,
            model_cfg=m, opt_cfg=o, pipe_cfg=pipe_cfg,
            test_iterations={o.iterations},
            save_iterations={o.iterations},
            model_path=m.model_path, seed=args.seed,
            progress=not args.quiet)
        results[seq_len] = res.best_psnr
        print(f"sequence_length={seq_len}: best PSNR {res.best_psnr:.2f}")
    print(results)


if __name__ == "__main__":
    main()
