"""CLI: chain train -> render -> metrics over scene lists
(reference full_eval.py:39-77), in-process instead of os.system."""
import argparse
import os

dnerf_scenes = ["bouncingballs", "hellwarrior", "hook", "jumpingjacks",
                "lego", "mutant", "standup", "trex"]


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--dnerf_path", type=str, default="")
    parser.add_argument("--output_path", default="./eval")
    parser.add_argument("--scenes", nargs="*", default=None)
    parser.add_argument("--iterations", type=int, default=40_000)
    parser.add_argument("--skip_training", action="store_true")
    parser.add_argument("--skip_rendering", action="store_true")
    parser.add_argument("--skip_metrics", action="store_true")
    args = parser.parse_args(argv)

    scenes = args.scenes if args.scenes is not None else dnerf_scenes
    model_paths = []
    for scene in scenes:
        src = os.path.join(args.dnerf_path, scene)
        mp = os.path.join(args.output_path, scene)
        model_paths.append(mp)
        if not args.skip_training:
            import train as train_cli
            train_cli.main(["-s", src, "-m", mp, "--eval", "--is_blender",
                            "--white_background", "--quiet",
                            "--iterations", str(args.iterations)])
        if not args.skip_rendering:
            import render as render_cli
            render_cli.main(["-m", mp, "--skip_train", "--mode", "render"])
    if not args.skip_metrics:
        import metrics as metrics_cli
        metrics_cli.main(["-m"] + model_paths)


if __name__ == "__main__":
    main()
