"""CLI: compute PSNR/SSIM/LPIPS over rendered test sets
(reference metrics.py:100-110)."""
import argparse

from d3gs_tpu.render_eval.metrics import evaluate_model_paths


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--model_paths", "-m", required=True, nargs="+")
    args = parser.parse_args(argv)
    results = evaluate_model_paths(args.model_paths)
    for mp, res in results.items():
        print(f"\nScene: {mp}")
        for method, vals in res.items():
            print(f"  {method}: PSNR {vals['PSNR']:.4f}  "
                  f"SSIM {vals['SSIM']:.4f}  "
                  f"LPIPS {vals['LPIPS'] if vals['LPIPS'] is not None else 'n/a'}")


if __name__ == "__main__":
    main()
