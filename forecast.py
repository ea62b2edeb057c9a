"""CLI: train/evaluate the trajectory forecaster on exported trajectories
(reference forecast_exp/forecast_test.py + forecast_load_and_visualize.py)."""
import argparse
import json
import os

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--trajectories", required=True,
                        help="trajectories.npy from sample_trajectories.py")
    parser.add_argument("--output_dir", default="forecast_results")
    parser.add_argument("--past_len", type=int, default=80)
    parser.add_argument("--future_len", type=int, default=30)
    parser.add_argument("--stride", type=int, default=10)
    parser.add_argument("--d_model", type=int, default=128)
    parser.add_argument("--epochs", type=int, default=10)
    parser.add_argument("--batch_size", type=int, default=1024)
    parser.add_argument("--val_fraction", type=float, default=0.1)
    parser.add_argument("--max_gaussians", type=int, default=5000,
                        help="subsample gaussians for training windows")
    parser.add_argument("--plot", action="store_true")
    args = parser.parse_args(argv)

    from d3gs_tpu.forecast import (evaluate_forecaster, forecast,
                                   make_windows, train_forecaster)

    traj = np.load(args.trajectories)  # (T, N, 3)
    if traj.shape[1] > args.max_gaussians:
        sel = np.random.default_rng(0).choice(
            traj.shape[1], args.max_gaussians, replace=False)
        traj = traj[:, sel]
    past, future = make_windows(traj, args.past_len, args.future_len,
                                args.stride)
    n = past.shape[0]
    n_val = max(int(n * args.val_fraction), 1)
    perm = np.random.default_rng(0).permutation(n)
    tr, va = perm[n_val:], perm[:n_val]

    model, state, losses = train_forecaster(
        past[tr], future[tr], d_model=args.d_model, epochs=args.epochs,
        batch_size=args.batch_size)
    metrics = evaluate_forecaster(model, state, past[va], future[va])
    naive = float(np.mean((past[va][:, -1:, :] - future[va]) ** 2))
    metrics["naive_mse"] = naive
    os.makedirs(args.output_dir, exist_ok=True)
    with open(os.path.join(args.output_dir, "metrics.json"), "w") as f:
        json.dump(metrics, f, indent=2)
    print(json.dumps(metrics, indent=2))

    if args.plot:
        import jax.numpy as jnp
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        pred = np.asarray(forecast(model, state, jnp.asarray(past[va][:4]),
                                   args.future_len))
        fig, axes = plt.subplots(3, 1, figsize=(10, 8))
        for d, ax in enumerate(axes):
            t_past = np.arange(args.past_len)
            t_fut = args.past_len + np.arange(args.future_len)
            ax.plot(t_past, past[va][0, :, d], label="past")
            ax.plot(t_fut, future[va][0, :, d], label="gt")
            ax.plot(t_fut, pred[0, :, d], "--", label="pred")
            ax.set_ylabel("xyz"[d])
        axes[0].legend()
        fig.savefig(os.path.join(args.output_dir, "forecast.png"), dpi=120)
    return metrics


if __name__ == "__main__":
    main()
