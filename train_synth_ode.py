"""CLI: fit a neural-ODE deformation net to analytic 3D trajectories.

Counterpart of the reference train_synth_ode.py (:16-51 generators, :54-248
training): ground truth is exactly known, making this the cheap correctness
oracle for the ODE stack. Saves loss history, the fitted parameters (npz)
and matplotlib rollout plots.

Example:
  python train_synth_ode.py --trajectory sine --iterations 500 \
      --out output/synth_ode
"""
from __future__ import annotations

import argparse
import json
import os

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description="synthetic-trajectory ODE fit")
    p.add_argument("--trajectory", choices=["linear", "sine", "quadratic"],
                   default="sine")
    p.add_argument("--num_points", type=int, default=150)
    p.add_argument("--iterations", type=int, default=500)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--window", type=int, default=10)
    p.add_argument("--kind", choices=["simple", "simple_start", "ode"],
                   default="simple")
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", type=str, default="output/synth_ode")
    p.add_argument("--no_plot", action="store_true")
    args = p.parse_args(argv)

    import jax.numpy as jnp
    from d3gs_tpu.train.synth_ode import (linear_trajectory,
                                          quadratic_trajectory, rollout,
                                          sine_wave_trajectory,
                                          train_synth_ode)

    start = jnp.asarray([0.0, 0.0, 0.0])
    end = jnp.asarray([1.0, 0.5, -0.5])
    gen = {"linear": linear_trajectory, "sine": sine_wave_trajectory,
           "quadratic": quadratic_trajectory}[args.trajectory]
    traj = gen(start, end, args.num_points)

    field, dstate, losses = train_synth_ode(
        trajectory=traj, iterations=args.iterations,
        batch_size=args.batch_size, window=args.window, kind=args.kind,
        lr=args.lr, seed=args.seed)

    os.makedirs(args.out, exist_ok=True)
    pred = np.asarray(rollout(field, dstate, traj[0], args.num_points))
    gt = np.asarray(traj)
    mse = float(((pred - gt) ** 2).mean())
    with open(os.path.join(args.out, "losses.json"), "w") as f:
        json.dump({"losses": losses, "rollout_mse": mse}, f, indent=2)
    print(f"final loss={losses[-1][1]:.6f}  rollout MSE={mse:.6f}")

    import jax
    flat, _ = jax.tree_util.tree_flatten_with_path(dstate.params)
    np.savez(os.path.join(args.out, "deform_params.npz"),
             **{jax.tree_util.keystr(k): np.asarray(v) for k, v in flat})

    if not args.no_plot:
        try:
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
            fig = plt.figure(figsize=(8, 6))
            ax = fig.add_subplot(111, projection="3d")
            ax.plot(*gt.T, "g-", label="ground truth")
            ax.plot(*pred.T, "b--", label="learned rollout")
            ax.legend()
            ax.set_title(f"{args.trajectory} trajectory, MSE={mse:.2e}")
            fig.savefig(os.path.join(args.out, "rollout.png"), dpi=120)
            print(f"plot saved to {args.out}/rollout.png")
        except Exception as e:  # headless images may lack matplotlib
            print(f"plotting skipped: {e}")
    return mse


if __name__ == "__main__":
    main()
