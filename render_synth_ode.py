"""CLI: roll out a fitted synthetic-ODE model against its ground truth.

Counterpart of the reference render_synth_ode.py: regenerate the analytic
trajectory, load fitted parameters (from train_synth_ode.py's npz), roll the
learned field out from t=0 and plot/score learned vs ground truth.

Example:
  python render_synth_ode.py --trajectory sine --params \
      output/synth_ode/deform_params.npz --out output/synth_ode
"""
from __future__ import annotations

import argparse
import os

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description="synthetic-ODE rollout renderer")
    p.add_argument("--trajectory", choices=["linear", "sine", "quadratic"],
                   default="sine")
    p.add_argument("--num_points", type=int, default=150)
    p.add_argument("--kind", choices=["simple", "simple_start", "ode"],
                   default="simple")
    p.add_argument("--params", type=str, required=True,
                   help="npz from train_synth_ode.py")
    p.add_argument("--out", type=str, default="output/synth_ode")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from d3gs_tpu.models.deform import DeformFieldSpec, create_deform_field
    from d3gs_tpu.train.synth_ode import (linear_trajectory,
                                          quadratic_trajectory, rollout,
                                          sine_wave_trajectory)

    start = jnp.asarray([0.0, 0.0, 0.0])
    end = jnp.asarray([1.0, 0.5, -0.5])
    gen = {"linear": linear_trajectory, "sine": sine_wave_trajectory,
           "quadratic": quadratic_trajectory}[args.trajectory]
    traj = gen(start, end, args.num_points)

    spec = DeformFieldSpec(kind=args.kind)
    dstate, field = create_deform_field(spec, jax.random.PRNGKey(args.seed))
    loaded = dict(np.load(args.params))
    flat, treedef = jax.tree_util.tree_flatten_with_path(dstate.params)
    new_leaves = [jnp.asarray(loaded[jax.tree_util.keystr(k)])
                  for k, _ in flat]
    params = jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(dstate.params), new_leaves)
    dstate = dstate.replace(params=params)

    pred = np.asarray(rollout(field, dstate, traj[0], args.num_points))
    gt = np.asarray(traj)
    mse = float(((pred - gt) ** 2).mean())
    print(f"rollout MSE vs analytic ground truth: {mse:.6f}")

    os.makedirs(args.out, exist_ok=True)
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig = plt.figure(figsize=(12, 5))
        ax = fig.add_subplot(121, projection="3d")
        ax.plot(*gt.T, "g-", label="ground truth")
        ax.plot(*pred.T, "b--", label="learned")
        ax.legend()
        ax2 = fig.add_subplot(122)
        t = np.linspace(0, 1, args.num_points)
        for i, nm in enumerate("xyz"):
            ax2.plot(t, gt[:, i], f"C{i}-", label=f"gt {nm}")
            ax2.plot(t, pred[:, i], f"C{i}--", label=f"pred {nm}")
        ax2.legend(ncol=3, fontsize=8)
        ax2.set_xlabel("t")
        fig.savefig(os.path.join(args.out, "render_rollout.png"), dpi=120)
        print(f"plot saved to {args.out}/render_rollout.png")
    except Exception as e:
        print(f"plotting skipped: {e}")
    return mse


if __name__ == "__main__":
    main()
