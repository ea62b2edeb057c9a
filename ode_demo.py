"""CLI: standalone neural-ODE fitting demos (no Gaussians, no rendering).

Counterpart of the reference ode_demo_torchode.py / ode_demo_torchode_3d.py:
  * `--demo spiral`: fit the classic 2D spiral dy/dt = y^3 @ A (the
    torchdiffeq demo system; reference ode_demo_torchode.py:25-46), embedded
    at z=0 (the deformation nets are 3D), with a vector-field/phase plot;
  * `--demo sine3d`: fit a 3D sine-modulated trajectory (reference
    ode_demo_torchode_3d.py).

Both use the same enc-dec dynamics net ("simple" DeformNetworkSimple
equivalent, utils/time_utils.py:203-260) and the fixed-step parallel-IVP
integrator that production training uses — this is the ODE stack's demo and
smoke test in one.

Example:
  python ode_demo.py --demo spiral --iterations 400 --out output/ode_demo
"""
from __future__ import annotations

import argparse
import json
import os

import numpy as np


def true_spiral(num_points: int, y0=(2.0, 0.0), a=None, substeps: int = 64):
    """Integrate dy/dt = y^3 A with substepped RK4 (reference true system,
    ode_demo_torchode.py:25-33; the cubic term is stiff near t=0, hence the
    fine internal step)."""
    import jax.numpy as jnp
    from jax import lax

    if a is None:
        a = jnp.asarray([[-0.1, 2.0], [-2.0, -0.1]])
    dt = 25.0 / (num_points * substeps)

    def f(y):
        return (y ** 3) @ a

    def rk4(y, _):
        k1 = f(y)
        k2 = f(y + 0.5 * dt * k1)
        k3 = f(y + 0.5 * dt * k2)
        k4 = f(y + dt * k3)
        y2 = y + dt / 6.0 * (k1 + 2 * k2 + 2 * k3 + k4)
        return y2, None

    def outer(y, _):
        y2, _ = lax.scan(rk4, y, None, length=substeps)
        return y2, y2

    y0 = jnp.asarray(y0)
    _, ys = lax.scan(outer, y0, None, length=num_points - 1)
    return jnp.concatenate([y0[None], ys], axis=0)        # (T, 2)


def main(argv=None):
    p = argparse.ArgumentParser(description="neural-ODE demos")
    p.add_argument("--demo", choices=["spiral", "sine3d"], default="spiral")
    p.add_argument("--num_points", type=int, default=200)
    p.add_argument("--iterations", type=int, default=400)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--window", type=int, default=10)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", type=str, default="output/ode_demo")
    args = p.parse_args(argv)

    import jax.numpy as jnp
    from d3gs_tpu.train.synth_ode import (rollout, sine_wave_trajectory,
                                          train_synth_ode)

    if args.demo == "spiral":
        xy = true_spiral(args.num_points)
        traj = jnp.concatenate([xy, jnp.zeros((args.num_points, 1))], axis=1)
    else:
        traj = sine_wave_trajectory(jnp.asarray([0.0, 0.0, 0.0]),
                                    jnp.asarray([1.0, 0.5, -0.5]),
                                    args.num_points)

    field, dstate, losses = train_synth_ode(
        trajectory=traj, iterations=args.iterations,
        batch_size=args.batch_size, window=args.window, kind="simple",
        lr=args.lr, seed=args.seed)

    pred = np.asarray(rollout(field, dstate, traj[0], args.num_points))
    gt = np.asarray(traj)
    mse = float(((pred - gt) ** 2).mean())
    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, f"{args.demo}_result.json"), "w") as f:
        json.dump({"losses": losses, "rollout_mse": mse}, f, indent=2)
    print(f"{args.demo}: final loss={losses[-1][1]:.6f} rollout MSE={mse:.6f}")

    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        if args.demo == "spiral":
            fig, (ax, ax2) = plt.subplots(1, 2, figsize=(12, 6))
            ax.plot(gt[:, 0], gt[:, 1], "g-", label="true spiral")
            ax.plot(pred[:, 0], pred[:, 1], "b--", label="learned")
            ax.legend()
            ax.set_title("phase portrait")
            # learned vector field on a grid (z=0 slice), like the
            # reference's streamplot panel
            import jax
            gx, gy = np.meshgrid(np.linspace(-2.2, 2.2, 21),
                                 np.linspace(-2.2, 2.2, 21))
            pts = jnp.asarray(
                np.stack([gx.ravel(), gy.ravel(),
                          np.zeros(gx.size)], axis=1), jnp.float32)
            t0 = jnp.zeros(())
            d0, _, _ = field.step(dstate.params, pts, t0, y0=pts)
            # finite-difference velocity of the learned flow at t=0
            dt = 1.0 / args.num_points
            d1, _, _ = field.step(dstate.params, pts, t0 + dt, y0=pts)
            vel = (np.asarray(d1) - np.asarray(d0)) / dt
            ax2.streamplot(gx, gy, vel[:, 0].reshape(gx.shape),
                           vel[:, 1].reshape(gx.shape), density=1.2)
            ax2.set_title("learned vector field (t=0)")
        else:
            fig = plt.figure(figsize=(8, 6))
            ax = fig.add_subplot(111, projection="3d")
            ax.plot(*gt.T, "g-", label="true")
            ax.plot(*pred.T, "b--", label="learned")
            ax.legend()
        fig.savefig(os.path.join(args.out, f"{args.demo}.png"), dpi=120)
        print(f"plot saved to {args.out}/{args.demo}.png")
    except Exception as e:
        print(f"plotting skipped: {e}")
    return mse


if __name__ == "__main__":
    main()
