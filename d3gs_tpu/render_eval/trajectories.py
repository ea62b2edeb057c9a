"""Trajectory export + plots (reference sample_trajectories.py and the
trajectory-plot blocks of render.py:30-128 / train_synth_gau.py:263-352)."""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np


def sample_trajectories(state, field, d_params, *, num_timesteps: int = 150,
                        t_max: float = 1.0):
    """Roll the deformation field over a uniform time grid for all alive
    Gaussians -> (T, N, 3) ABSOLUTE positions + (T,) timestamps
    (sample_trajectories.py:26-43)."""
    ts = jnp.linspace(0.0, t_max, num_timesteps)
    xyz = state.params.xyz
    if field.spec.kind in ("ode", "simple", "simple_start"):
        ys, _, _ = field.step_multi(d_params, xyz, ts, y0=xyz)
        traj = ys
    else:
        dxs, _, _ = field.step_multi(d_params, xyz, ts)
        traj = xyz[None] + dxs
    alive = np.asarray(state.alive)
    return (np.asarray(traj)[:, alive], np.asarray(ts))


def export_trajectories(out_dir: str, state, field, d_params,
                        num_timesteps: int = 150):
    """Write trajectories.npy (T, N, 3) + timestamps.npy, feeding the
    forecasting pipeline (SURVEY.md components 16-17)."""
    os.makedirs(out_dir, exist_ok=True)
    traj, ts = sample_trajectories(state, field, d_params,
                                   num_timesteps=num_timesteps)
    np.save(os.path.join(out_dir, "trajectories.npy"), traj)
    np.save(os.path.join(out_dir, "timestamps.npy"), ts)
    return traj, ts


def plot_trajectories(out_path: str, traj: np.ndarray, num_gaussians: int = 10,
                      reference_traj: np.ndarray | None = None, seed: int = 0):
    """3D curve plot of sampled Gaussian trajectories, optionally overlaid
    with a reference model's (render.py:69-128)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    rng = np.random.default_rng(seed)
    n = traj.shape[1]
    sel = rng.choice(n, min(num_gaussians, n), replace=False)
    fig = plt.figure(figsize=(10, 8))
    ax = fig.add_subplot(111, projection="3d")
    for i in sel:
        ax.plot(traj[:, i, 0], traj[:, i, 1], traj[:, i, 2], alpha=0.8)
        if reference_traj is not None:
            ax.plot(reference_traj[:, i, 0], reference_traj[:, i, 1],
                    reference_traj[:, i, 2], alpha=0.5, linestyle="--")
    ax.set_xlabel("x")
    ax.set_ylabel("y")
    ax.set_zlabel("z")
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
