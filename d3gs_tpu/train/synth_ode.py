"""Synthetic-trajectory ODE fitting harness.

Counterpart of the reference train_synth_ode.py / ode_demo_torchode*.py:
fit a neural-ODE deformation net to analytic 3D trajectories where ground
truth is exactly known — the repo's cheap correctness oracle for the ODE
stack (SURVEY.md §4). The whole optimization (windowed per-sample time
grids, parallel-IVP integration, L1 trajectory loss, Adam) runs as one
jitted step.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..models.deform import DeformFieldSpec, create_deform_field


# --- analytic trajectory generators (reference train_synth_ode.py:16-51) ---

def linear_trajectory(start, end, num_points):
    t = jnp.linspace(0, 1, num_points)[:, None]
    return start[None] + (end - start)[None] * t


def sine_wave_trajectory(start, end, num_points, freq=2.0,
                         amps=(0.1, 0.05, 0.02)):
    t = jnp.linspace(0, 1, num_points)[:, None]
    base = start[None] + (end - start)[None] * t
    waves = jnp.concatenate(
        [a * jnp.sin(2 * jnp.pi * freq * t) for a in amps], axis=1)
    return base + waves


def quadratic_trajectory(start, end, num_points):
    t = jnp.linspace(0, 1, num_points)[:, None]
    return start[None] + (end - start)[None] * t ** 2


def sample_windows(key, trajectory: jax.Array, batch_size: int,
                   window: int):
    """Random per-sample time windows (reference get_batch:96-101): each
    sample starts at a random index; grids differ per sample (parallel IVP).
    trajectory: (T_total, D). Returns (y0 (B, D), ts (B, W), y (W, B, D))."""
    t_total = trajectory.shape[0]
    starts = jax.random.randint(key, (batch_size,), 0, t_total - window)
    y0 = trajectory[starts]
    ts = (starts[:, None] + jnp.arange(window)[None, :]).astype(jnp.float32)
    ts = ts / t_total
    idx = starts[None, :] + jnp.arange(window)[:, None]   # (W, B)
    y = trajectory[idx]                                    # (W, B, D)
    return y0, ts, y


def train_synth_ode(
    *,
    trajectory: jax.Array,       # (T, 3) ground-truth trajectory
    iterations: int = 500,
    batch_size: int = 16,
    window: int = 10,
    kind: str = "simple",
    lr: float = 1e-3,
    n_substeps: int = 4,
    seed: int = 0,
    log_every: int = 50,
):
    """Fit the ODE field to one analytic trajectory; returns (field, state,
    losses). The batch axis carries different windows of the SAME curve
    (mirroring the reference's batched windows over one trajectory)."""
    spec = DeformFieldSpec(kind=kind, n_substeps=n_substeps)
    key = jax.random.PRNGKey(seed)
    key, k0 = jax.random.split(key)
    dstate, field = create_deform_field(spec, k0)

    # constant-LR update for this harness (reference uses plain Adam,
    # scene/deform_model.py:39-40)
    def update(state, grads):
        count = state.count + 1
        t = count.astype(jnp.float32)
        c1, c2 = 1 - 0.9 ** t, 1 - 0.999 ** t

        def upd(p, g, m, v):
            m = 0.9 * m + 0.1 * g
            v = 0.999 * v + 0.001 * g * g
            return p - lr * (m / c1) / (jnp.sqrt(v / c2) + 1e-8), m, v

        flat_p, td = jax.tree.flatten(state.params)
        out = [upd(p, g, m, v) for p, g, m, v in zip(
            flat_p, jax.tree.leaves(grads), jax.tree.leaves(state.m),
            jax.tree.leaves(state.v))]
        return state.replace(
            params=jax.tree.unflatten(td, [o[0] for o in out]),
            m=jax.tree.unflatten(td, [o[1] for o in out]),
            v=jax.tree.unflatten(td, [o[2] for o in out]),
            count=count)

    @jax.jit
    def step(state, key_):
        y0, ts, y_true = sample_windows(key_, trajectory, batch_size, window)

        def loss_fn(params):
            ys, _, _ = field.step_multi(params, y0, ts, y0=y0)  # (W, B, D)
            return jnp.mean(jnp.abs(ys - y_true))

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return update(state, grads), loss

    losses = []
    for it in range(iterations):
        key, k1 = jax.random.split(key)
        dstate, loss = step(dstate, k1)
        if it % log_every == 0 or it == iterations - 1:
            losses.append((it, float(loss)))
    return field, dstate, losses


def rollout(field, dstate, y0: jax.Array, num_points: int):
    """Full-sequence rollout from t=0 for plotting/eval
    (reference render_synth_ode.py)."""
    ts = jnp.linspace(0.0, 1.0, num_points)
    ys, _, _ = field.step_multi(dstate.params, y0[None], ts, y0=y0[None])
    return ys[:, 0]
