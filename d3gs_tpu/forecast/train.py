"""Forecaster training/eval over exported trajectories.

Counterpart of forecast_exp/forecast_test.py (TimeSeriesDataset windowing,
HF Trainer loop, :11-124) and forecast_load_and_visualize.py (autoregressive
generate + MSE/MAE eval).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .model import TrajectoryForecaster, normalize_window


class ForecastState(NamedTuple):
    params: dict
    m: dict
    v: dict
    count: jax.Array


def make_windows(traj: np.ndarray, past_len: int = 80, future_len: int = 30,
                 stride: int = 10):
    """(T, N, 3) trajectories -> stacked (past, future) windows over all
    Gaussians (reference TimeSeriesDataset:11-49 flattening)."""
    t_total, n, d = traj.shape
    pasts, futures = [], []
    for s in range(0, t_total - past_len - future_len + 1, stride):
        pasts.append(traj[s:s + past_len].transpose(1, 0, 2))
        futures.append(
            traj[s + past_len:s + past_len + future_len].transpose(1, 0, 2))
    past = np.concatenate(pasts, axis=0).astype(np.float32)
    future = np.concatenate(futures, axis=0).astype(np.float32)
    return past, future  # (B, Lp, 3), (B, Lf, 3)


def train_forecaster(past: np.ndarray, future: np.ndarray, *,
                     d_model: int = 128, epochs: int = 10,
                     batch_size: int = 1024, lr: float = 1e-3, seed: int = 0,
                     log_every: int = 20, progress: bool = True):
    model = TrajectoryForecaster(d_model=d_model)
    key = jax.random.PRNGKey(seed)
    p0 = jnp.asarray(past[:2])
    f0 = jnp.asarray(future[:2])
    fut_in0 = jnp.concatenate([p0[:, -1:], f0[:, :-1]], axis=1)
    params = model.init(key, p0, fut_in0)
    zeros = jax.tree.map(jnp.zeros_like, params)
    state = ForecastState(params, zeros, jax.tree.map(jnp.zeros_like, params),
                          jnp.zeros((), jnp.int32))

    @jax.jit
    def step(state, pb, fb):
        pn, mu, sd = normalize_window(pb)
        fn = (fb - mu) / sd
        fut_in = jnp.concatenate([pn[:, -1:], fn[:, :-1]], axis=1)

        def loss_fn(params):
            pred = model.apply(params, pn, fut_in)
            return jnp.mean((pred - fn) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        count = state.count + 1
        t = count.astype(jnp.float32)
        c1, c2 = 1 - 0.9 ** t, 1 - 0.999 ** t
        flat_p, td = jax.tree.flatten(state.params)
        out = []
        for p, g, m, v in zip(flat_p, jax.tree.leaves(grads),
                              jax.tree.leaves(state.m),
                              jax.tree.leaves(state.v)):
            m = 0.9 * m + 0.1 * g
            v = 0.999 * v + 0.001 * g * g
            out.append((p - lr * (m / c1) / (jnp.sqrt(v / c2) + 1e-8), m, v))
        new = ForecastState(
            jax.tree.unflatten(td, [o[0] for o in out]),
            jax.tree.unflatten(td, [o[1] for o in out]),
            jax.tree.unflatten(td, [o[2] for o in out]), count)
        return new, loss

    n = past.shape[0]
    rng = np.random.default_rng(seed)
    losses = []
    steps_per_epoch = max(n // batch_size, 1)
    it = 0
    for epoch in range(epochs):
        perm = rng.permutation(n)
        for b in range(steps_per_epoch):
            sel = perm[b * batch_size:(b + 1) * batch_size]
            state, loss = step(state, jnp.asarray(past[sel]),
                               jnp.asarray(future[sel]))
            if it % log_every == 0:
                losses.append((it, float(loss)))
            it += 1
    return model, state, losses


def forecast(model, state, past: jnp.ndarray, future_len: int) -> jnp.ndarray:
    """Autoregressive rollout (reference model.generate equivalent)."""
    pn, mu, sd = normalize_window(jnp.asarray(past))

    @jax.jit
    def roll(params, pn):
        b = pn.shape[0]

        def body(carry, _):
            fut_in = carry  # (B, Lf, D) with valid prefix
            pred = model.apply(params, pn, fut_in)
            return fut_in, pred

        # teacher-forcing-free: iterate future_len times feeding predictions
        fut_in = jnp.concatenate(
            [pn[:, -1:], jnp.zeros((b, future_len - 1, pn.shape[-1]))], axis=1)

        def step_fn(i, fut_in):
            pred = model.apply(params, pn, fut_in)
            # place prediction i at decoder input i+1
            nxt = jnp.where(
                (jnp.arange(future_len) == i + 1)[None, :, None],
                jnp.roll(pred, 1, axis=1), fut_in)
            return jnp.where(i + 1 < future_len, nxt, fut_in)

        fut_in = jax.lax.fori_loop(0, future_len - 1, step_fn, fut_in)
        return model.apply(params, pn, fut_in)

    pred_n = roll(state.params, pn)
    return pred_n * sd + mu


def evaluate_forecaster(model, state, past: np.ndarray, future: np.ndarray,
                        batch: int = 2048):
    """MSE/MAE over validation windows (forecast_load_and_visualize.py)."""
    mses, maes = [], []
    for s in range(0, past.shape[0], batch):
        pred = np.asarray(forecast(model, state,
                                   jnp.asarray(past[s:s + batch]),
                                   future.shape[1]))
        diff = pred - future[s:s + batch]
        mses.append(np.mean(diff ** 2))
        maes.append(np.mean(np.abs(diff)))
    return {"mse": float(np.mean(mses)), "mae": float(np.mean(maes))}
