"""Forecasting pipeline test: fit simple dynamics, beat the naive baseline."""
import numpy as np
import jax.numpy as jnp

from d3gs_tpu.forecast import (evaluate_forecaster, forecast, make_windows,
                               train_forecaster)


def test_forecaster_on_linear_motion():
    # 40 gaussians moving linearly with distinct velocities + small noise
    t_total, n = 60, 40
    rng = np.random.default_rng(0)
    v = rng.normal(scale=0.02, size=(1, n, 3))
    x0 = rng.normal(size=(1, n, 3))
    ts = np.arange(t_total).reshape(-1, 1, 1)
    traj = (x0 + v * ts + rng.normal(scale=1e-4,
                                     size=(t_total, n, 3))).astype(np.float32)

    past, future = make_windows(traj, past_len=20, future_len=5, stride=5)
    assert past.shape[1] == 20 and future.shape[1] == 5
    assert past.shape[0] == future.shape[0] > 0

    model, state, losses = train_forecaster(
        past, future, d_model=32, epochs=30, batch_size=128, lr=2e-3,
        progress=False)
    assert losses[-1][1] < losses[0][1]

    metrics = evaluate_forecaster(model, state, past[:64], future[:64])
    # naive last-value-carried-forward baseline
    naive = np.mean((past[:64, -1:, :] - future[:64]) ** 2)
    assert metrics["mse"] < naive, (metrics, float(naive))

    pred = np.asarray(forecast(model, state, jnp.asarray(past[:4]), 5))
    assert pred.shape == (4, 5, 3)
    assert np.isfinite(pred).all()
