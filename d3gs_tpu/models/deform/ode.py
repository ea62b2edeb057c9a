"""Neural-ODE integration, TPU-first.

The reference integrates Gaussian trajectories with adaptive solvers
(torchdiffeq `odeint_adjoint`, torchode `Dopri5 + IntegralController +
AutoDiffAdjoint`; scene/deform_model.py:26-30,61-78,196-198). Adaptive
stepping is host-divergent control flow — a poor fit for XLA — and at 100k
Gaussians the torchode controller is dominated by the dynamics MLP anyway,
so the TPU-native default is a **fixed-step RK4 on the evaluation grid**
with `n_substeps` RK4 steps per grid segment, wrapped in a checkpointed
`lax.scan`:

  * fully static shapes, vectorized over N Gaussians on the MXU
    (the dynamics MLP is (N, in)×(in, W) matmuls);
  * O(T) memory via `jax.checkpoint` per segment — the backward
    re-integrates each segment, the same memory/compute trade as the
    adjoint method, without its accuracy pathologies;
  * per-sample time grids (torchode's parallel-IVP semantics) supported
    directly: `ts` may be (T,) shared or (N, T) per-sample.

`odeint_adaptive` wraps `jax.experimental.ode.odeint` (Dopri5 + adjoint,
shared scalar grid) for tolerance-parity experiments with the reference.
"""
from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp


def _rk4_step(f: Callable, y: jax.Array, t: jax.Array, dt: jax.Array):
    """One RK4 step; t and dt may be scalars or per-sample (N, 1)."""
    k1 = f(t, y)
    k2 = f(t + dt * 0.5, y + 0.5 * dt * k1)
    k3 = f(t + dt * 0.5, y + 0.5 * dt * k2)
    k4 = f(t + dt, y + dt * k3)
    return y + (dt / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4)


def integrate_segment(f: Callable, y: jax.Array, t0, t1, n_substeps: int):
    """Integrate y from t0 to t1 with n_substeps RK4 steps (t0==t1 => y)."""
    dt = (t1 - t0) / n_substeps

    def body(i, y):
        t = t0 + dt * i
        return _rk4_step(f, y, t, dt)

    return jax.lax.fori_loop(0, n_substeps, body, y)


def odeint_grid(f: Callable, y0: jax.Array, ts: jax.Array, *,
                n_substeps: int = 4) -> jax.Array:
    """Integrate dy/dt = f(t, y) through the eval grid.

    Args:
      f: dynamics, f(t, y) -> dy/dt; t broadcastable to (N, 1) or scalar.
      y0: (N, D) state at ts[..., 0].
      ts: (T,) shared grid or (N, T) per-sample grids (torchode semantics:
          each sample integrates through its own time points).
    Returns:
      ys: (T, N, D) with ys[0] == y0.
    """
    per_sample = ts.ndim == 2
    if per_sample:
        seg_t0 = ts[:, :-1].T[..., None]      # (T-1, N, 1)
        seg_t1 = ts[:, 1:].T[..., None]
    else:
        seg_t0 = ts[:-1]                       # (T-1,)
        seg_t1 = ts[1:]

    seg = jax.checkpoint(
        lambda y, t0, t1: integrate_segment(f, y, t0, t1, n_substeps))

    def body(y, seg_ts):
        t0, t1 = seg_ts
        y_next = seg(y, t0, t1)
        return y_next, y_next

    _, ys_rest = jax.lax.scan(body, y0, (seg_t0, seg_t1))
    return jnp.concatenate([y0[None], ys_rest], axis=0)


def odeint_from_zero(f: Callable, y0: jax.Array, t: jax.Array, *,
                     n_substeps: int = 8) -> jax.Array:
    """Integrate from t=0 to a single (scalar) time t; returns y(t).
    Replaces the reference's per-render `odeint_adjoint(f, xyz, [0, t])`
    with its t=0 shortcut (deform_model.py:189-198): at t=0 the zero-length
    segment leaves y0 untouched."""
    return integrate_segment(f, y0, jnp.zeros_like(t), t, n_substeps)


def odeint_adaptive(f: Callable, y0: jax.Array, ts: jax.Array,
                    rtol: float = 1e-3, atol: float = 1e-4) -> jax.Array:
    """Adaptive Dopri5 with adjoint gradients (jax.experimental.ode),
    tolerance-compatible with the reference torchdiffeq path
    (scene/deform_model.py:196-198) and the torchode controller
    (deform_model.py:61-78). Shared (T,) grid only ((N, T) per-sample
    grids require the fixed-step path).

    The eval grid is made strictly increasing before integration (jax's
    odeint requires it; camera windows can repeat fids) by bumping
    duplicates an epsilon above their predecessor, then results are
    returned for the ORIGINAL times — exact for duplicates up to one
    epsilon step of drift.
    """
    from jax.experimental.ode import odeint as jodeint

    if ts.ndim != 1:
        raise ValueError(
            "adaptive ODE integration supports a shared (T,) grid only; "
            "use the fixed-step RK4 path for per-sample (N, T) grids")

    def f_flip(y, t):
        return f(t, y)

    ts_mono = _strict_increase(ts, 1e-6)
    return jodeint(f_flip, y0, ts_mono, rtol=rtol, atol=atol)


def _strict_increase(ts: jax.Array, eps: float) -> jax.Array:
    """Monotone repair: each entry at least eps above its predecessor."""
    def body(prev, t):
        t2 = jnp.maximum(t, prev + eps)
        return t2, t2
    _, out = jax.lax.scan(body, ts[0] - eps, ts)
    return out


def odeint_adaptive_from_zero(f: Callable, y0: jax.Array, t: jax.Array,
                              rtol: float = 1e-3,
                              atol: float = 1e-4) -> jax.Array:
    """Adaptive integration from 0 to scalar t (reference
    `odeint_adjoint(f, xyz, [0, t])`, deform_model.py:196-198). A zero or
    negative horizon returns y0 (the reference's t=0 shortcut) while the
    solver still integrates a clamped positive interval so its step-size
    control never sees a zero-length span."""
    t = jnp.reshape(t, ())
    t_eff = jnp.maximum(t, 1e-6)
    ys = odeint_adaptive(f, y0, jnp.stack([jnp.zeros_like(t), t_eff]),
                         rtol=rtol, atol=atol)
    return jnp.where(t > 0.0, ys[-1], y0)
