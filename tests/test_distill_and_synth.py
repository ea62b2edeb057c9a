"""Distillation + synthetic-ODE harness tests (analytic oracles)."""
import jax
import jax.numpy as jnp
import numpy as np

from d3gs_tpu.config import ModelParams, OptimizationParams, PipelineParams
from d3gs_tpu.models.deform import DeformFieldSpec, create_deform_field
from d3gs_tpu.train.distill import train_distill
from d3gs_tpu.train.synth_ode import (linear_trajectory, quadratic_trajectory,
                                      rollout, sine_wave_trajectory,
                                      train_synth_ode)
from tests.test_train_static import gt_state


def test_trajectory_generators():
    s = jnp.array([0.0, 0.0, 0.0])
    e = jnp.array([1.0, 2.0, 3.0])
    lin = linear_trajectory(s, e, 11)
    assert lin.shape == (11, 3)
    np.testing.assert_allclose(np.asarray(lin[-1]), [1, 2, 3], atol=1e-6)
    np.testing.assert_allclose(np.asarray(lin[5]), [0.5, 1.0, 1.5], atol=1e-6)
    quad = quadratic_trajectory(s, e, 11)
    np.testing.assert_allclose(np.asarray(quad[5]), np.asarray(lin[5]) * 0.5,
                               atol=1e-6)
    sine = sine_wave_trajectory(s, e, 11)
    assert sine.shape == (11, 3)
    assert not np.allclose(np.asarray(sine), np.asarray(lin))


def test_synth_ode_fits_linear_trajectory():
    s = jnp.array([0.0, 0.0, 0.0])
    e = jnp.array([0.5, -0.3, 0.2])
    traj = linear_trajectory(s, e, 40)
    field, dstate, losses = train_synth_ode(
        trajectory=traj, iterations=150, batch_size=8, window=6,
        kind="simple", n_substeps=2, lr=3e-3, log_every=25)
    assert losses[-1][1] < losses[0][1]
    ys = rollout(field, dstate, s, 40)
    err = float(jnp.mean(jnp.abs(ys - traj)))
    # fixed-step ODE on a straight line should get close quickly
    assert err < 0.08, err


def test_distillation_matches_teacher():
    cap = 256
    gaussians = gt_state(n=60, cap=cap)
    model_cfg = ModelParams(is_blender=True, use_torch_ode=True, sh_degree=1)
    opt_cfg = OptimizationParams(position_lr_init=2e-3,
                                 position_lr_final=2e-4,
                                 position_lr_max_steps=300)
    pipe_cfg = PipelineParams(tile_capacity=128, tile_chunk=16)

    tkey = jax.random.PRNGKey(42)
    tspec = DeformFieldSpec(kind="baseline", is_blender=True, D=2, W=64)
    tstate, tfield = create_deform_field(tspec, tkey)

    result = train_distill(
        gaussians=gaussians, teacher_field=tfield, teacher_state=tstate,
        model_cfg=model_cfg, opt_cfg=opt_cfg, pipe_cfg=pipe_cfg,
        data_size=30, batch_time=5, iterations=60, log_every=10,
        progress=False)
    losses = [l for _, l in result.losses]
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
