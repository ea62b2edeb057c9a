"""Trajectory distillation: teach an ODE field a pretrained baseline MLP's
trajectories without rendering.

Counterpart of the reference train_synth_gau.py::training() (:47-238): load
a frozen teacher (baseline deform MLP + its Gaussians), sample random time
windows, roll the teacher out (absolute positions true_y = xyz + d_xyz),
anchor the student ODE at true_y[0] and integrate through the window, L1 on
the trajectories. Periodic rendered-PSNR eval reuses the rasterizer.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models import gaussians as G
from ..models.deform import DeformFieldSpec, create_deform_field
from ..ops.losses import psnr
from .baseline import TrainResult
from .step import make_eval_render


def make_distill_step(*, teacher_field, student_field, data_size: int,
                      batch_time: int, max_fid: float = 1.0,
                      sub_sample: int = 0):
    """One jitted distillation step. Window sampling follows the reference
    get_batch (train_synth_gau.py:37-45): start index s ~ U[0, data_size -
    batch_time); batch_t = (s + arange(batch_time)) · max_fid/data_size."""
    normalization = max_fid / data_size

    @jax.jit
    def step(student_state, teacher_params, xyz, key, iteration):
        ks, kd = jax.random.split(key)
        s = jax.random.randint(ks, (), 0, data_size - batch_time)
        batch_t = (s + jnp.arange(batch_time)).astype(jnp.float32) * \
            normalization

        # teacher rollout (no grad): absolute positions per window time
        def teacher_at(t):
            dx, _, _ = teacher_field.step(teacher_params, xyz, t)
            return xyz + dx

        true_y = jax.lax.stop_gradient(jax.vmap(teacher_at)(batch_t))

        def loss_fn(params):
            pred_y, _, _ = student_field.step_multi(params, true_y[0],
                                                    batch_t, y0=true_y[0])
            return jnp.mean(jnp.abs(pred_y - true_y))

        loss, grads = jax.value_and_grad(loss_fn)(student_state.params)
        student_state = student_field.update(student_state, grads, iteration)
        return student_state, loss

    return step


def train_distill(
    *,
    gaussians: G.GaussianState,
    teacher_field,
    teacher_state,
    model_cfg,
    opt_cfg,
    pipe_cfg,
    test_cams=(),
    data_size: int = 150,
    batch_time: int = 10,
    iterations: int = 2000,
    test_iterations=(),
    seed: int = 0,
    log_every: int = 50,
    progress: bool = True,
) -> TrainResult:
    """Distill teacher trajectories into a fresh ODE student. Gaussians are
    frozen throughout (reference :77-86)."""
    key = jax.random.PRNGKey(seed)
    spec = DeformFieldSpec(
        kind="simple_start" if model_cfg.use_torch_ode else "ode",
        is_blender=model_cfg.is_blender, D=model_cfg.D, W=model_cfg.W,
        multires=model_cfg.multires, use_linear=model_cfg.use_linear,
        use_emb=model_cfg.use_emb, output_scale=model_cfg.output_scale,
        solver=getattr(model_cfg, "ode_solver", "rk4"),
        rtol=opt_cfg.rtol, atol=opt_cfg.atol)
    key, k0 = jax.random.split(key)
    student_state, student_field = create_deform_field(spec, k0, opt_cfg)

    # only alive gaussians participate; keep static shape via the padded
    # buffer (dead rows have opacity 0 → render-eval unaffected; the
    # trajectory loss includes them but they are constant points)
    xyz = gaussians.params.xyz

    step = make_distill_step(teacher_field=teacher_field,
                             student_field=student_field,
                             data_size=data_size, batch_time=batch_time)

    eval_render = make_eval_render(
        pipe_cfg=pipe_cfg, direct_compute=True,
        deform_fn=lambda p, x, fid, it, k:
            student_field.step(p, x, fid, y0=x))

    result = TrainResult(state=gaussians, deform_state=student_state)
    bg = jnp.ones(3) if model_cfg.white_background else jnp.zeros(3)

    it_range = range(1, iterations + 1)
    if progress:
        from tqdm import tqdm
        it_range = tqdm(it_range, desc="train[distill]")
    for iteration in it_range:
        key, k1 = jax.random.split(key)
        student_state, loss = step(student_state, teacher_state.params, xyz,
                                   k1, jnp.asarray(iteration, jnp.float32))
        if iteration % log_every == 0 or iteration == 1:
            result.losses.append((iteration, float(loss)))
            if progress and hasattr(it_range, "set_postfix"):
                it_range.set_postfix(loss=f"{float(loss):.5f}")
        if iteration in test_iterations and test_cams:
            psnrs = [float(psnr(jnp.clip(
                eval_render(gaussians, student_state, tc, bg).image, 0, 1),
                tc.image)) for tc in test_cams]
            m = float(np.mean(psnrs))
            result.test_psnrs[iteration] = m
            if m > result.best_psnr:
                result.best_psnr = m
                result.best_iteration = iteration

    result.deform_state = student_state
    return result
