"""The jitted core train step shared by every trainer.

One compiled function per (resolution, capacity) pair covers a whole phase of
the run: forward render → photometric loss → backward (parameter grads AND
the screenspace-tap grad for densification stats, in one backward pass) →
Adam update with per-group scheduled LRs → stats accumulation.

Densification, opacity reset, and SH-degree ramp are separate jitted
functions invoked on the host cadence (iteration numbers are host ints,
exactly like the reference's `if iteration % interval == 0` logic in
train_baseline.py:163-182). The warm-up/deform phase switch is likewise a
host-side choice between two compiled steps (reference train.py:144,224-236
renders with zero deformation before `opt.warm_up`).

The deformation field enters through a callback
    deform_fn(deform_params, xyz, fid, iteration, key) -> (dx, dr, ds)
so the same machinery serves the static phase (None), the MLP field, the
6DoF variant, and the ODE path.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..data.cameras import Camera
from ..models import gaussians as G
from ..models.renderer import render
from ..ops.losses import l1_loss, ssim


class StepAux(NamedTuple):
    loss: jax.Array
    l1: jax.Array
    radii: jax.Array
    tile_overflow: jax.Array   # max per-tile count (diagnostics)
    dup_total: jax.Array       # total surviving tile-duplicates — drives
    #                            the host-side dup_capacity auto-tuner


def make_train_step(
    *,
    opt_cfg,
    pipe_cfg,
    is_6dof: bool = False,
    direct_compute: bool = False,
    deform_fn: Optional[Callable] = None,
    deform_update_fn: Optional[Callable] = None,
    freeze_gaussians: bool = False,
    donate: bool = True,
    extra_loss_fn: Optional[Callable] = None,
):
    """Build the jitted train step.

    Returns step(state, deform_state, camera, iteration, key, bg[, aux_data])
      -> (state, deform_state, StepAux).
    Pass deform_fn=None for the static/warm-up phase.
    `extra_loss_fn(out, (dx, dr, ds), camera, state, aux_data) -> scalar`
    adds a differentiable regularizer (e.g. SAM mask consistency) to the
    photometric loss; `aux_data` is its per-camera side input.
    """
    lambda_dssim = opt_cfg.lambda_dssim
    use_deform = deform_fn is not None
    _train_prec = getattr(pipe_cfg, "train_matmul_precision", "highest")

    def render_loss(g_params, d_params, tap, state, camera, iteration, key,
                    bg, aux_data):
        st = state.replace(params=g_params)
        if use_deform:
            dx, dr, ds = deform_fn(d_params,
                                   jax.lax.stop_gradient(g_params.xyz),
                                   camera.fid, iteration, key)
        else:
            dx, dr, ds = 0.0, 0.0, 0.0
        out = render(
            st, camera, d_xyz=dx, d_rotation=dr, d_scaling=ds,
            is_6dof=is_6dof,
            direct_compute=direct_compute and use_deform,
            bg=bg, means2d_tap=tap,
            tile_capacity=pipe_cfg.tile_capacity,
            tile_chunk=pipe_cfg.tile_chunk,
            bin_chunk=pipe_cfg.bin_chunk,
            binning=pipe_cfg.binning,
            dup_capacity=pipe_cfg.dup_capacity,
            tight_cull=pipe_cfg.tight_cull,
            antialias=pipe_cfg.antialias,
            # every stock loss is photometric (+ deform-output
            # regularizers): the depth cotangent is structurally zero and
            # the blend backward skips its math. An extra_loss_fn that
            # consumes out.depth must set pipe_cfg.depth_grad=True
            depth_grad=getattr(pipe_cfg, "depth_grad", False))
        ll1 = l1_loss(out.image, camera.image)
        loss = (1.0 - lambda_dssim) * ll1 + lambda_dssim * (
            1.0 - ssim(out.image, camera.image))
        if extra_loss_fn is not None:
            loss = loss + extra_loss_fn(out, (dx, dr, ds), camera, st,
                                        aux_data)
        return loss, (ll1, out)

    @functools.partial(jax.jit, donate_argnums=(0, 1) if donate else ())
    def _step(state: G.GaussianState, deform_state: Any, camera: Camera,
              iteration: jax.Array, key: jax.Array, bg: jax.Array,
              aux_data: Any = None):
        # TRAIN steps trace at HIGHEST matmul precision: the TPU default
        # single-bf16-pass MXU rounding destabilizes the deform-phase
        # dynamics at >=400px (loss climbs within tens of iterations after
        # warm-up; xyz/scaling/rotation eventually NaN while opacity/color
        # stay clean). With full-f32 passes the trajectory tracks a CPU
        # (true f32) run step for step. Eval/render paths keep the fast
        # default — forward-only value noise (~0.4%) is invisible.
        with jax.default_matmul_precision(_train_prec):
            return _step_impl(state, deform_state, camera, iteration, key,
                              bg, aux_data)

    def _step_impl(state, deform_state, camera, iteration, key, bg,
                   aux_data):
        tap0 = jnp.zeros((state.capacity, 2))

        if use_deform:
            d_params = deform_state.params

            def f(gp, dp, t):
                return render_loss(gp, dp, t, state, camera, iteration, key,
                                   bg, aux_data)

            (loss, (ll1, out)), (g_grads, d_grads, tap_grad) = \
                jax.value_and_grad(f, argnums=(0, 1, 2), has_aux=True)(
                    state.params, d_params, tap0)
        else:
            def f(gp, t):
                return render_loss(gp, None, t, state, camera, iteration,
                                   key, bg, aux_data)

            (loss, (ll1, out)), (g_grads, tap_grad) = jax.value_and_grad(
                f, argnums=(0, 1), has_aux=True)(state.params, tap0)
            d_grads = None

        if not freeze_gaussians:
            lrs = G.group_learning_rates(opt_cfg, iteration,
                                         state.spatial_lr_scale)
            new_params, new_opt = G.adam_step(state.params, g_grads,
                                              state.opt, lrs,
                                              mask=state.alive)
            state = state.replace(params=new_params, opt=new_opt)
            state = G.add_densification_stats(state, tap_grad, out.radii)

        if use_deform and deform_update_fn is not None:
            deform_state = deform_update_fn(deform_state, d_grads, iteration)

        aux = StepAux(loss=loss, l1=ll1, radii=out.radii,
                      tile_overflow=jnp.max(out.counts),
                      dup_total=jnp.sum(out.counts))
        return state, deform_state, aux

    def step(state, deform_state, camera, iteration, key, bg,
             aux_data=None):
        # strip per-camera static metadata (image_name/uid are pytree aux
        # data): otherwise every distinct camera re-traces and re-compiles
        # the whole step
        camera = dataclasses.replace(camera, image_name="", uid=0)
        return _step(state, deform_state, camera,
                     jnp.asarray(iteration, jnp.float32), key, bg, aux_data)

    return step


def make_eval_render(*, pipe_cfg, is_6dof=False, direct_compute=False,
                     deform_fn=None):
    """Jitted no-grad render for PSNR eval (training_report semantics,
    train.py:355-422)."""

    @jax.jit
    def _eval_render(state: G.GaussianState, deform_state, camera: Camera,
                     bg: jax.Array):
        if deform_fn is not None and deform_state is not None:
            dx, dr, ds = deform_fn(deform_state.params, state.params.xyz,
                                   camera.fid, jnp.asarray(10 ** 9), None)
        else:
            dx, dr, ds = 0.0, 0.0, 0.0
        return render(state, camera, d_xyz=dx, d_rotation=dr, d_scaling=ds,
                      is_6dof=is_6dof,
                      direct_compute=direct_compute and deform_fn is not None,
                      bg=bg,
                      tile_capacity=pipe_cfg.tile_capacity,
                      tile_chunk=pipe_cfg.tile_chunk,
                      bin_chunk=pipe_cfg.bin_chunk,
                      binning=pipe_cfg.binning,
                      dup_capacity=pipe_cfg.dup_capacity,
                      tight_cull=pipe_cfg.tight_cull,
                      antialias=pipe_cfg.antialias)

    def eval_render(state, deform_state, camera, bg):
        camera = dataclasses.replace(camera, image_name="", uid=0)
        return _eval_render(state, deform_state, camera, bg)

    return eval_render


def densify_fns(opt_cfg):
    """Jitted densify + opacity-reset + SH ramp with config baked in."""

    @functools.partial(jax.jit, static_argnames=("max_screen_size",))
    def densify(state: G.GaussianState, key, max_screen_size, extent):
        return G.densify_and_prune(
            state, key,
            max_grad=opt_cfg.densify_grad_threshold,
            min_opacity=0.005,
            extent=extent,
            max_screen_size=max_screen_size,
            percent_dense=opt_cfg.percent_dense)

    reset = jax.jit(G.reset_opacity)
    oneup = jax.jit(G.oneup_sh_degree)
    return densify, reset, oneup
