"""Paper-faithful deformable-3DGS training loop.

Counterpart of the reference `train_baseline.py::training()` (:34-208): one
random camera per iteration drawn from a time-sorted, uniformly subsampled
`sequence_length` stack, 3k-iteration static warm-up, AST annealed time
noise for non-blender scenes, densify/prune/opacity-reset cadence, dual
optimizers (Gaussians + deform MLP), best-PSNR tracking.

TPU design: the whole iteration (deform MLP fwd → render → loss → one
backward → both Adam updates → densify stats) is ONE compiled XLA program
(train/step.py); this host loop only does camera selection, cadence
branching, and logging. Two compiled variants exist — warm-up (no deform)
and deform — switched at `opt.warm_up` exactly like the reference's
in-loop branch (train_baseline.py:106-115).
"""
from __future__ import annotations

import os
import time
from dataclasses import dataclass, field as dfield
from random import Random
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelParams, OptimizationParams, PipelineParams
from ..data.cameras import Camera
from ..models import gaussians as G
from ..models.deform import DeformFieldSpec, create_deform_field
from ..models.deform.fields import save_deform_weights
from ..ops.losses import psnr
from ..ops.schedules import linear_noise
from .step import densify_fns, make_eval_render, make_train_step


@dataclass
class TrainResult:
    state: G.GaussianState
    deform_state: object
    best_psnr: float = 0.0
    best_iteration: int = 0
    losses: list = dfield(default_factory=list)
    test_psnrs: dict = dfield(default_factory=dict)


def subsample_stack(cams: list[Camera], sequence_length: int) -> list[Camera]:
    """Time-sort then uniformly subsample to sequence_length
    (train_baseline.py:81-90 / train.py spread_out_sequence)."""
    stack = sorted(cams, key=lambda c: float(c.fid))
    total = len(stack)
    if sequence_length >= total or sequence_length <= 0:
        return stack
    if sequence_length == 1:
        return [stack[0]]
    step = (total - 1) / (sequence_length - 1)
    idx = [int(round(i * step)) for i in range(sequence_length)]
    return [stack[i] for i in idx]


def train_baseline(
    *,
    gaussians: G.GaussianState,
    train_cams: list[Camera],
    test_cams: list[Camera],
    cameras_extent: float,
    model_cfg: ModelParams,
    opt_cfg: OptimizationParams,
    pipe_cfg: PipelineParams,
    test_iterations=(),
    save_iterations=(),
    model_path: str = "",
    seed: int = 0,
    log_every: int = 50,
    tb_writer=None,
    progress: bool = True,
    extra_loss_fn=None,
    aux_data_fn=None,
    live_hook=None,
) -> TrainResult:
    """`extra_loss_fn` / `aux_data_fn(camera) -> pytree` add a per-camera
    differentiable regularizer to the deform-phase loss (the SAM-variant
    trainer wires mask-consistency through these, train_baseline_sam.py).
    `live_hook(state, deform_state, field, iteration)` fires every
    log_every iterations with the LIVE training state — the GUI / network
    viewer renders from it (reference network_gui/train-loop interleave,
    train_baseline.py:57-71)."""
    rng = Random(seed)
    key = jax.random.PRNGKey(seed)

    spec = DeformFieldSpec(kind="baseline", is_blender=model_cfg.is_blender,
                           is_6dof=model_cfg.is_6dof, D=model_cfg.D,
                           W=model_cfg.W, multires=model_cfg.multires,
                           compute_dtype=getattr(model_cfg, "deform_dtype",
                                                 "float32"))
    key, dkey = jax.random.split(key)
    deform_state, field = create_deform_field(spec, dkey, opt_cfg)

    bg = jnp.ones(3) if model_cfg.white_background else jnp.zeros(3)

    stack_template = subsample_stack(train_cams, opt_cfg.sequence_length)
    time_interval = 1.0 / max(len(stack_template), 1)

    def deform_fn(d_params, xyz, fid, iteration, key_):
        if model_cfg.is_blender or key_ is None:
            t = fid
        else:
            # AST noise (train_baseline.py:112-115)
            noise = jax.random.normal(key_, ()) * time_interval * linear_noise(
                iteration, lr_init=0.1, lr_final=1e-15, lr_delay_mult=0.01,
                max_steps=20000)
            t = fid + noise
        return field.step(d_params, xyz, t)

    # --- duplicate-budget auto-tuner: dup_capacity==0 (auto) starts at the
    # safe 16*capacity default but the STATIC budget prices every
    # M-proportional op (sort, ragged expand, blend gradient buffers,
    # reduction) whether slots are used or not — with a padded 100k-capacity
    # buffer holding 30k alive gaussians it can be >5x oversized. The host
    # watches aux.dup_total at its existing sync points and rebuilds the
    # jitted steps with ~2x the observed total (grow >85%, shrink <35%,
    # 64k granularity → a couple of recompiles per run).
    import dataclasses as _dc
    auto_dup = pipe_cfg.dup_capacity == 0

    def _round_budget(x):
        g = 65536
        return max(g, ((int(x) + g - 1) // g) * g)

    _dup = {"budget": 0}    # 0 = library default (16*capacity)
    S = {}

    def build_steps():
        pc = pipe_cfg if _dup["budget"] == 0 else _dc.replace(
            pipe_cfg, dup_capacity=_dup["budget"])
        S["warm"] = make_train_step(opt_cfg=opt_cfg, pipe_cfg=pc,
                                    donate=True)
        S["deform"] = make_train_step(
            opt_cfg=opt_cfg, pipe_cfg=pc, is_6dof=model_cfg.is_6dof,
            deform_fn=deform_fn, deform_update_fn=field.update, donate=True,
            extra_loss_fn=extra_loss_fn)

    build_steps()

    def maybe_retune_dup(aux, capacity):
        if not auto_dup:
            return
        total = int(aux.dup_total)
        cur = _dup["budget"] or 16 * capacity
        if total > 0.85 * cur or (0 < total < 0.35 * cur):
            new_b = _round_budget(2 * total)
            if new_b != cur:
                _dup["budget"] = new_b
                build_steps()
                _chunks.clear()

    # --- multi-step dispatch: run n iterations inside ONE jitted fori_loop
    # between host events. The per-step camera is dynamically indexed from a
    # stacked batch; per-step keys derive by fold_in. Amortizes host
    # dispatch latency (tunnel/remote hosts pay ~100ms per dispatch).
    spd = max(1, int(getattr(pipe_cfg, "steps_per_dispatch", 1)))
    if extra_loss_fn is not None or aux_data_fn is not None:
        spd = 1   # SAM-style per-camera host aux data is host-prepared

    def make_chunk(step_fn, n):
        from .step import StepAux

        @jax.jit
        def chunk(state, dstate, cam_batch, it0, key_, bg_):
            aux0 = StepAux(
                loss=jnp.float32(0), l1=jnp.float32(0),
                radii=jnp.zeros((state.capacity,), jnp.int32),
                tile_overflow=jnp.int32(0), dup_total=jnp.int32(0))

            def body(i, carry):
                st, dst, _ = carry
                cam_i = jax.tree.map(lambda x: x[i], cam_batch)
                return step_fn(st, dst, cam_i,
                               it0 + i.astype(jnp.float32),
                               jax.random.fold_in(key_, i), bg_)

            return jax.lax.fori_loop(0, n, body, (state, dstate, aux0))

        return chunk

    _chunks = {}

    def run_chunk(phase_warm, state, dstate, cams, it0, key_, bg_):
        n = len(cams)
        from ..data.cameras import stack_cameras
        ck = (phase_warm, n, state.capacity, _dup["budget"])
        if ck not in _chunks:
            _chunks[ck] = make_chunk(
                S["warm"] if phase_warm else S["deform"], n)
        batch = stack_cameras(cams)
        return _chunks[ck](state, dstate, batch, it0, key_, bg_)

    def _post_event(j):
        """True if host-side work follows step j (densify/reset/log/eval/
        save) — a chunk may only END on such an iteration."""
        if j >= opt_cfg.iterations:
            return True
        if j < opt_cfg.densify_until_iter:
            if (j > opt_cfg.densify_from_iter
                    and j % opt_cfg.densification_interval == 0):
                return True
            if (j % opt_cfg.opacity_reset_interval == 0
                    or (model_cfg.white_background
                        and j == opt_cfg.densify_from_iter)):
                return True
        if j % log_every == 0 or j == 1:
            return True
        return j in test_iterations or j in save_iterations

    def chunk_len(i):
        """Largest n <= spd such that iterations [i, i+n) contain no
        interior host event: no oneup/phase flip before a step, no
        densify/log/eval after any but the last."""
        if spd <= 1:
            return 1
        n = 1
        limit = min(spd, opt_cfg.iterations - i + 1)
        for n_try in range(2, limit + 1):
            last = i + n_try - 1
            if any(jj % 1000 == 0 for jj in range(i + 1, last + 1)):
                break
            if (i < opt_cfg.warm_up) != (last < opt_cfg.warm_up):
                break
            if any(_post_event(jj) for jj in range(i, last)):
                break
            n = n_try
        return n

    eval_render = make_eval_render(pipe_cfg=pipe_cfg,
                                   is_6dof=model_cfg.is_6dof,
                                   deform_fn=deform_fn)
    densify, reset_opacity, oneup = densify_fns(opt_cfg)

    state = gaussians
    result = TrainResult(state=state, deform_state=deform_state)
    viewpoint_stack: list[Camera] = []
    ema_loss = 0.0

    pbar = None
    if progress:
        from tqdm import tqdm
        pbar = tqdm(total=opt_cfg.iterations, desc="train[baseline]")

    _iter_t0, _iter_last = time.perf_counter(), 0
    iteration = 1
    while iteration <= opt_cfg.iterations:
        if iteration % 1000 == 0:
            state = oneup(state)

        n = chunk_len(iteration)
        if n > 1:
            cams = []
            for _ in range(n):
                if not viewpoint_stack:
                    viewpoint_stack = list(stack_template)
                cams.append(viewpoint_stack.pop(
                    rng.randint(0, len(viewpoint_stack) - 1)))
            key, k1 = jax.random.split(key)
            it0 = jnp.asarray(iteration, jnp.float32)
            warm = iteration < opt_cfg.warm_up
            state, dstate_out, aux = run_chunk(
                warm, state, None if warm else deform_state, cams, it0, k1,
                bg)
            if not warm:
                deform_state = dstate_out
            iteration += n - 1   # host events run for the LAST iteration
        else:
            if not viewpoint_stack:
                viewpoint_stack = list(stack_template)
            cam = viewpoint_stack.pop(rng.randint(0, len(viewpoint_stack) - 1))

            key, k1 = jax.random.split(key)
            it = jnp.asarray(iteration, jnp.float32)
            if iteration < opt_cfg.warm_up:
                state, _, aux = S["warm"](state, None, cam, it, k1, bg)
            else:
                aux_data = aux_data_fn(cam) if aux_data_fn is not None \
                    else None
                state, deform_state, aux = S["deform"](
                    state, deform_state, cam, it, k1, bg, aux_data)
        if pbar is not None:
            pbar.update(n)


        if iteration % log_every == 0 or iteration == 1:
            loss_val = float(aux.loss)
            maybe_retune_dup(aux, state.capacity)
            ema_loss = 0.4 * loss_val + 0.6 * ema_loss
            result.losses.append((iteration, loss_val))
            if tb_writer is not None:
                tb_writer.add_scalar("train_loss_patches/total_loss",
                                     loss_val, iteration)
                tb_writer.add_scalar("train_loss_patches/l1_loss",
                                     float(aux.l1), iteration)
                tb_writer.add_scalar("total_points", int(state.num_alive),
                                     iteration)
                # reference logs per-iteration wall time as iter_time
                # (train.py:360); here it amortizes async dispatch between
                # log points
                now = time.perf_counter()
                tb_writer.add_scalar(
                    "iter_time",
                    (now - _iter_t0) / max(iteration - _iter_last, 1) * 1e3,
                    iteration)
                _iter_t0, _iter_last = now, iteration
            if pbar is not None:
                pbar.set_postfix(loss=f"{ema_loss:.4f}",
                                 pts=int(state.num_alive))
            if live_hook is not None:
                live_hook(state, deform_state, field, iteration)

        if iteration in test_iterations:
            psnrs = []
            eval_imgs = []
            for tc in (test_cams or train_cams[:5]):
                out = eval_render(state, deform_state
                                  if iteration >= opt_cfg.warm_up else None,
                                  tc, bg)
                psnrs.append(float(psnr(jnp.clip(out.image, 0, 1),
                                        tc.image)))
                if len(eval_imgs) < 5:
                    eval_imgs.append((tc, out.image))
            mean_psnr = float(np.mean(psnrs))
            result.test_psnrs[iteration] = mean_psnr
            if tb_writer is not None:
                tb_writer.add_scalar("test/psnr", mean_psnr, iteration)
                # reference training_report logs the opacity histogram +
                # total point count at eval iterations (train.py:415-419)
                alive = np.asarray(state.alive)
                if alive.any():   # histogram of an empty array raises
                    tb_writer.add_histogram(
                        "scene/opacity_histogram",
                        np.asarray(state.get_opacity)[alive], iteration)
                # first 5 eval renders (+ gt once), train.py:400-407
                for vi, (tc, im) in enumerate(eval_imgs[:5]):
                    tb_writer.add_image(
                        f"test_view_{vi}/render",
                        np.clip(np.asarray(im), 0, 1), iteration,
                        dataformats="HWC")
                    if iteration == min(test_iterations or {iteration}):
                        tb_writer.add_image(
                            f"test_view_{vi}/ground_truth",
                            np.asarray(tc.image), iteration,
                            dataformats="HWC")
            if mean_psnr > result.best_psnr:
                result.best_psnr = mean_psnr
                result.best_iteration = iteration

        if iteration in save_iterations and model_path:
            from ..data.scene import save_gaussians_ply
            pc_dir = os.path.join(model_path, "point_cloud",
                                  f"iteration_{iteration}")
            os.makedirs(pc_dir, exist_ok=True)
            save_gaussians_ply(os.path.join(pc_dir, "point_cloud.ply"), state)
            save_deform_weights(model_path, iteration, deform_state)

        # cadence (densify/reset) AFTER report/save, matching the
        # reference order (train_baseline.py:157-182: report, save,
        # then densify) — eval at a reset iteration sees the
        # PRE-reset state
        if iteration < opt_cfg.densify_until_iter:
            if (iteration > opt_cfg.densify_from_iter
                    and iteration % opt_cfg.densification_interval == 0):
                # grow the padded buffer when densification fills it: the
                # TPU counterpart of the reference's dynamically-resized
                # tensors — one recompile per growth, a few per run
                if (int(state.num_alive) > 0.9 * state.capacity
                        and state.capacity < model_cfg.max_gaussians):
                    new_cap = min(
                        G._round_capacity(state.capacity * 2),
                        G._round_capacity(model_cfg.max_gaussians))
                    state = G.grow_capacity(state, new_cap)
                size_thresh = 20.0 if iteration > opt_cfg.opacity_reset_interval \
                    else 0.0
                key, k2 = jax.random.split(key)
                state = densify(state, k2, size_thresh,
                                jnp.asarray(cameras_extent))
                if int(state.num_alive) == 0:
                    print(f"WARNING: all gaussians pruned at iteration "
                          f"{iteration} (size/opacity thresholds wiped the "
                          f"scene — typically a blurry fit at the first "
                          f"max_screen_size prune; consider a shorter "
                          f"warm_up or later opacity_reset_interval)")
            if (iteration % opt_cfg.opacity_reset_interval == 0
                    or (model_cfg.white_background
                        and iteration == opt_cfg.densify_from_iter)):
                state = reset_opacity(state)

        iteration += 1

    if pbar is not None:
        pbar.close()
    result.state = state
    result.deform_state = deform_state
    return result
