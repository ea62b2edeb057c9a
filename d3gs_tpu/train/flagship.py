"""Flagship batched multi-camera / neural-ODE trainer.

Counterpart of the reference `train.py::training()` (:35-330): per iteration,
sample k = num_cams_per_iter cameras from a time-sorted (optionally
uniformly subsampled, `spread_out_sequence`) window stack, sort them by fid,
run the deformation field over the whole fid vector at once, render every
camera, and average the photometric loss; supports the batched-ODE field
(trajectories anchored at the window's first fid — torchode semantics),
alternating Gaussian/deform optimization with a decaying switch interval,
gaussian freezing via `base_model_path`, and the standard densify cadence.

TPU re-design notes:
  * the k-camera loop (train.py:224-251, sequential renders) becomes a
    `lax.map` over the stacked camera pytree inside ONE jitted step — one
    compile, one dispatch per iteration. (Both a vmap-batched render and a
    fully fused k-camera sort+blend — one global (cam, tile, depth) sort
    feeding one k*T-tile pallas grid — were built and measured SLOWER on a
    single chip across three rounds of kernel work, 31.8 vs 14.2 ms/cam at
    k=10 in round 5, and were removed: every M-scale op is linear in k
    either way and XLA's monolithic k*M sorts scale superlinearly;)
  * `max_batch_gaussians` micro-batching (train.py:165-198, an OOM
    workaround) is unnecessary: fixed-capacity buffers + checkpointed
    blending bound memory already, and the flag is accepted but ignored;
  * the reference accumulates `loss += (1-λ)·Ll1_running + λ·(1-ssim)`
    where Ll1_running is itself a running sum (train.py:245-247) — a bug
    that overweights early cameras' L1. We implement the evident intent:
    mean over cameras of (1-λ)·L1 + λ·DSSIM.
  * alternating optimization (train.py:296-321) compiles three step
    variants (both / gaussians-only / deform-only); the host flips between
    them on the decaying interval schedule.
"""
from __future__ import annotations

import os
import time
from dataclasses import dataclass
from random import Random

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelParams, OptimizationParams, PipelineParams
from ..data.cameras import Camera, stack_cameras
from ..models import gaussians as G
from ..models.deform import DeformFieldSpec, create_deform_field
from ..models.deform.fields import save_deform_weights
from ..models.renderer import render
from ..ops.losses import l1_loss, psnr, ssim
from .baseline import TrainResult, subsample_stack
from .step import densify_fns, make_eval_render


def pick_field_spec(model_cfg: ModelParams, opt_cfg) -> DeformFieldSpec:
    """Reference train.py:55-66 model selection."""
    if model_cfg.use_torch_ode:
        kind = "simple_start"
    elif model_cfg.is_ode:
        kind = "ode"
    else:
        kind = "baseline"
    return DeformFieldSpec(
        kind=kind, is_blender=model_cfg.is_blender,
        is_6dof=model_cfg.is_6dof, D=model_cfg.D, W=model_cfg.W,
        multires=model_cfg.multires, use_linear=model_cfg.use_linear,
        use_emb=model_cfg.use_emb, output_scale=model_cfg.output_scale,
        solver=getattr(model_cfg, "ode_solver", "rk4"),
        rtol=opt_cfg.rtol, atol=opt_cfg.atol,
        compute_dtype=getattr(model_cfg, "deform_dtype", "float32"))


def make_batched_step(*, opt_cfg, pipe_cfg, model_cfg, field,
                      update_gaussians: bool, update_deform: bool,
                      use_deform: bool):
    """Jitted k-camera step. Camera arrays carry a leading k axis."""
    lambda_dssim = opt_cfg.lambda_dssim
    direct = opt_cfg.direct_compute and field.spec.kind in (
        "ode", "simple", "simple_start")
    _train_prec = getattr(pipe_cfg, "train_matmul_precision", "highest")

    def render_one(st, cam, dx, dr, ds, tap, bg):
        out = render(
            st, cam, d_xyz=dx, d_rotation=dr, d_scaling=ds,
            is_6dof=model_cfg.is_6dof, direct_compute=direct and use_deform,
            bg=bg, means2d_tap=tap,
            tile_capacity=pipe_cfg.tile_capacity,
            tile_chunk=pipe_cfg.tile_chunk,
            bin_chunk=pipe_cfg.bin_chunk,
            binning=pipe_cfg.binning,
            dup_capacity=pipe_cfg.dup_capacity,
            antialias=pipe_cfg.antialias,
            depth_grad=getattr(pipe_cfg, "depth_grad", False))
        ll1 = l1_loss(out.image, cam.image)
        loss = (1 - lambda_dssim) * ll1 + lambda_dssim * (
            1 - ssim(out.image, cam.image))
        return loss, ll1, out.radii, jnp.max(out.counts)

    @jax.jit
    def step(state: G.GaussianState, deform_state, cams: Camera,
             iteration: jax.Array, key: jax.Array, bg: jax.Array,
             wts: jax.Array | None = None):
        # HIGHEST matmul precision for training — see train/step.py
        with jax.default_matmul_precision(_train_prec):
            return _step_impl(state, deform_state, cams, iteration, key, bg,
                              wts)

    def _step_impl(state, deform_state, cams, iteration, key, bg, wts=None):
        cap = state.capacity
        k = cams.fid.shape[0]
        # per-camera loss weights (ragged mesh batches pad by repeating
        # cameras; weighting each copy 1/dup makes the padded batch's loss
        # equal the unpadded mean — reference train.py:224-251 semantics)
        w = jnp.ones((k,)) if wts is None else wts
        wsum = jnp.sum(w)
        tap0 = jnp.zeros((cap, 2))

        # MLP deformation kinds evaluate each camera's fid independently, so
        # the eval moves INSIDE the per-camera scan: staging all k evals as
        # a (k, N, 3) buffer up front costs a dynamic-slice per camera plus
        # a dynamic-update-slice cotangent accumulation per camera in the
        # backward (~1.2 ms/cam at bench scale) and denies XLA the
        # MLP-with-render fusion the single-camera step enjoys. ODE kinds
        # integrate ONE trajectory through the sorted window (the whole
        # point of the batched trainer, reference train.py:144-213) and
        # stay staged.
        indep_evals = use_deform and field.spec.kind in ("baseline", "warp")

        def loss_fn(g_params, d_params, tap):
            st = state.replace(params=g_params)
            if use_deform and not indep_evals:
                xyz = jax.lax.stop_gradient(g_params.xyz)
                fids = jnp.sort(cams.fid)
                dxs, drs, dss = field.step_multi(d_params, xyz, fids,
                                                 y0=xyz)
            else:
                dxs = jnp.zeros((k, 1, 1))
                drs = dss = jnp.zeros((k, 1, 1))

            def per_cam(cam, dx, dr, ds):
                if indep_evals:
                    xyz = jax.lax.stop_gradient(g_params.xyz)
                    dx, dr, ds = field.step(d_params, xyz, cam.fid)
                    return render_one(st, cam, dx, dr, ds, tap, bg)
                if use_deform:
                    return render_one(st, cam, dx, dr, ds, tap, bg)
                return render_one(st, cam, 0.0, 0.0, 0.0, tap, bg)

            # lax.map (scan), NOT vmap — batching the pallas blend +
            # binning sorts across cameras via vmap measured ~2x slower
            # per camera than running them sequentially
            losses, ll1s, radii, ovf = jax.lax.map(
                lambda args: per_cam(*args), (cams, dxs, drs, dss))
            return jnp.sum(w * losses) / wsum, (
                jnp.sum(w * ll1s) / wsum,
                jnp.max(radii, axis=0), jnp.max(ovf))

        d_params = deform_state.params if deform_state is not None else None
        (loss, (ll1, radii, ovf)), grads = jax.value_and_grad(
            loss_fn, argnums=(0, 1, 2), has_aux=True)(
                state.params, d_params, tap0)
        g_grads, d_grads, tap_grad = grads

        if update_gaussians and not opt_cfg.freeze_gaussians:
            lrs = G.group_learning_rates(opt_cfg, iteration,
                                         state.spatial_lr_scale)
            new_params, new_opt = G.adam_step(state.params, g_grads,
                                              state.opt, lrs,
                                              mask=state.alive)
            state = state.replace(params=new_params, opt=new_opt)
            state = G.add_densification_stats(state, tap_grad, radii)

        if update_deform and deform_state is not None:
            deform_state = field.update(deform_state, d_grads, iteration)

        return state, deform_state, loss, ll1, ovf

    return step


@dataclass
class IterativeSchedule:
    """Alternating-update schedule (train.py:296-321): switch between
    updating deform-only and gaussians-only every `interval` iterations,
    decaying the interval by `decay` at each switch, for at most
    `max_switches` switches — then update both simultaneously."""
    enabled: bool
    interval: float
    decay: float
    max_switches: int
    switches_done: int = 0
    next_switch: float = 0.0
    phase_deform: bool = True

    def mode(self, iteration: int) -> tuple[bool, bool]:
        if not self.enabled or self.switches_done >= self.max_switches:
            return True, True
        if self.next_switch == 0.0:
            self.next_switch = self.interval
        if iteration >= self.next_switch:
            self.phase_deform = not self.phase_deform
            self.switches_done += 1
            self.interval *= self.decay
            self.next_switch = iteration + self.interval
        return (not self.phase_deform, self.phase_deform)


def train_flagship(
    *,
    gaussians: G.GaussianState,
    mesh=None,
    train_cams: list[Camera],
    test_cams: list[Camera],
    cameras_extent: float,
    model_cfg: ModelParams,
    opt_cfg: OptimizationParams,
    pipe_cfg: PipelineParams,
    base_model_frozen: bool = False,
    deform_state=None,
    field=None,
    test_iterations=(),
    save_iterations=(),
    model_path: str = "",
    seed: int = 0,
    log_every: int = 50,
    tb_writer=None,
    progress: bool = True,
) -> TrainResult:
    rng = Random(seed)
    key = jax.random.PRNGKey(seed)
    n_dev = int(np.prod(list(mesh.shape.values()))) if mesh is not None else 1

    if field is None:
        spec = pick_field_spec(model_cfg, opt_cfg)
        key, dkey = jax.random.split(key)
        deform_state, field = create_deform_field(spec, dkey, opt_cfg)

    bg = jnp.ones(3) if model_cfg.white_background else jnp.zeros(3)
    k_cams = opt_cfg.num_cams_per_iter
    gauss_tile = (mesh is not None
                  and getattr(pipe_cfg, "mesh_mode", "camera") == "gauss_tile")
    from ..parallel.mesh import CAM_AXIS
    cam_axis = CAM_AXIS if (gauss_tile and mesh is not None
                            and CAM_AXIS in mesh.shape) else None
    # batches must divide the camera-sharded axis: the full mesh for the
    # camera layout, the cam axis of a 2D gauss_tile mesh, 1 otherwise
    pad_to = (1 if gauss_tile else n_dev) if cam_axis is None \
        else mesh.shape[cam_axis]

    steps = {}

    def get_step(use_deform, upd_g, upd_d):
        keyt = (use_deform, upd_g, upd_d)
        if keyt not in steps:
            if mesh is not None and gauss_tile:
                # gauss+tile sharding: per-Gaussian state sharded on N,
                # tile rows sharded, cameras replicated; per-camera splat
                # all-gather pipelined against the blend (parallel/COMMS.md)
                from ..parallel.sharded import make_flagship_gauss_tile_step
                steps[keyt] = make_flagship_gauss_tile_step(
                    mesh, opt_cfg=opt_cfg, pipe_cfg=pipe_cfg,
                    model_cfg=model_cfg, field=field,
                    width=train_cams[0].width, height=train_cams[0].height,
                    use_deform=use_deform, update_gaussians=upd_g,
                    update_deform=upd_d, cam_axis=cam_axis)
            elif mesh is not None:
                # camera-axis data parallelism: params replicated, camera
                # batch sharded, one grad psum per step (parallel/sharded.py)
                from ..parallel.sharded import \
                    make_flagship_camera_parallel_step
                steps[keyt] = make_flagship_camera_parallel_step(
                    mesh, opt_cfg=opt_cfg, pipe_cfg=pipe_cfg,
                    model_cfg=model_cfg, field=field,
                    use_deform=use_deform, update_gaussians=upd_g,
                    update_deform=upd_d)
            else:
                steps[keyt] = make_batched_step(
                    opt_cfg=opt_cfg, pipe_cfg=pipe_cfg, model_cfg=model_cfg,
                    field=field, update_gaussians=upd_g, update_deform=upd_d,
                    use_deform=use_deform)
        return steps[keyt]

    def eval_deform_fn(d_params, xyz, fid, iteration, key_):
        return field.step(d_params, xyz, fid, y0=xyz)

    eval_render = make_eval_render(
        pipe_cfg=pipe_cfg, is_6dof=model_cfg.is_6dof,
        direct_compute=opt_cfg.direct_compute and field.spec.kind in (
            "ode", "simple", "simple_start"),
        deform_fn=eval_deform_fn)
    densify, reset_opacity, oneup = densify_fns(opt_cfg)

    schedule = IterativeSchedule(
        enabled=opt_cfg.use_iterative_update,
        interval=float(opt_cfg.iterative_update_interval),
        decay=opt_cfg.iterative_update_decay,
        max_switches=opt_cfg.max_training_switches)

    # multi-step dispatch (see train/baseline.py): up to spd iterations in
    # one jitted fori_loop between host events. The alternating-update
    # schedule makes per-iteration host decisions, so it forces spd=1.
    spd = max(1, int(getattr(pipe_cfg, "steps_per_dispatch", 1)))
    if opt_cfg.use_iterative_update:
        spd = 1

    _chunks = {}

    def run_chunk(step_fn, skey, state, dstate, batches, it0, key_):
        n, kk = len(batches), len(batches[0][0])
        flat = stack_cameras([c for b, _ in batches for c in b])
        chunk_cams = jax.tree.map(
            lambda x: x.reshape((n, kk) + x.shape[1:]), flat)
        chunk_wts = jnp.asarray(
            np.stack([w for _, w in batches]))            # (n, kk)
        ck = (skey, n, kk, state.capacity)
        if ck not in _chunks:
            @jax.jit
            def chunk(st0, dst0, cams_c, wts_c, i0, kc, bg_):
                z = jnp.float32(0)

                def body(i, carry):
                    st, dst, *_ = carry
                    cam_i = jax.tree.map(lambda x: x[i], cams_c)
                    return step_fn(st, dst, cam_i,
                                   i0 + i.astype(jnp.float32),
                                   jax.random.fold_in(kc, i), bg_,
                                   wts_c[i])

                return jax.lax.fori_loop(
                    0, n, body, (st0, dst0, z, z, jnp.int32(0)))

            _chunks[ck] = chunk
        return _chunks[ck](state, dstate, chunk_cams, chunk_wts, it0, key_,
                           bg)

    def _post_event(j):
        if j >= opt_cfg.iterations:
            return True
        if densify_allowed and j < opt_cfg.densify_until_iter:
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

    state = gaussians
    if mesh is not None:
        from ..parallel.mesh import replicate as _replicate
        from ..parallel.mesh import shard_gaussian_state as _shard_state
        state = _shard_state(state, mesh) if gauss_tile \
            else _replicate(state, mesh)
        deform_state = _replicate(deform_state, mesh)
    result = TrainResult(state=state, deform_state=deform_state)
    stack: list[Camera] = []
    densify_allowed = not base_model_frozen

    pbar = None
    if progress:
        from tqdm import tqdm
        pbar = tqdm(total=opt_cfg.iterations, desc="train[flagship]")

    def pick_batch():
        nonlocal stack
        if len(stack) < k_cams:
            full = sorted(train_cams, key=lambda c: float(c.fid))
            if opt_cfg.spread_out_sequence:
                full = subsample_stack(full, opt_cfg.sequence_length)
            stack = full
        n_pick = max(1, min(k_cams, len(stack)))
        picked = [stack.pop(rng.randint(0, len(stack) - 1))
                  for _ in range(n_pick)]
        # camera-sharded meshes: pad the batch to a multiple of the
        # camera axis by repeating cameras; each copy is weighted 1/dup
        # below so the padded loss equals the unpadded mean (a 1D
        # gauss_tile mesh replicates the batch — pad_to == 1)
        while mesh is not None and len(picked) % pad_to != 0:
            picked.append(picked[rng.randint(0, len(picked) - 1)])
        picked.sort(key=lambda c: float(c.fid))
        counts = {}
        for c in picked:
            counts[id(c)] = counts.get(id(c), 0) + 1
        wts = np.asarray([1.0 / counts[id(c)] for c in picked], np.float32)
        return picked, wts

    _iter_t0, _iter_last = time.perf_counter(), 0
    iteration = 1
    while iteration <= opt_cfg.iterations:
        if iteration % 1000 == 0:
            state = oneup(state)

        n = chunk_len(iteration)
        batches = [pick_batch() for _ in range(n)]   # [(cams, wts), ...]
        warm = iteration < opt_cfg.warm_up
        if warm:
            upd_g, upd_d, use_d = True, False, False
        else:
            upd_g, upd_d = schedule.mode(iteration)
            use_d = True
        step = get_step(use_d, upd_g, upd_d)

        key, k1 = jax.random.split(key)
        if n > 1 and len({len(b) for b, _ in batches}) == 1:
            it0 = jnp.asarray(iteration, jnp.float32)
            state, dstate_out, loss, ll1, ovf = run_chunk(
                step, (use_d, upd_g, upd_d), state,
                None if warm else deform_state, batches, it0, k1)
            if not warm:
                deform_state = dstate_out
        else:
            # ragged batch sizes (tiny datasets): run the picked batches
            # one dispatch each — chunk_len guarantees no interior events
            for bi, (b, bw) in enumerate(batches):
                cam_batch = stack_cameras(b)
                wts_b = jnp.asarray(bw)
                it = jnp.asarray(iteration + bi, jnp.float32)
                kb = jax.random.fold_in(k1, bi)
                if warm:
                    state, _, loss, ll1, ovf = step(state, None, cam_batch,
                                                    it, kb, bg, wts_b)
                else:
                    state, deform_state, loss, ll1, ovf = step(
                        state, deform_state, cam_batch, it, kb, bg, wts_b)
        iteration += n - 1
        if pbar is not None:
            pbar.update(n)


        if iteration % log_every == 0 or iteration == 1:
            lv = float(loss)
            result.losses.append((iteration, lv))
            if tb_writer is not None:
                tb_writer.add_scalar("train_loss_patches/total_loss", lv,
                                     iteration)
                tb_writer.add_scalar("total_points", int(state.num_alive),
                                     iteration)
                # reference iter_time scalar (train.py:360); amortized over
                # the async-dispatched span between log points
                now = time.perf_counter()
                tb_writer.add_scalar(
                    "iter_time",
                    (now - _iter_t0) / max(iteration - _iter_last, 1) * 1e3,
                    iteration)
                _iter_t0, _iter_last = now, iteration
            if pbar is not None:
                pbar.set_postfix(loss=f"{lv:.4f}",
                                 pts=int(state.num_alive))

        if iteration in test_iterations:
            psnrs = []
            eval_imgs = []
            for tc in (test_cams or train_cams[:5]):
                out = eval_render(state,
                                  None if iteration < opt_cfg.warm_up
                                  else deform_state, tc, bg)
                psnrs.append(float(psnr(jnp.clip(out.image, 0, 1),
                                        tc.image)))
                if len(eval_imgs) < 5:
                    eval_imgs.append((tc, out.image))
            mean_psnr = float(np.mean(psnrs))
            result.test_psnrs[iteration] = mean_psnr
            if tb_writer is not None:
                tb_writer.add_scalar("test/psnr", mean_psnr, iteration)
                alive = np.asarray(state.alive)
                if alive.any():   # histogram of an empty array raises
                    tb_writer.add_histogram(
                        "scene/opacity_histogram",
                        np.asarray(state.get_opacity)[alive], iteration)
                for vi, (tc, im) in enumerate(eval_imgs):
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
            save_gaussians_ply(os.path.join(pc_dir, "point_cloud.ply"),
                               state)
            save_deform_weights(model_path, iteration, deform_state)

        if densify_allowed and iteration < opt_cfg.densify_until_iter:
            if (iteration > opt_cfg.densify_from_iter
                    and iteration % opt_cfg.densification_interval == 0):
                # capacity growth schedule (see train/baseline.py)
                if (int(state.num_alive) > 0.9 * state.capacity
                        and state.capacity < model_cfg.max_gaussians):
                    state = G.grow_capacity(state, min(
                        G._round_capacity(state.capacity * 2),
                        G._round_capacity(model_cfg.max_gaussians)))
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
