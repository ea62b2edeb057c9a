"""Sharded rendering + training over a device mesh (shard_map).

Pipeline per step (see mesh.py for the layout rationale):

  deform MLP + activations        — GSPMD auto-parallel (N sharded, params
                                    replicated; XLA inserts the psum dual on
                                    the backward pass)
  EWA preprocess                  — inside shard_map, local N/D rows
  all_gather(projected splats)    — ICI; ~44 B/Gaussian of screen-space data
  bin + blend my tile rows        — local; each chip owns an image strip
  strips → full image             — shard_map out_specs concatenation
  loss + backward                 — GSPMD on the row-sharded image; grads
                                    reverse through the same collectives

Only the rasterizer core lives inside `shard_map`: its scatter-based binning
is the one stage XLA's automatic partitioner cannot split well. Everything
else (MLP, Adam, densify) is plain jit over sharded arrays.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..data.cameras import Camera
from ..models import gaussians as G
from ..ops.binning import (bin_splats, bin_splats_records,
                           bin_splats_sorted)
from ..ops.losses import l1_loss, ssim, ssim_map
from ..ops.projection import TILE, project_gaussians
from ..ops.rasterize import (blend, blend_records, pack_records,
                             pack_records_full, unpack_records_full)
from ..ops.sh import eval_sh_upto
from ..ops.transforms import apply_se3
from .mesh import AXIS


def _cdiv(a, b):
    return -(-a // b)


def make_sharded_render(mesh: Mesh, *, width: int, height: int,
                        pipe_cfg, axis: str = AXIS):
    """Build render_fn(means3d, scales, rotations, colors, opacities, alive,
    camera, bg, means2d_tap) -> (image (H,W,3) row-sharded, depth, alpha,
    radii, counts). Scales/rotations (activated) feed the factored EWA path.

    Per-Gaussian inputs must be sharded on their leading axis over `axis`.
    """
    n_dev = mesh.shape[axis]
    tiles_x = _cdiv(width, TILE)
    tiles_y_total = _cdiv(height, TILE)
    tiles_y_local = _cdiv(tiles_y_total, n_dev)
    strip_h = tiles_y_local * TILE
    full_h = strip_h * n_dev

    def shard_fn(means3d, scales, rotations, colors, opac, alive, tap,
                 viewmatrix, projmatrix, tanfov, bg):
        splats_l = project_gaussians(
            means3d, None, opac, colors, viewmatrix, projmatrix,
            tanfov[0], tanfov[1], width, height,
            antialias=pipe_cfg.antialias, alive=alive,
            scales=scales, rotations=rotations)
        splats_l = splats_l._replace(means2d=splats_l.means2d + tap)
        radii_l = splats_l.radii
        # gather projected splats from all shards (concat on N axis).
        # Differentiable: the AD transpose of all_gather is reduce-scatter,
        # so every Gaussian receives blend gradients from ALL image strips.
        splats = jax.tree.map(
            lambda x: jax.lax.all_gather(x, axis, tiled=True), splats_l)
        my = jax.lax.axis_index(axis)
        ty0 = my * tiles_y_local
        binning = pipe_cfg.binning
        if binning == "auto":
            binning = "pallas" if jax.default_backend() == "tpu" \
                else "packed"
        if binning == "pallas":
            from ..ops.pallas_blend import blend_records_pallas
            rbins = bin_splats_records(
                jax.lax.stop_gradient(splats), tiles_x=tiles_x,
                tiles_y=tiles_y_local, dup_capacity=pipe_cfg.dup_capacity,
                tile_y0=ty0, tight_cull=pipe_cfg.tight_cull)
            img, dep, alp = blend_records_pallas(
                pack_records(splats), rbins, bg, tiles_x=tiles_x,
                tiles_y=tiles_y_local, width=width, height=strip_h,
                interpret=jax.default_backend() != "tpu", tile_y0=ty0)
            return img, dep, alp, radii_l, rbins.counts
        if binning == "packed":
            rbins = bin_splats_records(
                jax.lax.stop_gradient(splats), tiles_x=tiles_x,
                tiles_y=tiles_y_local, dup_capacity=pipe_cfg.dup_capacity,
                tile_y0=ty0)
            img, dep, alp = blend_records(
                pack_records(splats), rbins, bg, tiles_x=tiles_x,
                tiles_y=tiles_y_local, width=width, height=strip_h,
                tile_capacity=pipe_cfg.tile_capacity,
                tile_chunk=pipe_cfg.tile_chunk, tile_y0=ty0)
            return img, dep, alp, radii_l, rbins.counts
        if binning == "sort":
            bins = bin_splats_sorted(
                jax.lax.stop_gradient(splats), tiles_x=tiles_x,
                tiles_y=tiles_y_local, capacity=pipe_cfg.tile_capacity,
                dup_capacity=pipe_cfg.dup_capacity, tile_y0=ty0)
        else:
            bins = bin_splats(
                jax.lax.stop_gradient(splats), tiles_x=tiles_x,
                tiles_y=tiles_y_local, capacity=pipe_cfg.tile_capacity,
                chunk=pipe_cfg.bin_chunk, tile_y0=ty0)
        img, dep, alp = blend(splats, bins, bg, tiles_x=tiles_x,
                              tiles_y=tiles_y_local, width=width,
                              height=strip_h, tile_chunk=pipe_cfg.tile_chunk,
                              tile_y0=ty0)
        return img, dep, alp, radii_l, bins.counts

    smapped = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis), P(axis),
                  P(axis), P(), P(), P(), P()),
        out_specs=(P(axis), P(axis), P(axis), P(axis), P(axis)),
        check_vma=False)

    def render_fn(means3d, scales, rotations, colors, opacities, alive,
                  camera: Camera, bg, means2d_tap):
        tanfov = jnp.asarray([camera.tanfovx, camera.tanfovy], jnp.float32)
        img, dep, alp, radii, counts = smapped(
            means3d, scales, rotations, colors, opacities, alive,
            means2d_tap, camera.viewmatrix, camera.projmatrix, tanfov, bg)
        return (img[:height], dep[:height], alp[:height], radii, counts)

    return render_fn


class ShardedAux(NamedTuple):
    loss: jax.Array
    l1: jax.Array
    radii: jax.Array


def make_sharded_train_step(mesh: Mesh, *, opt_cfg, pipe_cfg,
                            width: int, height: int,
                            field=None, is_6dof: bool = False,
                            direct_compute: bool = False,
                            axis: str = AXIS):
    """Full jitted+sharded train step: deform (GSPMD) → sharded render →
    loss → backward → Adam. Mirrors train/step.py for the mesh case."""
    render_fn = make_sharded_render(mesh, width=width, height=height,
                                    pipe_cfg=pipe_cfg, axis=axis)
    lambda_dssim = opt_cfg.lambda_dssim
    use_deform = field is not None
    _train_prec = getattr(pipe_cfg, "train_matmul_precision", "highest")

    def loss_fn(g_params, d_params, tap, state, camera, bg):
        st = state.replace(params=g_params)
        xyz = g_params.xyz
        if use_deform:
            dx, dr, ds = field.step(d_params, jax.lax.stop_gradient(xyz),
                                    camera.fid)
            if direct_compute and isinstance(dx, jax.Array) and dx.ndim >= 2:
                means3d = dx
            else:
                means3d = xyz + dx
        else:
            means3d = xyz
            dr, ds = 0.0, 0.0
        scales = st.get_scaling + ds
        rots = st.get_rotation + dr
        opac = st.get_opacity[:, 0]
        dirs = means3d - camera.campos[None]
        dirs = dirs / jnp.maximum(
            jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-8)
        colors = jnp.maximum(eval_sh_upto(st.max_sh_degree,
                                          st.active_sh_degree,
                                          st.get_features, dirs) + 0.5, 0.0)
        img, dep, alp, radii, counts = render_fn(
            means3d, scales, rots, colors, opac, st.alive, camera, bg, tap)
        ll1 = l1_loss(img, camera.image)
        loss = (1 - lambda_dssim) * ll1 + lambda_dssim * (
            1 - ssim(img, camera.image))
        return loss, (ll1, radii)

    @jax.jit
    def step(state: G.GaussianState, deform_state, camera: Camera,
             iteration, bg):
        # HIGHEST matmul precision for training — see train/step.py
        with jax.default_matmul_precision(_train_prec):
            return _step_impl(state, deform_state, camera, iteration, bg)

    def _step_impl(state, deform_state, camera, iteration, bg):
        tap0 = jnp.zeros((state.capacity, 2))
        d_params = deform_state.params if use_deform else None
        (loss, (ll1, radii)), (g_grads, d_grads, tap_grad) = \
            jax.value_and_grad(loss_fn, argnums=(0, 1, 2), has_aux=True)(
                state.params, d_params, tap0, state, camera, bg)
        lrs = G.group_learning_rates(opt_cfg, iteration,
                                     state.spatial_lr_scale)
        new_params, new_opt = G.adam_step(state.params, g_grads, state.opt,
                                          lrs, mask=state.alive)
        state = state.replace(params=new_params, opt=new_opt)
        state = G.add_densification_stats(state, tap_grad, radii)
        if use_deform:
            deform_state = field.update(deform_state, d_grads, iteration)
        return state, deform_state, ShardedAux(loss=loss, l1=ll1,
                                               radii=radii)

    return step


def make_flagship_gauss_tile_step(
        mesh: Mesh, *, opt_cfg, pipe_cfg, model_cfg, field,
        width: int, height: int, use_deform: bool = True,
        update_gaussians: bool = True, update_deform: bool = True,
        axis: str = AXIS, cam_axis: str | None = None):
    """k-camera flagship step with Gaussians + tile rows sharded (the
    gauss+tile layout of `make_sharded_train_step`, extended to the batched
    trainer). Unlike the camera-parallel step below, the CAMERA batch is
    replicated and the model axes are sharded:

      * per-Gaussian state (params, Adam moments, densify stats) sharded on
        the capacity axis — deform MLP + activations + SH + EWA projection
        run on N/D local rows per camera (GSPMD outside, shard_map inside);
      * per camera, the projected splats (~64 B/Gaussian) are all-gathered
        over ICI and each device bins + blends its own strip of tile rows;
      * the k cameras run under one `lax.scan` that **software-pipelines
        the collective**: iteration c starts camera c+1's all-gather before
        blending camera c, so XLA's async collectives can overlap the
        gather with the Pallas blend (double buffering — the classic
        weight-prefetch pattern, here applied to splats);
      * the loss runs under GSPMD on the row-sharded (k, H, W, 3) images
        (XLA inserts SSIM-blur halo exchanges), and gradients reverse
        through the same collectives (all_gather ↔ reduce_scatter duals).

    Per-step comms volume (see parallel/COMMS.md for the full model):
    k · N · 64 B of splats all-gather (+ its reduce-scatter dual in the
    backward) — independent of device count along a ring — versus the
    camera-parallel step's per-step parameter psum of ~236 B/Gaussian.
    Gauss+tile therefore wins when k is small or N is huge (memory-bound
    scenes); camera-parallel wins at large k. Both are exact.

    No ragged padding is needed (cameras are not sharded): any k works and
    `wts` (if given) only reweights the camera mean.

    With `cam_axis` set (a 2D mesh from mesh.make_mesh_2d), the camera
    batch ALSO shards over `cam_axis` — the composed layout: camera data
    parallelism across groups (one grad psum, DCN-tolerant) × gauss+tile
    model parallelism within each group (splat all-gather on ICI). k must
    then divide by mesh.shape[cam_axis] (the flagship trainer pads with
    1/dup-weighted repeats exactly as for the camera layout).

    Returns step(state, deform_state, cams, iteration, key, bg, wts) with
    the same signature/semantics as the camera-parallel step (reference
    loss semantics train.py:224-251).
    """
    n_dev = mesh.shape[axis]
    tiles_x = _cdiv(width, TILE)
    tiles_y_total = _cdiv(height, TILE)
    tiles_y_local = _cdiv(tiles_y_total, n_dev)
    strip_h = tiles_y_local * TILE
    lambda_dssim = opt_cfg.lambda_dssim
    direct = opt_cfg.direct_compute and field.spec.kind in (
        "ode", "simple", "simple_start")
    _train_prec = getattr(pipe_cfg, "train_matmul_precision", "highest")

    halo = 11 // 2          # SSIM window half-width
    assert strip_h >= halo, (
        f"image strips of {strip_h} rows are thinner than the SSIM halo "
        f"({halo}); use fewer devices for {height}px images")

    def shard_fn(means3d_k, scales_k, rots_k, colors_k, opac, alive, tap,
                 gt_k, viewmats, projmats, tanfov, bg):
        k = viewmats.shape[0]

        def project_one(c):
            s = project_gaussians(
                means3d_k[c], None, opac, colors_k[c], viewmats[c],
                projmats[c], tanfov[0], tanfov[1], width, height,
                antialias=pipe_cfg.antialias, alive=alive,
                scales=scales_k[c], rotations=rots_k[c])
            s = s._replace(means2d=s.means2d + tap)
            # one packed (Nl, 16) row per splat: blend lanes + tile rect +
            # visibility, so the per-camera collective is ONE all-gather
            # instead of the nine-leaf ProjectedSplats tree
            return pack_records_full(s), s.radii

        # local N/D-row projections for all local cameras (no comms)
        recs_all, radii_all = jax.lax.map(project_one, jnp.arange(k))
        radii_l = jnp.max(radii_all, axis=0)                 # (Nl,)
        if cam_axis is not None:
            radii_l = jax.lax.pmax(radii_l, cam_axis)

        def take(c):
            return recs_all[c]

        def gather(rec):
            return jax.lax.all_gather(rec, axis, tiled=True)

        binning = pipe_cfg.binning
        if binning == "auto":
            binning = "pallas" if jax.default_backend() == "tpu" \
                else "packed"
        my = jax.lax.axis_index(axis)
        ty0 = my * tiles_y_local

        def blend_one(rec):
            splats = unpack_records_full(jax.lax.stop_gradient(rec))
            if binning == "pallas":
                from ..ops.pallas_blend import blend_records_pallas
                rbins = bin_splats_records(
                    splats, tiles_x=tiles_x, tiles_y=tiles_y_local,
                    dup_capacity=pipe_cfg.dup_capacity, tile_y0=ty0,
                    tight_cull=pipe_cfg.tight_cull)
                img, _, _ = blend_records_pallas(
                    rec, rbins, bg, tiles_x=tiles_x,
                    tiles_y=tiles_y_local, width=width, height=strip_h,
                    interpret=jax.default_backend() != "tpu", tile_y0=ty0,
                    depth_grad=getattr(pipe_cfg, "depth_grad", False))
            else:
                rbins = bin_splats_records(
                    splats, tiles_x=tiles_x, tiles_y=tiles_y_local,
                    dup_capacity=pipe_cfg.dup_capacity, tile_y0=ty0)
                img, _, _ = blend_records(
                    rec, rbins, bg, tiles_x=tiles_x,
                    tiles_y=tiles_y_local, width=width, height=strip_h,
                    tile_capacity=pipe_cfg.tile_capacity,
                    tile_chunk=pipe_cfg.tile_chunk, tile_y0=ty0)
            return img, jnp.max(rbins.counts)

        def body(carry, c):
            g_cur = carry
            # prefetch camera c+1's splats: independent of the blend below,
            # so the async all-gather rides ICI while the MXU/VPU blends
            # camera c (the final iteration re-gathers k-1; one wasted
            # gather in k keeps the scan body uniform)
            g_nxt = gather(take(jnp.minimum(c + 1, k - 1)))
            img, cnt = blend_one(g_cur)
            return g_nxt, (img, cnt)

        _, (imgs, cnts) = jax.lax.scan(body, gather(take(0)),
                                       jnp.arange(k))
        ovf = jax.lax.pmax(
            jnp.max(cnts),
            axis if cam_axis is None else (axis, cam_axis))

        # ---- strip-local photometric loss with explicit halo exchange ----
        # Blurring the row-sharded image under GSPMD turns the banded-
        # matmul SSIM blur into a full-image all-reduce (measured by
        # tools/scaling_model.py). Instead each device blurs its strip
        # extended by `halo` rows of true neighbor pixels (2 ppermutes of
        # 5·W·3 floats per camera) and psums scalar partial sums — the
        # rendered strips never leave the device. Rows past `height`
        # (tile-rounding pad) are zeroed so the crop equals the full-image
        # map (SAME zero padding; outermost strips receive ppermute zeros).
        rows = my * strip_h + jnp.arange(strip_h)
        rmask = (rows < height).astype(imgs.dtype)[None, :, None, None]
        im = imgs * rmask
        gt = gt_k * rmask
        perm_dn = [(i, i + 1) for i in range(n_dev - 1)]
        perm_up = [(i + 1, i) for i in range(n_dev - 1)]

        def halo_ext(x):
            top = jax.lax.ppermute(x[:, -halo:], axis, perm_dn)
            bot = jax.lax.ppermute(x[:, :halo], axis, perm_up)
            return jnp.concatenate([top, x, bot], axis=1)

        ime, gte = halo_ext(im), halo_ext(gt)

        def per_cam_sums(c):
            m = ssim_map(ime[c], gte[c])[halo:-halo]
            return (jnp.sum(jnp.abs(im[c] - gt[c])),
                    jnp.sum(m * rmask[0]))

        l1s, ssims = jax.lax.map(per_cam_sums, jnp.arange(k))
        l1s = jax.lax.psum(l1s, axis)
        ssims = jax.lax.psum(ssims, axis)
        return l1s, ssims, radii_l, ovf

    ca = cam_axis            # None -> cameras replicated over the mesh
    smapped = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(ca, axis), P(ca, axis), P(ca, axis),
                  P(ca, axis), P(axis), P(axis), P(axis),
                  P(ca, axis), P(ca), P(ca), P(), P()),
        out_specs=(P(ca), P(ca), P(axis), P()),
        check_vma=False)

    def loss_fn(g_params, d_params, tap, state, cams, bg, wts):
        st = state.replace(params=g_params)
        k = cams.fid.shape[0]
        xyz = g_params.xyz
        if use_deform:
            sxyz = jax.lax.stop_gradient(xyz)
            dxs, drs, dss = field.step_multi(d_params, sxyz,
                                             jnp.sort(cams.fid), y0=sxyz)
            if direct and isinstance(dxs, jax.Array) and dxs.ndim >= 3:
                means3d_k = dxs
            elif model_cfg.is_6dof and isinstance(dxs, jax.Array) \
                    and dxs.ndim == 4:
                # 6DoF: dxs is a per-camera batch of per-Gaussian SE(3)
                # mats (T, N, 4, 4); compose on the (sharded) Gaussian rows
                # BEFORE projection (reference
                # gaussian_renderer/__init__.py:71-76). The screw-axis head
                # is per-Gaussian, so GSPMD shards the composition on the
                # capacity axis like every other per-Gaussian op.
                means3d_k = jax.vmap(lambda m: apply_se3(m, xyz))(dxs)
            else:
                means3d_k = xyz[None] + dxs
        else:
            means3d_k = jnp.broadcast_to(xyz[None], (k,) + xyz.shape)
            drs = dss = jnp.zeros((k, 1, 1))
        scales_k = jnp.broadcast_to(st.get_scaling[None] + dss,
                                    (k,) + st.get_scaling.shape)
        rots_k = jnp.broadcast_to(st.get_rotation[None] + drs,
                                  (k,) + st.get_rotation.shape)
        opac = st.get_opacity[:, 0]
        dirs = means3d_k - cams.campos[:, None]
        dirs = dirs / jnp.maximum(
            jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-8)
        colors_k = jnp.maximum(
            jax.vmap(lambda d: eval_sh_upto(
                st.max_sh_degree, st.active_sh_degree,
                st.get_features, d))(dirs) + 0.5, 0.0)
        tanfov = jnp.asarray([cams.tanfovx, cams.tanfovy], jnp.float32)
        gt_pad = jnp.pad(cams.image,
                         ((0, 0), (0, strip_h * n_dev - height),
                          (0, 0), (0, 0)))
        l1sums, ssimsums, radii, ovf = smapped(
            means3d_k, scales_k, rots_k, colors_k, opac, st.alive, tap,
            gt_pad, cams.viewmatrix, cams.projmatrix, tanfov, bg)
        npix = float(height * width * 3)
        ll1s = l1sums / npix
        ssims = ssimsums / npix
        losses = (1 - lambda_dssim) * ll1s + lambda_dssim * (1 - ssims)
        wsum = jnp.sum(wts)
        loss = jnp.sum(wts * losses) / wsum
        ll1 = jnp.sum(wts * ll1s) / wsum
        return loss, (ll1, radii, ovf)

    @jax.jit
    def step(state: G.GaussianState, deform_state, cams: Camera,
             iteration, key, bg, wts: jax.Array | None = None):
        # HIGHEST matmul precision for training — see train/step.py
        with jax.default_matmul_precision(_train_prec):
            return _step_impl(state, deform_state, cams, iteration, key, bg,
                              wts)

    def _step_impl(state, deform_state, cams, iteration, key, bg, wts=None):
        tap0 = jnp.zeros((state.capacity, 2))
        d_params = deform_state.params if deform_state is not None else None
        w = jnp.ones_like(cams.fid) if wts is None else wts

        def wrapped(gp, dp, tap):
            return loss_fn(gp, dp, tap, state, cams, bg, w)

        (loss, (ll1, radii, ovf)), (g_grads, d_grads, tap_grad) = \
            jax.value_and_grad(wrapped, argnums=(0, 1, 2), has_aux=True)(
                state.params, d_params, tap0)
        if update_gaussians and not opt_cfg.freeze_gaussians:
            lrs = G.group_learning_rates(opt_cfg, iteration,
                                         state.spatial_lr_scale)
            new_params, new_opt = G.adam_step(state.params, g_grads,
                                              state.opt, lrs,
                                              mask=state.alive)
            state = state.replace(params=new_params, opt=new_opt)
            state = G.add_densification_stats(state, tap_grad, radii)
        if update_deform and use_deform and deform_state is not None:
            deform_state = field.update(deform_state, d_grads, iteration)
        return state, deform_state, loss, ll1, ovf

    return step


def make_flagship_camera_parallel_step(
        mesh: Mesh, *, opt_cfg, pipe_cfg, model_cfg, field,
        use_deform: bool = True, update_gaussians: bool = True,
        update_deform: bool = True, axis: str = AXIS):
    """Camera-axis data parallelism for the flagship k-camera step: params
    (Gaussians + deform MLP) replicated, the camera batch sharded over the
    mesh, each device rendering its k/D cameras with the ordinary
    single-chip pipeline, losses/gradients combined with one psum per
    backward. This is the production multi-chip layout for k-camera
    training: zero communication in the render itself (the k cameras are
    independent), so scaling efficiency is bounded only by the gradient
    psum (~the parameter size) per step — unlike the gauss+tile-sharded
    path above, which all-gathers projected splats every step.

    Cameras per iteration must divide the mesh size. For ODE deformation
    fields each device anchors its trajectory at its local sub-window's
    first fid (the solver evaluates the same IVP at a subset of times, so
    values agree within solver tolerance).

    Returns step(state, deform_state, cams, iteration, key, bg) where every
    array leaf of `cams` leads with the (global) camera axis.
    """
    from ..models.renderer import render
    lambda_dssim = opt_cfg.lambda_dssim
    direct = opt_cfg.direct_compute and field.spec.kind in (
        "ode", "simple", "simple_start")
    n_dev = mesh.shape[axis]
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

    def local_loss(g_params, d_params, tap, state, cams_l, bg, wts_l):
        st = state.replace(params=g_params)
        k_local = cams_l.fid.shape[0]
        if use_deform:
            xyz = jax.lax.stop_gradient(g_params.xyz)
            dxs, drs, dss = field.step_multi(d_params, xyz,
                                             jnp.sort(cams_l.fid), y0=xyz)
        else:
            dxs = jnp.zeros((k_local, 1, 1))
            drs = dss = jnp.zeros((k_local, 1, 1))

        def per_cam(args):
            cam, dx, dr, ds = args
            if use_deform:
                return render_one(st, cam, dx, dr, ds, tap, bg)
            return render_one(st, cam, 0.0, 0.0, 0.0, tap, bg)

        losses, ll1s, radii, ovf = jax.lax.map(
            per_cam, (cams_l, dxs, drs, dss))
        # weighted mean: ragged batches pad by repeating cameras, each copy
        # weighted 1/dup so the result equals the unpadded single-device
        # mean (reference loss semantics, train.py:224-251)
        wsum = jax.lax.psum(jnp.sum(wts_l), axis)
        loss = jax.lax.psum(jnp.sum(wts_l * losses), axis) / wsum
        ll1 = jax.lax.psum(jnp.sum(wts_l * ll1s), axis) / wsum
        radii_max = jax.lax.pmax(jnp.max(radii, axis=0), axis)   # (N,)
        ovf_max = jax.lax.pmax(jnp.max(ovf), axis)
        return loss, ll1, radii_max, ovf_max

    smap = jax.shard_map(
        local_loss, mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(axis), P(), P(axis)),
        out_specs=(P(), P(), P(), P()),
        check_vma=False)

    @jax.jit
    def step(state: G.GaussianState, deform_state, cams: Camera,
             iteration, key, bg, wts: jax.Array | None = None):
        # HIGHEST matmul precision for training — see train/step.py
        with jax.default_matmul_precision(_train_prec):
            return _step_impl(state, deform_state, cams, iteration, key, bg,
                              wts)

    def _step_impl(state, deform_state, cams, iteration, key, bg, wts=None):
        tap0 = jnp.zeros((state.capacity, 2))
        d_params = deform_state.params if deform_state is not None else None
        w = jnp.ones_like(cams.fid) if wts is None else wts

        def loss_fn(gp, dp, tap):
            loss, ll1, radii, ovf = smap(gp, dp, tap, state, cams, bg, w)
            return loss, (ll1, radii, ovf)

        (loss, (ll1, radii, ovf)), (g_grads, d_grads, tap_grad) = \
            jax.value_and_grad(loss_fn, argnums=(0, 1, 2), has_aux=True)(
                state.params, d_params, tap0)
        if update_gaussians and not opt_cfg.freeze_gaussians:
            lrs = G.group_learning_rates(opt_cfg, iteration,
                                         state.spatial_lr_scale)
            new_params, new_opt = G.adam_step(state.params, g_grads,
                                              state.opt, lrs,
                                              mask=state.alive)
            state = state.replace(params=new_params, opt=new_opt)
            state = G.add_densification_stats(state, tap_grad, radii)
        if update_deform and use_deform and deform_state is not None:
            deform_state = field.update(deform_state, d_grads, iteration)
        return state, deform_state, loss, ll1, ovf

    return step
