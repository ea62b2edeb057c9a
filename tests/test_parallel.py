"""Multi-device sharding tests on the 8-device CPU mesh (conftest forces
XLA_FLAGS=--xla_force_host_platform_device_count=8)."""
import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from d3gs_tpu.config import ModelParams, OptimizationParams, PipelineParams
from d3gs_tpu.models import gaussians as G
from d3gs_tpu.models.deform import DeformFieldSpec, create_deform_field
from d3gs_tpu.models.renderer import render
from d3gs_tpu.parallel.mesh import make_mesh, replicate, shard_gaussian_state
from d3gs_tpu.parallel.sharded import (make_sharded_render,
                                       make_sharded_train_step)
from tests.test_train_static import gt_state, make_camera


@pytest.fixture(scope="module")
def mesh():
    assert jax.device_count() >= 8, "conftest must provide 8 CPU devices"
    return make_mesh(jax.devices()[:8])


def test_sharded_render_matches_single_device(mesh):
    cap = 1024
    gt = gt_state(n=150, cap=cap)
    cam = make_camera(0.3, width=64, height=64)
    bg = jnp.array([0.1, 0.2, 0.3])

    pipe_cfg = PipelineParams(tile_capacity=256, tile_chunk=8)
    single = render(gt, cam, bg=bg, tile_capacity=256, tile_chunk=8)

    st = shard_gaussian_state(gt, mesh)
    render_fn = make_sharded_render(mesh, width=64, height=64,
                                    pipe_cfg=pipe_cfg)
    colors = jnp.broadcast_to(jnp.array([0.5, 0.5, 0.5]), (cap, 3))
    # use constant colors both paths for comparison
    single_c = render(gt, cam, bg=bg, tile_capacity=256, tile_chunk=8,
                      override_color=colors)
    img, dep, alp, radii, counts = jax.jit(render_fn)(
        st.params.xyz, st.get_scaling, st.params.rotation, colors,
        st.get_opacity[:, 0], st.alive, cam, bg, jnp.zeros((cap, 2)))
    np.testing.assert_allclose(np.asarray(img), np.asarray(single_c.image),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(dep), np.asarray(single_c.depth),
                               atol=1e-4)
    np.testing.assert_array_equal(np.asarray(radii),
                                  np.asarray(single_c.radii))


def test_sharded_gradients_match_single_device(mesh):
    """The all-gather/reduce-scatter pair must deliver full-image gradients
    to every shard's Gaussians."""
    cap = 1024
    gt = gt_state(n=100, cap=cap)
    cam = make_camera(0.0, width=48, height=48)
    bg = jnp.zeros(3)
    pipe_cfg = PipelineParams(tile_capacity=256, tile_chunk=8)
    colors = jnp.broadcast_to(jnp.array([0.7, 0.4, 0.2]), (cap, 3))

    def loss_single(xyz):
        st2 = gt.replace(params=gt.params._replace(xyz=xyz))
        out = render(st2, cam, bg=bg, tile_capacity=256, tile_chunk=8,
                     override_color=colors)
        return jnp.sum(out.image ** 2)

    g_single = jax.grad(loss_single)(gt.params.xyz)

    st = shard_gaussian_state(gt, mesh)
    render_fn = make_sharded_render(mesh, width=48, height=48,
                                    pipe_cfg=pipe_cfg)
    def loss_sharded(xyz):
        img, *_ = render_fn(xyz, st.get_scaling, st.params.rotation,
                            colors, st.get_opacity[:, 0],
                            st.alive, cam, bg, jnp.zeros((cap, 2)))
        return jnp.sum(img ** 2)

    g_sharded = jax.jit(jax.grad(loss_sharded))(st.params.xyz)
    # float-accumulation-order tolerance (custom-VJP suffix sums vs AD)
    np.testing.assert_allclose(np.asarray(g_sharded),
                               np.asarray(g_single), rtol=1e-3, atol=1e-4)


def test_sharded_train_step_runs_and_reduces_loss(mesh):
    cap = 1024
    gt = gt_state(n=150, cap=cap)
    bg = jnp.zeros(3)
    cams = []
    for k in range(4):
        cam = make_camera(angle=k * math.pi / 2, width=64, height=64)
        out = render(gt, cam, bg=bg, tile_capacity=256, tile_chunk=8)
        cams.append(dataclasses.replace(
            cam, image=out.image, fid=jnp.asarray(k / 3.0, jnp.float32)))

    rng = np.random.default_rng(0)
    pts = np.asarray(gt.params.xyz[:150]) + \
        rng.normal(scale=0.04, size=(150, 3)).astype(np.float32)
    cols = rng.uniform(0.2, 1.0, size=(150, 3)).astype(np.float32)
    st = G.create_from_pcd(pts, cols, sh_degree=1, capacity=cap,
                           spatial_lr_scale=4.0)
    st = shard_gaussian_state(st, mesh)

    spec = DeformFieldSpec(kind="warp", is_blender=True)
    dstate, field = create_deform_field(spec, jax.random.PRNGKey(0))
    dstate = replicate(dstate, mesh)

    opt_cfg = OptimizationParams(position_lr_max_steps=100)
    pipe_cfg = PipelineParams(tile_capacity=256, tile_chunk=8)
    step = make_sharded_train_step(mesh, opt_cfg=opt_cfg, pipe_cfg=pipe_cfg,
                                   width=64, height=64, field=field)

    losses = []
    for it in range(12):
        cam = cams[it % 4]
        st, dstate, aux = step(st, dstate, cam, jnp.asarray(it, jnp.float32),
                               bg)
        losses.append(float(aux.loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_camera_parallel_flagship_step_matches_single(mesh):
    """Camera-axis data parallelism: the sharded k-camera step must produce
    the same loss and updated parameters as the single-device flagship
    step on the same camera batch."""
    from d3gs_tpu.data.cameras import stack_cameras
    from d3gs_tpu.parallel.sharded import make_flagship_camera_parallel_step
    from d3gs_tpu.train.flagship import make_batched_step

    cap = 512
    gt = gt_state(n=150, cap=cap)
    bg = jnp.zeros(3)
    cams = []
    for k in range(8):
        cam = make_camera(angle=k * math.pi / 4, width=64, height=64)
        out = render(gt, cam, bg=bg, tile_capacity=256, tile_chunk=8)
        cams.append(dataclasses.replace(
            cam, image=out.image, fid=jnp.asarray(k / 7.0, jnp.float32)))
    batch = stack_cameras(cams)

    rng = np.random.default_rng(1)
    pts = np.asarray(gt.params.xyz[:150]) + \
        rng.normal(scale=0.04, size=(150, 3)).astype(np.float32)
    cols = rng.uniform(0.2, 1.0, size=(150, 3)).astype(np.float32)
    st0 = G.create_from_pcd(pts, cols, sh_degree=1, capacity=cap,
                            spatial_lr_scale=4.0)

    spec = DeformFieldSpec(kind="baseline", is_blender=True, D=2, W=32)
    dstate0, field = create_deform_field(spec, jax.random.PRNGKey(0))

    model_cfg = ModelParams(is_blender=True)
    opt_cfg = OptimizationParams(position_lr_max_steps=100,
                                 num_cams_per_iter=8)
    pipe_cfg = PipelineParams(tile_capacity=256, tile_chunk=8)

    single = make_batched_step(
        opt_cfg=opt_cfg, pipe_cfg=pipe_cfg, model_cfg=model_cfg,
        field=field, update_gaussians=True, update_deform=True,
        use_deform=True)
    key = jax.random.PRNGKey(0)
    s_st, s_dst, s_loss, s_ll1, _ = single(
        st0, dstate0, batch, jnp.asarray(5.0), key, bg)

    st_r = replicate(st0, mesh)
    dst_r = replicate(dstate0, mesh)
    par = make_flagship_camera_parallel_step(
        mesh, opt_cfg=opt_cfg, pipe_cfg=pipe_cfg, model_cfg=model_cfg,
        field=field, use_deform=True)
    p_st, p_dst, p_loss, p_ll1, _ = par(
        st_r, dst_r, batch, jnp.asarray(5.0), key, bg)

    np.testing.assert_allclose(float(p_loss), float(s_loss), rtol=1e-5)
    np.testing.assert_allclose(float(p_ll1), float(s_ll1), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(p_st.params.xyz),
                               np.asarray(s_st.params.xyz),
                               atol=2e-6)
    np.testing.assert_allclose(np.asarray(p_st.params.opacity),
                               np.asarray(s_st.params.opacity), atol=2e-6)
    # deform MLP grads psum across devices must match the single-step grads
    for a, b in zip(jax.tree.leaves(p_dst.params),
                    jax.tree.leaves(s_dst.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-6)


def test_gauss_tile_flagship_step_matches_single(mesh):
    """Gauss+tile sharding for the k-camera batched step: Gaussians + tile
    rows sharded, cameras replicated, per-camera splat all-gather pipelined
    under lax.scan — must equal the single-device flagship step."""
    from d3gs_tpu.data.cameras import stack_cameras
    from d3gs_tpu.parallel.sharded import make_flagship_gauss_tile_step
    from d3gs_tpu.train.flagship import make_batched_step

    cap = 1024
    gt = gt_state(n=150, cap=cap)
    bg = jnp.zeros(3)
    cams = []
    for k in range(3):                       # k NOT a multiple of n_dev:
        cam = make_camera(angle=k * math.pi / 3, width=64, height=64)
        out = render(gt, cam, bg=bg, tile_capacity=256, tile_chunk=8)
        cams.append(dataclasses.replace(
            cam, image=out.image, fid=jnp.asarray(k / 2.0, jnp.float32)))
    batch = stack_cameras(cams)              # no padding needed

    rng = np.random.default_rng(3)
    pts = np.asarray(gt.params.xyz[:150]) + \
        rng.normal(scale=0.04, size=(150, 3)).astype(np.float32)
    cols = rng.uniform(0.2, 1.0, size=(150, 3)).astype(np.float32)
    st0 = G.create_from_pcd(pts, cols, sh_degree=1, capacity=cap,
                            spatial_lr_scale=4.0)
    spec = DeformFieldSpec(kind="baseline", is_blender=True, D=2, W=32)
    dstate0, field = create_deform_field(spec, jax.random.PRNGKey(0))

    model_cfg = ModelParams(is_blender=True)
    opt_cfg = OptimizationParams(position_lr_max_steps=100,
                                 num_cams_per_iter=3)
    pipe_cfg = PipelineParams(tile_capacity=256, tile_chunk=8)
    key = jax.random.PRNGKey(0)

    single = make_batched_step(
        opt_cfg=opt_cfg, pipe_cfg=pipe_cfg, model_cfg=model_cfg,
        field=field, update_gaussians=True, update_deform=True,
        use_deform=True)
    s_st, s_dst, s_loss, s_ll1, _ = single(
        st0, dstate0, batch, jnp.asarray(5.0), key, bg)

    st_s = shard_gaussian_state(st0, mesh)
    dst_r = replicate(dstate0, mesh)
    gts = make_flagship_gauss_tile_step(
        mesh, opt_cfg=opt_cfg, pipe_cfg=pipe_cfg, model_cfg=model_cfg,
        field=field, width=64, height=64, use_deform=True)
    p_st, p_dst, p_loss, p_ll1, _ = gts(
        st_s, dst_r, batch, jnp.asarray(5.0), key, bg)

    np.testing.assert_allclose(float(p_loss), float(s_loss), rtol=1e-5)
    np.testing.assert_allclose(float(p_ll1), float(s_ll1), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(p_st.params.xyz),
                               np.asarray(s_st.params.xyz), atol=2e-6)
    np.testing.assert_allclose(np.asarray(p_st.params.opacity),
                               np.asarray(s_st.params.opacity), atol=2e-6)
    np.testing.assert_allclose(np.asarray(p_st.max_radii2d),
                               np.asarray(s_st.max_radii2d), atol=1e-6)
    for a, b in zip(jax.tree.leaves(p_dst.params),
                    jax.tree.leaves(s_dst.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-6)


def test_gauss_tile_flagship_6dof_matches_single(mesh):
    """is_6dof under the gauss_tile mesh: the per-Gaussian SE(3)
    composition (reference gaussian_renderer/__init__.py:71-76) happens on
    the sharded rows before projection — must equal the single-device
    flagship step."""
    from d3gs_tpu.data.cameras import stack_cameras
    from d3gs_tpu.parallel.sharded import make_flagship_gauss_tile_step
    from d3gs_tpu.train.flagship import make_batched_step

    cap = 1024
    gt = gt_state(n=150, cap=cap)
    bg = jnp.zeros(3)
    cams = []
    for k in range(2):
        cam = make_camera(angle=k * math.pi / 3, width=64, height=64)
        out = render(gt, cam, bg=bg, tile_capacity=256, tile_chunk=8)
        cams.append(dataclasses.replace(
            cam, image=out.image, fid=jnp.asarray(k / 2.0, jnp.float32)))
    batch = stack_cameras(cams)

    rng = np.random.default_rng(9)
    pts = np.asarray(gt.params.xyz[:150]) + \
        rng.normal(scale=0.04, size=(150, 3)).astype(np.float32)
    cols = rng.uniform(0.2, 1.0, size=(150, 3)).astype(np.float32)
    st0 = G.create_from_pcd(pts, cols, sh_degree=1, capacity=cap,
                            spatial_lr_scale=4.0)
    spec = DeformFieldSpec(kind="baseline", is_blender=True, is_6dof=True,
                           D=2, W=32)
    dstate0, field = create_deform_field(spec, jax.random.PRNGKey(1))

    model_cfg = ModelParams(is_blender=True, is_6dof=True)
    opt_cfg = OptimizationParams(position_lr_max_steps=100,
                                 num_cams_per_iter=2)
    pipe_cfg = PipelineParams(tile_capacity=256, tile_chunk=8)
    key = jax.random.PRNGKey(0)

    single = make_batched_step(
        opt_cfg=opt_cfg, pipe_cfg=pipe_cfg, model_cfg=model_cfg,
        field=field, update_gaussians=True, update_deform=True,
        use_deform=True)
    s_st, s_dst, s_loss, s_ll1, _ = single(
        st0, dstate0, batch, jnp.asarray(5.0), key, bg)

    st_s = shard_gaussian_state(st0, mesh)
    dst_r = replicate(dstate0, mesh)
    gts = make_flagship_gauss_tile_step(
        mesh, opt_cfg=opt_cfg, pipe_cfg=pipe_cfg, model_cfg=model_cfg,
        field=field, width=64, height=64, use_deform=True)
    p_st, p_dst, p_loss, p_ll1, _ = gts(
        st_s, dst_r, batch, jnp.asarray(5.0), key, bg)

    np.testing.assert_allclose(float(p_loss), float(s_loss), rtol=1e-5)
    np.testing.assert_allclose(float(p_ll1), float(s_ll1), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(p_st.params.xyz),
                               np.asarray(s_st.params.xyz), atol=2e-6)
    for a, b in zip(jax.tree.leaves(p_dst.params),
                    jax.tree.leaves(s_dst.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-6)


def test_gauss_tile_2d_mesh_matches_single(mesh):
    """Composed layout on a (2 cam × 4 shard) mesh: camera data parallelism
    across groups × gauss+tile model parallelism within each — must equal
    the single-device flagship step."""
    from d3gs_tpu.data.cameras import stack_cameras
    from d3gs_tpu.parallel.mesh import make_mesh_2d
    from d3gs_tpu.parallel.sharded import make_flagship_gauss_tile_step
    from d3gs_tpu.train.flagship import make_batched_step

    mesh2 = make_mesh_2d(jax.devices(), 2, 4)
    cap = 1024
    gt = gt_state(n=150, cap=cap)
    bg = jnp.zeros(3)
    cams = []
    for k in range(4):
        cam = make_camera(angle=k * math.pi / 3, width=64, height=64)
        out = render(gt, cam, bg=bg, tile_capacity=256, tile_chunk=8)
        cams.append(dataclasses.replace(
            cam, image=out.image, fid=jnp.asarray(k / 3.0, jnp.float32)))
    batch = stack_cameras(cams)

    rng = np.random.default_rng(4)
    pts = np.asarray(gt.params.xyz[:150]) + \
        rng.normal(scale=0.04, size=(150, 3)).astype(np.float32)
    cols = rng.uniform(0.2, 1.0, size=(150, 3)).astype(np.float32)
    st0 = G.create_from_pcd(pts, cols, sh_degree=1, capacity=cap,
                            spatial_lr_scale=4.0)
    spec = DeformFieldSpec(kind="baseline", is_blender=True, D=2, W=32)
    dstate0, field = create_deform_field(spec, jax.random.PRNGKey(0))

    model_cfg = ModelParams(is_blender=True)
    opt_cfg = OptimizationParams(position_lr_max_steps=100,
                                 num_cams_per_iter=4)
    pipe_cfg = PipelineParams(tile_capacity=256, tile_chunk=8)
    key = jax.random.PRNGKey(0)

    single = make_batched_step(
        opt_cfg=opt_cfg, pipe_cfg=pipe_cfg, model_cfg=model_cfg,
        field=field, update_gaussians=True, update_deform=True,
        use_deform=True)
    s_st, s_dst, s_loss, s_ll1, _ = single(
        st0, dstate0, batch, jnp.asarray(5.0), key, bg)

    st_s = shard_gaussian_state(st0, mesh2)
    dst_r = replicate(dstate0, mesh2)
    gts = make_flagship_gauss_tile_step(
        mesh2, opt_cfg=opt_cfg, pipe_cfg=pipe_cfg, model_cfg=model_cfg,
        field=field, width=64, height=64, use_deform=True, cam_axis="cam")
    p_st, p_dst, p_loss, p_ll1, _ = gts(
        st_s, dst_r, batch, jnp.asarray(5.0), key, bg)

    np.testing.assert_allclose(float(p_loss), float(s_loss), rtol=1e-5)
    np.testing.assert_allclose(float(p_ll1), float(s_ll1), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(p_st.params.xyz),
                               np.asarray(s_st.params.xyz), atol=2e-6)
    np.testing.assert_allclose(np.asarray(p_st.max_radii2d),
                               np.asarray(s_st.max_radii2d), atol=1e-6)
    for a, b in zip(jax.tree.leaves(p_dst.params),
                    jax.tree.leaves(s_dst.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-6)


def test_camera_parallel_ragged_batch_matches_single(mesh):
    """Ragged k (k % n_dev != 0): the mesh step pads by repeating cameras
    with 1/dup loss weights, so it must equal the single-device step on the
    UNPADDED batch (no double-weighting of repeated cameras)."""
    from d3gs_tpu.data.cameras import stack_cameras
    from d3gs_tpu.parallel.sharded import make_flagship_camera_parallel_step
    from d3gs_tpu.train.flagship import make_batched_step

    cap = 512
    gt = gt_state(n=150, cap=cap)
    bg = jnp.zeros(3)
    cams = []
    for k in range(5):                       # 5 cameras on an 8-device mesh
        cam = make_camera(angle=k * math.pi / 4, width=64, height=64)
        out = render(gt, cam, bg=bg, tile_capacity=256, tile_chunk=8)
        cams.append(dataclasses.replace(
            cam, image=out.image, fid=jnp.asarray(k / 4.0, jnp.float32)))

    rng = np.random.default_rng(2)
    pts = np.asarray(gt.params.xyz[:150]) + \
        rng.normal(scale=0.04, size=(150, 3)).astype(np.float32)
    cols = rng.uniform(0.2, 1.0, size=(150, 3)).astype(np.float32)
    st0 = G.create_from_pcd(pts, cols, sh_degree=1, capacity=cap,
                            spatial_lr_scale=4.0)
    spec = DeformFieldSpec(kind="baseline", is_blender=True, D=2, W=32)
    dstate0, field = create_deform_field(spec, jax.random.PRNGKey(0))

    model_cfg = ModelParams(is_blender=True)
    opt_cfg = OptimizationParams(position_lr_max_steps=100,
                                 num_cams_per_iter=5)
    pipe_cfg = PipelineParams(tile_capacity=256, tile_chunk=8)
    key = jax.random.PRNGKey(0)

    single = make_batched_step(
        opt_cfg=opt_cfg, pipe_cfg=pipe_cfg, model_cfg=model_cfg,
        field=field, update_gaussians=True, update_deform=True,
        use_deform=True)
    s_st, s_dst, s_loss, s_ll1, _ = single(
        st0, dstate0, stack_cameras(cams), jnp.asarray(5.0), key, bg)

    # pad 5 -> 8 by repeating cameras (as flagship pick_batch does), with
    # 1/dup weights; keep fid-sorted order
    padded = cams + [cams[0], cams[2], cams[2]]
    padded.sort(key=lambda c: float(c.fid))
    counts = {}
    for c in padded:
        counts[id(c)] = counts.get(id(c), 0) + 1
    wts = jnp.asarray([1.0 / counts[id(c)] for c in padded], jnp.float32)

    st_r = replicate(st0, mesh)
    dst_r = replicate(dstate0, mesh)
    par = make_flagship_camera_parallel_step(
        mesh, opt_cfg=opt_cfg, pipe_cfg=pipe_cfg, model_cfg=model_cfg,
        field=field, use_deform=True)
    p_st, p_dst, p_loss, p_ll1, _ = par(
        st_r, dst_r, stack_cameras(padded), jnp.asarray(5.0), key, bg, wts)

    np.testing.assert_allclose(float(p_loss), float(s_loss), rtol=1e-5)
    np.testing.assert_allclose(float(p_ll1), float(s_ll1), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(p_st.params.xyz),
                               np.asarray(s_st.params.xyz), atol=2e-6)
    for a, b in zip(jax.tree.leaves(p_dst.params),
                    jax.tree.leaves(s_dst.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-6)
