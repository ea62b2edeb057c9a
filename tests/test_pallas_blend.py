"""Pallas blend kernel vs the XLA packed blend — interpret mode on CPU.

The real kernel is validated on TPU hardware (same comparison at larger
scale); this keeps the kernel's logic under CI wherever the suite runs.
"""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from d3gs_tpu.data.cameras import Camera
from d3gs_tpu.models import gaussians as G
from d3gs_tpu.ops.camera_math import perspective_projection, world_to_view
from d3gs_tpu.ops.binning import bin_splats_records
from d3gs_tpu.ops.pallas_blend import blend_records_pallas
from d3gs_tpu.ops.projection import project_gaussians
from d3gs_tpu.ops.rasterize import blend_records, pack_records
from d3gs_tpu.ops.transforms import cov3d_packed

W = H = 64
N, CAP = 300, 512
TX = TY = 4


@pytest.fixture(scope="module")
def scene():
    rng = np.random.default_rng(3)
    pts = (rng.random((N, 3)) * 2.0 - 1.0).astype(np.float32)
    cols = rng.uniform(0, 1, (N, 3)).astype(np.float32)
    state = G.create_from_pcd(pts, cols, sh_degree=1, capacity=CAP)
    state = state.replace(params=state.params._replace(
        opacity=jnp.asarray(rng.uniform(-1, 3, (CAP, 1)), jnp.float32)))

    V = world_to_view(np.eye(3), np.array([0, 0, 3.0])).T
    fov = math.radians(60)
    P = perspective_projection(0.01, 100.0, fov, fov).T
    cam = Camera(viewmatrix=jnp.asarray(V, jnp.float32),
                 projmatrix=jnp.asarray(V @ P, jnp.float32),
                 campos=jnp.asarray(np.linalg.inv(V)[3, :3], jnp.float32),
                 fid=jnp.asarray(0.0),
                 image=jnp.zeros((H, W, 3)), width=W, height=H,
                 fovx=fov, fovy=fov)
    tan = math.tan(fov / 2)
    cov = cov3d_packed(state.get_scaling, state.params.rotation)
    splats = project_gaussians(
        state.params.xyz, cov, state.get_opacity[:, 0],
        jnp.asarray(rng.uniform(0, 1, (CAP, 3)), jnp.float32),
        cam.viewmatrix, cam.projmatrix, tan, tan, W, H, alive=state.alive)
    rbins = bin_splats_records(splats, tiles_x=TX, tiles_y=TY)
    records = pack_records(splats)
    return records, rbins


def _ref(records, rbins, bg):
    return blend_records(records, rbins, bg, tiles_x=TX, tiles_y=TY,
                         width=W, height=H, tile_capacity=512, tile_chunk=4)


def _pal(records, rbins, bg):
    return blend_records_pallas(records, rbins, bg, tiles_x=TX, tiles_y=TY,
                                width=W, height=H, interpret=True)


def test_forward_matches_packed(scene):
    records, rbins = scene
    bg = jnp.asarray([0.1, 0.2, 0.3])
    ref = _ref(records, rbins, bg)
    pal = _pal(records, rbins, bg)
    for a, b in zip(ref, pal):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5, rtol=1e-4)


def test_gradients_match_packed(scene):
    records, rbins = scene
    bg = jnp.asarray([0.0, 0.0, 0.0])
    tgt = jnp.ones((H, W, 3)) * 0.5

    def loss(fn):
        def f(r, b):
            img, dep, alp = fn(r, rbins, b)
            return (jnp.sum((img - tgt) ** 2) + 0.01 * jnp.sum(dep)
                    + 0.02 * jnp.sum(alp))
        return f

    gr, gbr = jax.grad(loss(_ref), argnums=(0, 1))(records, bg)
    gp, gbp = jax.grad(loss(_pal), argnums=(0, 1))(records, bg)
    scale = np.abs(np.asarray(gr)).max() + 1e-8
    np.testing.assert_allclose(np.asarray(gp) / scale,
                               np.asarray(gr) / scale, atol=2e-4)
    np.testing.assert_allclose(np.asarray(gbp), np.asarray(gbr), atol=1e-3)


def test_saturated_tile_gradients_finite_and_match():
    """Regression: >19 near-opaque records in one tile drive the f32
    transmittance product below the denormal range. The backward's
    log-space anchor must come from the forward's log1p accumulation —
    a clamped log(T_end) inflates every contributing weight by e^(drift)
    (caught as training divergence, not by small-scene parity)."""
    n, cap = 64, 128
    key = jax.random.PRNGKey(0)
    # all gaussians centered in tile (0,0), nearly opaque, stacked in depth
    xyz = jnp.stack([jnp.zeros(n), jnp.zeros(n),
                     jnp.linspace(2.0, 3.0, n)], axis=1)
    state = G.create_from_pcd(np.asarray(xyz), np.full((n, 3), 0.5),
                              sh_degree=0, capacity=cap)
    state = state.replace(params=state.params._replace(
        opacity=jnp.full((cap, 1), 8.0),          # sigmoid(8) ~ 0.9997
        scaling=jnp.full((cap, 3), -3.0)))

    V = world_to_view(np.eye(3), np.array([0, 0, 4.0])).T
    fov = math.radians(60)
    Pm = perspective_projection(0.01, 100.0, fov, fov).T
    cam = Camera(viewmatrix=jnp.asarray(V, jnp.float32),
                 projmatrix=jnp.asarray(V @ Pm, jnp.float32),
                 campos=jnp.asarray(np.linalg.inv(V)[3, :3], jnp.float32),
                 fid=jnp.asarray(0.0), image=jnp.zeros((H, W, 3)),
                 width=W, height=H, fovx=fov, fovy=fov)
    tan = math.tan(fov / 2)
    cov = cov3d_packed(state.get_scaling, state.params.rotation)
    splats = project_gaussians(
        state.params.xyz, cov, state.get_opacity[:, 0],
        jnp.full((cap, 3), 0.7), cam.viewmatrix, cam.projmatrix,
        tan, tan, W, H, alive=state.alive)
    rbins = bin_splats_records(splats, tiles_x=TX, tiles_y=TY)
    assert int(rbins.counts.max()) >= 40, "fixture must saturate a tile"
    records = pack_records(splats)
    bg = jnp.zeros(3)

    def loss(fn):
        return lambda r: jnp.sum(fn(r, rbins, bg)[0] ** 2)

    gr = jax.grad(loss(_ref))(records)
    gp = jax.grad(loss(_pal))(records)
    assert np.isfinite(np.asarray(gp)).all()
    scale = np.abs(np.asarray(gr)).max() + 1e-8
    np.testing.assert_allclose(np.asarray(gp) / scale,
                               np.asarray(gr) / scale, atol=5e-4)


def test_dup_budget_overflow_drops_deepest_only():
    """rank_bounds reduction under duplicate-budget overflow: when
    dup_capacity < total duplicates, the expansion drops the DEEPEST
    gaussians' duplicates. With a saturating front stack the dropped
    records are fully occluded, so outputs and gradients must match the
    full-budget run (and stay finite)."""
    n, cap = 64, 128
    xyz = jnp.stack([jnp.zeros(n), jnp.zeros(n),
                     jnp.linspace(2.0, 3.0, n)], axis=1)
    state = G.create_from_pcd(np.asarray(xyz), np.full((n, 3), 0.5),
                              sh_degree=0, capacity=cap)
    state = state.replace(params=state.params._replace(
        opacity=jnp.full((cap, 1), 8.0),
        scaling=jnp.full((cap, 3), -3.0)))
    V = world_to_view(np.eye(3), np.array([0, 0, 4.0])).T
    fov = math.radians(60)
    Pm = perspective_projection(0.01, 100.0, fov, fov).T
    tan = math.tan(fov / 2)
    cov = cov3d_packed(state.get_scaling, state.params.rotation)
    splats = project_gaussians(
        state.params.xyz, cov, state.get_opacity[:, 0],
        jnp.full((cap, 3), 0.7), cam_v := jnp.asarray(V, jnp.float32),
        jnp.asarray(V @ Pm, jnp.float32), tan, tan, W, H,
        alive=state.alive)
    full = bin_splats_records(splats, tiles_x=TX, tiles_y=TY)
    total = int(full.starts[-1])
    assert total > 48
    # overflowed budget: only the shallowest gaussians' duplicates survive
    small = bin_splats_records(splats, tiles_x=TX, tiles_y=TY,
                               dup_capacity=48)
    records = pack_records(splats)
    bg = jnp.zeros(3)

    # oracle: the XLA packed blend consuming the SAME overflowed bins —
    # identical surviving duplicates, so outputs and record grads must
    # match; this pins rank_bounds' surviving-count segments under overflow
    img_p = blend_records_pallas(records, small, bg, tiles_x=TX,
                                 tiles_y=TY, width=W, height=H,
                                 interpret=True)[0]
    img_r = blend_records(records, small, bg, tiles_x=TX, tiles_y=TY,
                          width=W, height=H, tile_capacity=128,
                          tile_chunk=4)[0]
    np.testing.assert_allclose(np.asarray(img_p), np.asarray(img_r),
                               atol=5e-5, rtol=1e-4)

    def loss(fn):
        return lambda r: jnp.sum(fn(r)[0] ** 2)

    g_p = jax.grad(loss(lambda r: blend_records_pallas(
        r, small, bg, tiles_x=TX, tiles_y=TY, width=W, height=H,
        interpret=True)))(records)
    g_r = jax.grad(loss(lambda r: blend_records(
        r, small, bg, tiles_x=TX, tiles_y=TY, width=W, height=H,
        tile_capacity=128, tile_chunk=4)))(records)
    assert np.isfinite(np.asarray(g_p)).all()
    scale = np.abs(np.asarray(g_r)).max() + 1e-8
    np.testing.assert_allclose(np.asarray(g_p) / scale,
                               np.asarray(g_r) / scale, atol=5e-4)
