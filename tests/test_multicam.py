"""Fused multi-camera render vs the per-camera render loop (CPU interpret).

The flagship trainer's k-camera iteration (reference train.py:224-251) runs
through render_multi: one global (camera, tile, depth) sort + one pallas
blend over k*T tiles. It must match per-camera render() calls exactly —
forward images AND parameter gradients.
"""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from d3gs_tpu.data.cameras import Camera, stack_cameras
from d3gs_tpu.models import gaussians as G
from d3gs_tpu.models.renderer import render, render_multi
from d3gs_tpu.ops.camera_math import perspective_projection, world_to_view

W = H = 64
N, CAP = 300, 512
K = 3


def make_cam(eye_z, off, fid, rng):
    V = world_to_view(np.eye(3), np.array([off, -off, eye_z])).T
    fov = math.radians(60)
    P = perspective_projection(0.01, 100.0, fov, fov).T
    return Camera(
        viewmatrix=jnp.asarray(V, jnp.float32),
        projmatrix=jnp.asarray(V @ P, jnp.float32),
        campos=jnp.asarray(np.linalg.inv(V)[3, :3], jnp.float32),
        fid=jnp.asarray(fid),
        image=jnp.asarray(rng.random((H, W, 3)), jnp.float32),
        width=W, height=H, fovx=fov, fovy=fov)


@pytest.fixture(scope="module")
def scene():
    rng = np.random.default_rng(11)
    pts = (rng.random((N, 3)) * 2.0 - 1.0).astype(np.float32)
    cols = rng.uniform(0, 1, (N, 3)).astype(np.float32)
    state = G.create_from_pcd(pts, cols, sh_degree=1, capacity=CAP)
    state = state.replace(
        active_sh_degree=jnp.asarray(1, jnp.int32),
        params=state.params._replace(
            opacity=jnp.asarray(rng.uniform(-1, 3, (CAP, 1)), jnp.float32),
            # anisotropic scales + non-identity quats so rotation gradients
            # are non-degenerate (isotropic splats have exactly-zero
            # rotation grads, reducing the comparison to float noise)
            scaling=jnp.asarray(rng.uniform(-5.0, -3.0, (CAP, 3)),
                                jnp.float32),
            rotation=jnp.asarray(
                rng.normal(size=(CAP, 4)) + np.array([2.0, 0, 0, 0]),
                jnp.float32)))
    cams = [make_cam(3.0 + 0.3 * i, 0.2 * i, 0.1 * i, rng)
            for i in range(K)]
    return state, cams


def test_forward_matches_per_camera(scene):
    state, cams = scene
    bg = jnp.asarray([0.05, 0.1, 0.15])
    batch = stack_cameras(cams)
    multi = render_multi(state, batch, bg=bg)
    for i, cam in enumerate(cams):
        single = render(state, cam, bg=bg, binning="pallas")
        np.testing.assert_allclose(np.asarray(multi.image[i]),
                                   np.asarray(single.image),
                                   atol=5e-5, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(multi.depth[i]),
                                   np.asarray(single.depth),
                                   atol=5e-5, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(multi.alpha[i]),
                                   np.asarray(single.alpha),
                                   atol=5e-5, rtol=1e-4)
        np.testing.assert_array_equal(np.asarray(multi.radii[i]),
                                      np.asarray(single.radii))


def test_gradients_match_per_camera(scene):
    state, cams = scene
    bg = jnp.zeros(3)
    batch = stack_cameras(cams)
    key = jax.random.PRNGKey(0)
    dxs = 0.02 * jax.random.normal(key, (K, CAP, 3))

    def loss_multi(params, tap):
        st = state.replace(params=params)
        out = render_multi(st, batch, d_xyz=dxs, bg=bg, means2d_tap=tap)
        return jnp.mean((out.image - batch.image) ** 2) \
            + 0.01 * jnp.mean(out.alpha)

    def loss_single(params, tap):
        st = state.replace(params=params)
        tot = 0.0
        for i, cam in enumerate(cams):
            out = render(st, cam, d_xyz=dxs[i], bg=bg, means2d_tap=tap,
                         binning="pallas")
            tot = tot + jnp.mean((out.image - cam.image) ** 2) / K \
                + 0.01 * jnp.mean(out.alpha) / K
        return tot

    tap0 = jnp.zeros((CAP, 2))
    gm, gtm = jax.grad(loss_multi, argnums=(0, 1))(state.params, tap0)
    gs, gts = jax.grad(loss_single, argnums=(0, 1))(state.params, tap0)
    for a, b, name in [(gm.xyz, gs.xyz, "xyz"),
                       (gm.opacity, gs.opacity, "opacity"),
                       (gm.scaling, gs.scaling, "scaling"),
                       (gm.rotation, gs.rotation, "rotation"),
                       (gm.features_dc, gs.features_dc, "fdc"),
                       (gtm, gts, "tap")]:
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(b).max() + 1e-8
        np.testing.assert_allclose(a / scale, b / scale, atol=3e-4,
                                   err_msg=name)
