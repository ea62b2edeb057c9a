"""Pixel-level parity of the TPU rasterizer vs the naive per-pixel oracle,
plus finite-difference gradient checks (SURVEY.md §4 fixture (a))."""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from d3gs_tpu.ops.camera_math import perspective_projection, world_to_view
from d3gs_tpu.ops.rasterize import rasterize
from d3gs_tpu.ops.transforms import cov3d_packed
from tests.naive_reference import render_naive


def make_scene(n=300, seed=0, width=64, height=48):
    rng = np.random.default_rng(seed)
    means = rng.normal(size=(n, 3)).astype(np.float32)
    scales = np.exp(rng.normal(size=(n, 3)).astype(np.float32) * 0.5 - 2.5)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    opac = (1 / (1 + np.exp(-rng.normal(size=(n,))))).astype(np.float32)
    colors = rng.uniform(0, 1, size=(n, 3)).astype(np.float32)
    V = world_to_view(np.eye(3), np.array([0.05, -0.02, 4.0])).T
    fovx = fovy = math.radians(60)
    P = perspective_projection(0.01, 100.0, fovx, fovy).T
    full = (V @ P).astype(np.float32)
    bg = np.array([0.1, 0.2, 0.3], np.float32)
    cam = dict(viewmatrix=V.astype(np.float32), projmatrix=full,
               tanfovx=math.tan(fovx / 2), tanfovy=math.tan(fovy / 2),
               width=width, height=height, bg=bg)
    return means, scales, quats, opac, colors, cam


@pytest.mark.parametrize("seed", [0, 1])
def test_forward_matches_naive(seed):
    means, scales, quats, opac, colors, cam = make_scene(seed=seed)
    ref_img, ref_depth, ref_alpha, ref_radii = render_naive(
        means.astype(np.float64), scales.astype(np.float64),
        quats.astype(np.float64), opac.astype(np.float64),
        colors.astype(np.float64), cam["viewmatrix"].astype(np.float64),
        cam["projmatrix"].astype(np.float64), cam["tanfovx"], cam["tanfovy"],
        cam["width"], cam["height"], cam["bg"].astype(np.float64))

    cov = cov3d_packed(jnp.array(scales), jnp.array(quats))
    out = rasterize(jnp.array(means), cov, jnp.array(colors), jnp.array(opac),
                    viewmatrix=jnp.array(cam["viewmatrix"]),
                    projmatrix=jnp.array(cam["projmatrix"]),
                    tanfovx=cam["tanfovx"], tanfovy=cam["tanfovy"],
                    width=cam["width"], height=cam["height"],
                    bg=jnp.array(cam["bg"]), capacity=512)

    np.testing.assert_allclose(np.asarray(out.image), ref_img, atol=2e-3)
    np.testing.assert_allclose(np.asarray(out.depth), ref_depth, atol=2e-2)
    np.testing.assert_allclose(np.asarray(out.alpha), ref_alpha, atol=2e-3)
    # radii: integer, must match exactly for visible splats
    np.testing.assert_array_equal(np.asarray(out.radii) > 0, ref_radii > 0)


def test_capacity_overflow_drops_deepest_only():
    """With a tiny capacity, the image should equal blending only the first-K
    front-to-back splats per tile — never a crash or garbage."""
    means, scales, quats, opac, colors, cam = make_scene(n=200, seed=2)
    cov = cov3d_packed(jnp.array(scales), jnp.array(quats))
    kwargs = dict(viewmatrix=jnp.array(cam["viewmatrix"]),
                  projmatrix=jnp.array(cam["projmatrix"]),
                  tanfovx=cam["tanfovx"], tanfovy=cam["tanfovy"],
                  width=cam["width"], height=cam["height"],
                  bg=jnp.array(cam["bg"]))
    full = rasterize(jnp.array(means), cov, jnp.array(colors),
                     jnp.array(opac), capacity=512, **kwargs)
    small = rasterize(jnp.array(means), cov, jnp.array(colors),
                      jnp.array(opac), capacity=16, **kwargs)
    assert np.isfinite(np.asarray(small.image)).all()
    # where no tile overflows, images agree
    counts = np.asarray(full.counts)
    if (counts <= 16).all():
        np.testing.assert_allclose(np.asarray(small.image),
                                   np.asarray(full.image), atol=1e-5)


def test_gradients_match_finite_differences():
    means, scales, quats, opac, colors, cam = make_scene(n=40, seed=3,
                                                         width=32, height=32)
    kwargs = dict(viewmatrix=jnp.array(cam["viewmatrix"]),
                  projmatrix=jnp.array(cam["projmatrix"]),
                  tanfovx=cam["tanfovx"], tanfovy=cam["tanfovy"],
                  width=cam["width"], height=cam["height"],
                  bg=jnp.array(cam["bg"]))
    target = jnp.zeros((32, 32, 3))

    def loss(m, o, c):
        cov = cov3d_packed(jnp.array(scales), jnp.array(quats))
        out = rasterize(m, cov, c, o, capacity=256, **kwargs)
        return jnp.mean((out.image - target) ** 2)

    m0 = jnp.array(means)
    o0 = jnp.array(opac)
    c0 = jnp.array(colors)
    g_m, g_o, g_c = jax.grad(loss, argnums=(0, 1, 2))(m0, o0, c0)

    rng = np.random.default_rng(0)
    eps = 1e-3
    for g, x0, name in [(g_o, o0, "opac"), (g_c, c0, "color"),
                        (g_m, m0, "means")]:
        v = rng.normal(size=x0.shape).astype(np.float32)
        v = jnp.array(v / np.linalg.norm(v))
        args = {"means": (m0, o0, c0), "opac": (m0, o0, c0),
                "color": (m0, o0, c0)}[name]
        idx = {"means": 0, "opac": 1, "color": 2}[name]
        def f(t):
            a = list(args)
            a[idx] = a[idx] + t * v
            return float(loss(*a))
        fd = (f(eps) - f(-eps)) / (2 * eps)
        an = float(jnp.vdot(g, v))
        assert abs(fd - an) < 5e-3 * max(1.0, abs(fd)), (name, fd, an)


def test_gradients_wrt_scales_and_quats():
    means, scales, quats, opac, colors, cam = make_scene(n=40, seed=4,
                                                         width=32, height=32)
    kwargs = dict(viewmatrix=jnp.array(cam["viewmatrix"]),
                  projmatrix=jnp.array(cam["projmatrix"]),
                  tanfovx=cam["tanfovx"], tanfovy=cam["tanfovy"],
                  width=cam["width"], height=cam["height"],
                  bg=jnp.array(cam["bg"]))

    def loss(s, q):
        cov = cov3d_packed(s, q)
        out = rasterize(jnp.array(means), cov, jnp.array(colors),
                        jnp.array(opac), capacity=256, **kwargs)
        return jnp.mean(out.image ** 2)

    s0, q0 = jnp.array(scales), jnp.array(quats)
    g_s, g_q = jax.grad(loss, argnums=(0, 1))(s0, q0)
    rng = np.random.default_rng(1)
    eps = 1e-3
    for g, x0, i in [(g_s, s0, 0), (g_q, q0, 1)]:
        v = rng.normal(size=x0.shape).astype(np.float32)
        v = jnp.array(v / np.linalg.norm(v))
        def f(t):
            a = [s0, q0]
            a[i] = a[i] + t * v
            return float(loss(*a))
        fd = (f(eps) - f(-eps)) / (2 * eps)
        an = float(jnp.vdot(g, v))
        assert abs(fd - an) < 5e-3 * max(1.0, abs(fd)), (i, fd, an)
