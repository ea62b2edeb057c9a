"""PTv3 (TPU-native flax re-design of the reference's vendored dormant
Pointcept model): serialization curves + forward invariants."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from d3gs_tpu.models import ptv3


def test_z_order_matches_manual_interleave():
    g = jnp.asarray([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1],
                     [3, 5, 7]], jnp.int32)
    codes = np.asarray(ptv3.z_order_encode(g, depth=4))

    def manual(x, y, z):
        c = 0
        for b in range(4):
            c |= ((x >> b) & 1) << (3 * b + 2)
            c |= ((y >> b) & 1) << (3 * b + 1)
            c |= ((z >> b) & 1) << (3 * b + 0)
        return c

    want = [manual(*np.asarray(r)) for r in g]
    np.testing.assert_array_equal(codes, want)


def test_hilbert_is_bijective_and_local():
    """All 8^2 cells of a 4x4x4 grid get distinct codes, and consecutive
    codes along the curve are grid neighbors (the defining property)."""
    d = 2
    xs, ys, zs = np.meshgrid(*([np.arange(1 << d)] * 3), indexing="ij")
    g = jnp.asarray(np.stack([xs, ys, zs], -1).reshape(-1, 3), jnp.int32)
    codes = np.asarray(ptv3.hilbert_encode(g, depth=d))
    assert len(set(codes.tolist())) == len(codes)
    order = np.argsort(codes)
    pts = np.asarray(g)[order]
    step = np.abs(np.diff(pts, axis=0)).sum(axis=1)
    assert (step == 1).all(), "hilbert curve must visit grid neighbors"


@pytest.fixture(scope="module")
def tiny_model():
    model = ptv3.PointTransformerV3(
        in_channels=6, enc_depths=(1, 1, 1), enc_channels=(8, 16, 32),
        enc_heads=(1, 2, 4), dec_depths=(1, 1), dec_channels=(8, 16),
        dec_heads=(1, 2), patch_size=16, curve_depth=6)
    rng = np.random.default_rng(0)
    n = 96
    feats = jnp.asarray(rng.normal(size=(n, 6)), jnp.float32)
    grid = jnp.asarray(rng.integers(0, 40, (n, 3)), jnp.int32)
    mask = jnp.asarray((np.arange(n) < 80), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), feats, grid, mask)
    return model, params, feats, grid, mask


def test_forward_shape_and_mask(tiny_model):
    model, params, feats, grid, mask = tiny_model
    out = model.apply(params, feats, grid, mask)
    assert out.shape == (96, 8)
    assert np.isfinite(np.asarray(out)).all()
    # padded (dead) rows produce zeros
    np.testing.assert_allclose(np.asarray(out)[80:], 0.0)


def test_dead_points_do_not_influence(tiny_model):
    model, params, feats, grid, mask = tiny_model
    out1 = model.apply(params, feats, grid, mask)
    feats2 = feats.at[80:].set(123.0)   # poison masked-out rows
    grid2 = grid.at[80:].set(7)
    out2 = model.apply(params, feats2, grid2, mask)
    np.testing.assert_allclose(np.asarray(out1)[:80], np.asarray(out2)[:80],
                               atol=1e-5)


def test_gradients_flow(tiny_model):
    model, params, feats, grid, mask = tiny_model

    def loss(p):
        return jnp.sum(model.apply(p, feats, grid, mask) ** 2)

    g = jax.grad(loss)(params)
    total = sum(float(jnp.sum(jnp.abs(x))) for x in jax.tree.leaves(g))
    assert np.isfinite(total) and total > 0
