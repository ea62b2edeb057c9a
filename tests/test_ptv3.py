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


def test_drop_path_and_order_shuffle_training_mode(tiny_model):
    """deterministic=False enables stochastic depth + order shuffling
    (reference drop_path=0.3 linspace schedule :870-876, shuffle_orders
    :807): different rngs give different outputs; eval mode is unchanged
    and rng-independent."""
    import jax
    model, params, feats, grid, mask = tiny_model
    e1 = model.apply(params, feats, grid, mask)
    e2 = model.apply(params, feats, grid, mask,
                     rngs={"droppath": jax.random.PRNGKey(1),
                           "orders": jax.random.PRNGKey(2)})
    np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))

    t1 = model.apply(params, feats, grid, mask, deterministic=False,
                     rngs={"droppath": jax.random.PRNGKey(1),
                           "orders": jax.random.PRNGKey(2)})
    t2 = model.apply(params, feats, grid, mask, deterministic=False,
                     rngs={"droppath": jax.random.PRNGKey(3),
                           "orders": jax.random.PRNGKey(4)})
    assert np.isfinite(np.asarray(t1)).all()
    assert np.abs(np.asarray(t1) - np.asarray(t2)).max() > 1e-6
    assert np.abs(np.asarray(t1) - np.asarray(e1)).max() > 1e-6


def test_pdnorm_decoupled_conditions():
    """PDNorm keeps one norm per dataset condition (reference :255-293)."""
    import jax
    import jax.numpy as jnp
    m = ptv3.PDNorm(8, conditions=("A", "B"))
    x = jnp.asarray(np.random.default_rng(0).normal(size=(10, 8)),
                    jnp.float32)
    p = m.init(jax.random.PRNGKey(0), x, 0)
    # distinct per-condition parameters exist
    assert set(p["params"]) == {"norm_A_scale", "norm_A_bias",
                                "norm_B_scale", "norm_B_bias"}
    ya = m.apply(p, x, 0)
    yb = m.apply(p, x, 1)
    np.testing.assert_allclose(np.asarray(ya), np.asarray(yb), atol=1e-6)

    # adaptive modulation shifts the output by the context
    ma = ptv3.PDNorm(8, conditions=("A",), adaptive=True,
                     context_channels=4)
    ctx = jnp.ones((4,))
    pa = ma.init(jax.random.PRNGKey(1), x, 0, ctx)
    y1 = ma.apply(pa, x, 0, ctx)
    y2 = ma.apply(pa, x, 0, 2.0 * ctx)
    assert np.abs(np.asarray(y1) - np.asarray(y2)).max() > 1e-6


def test_pdnorm_model_variant(tiny_model):
    import jax
    model, params, feats, grid, mask = tiny_model
    m2 = ptv3.PointTransformerV3(
        in_channels=6, enc_depths=(1, 1), enc_channels=(8, 16),
        enc_heads=(1, 2), dec_depths=(1,), dec_channels=(8,),
        dec_heads=(1,), patch_size=16, curve_depth=6, pdnorm_ln=True,
        pdnorm_conditions=("A", "B"))
    p2 = m2.init(jax.random.PRNGKey(0), feats, grid, mask)
    out_a = m2.apply(p2, feats, grid, mask, condition=0)
    out_b = m2.apply(p2, feats, grid, mask, condition=1)
    assert np.isfinite(np.asarray(out_a)).all()
    # fresh init: both conditions' affines are identity, outputs coincide
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b),
                               atol=1e-6)
    flat = jax.tree_util.tree_flatten_with_path(p2)[0]
    assert any("norm_A_scale" in "/".join(str(k) for k in path)
               for path, _ in flat)
