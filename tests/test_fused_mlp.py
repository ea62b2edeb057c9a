"""Fused Pallas deform-MLP trunk vs the flax reference apply.

The fused path must match the flax DeformMLP (itself weight-port
cross-checked against the torch reference in test_deform_torch_parity)
bit-closely in both the forward and the full gradient chain — same
network, same math, restructured execution only.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from d3gs_tpu.models.deform.networks import (DeformMLP,
                                             deform_mlp_fused_apply)
from d3gs_tpu.models.deform.fields import (DeformFieldSpec,
                                           create_deform_field)


@pytest.mark.parametrize("is_blender", [True, False])
@pytest.mark.parametrize("full_heads", [True, False])
def test_fused_matches_flax(is_blender, full_heads):
    net = DeformMLP(is_blender=is_blender, full_heads=full_heads)
    key = jax.random.PRNGKey(3)
    n = 700                           # forces row padding to BLK
    x = jax.random.normal(key, (n, 3))
    t = jnp.full((n, 1), 0.37)
    params = net.init(jax.random.PRNGKey(1), x, t)

    ref = net.apply(params, x, t)
    got = deform_mlp_fused_apply(net, params, x, jnp.asarray([0.37]))

    np.testing.assert_allclose(got[0], ref[0], rtol=2e-5, atol=2e-6)
    if full_heads:
        np.testing.assert_allclose(got[1], ref[1], rtol=2e-5, atol=2e-6)
        np.testing.assert_allclose(got[2], ref[2], rtol=2e-5, atol=2e-6)

    # full gradient chain: params AND x cotangents
    def loss_ref(p, xx):
        dx, dr, ds = net.apply(p, xx, t)
        out = jnp.sum(dx ** 2)
        if full_heads:
            out = out + jnp.sum(jnp.sin(dr)) + jnp.sum(ds * 0.7)
        return out

    def loss_fused(p, xx):
        dx, dr, ds = deform_mlp_fused_apply(net, p, xx,
                                            jnp.asarray([0.37]))
        out = jnp.sum(dx ** 2)
        if full_heads:
            out = out + jnp.sum(jnp.sin(dr)) + jnp.sum(ds * 0.7)
        return out

    gr_p, gr_x = jax.grad(loss_ref, argnums=(0, 1))(params, x)
    gf_p, gf_x = jax.grad(loss_fused, argnums=(0, 1))(params, x)

    np.testing.assert_allclose(gf_x, gr_x, rtol=3e-5, atol=3e-6)
    flat_r = jax.tree_util.tree_leaves_with_path(gr_p)
    flat_f = jax.tree.leaves(gf_p)
    assert len(flat_r) == len(flat_f)
    for (path, a), b in zip(flat_r, flat_f):
        np.testing.assert_allclose(
            b, a, rtol=3e-5, atol=3e-6,
            err_msg=f"param grad mismatch at {jax.tree_util.keystr(path)}")


def test_field_step_uses_fused_and_matches_flax():
    spec_f = DeformFieldSpec(kind="baseline", is_blender=True, fused=True)
    spec_r = DeformFieldSpec(kind="baseline", is_blender=True, fused=False)
    st, field_f = create_deform_field(spec_f, jax.random.PRNGKey(0))
    _, field_r = create_deform_field(spec_r, jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(2), (300, 3))
    out_f = field_f.step(st.params, x, jnp.asarray(0.25))
    out_r = field_r.step(st.params, x, jnp.asarray(0.25))
    for a, b in zip(out_f, out_r):
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-6)

    # multi-time window path
    ts = jnp.asarray([0.1, 0.4, 0.9])
    mf = field_f.step_multi(st.params, x, ts)
    mr = field_r.step_multi(st.params, x, ts)
    for a, b in zip(mf, mr):
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-6)


@pytest.mark.parametrize("is_blender", [True, False])
def test_fused_ode_dynamics_matches_flax(is_blender):
    from d3gs_tpu.models.deform.networks import (DeformNetworkODE,
                                                 deform_ode_fused_apply)
    net = DeformNetworkODE(is_blender=is_blender, output_scale=0.3)
    x = jax.random.normal(jax.random.PRNGKey(5), (600, 3))
    t = jnp.full((600, 1), 0.21)
    params = net.init(jax.random.PRNGKey(4), t, x)

    ref = net.apply(params, t, x)
    got = deform_ode_fused_apply(net, params, jnp.asarray([0.21]), x)
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-6)

    g_r = jax.grad(lambda p: jnp.sum(net.apply(p, t, x) ** 2))(params)
    g_f = jax.grad(lambda p: jnp.sum(deform_ode_fused_apply(
        net, p, jnp.asarray([0.21]), x) ** 2))(params)
    for a, b in zip(jax.tree.leaves(g_r), jax.tree.leaves(g_f)):
        np.testing.assert_allclose(b, a, rtol=3e-5, atol=3e-6)


def test_ode_field_fused_matches_flax_integration():
    """Full RK4 trajectory through the fused dynamics == flax dynamics."""
    spec_f = DeformFieldSpec(kind="ode", is_blender=True, n_substeps=2)
    spec_r = DeformFieldSpec(kind="ode", is_blender=True, n_substeps=2,
                             fused=False)
    st, field_f = create_deform_field(spec_f, jax.random.PRNGKey(0))
    _, field_r = create_deform_field(spec_r, jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(2), (300, 3)) * 0.5
    ts = jnp.asarray([0.0, 0.5, 1.0])
    mf = field_f.step_multi(st.params, x, ts)
    mr = field_r.step_multi(st.params, x, ts)
    np.testing.assert_allclose(mf[0], mr[0], rtol=5e-5, atol=5e-6)
