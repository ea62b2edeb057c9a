"""Deformation networks + ODE integrator tests (SURVEY.md §4 fixture (b):
analytic-trajectory oracles)."""
import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from d3gs_tpu.models.deform import (DeformFieldSpec, create_deform_field)
from d3gs_tpu.models.deform.ode import (odeint_adaptive, odeint_from_zero,
                                        odeint_grid)
from d3gs_tpu.models.deform.networks import positional_encoding, pe_dim


def test_positional_encoding_layout():
    x = jnp.array([[0.5, -0.25, 1.0]])
    e = positional_encoding(x, 4)
    assert e.shape == (1, pe_dim(3, 4))
    np.testing.assert_allclose(e[0, :3], [0.5, -0.25, 1.0])
    # first sin band is sin(2^0 * x)
    np.testing.assert_allclose(e[0, 3:6], np.sin([0.5, -0.25, 1.0]),
                               rtol=1e-6)
    np.testing.assert_allclose(e[0, 6:9], np.cos([0.5, -0.25, 1.0]),
                               rtol=1e-6)


def test_deform_mlp_shapes_and_warmup_magnitude():
    spec = DeformFieldSpec(kind="baseline", is_blender=True)
    state, field = create_deform_field(spec, jax.random.PRNGKey(0))
    xyz = jnp.ones((32, 3)) * 0.3
    dx, dr, ds = field.step(state.params, xyz, jnp.asarray(0.7))
    assert dx.shape == (32, 3)
    assert dr.shape == (32, 4)
    assert ds.shape == (32, 3)
    assert np.isfinite(np.asarray(dx)).all()


def test_deform_mlp_6dof_returns_se3():
    spec = DeformFieldSpec(kind="baseline", is_6dof=True)
    state, field = create_deform_field(spec, jax.random.PRNGKey(0))
    xyz = jnp.ones((8, 3)) * 0.3
    dx, dr, ds = field.step(state.params, xyz, jnp.asarray(0.3))
    assert dx.shape == (8, 4, 4)
    # valid rigid transforms: R orthonormal
    R = np.asarray(dx)[:, :3, :3]
    eye = np.einsum("nij,nkj->nik", R, R)
    np.testing.assert_allclose(eye, np.tile(np.eye(3), (8, 1, 1)), atol=1e-4)


def test_warp_kind_zero_rot_scale():
    spec = DeformFieldSpec(kind="warp")
    state, field = create_deform_field(spec, jax.random.PRNGKey(0))
    dx, dr, ds = field.step(state.params, jnp.ones((4, 3)), jnp.asarray(0.5))
    assert dx.shape == (4, 3)
    assert dr == 0.0 and ds == 0.0


def test_odeint_grid_linear_system_analytic():
    """dy/dt = A y with A = [[0, -w], [w, 0]] rotates — closed form."""
    w = 1.3
    A = jnp.array([[0.0, -w], [w, 0.0]])

    def f(t, y):
        return y @ A.T

    y0 = jnp.array([[1.0, 0.0], [0.0, 2.0]])
    ts = jnp.linspace(0.0, 1.0, 11)
    ys = odeint_grid(f, y0, ts, n_substeps=8)
    th = w * 1.0
    R = np.array([[math.cos(th), -math.sin(th)], [math.sin(th), math.cos(th)]])
    want = y0 @ R.T
    np.testing.assert_allclose(np.asarray(ys[-1]), np.asarray(want),
                               atol=1e-5)
    # adaptive path agrees
    ys2 = odeint_adaptive(f, y0, ts, rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(np.asarray(ys2[-1]), np.asarray(want),
                               atol=1e-5)


def test_odeint_grid_per_sample_grids():
    """Each sample integrates through its own time window (torchode
    parallel-IVP semantics)."""
    def f(t, y):
        # dy/dt = t  (per-sample t arrives as (N, 1))
        return jnp.broadcast_to(jnp.reshape(t, (-1, 1)), y.shape)

    y0 = jnp.zeros((3, 1))
    ts = jnp.stack([jnp.linspace(0.0, 1.0, 5),
                    jnp.linspace(0.5, 1.5, 5),
                    jnp.linspace(2.0, 4.0, 5)])  # (N=3, T=5)
    ys = odeint_grid(f, y0, ts, n_substeps=4)    # (T, N, 1)
    # y(T) - y(0) = (t1^2 - t0^2)/2
    want = (ts[:, -1] ** 2 - ts[:, 0] ** 2) / 2
    np.testing.assert_allclose(np.asarray(ys[-1][:, 0]), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_ode_field_t0_identity_and_multi():
    spec = DeformFieldSpec(kind="simple", n_substeps=2)
    state, field = create_deform_field(spec, jax.random.PRNGKey(1))
    xyz = jnp.asarray(np.random.default_rng(0).normal(size=(16, 3)),
                      jnp.float32)
    # t = 0: zero-length integration returns y unchanged (reference
    # deform_model.py:189-192 shortcut)
    y, r, s = field.step(state.params, xyz, jnp.asarray(0.0))
    np.testing.assert_allclose(np.asarray(y), np.asarray(xyz), atol=1e-6)
    # multi-time anchored at ts[0]
    ts = jnp.linspace(0.2, 0.6, 4)
    ys, rs, ss = field.step_multi(state.params, xyz, ts)
    assert ys.shape == (4, 16, 3)
    np.testing.assert_allclose(np.asarray(ys[0]), np.asarray(xyz), atol=1e-6)
    assert rs.shape == (4, 16, 4)


def test_simple_start_conditions_on_y0():
    spec = DeformFieldSpec(kind="simple_start", n_substeps=2)
    state, field = create_deform_field(spec, jax.random.PRNGKey(2))
    xyz = jnp.asarray(np.random.default_rng(1).normal(size=(8, 3)),
                      jnp.float32)
    ts = jnp.linspace(0.0, 0.5, 3)
    ys1, _, _ = field.step_multi(state.params, xyz, ts, y0=xyz)
    ys2, _, _ = field.step_multi(state.params, xyz, ts, y0=xyz * 2.0)
    # different anchors must produce different trajectories
    assert not np.allclose(np.asarray(ys1[-1]), np.asarray(ys2[-1]))


def test_deform_update_changes_params():
    spec = DeformFieldSpec(kind="warp")
    state, field = create_deform_field(spec, jax.random.PRNGKey(3))

    def loss(params):
        dx, _, _ = field.step(params, jnp.ones((4, 3)), jnp.asarray(0.5))
        return jnp.sum(dx ** 2)

    g = jax.grad(loss)(state.params)
    new_state = field.update(state, g, jnp.asarray(100.0))
    l0 = jax.tree.leaves(state.params)[0]
    l1 = jax.tree.leaves(new_state.params)[0]
    assert not np.allclose(np.asarray(l0), np.asarray(l1))
    assert int(new_state.count) == 1


def test_adaptive_matches_fixed_on_analytic_trajectory():
    """Adaptive Dopri5 (the reference torchode controller semantics) and the
    fixed-step RK4 grid integrator agree on a nonlinear analytic system at
    the reference tolerances (scene/deform_model.py:61-78)."""
    from d3gs_tpu.models.deform.ode import odeint_grid

    def f(t, y):  # dy/dt = -y + sin(2πt): stiff-ish forced decay
        return -y + jnp.sin(2.0 * jnp.pi * t)

    y0 = jnp.asarray(np.random.default_rng(3).normal(size=(6, 3)),
                     jnp.float32)
    ts = jnp.linspace(0.0, 1.0, 5)
    ys_fix = odeint_grid(f, y0, ts, n_substeps=16)
    ys_ada = odeint_adaptive(f, y0, ts, rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(np.asarray(ys_ada), np.asarray(ys_fix),
                               rtol=1e-4, atol=1e-5)


def test_adaptive_handles_duplicate_fids_and_t0():
    """Camera windows can repeat fids; duplicates are dedupe-and-scatter
    (EXACTLY equal — the value is copied from the first occurrence, which
    integrates at the true time), and t=0 single-time integration returns
    y0 exactly."""
    spec = DeformFieldSpec(kind="simple", solver="adaptive",
                           rtol=1e-5, atol=1e-7)
    state, field = create_deform_field(spec, jax.random.PRNGKey(4))
    xyz = jnp.asarray(np.random.default_rng(4).normal(size=(8, 3)),
                      jnp.float32)
    ts = jnp.asarray([0.0, 0.25, 0.25, 0.5])     # duplicate interior fid
    ys, _, _ = field.step_multi(state.params, xyz, ts)
    assert ys.shape == (4, 8, 3)
    assert np.array_equal(np.asarray(ys[1]), np.asarray(ys[2]))
    y, _, _ = field.step(state.params, xyz, jnp.asarray(0.0))
    np.testing.assert_allclose(np.asarray(y), np.asarray(xyz), atol=1e-6)


def test_adaptive_per_sample_grids_match_fixed():
    """(N, T) per-sample grids through the adaptive solver (torchode
    parallel-IVP semantics, reference deform_model.py:55-78): each sample
    integrates its own window with its own step-size controller."""
    def f(t, y):  # dy/dt = t, per-sample t arrives as a column
        return jnp.broadcast_to(jnp.reshape(t, (-1, 1)), y.shape)

    y0 = jnp.zeros((3, 1))
    ts = jnp.stack([jnp.linspace(0.0, 1.0, 5),
                    jnp.linspace(0.5, 1.5, 5),
                    jnp.linspace(2.0, 4.0, 5)])          # (N=3, T=5)
    ys = odeint_adaptive(f, y0, ts, rtol=1e-7, atol=1e-9)  # (T, N, 1)
    want = (ts[:, -1] ** 2 - ts[:, 0] ** 2) / 2
    np.testing.assert_allclose(np.asarray(ys[-1][:, 0]), np.asarray(want),
                               rtol=1e-5, atol=1e-6)
    # against the fixed-step integrator on the same grids
    ys_fix = odeint_grid(f, y0, ts, n_substeps=8)
    np.testing.assert_allclose(np.asarray(ys), np.asarray(ys_fix),
                               rtol=1e-5, atol=1e-6)


def test_adaptive_per_sample_duplicates_exact_and_differentiable():
    """Per-sample grids with repeated fids: duplicates exactly equal, and
    gradients flow through the vmapped adjoint."""
    spec = DeformFieldSpec(kind="simple", solver="adaptive",
                           rtol=1e-4, atol=1e-6)
    state, field = create_deform_field(spec, jax.random.PRNGKey(6))
    xyz = jnp.asarray(np.random.default_rng(6).normal(size=(4, 3)),
                      jnp.float32)
    ts = jnp.stack([jnp.asarray([0.0, 0.2, 0.2, 0.5])] * 2
                   + [jnp.asarray([0.1, 0.3, 0.6, 0.6])] * 2)   # (4, 4)
    ys, _, _ = field.step_multi(state.params, xyz, ts)
    assert ys.shape == (4, 4, 3)
    assert np.array_equal(np.asarray(ys[1][:2]), np.asarray(ys[2][:2]))
    assert np.array_equal(np.asarray(ys[2][2:]), np.asarray(ys[3][2:]))

    def loss(params):
        out, _, _ = field.step_multi(params, xyz, ts)
        return jnp.sum(out[-1] ** 2)

    g = jax.grad(loss)(state.params)
    gn = sum(float(jnp.sum(jnp.abs(l))) for l in jax.tree.leaves(g))
    assert np.isfinite(gn) and gn > 0.0


def test_adaptive_per_sample_y0_conditioned():
    """simple_start (y0-anchored dynamics, torchode with_args semantics,
    deform_model.py:67-72) under per-sample adaptive grids: the anchor is
    vmapped alongside the state."""
    spec = DeformFieldSpec(kind="simple_start", solver="adaptive",
                           rtol=1e-4, atol=1e-6)
    state, field = create_deform_field(spec, jax.random.PRNGKey(7))
    xyz = jnp.asarray(np.random.default_rng(7).normal(size=(3, 3)),
                      jnp.float32)
    ts = jnp.stack([jnp.linspace(0.0, 0.5, 4),
                    jnp.linspace(0.2, 0.8, 4),
                    jnp.linspace(0.0, 1.0, 4)])
    ys, _, _ = field.step_multi(state.params, xyz, ts)
    assert ys.shape == (4, 3, 3)
    # matches the fixed-step path on the same per-sample grids
    spec_fix = dataclasses.replace(spec, solver="rk4", n_substeps=16)
    _, field_fix = create_deform_field(spec_fix, jax.random.PRNGKey(7))
    ys_fix, _, _ = field_fix.step_multi(state.params, xyz, ts)
    np.testing.assert_allclose(np.asarray(ys), np.asarray(ys_fix),
                               rtol=2e-3, atol=2e-4)


def test_adaptive_is_differentiable():
    """Gradients flow through the adjoint (AutoDiffAdjoint parity)."""
    spec = DeformFieldSpec(kind="simple", solver="adaptive",
                           rtol=1e-4, atol=1e-6)
    state, field = create_deform_field(spec, jax.random.PRNGKey(5))
    xyz = jnp.ones((4, 3))

    def loss(params):
        ys, _, _ = field.step_multi(params, xyz,
                                    jnp.asarray([0.0, 0.3, 0.7]))
        return jnp.sum(ys[-1] ** 2)

    g = jax.grad(loss)(state.params)
    gn = sum(float(jnp.sum(jnp.abs(l))) for l in jax.tree.leaves(g))
    assert np.isfinite(gn) and gn > 0.0


def _torch_reference_deform_forward(params, x, t, *, D, W, multires,
                                    is_blender):
    """The reference DeformNetworkBaseline.forward (time_utils.py:102-127)
    re-implemented in torch with weights ported from the flax module —
    validates PE layout, timenet, skip wiring and head order end-to-end."""
    import torch
    import torch.nn.functional as F

    seq = [params[k]["Dense_0"] for k in sorted(
        params, key=lambda s: int(s.split("_")[-1]))]

    def linear(h, p):
        w = torch.tensor(np.asarray(p["kernel"]))       # (in, out)
        b = torch.tensor(np.asarray(p["bias"]))
        return h @ w + b

    def embed(v, m):
        outs = [v]
        for f in 2.0 ** np.arange(m):
            outs += [torch.sin(v * f), torch.cos(v * f)]
        return torch.cat(outs, -1)

    x = torch.tensor(np.asarray(x))
    t = torch.tensor(np.asarray(t))
    t_emb = embed(t, 6 if is_blender else 10)
    i = 0
    if is_blender:
        t_emb = linear(F.relu(linear(t_emb, seq[0])), seq[1])
        i = 2
    x_emb = embed(x, multires)
    inp = torch.cat([x_emb, t_emb], -1)
    h = inp
    for li in range(D):
        h = F.relu(linear(h, seq[i]))
        i += 1
        if li == D // 2:
            h = torch.cat([x_emb, t_emb, h], -1)
    d_xyz = linear(h, seq[i])
    d_rot = linear(h, seq[i + 1])
    d_scale = linear(h, seq[i + 2])
    return (d_xyz.numpy(), d_rot.numpy(), d_scale.numpy())


@pytest.mark.parametrize("is_blender", [True, False])
def test_deform_mlp_matches_reference_torch_forward(is_blender):
    """Weight-ported cross-check: the flax DeformMLP must compute exactly
    the reference network's function (same PE interleave, timenet, skip
    concat order [x_emb, t_emb, h], head order warp/rot/scale)."""
    from d3gs_tpu.models.deform.networks import DeformMLP
    D, W, multires = 4, 32, 4
    m = DeformMLP(D=D, W=W, multires=multires, is_blender=is_blender)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(7, 3)).astype(np.float32)
    t = rng.random((7, 1)).astype(np.float32)
    p = m.init(jax.random.PRNGKey(1), jnp.asarray(x), jnp.asarray(t))
    got = m.apply(p, jnp.asarray(x), jnp.asarray(t))
    want = _torch_reference_deform_forward(
        p["params"], x, t, D=D, W=W, multires=multires,
        is_blender=is_blender)
    for g, w_ in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), w_, atol=1e-5)


@pytest.mark.parametrize("use_linear", [0, 1, 2, 3, 4])
def test_ode_dynamics_matches_reference_torch_forward(use_linear):
    """Weight-ported cross-check of DeformNetworkODE's five use_linear
    ablations against a torch replica of the reference forward
    (time_utils.py:393-438)."""
    import torch

    from d3gs_tpu.models.deform.networks import DeformNetworkODE
    m = DeformNetworkODE(D=3, W=16, multires=3, is_blender=(use_linear == 0),
                         use_linear=use_linear, use_emb=True,
                         output_scale=0.7, skips=(1,))
    rng = np.random.default_rng(0)
    x = rng.normal(size=(5, 3)).astype(np.float32)
    t = np.float32(0.37)
    p = m.init(jax.random.PRNGKey(2), jnp.asarray(t), jnp.asarray(x))
    got = np.asarray(m.apply(p, jnp.asarray(t), jnp.asarray(x)))

    seq = [p["params"][k]["Dense_0"] for k in sorted(
        p["params"], key=lambda s: int(s.split("_")[-1]))]

    def linear(h, pr):
        return h @ torch.tensor(np.asarray(pr["kernel"])) + \
            torch.tensor(np.asarray(pr["bias"]))

    def embed(v, mm):
        outs = [v]
        for f in 2.0 ** np.arange(mm):
            outs += [torch.sin(v * f), torch.cos(v * f)]
        return torch.cat(outs, -1)

    xt = torch.tensor(x)
    tt = torch.full((5, 1), float(t))
    t_emb = embed(tt, 6 if use_linear == 0 else 10)
    x_emb = embed(xt, 3)
    if use_linear == 1:
        want = linear(torch.cat([x_emb, t_emb], -1), seq[0]) * 0.7
    elif use_linear == 2:
        d = x_emb.shape[-1]
        A = linear(t_emb, seq[0]).view(-1, d, d)
        b = linear(t_emb, seq[1])
        want = (torch.bmm(A, x_emb.unsqueeze(-1)).squeeze(-1) + b) * 0.7
    elif use_linear == 3:
        want = linear(x_emb, seq[0]) * 0.7
    elif use_linear == 4:
        zt = linear(x_emb[:, 2:3], seq[0])
        want = torch.cat([torch.zeros_like(x_emb[:, :2]), zt], 1) * 0.7
    else:
        import torch.nn.functional as F
        t_emb = linear(F.relu(linear(t_emb, seq[0])), seq[1])
        h = torch.cat([x_emb, t_emb], -1)
        inp = h
        i = 2
        for li in range(3):
            h = F.relu(linear(h, seq[i]))
            i += 1
            if li == 1:
                h = torch.cat([inp, h], -1)
        want = linear(h, seq[i]) * 0.7
    np.testing.assert_allclose(got, want.numpy(), atol=1e-5)
