"""Tests for GaussianState, Adam semantics, densify/prune, PLY round-trip."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import torch

from d3gs_tpu.models import gaussians as G
from d3gs_tpu.data.scene import load_gaussians_ply, save_gaussians_ply


def make_state(n=100, seed=0, cap=256):
    rng = np.random.default_rng(seed)
    pts = rng.normal(size=(n, 3)).astype(np.float32)
    cols = rng.uniform(0, 1, size=(n, 3)).astype(np.float32)
    return G.create_from_pcd(pts, cols, sh_degree=2, capacity=cap)


def test_create_from_pcd_matches_reference_init():
    st = make_state()
    assert int(st.num_alive) == 100
    # opacity activates to 0.1
    np.testing.assert_allclose(np.asarray(st.get_opacity)[:100], 0.1,
                               atol=1e-6)
    # rotation identity
    np.testing.assert_allclose(np.asarray(st.params.rotation)[:100, 0], 1.0)
    # scales: log(sqrt(mean 3-NN dist^2)) — check monotonic w/ density
    s = np.asarray(st.get_scaling)[:100]
    assert (s > 0).all()
    np.testing.assert_allclose(s[:, 0], s[:, 1])


def test_adam_matches_torch():
    """Our Adam must reproduce torch.optim.Adam (the reference optimizer,
    eps=1e-15) step-for-step."""
    rng = np.random.default_rng(0)
    p0 = rng.normal(size=(16, 3)).astype(np.float32)
    tp = torch.nn.Parameter(torch.tensor(p0))
    opt = torch.optim.Adam([tp], lr=1e-2, eps=1e-15)

    params = G.GaussianParams(
        xyz=jnp.array(p0), features_dc=jnp.zeros((16, 1, 3)),
        features_rest=jnp.zeros((16, 0, 3)), scaling=jnp.zeros((16, 3)),
        rotation=jnp.zeros((16, 4)), opacity=jnp.zeros((16, 1)))
    zeros = jax.tree.map(jnp.zeros_like, params)
    st = G.AdamState(zeros, zeros, jnp.zeros((), jnp.int32))
    lrs = G.GaussianParams(xyz=jnp.asarray(1e-2), features_dc=jnp.asarray(0.0),
                           features_rest=jnp.asarray(0.0),
                           scaling=jnp.asarray(0.0),
                           rotation=jnp.asarray(0.0), opacity=jnp.asarray(0.0))
    for i in range(5):
        g = rng.normal(size=(16, 3)).astype(np.float32)
        opt.zero_grad()
        tp.grad = torch.tensor(g)
        opt.step()
        grads = params._replace(xyz=jnp.array(g))
        grads = G.GaussianParams(*[jnp.zeros_like(x) if n != 0 else g_
                                   for n, (x, g_) in
                                   enumerate(zip(params, grads))])
        params, st = G.adam_step(params, grads, st, lrs)
    np.testing.assert_allclose(np.asarray(params.xyz),
                               tp.detach().numpy(), rtol=1e-5, atol=1e-6)


def test_densify_clone_and_split():
    st = make_state(n=50, cap=256)
    # force: first 10 small-scale high-grad -> clone; next 5 big-scale -> split
    grad = np.zeros(256, np.float32)
    grad[:10] = 1.0
    grad[10:15] = 1.0
    scaling = np.asarray(st.params.scaling).copy()
    scaling[10:15] = np.log(10.0)  # huge => split
    st = st.replace(
        params=st.params._replace(scaling=jnp.asarray(scaling)),
        grad_accum=jnp.asarray(grad), denom=jnp.ones(256))
    before = int(st.num_alive)
    st2 = G.densify_and_prune(
        st, jax.random.PRNGKey(0), max_grad=0.5, min_opacity=0.005,
        extent=1.0, max_screen_size=0.0, percent_dense=0.01)
    # 10 clones (+10) and 5 splits (source replaced, +1 net each)
    assert int(st2.num_alive) == before + 10 + 5
    # split children have shrunken scales: log(10/1.6)
    sc = np.asarray(st2.params.scaling)[10:15]
    np.testing.assert_allclose(sc, np.log(10.0 / 1.6), atol=1e-5)
    # stats reset
    assert float(jnp.sum(st2.grad_accum)) == 0.0


def test_densify_prunes_low_opacity():
    st = make_state(n=50, cap=128)
    op = np.asarray(st.params.opacity).copy()
    op[:20] = -20.0  # sigmoid ~ 0
    st = st.replace(params=st.params._replace(opacity=jnp.asarray(op)))
    st2 = G.densify_and_prune(
        st, jax.random.PRNGKey(0), max_grad=0.5, min_opacity=0.005,
        extent=1.0, max_screen_size=0.0, percent_dense=0.01)
    assert int(st2.num_alive) == 30


def test_reset_opacity():
    st = make_state(n=20, cap=64)
    st = st.replace(opt=st.opt._replace(
        m=st.opt.m._replace(opacity=jnp.ones((64, 1)))))
    st2 = G.reset_opacity(st)
    assert np.asarray(st2.get_opacity)[:20].max() <= 0.01 + 1e-6
    assert float(jnp.sum(st2.opt.m.opacity)) == 0.0


def test_ply_roundtrip(tmp_path):
    st = make_state(n=77, cap=128)
    path = os.path.join(tmp_path, "pc.ply")
    save_gaussians_ply(path, st)
    st2 = load_gaussians_ply(path, sh_degree=2, capacity=128)
    assert int(st2.num_alive) == 77
    for a, b in zip(st.params, st2.params):
        np.testing.assert_allclose(np.asarray(a)[:77], np.asarray(b)[:77],
                                   rtol=1e-6, atol=1e-7)


def test_ply_native_fast_path_roundtrip(tmp_path):
    """All-f32 checkpoints above the native threshold go through the C++
    blocked transpose on write AND read; bytes must equal the numpy path
    and decode to identical columns."""
    from d3gs_tpu.data import ply as P
    from d3gs_tpu.native import transpose_f32_native

    rng = np.random.default_rng(0)
    n = P._NATIVE_MIN_N + 7
    arrays = {f"c{i}": rng.standard_normal(n).astype(np.float32)
              for i in range(5)}
    fast = os.path.join(tmp_path, "fast.ply")
    P.write_ply(fast, arrays)

    slow = os.path.join(tmp_path, "slow.ply")
    try:
        P._NATIVE_MIN_N = 1 << 62          # force the numpy path
        P.write_ply(slow, arrays)
        with open(fast, "rb") as f1, open(slow, "rb") as f2:
            assert f1.read() == f2.read()
        cols_np, names = P.read_ply_columns(fast)   # numpy decode
    finally:
        P._NATIVE_MIN_N = 1 << 17
    cols_nat, names2 = P.read_ply_columns(fast)     # native decode
    assert names == names2 == tuple(arrays)
    for nm in arrays:
        np.testing.assert_array_equal(cols_nat[nm], arrays[nm])
        np.testing.assert_array_equal(cols_np[nm], arrays[nm])

    # the raw transpose against numpy, non-multiple-of-block shapes
    a = rng.standard_normal((1 << 20 | 13, 7)).astype(np.float32)
    t = transpose_f32_native(a)
    if t is not None:                       # native build available
        np.testing.assert_array_equal(t, a.T)


def test_sh_degree_ramp():
    st = make_state()
    for _ in range(5):
        st = G.oneup_sh_degree(st)
    assert int(st.active_sh_degree) == 2  # capped at max


def test_grow_capacity_preserves_state():
    """grow_capacity: params/opt/stats preserved, new rows dead, renders
    and densification keep working at the new capacity."""
    import jax
    import jax.numpy as jnp
    from d3gs_tpu.models import gaussians as G

    rng = np.random.default_rng(0)
    n, cap = 100, 128
    st = G.create_from_pcd((rng.random((n, 3)) * 2 - 1).astype(np.float32),
                           rng.random((n, 3)).astype(np.float32),
                           sh_degree=1, capacity=cap)
    st = st.replace(opt=jax.tree.map(
        lambda x: x + 1.0 if hasattr(x, "dtype") and x.dtype == jnp.float32
        else x, st.opt))
    g2 = G.grow_capacity(st, 256)
    assert g2.capacity == 256
    assert int(g2.num_alive) == n
    np.testing.assert_array_equal(np.asarray(g2.params.xyz[:cap]),
                                  np.asarray(st.params.xyz))
    np.testing.assert_array_equal(np.asarray(g2.opt.m.xyz[:cap]),
                                  np.asarray(st.opt.m.xyz))
    assert not bool(g2.alive[cap:].any())
    # padded quaternions stay unit-normalizable
    q = np.asarray(g2.get_rotation[cap:])
    np.testing.assert_allclose(np.linalg.norm(q, axis=-1), 1.0, atol=1e-5)
    # densify still works at the new capacity
    g3 = G.densify_and_prune(
        g2.replace(grad_accum=jnp.full((256,), 1.0),
                   denom=jnp.ones((256,)),
                   max_radii2d=jnp.full((256,), 5.0)),
        jax.random.PRNGKey(0), max_grad=1e-9, min_opacity=0.005,
        extent=jnp.asarray(4.0), max_screen_size=0.0, percent_dense=0.01)
    assert int(g3.num_alive) >= n
