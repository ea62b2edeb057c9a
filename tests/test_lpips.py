"""LPIPS-JAX plumbing: synthetic VGG weights exercise the full pipeline
(the real v0.1 weights load from npz in deployment; zero-egress CI uses
random ones and checks metric properties, not values)."""
import numpy as np
import jax.numpy as jnp
import pytest

from d3gs_tpu.render_eval import lpips_jax


@pytest.fixture(scope="module")
def params():
    rng = np.random.default_rng(0)
    p = {}
    cin, i = 3, 0
    for ch, n_convs in lpips_jax._VGG_STAGES:
        for _ in range(n_convs):
            p[f"conv{i}_w"] = jnp.asarray(
                rng.normal(0, 0.08, (3, 3, cin, ch)), jnp.float32)
            p[f"conv{i}_b"] = jnp.zeros((ch,), jnp.float32)
            cin = ch
            i += 1
    for li, (ch, _) in enumerate(lpips_jax._VGG_STAGES):
        p[f"lin{li}_w"] = jnp.asarray(rng.uniform(0, 1, (ch,)), jnp.float32)
    return p


def test_identity_is_zero(params):
    img = jnp.asarray(np.random.default_rng(1).random((64, 64, 3)),
                      jnp.float32)
    d = float(lpips_jax.lpips(params, img, img))
    assert abs(d) < 1e-6


def test_orders_perturbations(params):
    rng = np.random.default_rng(2)
    img = jnp.asarray(rng.random((64, 64, 3)), jnp.float32)
    small = jnp.clip(img + 0.02 * rng.standard_normal(img.shape), 0, 1)
    big = jnp.clip(img + 0.4 * rng.standard_normal(img.shape), 0, 1)
    d_small = float(lpips_jax.lpips(params, img, small.astype(jnp.float32)))
    d_big = float(lpips_jax.lpips(params, img, big.astype(jnp.float32)))
    assert 0 < d_small < d_big


def test_load_params_missing(tmp_path, monkeypatch):
    monkeypatch.setenv("LPIPS_WEIGHTS", str(tmp_path / "nope.npz"))
    assert lpips_jax.load_params() is None
