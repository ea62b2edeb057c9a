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


def test_load_params_fails_loudly_when_requested(tmp_path, monkeypatch):
    # explicitly-requested weights that don't exist must RAISE, not
    # silently degrade to LPIPS=null (VERDICT r1 item 8)
    monkeypatch.setenv("LPIPS_WEIGHTS", str(tmp_path / "nope.npz"))
    with pytest.raises(FileNotFoundError):
        lpips_jax.load_params()
    bad = tmp_path / "bad.npz"
    np.savez(bad, conv0_w=np.zeros((3, 3, 3, 64), np.float32))
    monkeypatch.setenv("LPIPS_WEIGHTS", str(bad))
    with pytest.raises(ValueError):
        lpips_jax.load_params()


def test_load_params_default_path_degrades_quietly(tmp_path, monkeypatch):
    monkeypatch.delenv("LPIPS_WEIGHTS", raising=False)
    monkeypatch.chdir(tmp_path)        # no ./lpips_vgg.npz here
    assert lpips_jax.load_params() is None


def _torch_lpips(params, img1, img2):
    """Independent LPIPS v0.1 reimplementation in torch (NCHW, explicit
    padding, torch pooling) following richzhang/PerceptualSimilarity —
    cross-checks lpips_jax's layout transposes, SAME padding, taps,
    normalization and head/averaging semantics with shared weights."""
    import torch
    import torch.nn.functional as F

    shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
    scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)

    def prep(im):
        t = torch.tensor(np.asarray(im)).permute(2, 0, 1)[None] * 2 - 1
        return (t - shift) / scale

    def feats(x):
        taps, i = [], 0
        for si, (ch, n_convs) in enumerate(lpips_jax._VGG_STAGES):
            for _ in range(n_convs):
                w = torch.tensor(np.asarray(params[f"conv{i}_w"])) \
                    .permute(3, 2, 0, 1)              # HWIO -> OIHW
                b = torch.tensor(np.asarray(params[f"conv{i}_b"]))
                x = F.relu(F.conv2d(x, w, b, padding=1))
                i += 1
            taps.append(x)
            if si < len(lpips_jax._VGG_STAGES) - 1:
                x = F.max_pool2d(x, 2)
        return taps

    total = 0.0
    for li, (a, b) in enumerate(zip(feats(prep(img1)), feats(prep(img2)))):
        a = a / a.norm(dim=1, keepdim=True).clamp_min(1e-10)
        b = b / b.norm(dim=1, keepdim=True).clamp_min(1e-10)
        w = torch.tensor(np.asarray(params[f"lin{li}_w"])).view(1, -1, 1, 1)
        total = total + ((a - b) ** 2 * w).sum(1).mean()
    return float(total)


def test_matches_independent_torch_implementation(params):
    rng = np.random.default_rng(7)
    img1 = rng.random((64, 64, 3)).astype(np.float32)
    img2 = np.clip(img1 + 0.15 * rng.standard_normal(img1.shape),
                   0, 1).astype(np.float32)
    d_jax = float(lpips_jax.lpips(params, jnp.asarray(img1),
                                  jnp.asarray(img2)))
    d_torch = _torch_lpips(params, img1, img2)
    assert d_torch > 1e-4                # non-trivial value
    np.testing.assert_allclose(d_jax, d_torch, rtol=2e-4)
