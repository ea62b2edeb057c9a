"""Unit tests for the math ops layer against independent implementations
(SURVEY.md §7 step 1: allclose vs tiny torch/CPU reimplementation)."""
import math

import jax.numpy as jnp
import numpy as np
import torch

from d3gs_tpu.ops import schedules, sh, transforms
from d3gs_tpu.ops.losses import psnr, ssim


def test_quat_to_rotmat_is_orthonormal_and_matches_scipy_convention():
    rng = np.random.default_rng(0)
    q = rng.normal(size=(64, 4)).astype(np.float32)
    R = np.asarray(transforms.quat_to_rotmat(jnp.array(q)))
    # orthonormality
    eye = np.einsum("nij,nkj->nik", R, R)
    np.testing.assert_allclose(eye, np.tile(np.eye(3), (64, 1, 1)), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)
    # known case: 90° about z, wxyz = (cos45, 0, 0, sin45)
    q90 = jnp.array([[math.cos(math.pi / 4), 0.0, 0.0, math.sin(math.pi / 4)]])
    R90 = np.asarray(transforms.quat_to_rotmat(q90))[0]
    np.testing.assert_allclose(R90 @ np.array([1.0, 0, 0]),
                               np.array([0.0, 1.0, 0]), atol=1e-6)


def test_cov3d_packed_is_spd_and_consistent():
    rng = np.random.default_rng(1)
    s = np.exp(rng.normal(size=(32, 3))).astype(np.float32)
    q = rng.normal(size=(32, 4)).astype(np.float32)
    packed = np.asarray(transforms.cov3d_packed(jnp.array(s), jnp.array(q)))
    full = np.asarray(transforms.unpack_cov3d(jnp.array(packed)))
    # eigenvalues equal squared scales
    ev = np.sort(np.linalg.eigvalsh(full), axis=-1)
    np.testing.assert_allclose(ev, np.sort(s ** 2, axis=-1), rtol=1e-4,
                               atol=1e-5)


def test_exp_se3_identity_and_pure_translation():
    S = jnp.array([[0.0, 0, 0, 1.0, 2.0, 3.0]])
    T = np.asarray(transforms.exp_se3(S, jnp.array([1.0])))[0]
    np.testing.assert_allclose(T[:3, :3], np.eye(3), atol=1e-6)
    np.testing.assert_allclose(T[:3, 3], [1, 2, 3], atol=1e-6)
    # rotation by theta about z matches exp_so3
    S = jnp.array([[0.0, 0, 1.0, 0, 0, 0]])
    T = np.asarray(transforms.exp_se3(S, jnp.array([math.pi / 2])))[0]
    np.testing.assert_allclose(T[:3, :3] @ np.array([1.0, 0, 0]),
                               [0, 1, 0], atol=1e-6)


def test_sh_eval_matches_reference_polynomials():
    """Evaluate degree-3 SH against a direct polynomial evaluation with the
    standard real-SH constants (PlenOctrees layout, utils/sh_utils.py)."""
    rng = np.random.default_rng(2)
    dirs = rng.normal(size=(128, 3))
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    shs = rng.normal(size=(128, 16, 3)).astype(np.float32)
    got = np.asarray(sh.eval_sh(3, jnp.array(shs), jnp.array(dirs)))

    x, y, z = dirs[:, 0:1], dirs[:, 1:2], dirs[:, 2:3]
    C0, C1 = 0.28209479177387814, 0.4886025119029199
    C2 = [1.0925484305920792, -1.0925484305920792, 0.31539156525252005,
          -1.0925484305920792, 0.5462742152960396]
    C3 = [-0.5900435899266435, 2.890611442640554, -0.4570457994644658,
          0.3731763325901154, -0.4570457994644658, 1.445305721320277,
          -0.5900435899266435]
    xx, yy, zz, xy, yz, xz = x * x, y * y, z * z, x * y, y * z, x * z
    want = C0 * shs[:, 0]
    want = want - C1 * y * shs[:, 1] + C1 * z * shs[:, 2] - C1 * x * shs[:, 3]
    want = (want + C2[0] * xy * shs[:, 4] + C2[1] * yz * shs[:, 5]
            + C2[2] * (2 * zz - xx - yy) * shs[:, 6]
            + C2[3] * xz * shs[:, 7] + C2[4] * (xx - yy) * shs[:, 8])
    want = (want + C3[0] * y * (3 * xx - yy) * shs[:, 9]
            + C3[1] * xy * z * shs[:, 10]
            + C3[2] * y * (4 * zz - xx - yy) * shs[:, 11]
            + C3[3] * z * (2 * zz - 3 * xx - 3 * yy) * shs[:, 12]
            + C3[4] * x * (4 * zz - xx - yy) * shs[:, 13]
            + C3[5] * z * (xx - yy) * shs[:, 14]
            + C3[6] * x * (xx - 3 * yy) * shs[:, 15])
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_sh_upto_masks_bands():
    rng = np.random.default_rng(3)
    dirs = rng.normal(size=(16, 3))
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    shs = rng.normal(size=(16, 16, 3)).astype(np.float32)
    for deg in range(4):
        a = np.asarray(sh.eval_sh(deg, jnp.array(shs), jnp.array(dirs)))
        b = np.asarray(sh.eval_sh_upto(3, jnp.array(deg), jnp.array(shs),
                                       jnp.array(dirs)))
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_expon_lr_schedule_endpoints_and_delay():
    f = lambda s: float(schedules.expon_lr(
        s, lr_init=1e-2, lr_final=1e-4, max_steps=1000))
    np.testing.assert_allclose(f(0), 1e-2, rtol=1e-5)
    np.testing.assert_allclose(f(1000), 1e-4, rtol=1e-5)
    np.testing.assert_allclose(f(500), math.sqrt(1e-2 * 1e-4), rtol=1e-4)
    assert f(-1) == 0.0
    g = float(schedules.expon_lr(0, lr_init=1e-2, lr_final=1e-4,
                                 lr_delay_steps=100, lr_delay_mult=0.1,
                                 max_steps=1000))
    np.testing.assert_allclose(g, 1e-3, rtol=1e-4)


def _ssim_torch_reference(img1, img2, window_size=11, sigma=1.5):
    """The reference's SSIM (utils/loss_utils.py:42-73 semantics): 2-D
    Gaussian window, depthwise conv, SAME padding — written in torch here as
    an independent check."""
    c = img1.shape[0]
    x = torch.arange(window_size, dtype=torch.float64) - window_size // 2
    g = torch.exp(-x ** 2 / (2 * sigma ** 2))
    g = g / g.sum()
    win2d = (g[:, None] @ g[None, :]).expand(c, 1, window_size, window_size)
    pad = window_size // 2
    conv = lambda t: torch.nn.functional.conv2d(t[None], win2d, padding=pad,
                                                groups=c)[0]
    mu1, mu2 = conv(img1), conv(img2)
    mu1s, mu2s, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    s1 = conv(img1 * img1) - mu1s
    s2 = conv(img2 * img2) - mu2s
    s12 = conv(img1 * img2) - mu12
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    m = ((2 * mu12 + c1) * (2 * s12 + c2)) / ((mu1s + mu2s + c1) * (s1 + s2 + c2))
    return m.mean().item()


def test_ssim_matches_torch_reference():
    rng = np.random.default_rng(4)
    a = rng.uniform(0, 1, size=(33, 47, 3))
    b = np.clip(a + rng.normal(scale=0.1, size=a.shape), 0, 1)
    want = _ssim_torch_reference(torch.tensor(a).permute(2, 0, 1),
                                 torch.tensor(b).permute(2, 0, 1))
    got = float(ssim(jnp.array(a, jnp.float32), jnp.array(b, jnp.float32)))
    np.testing.assert_allclose(got, want, atol=2e-4)
    assert abs(float(ssim(jnp.array(a, jnp.float32),
                          jnp.array(a, jnp.float32))) - 1.0) < 1e-5


def test_psnr():
    a = jnp.zeros((8, 8, 3))
    b = jnp.full((8, 8, 3), 0.1)
    np.testing.assert_allclose(float(psnr(a, b)), 20.0, atol=1e-4)


def test_stable_ewa_matches_packed_and_survives_degenerate():
    import jax
    """projection.project_gaussians(scales=, rotations=) — the
    cancellation-free factored EWA path — must (a) match the packed-cov
    path on a benign scene and (b) keep scaling/rotation gradients FINITE
    on the degenerate case that NaN'd training: large splats near the
    camera at high focal, where a*c - b^2 cancels catastrophically in f32
    and 1/det^2 overflows in the backward."""
    import math
    from d3gs_tpu.ops.camera_math import perspective_projection, world_to_view
    from d3gs_tpu.ops.projection import project_gaussians
    from d3gs_tpu.ops.transforms import cov3d_packed

    rng = np.random.default_rng(5)
    n = 128
    xyz = jnp.asarray(rng.uniform(-1, 1, (n, 3)), jnp.float32)
    scales = jnp.asarray(np.exp(rng.uniform(-4, -2, (n, 3))), jnp.float32)
    quats = jnp.asarray(rng.normal(size=(n, 4)), jnp.float32)
    opac = jnp.asarray(rng.uniform(0.2, 0.9, n), jnp.float32)
    cols = jnp.asarray(rng.uniform(0, 1, (n, 3)), jnp.float32)
    V = jnp.asarray(world_to_view(np.eye(3), np.array([0, 0, 3.0])).T,
                    jnp.float32)
    fov = math.radians(60)
    P = V @ jnp.asarray(perspective_projection(0.01, 100.0, fov, fov).T,
                        jnp.float32)
    tan = math.tan(fov / 2)

    def proj(use_factor, s, q):
        cov = cov3d_packed(s, q)
        return project_gaussians(
            xyz, None if use_factor else cov, opac, cols, V, P, tan, tan,
            400, 400, scales=s if use_factor else None,
            rotations=q if use_factor else None)

    a = proj(False, scales, quats)
    b = proj(True, scales, quats)
    np.testing.assert_allclose(np.asarray(a.conics), np.asarray(b.conics),
                               rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(a.depths), np.asarray(b.depths))
    assert (np.asarray(a.radii) == np.asarray(b.radii)).mean() > 0.98

    # degenerate: huge anisotropic splats just in front of the camera
    xyz_d = jnp.asarray(rng.uniform(-0.2, 0.2, (n, 3)), jnp.float32) \
        .at[:, 2].set(2.7)                         # view z ~ 0.3
    scales_d = jnp.asarray(
        np.stack([np.full(n, 5.0), np.full(n, 5.0), np.full(n, 1e-4)], 1),
        jnp.float32)

    def loss(use_factor):
        def f(s, q):
            sp = project_gaussians(
                xyz_d, None if use_factor else cov3d_packed(s, q), opac,
                cols, V, P, tan, tan, 400, 400,
                scales=s if use_factor else None,
                rotations=q if use_factor else None)
            return jnp.sum(sp.conics * sp.opacities[:, None]) \
                + jnp.sum(sp.means2d)
        return f

    gs, gq = jax.grad(loss(True), argnums=(0, 1))(scales_d, quats)
    assert np.isfinite(np.asarray(gs)).all(), "stable path scaling grads"
    assert np.isfinite(np.asarray(gq)).all(), "stable path rotation grads"
