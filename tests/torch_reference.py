"""Differentiable torch-CPU reimplementation of the reference rasterizer.

An INDEPENDENT implementation of the reference CUDA algorithm (SURVEY.md
§2.3 — same math as tests/naive_reference.py) in vectorized torch ops, so
torch.autograd provides full-pipeline reference gradients for EVERY
parameter at once (means3d, scales, quats, opacities, colors). This is the
strongest available cross-check of the JAX path's custom VJP while real
reference renders are unobtainable (zero egress): finite differences probe
a few coordinates; autograd checks the complete gradient field.

Semantics match the documented TPU-path behavior (ops/rasterize.py): the
contributor set (in-bbox, power<=0, alpha>=1/255, pre-termination) is
non-differentiable (computed under no_grad, as the reference backward
replays its forward decisions), and the 0.99 alpha clamp uses the true
clamp subgradient (PARITY.md documents this deliberate deviation from the
reference's clamp-ignoring backward).
"""
from __future__ import annotations

import numpy as np
import torch


def _quat_to_rotmat(q):
    q = q / q.norm(dim=-1, keepdim=True)
    w, x, y, z = q.unbind(-1)
    return torch.stack([
        torch.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z),
                     2 * (x * z + w * y)], -1),
        torch.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z),
                     2 * (y * z - w * x)], -1),
        torch.stack([2 * (x * z - w * y), 2 * (y * z + w * x),
                     1 - 2 * (x * x + y * y)], -1),
    ], -2)


def render_torch(means3d, scales, quats, opacities, colors, viewmatrix,
                 projmatrix, tanfovx, tanfovy, width, height, bg):
    """All-tensor differentiable render -> (image (H,W,3), depth, alpha).

    Inputs are torch tensors (float64 recommended); matrices are the
    row-vector-convention (4,4) arrays the JAX path uses."""
    n = means3d.shape[0]
    dt = means3d.dtype
    fx = width / (2 * tanfovx)
    fy = height / (2 * tanfovy)
    hom = torch.cat([means3d, torch.ones(n, 1, dtype=dt)], dim=1)
    p_view = hom @ viewmatrix
    p_hom = hom @ projmatrix
    p_proj = p_hom[:, :3] / (p_hom[:, 3:4] + 1e-7)

    R = _quat_to_rotmat(quats)
    L = R * scales[:, None, :]
    Sigma = L @ L.transpose(-1, -2)
    Wr = viewmatrix[:3, :3].T

    tz = p_view[:, 2]
    txtz = torch.clamp(p_view[:, 0] / tz, -1.3 * tanfovx, 1.3 * tanfovx)
    tytz = torch.clamp(p_view[:, 1] / tz, -1.3 * tanfovy, 1.3 * tanfovy)
    tx, ty = txtz * tz, tytz * tz
    zeros = torch.zeros_like(tz)
    J = torch.stack([
        torch.stack([fx / tz, zeros, -fx * tx / tz ** 2], -1),
        torch.stack([zeros, fy / tz, -fy * ty / tz ** 2], -1),
    ], -2)                                           # (N, 2, 3)
    T2 = J @ Wr                                      # (N, 2, 3)
    cov2d = T2 @ Sigma @ T2.transpose(-1, -2)        # (N, 2, 2)
    a = cov2d[:, 0, 0] + 0.3
    b = cov2d[:, 0, 1]
    c = cov2d[:, 1, 1] + 0.3
    det = a * c - b * b
    safe_det = torch.where(det > 0, det, torch.ones_like(det))
    conic = torch.stack([c / safe_det, -b / safe_det, a / safe_det], -1)

    mean2d = torch.stack([
        ((p_proj[:, 0] + 1) * width - 1) * 0.5,
        ((p_proj[:, 1] + 1) * height - 1) * 0.5,
    ], -1)

    with torch.no_grad():
        mid = 0.5 * (a + c)
        lam1 = mid + torch.sqrt(torch.clamp(mid * mid - det, min=0.1))
        radius = torch.ceil(3 * torch.sqrt(lam1))
        visible = (tz > 0.2) & (det > 0) & (radius > 0)
        TILE = 16
        tiles_x = (width + TILE - 1) // TILE
        tiles_y = (height + TILE - 1) // TILE
        m2 = mean2d
        tmin_x = ((m2[:, 0] - radius) / TILE).long().clamp(0, tiles_x)
        tmin_y = ((m2[:, 1] - radius) / TILE).long().clamp(0, tiles_y)
        tmax_x = (torch.floor((m2[:, 0] + radius) / TILE).long() + 1) \
            .clamp(0, tiles_x)
        tmax_y = (torch.floor((m2[:, 1] + radius) / TILE).long() + 1) \
            .clamp(0, tiles_y)
        visible &= (tmax_x > tmin_x) & (tmax_y > tmin_y)
        depth_key = torch.where(visible, tz,
                                torch.full_like(tz, float("inf")))
        order = torch.argsort(depth_key, stable=True)

    yy, xx = torch.meshgrid(torch.arange(height, dtype=dt),
                            torch.arange(width, dtype=dt), indexing="ij")
    px = torch.stack([xx.reshape(-1), yy.reshape(-1)], -1)   # (P, 2)

    dxy = mean2d[order][:, None, :] - px[None, :, :]          # (N, P, 2)
    co = conic[order]
    power = (-0.5 * (co[:, 0, None] * dxy[..., 0] ** 2
                     + co[:, 2, None] * dxy[..., 1] ** 2)
             - co[:, 1, None] * dxy[..., 0] * dxy[..., 1])
    alpha_raw = opacities[order][:, None] * torch.exp(power)
    alpha_full = torch.clamp(alpha_raw, max=0.99)             # (N, P)

    with torch.no_grad():
        # per-pixel contributor set with the reference's sequential rules
        tile_x = (px[:, 0] // 16).long()
        tile_y = (px[:, 1] // 16).long()
        in_bbox = ((tmin_x[order][:, None] <= tile_x[None])
                   & (tile_x[None] < tmax_x[order][:, None])
                   & (tmin_y[order][:, None] <= tile_y[None])
                   & (tile_y[None] < tmax_y[order][:, None])
                   & visible[order][:, None])
        inc_rows = []
        t_run = torch.ones(px.shape[0], dtype=dt)
        for i in range(n):
            cand = (in_bbox[i] & (power[i] <= 0)
                    & (alpha_full[i] >= 1.0 / 255.0))
            test_t = t_run * (1 - alpha_full[i])
            cand &= test_t >= 1e-4
            t_run = torch.where(cand, test_t, t_run)
            inc_rows.append(cand)
        include = torch.stack(inc_rows).to(dt)                # (N, P)

    am = alpha_full * include
    log_t = torch.cumsum(torch.log1p(-am), dim=0)
    t_excl = torch.cat([torch.ones(1, px.shape[0], dtype=dt),
                        torch.exp(log_t[:-1])], dim=0)        # (N, P)
    w = am * t_excl
    img = (w[:, :, None] * colors[order][:, None, :]).sum(0)  # (P, 3)
    t_fin = torch.exp(log_t[-1])
    img = img + t_fin[:, None] * bg[None, :]
    dep = (w * tz[order][:, None]).sum(0)
    return (img.reshape(height, width, 3), dep.reshape(height, width),
            (1 - t_fin).reshape(height, width))


def render_torch_np(means, scales, quats, opac, colors, cam,
                    with_grads=False, loss_weights=None):
    """Numpy-in/numpy-out convenience wrapper; with_grads returns the
    autograd gradients of sum(image * loss_weights) wrt every input."""
    req = with_grads
    tt = [torch.tensor(np.asarray(x, np.float64), requires_grad=req)
          for x in (means, scales, quats, opac, colors)]
    img, dep, alp = render_torch(
        *tt, torch.tensor(np.asarray(cam["viewmatrix"], np.float64)),
        torch.tensor(np.asarray(cam["projmatrix"], np.float64)),
        cam["tanfovx"], cam["tanfovy"], cam["width"], cam["height"],
        torch.tensor(np.asarray(cam["bg"], np.float64)))
    if not with_grads:
        return (img.detach().numpy(), dep.detach().numpy(),
                alp.detach().numpy())
    lw = torch.tensor(np.asarray(loss_weights, np.float64))
    (img * lw).sum().backward()
    return (img.detach().numpy(),
            [t.grad.numpy() for t in tt])
