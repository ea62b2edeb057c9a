"""Slow, obviously-correct NumPy renderer used as the test oracle.

Implements the reference CUDA rasterizer's algorithm (SURVEY.md §2.3)
per-pixel with Python loops over depth-sorted Gaussians: EWA projection with
0.3 dilation, 3σ radius, α = min(0.99, o·exp(power)), skip α < 1/255, stop
when T·(1-α) < 1e-4. This mirrors the semantics the fast TPU path must match
(pixel allclose), independent of its tile/chunk machinery.
"""
from __future__ import annotations

import numpy as np


def quat_to_rotmat_np(q):
    q = q / np.linalg.norm(q, axis=-1, keepdims=True)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    R = np.empty(q.shape[:-1] + (3, 3), dtype=q.dtype)
    R[..., 0, 0] = 1 - 2 * (y * y + z * z)
    R[..., 0, 1] = 2 * (x * y - w * z)
    R[..., 0, 2] = 2 * (x * z + w * y)
    R[..., 1, 0] = 2 * (x * y + w * z)
    R[..., 1, 1] = 1 - 2 * (x * x + z * z)
    R[..., 1, 2] = 2 * (y * z - w * x)
    R[..., 2, 0] = 2 * (x * z - w * y)
    R[..., 2, 1] = 2 * (y * z + w * x)
    R[..., 2, 2] = 1 - 2 * (x * x + y * y)
    return R


def cov3d_np(scales, quats):
    R = quat_to_rotmat_np(quats)
    L = R * scales[..., None, :]
    return L @ np.swapaxes(L, -1, -2)


def render_naive(means3d, scales, quats, opacities, colors, viewmatrix,
                 projmatrix, tanfovx, tanfovy, width, height, bg,
                 antialias=False):
    """Returns (image HxWx3, depth HxW, alpha HxW, radii N)."""
    n = means3d.shape[0]
    fx = width / (2 * tanfovx)
    fy = height / (2 * tanfovy)
    hom = np.concatenate([means3d, np.ones((n, 1), means3d.dtype)], axis=1)
    p_view = hom @ viewmatrix
    p_hom = hom @ projmatrix
    p_proj = p_hom[:, :3] / (p_hom[:, 3:4] + 1e-7)

    Sigma = cov3d_np(scales, quats)
    Wr = viewmatrix[:3, :3].T

    mean2d = np.stack([
        ((p_proj[:, 0] + 1) * width - 1) * 0.5,
        ((p_proj[:, 1] + 1) * height - 1) * 0.5,
    ], axis=-1)

    conic = np.zeros((n, 3), np.float64)
    radius = np.zeros(n, np.float64)
    comp = np.ones(n, np.float64)
    visible = np.zeros(n, bool)
    for i in range(n):
        tz = p_view[i, 2]
        if tz <= 0.2:
            continue
        txtz = np.clip(p_view[i, 0] / tz, -1.3 * tanfovx, 1.3 * tanfovx)
        tytz = np.clip(p_view[i, 1] / tz, -1.3 * tanfovy, 1.3 * tanfovy)
        tx, ty = txtz * tz, tytz * tz
        J = np.array([[fx / tz, 0, -fx * tx / tz ** 2],
                      [0, fy / tz, -fy * ty / tz ** 2]])
        T = J @ Wr
        cov2d = T @ Sigma[i] @ T.T
        det_raw = cov2d[0, 0] * cov2d[1, 1] - cov2d[0, 1] ** 2
        a, b, c = cov2d[0, 0] + 0.3, cov2d[0, 1], cov2d[1, 1] + 0.3
        det = a * c - b * b
        if det <= 0:
            continue
        conic[i] = [c / det, -b / det, a / det]
        if antialias:
            comp[i] = np.sqrt(max(det_raw, 0.0) / det)
        mid = 0.5 * (a + c)
        lam1 = mid + np.sqrt(max(0.1, mid * mid - det))
        radius[i] = np.ceil(3 * np.sqrt(lam1))
        if radius[i] <= 0:
            continue
        visible[i] = True

    image = np.zeros((height, width, 3), np.float64)
    depth_img = np.zeros((height, width), np.float64)
    alpha_img = np.zeros((height, width), np.float64)

    TILE = 16
    tiles_x = (width + TILE - 1) // TILE
    tiles_y = (height + TILE - 1) // TILE
    tmin_x = np.clip(((mean2d[:, 0] - radius) / TILE).astype(np.int64), 0, tiles_x)
    tmin_y = np.clip(((mean2d[:, 1] - radius) / TILE).astype(np.int64), 0, tiles_y)
    tmax_x = np.clip(np.floor((mean2d[:, 0] + radius) / TILE).astype(np.int64) + 1, 0, tiles_x)
    tmax_y = np.clip(np.floor((mean2d[:, 1] + radius) / TILE).astype(np.int64) + 1, 0, tiles_y)
    visible &= (tmax_x > tmin_x) & (tmax_y > tmin_y)
    order = np.argsort(np.where(visible, p_view[:, 2], np.inf), kind="stable")
    radii_out = np.where(visible, radius, 0).astype(np.int32)

    for yy in range(height):
        for xx in range(width):
            tile_x, tile_y = xx // TILE, yy // TILE
            T = 1.0
            C = np.zeros(3)
            D = 0.0
            for i in order:
                if not visible[i]:
                    break
                # same tile-bbox membership test as the tile rasterizer
                if not (tmin_x[i] <= tile_x < tmax_x[i]
                        and tmin_y[i] <= tile_y < tmax_y[i]):
                    continue
                dx = mean2d[i, 0] - xx
                dy = mean2d[i, 1] - yy
                a, b, c = conic[i]
                power = -0.5 * (a * dx * dx + c * dy * dy) - b * dx * dy
                if power > 0:
                    continue
                alpha = min(0.99, opacities[i] * comp[i] * np.exp(power))
                if alpha < 1 / 255:
                    continue
                test_T = T * (1 - alpha)
                if test_T < 1e-4:
                    break
                C += colors[i] * alpha * T
                D += p_view[i, 2] * alpha * T
                T = test_T
            image[yy, xx] = C + T * bg
            depth_img[yy, xx] = D
            alpha_img[yy, xx] = 1 - T
    return image, depth_img, alpha_img, radii_out
