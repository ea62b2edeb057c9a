"""Offline render modes (reference render.py:30-442).

Modes: `render` (train/test splits + trajectory plots), `time`, `view`,
`pose`, `all`, `original` — each dumps renders/ depth/ (gt/) PNGs and an
mp4. All rendering goes through one jitted function; camera pose changes
re-enter as array updates (no retraces), matching how the reference mutates
`reset_extrinsic` (scene/cameras.py:63-67).
"""
from __future__ import annotations

import dataclasses
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.cameras import Camera
from ..models.renderer import render
from ..ops.camera_math import perspective_projection, world_to_view
from .pose_paths import pose_spherical, pose_to_blender_rt, wander_path

to8b = lambda x: (255 * np.clip(np.asarray(x), 0, 1)).astype(np.uint8)


def _save_png(path: str, arr8: np.ndarray):
    import imageio.v2 as imageio
    imageio.imwrite(path, arr8)


def _save_video(path: str, frames: list[np.ndarray], fps: int = 30):
    try:
        import imageio.v2 as imageio
        imageio.mimwrite(path, np.stack(frames, 0), fps=fps, quality=8)
    except Exception as e:  # codec may be missing in minimal images
        print(f"[render] video export skipped ({e})")


def make_render_fn(gaussians, field, pipe_cfg, *, is_6dof=False,
                   direct_compute=False):
    @jax.jit
    def render_at(state, d_params, camera: Camera, bg):
        if d_params is not None:
            dx, dr, ds = field.step(d_params, state.params.xyz, camera.fid)
        else:
            dx, dr, ds = 0.0, 0.0, 0.0
        return render(state, camera, d_xyz=dx, d_rotation=dr, d_scaling=ds,
                      is_6dof=is_6dof, direct_compute=direct_compute,
                      bg=bg, tile_capacity=pipe_cfg.tile_capacity,
                      tile_chunk=pipe_cfg.tile_chunk,
                      bin_chunk=pipe_cfg.bin_chunk,
                      binning=pipe_cfg.binning,
                      dup_capacity=pipe_cfg.dup_capacity,
                      antialias=pipe_cfg.antialias)

    return render_at


def camera_with_pose(cam: Camera, R: np.ndarray, T: np.ndarray) -> Camera:
    """Re-pose a camera (reset_extrinsic equivalent) — array update only."""
    V = world_to_view(R, T).T
    P = perspective_projection(0.01, 100.0, cam.fovx, cam.fovy).T
    return dataclasses.replace(
        cam,
        viewmatrix=jnp.asarray(V, jnp.float32),
        projmatrix=jnp.asarray((V @ P), jnp.float32),
        campos=jnp.asarray(np.linalg.inv(V)[3, :3], jnp.float32))


def camera_with_fid(cam: Camera, fid: float) -> Camera:
    return dataclasses.replace(cam, fid=jnp.asarray(fid, jnp.float32))


def _dump(render_at, state, d_params, cam, bg, render_path, depth_path, i):
    out = render_at(state, d_params, cam, bg)
    img8 = to8b(out.image)
    _save_png(os.path.join(render_path, f"{i:05d}.png"), img8)
    d = np.asarray(out.depth)
    d = d / (d.max() + 1e-5)
    _save_png(os.path.join(depth_path, f"{i:05d}.png"), to8b(d))
    return img8


def render_split(model_path, name, iteration, views, state, d_params,
                 render_at, bg):
    """Per-view renders + gt dump (render.py::render_set core)."""
    base = os.path.join(model_path, name, f"ours_{iteration}")
    render_path = os.path.join(base, "renders")
    gts_path = os.path.join(base, "gt")
    depth_path = os.path.join(base, "depth")
    for p in (render_path, gts_path, depth_path):
        os.makedirs(p, exist_ok=True)
    for i, view in enumerate(views):
        _dump(render_at, state, d_params, view, bg, render_path, depth_path,
              i)
        _save_png(os.path.join(gts_path, f"{i:05d}.png"), to8b(view.image))


def interpolate_time(model_path, name, iteration, views, state, d_params,
                     render_at, bg, frames=150, view_idx=0):
    base = os.path.join(model_path, name, f"interpolate_{iteration}")
    render_path = os.path.join(base, "renders")
    depth_path = os.path.join(base, "depth")
    os.makedirs(render_path, exist_ok=True)
    os.makedirs(depth_path, exist_ok=True)
    view = views[view_idx]
    imgs = []
    for t in range(frames):
        cam = camera_with_fid(view, t / (frames - 1))
        imgs.append(_dump(render_at, state, d_params, cam, bg, render_path,
                          depth_path, t))
    _save_video(os.path.join(render_path, "video.mp4"), imgs)


def interpolate_view(model_path, name, iteration, views, state, d_params,
                     render_at, bg, R, T, view_idx=0):
    base = os.path.join(model_path, name, f"interpolate_view_{iteration}")
    render_path = os.path.join(base, "renders")
    depth_path = os.path.join(base, "depth")
    os.makedirs(render_path, exist_ok=True)
    os.makedirs(depth_path, exist_ok=True)
    view = views[view_idx]
    poses = wander_path(R, T, view.fovy, view.height)
    imgs = []
    for i, pose in enumerate(poses):
        Rp, Tp = pose_to_blender_rt(pose)
        cam = camera_with_pose(view, Rp, Tp)
        imgs.append(_dump(render_at, state, d_params, cam, bg, render_path,
                          depth_path, i))
    _save_video(os.path.join(render_path, "video.mp4"), imgs)


def interpolate_all(model_path, name, iteration, views, state, d_params,
                    render_at, bg, frames=150, view_idx=0):
    """Spherical orbit + sweeping time (render.py:256-295)."""
    base = os.path.join(model_path, name, f"interpolate_all_{iteration}")
    render_path = os.path.join(base, "renders")
    depth_path = os.path.join(base, "depth")
    os.makedirs(render_path, exist_ok=True)
    os.makedirs(depth_path, exist_ok=True)
    view = views[view_idx]
    imgs = []
    for i in range(frames):
        pose = pose_spherical(-180 + 360 * i / frames, -30.0, 4.0)
        Rp, Tp = pose_to_blender_rt(pose)
        cam = camera_with_fid(camera_with_pose(view, Rp, Tp),
                              i / (frames - 1))
        imgs.append(_dump(render_at, state, d_params, cam, bg, render_path,
                          depth_path, i))
    _save_video(os.path.join(render_path, "video.mp4"), imgs)


def interpolate_poses(model_path, name, iteration, views, state, d_params,
                      render_at, bg, frames=150, fid: float = 0.0):
    """Lerp between two extreme real poses at fixed fid (render.py:298-340)."""
    base = os.path.join(model_path, name, f"interpolate_pose_{iteration}")
    render_path = os.path.join(base, "renders")
    depth_path = os.path.join(base, "depth")
    os.makedirs(render_path, exist_ok=True)
    os.makedirs(depth_path, exist_ok=True)
    v0, v1 = views[0], views[-1]
    imgs = []
    for i in range(frames):
        a = i / (frames - 1)
        vm = (1 - a) * np.asarray(v0.viewmatrix) + a * np.asarray(v1.viewmatrix)
        cam = dataclasses.replace(
            camera_with_fid(v0, fid),
            viewmatrix=jnp.asarray(vm),
            projmatrix=jnp.asarray(
                vm @ np.asarray(perspective_projection(
                    0.01, 100.0, v0.fovx, v0.fovy).T)),
            campos=jnp.asarray(np.linalg.inv(vm)[3, :3]))
        imgs.append(_dump(render_at, state, d_params, cam, bg, render_path,
                          depth_path, i))
    _save_video(os.path.join(render_path, "video.mp4"), imgs)


def interpolate_view_original(model_path, name, iteration, views, state,
                              d_params, render_at, bg, frames=150):
    """Piecewise-lerped real poses with sweeping fid (render.py:343-396)."""
    base = os.path.join(model_path, name,
                        f"interpolate_hyper_view_{iteration}")
    render_path = os.path.join(base, "renders")
    depth_path = os.path.join(base, "depth")
    os.makedirs(render_path, exist_ok=True)
    os.makedirs(depth_path, exist_ok=True)
    imgs = []
    n_seg = max(len(views) - 1, 1)
    for i in range(frames):
        t = i / max(frames - 1, 1)
        seg = min(int(t * n_seg), n_seg - 1)
        a = t * n_seg - seg
        v0, v1 = views[seg], views[min(seg + 1, len(views) - 1)]
        vm = (1 - a) * np.asarray(v0.viewmatrix) + a * np.asarray(v1.viewmatrix)
        cam = dataclasses.replace(
            camera_with_fid(v0, t),
            viewmatrix=jnp.asarray(vm),
            projmatrix=jnp.asarray(
                vm @ np.asarray(perspective_projection(
                    0.01, 100.0, v0.fovx, v0.fovy).T)),
            campos=jnp.asarray(np.linalg.inv(vm)[3, :3]))
        imgs.append(_dump(render_at, state, d_params, cam, bg, render_path,
                          depth_path, i))
    _save_video(os.path.join(render_path, "video.mp4"), imgs)
