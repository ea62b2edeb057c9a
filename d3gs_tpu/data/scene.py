"""Scene orchestration: dataset sniffing, camera lists, Gaussian init/IO.

Functional counterpart of the reference `Scene` (scene/__init__.py:23-112):
marker-file sniffing picks a reader, cameras are loaded per resolution scale,
the camera extent drives the xyz learning-rate scale and densification
thresholds, and checkpoints round-trip through the standard 3DGS PLY layout
so reference checkpoints load directly.
"""
from __future__ import annotations

import json
import os
import random
from typing import Optional

import numpy as np

from .. import config as cfg
from ..models import gaussians as G
from .cameras import Camera, camera_from_info, camera_to_json
from .dataset_readers import (SceneData, read_colmap_scene,
                              read_dtu_scene, read_dynamic360_scene,
                              read_nerf_synthetic, read_nerfies_scene,
                              read_plenoptic_scene)
from .ply import read_ply_columns, write_ply

SceneInfo = SceneData


def sniff_dataset_type(source_path: str) -> str:
    """Marker-file dispatch (reference scene/__init__.py:45-63)."""
    if os.path.exists(os.path.join(source_path, "sparse")):
        return "colmap"
    if os.path.exists(os.path.join(source_path, "transforms_train.json")):
        return "blender"
    if os.path.exists(os.path.join(source_path, "cameras_sphere.npz")):
        return "dtu"
    if os.path.exists(os.path.join(source_path, "dataset.json")):
        return "nerfies"
    if os.path.exists(os.path.join(source_path, "poses_bounds.npy")):
        return "plenoptic"
    if os.path.exists(os.path.join(source_path, "transforms.json")):
        return "dynamic360"
    raise ValueError(f"Could not recognize scene type at {source_path}")


def load_scene_data(model: cfg.ModelParams) -> SceneData:
    kind = sniff_dataset_type(model.source_path)
    if kind == "colmap":
        return read_colmap_scene(model.source_path, model.images, model.eval)
    if kind == "blender":
        return read_nerf_synthetic(model.source_path, model.white_background,
                                   model.eval)
    if kind == "nerfies":
        return read_nerfies_scene(model.source_path, model.eval)
    if kind == "dtu":
        return read_dtu_scene(model.source_path)
    if kind == "plenoptic":
        return read_plenoptic_scene(model.source_path, model.eval, 24)
    if kind == "dynamic360":
        return read_dynamic360_scene(model.source_path)
    raise NotImplementedError(f"dataset type {kind!r} not yet supported")


def search_for_max_iteration(folder: str) -> int:
    """utils/system_utils.py:28-30 semantics."""
    iters = [int(f.split("_")[-1]) for f in os.listdir(folder)
             if f.startswith("iteration_")]
    return max(iters)


class Scene:
    """Host-side owner of cameras + GaussianState init/checkpoints."""

    def __init__(self, model: cfg.ModelParams, *, load_iteration=None,
                 shuffle: bool = True, resolution_scales=(1.0,),
                 capacity: int = 0, seed: int = 0):
        self.model_path = model.model_path
        self.loaded_iter = None
        if load_iteration is not None:
            if load_iteration == -1:
                self.loaded_iter = search_for_max_iteration(
                    os.path.join(self.model_path, "point_cloud"))
            else:
                self.loaded_iter = load_iteration

        info = load_scene_data(model)
        self.scene_info = info

        if not self.loaded_iter and self.model_path:
            os.makedirs(self.model_path, exist_ok=True)
            cams = list(info.test_cameras) + list(info.train_cameras)
            with open(os.path.join(self.model_path, "cameras.json"), "w") as f:
                json.dump([camera_to_json(i, c) for i, c in enumerate(cams)],
                          f)

        train_infos = list(info.train_cameras)
        test_infos = list(info.test_cameras)
        if shuffle:
            rng = random.Random(seed)
            rng.shuffle(train_infos)
            rng.shuffle(test_infos)

        self.cameras_extent = float(info.nerf_normalization["radius"])
        self.train_cameras: dict[float, list[Camera]] = {}
        self.test_cameras: dict[float, list[Camera]] = {}
        for rs in resolution_scales:
            self.train_cameras[rs] = [
                camera_from_info(c, resolution_scale=rs,
                                 resolution=model.resolution)
                for c in train_infos]
            self.test_cameras[rs] = [
                camera_from_info(c, resolution_scale=rs,
                                 resolution=model.resolution)
                for c in test_infos]

        if self.loaded_iter:
            self.gaussians = load_gaussians_ply(
                os.path.join(self.model_path, "point_cloud",
                             f"iteration_{self.loaded_iter}",
                             "point_cloud.ply"),
                sh_degree=model.sh_degree,
                spatial_lr_scale=self.cameras_extent,
                max_gaussians=model.max_gaussians, capacity=capacity)
        else:
            pcd = info.point_cloud
            self.gaussians = G.create_from_pcd(
                np.asarray(pcd.points, np.float32),
                np.asarray(pcd.colors, np.float32),
                sh_degree=model.sh_degree,
                spatial_lr_scale=self.cameras_extent,
                max_gaussians=model.max_gaussians,
                capacity=capacity, seed=seed)

    def get_train_cameras(self, scale: float = 1.0):
        return self.train_cameras[scale]

    def get_test_cameras(self, scale: float = 1.0):
        return self.test_cameras[scale]

    def save(self, iteration: int, gaussians: G.GaussianState):
        path = os.path.join(self.model_path, "point_cloud",
                            f"iteration_{iteration}")
        os.makedirs(path, exist_ok=True)
        save_gaussians_ply(os.path.join(path, "point_cloud.ply"), gaussians)


# ---------------------------------------------------------------------------
# Gaussian checkpoint IO — standard 3DGS PLY layout
# (reference scene/gaussian_model.py:168-240)
# ---------------------------------------------------------------------------

def save_gaussians_ply(path: str, state: G.GaussianState) -> None:
    alive = np.asarray(state.alive)
    p = state.params
    xyz = np.asarray(p.xyz)[alive]
    f_dc = np.asarray(p.features_dc)[alive]          # (N, 1, 3)
    f_rest = np.asarray(p.features_rest)[alive]      # (N, K-1, 3)
    opacity = np.asarray(p.opacity)[alive]
    scaling = np.asarray(p.scaling)[alive]
    rotation = np.asarray(p.rotation)[alive]
    n = xyz.shape[0]

    arrays: dict[str, np.ndarray] = {
        "x": xyz[:, 0], "y": xyz[:, 1], "z": xyz[:, 2],
        "nx": np.zeros(n, np.float32), "ny": np.zeros(n, np.float32),
        "nz": np.zeros(n, np.float32),
    }
    # channel-major flattening, matching the reference's
    # transpose(1, 2).flatten (gaussian_model.py:172-180)
    dc_t = f_dc.transpose(0, 2, 1).reshape(n, -1)
    for i in range(dc_t.shape[1]):
        arrays[f"f_dc_{i}"] = dc_t[:, i]
    rest_t = f_rest.transpose(0, 2, 1).reshape(n, -1)
    for i in range(rest_t.shape[1]):
        arrays[f"f_rest_{i}"] = rest_t[:, i]
    arrays["opacity"] = opacity[:, 0]
    for i in range(scaling.shape[1]):
        arrays[f"scale_{i}"] = scaling[:, i]
    for i in range(rotation.shape[1]):
        arrays[f"rot_{i}"] = rotation[:, i]
    arrays = {k: np.asarray(v, np.float32) for k, v in arrays.items()}
    write_ply(path, arrays)


def load_gaussians_ply(path: str, *, sh_degree: int = 3,
                       spatial_lr_scale: float = 1.0,
                       max_gaussians: int = 500_000,
                       capacity: int = 0, seed: int = 0) -> G.GaussianState:
    """Load a 3DGS-format checkpoint (also reads reference-produced files;
    reference load_ply :192-240 incl. max_gaussians subsampling)."""
    import jax.numpy as jnp
    v, names = read_ply_columns(path)
    n = len(v["x"])
    sel = np.arange(n)
    if n > max_gaussians:
        sel = np.random.default_rng(seed).choice(n, max_gaussians,
                                                 replace=False)
    xyz = np.stack([v["x"], v["y"], v["z"]], axis=-1)[sel]
    n = len(sel)
    k = (sh_degree + 1) ** 2

    f_dc = np.stack([v[f"f_dc_{i}"] for i in range(3)], axis=1)[sel]
    f_dc = f_dc.reshape(n, 3, 1).transpose(0, 2, 1)
    rest_names = sorted((nm for nm in names if nm.startswith("f_rest_")),
                        key=lambda s: int(s.split("_")[-1]))
    if rest_names:
        rest = np.stack([v[nm] for nm in rest_names], axis=1)[sel]
        rest = rest.reshape(n, 3, (k - 1)).transpose(0, 2, 1)
    else:
        rest = np.zeros((n, k - 1, 3), np.float32)
    opacity = v["opacity"][sel][:, None]
    scaling = np.stack([v[f"scale_{i}"] for i in range(3)], axis=-1)[sel]
    rotation = np.stack([v[f"rot_{i}"] for i in range(4)], axis=-1)[sel]

    cap = capacity or G._round_capacity(n)

    def padded(a, fill=0.0):
        out = np.full((cap,) + a.shape[1:], fill, np.float32)
        out[:n] = a
        return jnp.asarray(out)

    rot_pad = np.zeros((cap, 4), np.float32)
    rot_pad[:, 0] = 1.0
    rot_pad[:n] = rotation
    params = G.GaussianParams(
        xyz=padded(xyz), features_dc=padded(f_dc),
        features_rest=padded(rest), scaling=padded(scaling),
        rotation=jnp.asarray(rot_pad),
        opacity=padded(opacity))
    import jax
    zeros_m = jax.tree.map(jnp.zeros_like, params)
    zeros_v = jax.tree.map(jnp.zeros_like, params)
    return G.GaussianState(
        params=params, alive=jnp.arange(cap) < n,
        grad_accum=jnp.zeros(cap), denom=jnp.zeros(cap),
        max_radii2d=jnp.zeros(cap),
        opt=G.AdamState(m=zeros_m, v=zeros_v, count=jnp.zeros((), jnp.int32)),
        active_sh_degree=jnp.asarray(sh_degree, jnp.int32),
        max_sh_degree=sh_degree, capacity=cap,
        spatial_lr_scale=float(spatial_lr_scale))
