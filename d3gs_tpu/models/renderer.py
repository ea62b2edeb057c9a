"""Renderer bridge: compose deformation with Gaussian params and rasterize.

Functional counterpart of the reference's `gaussian_renderer/__init__.py::
render()` (:32-133). Three deformation composition modes, identical
semantics:
  * direct (`direct_compute`): means3D = d_xyz are absolute positions
    (the ODE path integrates trajectories in world space, :69-70);
  * 6DoF (`is_6dof`): d_xyz is a per-Gaussian SE(3) matrix applied to the
    canonical means in homogeneous coords (:71-76);
  * additive: means3D = xyz + d_xyz; scales/rotations also additive
    post-activation (:78, :96-97).

SH→RGB happens here (per camera view direction, on the deformed means —
matching the CUDA in-kernel SH path), so the rasterizer proper only sees
colors. The `means2d_tap` argument is the TPU-native version of the
reference's dual screenspace-gradient tensors (means2D / means2D_densify,
:41-47, :115-124): a zeros (N, 2) input added to the projected centers whose
gradient — extracted in the same backward pass as the parameter grads —
feeds the densification statistics.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..data.cameras import Camera
from ..ops.projection import TILE, project_gaussians
from ..ops.binning import bin_splats, bin_splats_records, bin_splats_sorted
from ..ops.rasterize import RenderOutput, blend, blend_records, pack_records
from ..ops.sh import eval_sh_upto
from ..ops.transforms import apply_se3
from .gaussians import GaussianState


def render(
    gaussians: GaussianState,
    camera: Camera,
    *,
    d_xyz: jax.Array | float = 0.0,
    d_rotation: jax.Array | float = 0.0,
    d_scaling: jax.Array | float = 0.0,
    is_6dof: bool = False,
    direct_compute: bool = False,
    scaling_modifier: float = 1.0,
    override_color: Optional[jax.Array] = None,
    bg: jax.Array | None = None,
    means2d_tap: Optional[jax.Array] = None,
    tile_capacity: int = 1024,
    tile_chunk: int = 40,
    bin_chunk: int = 2048,
    antialias: bool = False,
    binning: str = "auto",
    dup_capacity: int = 0,
    tight_cull: bool = False,
    depth_grad: bool = True,
) -> RenderOutput:
    p = gaussians.params

    if direct_compute:
        # ODE path: d_xyz are absolute world positions (reference :69-70);
        # a scalar 0.0 (warm-up) leaves the canonical means in place.
        means3d = d_xyz if isinstance(d_xyz, jax.Array) and d_xyz.ndim >= 2 \
            else p.xyz
    elif is_6dof:
        if isinstance(d_xyz, jax.Array) and d_xyz.ndim == 3:
            means3d = apply_se3(d_xyz, p.xyz)
        else:
            means3d = p.xyz + d_xyz
    else:
        means3d = p.xyz + d_xyz

    scales = gaussians.get_scaling * scaling_modifier + d_scaling
    rotations = gaussians.get_rotation + d_rotation
    opacity = gaussians.get_opacity[:, 0]

    if override_color is not None:
        colors = override_color
    else:
        dirs = means3d - camera.campos[None, :]
        dirs = dirs / jnp.maximum(
            jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-8)
        colors = eval_sh_upto(gaussians.max_sh_degree,
                              gaussians.active_sh_degree,
                              gaussians.get_features, dirs)
        colors = jnp.maximum(colors + 0.5, 0.0)

    if bg is None:
        bg = jnp.zeros(3)

    width, height = camera.width, camera.height
    tiles_x = (width + TILE - 1) // TILE
    tiles_y = (height + TILE - 1) // TILE

    splats = project_gaussians(
        means3d, None, opacity, colors,
        camera.viewmatrix, camera.projmatrix,
        camera.tanfovx, camera.tanfovy, width, height,
        antialias=antialias, alive=gaussians.alive,
        scales=scales, rotations=rotations)
    if means2d_tap is not None:
        splats = splats._replace(means2d=splats.means2d + means2d_tap)
    if binning == "auto":
        binning = "pallas" if jax.default_backend() == "tpu" else "packed"
    if binning == "pallas":
        # Pallas TPU kernel path: no per-tile capacity cap, early-terminating
        # VMEM-resident blend (ops/pallas_blend.py). Off-TPU backends run the
        # kernel in interpreter mode (tests); prefer "packed" there for speed.
        from ..ops.pallas_blend import blend_records_pallas
        rbins = bin_splats_records(
            jax.lax.stop_gradient(splats),
            tiles_x=tiles_x, tiles_y=tiles_y, dup_capacity=dup_capacity,
            tight_cull=tight_cull)
        records = pack_records(splats)
        image, depth, alpha = blend_records_pallas(
            records, rbins, bg, tiles_x=tiles_x, tiles_y=tiles_y,
            width=width, height=height,
            interpret=jax.default_backend() != "tpu",
            depth_grad=depth_grad)
        return RenderOutput(image=image, depth=depth, alpha=alpha,
                            radii=splats.radii, counts=rbins.counts)
    if binning == "packed":
        rbins = bin_splats_records(
            jax.lax.stop_gradient(splats),
            tiles_x=tiles_x, tiles_y=tiles_y, dup_capacity=dup_capacity)
        records = pack_records(splats)
        image, depth, alpha = blend_records(
            records, rbins, bg, tiles_x=tiles_x, tiles_y=tiles_y,
            width=width, height=height, tile_capacity=tile_capacity,
            tile_chunk=tile_chunk)
        return RenderOutput(image=image, depth=depth, alpha=alpha,
                            radii=splats.radii, counts=rbins.counts)
    if binning == "sort":
        bins = bin_splats_sorted(
            jax.lax.stop_gradient(splats),
            tiles_x=tiles_x, tiles_y=tiles_y, capacity=tile_capacity,
            dup_capacity=dup_capacity)
    else:
        bins = bin_splats(
            jax.lax.stop_gradient(splats),
            tiles_x=tiles_x, tiles_y=tiles_y, capacity=tile_capacity,
            chunk=bin_chunk)
    image, depth, alpha = blend(
        splats, bins, bg, tiles_x=tiles_x, tiles_y=tiles_y,
        width=width, height=height, tile_chunk=tile_chunk)
    return RenderOutput(image=image, depth=depth, alpha=alpha,
                        radii=splats.radii, counts=bins.counts)
