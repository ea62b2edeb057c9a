"""Device-mesh construction + sharding layouts.

The reference has no distributed support at all (SURVEY.md §2.2); this
module is the new TPU-native scaling layer. Layout (BASELINE.json north
star):

  * one mesh axis `"shard"` spanning all chips (ICI within a slice, DCN
    across hosts — jax.sharding handles the hierarchy);
  * **Gaussian axis sharded** for the deformation field + EWA preprocessing
    (embarrassingly parallel over N; each chip holds capacity/D rows of
    every per-Gaussian array, optimizer moments included);
  * **all-gather of projected splats** (≈44 B/Gaussian ≪ raw params) before
    binning, riding ICI;
  * **tile rows sharded** for binning + blending — each chip rasterizes an
    image strip; strips all-gather into the full frame for the loss;
  * gradients flow back through the same collectives (shard_map AD inserts
    the reduce-scatter/psum duals automatically); deform-MLP params are
    replicated with a gradient psum — plain data parallelism.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.gaussians import GaussianState

AXIS = "shard"
CAM_AXIS = "cam"


def make_mesh(devices=None, axis_name: str = AXIS) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def make_mesh_2d(devices, cam: int, shard: int,
                 cam_axis: str = CAM_AXIS, axis_name: str = AXIS) -> Mesh:
    """(cam × shard) mesh for the composed flagship layout: the camera
    batch shards over `cam` groups (DCN-friendly: one grad psum) and
    Gaussians + tile rows shard over `shard` within each group (ICI:
    per-camera splat all-gather) — parallel/COMMS.md 'Multi-host story'."""
    devices = np.asarray(devices[:cam * shard]).reshape(cam, shard)
    return Mesh(devices, (cam_axis, axis_name))


def gaussian_state_spec(axis_name: str = AXIS):
    """PartitionSpec tree for GaussianState: every per-Gaussian array is
    sharded on its leading (capacity) axis; scalars replicated."""
    def spec_for(leaf_path_unused, leaf):
        if hasattr(leaf, "ndim") and leaf.ndim >= 1:
            return P(axis_name)
        return P()
    return spec_for


def shard_gaussian_state(state: GaussianState, mesh: Mesh,
                         axis_name: str = AXIS) -> GaussianState:
    """Place a GaussianState with the capacity axis sharded over the mesh.
    Capacity is always a multiple of 1024 (gaussians._round_capacity), so it
    divides any practical mesh size."""
    def put(leaf):
        if hasattr(leaf, "ndim") and leaf.ndim >= 1 \
                and leaf.shape[0] == state.capacity:
            return jax.device_put(leaf, NamedSharding(mesh, P(axis_name)))
        return jax.device_put(leaf, NamedSharding(mesh, P()))
    return jax.tree.map(put, state)


def replicate(tree, mesh: Mesh):
    return jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree)
