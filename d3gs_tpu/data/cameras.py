"""Camera structures: host-side CameraInfo and jit-friendly Camera pytree.

TPU-native re-design of the reference's `Camera(nn.Module)`
(scene/cameras.py:18-75): instead of a mutable module that migrates tensors
between devices, `Camera` here is an immutable flax.struct pytree whose array
leaves (matrices, fid, gt image) flow straight into jitted train steps, while
width/height/names are static pytree metadata. Cameras with equal static
metadata stack into a `CameraBatch` with `jax.tree.map`, which is how the
flagship trainer feeds k cameras per iteration (train.py:148-153) without
retracing.

Matrix conventions match the reference exactly (row-vector transforms,
znear=0.01, zfar=100): see ops/camera_math.py.
"""
from __future__ import annotations

import dataclasses
import math
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..ops.camera_math import perspective_projection, world_to_view

ZNEAR = 0.01
ZFAR = 100.0


class CameraInfo(NamedTuple):
    """Host-side record straight out of a dataset reader
    (reference scene/dataset_readers.py:31-43)."""
    uid: int
    R: np.ndarray            # (3,3) cam-to-world rotation (COLMAP convention)
    T: np.ndarray            # (3,) world-to-cam translation
    fovx: float
    fovy: float
    image: np.ndarray        # (H, W, 3) float32 in [0,1], alpha pre-composited
    image_path: str
    image_name: str
    width: int
    height: int
    fid: float               # normalized frame time in [0, 1]
    mask: Optional[np.ndarray] = None   # (H, W, 1) alpha, if present
    depth: Optional[np.ndarray] = None


@struct.dataclass
class Camera:
    """Device-side camera. Array leaves participate in jit/vmap; the rest is
    static aux data."""
    viewmatrix: jax.Array        # (4,4) row-vector world→view
    projmatrix: jax.Array        # (4,4) row-vector full (view·proj)
    campos: jax.Array            # (3,)
    fid: jax.Array               # () float32
    image: jax.Array             # (H, W, 3) ground truth
    width: int = struct.field(pytree_node=False)
    height: int = struct.field(pytree_node=False)
    fovx: float = struct.field(pytree_node=False)
    fovy: float = struct.field(pytree_node=False)
    image_name: str = struct.field(pytree_node=False, default="")
    uid: int = struct.field(pytree_node=False, default=0)

    @property
    def tanfovx(self) -> float:
        return math.tan(self.fovx / 2)

    @property
    def tanfovy(self) -> float:
        return math.tan(self.fovy / 2)


# A batch of cameras is just a Camera whose array leaves have a leading axis.
CameraBatch = Camera


def camera_from_info(info: CameraInfo, *, trans=None, scale: float = 1.0,
                     resolution_scale: float = 1.0,
                     resolution: int = -1) -> Camera:
    """Build a device Camera, applying the reference's resolution policy
    (utils/camera_utils.py:21-57: -1 => 1.6k-width clamp; 1/2/4/8 =>
    divisors; other positive => target width)."""
    orig_w, orig_h = info.width, info.height
    if resolution in (1, 2, 4, 8):
        res = (round(orig_w / (resolution_scale * resolution)),
               round(orig_h / (resolution_scale * resolution)))
    else:
        if resolution == -1:
            global_down = orig_w / 1600 if orig_w > 1600 else 1
        else:
            global_down = orig_w / resolution
        s = float(global_down) * float(resolution_scale)
        res = (int(orig_w / s), int(orig_h / s))

    image = info.image
    if (res[0], res[1]) != (orig_w, orig_h):
        from PIL import Image as PILImage
        arr8 = (np.clip(image, 0, 1) * 255).astype(np.uint8)
        image = np.asarray(
            PILImage.fromarray(arr8).resize(res), dtype=np.float32) / 255.0

    V = world_to_view(info.R, info.T, translate=trans, scale=scale).T
    P = perspective_projection(ZNEAR, ZFAR, info.fovx, info.fovy).T
    full = (V @ P).astype(np.float32)
    campos = np.linalg.inv(V)[3, :3]

    return Camera(
        viewmatrix=jnp.asarray(V),
        projmatrix=jnp.asarray(full),
        campos=jnp.asarray(campos.astype(np.float32)),
        fid=jnp.asarray(np.float32(info.fid)),
        image=jnp.asarray(image.astype(np.float32)),
        width=res[0], height=res[1],
        fovx=float(info.fovx), fovy=float(info.fovy),
        image_name=info.image_name, uid=info.uid,
    )


def stack_cameras(cams: list[Camera]) -> CameraBatch:
    """Stack same-resolution cameras into a batch (leading axis on arrays)."""
    w, h = cams[0].width, cams[0].height
    assert all(c.width == w and c.height == h for c in cams), \
        "batched cameras must share resolution"
    base = dataclasses.replace(cams[0], image_name="", uid=0)
    leaves = [jax.tree.leaves(c) for c in cams]
    stacked = [jnp.stack(vals) for vals in zip(*leaves)]
    return jax.tree.unflatten(jax.tree.structure(base), stacked)


def camera_to_json(idx: int, info: CameraInfo) -> dict:
    """Reference cameras.json entry (utils/camera_utils.py:69-88)."""
    Rt = np.zeros((4, 4))
    Rt[:3, :3] = info.R.T
    Rt[:3, 3] = info.T
    Rt[3, 3] = 1.0
    W2C = np.linalg.inv(Rt)
    return {
        "id": idx,
        "img_name": info.image_name,
        "width": info.width,
        "height": info.height,
        "position": W2C[:3, 3].tolist(),
        "rotation": [r.tolist() for r in W2C[:3, :3]],
        "fy": info.height / (2 * math.tan(info.fovy / 2)),
        "fx": info.width / (2 * math.tan(info.fovx / 2)),
    }
