"""Rotation / covariance / rigid-transform math, batched over leading axes.

TPU-native counterparts of the reference's quaternion and SE(3) helpers
(reference: utils/general_utils.py:130-163, utils/rigid_utils.py). Everything
here is shape-polymorphic over leading batch dims and written so XLA fuses the
whole chain into the surrounding computation (no materialized intermediates
beyond what the caller asks for).

Conventions (matching the reference so checkpoints/tests interop):
  * quaternions are (w, x, y, z), normalized internally
  * scales enter post-activation (exp already applied)
  * cov3d is packed symmetric-upper: (xx, xy, xz, yy, yz, zz)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def quat_normalize(q: jax.Array, eps: float = 1e-12) -> jax.Array:
    """Normalize quaternions along the last axis."""
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), eps)


def quat_to_rotmat(q: jax.Array) -> jax.Array:
    """(..., 4) wxyz quaternion -> (..., 3, 3) rotation matrix.

    Same element layout as the reference's `build_rotation`
    (utils/general_utils.py:130-151).
    """
    q = quat_normalize(q)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    row0 = jnp.stack([1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)], axis=-1)
    row1 = jnp.stack([2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)], axis=-1)
    row2 = jnp.stack([2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def quat_multiply(q1: jax.Array, q2: jax.Array) -> jax.Array:
    """Hamilton product of wxyz quaternions, (..., 4) x (..., 4) -> (..., 4)."""
    w1, x1, y1, z1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    w2, x2, y2, z2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def build_scaling_rotation(scale: jax.Array, q: jax.Array) -> jax.Array:
    """(..., 3) scales + (..., 4) quats -> L = R @ diag(s), (..., 3, 3).

    Reference: utils/general_utils.py:154-163.
    """
    R = quat_to_rotmat(q)
    return R * scale[..., None, :]  # column-scaling == R @ diag(s)


def quat_to_rotmat_cols(q: jax.Array):
    """(..., 4) wxyz quaternion -> 9 scalar channels (r00..r22).

    Channel form instead of (..., 3, 3): batched tiny-matrix tensors force
    XLA:TPU into padded T(4,128)/convolution lowerings (measured ~3 ms of a
    24 ms train step just in the cov3d/EWA chains); scalar channels fuse
    into a single elementwise kernel."""
    q = quat_normalize(q)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    return (1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy))


def cov3d_packed(scale: jax.Array, q: jax.Array, scale_modifier: float | jax.Array = 1.0) -> jax.Array:
    """3D covariance Σ = L Lᵀ with L = R diag(s·mod), packed to 6 upper-tri terms.

    Packing order (xx, xy, xz, yy, yz, zz) matches the reference's
    `strip_symmetric` consumer layout (utils/general_utils.py:113-127,
    scene/gaussian_model.py:28-32). Written as scalar channels —
    cov[i,k] = Σ_j R[i,j] R[k,j] s_j² — so the whole thing (and its
    backward) is one fused elementwise pass, not batched 3x3 matmuls."""
    s = scale * scale_modifier
    s0, s1, s2 = s[..., 0] ** 2, s[..., 1] ** 2, s[..., 2] ** 2
    r00, r01, r02, r10, r11, r12, r20, r21, r22 = quat_to_rotmat_cols(q)
    return jnp.stack([
        r00 * r00 * s0 + r01 * r01 * s1 + r02 * r02 * s2,
        r00 * r10 * s0 + r01 * r11 * s1 + r02 * r12 * s2,
        r00 * r20 * s0 + r01 * r21 * s1 + r02 * r22 * s2,
        r10 * r10 * s0 + r11 * r11 * s1 + r12 * r12 * s2,
        r10 * r20 * s0 + r11 * r21 * s1 + r12 * r22 * s2,
        r20 * r20 * s0 + r21 * r21 * s1 + r22 * r22 * s2,
    ], axis=-1)


def unpack_cov3d(packed: jax.Array) -> jax.Array:
    """(..., 6) packed symmetric -> (..., 3, 3) full matrix."""
    xx, xy, xz, yy, yz, zz = (packed[..., i] for i in range(6))
    row0 = jnp.stack([xx, xy, xz], axis=-1)
    row1 = jnp.stack([xy, yy, yz], axis=-1)
    row2 = jnp.stack([xz, yz, zz], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def inverse_sigmoid(x: jax.Array) -> jax.Array:
    return jnp.log(x / (1.0 - x))


# ---------------------------------------------------------------------------
# SE(3) / SO(3) exponential maps (Modern Robotics eqns 3.51 / 3.88), used by
# the 6DoF deformation head (reference: utils/rigid_utils.py:40-86,
# utils/time_utils.py 6dof branch, gaussian_renderer/__init__.py:71-76).
# ---------------------------------------------------------------------------

def skew(w: jax.Array) -> jax.Array:
    """(..., 3) -> (..., 3, 3) cross-product matrix."""
    zeros = jnp.zeros_like(w[..., 0])
    row0 = jnp.stack([zeros, -w[..., 2], w[..., 1]], axis=-1)
    row1 = jnp.stack([w[..., 2], zeros, -w[..., 0]], axis=-1)
    row2 = jnp.stack([-w[..., 1], w[..., 0], zeros], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def exp_so3(w: jax.Array, theta: jax.Array) -> jax.Array:
    """Rodrigues: (..., 3) axis, (...,) angle -> (..., 3, 3) rotation."""
    W = skew(w)
    W2 = W @ W
    th = theta[..., None, None]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + jnp.sin(th) * W + (1.0 - jnp.cos(th)) * W2


def exp_se3(S: jax.Array, theta: jax.Array) -> jax.Array:
    """Screw-axis exponential: (..., 6) screw, (...,) angle -> (..., 4, 4)."""
    w, v = S[..., :3], S[..., 3:]
    W = skew(w)
    W2 = W @ W
    R = exp_so3(w, theta)
    th = theta[..., None, None]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=S.dtype), W.shape)
    G = th * eye + (1.0 - jnp.cos(th)) * W + (th - jnp.sin(th)) * W2
    p = (G @ v[..., None])[..., 0]
    top = jnp.concatenate([R, p[..., None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=S.dtype), top[..., :1, :].shape
    )
    return jnp.concatenate([top, bottom], axis=-2)


def to_homogeneous(v: jax.Array) -> jax.Array:
    return jnp.concatenate([v, jnp.ones_like(v[..., :1])], axis=-1)


def from_homogeneous(v: jax.Array) -> jax.Array:
    return v[..., :3] / v[..., -1:]


def apply_se3(T: jax.Array, x: jax.Array) -> jax.Array:
    """(..., 4, 4) transforms applied to (..., 3) points -> (..., 3)."""
    return from_homogeneous((T @ to_homogeneous(x)[..., None])[..., 0])
