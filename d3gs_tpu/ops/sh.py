"""Real spherical-harmonics color evaluation, degrees 0..4.

TPU-native counterpart of the reference's SH evaluator
(utils/sh_utils.py:57-120; constants are the standard real-SH normalization
from PlenOctrees). Laid out channels-last: coefficients are (..., K, 3) with
K = (deg+1)^2 so that the per-Gaussian evaluation is a single fused
weighted-sum the compiler can keep in registers.

`eval_sh` takes the degree statically; the SH-degree ramp during training
switches among pre-jitted branches via `eval_sh_upto` with a masked basis so
the traced computation stays static-shape.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

C0 = 0.28209479177387814
C1 = 0.4886025119029199
C2 = (1.0925484305920792, -1.0925484305920792, 0.31539156525252005,
      -1.0925484305920792, 0.5462742152960396)
C3 = (-0.5900435899266435, 2.890611442640554, -0.4570457994644658,
      0.3731763325901154, -0.4570457994644658, 1.445305721320277,
      -0.5900435899266435)
C4 = (2.5033429417967046, -1.7701307697799304, 0.9461746957575601,
      -0.6690465435572892, 0.10578554691520431, -0.6690465435572892,
      0.47308734787878004, -1.7701307697799304, 0.6258357354491761)


def sh_basis(deg: int, dirs: jax.Array) -> jax.Array:
    """Evaluate the real SH basis functions.

    Args:
      deg: max degree (static), 0..4.
      dirs: (..., 3) unit directions.
    Returns:
      (..., (deg+1)^2) basis values, ordered like the reference coeff layout.
    """
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    out = [jnp.full_like(x, C0)]
    if deg >= 1:
        out += [-C1 * y, C1 * z, -C1 * x]
    if deg >= 2:
        xx, yy, zz = x * x, y * y, z * z
        xy, yz, xz = x * y, y * z, x * z
        out += [
            C2[0] * xy,
            C2[1] * yz,
            C2[2] * (2.0 * zz - xx - yy),
            C2[3] * xz,
            C2[4] * (xx - yy),
        ]
    if deg >= 3:
        out += [
            C3[0] * y * (3 * xx - yy),
            C3[1] * xy * z,
            C3[2] * y * (4 * zz - xx - yy),
            C3[3] * z * (2 * zz - 3 * xx - 3 * yy),
            C3[4] * x * (4 * zz - xx - yy),
            C3[5] * z * (xx - yy),
            C3[6] * x * (xx - 3 * yy),
        ]
    if deg >= 4:
        out += [
            C4[0] * xy * (xx - yy),
            C4[1] * yz * (3 * xx - yy),
            C4[2] * xy * (7 * zz - 1),
            C4[3] * yz * (7 * zz - 3),
            C4[4] * (zz * (35 * zz - 30) + 3),
            C4[5] * xz * (7 * zz - 3),
            C4[6] * (xx - yy) * (7 * zz - 1),
            C4[7] * xz * (xx - 3 * yy),
            C4[8] * (xx * (xx - 3 * yy) - yy * (3 * xx - yy)),
        ]
    return jnp.stack(out, axis=-1)


def eval_sh(deg: int, sh: jax.Array, dirs: jax.Array) -> jax.Array:
    """SH coefficients (..., K, C) + directions (..., 3) -> colors (..., C).

    Static `deg`; only the first (deg+1)^2 coefficients are read.
    """
    basis = sh_basis(deg, dirs)  # (..., k)
    k = basis.shape[-1]
    return jnp.einsum("...k,...kc->...c", basis, sh[..., :k, :])


def eval_sh_upto(max_deg: int, active_deg: jax.Array, sh: jax.Array,
                 dirs: jax.Array) -> jax.Array:
    """Like eval_sh but with a *traced* active degree <= static max_deg.

    Coefficients of bands above `active_deg` are masked to zero, matching the
    reference's `active_sh_degree` ramp (scene/gaussian_model.py:83-85) without
    retracing: the basis is computed at max_deg and masked.
    """
    basis = sh_basis(max_deg, dirs)
    k = basis.shape[-1]
    # band index of each coefficient: l such that l^2 <= i < (l+1)^2
    idx = jnp.arange(k)
    band = jnp.floor(jnp.sqrt(idx.astype(jnp.float32))).astype(jnp.int32)
    mask = (band <= active_deg).astype(basis.dtype)
    return jnp.einsum("...k,...kc->...c", basis * mask, sh[..., :k, :])


def rgb2sh(rgb: jax.Array) -> jax.Array:
    """DC-band inverse: color -> 0th SH coefficient (sh_utils.py:115-116)."""
    return (rgb - 0.5) / C0


def sh2rgb(sh: jax.Array) -> jax.Array:
    return sh * C0 + 0.5
