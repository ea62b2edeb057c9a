"""Deformation network architectures (flax.linen).

Re-designs of the reference's five nets (utils/time_utils.py):
  * `DeformMLP`        — the canonical deformable-3DGS field: 8×256 ReLU MLP
    with skip at D//2, PE(x, multires) + PE(t, 6|10), optional blender
    timenet (256→30), heads δx/δr/δs or the 6DoF screw-axis branch
    (time_utils.py:56-127 `DeformNetworkBaseline`; with `full_heads=False`
    it reproduces `DeformNetwork` :129-202, which zeroes rot/scale).
  * `DeformNetworkODE` — ODE dynamics f(t, x) with the 5 `use_linear`
    ablation modes and `output_scale` (:331-438).
  * `DeformNetworkSimple` / `...Start` — tanh encoder/decoder dynamics with
    summed t/y(/y0) latents (:203-330).

All layers use torch's nn.Linear default init (U(±1/√fan_in) for both kernel
and bias) so training dynamics match the reference.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...ops.transforms import exp_se3


def torch_linear_kernel_init(key, shape, dtype=jnp.float32):
    fan_in = shape[0]
    bound = 1.0 / np.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


class TorchLinear(nn.Module):
    """nn.Dense with torch nn.Linear default initialization.

    `dtype` is the COMPUTE dtype (params stay float32): bfloat16 halves the
    activation HBM traffic of the big per-Gaussian MLPs — the deform net is
    bandwidth-bound at N~44k — while Adam still sees float32 params/grads."""
    features: int
    dtype: type = jnp.float32

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        bound = 1.0 / np.sqrt(fan_in)
        return nn.Dense(
            self.features,
            dtype=self.dtype,
            kernel_init=torch_linear_kernel_init,
            bias_init=lambda k, s, d=jnp.float32: jax.random.uniform(
                k, s, d, -bound, bound),
        )(x)


def positional_encoding(x: jax.Array, num_freqs: int) -> jax.Array:
    """NeRF PE: [x, sin(2^0 x), cos(2^0 x), ..., sin(2^{m-1} x), cos(...)]
    (reference Embedder, time_utils.py:7-54; log-sampled, include_input)."""
    if num_freqs <= 0:
        return x
    freqs = 2.0 ** jnp.arange(num_freqs, dtype=x.dtype)
    xf = x[..., None, :] * freqs[:, None]          # (..., m, d)
    enc = jnp.concatenate([jnp.sin(xf), jnp.cos(xf)], axis=-1)  # (..., m, 2d)
    return jnp.concatenate([x, enc.reshape(*x.shape[:-1], -1)], axis=-1)


def pe_dim(d: int, num_freqs: int) -> int:
    return d * (1 + 2 * num_freqs) if num_freqs > 0 else d


class DeformMLP(nn.Module):
    """Canonical deformation field. Returns (d_xyz | SE3(N,4,4), d_rot,
    d_scale); with full_heads=False, d_rot = d_scale = 0 scalars."""
    D: int = 8
    W: int = 256
    multires: int = 10
    is_blender: bool = False
    is_6dof: bool = False
    full_heads: bool = True
    dtype: type = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, t: jax.Array):
        lin = lambda f: TorchLinear(f, dtype=self.dtype)  # noqa: E731
        f32 = lambda a: a.astype(jnp.float32)             # noqa: E731
        t_multires = 6 if self.is_blender else 10
        t = jnp.broadcast_to(jnp.atleast_1d(t).reshape(-1, 1)
                             if t.ndim <= 1 else t, (x.shape[0], 1))
        t_emb = positional_encoding(t, t_multires)
        if self.is_blender:
            # timenet: PE(t) -> 256 -> ReLU -> 30 (time_utils.py:74-79)
            t_emb = lin(256)(t_emb)
            t_emb = nn.relu(t_emb)
            t_emb = lin(30)(t_emb)
        x_emb = positional_encoding(x, self.multires)
        inp = jnp.concatenate(
            [x_emb.astype(self.dtype), t_emb.astype(self.dtype)], axis=-1)

        skips = (self.D // 2,)
        h = inp
        for i in range(self.D):
            h = lin(self.W)(h)
            h = nn.relu(h)
            if i in skips:
                h = jnp.concatenate([inp, h], axis=-1)

        if self.is_6dof:
            w = f32(lin(3)(h))
            v = f32(lin(3)(h))
            theta = jnp.linalg.norm(w, axis=-1, keepdims=True)
            w = w / (theta + 1e-5)
            v = v / (theta + 1e-5)
            screw = jnp.concatenate([w, v], axis=-1)
            d_xyz = exp_se3(screw, theta[..., 0])     # (N, 4, 4)
        else:
            d_xyz = f32(lin(3)(h))

        if self.full_heads:
            d_rot = f32(lin(4)(h))
            d_scale = f32(lin(3)(h))
        else:
            d_rot, d_scale = 0.0, 0.0
        return d_xyz, d_rot, d_scale


class DeformNetworkODE(nn.Module):
    """ODE dynamics dx/dt = f(t, x) (time_utils.py:331-438). `use_linear`
    picks an ablation: 0 full MLP, 1 joint linear, 2 time-conditioned affine,
    3 xyz-only linear, 4 z-only linear."""
    D: int = 8
    W: int = 256
    multires: int = 10
    is_blender: bool = False
    use_linear: int = 0
    use_emb: bool = True
    output_scale: float = 1.0
    skips: Sequence[int] = (4,)

    @nn.compact
    def __call__(self, t: jax.Array, x: jax.Array):
        t_multires = 6 if self.is_blender else 10
        t = jnp.broadcast_to(jnp.reshape(t, (-1, 1)), (x.shape[0], 1))
        if self.use_emb:
            t_emb = positional_encoding(t, t_multires)
            x_emb = positional_encoding(x, self.multires)
        else:
            t_emb, x_emb = t, x

        if self.use_linear == 1:
            h = jnp.concatenate([x_emb, t_emb], axis=-1)
            return TorchLinear(3)(h) * self.output_scale
        if self.use_linear == 2:
            d = x_emb.shape[-1]
            A = TorchLinear(d * d)(t_emb).reshape(-1, d, d)
            b = TorchLinear(d)(t_emb)
            out = jnp.einsum("nij,nj->ni", A, x_emb) + b
            return out * self.output_scale
        if self.use_linear == 3:
            return TorchLinear(3)(x_emb) * self.output_scale
        if self.use_linear == 4:
            z = x_emb[:, 2:3]
            zt = TorchLinear(1)(z)
            return jnp.concatenate(
                [jnp.zeros_like(x_emb[:, :2]), zt], axis=-1) * self.output_scale

        if self.is_blender:
            t_emb = TorchLinear(256)(t_emb)
            t_emb = nn.relu(t_emb)
            t_emb = TorchLinear(30)(t_emb)
        inp = jnp.concatenate([x_emb, t_emb], axis=-1)
        h = inp
        for i in range(self.D):
            h = TorchLinear(self.W)(h)
            h = nn.relu(h)
            if i in tuple(self.skips):
                h = jnp.concatenate([inp, h], axis=-1)
        return TorchLinear(3)(h) * self.output_scale


class _TanhStack(nn.Module):
    widths: Sequence[int]

    @nn.compact
    def __call__(self, x):
        for w in self.widths:
            x = nn.Dense(w,
                         kernel_init=nn.initializers.normal(stddev=0.2),
                         bias_init=nn.initializers.zeros)(x)
            x = jnp.tanh(x)
        return x


class DeformNetworkSimple(nn.Module):
    """Enc-dec tanh dynamics: latent = net_t(t) + net_y(y)
    (time_utils.py:203-260; N(0, 0.2) init, zero bias)."""

    @nn.compact
    def __call__(self, t: jax.Array, y: jax.Array):
        t = jnp.broadcast_to(jnp.reshape(t, (-1, 1)), (y.shape[0], 1))
        y_enc = _TanhStack((256, 512, 512))(y)
        t_enc = _TanhStack((256, 512, 512))(t)
        latent = t_enc + y_enc
        h = _TanhStack((512, 256))(latent)
        return nn.Dense(3,
                        kernel_init=nn.initializers.normal(stddev=0.2),
                        bias_init=nn.initializers.zeros)(h)


class DeformNetworkSimpleStart(nn.Module):
    """Same, conditioned on the trajectory's start state y0
    (time_utils.py:261-330)."""

    @nn.compact
    def __call__(self, t: jax.Array, y: jax.Array, y_start: jax.Array):
        t = jnp.broadcast_to(jnp.reshape(t, (-1, 1)), (y.shape[0], 1))
        y_enc = _TanhStack((256, 256, 256))(y)
        y0_enc = _TanhStack((256, 256))(y_start)
        t_enc = _TanhStack((256, 256, 256))(t)
        latent = t_enc + y_enc + y0_enc
        h = _TanhStack((256, 256))(latent)
        return nn.Dense(3,
                        kernel_init=nn.initializers.normal(stddev=0.2),
                        bias_init=nn.initializers.zeros)(h)

