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


# --------------------------------------------------------------------------
# Fused-kernel apply paths (ops/fused_mlp.py)
# --------------------------------------------------------------------------

def _timenet_emb(kb, t, is_blender, t_multires):
    """(1,1) scalar time -> (1, tw) embedding row; returns (t_emb, idx)
    where idx is the first trunk layer's TorchLinear index."""
    t0 = jnp.reshape(t, (-1,))[0:1][None]                  # (1, 1)
    t_emb = positional_encoding(t0, t_multires)            # (1, 13|21)
    if is_blender:
        k0, b0 = kb(0)
        k1, b1 = kb(1)
        return jnp.maximum(t_emb @ k0 + b0, 0.0) @ k1 + b1, 2    # (1, 30)
    return t_emb, 0


def _fused_trunk_apply(kb, idx, x, multires, t_emb, head_ids):
    """Shared 8x256+skip trunk through the fused Pallas kernel.

    kb(i) -> (kernel, bias) of TorchLinear_i; trunk layers are
    idx..idx+7 with the skip layer at idx+5; head_ids index the output
    heads whose columns concatenate into the packed (<=16)-lane result.
    Returns the packed (n, 16) output."""
    from ...ops import fused_mlp as FM

    x_emb = positional_encoding(x, multires)               # (n, 63)
    xw = x_emb.shape[1]
    tw = t_emb.shape[1]

    kin, bin_ = kb(idx)                                    # (xw+tw, 256)
    kskip, bskip = kb(idx + 5)                             # (xw+tw+W, 256)
    b0e = bin_[None] + t_emb @ kin[xw:]                    # (1, 256)
    bskipe = bskip[None] + t_emb @ kskip[xw:xw + tw]
    w0x = jnp.pad(kin[:xw], ((0, FM.XB - xw), (0, 0)))
    wskipx = jnp.pad(kskip[:xw], ((0, FM.XB - xw), (0, 0)))
    wskiph = kskip[xw + tw:]
    mids = [kb(idx + 1 + j) for j in range(4)] + \
        [kb(idx + 6), kb(idx + 7)]
    wmid = jnp.stack([k for k, _ in mids])                 # (6, 256, 256)
    bmid = jnp.stack([b[None] for _, b in mids])           # (6, 1, 256)

    hs = [kb(i) for i in head_ids]
    whead = jnp.concatenate([k for k, _ in hs], axis=1)
    bhead = jnp.concatenate([b for _, b in hs])[None]
    ow = whead.shape[1]
    whead = jnp.pad(whead, ((0, 0), (0, FM.OUTP - ow)))
    bhead = jnp.pad(bhead, ((0, 0), (0, FM.OUTP - ow)))

    n = x.shape[0]
    npad = ((n + FM.BLK - 1) // FM.BLK) * FM.BLK
    x64 = jnp.pad(x_emb, ((0, npad - n), (0, FM.XB - xw)))
    return FM.fused_trunk(x64, w0x, wmid, wskipx, wskiph, whead, b0e,
                          bmid, bskipe, bhead)[:n]


def deform_mlp_fused_apply(net: DeformMLP, params, x: jax.Array,
                           t: jax.Array):
    """DeformMLP.apply rebuilt over the fused Pallas trunk.

    Exactly the reference forward (time_utils.py:80-127) for the scalar-fid
    case every trainer/render path uses: t must be a broadcast column (all
    rows equal — only row 0 is read). The time embedding's weight bands
    fold into effective biases (see ops/fused_mlp.py); their parameter and
    timenet gradients are recovered by XLA autodiff of the fold. Not
    applicable to is_6dof (screw-axis head shapes differ).
    """
    assert not net.is_6dof, "fused apply does not cover is_6dof"
    p = params["params"]

    def kb(i):
        d = p[f"TorchLinear_{i}"]["Dense_0"]
        return d["kernel"], d["bias"]

    t_emb, idx = _timenet_emb(kb, t, net.is_blender,
                              6 if net.is_blender else 10)
    head_ids = ([idx + 8, idx + 9, idx + 10] if net.full_heads
                else [idx + 8])
    out = _fused_trunk_apply(kb, idx, x, net.multires, t_emb, head_ids)
    d_xyz = out[:, 0:3]
    if net.full_heads:
        return d_xyz, out[:, 3:7], out[:, 7:10]
    return d_xyz, 0.0, 0.0


def deform_ode_fused_apply(net: DeformNetworkODE, params, t: jax.Array,
                           x: jax.Array):
    """DeformNetworkODE.apply (use_linear=0, use_emb) over the fused
    Pallas trunk — the ODE dynamics f(t, x) evaluated 10s of times per
    train step by the RK4/adaptive integrators (time_utils.py:398-438),
    where the kernel's no-HBM-residual trunk pays off multiplicatively."""
    assert net.use_linear == 0 and net.use_emb
    assert tuple(net.skips) == (4,)
    p = params["params"]

    def kb(i):
        d = p[f"TorchLinear_{i}"]["Dense_0"]
        return d["kernel"], d["bias"]

    t_emb, idx = _timenet_emb(kb, t, net.is_blender,
                              6 if net.is_blender else 10)
    out = _fused_trunk_apply(kb, idx, x, net.multires, t_emb, [idx + 8])
    return out[:, 0:3] * net.output_scale
