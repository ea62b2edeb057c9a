"""Fused deform-MLP Pallas kernels (tiny-cuda-nn-style fully-fused MLP).

The canonical deformation trunk (networks.py DeformMLP, reference
utils/time_utils.py:56-127) is 8x256 with a skip concat — at N~44k points
the XLA path is HBM-bound: every layer streams a (N, 256) f32 activation
through HBM twice in the forward and the vjp saves them all as residuals
(~45 MB each). This kernel runs the whole trunk per 512-row block with
activations resident in VMEM, writing only the packed (N, 16) head output;
the backward recomputes activations in-VMEM (no residuals in HBM) and
accumulates weight gradients in f32 directly in revisited output blocks
across the sequential grid.

Key restructuring (vs a naive port of the torch module):
  * the time embedding is IDENTICAL for every point (fid is scalar), so its
    two weight-row bands fold into EFFECTIVE BIASES outside the kernel:
    b0_eff = b0 + t_emb @ W0[63:93]. Their gradients factor exactly through
    the bias cotangents (sum over rows of dpre == db), so XLA autodiff of
    the fold recovers dW0[63:93] and d_t_emb with no kernel support. The
    kernel sees only the 63-lane PE(x) band, padded to 64 lanes.
  * the skip concat cat(inp, h) never materializes: the skip layer's weight
    splits into an x-band and an h-band and the kernel sums two matmuls.
  * the three heads (dx 3 | drot 4 | dscale 3) pack into one (256, 16)
    matmul.

Matmul passes run at the MXU's native single-bf16-pass precision with f32
accumulation — identical rounding to the XLA path under the train step's
default_matmul_precision("bfloat16") (config.train_matmul_precision).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

XB = 64          # padded x-embedding lanes (63 used)
W = 256          # trunk width
OUTP = 16        # packed head lanes (10 used)
NMID = 6         # trunk layers with (256, 256) weights: L1-4, L6-7
BLK = 512        # rows per grid step (N padded to a multiple)


def _dot(a, b, dims=(((1,), (0,)), ((), ()))):
    return jax.lax.dot_general(a, b, dims,
                               preferred_element_type=jnp.float32)


def _dot_tt(a, b):
    """a^T @ b over the row (batch) dimension: (B,m),(B,n) -> (m,n)."""
    return jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _trunk_fwd(x, w0x, wmid, wskipx, wskiph, b0e, bmid, bskipe):
    """Shared fwd chain; returns (h_list, h_final). h_list[i] is the
    post-relu output of trunk layer i (length 8)."""
    hs = []
    h = jnp.maximum(_dot(x, w0x) + b0e, 0.0)
    hs.append(h)
    for i in range(4):
        h = jnp.maximum(_dot(h, wmid[i]) + bmid[i], 0.0)
        hs.append(h)
    h = jnp.maximum(_dot(x, wskipx) + _dot(h, wskiph) + bskipe, 0.0)
    hs.append(h)
    for i in range(4, NMID):
        h = jnp.maximum(_dot(h, wmid[i]) + bmid[i], 0.0)
        hs.append(h)
    return hs, h


def _fwd_kernel(x_ref, w0x_ref, wmid_ref, wskipx_ref, wskiph_ref,
                whead_ref, b0e_ref, bmid_ref, bskipe_ref, bhead_ref,
                out_ref):
    _, h = _trunk_fwd(x_ref[...], w0x_ref[...], wmid_ref, wskipx_ref[...],
                      wskiph_ref[...], b0e_ref[...], bmid_ref,
                      bskipe_ref[...])
    out_ref[...] = _dot(h, whead_ref[...]) + bhead_ref[...]


def _bwd_kernel(x_ref, w0x_ref, wmid_ref, wskipx_ref, wskiph_ref,
                whead_ref, b0e_ref, bmid_ref, bskipe_ref, g_ref,
                dx_ref, dw0x_ref, dwmid_ref, dwskipx_ref, dwskiph_ref,
                dwhead_ref, db0e_ref, dbmid_ref, dbskipe_ref, dbhead_ref):
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _():
        dw0x_ref[...] = jnp.zeros_like(dw0x_ref)
        dwmid_ref[...] = jnp.zeros_like(dwmid_ref)
        dwskipx_ref[...] = jnp.zeros_like(dwskipx_ref)
        dwskiph_ref[...] = jnp.zeros_like(dwskiph_ref)
        dwhead_ref[...] = jnp.zeros_like(dwhead_ref)
        db0e_ref[...] = jnp.zeros_like(db0e_ref)
        dbmid_ref[...] = jnp.zeros_like(dbmid_ref)
        dbskipe_ref[...] = jnp.zeros_like(dbskipe_ref)
        dbhead_ref[...] = jnp.zeros_like(dbhead_ref)

    x = x_ref[...]
    # recompute the forward in-VMEM (no HBM residuals)
    hs, h7 = _trunk_fwd(x, w0x_ref[...], wmid_ref, wskipx_ref[...],
                        wskiph_ref[...], b0e_ref[...], bmid_ref,
                        bskipe_ref[...])
    g = g_ref[...]
    dwhead_ref[...] += _dot_tt(h7, g)
    dbhead_ref[...] += jnp.sum(g, axis=0, keepdims=True)
    dh = _dot(g, whead_ref[...], (((1,), (1,)), ((), ())))

    # trunk layers 7, 6 (wmid[5], wmid[4])
    for i in (NMID - 1, NMID - 2):
        dpre = jnp.where(hs[i + 2] > 0, dh, 0.0)
        dwmid_ref[i] += _dot_tt(hs[i + 1], dpre)
        dbmid_ref[i] += jnp.sum(dpre, axis=0, keepdims=True)
        dh = _dot(dpre, wmid_ref[i], (((1,), (1,)), ((), ())))

    # skip layer (consumes cat(x-band, h4))
    dpre = jnp.where(hs[5] > 0, dh, 0.0)
    dwskipx_ref[...] += _dot_tt(x, dpre)
    dwskiph_ref[...] += _dot_tt(hs[4], dpre)
    dbskipe_ref[...] += jnp.sum(dpre, axis=0, keepdims=True)
    dx = _dot(dpre, wskipx_ref[...], (((1,), (1,)), ((), ())))
    dh = _dot(dpre, wskiph_ref[...], (((1,), (1,)), ((), ())))

    # trunk layers 4..1 (wmid[3..0])
    for i in (3, 2, 1, 0):
        dpre = jnp.where(hs[i + 1] > 0, dh, 0.0)
        dwmid_ref[i] += _dot_tt(hs[i], dpre)
        dbmid_ref[i] += jnp.sum(dpre, axis=0, keepdims=True)
        dh = _dot(dpre, wmid_ref[i], (((1,), (1,)), ((), ())))

    # input layer
    dpre = jnp.where(hs[0] > 0, dh, 0.0)
    dw0x_ref[...] += _dot_tt(x, dpre)
    db0e_ref[...] += jnp.sum(dpre, axis=0, keepdims=True)
    dx_ref[...] = dx + _dot(dpre, w0x_ref[...], (((1,), (1,)), ((), ())))


def _interpret():
    return jax.default_backend() != "tpu"


def _full(shape):
    return pl.BlockSpec(shape, lambda b: (0,) * len(shape),
                        memory_space=pltpu.VMEM)


_WSPECS = [  # w0x, wmid, wskipx, wskiph, whead, b0e, bmid, bskipe, bhead
    (XB, W), (NMID, W, W), (XB, W), (W, W), (W, OUTP),
    (1, W), (NMID, 1, W), (1, W), (1, OUTP)]


@functools.partial(jax.custom_vjp)
def fused_trunk(x64, w0x, wmid, wskipx, wskiph, whead, b0e, bmid, bskipe,
                bhead):
    """(N, 64) padded PE(x) -> packed (N, 16) head output.

    N must be a multiple of BLK. bmid is (NMID, 1, W); other biases are
    (1, W)/(1, OUTP) rows. Reference semantics: time_utils.py:80-127
    forward with the t-band folded into b0e/bskipe by the caller."""
    out, _ = _fused_fwd(x64, w0x, wmid, wskipx, wskiph, whead, b0e, bmid,
                        bskipe, bhead)
    return out


def _fused_fwd(x64, w0x, wmid, wskipx, wskiph, whead, b0e, bmid, bskipe,
               bhead):
    n = x64.shape[0]
    assert n % BLK == 0, f"fused_trunk: N={n} not a multiple of {BLK}"
    nb = n // BLK
    out = pl.pallas_call(
        _fwd_kernel,
        grid=(nb,),
        in_specs=[pl.BlockSpec((BLK, XB), lambda b: (b, 0),
                               memory_space=pltpu.VMEM)]
        + [_full(s) for s in _WSPECS],
        out_specs=pl.BlockSpec((BLK, OUTP), lambda b: (b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, OUTP), jnp.float32),
        interpret=_interpret(),
    )(x64, w0x, wmid, wskipx, wskiph, whead, b0e, bmid, bskipe, bhead)
    return out, (x64, w0x, wmid, wskipx, wskiph, whead, b0e, bmid, bskipe)


def _fused_bwd(res, g):
    x64, w0x, wmid, wskipx, wskiph, whead, b0e, bmid, bskipe = res
    n = x64.shape[0]
    nb = n // BLK
    outs = pl.pallas_call(
        _bwd_kernel,
        grid=(nb,),
        in_specs=[pl.BlockSpec((BLK, XB), lambda b: (b, 0),
                               memory_space=pltpu.VMEM)]
        + [_full(s) for s in _WSPECS[:-1]]
        + [pl.BlockSpec((BLK, OUTP), lambda b: (b, 0),
                        memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((BLK, XB), lambda b: (b, 0),
                                memory_space=pltpu.VMEM)]
        + [_full(s) for s in _WSPECS],
        out_shape=[jax.ShapeDtypeStruct((n, XB), jnp.float32)]
        + [jax.ShapeDtypeStruct(s, jnp.float32) for s in _WSPECS],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=_interpret(),
    )(x64, w0x, wmid, wskipx, wskiph, whead, b0e, bmid, bskipe, g)
    dx, dw0x, dwmid, dwskipx, dwskiph, dwhead, db0e, dbmid, dbskipe, \
        dbhead = outs
    return (dx, dw0x, dwmid, dwskipx, dwskiph, dwhead, db0e, dbmid,
            dbskipe, dbhead)


fused_trunk.defvjp(_fused_fwd, _fused_bwd)
