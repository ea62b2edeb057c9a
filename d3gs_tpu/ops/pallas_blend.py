"""Pallas TPU blend kernel: the rasterizer's hot loop as a custom kernel.

TPU-native re-design of the reference CUDA `renderCUDA` fwd/bwd
(submodules/depth-diff-gaussian-rasterization, SURVEY.md §2.3). The XLA
packed path (rasterize.py::blend_records) is HBM/gather-bound: it processes a
fixed K-capacity slab per tile, round-trips every (K, 256) intermediate
through HBM, and pays two M-scale gathers. This kernel instead:

  * reads the (tile, depth)-sorted duplicate records as CONTIGUOUS
    KB-record blocks straight from HBM with double-buffered DMA — zero
    gathers in the hot loop;
  * keeps all per-tile intermediates in VMEM (one (256, KB) working set);
  * early-terminates per tile once every pixel's transmittance is below
    1e-4 — the CUDA kernel's per-pixel break, at block granularity. This
    is exact: a contribution is included iff its inclusive transmittance
    is >= 1e-4, identical to the dense path's `include` mask;
  * computes the same analytic backward as rasterize.py::_blend_bwd
    (suffix-sum form + monomial-moment MXU contraction), writing
    per-duplicate gradient blocks that XLA reduces back to per-Gaussian
    gradients.

Layout: pixels (P=256) on sublanes, records (KB=128) on lanes. Record
blocks are stored transposed as (Mb, 16, KB) so per-field row vectors
(1, KB) broadcast against the (P, 1) pixel grid without in-kernel
transposes. The cumulative-transmittance prefix scans run on the MXU as
(P, KB)@(KB, KB) triangular matmuls at HIGHEST precision (the kernels are
VPU-bound; the MXU is otherwise idle), with per-record transmittance
recovered by one exp of the log-space prefix.

Backward write routing: EVERY block of a nonempty tile goes through the
double-buffered write DMA to the (Mb, 16, KB) main output; a shared
boundary block is read-modify-written sequentially (TPU grid steps are
serial on the core), replacing the CUDA backward's atomicAdd overlap
handling. (A tile-paired 2-tiles-per-grid-step variant and a fused
k-camera multi-tile variant were built and A/B'd across rounds 1-5;
both measured slower than this single-stream kernel in every supported
configuration — 14.5 vs 13.8 ms/step paired, 31.8 vs 14.2 ms/cam fused
k=10 — and were removed.)
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .binning import RecordBins
from .projection import TILE

P = TILE * TILE          # pixels per tile
KB = 128                 # records per block (lane width)
_LOG_KB = 7
_T_EPS = 1e-4
_ALPHA_MIN = 1.0 / 255.0
_ALPHA_MAX = 0.99
_REC = 16                # packed record width (rasterize.RECORD_WIDTH)


_LOG_AMIN = float(np.log(_ALPHA_MIN))


def _pixel_grid():
    pidx = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)
    lx = (pidx & (TILE - 1)).astype(jnp.float32)      # (P, 1)
    ly = (pidx >> 4).astype(jnp.float32)
    return lx, ly


def _mono8():
    """(P, 8) pixel monomials [1, lx, ly, lx², lx·ly, ly², 0, 0].

    Columns 0-5 double as the backward's moment basis; all 8 feed the
    forward's polynomial-coefficient matmul (k-dim padded to 8)."""
    lx, ly = _pixel_grid()
    one = jnp.ones_like(lx)
    zr = jnp.zeros_like(lx)
    return jnp.concatenate(
        [one, lx, ly, lx * lx, lx * ly, ly * ly, zr, zr], axis=1)


def _block_alpha(blk, oxv, oyv, live):
    """Alpha for one record block against the tile pixel grid.

    Direct per-pixel quadratic (dx/dy products on the VPU). An MXU
    formulation — power+log(opa) as (P, 8) pixel monomials @ (8, KB)
    per-record polynomial coefficients — was tried and measured SLOWER
    (+0.12 µs/block): at these shapes the extra serialized small-matmul
    latency exceeds the ~9 VPU passes it removes, and the kernels' MXU
    slots are better spent on the transmittance scans.

    Returns alpha (P, KB) and the `clamped` zero-gradient mask."""
    lx, ly = _pixel_grid()
    ca, cb, cc = blk[2:3], blk[3:4], blk[4:5]
    opa = blk[8:9]
    dx = blk[0:1] - (oxv + lx)                         # (P, KB)
    dy = blk[1:2] - (oyv + ly)
    power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
    raw = opa * jnp.exp(power)
    bad = (power > 0.0) | (raw < _ALPHA_MIN) | jnp.logical_not(live)
    alpha = jnp.where(bad, 0.0, jnp.minimum(_ALPHA_MAX, raw))
    clamped = bad | (raw > _ALPHA_MAX)
    return alpha, clamped


def _tri_inc(n):
    """(n, n) inclusive-prefix matrix: tri[j, k] = 1 iff j <= k. Built
    from two iotas (~3 cheap passes over n² elements, once per TILE —
    negligible next to the per-block (P, KB) work)."""
    row = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    ok = row <= col
    # bf16: 0/1 entries are exact; consumed by the 3-chunk split matmuls
    return ok.astype(jnp.bfloat16)


def _split3(x):
    """x == x1 + x2 + x3 with each chunk exactly bf16-representable.

    Classic extended-precision splitting: each residual subtraction is
    exact in f32, so three 8-bit-mantissa chunks capture the full 24-bit
    f32 mantissa (residual <= 1 ulp)."""
    x1 = x.astype(jnp.bfloat16)
    r1 = x - x1.astype(jnp.float32)
    x2 = r1.astype(jnp.bfloat16)
    x3 = (r1 - x2.astype(jnp.float32)).astype(jnp.bfloat16)
    return x1, x2, x3


def _ident(n):
    """(n, n) identity in bf16 (exact 0/1 entries) for MXU transposes."""
    row = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    return (row == col).astype(jnp.bfloat16)


def _cols_to_rows(x, ident):
    """Exact f32 (P, k<=8) -> (8, P) MXU transpose: a Mosaic sublane <->
    lane relayout of a 256-vector costs ~0.3 us each; one transpose
    against the exact-bf16 identity with the 3-chunk input split is far
    cheaper and bit-exact (products are chunk*1). k is padded to 8 — the
    MXU work is trivial either way (Mosaic rejects width-1 operands)."""
    x = jnp.pad(x, ((0, 0), (0, 8 - x.shape[1])))
    x1, x2, x3 = _split3(x)

    def d(a):
        return jax.lax.dot_general(
            a, ident, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    return d(x1) + (d(x2) + d(x3))


def _rows_to_cols(x, ident):
    """Exact f32 (k<=8, P) -> (P, 8), same scheme."""
    x = jnp.pad(x, ((0, 8 - x.shape[0]), (0, 0)))
    x1, x2, x3 = _split3(x)

    def d(a):
        return jax.lax.dot_general(
            ident, a, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
    return d(x1) + (d(x2) + d(x3))


def _mxu_cumsum(x, tri):
    """Inclusive prefix sum along lanes via MXU matmuls at full f32
    accuracy in THREE bf16 passes.

    The sums feed exp() (transmittance) and gradient suffix differences,
    so single-bf16-pass rounding would leak into training; but `tri` is a
    0/1 matrix (exactly bf16), so splitting x into three exact bf16
    chunks (_split3) and summing three bf16 MXU passes reproduces
    full-f32 products with f32 accumulation — the same accuracy class as
    a 6-pass HIGHEST matmul at half the MXU work (Mosaic rejects
    Precision.HIGH in-kernel, hence the manual split)."""
    x1, x2, x3 = _split3(x)

    def d(a):
        return jax.lax.dot_general(
            a, tri, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    return d(x1) + (d(x2) + d(x3))


def _fwd_kernel(starts_ref, ox_ref, oy_ref, slab_ref, out_ref, buf, sem):
    t = pl.program_id(0)
    s0 = starts_ref[t]
    s1 = starts_ref[t + 1]
    cnt = s1 - s0
    b0 = s0 >> _LOG_KB
    nb = jnp.where(cnt > 0, ((s1 - 1) >> _LOG_KB) - b0 + 1, 0)

    ox = ox_ref[t].astype(jnp.float32)
    oy = oy_ref[t].astype(jnp.float32)
    kcol = jax.lax.broadcasted_iota(jnp.int32, (1, KB), 1)
    tri = _tri_inc(KB)
    log_eps = jnp.float32(np.log(_T_EPS))

    def dma(slot, b):
        return pltpu.make_async_copy(slab_ref.at[b0 + b], buf.at[slot],
                                     sem.at[slot])

    @pl.when(nb > 0)
    def _():
        dma(0, 0).start()

    # transmittance is carried in LOG space (ltv): the plain product
    # underflows f32 after ~19 near-opaque records, and the backward
    # reconstructs weights anchored on this exact log value. Per-record
    # T comes from ONE exp of the MXU prefix sum of log1p(-alpha).
    def body(c):
        b, ltv, img, dep, tfin = c
        slot = jax.lax.rem(b, 2)

        @pl.when(b + 1 < nb)
        def _():
            dma(1 - slot, b + 1).start()

        dma(slot, b).wait()
        blk = buf[slot]                                # (16, KB)
        kg = (b0 + b) * KB + kcol
        live = (kg >= s0) & (kg < s1)                  # (1, KB)
        alpha, _ = _block_alpha(blk, ox, oy, live)
        om = 1.0 - alpha
        lo = jnp.log1p(-alpha)
        acc = _mxu_cumsum(lo, tri)                     # inclusive Σ log(1-α)
        ti = jnp.exp(ltv + acc)                        # T after record k
        tb = ti / om                                   # T before (om=1 ⇒ ti)
        inc = ti >= _T_EPS
        w = jnp.where(inc, tb * alpha, 0.0)            # (P, KB)
        rgb = blk[5:8]                                 # (3, KB)
        dpt = blk[9:10]
        # CHANNEL-MAJOR accumulation (C, P): the (T, 8, P) output keeps
        # P=256 on lanes (2 full lane tiles); a (T, P, 8) output leaves
        # 8 of 128 lanes live and every DMA + every XLA pass over it pays
        # ~16x physical amplification. Swapping the dot operand order
        # produces the row layout for free.
        img = img + jax.lax.dot_general(
            rgb, w, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)        # (3, P)
        dep = dep + jax.lax.dot_general(
            dpt, w, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)        # (1, P)
        tfin = jnp.minimum(tfin, jnp.min(jnp.where(inc, ti, 1.0), axis=1,
                                         keepdims=True))
        ltv = ltv + acc[:, KB - 1:KB]
        return (b + 1, ltv, img, dep, tfin)

    def cond(c):
        return (c[0] < nb) & (jnp.max(c[1]) >= log_eps)

    init = (jnp.int32(0), jnp.zeros((P, 1), jnp.float32),
            jnp.zeros((3, P), jnp.float32), jnp.zeros((1, P), jnp.float32),
            jnp.ones((P, 1), jnp.float32))
    b_f, ltv, img, dep, tfin = jax.lax.while_loop(cond, body, init)

    # drain the prefetched-but-unconsumed DMA if we early-terminated
    @pl.when(b_f < nb)
    def _():
        dma(jax.lax.rem(b_f, 2), b_f).wait()

    out_ref[0, 0:3, :] = img
    out_ref[0, 3:4, :] = dep
    # per-pixel aux columns (final transmittance + the backward anchors:
    # EXACT log T after the last processed block, underflow-free) become
    # rows with ONE batched MXU transpose per tile (not per block)
    aux = _cols_to_rows(jnp.concatenate([tfin, ltv], axis=1), _ident(P))
    out_ref[0, 4:6, :] = aux[0:2]
    out_ref[0, 6:7, :] = jnp.full((1, P), 1.0, jnp.float32) * \
        b_f.astype(jnp.float32)
    out_ref[0, 7:8, :] = jnp.zeros((1, P), jnp.float32)


def _bwd_kernel(starts_ref, ox_ref, oy_ref, slab_ref, g_ref, out_ref,
                gmain_ref, rbuf, wbuf, pbuf, rsem, wsem, psem, *,
                depth_grad=True):
    """Single REVERSE sweep per tile (the CUDA backward's back-to-front
    replay, renderCUDA backward): walk blocks last→first carrying
    log-transmittance L = log T(after block) and the suffix sum
    S = Σ_{m>k} G_w_m w_m. Per-record transmittance is recovered as
    t_before_k = exp(L − Σ_{j≥k} log(1−α_j)) — log space, so deep
    saturated tiles underflow to exactly-zero weights instead of inf/NaN
    from repeated division.

    Single-stream gradient output: EVERY block of a nonempty tile goes
    through the double-buffered write DMA. Adjacent tiles share at most
    one slab block (segments are contiguous); TPU grid steps run
    sequentially on the core, so when this tile's first block is shared
    (starts[t] not block-aligned) the previous tile has already drained
    its write of that block — we DMA it back in and ADD our lane-disjoint
    contribution (both tiles zero non-owned lanes). This replaces the CUDA
    backward's atomicAdd overlap handling (SURVEY §2.3) with a sequential
    read-modify-write, and removes the per-tile edge output + the XLA-side
    edge scatter/merge entirely."""
    t = pl.program_id(0)
    s0 = starts_ref[t]
    s1 = starts_ref[t + 1]
    cnt = s1 - s0
    b0 = s0 >> _LOG_KB
    nb = jnp.where(cnt > 0, ((s1 - 1) >> _LOG_KB) - b0 + 1, 0)

    ox = ox_ref[t].astype(jnp.float32)
    oy = oy_ref[t].astype(jnp.float32)
    kcol = jax.lax.broadcasted_iota(jnp.int32, (1, KB), 1)
    mono8 = _mono8()
    mono_b = mono8[:, :6].astype(jnp.bfloat16)   # integer entries: exact

    # upstream cotangent channels + the fwd pass's anchors, read straight
    # from the two CHANNEL-MAJOR (T, 8, P) buffers (P on lanes — see the
    # forward kernel's layout note). The alpha cotangent g_tf is live even
    # for an image-only loss (the caller's `img + T_final·bg` composition
    # routes bg gradients through it); the depth cotangent is statically
    # zero for the photometric trainers and its math is skipped when
    # depth_grad=False. Per-pixel aux rows transpose to columns ONCE per
    # tile here.
    g_img = g_ref[0, 0:3, :]                           # (3, P)
    g_tf = g_ref[0, 4:5, :]                            # (1, P)
    rows = [g_tf * out_ref[0, 4:5, :],                 # g_tf·T_final
            out_ref[0, 5:6, :]]                        # log T(end)
    if depth_grad:
        rows.append(g_ref[0, 3:4, :])
    cols = _rows_to_cols(jnp.concatenate(rows, axis=0), _ident(P))
    gtt_col = cols[:, 0:1]                             # (P, 1)
    log_tend = cols[:, 1:2]
    g_dep = cols[:, 2:3] if depth_grad else None
    b_eff = out_ref[0, 6, 0].astype(jnp.int32)         # blocks fwd processed

    def dma_r(slot, b):
        return pltpu.make_async_copy(slab_ref.at[b0 + b], rbuf.at[slot],
                                     rsem.at[slot])

    def dma_w(slot, b):
        return pltpu.make_async_copy(wbuf.at[slot], gmain_ref.at[b0 + b],
                                     wsem.at[slot])

    # shared first block: the previous nonempty tile already wrote its
    # lane-disjoint partial of block b0 — fetch it now, consumed at b == 0
    shared = (cnt > 0) & ((s0 & (KB - 1)) != 0)
    dma_p = pltpu.make_async_copy(gmain_ref.at[b0], pbuf, psem)

    @pl.when(shared)
    def _():
        dma_p.start()

    @pl.when(b_eff > 0)
    def _():
        dma_r(jax.lax.rem(b_eff - 1, 2), b_eff - 1).start()

    gtt = gtt_col                                      # g_tf·T_final column

    tri = _tri_inc(KB)

    def grad_block(b, lcarry, sfx, blk):
        kg = (b0 + b) * KB + kcol
        live = (kg >= s0) & (kg < s1)
        alpha, clamped = _block_alpha(blk, ox, oy, live)
        om = 1.0 - alpha
        lo = jnp.log1p(-alpha)                         # (P, KB), <= 0
        acc = _mxu_cumsum(lo, tri)                     # inclusive prefix
        s_lo = acc[:, KB - 1:KB]                       # (P, 1) block total
        exc = acc - lo
        # log T before record k = log T(block end) - sum_{j>=k} lo_j
        tb = jnp.exp(lcarry - s_lo + exc)
        ti = tb * om
        inc = ti >= _T_EPS
        w = jnp.where(inc, tb * alpha, 0.0)
        rgb, dpt = blk[5:8], blk[9:10]
        gw = jax.lax.dot_general(g_img, rgb, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)  # (P,KB)
        if depth_grad:
            gw = gw + g_dep * dpt                      # (P, KB)
        gww = gw * w
        pin = _mxu_cumsum(gww, tri)                    # inclusive prefix
        s_g = pin[:, KB - 1:KB]
        suffix = sfx + (s_g - pin)                     # Σ over m > k
        inv_om = 1.0 / om
        incf = inc.astype(jnp.float32)
        g_alpha = gw * tb * incf - (suffix + gtt * incf) * inv_om
        g_power = jnp.where(clamped, 0.0, g_alpha * alpha)
        # full-f32-accurate moments in 3 bf16 passes: the moment-difference
        # reconstruction below (Sdx = ux*M1 - Mx, ...) cancels heavily for
        # in-tile gaussians, so single-pass-bf16 rounding of the moments
        # turns into large relative error on the mean/conic gradients —
        # enough to diverge training. `mono` entries are integers <= 225
        # (exactly bf16); g_power rides the 3-chunk split.
        gp1, gp2, gp3 = _split3(g_power)
        md = lambda a: jax.lax.dot_general(   # noqa: E731
            mono_b, a, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        m6 = md(gp1) + (md(gp2) + md(gp3))
        m1, mx, my = m6[0:1], m6[1:2], m6[2:3]
        mxx, mxy, myy = m6[3:4], m6[4:5], m6[5:6]
        ux = blk[0:1] - ox
        uy = blk[1:2] - oy
        ca, cb, cc = blk[2:3], blk[3:4], blk[4:5]
        sdx = ux * m1 - mx
        sdy = uy * m1 - my
        sdxx = ux * ux * m1 - 2.0 * ux * mx + mxx
        sdyy = uy * uy * m1 - 2.0 * uy * my + myy
        sdxy = ux * uy * m1 - ux * my - uy * mx + mxy
        g_ca = -0.5 * sdxx
        g_cb = -sdxy
        g_cc = -0.5 * sdyy
        g_mux = -(ca * sdx + cb * sdy)
        g_muy = -(cc * sdy + cb * sdx)
        opa = blk[8:9]
        g_opa = jnp.where(jnp.abs(opa) > 1e-12, m1 / opa, 0.0)
        g_rgb = jax.lax.dot_general(g_img, w, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
        if depth_grad:
            g_dpt = jax.lax.dot_general(g_dep, w, (((0,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32)
        else:
            g_dpt = jnp.zeros((1, KB), jnp.float32)
        g_blk = jnp.concatenate(
            [g_mux, g_muy, g_ca, g_cb, g_cc, g_rgb, g_opa, g_dpt,
             jnp.zeros((_REC - 10, KB), jnp.float32)], axis=0)
        return g_blk, lcarry - s_lo, sfx + s_g

    # reverse sweep: b = nb-1 .. 0; blocks >= b_eff (never processed by the
    # saturating fwd) get zero gradients and no slab read
    def bodyB(i, c):
        lcarry, sfx = c
        b = nb - 1 - i
        slot = jax.lax.rem(b, 2)

        @pl.when((b < b_eff) & (b >= 1))
        def _():
            # prefetch the next (lower) block while computing this one
            # (block b_eff-1 itself was warmed before the loop)
            dma_r(1 - slot, b - 1).start()

        def compute(lcarry, sfx):
            dma_r(slot, b).wait()
            return grad_block(b, lcarry, sfx, rbuf[slot])

        def zero(lcarry, sfx):
            return jnp.zeros((_REC, KB), jnp.float32), lcarry, sfx

        g_blk, lcarry, sfx = jax.lax.cond(b < b_eff, compute, zero,
                                          lcarry, sfx)

        def add_prior(gb):
            dma_p.wait()
            return gb + pbuf[...]

        g_blk = jax.lax.cond((b == 0) & shared, add_prior, lambda gb: gb,
                             g_blk)

        # write i targets block b0 + nb-1-i; wait for write i-2 before
        # reusing its slot
        wslot = jax.lax.rem(i, 2)

        @pl.when(i >= 2)
        def _():
            dma_w(wslot, nb + 1 - i).wait()

        wbuf[wslot] = g_blk
        dma_w(wslot, b).start()

        return (lcarry, sfx)

    jax.lax.fori_loop(
        0, nb, bodyB, (log_tend, jnp.zeros((P, 1), jnp.float32)))

    # drain the last two outstanding writes (blocks 1 and 0)
    @pl.when(nb >= 2)
    def _():
        dma_w(jax.lax.rem(nb - 2, 2), 1).wait()

    @pl.when(nb >= 1)
    def _():
        dma_w(jax.lax.rem(nb - 1, 2), 0).wait()


def _fwd_pallas(slab_blocks, starts, ox, oy, *, num_tiles, interpret):
    return pl.pallas_call(
        _fwd_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(num_tiles,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((1, 8, P), lambda t, *_: (t, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((2, _REC, KB), jnp.float32),
                            pltpu.SemaphoreType.DMA((2,))]),
        out_shape=jax.ShapeDtypeStruct((num_tiles, 8, P), jnp.float32),
        interpret=interpret,
    )(starts, ox, oy, slab_blocks)


def _bwd_pallas(slab_blocks, starts, ox, oy, g, out, *, num_tiles,
                interpret, depth_grad=True):
    mb = slab_blocks.shape[0]
    return pl.pallas_call(
        functools.partial(_bwd_kernel, depth_grad=depth_grad),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(num_tiles,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                      pl.BlockSpec((1, 8, P), lambda t, *_: (t, 0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((1, 8, P), lambda t, *_: (t, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            scratch_shapes=[pltpu.VMEM((2, _REC, KB), jnp.float32),
                            pltpu.VMEM((2, _REC, KB), jnp.float32),
                            pltpu.VMEM((_REC, KB), jnp.float32),
                            pltpu.SemaphoreType.DMA((2,)),
                            pltpu.SemaphoreType.DMA((2,)),
                            pltpu.SemaphoreType.DMA]),
        out_shape=[jax.ShapeDtypeStruct((mb, _REC, KB), jnp.float32)],
        interpret=interpret,
    )(starts, ox, oy, slab_blocks, g, out)


def _make_blocks(rec_pad, rank_pad):
    """(N+1,16) records + (Mpad,) depth-ranks -> (Mb,16,KB) sorted blocks.

    16 sublane rows keep every DMA (8, 128)-tile aligned (a 10-row block
    measured ~20x slower end-to-end and faulted the TPU worker); rows
    10-15 ride along as zeros."""
    slab = rec_pad[rank_pad]                           # (Mpad, 16)
    mb = slab.shape[0] // KB
    return slab.reshape(mb, KB, _REC).transpose(0, 2, 1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def _core(rec_pad, rank_pad, rank_bounds, starts, ox, oy, num_tiles,
          interpret, depth_grad):
    out, _ = _core_fwd(rec_pad, rank_pad, rank_bounds, starts, ox, oy,
                       num_tiles, interpret, depth_grad)
    return out


def _core_fwd(rec_pad, rank_pad, rank_bounds, starts, ox, oy, num_tiles,
              interpret, depth_grad):
    slab_blocks = _make_blocks(rec_pad, rank_pad)
    out = _fwd_pallas(slab_blocks, starts, ox, oy, num_tiles=num_tiles,
                      interpret=interpret)
    return out, (slab_blocks, rank_pad, rank_bounds, starts, ox, oy, out,
                 rec_pad.shape[0])


def _core_bwd(num_tiles, interpret, depth_grad, res, g):
    slab_blocks, rank_pad, rank_bounds, starts, ox, oy, out, n1 = res
    mb = slab_blocks.shape[0]
    # single-stream kernel: every block of every nonempty tile is written,
    # shared boundary blocks already accumulated in-kernel
    [g_all] = _bwd_pallas(slab_blocks, starts, ox, oy, g, out,
                          num_tiles=num_tiles, interpret=interpret,
                          depth_grad=depth_grad)

    # reduce duplicates -> per-record grads WITHOUT a scatter (XLA TPU
    # scatter-add is index-bound, ~18 ns/row — 6.8 ms at M=385k): carry the
    # LIVE gradient channels through ONE stable (rank, channels...) sort so
    # rows group into contiguous per-rank segments, then a log-depth
    # per-channel cumsum + segment-boundary difference. Sorting the
    # channels as payloads (~0.18 ms/operand) beats the older
    # sort-(rank,iota)-then-row-gather chain: XLA lays the (M, 16) gather
    # out column-major in context (~1.8 ms for what is 0.7 ms row-major),
    # while the sort works on fully-packed 1-D arrays. Channel extraction
    # from the (mb, 16, KB) block slab is block-strided (contiguous KB
    # rows), and only the 9-10 LIVE channels ride the sort. rank_pad's
    # sentinel n1-1 rows (padding/culled entries, zero grads) sort last.
    mpad = mb * KB
    live = list(range(10 if depth_grad else 9))
    chans = [g_all[:, c, :].reshape(mpad) for c in live]
    sorted_out = jax.lax.sort((rank_pad, *chans), num_keys=1)

    def cumsum_1d(x):
        # inclusive log-depth prefix, (rows, 512) two-level (exact order
        # differences vs a sequential scan are ulp-level f32 associativity).
        # The cross-row carry must be a TRUE exclusive scan (shift, then
        # cumsum): the `cumsum(rowsum) - rowsum` trick turns NaN - NaN into
        # NaN for the row containing the garbage boundary — the slab's
        # never-written blocks beyond `total` are uninitialized and sort
        # into the sentinel segment, whose row can share a 512-wide stripe
        # with the last real positions.
        x2 = x.reshape(-1, 512)
        d = 1
        while d < 512:
            x2 = x2 + jnp.pad(x2, ((0, 0), (d, 0)))[:, :512]
            d *= 2
        rowsum = x2[:, -1]
        carry = jnp.cumsum(jnp.concatenate(
            [jnp.zeros((1,), x2.dtype), rowsum[:-1]]))
        return (x2 + carry[:, None]).reshape(-1)

    cs = jnp.stack([cumsum_1d(c) for c in sorted_out[1:]], axis=1)
    # rank_bounds (from binning) already holds each rank's segment start in
    # the grouped order; sentinel rank n1-1 occupies [total_surv, mpad).
    # Boundary difference on the INCLUSIVE prefix: index b-1 with b==0
    # masked to zero.
    bounds = jnp.concatenate(
        [rank_bounds, jnp.full((1,), mpad, jnp.int32)])       # (n1+1,)

    def at_prev(idx):                                         # cs[idx-1]
        row = cs[jnp.maximum(idx - 1, 0)]
        return jnp.where((idx > 0)[:, None], row, 0.0)

    d_live = at_prev(bounds[1:]) - at_prev(bounds[:-1])       # (n1, live)
    d_rec = jnp.pad(d_live, ((0, 0), (0, _REC - len(live))))  # (n1, 16)

    zero_i = lambda x: np.zeros(x.shape, jax.dtypes.float0)
    return (d_rec, zero_i(rank_pad), zero_i(rank_bounds), zero_i(starts),
            zero_i(ox), zero_i(oy))


_core.defvjp(_core_fwd, _core_bwd)


@jax.custom_vjp
def _reorder(records, order):
    """records[order] with a permutation-aware backward.

    XLA differentiates a gather as a scatter-add (~0.37 ms at N=44k);
    `order` is a PERMUTATION (argsort of the depth key), so the cotangent
    is exactly a gather through the inverse permutation."""
    return records[order]


def _reorder_fwd(records, order):
    return records[order], order


def _reorder_bwd(order, g):
    inv = jnp.argsort(order)
    return g[inv], np.zeros(order.shape, jax.dtypes.float0)


_reorder.defvjp(_reorder_fwd, _reorder_bwd)


@functools.partial(
    jax.jit, static_argnames=("tiles_x", "tiles_y", "width", "height",
                              "interpret", "depth_grad"))
def blend_records_pallas(
    records: jax.Array,          # (N, 16) packed, ORIGINAL gaussian order
    bins: RecordBins,
    bg: jax.Array,
    *,
    tiles_x: int,
    tiles_y: int,
    width: int,
    height: int,
    interpret: bool = False,
    tile_y0: jax.Array | int = 0,
    depth_grad: bool = True,
):
    """Drop-in replacement for rasterize.blend_records with no tile-capacity
    cap (full per-tile lists are blended, matching the CUDA semantics)."""
    n = records.shape[0]
    num_tiles = tiles_x * tiles_y
    m = bins.rank_sorted.shape[0]
    mpad = ((m + KB - 1) // KB) * KB

    rec_pad = jnp.concatenate(
        [_reorder(records, bins.order),
         jnp.zeros((1, records.shape[1]), records.dtype)], axis=0)
    total = bins.starts[num_tiles]
    marange = jnp.arange(mpad, dtype=jnp.int32)
    rank_pad = jnp.where(
        marange < total,
        jnp.pad(bins.rank_sorted.astype(jnp.int32), (0, mpad - m)), n)

    # tile_y0 shifts pixel origins for tile-row-sharded strips (the record
    # pixel coordinates are global; parallel/sharded.py passes axis_index)
    tids = jnp.arange(num_tiles, dtype=jnp.int32)
    ox = (tids % tiles_x) * TILE
    oy = (tids // tiles_x + jnp.asarray(tile_y0, jnp.int32)) * TILE

    starts_i = bins.starts.astype(jnp.int32)
    out = _core(rec_pad, rank_pad, bins.rank_bounds.astype(jnp.int32),
                starts_i, ox, oy, num_tiles, interpret,
                depth_grad)[:num_tiles]                # (T, 8, P)
    img = out[:, 0:3, :] + out[:, 4:5, :] * bg[None, :, None]
    dep = out[:, 3, :]
    alpha = 1.0 - out[:, 4, :]

    def assemble(x):          # (T, C, P) -> (H, W, C); (T, P) -> (H, W)
        if x.ndim == 3:
            c = x.shape[1]
            x = x.reshape(tiles_y, tiles_x, c, TILE, TILE)
            x = x.transpose(0, 3, 1, 4, 2)
            return x.reshape(tiles_y * TILE, tiles_x * TILE,
                             c)[:height, :width]
        x = x.reshape(tiles_y, tiles_x, TILE, TILE)
        x = x.transpose(0, 2, 1, 3)
        return x.reshape(tiles_y * TILE, tiles_x * TILE)[:height, :width]

    return assemble(img), assemble(dep), assemble(alpha)
