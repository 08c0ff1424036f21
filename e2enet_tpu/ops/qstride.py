"""Quadrant-native strided encoder transition as a single Pallas TPU kernel.

The level-0 -> level-1 convolutional pooling (reference: the strided first
conv of StackedConvLayers, unetpp_d.py:122-185, fed by torch_shift,
unetpp_d.py:38-64) on the quadrant tensor. The XLA block-algebra version
(ops/qfused.quadrant_strided_shift_conv) is correct but costs ~4-5 ms/pass
at bench geometry: a 5-piece shift-group concat plus nine separate tap
einsums that each round-trip a full f32 accumulator through HBM (round-6
sliding profile: concatenate 87 ms + 7x21 ms tap fusions per 64-pass
volume). This kernel computes, per (sample, output-depth) grid step:

    slot   = lrelu(raw * mult + off) * colmask    # prev block's instance
                                                  # norm, applied ONCE per
                                                  # ring slot on arrival
    sref   = assemble 9 tap rows: tap (dh, dw) group (c0, c1, s) reads
             quadrant block (bd(s), bh(dh), bw(dw)) of ring slot
             dq + doff(s), lane-shifted by hq_off*Wqp + wq_off
    y      = W^T @ sref + b                       # ONE K-merged MXU dot,
                                                  # K = 9*C
    stats += (sum(y), sum(y^2)) per channel       # next block's norm input

reading every input voxel once from HBM (rotating depth ring, manual DMA)
and writing the conv output once — the norm materializer, the shift-group
concat and the nine accumulator round trips all disappear. DMA-bound by
design: ~2.5 GF against ~{in + out} bytes per pass.

Block algebra (identical to quadrant_strided_shift_conv, see its docstring):
the output keeps only true voxels (d, h, w) = (qd*dq, qh*hq, qw*wq), so
  * depth shift by s lands on source quadrant block bd = s & 1 (qd == 2)
    at quadrant-depth offset -((s + bd) // 2), or block 0 at offset -s
    (qd == 1);
  * conv tap (dh, dw) reads block (bh, bw) = (dh & 1, dw & 1) at lane
    offset (-Wqp if dh == -1 else 0) + (-1 if dw == -1 else 0) (qh/qw == 2),
    or block 0 at lane offset dh*Wqp + dw (qh/qw == 1).
Lane shifts are baked into the ASSEMBLY WRITE offset (each tap owns its C
sref rows), so no halo is needed: unwritten lane ranges are zeroed once and
stay zero (they correspond to out-of-image taps; padding columns of the
source are already zero post-norm).

The backward delegates to the XLA reference composition's VJP (exact
adjoint, same path autodiff used before this kernel existed); residuals are
the raw inputs, so the reference forward is recomputed in the backward —
the forward kernel's saving is ~the recompute's cost, a wash for training
and a pure win for inference.

Constraints: q dims in {1, 2}, Q > 1; Wp_out == Wqp (the kernel emits the
input lane striding — planner geometries satisfy this; the model gate falls
back to the XLA path otherwise); Hq*Wqp % 128 == 0; bf16 compute (or
interpret mode).
"""
import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .shift import group_shifts

LRELU_SLOPE = 0.01

TAPS = tuple((dh, dw) for dh in (-1, 0, 1) for dw in (-1, 0, 1))


class QSStatic(NamedTuple):
    q: Tuple[int, int, int]
    C: int                  # logical input channels (per quadrant block)
    CO: int
    Dq: int
    Hq: int
    Wq: int
    Wqp: int
    shift_size: int
    do_shift: bool
    interpret: bool
    # mirrored-equivalent op (flip-free TTA): op(x, flips=c) ==
    # flip_c(op(flip_c(x))). A flipped stride-2 axis re-anchors the window
    # grid: depth shift s -> -(s+1) (the kept residues swap parity), conv
    # taps read positions dh+1 in {0,1,2} with the mirrored kernel.
    flips: Tuple[bool, bool, bool] = (False, False, False)


def _groups(C: int, shift_size: int, do_shift: bool,
            qd: int = 2, flip_d: bool = False):
    """Shift groups, with the depth flip folded in: the kernel's source
    formula x[2dq - s] stays; a flipped depth axis maps s -> -(s+1)
    (qd == 2: flip swaps the kept even rows to odd) or -s (qd == 1)."""
    gs = (tuple(group_shifts(C, shift_size)) if do_shift
          else ((0, C, 0),))
    if flip_d:
        gs = tuple((c0, c1, -(s + 1) if qd == 2 else -s)
                   for (c0, c1, s) in gs)
    return gs


def _depth_offsets(q, groups):
    """Quadrant-depth (ring) offsets used by the shift groups."""
    qd = q[0]
    offs = set()
    for (_, _, s) in groups:
        if qd == 1:
            offs.add(-s)
        else:
            bd = s & 1
            offs.add(-((s + bd) // 2))
    return min(offs), max(offs)


def _tap_geometry(q, Wqp, dh, dw, flips=(False, False, False)):
    """(bh, bw, lane_offset) of conv tap (dh, dw). On a flipped stride-2
    axis the (pre-mirrored) kernel's tap slot reads position p = dh + 1 in
    {0, 1, 2} -> block p & 1 at offset p >> 1; a flipped stride-1 axis
    needs only the kernel mirror (geometry unchanged)."""
    _, qh, qw = q

    def one(dv, qv, f):
        if qv != 2:
            return 0, dv
        if f:
            p = dv + 1
            return p & 1, p >> 1
        return dv & 1, (-1 if dv == -1 else 0)

    bh, hq_off = one(dh, qh, flips[1])
    bw, wq_off = one(dw, qw, flips[2])
    return bh, bw, hq_off * Wqp + wq_off


def _vmem_bytes(s: QSStatic, itemsize=2):
    qd, qh, qw = s.q
    Q = qd * qh * qw
    L = s.Hq * s.Wqp
    lo, hi = _depth_offsets(s.q, _groups(s.C, s.shift_size, s.do_shift,
                                         s.q[0], s.flips[0]))
    nslot = (hi - lo + 1) + 1
    ring = nslot * Q * s.C * L * itemsize
    sref = 9 * s.C * L * itemsize
    acc = s.CO * L * 4
    outs = 2 * s.CO * L * itemsize      # double-buffered output window
    return ring + sref + acc + outs


def qstrided_supported(q, C, CO, Hq, Wq, Wqp, Wp_out,
                       budget=100 * 2 ** 20, itemsize=2) -> bool:
    """Gate for the Pallas strided-transition kernel (else: XLA path)."""
    qd, qh, qw = q
    Q = qd * qh * qw
    if Q <= 1 or not all(k in (1, 2) for k in (qd, qh, qw)):
        return False
    if Wp_out != Wqp or Wq >= Wqp or (Hq * Wqp) % 128 != 0:
        return False
    s = QSStatic(tuple(q), C, CO, 0, Hq, Wq, Wqp, 5, True, False)
    return _vmem_bytes(s, itemsize) < budget


def _kernel(x_hbm, m_ref, o_ref, w_ref, b_ref, cm_ref, o_y, o_stats,
            ring, sref, sem, *, s: QSStatic, out_dtype):
    qd, qh, qw = s.q
    Q = qd * qh * qw
    C, CO, Dq, L, Wqp = s.C, s.CO, s.Dq, s.Hq * s.Wqp, s.Wqp
    groups = _groups(C, s.shift_size, s.do_shift, qd, s.flips[0])
    minoff, maxoff = _depth_offsets(s.q, groups)
    nslot = (maxoff - minoff + 1) + 1   # window + 1 prefetch slot

    n = pl.program_id(0)
    d = pl.program_id(1)

    def slot(src_d):
        return jax.lax.rem(src_d + 4 * nslot, nslot)

    def start_fetch(src_d):
        sl = slot(src_d)
        inb = (src_d >= 0) & (src_d < Dq)

        @pl.when(inb)
        def _():
            pltpu.make_async_copy(x_hbm.at[n, src_d], ring.at[sl],
                                  sem).start()

        @pl.when(jnp.logical_not(inb))
        def _():
            ring[sl] = jnp.zeros_like(ring[sl])

    def wait_norm(src_d):
        """Wait the slot's DMA, then normalize it IN PLACE (once): the 9
        taps re-read these rows, so lrelu(raw*mult+off)*colmask runs once
        per voxel instead of once per tap. Out-of-range depths keep their
        zero fill (the reference zero-pads POST-norm)."""
        sl = slot(src_d)
        inb = (src_d >= 0) & (src_d < Dq)

        @pl.when(inb)
        def _():
            pltpu.make_async_copy(x_hbm.at[n, src_d], ring.at[sl],
                                  sem).wait()
            # FULL-slot store: partial-row stores at a dynamically-indexed
            # leading dim corrupt on this Mosaic (PERF_NOTES round-3);
            # m/o come pre-tiled to (N, Q*C, 1) so one expression covers
            # the slot
            raw = ring[sl][...]
            a = raw.astype(jnp.float32) * m_ref[n] + o_ref[n]
            a = jnp.maximum(a, a * LRELU_SLOPE) * cm_ref[...]
            ring[sl] = a.astype(raw.dtype)

    @pl.when((n == 0) & (d == 0))
    def _():
        # zero once: lane ranges the shifted assembly writes never touch
        # (out-of-image tap reads) stay zero for the whole run
        sref[...] = jnp.zeros_like(sref)

    @pl.when(d == 0)
    def _():
        for src in range(minoff, maxoff):
            start_fetch(jnp.int32(src))
            wait_norm(jnp.int32(src))
        start_fetch(jnp.int32(maxoff))

    # strict wait-then-start (single plain-counter semaphore): the d+1
    # slice's fetch rides under this step's dot
    wait_norm(d + maxoff)
    start_fetch(d + maxoff + 1)

    # ---- assemble the 9 tap row-blocks (lane shift baked into the write)
    for t, (dh, dw) in enumerate(TAPS):
        bh, bw, lo = _tap_geometry(s.q, Wqp, dh, dw, s.flips)
        for (c0, c1, sh) in groups:
            if qd == 1:
                bd, doff = 0, -sh
            else:
                bd = sh & 1
                doff = -((sh + bd) // 2)
            blk = bd * qh * qw + bh * qw + bw
            src = ring[slot(d + doff)][blk * C + c0:blk * C + c1, :]
            if lo <= 0:
                sref[t * C + c0:t * C + c1, -lo:L] = src[:, :L + lo]
            else:
                sref[t * C + c0:t * C + c1, 0:L - lo] = src[:, lo:]

    # ---- ONE K-merged dot over all taps: (9C, CO)^T @ (9C, L)
    prec = (jax.lax.Precision.HIGHEST if out_dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    wv, sv = w_ref[...], sref[...]
    if s.interpret and out_dtype == jnp.bfloat16:
        # the CPU interpret backend has no bf16 dot thunk; numerics match
        # the MXU's bf16-in/f32-acc contraction
        wv, sv = wv.astype(jnp.float32), sv.astype(jnp.float32)
    acc = b_ref[:].astype(jnp.float32)[:, None] * cm_ref[...]
    acc = acc + jax.lax.dot_general(
        wv, sv,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)
    acc = acc * cm_ref[...]
    o_y[0, 0] = acc.astype(out_dtype)

    s1 = jnp.sum(acc, axis=1, keepdims=True)
    s2 = jnp.sum(acc * acc, axis=1, keepdims=True)

    @pl.when(d == 0)
    def _():
        o_stats[0, :, 0:1] = s1
        o_stats[0, :, 1:2] = s2

    @pl.when(d != 0)
    def _():
        o_stats[0, :, 0:1] += s1
        o_stats[0, :, 1:2] += s2


def _forward(xraw, mult, off, kernel, bias, s: QSStatic):
    qd, qh, qw = s.q
    Q = qd * qh * qw
    N = xraw.shape[0]
    L = s.Hq * s.Wqp
    dtype = xraw.dtype
    groups = _groups(s.C, s.shift_size, s.do_shift, s.q[0], s.flips[0])
    minoff, maxoff = _depth_offsets(s.q, groups)
    nslot = (maxoff - minoff + 1) + 1

    if s.flips[1]:
        kernel = kernel[::-1]
    if s.flips[2]:
        kernel = kernel[:, ::-1]
    w2 = kernel.reshape(9 * s.C, s.CO).astype(dtype)
    lane = np.arange(L) % s.Wqp
    colmask = jnp.asarray((lane < s.Wq).astype(np.float32)[None, :])

    kfn = functools.partial(_kernel, s=s, out_dtype=dtype)
    out = pl.pallas_call(
        kfn,
        grid=(N, s.Dq),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        out_specs=(
            pl.BlockSpec((1, 1, s.CO, L), lambda n, d: (n, d, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s.CO, 2), lambda n, d: (n, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((N, s.Dq, s.CO, L), dtype),
            jax.ShapeDtypeStruct((N, s.CO, 2), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((nslot, Q * s.C, L), dtype),
            pltpu.VMEM((9 * s.C, L), dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=s.interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=112 * 2 ** 20),
        cost_estimate=pl.CostEstimate(
            flops=2 * N * s.Dq * L * 9 * s.C * s.CO,
            bytes_accessed=N * s.Dq * L * (Q * s.C + s.CO) * 2,
            transcendentals=0),
    )(xraw,
      jnp.tile(mult.astype(jnp.float32), (1, Q))[..., None],   # (N, Q*C, 1)
      jnp.tile(off.astype(jnp.float32), (1, Q))[..., None],
      w2, bias.astype(jnp.float32), colmask)
    return out


def _ref_forward(xraw, mult, off, kernel, bias, s: QSStatic):
    """The XLA composition this kernel replaces (exact semantics; its VJP
    is the kernel's backward)."""
    from .qfused import (quadrant_apply_norm_lrelu, quadrant_colmask,
                         quadrant_strided_shift_conv)
    xqn = quadrant_apply_norm_lrelu(
        xraw, mult, off, quadrant_colmask(s.Hq, s.Wq, s.Wqp))
    return quadrant_strided_shift_conv(
        xqn, kernel, bias, s.q, s.Hq, s.Wq, s.Wqp,
        shift_size=s.shift_size, do_shift=s.do_shift,
        compute_dtype=xraw.dtype, flips=s.flips)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def quadrant_strided_fused(xraw, mult, off, kernel, bias, s: QSStatic):
    """Strided quadrant transition with norm-on-load: (y, stats).

    xraw: (N, Dq, Q*C, Hq*Wqp) PENDING (un-normalized) quadrant tensor;
    mult/off: (N, C) f32 pending-instance-norm affine (same across blocks);
    kernel: (3, 3, C, CO); bias: (CO,). Output lane striding == input's
    (Wp_out == Wqp — gate with qstrided_supported)."""
    return _forward(xraw, mult, off, kernel, bias, s)


def _fwd(xraw, mult, off, kernel, bias, s):
    out = _forward(xraw, mult, off, kernel, bias, s)
    return out, (xraw, mult, off, kernel, bias)


def _bwd(s, res, g):
    _, vjp = jax.vjp(lambda *a: _ref_forward(*a, s), *res)
    return vjp(g)


quadrant_strided_fused.defvjp(_fwd, _bwd)
