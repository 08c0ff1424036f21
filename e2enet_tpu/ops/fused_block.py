"""Fused shiftConvPP block as a channels-first Pallas TPU kernel.

THE round-2 performance lever (PERF_NOTES.md: training is ~6x
bandwidth-bound; the level-0 conv blocks dominate). One kernel computes, per
(sample, depth-row) grid step:

    for each input part p (an implicit channel-concat member):
        row = lrelu(row * mult_p + off_p)        # prev block's instance norm,
                                                 # applied ON LOAD (f32)
    S = depth_shift(concat(parts))               # sublane-range ring reads
    y = conv2d_3x3(S) @ W + b                    # 9 tap dots on the MXU
    stats += (sum(y), sum(y^2)) per channel      # next block's norm input

reading every input voxel ONCE from HBM (rotating 5-slot depth-row ring,
manual DMA) and writing the raw conv output once. The instance-norm
statistics ride along for free; normalized tensors are never materialized —
consumers apply (mult, off) on load.

Layout — "padded channels-first flat rows" (N, D, C, H*Wp), Wp = W + pad:
  * channels-first because Mosaic manual DMA requires 128-aligned lane dims
    (H*Wp is; C=48 is not — the round-1 blocker, experiments/shift_conv_pallas.py);
  * Wp-padding gives every image row trailing ZERO columns, so the 9 conv
    taps are plain static lane slices of one haloed scratch with NO
    boundary masking (out-of-row reads hit real zeros); pltpu.roll on bf16
    is unimplemented on this target, hence slices of a halo, not rotates;
  * channel groups of the depth shift are sublane ranges (5 slice-copies,
    vs 5 full select passes in channels-last);
  * the conv contracts C on the MXU: 9x (C, CO)^T @ (C, H*Wp) with f32
    accumulation. At C<=128 each tap is one MXU K-pass — the same
    lane-utilization wall XLA's conv hits, but with zero extra HBM traffic
    for shift/norm/concat.

Multi-part inputs realize conv(shift(concat(parts))) without materializing
the concat (the reference's nest fusion, unetpp_d.py:447-488): each part
has its own HBM ref + ring; shift group boundaries are computed on the
total channel count (torch.chunk semantics, unetpp_d.py:55-56).

Reference parity: torch_shift + ConvDropoutNormNonlin (unetpp_d.py:38-111).
The backward currently falls back to the XLA reference VJP (exact adjoint);
Pallas backward kernels are the next step.

Constraints: H*Wp % 128 == 0 (Wp is chosen to satisfy this); W <= 254;
stride 1; kernel (1,3,3); bf16 compute.
"""
import collections
import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .shift import group_shifts

NSLOT = 5       # ring slots == shift window for shift_size <= 5
HALO = 256      # halo lanes each side; covers |dh*Wp + dw| <= Wp+1, W <= 254
LRELU_SLOPE = 0.01
INSTNORM_EPS = 1e-5

def choose_wp(H: int, W: int, multiple: int = 1) -> int:
    """Smallest Wp >= W+1 with H*Wp % 128 == 0 (trailing zero columns pad
    each image row; >= 1 column so the dw=+1 tap of w=W-1 reads a zero).
    `multiple`: additionally require Wp % multiple == 0 — set to the
    W-stride of the transposed conv feeding this level, so the upsampled
    output can be written directly in the padded layout (the input is
    padded to Wp/stride columns BEFORE the matmul; one relayout copy
    instead of transpose + pad)."""
    wp = W + 1
    while (H * wp) % 128 != 0 or wp % multiple != 0:
        wp += 1
    assert wp <= 255, f"W={W} too large for the HALO={HALO} design"
    return wp


def _prec(dtype):
    # this XLA/Mosaic build computes f32 dots at reduced precision by
    # default; force the exact 6-pass algorithm when the compute dtype is
    # f32 (golden parity suite) — bf16 keeps the fast default
    return (jax.lax.Precision.HIGHEST
            if dtype == jnp.float32 else jax.lax.Precision.DEFAULT)


def _kernel(*refs, part_channels, part_channels_log, part_affine, groups,
            D, H, W, Wp, CO, do_stats, out_dtype):
    """refs: [x_hbm_0..x_hbm_{P-1}, w2, b, colmask, (mult_p, off_p)*,
    o_y, (o_stats), ring_0.., sref, sem]."""
    P = len(part_channels)
    n_aff = sum(part_affine)
    xs = refs[:P]
    w_ref = refs[P]
    b_ref = refs[P + 1]
    cm_ref = refs[P + 2]                       # (1, H*Wp) f32 column mask
    aff_refs = refs[P + 3:P + 3 + 2 * n_aff]
    outs = refs[P + 3 + 2 * n_aff:]
    if do_stats:
        o_y, o_stats = outs[0], outs[1]
        scratches = outs[2:]
    else:
        o_y = outs[0]
        scratches = outs[1:]
    rings = scratches[:P]
    sref, sem = scratches[P], scratches[P + 1]

    n = pl.program_id(0)
    d = pl.program_id(1)
    HWp = H * Wp
    C = sum(part_channels)
    pad = 2
    # NSLOT_F = NSLOT + 1: the extra slot lets step d START the DMA for
    # d+pad+1 right after WAITING the one for d+pad (started at step d-1),
    # so the next slice's fetch rides under this step's dots. Start must
    # follow the wait — the per-part semaphore is a plain counter; two
    # equal-size in-flight copies would satisfy each other's wait.
    nslot = NSLOT + 1

    def slot(src_d):
        return jax.lax.rem(src_d + 2 * nslot, nslot)

    def start_fetch(src_d):
        s = slot(src_d)
        inb = (src_d >= 0) & (src_d < D)

        @pl.when(inb)
        def _():
            for p in range(P):
                pltpu.make_async_copy(xs[p].at[n, src_d], rings[p].at[s],
                                      sem.at[p]).start()

        @pl.when(jnp.logical_not(inb))
        def _():
            for p in range(P):
                rings[p][s] = jnp.zeros_like(rings[p][s])

    def wait_fetch(src_d):
        s = slot(src_d)
        inb = (src_d >= 0) & (src_d < D)

        @pl.when(inb)
        def _():
            for p in range(P):
                pltpu.make_async_copy(xs[p].at[n, src_d], rings[p].at[s],
                                      sem.at[p]).wait()

    @pl.when((n == 0) & (d == 0))
    def _():
        # zero once: halo lanes (read by the dh=+-1 taps of the first/last
        # image rows) and the physical channel-padding rows (read by every
        # tap matmul with zero weights — must not be NaN garbage). The
        # assembly only ever writes real-channel rows of the body.
        sref[...] = jnp.zeros_like(sref)

    @pl.when(d == 0)
    def _():
        for src in range(-pad, pad):
            start_fetch(jnp.int32(src))
            wait_fetch(jnp.int32(src))
        start_fetch(jnp.int32(pad))

    wait_fetch(d + pad)
    start_fetch(d + pad + 1)

    # ---- assemble the shifted, affine-normalized slice into sref.
    # groups and part boundaries are in LOGICAL channels; sref rows are laid
    # out in PHYSICAL channels (parts padded to even rows for bf16 DMA).
    part_starts = np.cumsum([0] + list(part_channels_log))
    phys_starts = np.cumsum([0] + list(part_channels))
    aff_idx = []
    ai = 0
    for p in range(P):
        aff_idx.append(ai if part_affine[p] else None)
        ai += 1 if part_affine[p] else 0
    for (g0, g1, s) in groups:
        dv = ((d - s >= 0) & (d - s < D)).astype(jnp.float32)
        for p in range(P):
            p0, p1 = int(part_starts[p]), int(part_starts[p + 1])
            c0, c1 = max(g0, p0), min(g1, p1)
            if c0 >= c1:
                continue
            l0, l1 = c0 - p0, c1 - p0          # within-part channels
            row = rings[p][slot(d - s)][l0:l1, :]
            if part_affine[p]:
                # affine params are per (sample, channel): (N, Ci, 1) f32
                m = aff_refs[2 * aff_idx[p]][n, l0:l1, :]
                o = aff_refs[2 * aff_idx[p] + 1][n, l0:l1, :]
                a = row.astype(jnp.float32) * m + o
                # lrelu(x) == max(x, slope*x) for slope < 1 (bf16 cmp is
                # unsupported on this target, so f32 math). Depth-invalid
                # rows stay zero AFTER the affine (shift zero-fill acts
                # post-norm); padding columns must stay zero too.
                a = jnp.maximum(a, a * LRELU_SLOPE) * (dv * cm_ref[...])
                row = a.astype(row.dtype)
            q0 = int(phys_starts[p])
            sref[q0 + l0:q0 + l1, HALO:HALO + HWp] = row

    # ---- conv: 9 taps as direct haloed slices (no masks — padding columns
    # and halo lanes are zero), f32 accumulation on the MXU
    acc = b_ref[:].astype(jnp.float32)[:, None] * cm_ref[...]
    t = 0
    for dh in (-1, 0, 1):
        for dw in (-1, 0, 1):
            off = dh * Wp + dw
            a = sref[:, HALO + off:HALO + off + HWp]
            acc = acc + jax.lax.dot_general(
                w_ref[t * C:(t + 1) * C, :], a,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=_prec(out_dtype))
            t += 1
    # zero the padding columns so chained consumers read true zeros; taps
    # only ever see zeros there, so conv output at padding columns is
    # bias-free garbage = sum of neighbor contributions -> mask it
    acc = acc * cm_ref[...]
    o_y[0, 0] = acc.astype(out_dtype)

    if do_stats:
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


def _vmem_bytes(part_channels, H, Wp, CO, itemsize=2):
    HWp = H * Wp
    C = sum(part_channels)
    ring = (NSLOT + 1) * C * HWp * itemsize    # +1: fwd prefetch slot
    sref = C * (HWp + 2 * HALO) * itemsize
    acc = CO * HWp * 4
    outs = 2 * CO * HWp * itemsize
    return ring + sref + acc + outs


def fused_block_supported(part_channels, H, W, CO,
                          budget=100 * 2 ** 20, itemsize=2) -> bool:
    if W > 254 or W < 2 or H < 2:
        return False
    wp = choose_wp(H, W)
    return _vmem_bytes(part_channels, H, wp, CO, itemsize) < budget


FusedStatic = collections.namedtuple(
    "FusedStatic", ["part_channels", "part_affine", "groups", "D", "H", "W",
                    "Wp", "CO", "do_stats", "interpret"])


def _forward(parts, w2, b, affines, static: FusedStatic):
    s = static
    N = parts[0].shape[0]
    HWp = s.H * s.Wp
    n_aff = sum(s.part_affine)
    dtype = parts[0].dtype

    # physicalize: bf16 manual DMA needs an even sublane (channel) count per
    # part — pad odd parts with a zero channel and give it zero weight rows
    pad_to = 2 if dtype == jnp.bfloat16 else 8
    # bf16: even sublane count per part for manual DMA; f32: Mosaic
    # crashes on partial (8,128) sublane tiles -> pad parts to 8
    # zero channels (zero weight rows keep the math identical)
    phys = [ci + (-ci) % pad_to for ci in s.part_channels]
    if phys != list(s.part_channels):
        pparts, wrows = [], []
        off = 0
        for p, (ci, cp) in enumerate(zip(s.part_channels, phys)):
            x = parts[p]
            if cp != ci:
                x = jnp.pad(x, ((0, 0), (0, 0), (0, cp - ci), (0, 0)))
            pparts.append(x)
            rows = w2.reshape(9, sum(s.part_channels), s.CO)[:, off:off + ci]
            if cp != ci:
                rows = jnp.pad(rows, ((0, 0), (0, cp - ci), (0, 0)))
            wrows.append(rows)
            off += ci
        parts = pparts
        w2 = jnp.concatenate(wrows, axis=1).reshape(9 * sum(phys), s.CO)
    C = sum(phys)

    kfn = functools.partial(
        _kernel, part_channels=tuple(phys),
        part_channels_log=s.part_channels, part_affine=s.part_affine,
        groups=s.groups, D=s.D, H=s.H, W=s.W, Wp=s.Wp, CO=s.CO,
        do_stats=s.do_stats, out_dtype=dtype)

    lane = np.arange(HWp) % s.Wp
    colmask = jnp.asarray((lane < s.W).astype(np.float32)[None, :])

    in_specs = ([pl.BlockSpec(memory_space=pltpu.HBM)] * len(parts)
                + [pl.BlockSpec(memory_space=pltpu.VMEM)] * (3 + 2 * n_aff))
    out_specs = [pl.BlockSpec((1, 1, s.CO, HWp), lambda n, d: (n, d, 0, 0),
                              memory_space=pltpu.VMEM)]
    out_shape = [jax.ShapeDtypeStruct((N, s.D, s.CO, HWp), dtype)]
    if s.do_stats:
        out_specs.append(pl.BlockSpec((1, s.CO, 2), lambda n, d: (n, 0, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((N, s.CO, 2), jnp.float32))

    scratch = ([pltpu.VMEM((NSLOT + 1, pc, HWp), dtype)   # +1: prefetch
                for pc in phys]
               + [pltpu.VMEM((C, HWp + 2 * HALO), dtype),
                  pltpu.SemaphoreType.DMA((len(parts),))])

    out = pl.pallas_call(
        kfn,
        grid=(N, s.D),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=scratch,
        interpret=s.interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=112 * 2 ** 20),
        cost_estimate=pl.CostEstimate(
            flops=2 * N * s.D * HWp * 9 * C * s.CO,
            bytes_accessed=N * s.D * HWp * (C + s.CO) * 2,
            transcendentals=0),
    )(*parts, w2, b, colmask, *affines)
    if s.do_stats:
        return out[0], out[1]
    return out[0], None


# ---------------------------------------------------------------------------
# Pallas backward kernel: one (N, D) walk with rotating rings computing
# d(parts), dW, db and the affine grads — no XLA full-volume intermediates
# (the XLA fallback backward materializes per-node recomputes that the
# scheduler hoists, blowing the HBM peak at production sizes).
#
# Derivation (y = conv(shift(concat(u_p))) + b, u_p = lrelu(x_p*m_p+o_p)):
#   gy_eff[e]   = (gy[e] + gs1 + 2*y[e]*gs2) * colmask
#   ct[e]       = conv_T(gy_eff[e])          (within-slice, 9 flipped taps)
#   gU[d][c,g]  = ct[d + s_g][c]             (shift adjoint = +s read)
#   gx_p[d]     = gU_p[d] * lrelu'(a) * m_p  (affine parts) else gU_p[d]
#   gw[tap]    += S_tap[e] @ gy_eff[e]^T     (S = fwd shifted operand)
#   gb         += sum(gy_eff)
# Schedule at grid step d: fetch parts[d+4], gy/y[d+2]; compute gy_eff[d+2],
# ct[d+2] (ring), wgrad at e=d+2; emit gx[d] from the ct ring + parts ring
# (slot d). Warmup handles e=0,1.


def _bwd_kernel(*refs, part_channels, part_channels_log, part_affine,
                groups, D, H, W, Wp, CO, out_dtype):
    P = len(part_channels)
    n_aff = sum(part_affine)
    idx = 0
    xs = refs[idx:idx + P]; idx += P
    gy_hbm = refs[idx]; idx += 1
    y_hbm = refs[idx]; idx += 1
    w_ref = refs[idx]; idx += 1          # (9C, CO) fwd weights
    cm_ref = refs[idx]; idx += 1         # (1, HWp) f32
    gs_ref = refs[idx]; idx += 1         # (N, CO, 2) f32 stats cotangent
    aff_refs = refs[idx:idx + 2 * n_aff]; idx += 2 * n_aff
    # outputs
    gxs = refs[idx:idx + P]; idx += P
    gw_ref = refs[idx]; idx += 1         # (9C, CO) f32
    gb_ref = refs[idx]; idx += 1         # (N, CO, 1) f32
    gaffs = refs[idx:idx + n_aff]; idx += n_aff   # (N, Cp, 2) f32 each
    # scratch
    rings = refs[idx:idx + P]; idx += P
    gybuf = refs[idx]; idx += 1          # (2, CO, HWp) double-buffered
    ybuf = refs[idx]; idx += 1           # (2, CO, HWp)
    geff = refs[idx]; idx += 1           # (CO, HWp + 2*HALO) haloed
    ct_ring = refs[idx]; idx += 1        # (NSLOT, C, HWp)
    ct_acc = refs[idx]; idx += 1         # (C, HWp) f32 accumulator
    sref = refs[idx]; idx += 1           # (C, HWp + 2*HALO) haloed
    sem = refs[idx]; idx += 1

    n = pl.program_id(0)
    # grid dim 1 runs D+4 steps: dd = step - 4 is the emitted output depth.
    # The 4 lead-in steps replace an unrolled warmup — inlining process_e
    # five times quintuples register pressure (measured ~53MB of spill
    # slots at production sizes).
    dd = pl.program_id(1) - 4
    HWp = H * Wp
    C = sum(part_channels)
    part_starts = np.cumsum([0] + list(part_channels_log))
    phys_starts = np.cumsum([0] + list(part_channels))
    aff_idx = []
    ai = 0
    for p in range(P):
        aff_idx.append(ai if part_affine[p] else None)
        ai += 1 if part_affine[p] else 0

    # parts ring: NSLOT+1 slots — step dd WAITS the copy for dd+4 (started
    # at dd-1) then STARTS dd+5, so the next slice's fetch rides under this
    # step's dots (strict wait-then-start: the per-part semaphore is a
    # plain counter). Live depths at step dd: dd..dd+5 = 6 slots.
    nslot = NSLOT + 1

    def slot(src_d):
        return jax.lax.rem(src_d + 2 * nslot, nslot)

    def cslot(src_d):
        # ct ring keeps NSLOT slots (live window dd-2..dd+2)
        return jax.lax.rem(src_d + 2 * NSLOT, NSLOT)

    def start_parts(src_d):
        s = slot(src_d)
        inb = (src_d >= 0) & (src_d < D)

        @pl.when(inb)
        def _():
            for p in range(P):
                pltpu.make_async_copy(xs[p].at[n, src_d], rings[p].at[s],
                                      sem.at[p]).start()

        @pl.when(jnp.logical_not(inb))
        def _():
            for p in range(P):
                rings[p][s] = jnp.zeros_like(rings[p][s])

    def wait_parts(src_d):
        s = slot(src_d)
        inb = (src_d >= 0) & (src_d < D)

        @pl.when(inb)
        def _():
            for p in range(P):
                pltpu.make_async_copy(xs[p].at[n, src_d], rings[p].at[s],
                                      sem.at[p]).wait()

    # gy/y double buffer: wait e (started at the previous step), start e+1
    def gy_slot(e):
        return jax.lax.rem(e + 4, 2)

    def start_gy(e):
        sl = gy_slot(e)

        @pl.when((e >= 0) & (e < D))
        def _():
            pltpu.make_async_copy(gy_hbm.at[n, e], gybuf.at[sl],
                                  sem.at[P]).start()
            pltpu.make_async_copy(y_hbm.at[n, e], ybuf.at[sl],
                                  sem.at[P + 1]).start()

    def wait_gy(e):
        sl = gy_slot(e)

        @pl.when((e >= 0) & (e < D))
        def _():
            pltpu.make_async_copy(gy_hbm.at[n, e], gybuf.at[sl],
                                  sem.at[P]).wait()
            pltpu.make_async_copy(y_hbm.at[n, e], ybuf.at[sl],
                                  sem.at[P + 1]).wait()

    def assemble_S(e):
        """Fwd shifted+normalized operand S[e] into sref (body lanes)."""
        for (g0, g1, sft) in groups:
            dv = ((e - sft >= 0) & (e - sft < D)).astype(jnp.float32)
            for p in range(P):
                p0, p1 = int(part_starts[p]), int(part_starts[p + 1])
                c0, c1 = max(g0, p0), min(g1, p1)
                if c0 >= c1:
                    continue
                l0, l1 = c0 - p0, c1 - p0
                row = rings[p][slot(e - sft)][l0:l1, :]
                if part_affine[p]:
                    m = aff_refs[2 * aff_idx[p]][n, l0:l1, :]
                    o = aff_refs[2 * aff_idx[p] + 1][n, l0:l1, :]
                    a = row.astype(jnp.float32) * m + o
                    a = jnp.maximum(a, a * LRELU_SLOPE) * (dv * cm_ref[...])
                    row = a.astype(row.dtype)
                q0 = int(phys_starts[p])
                sref[q0 + l0:q0 + l1, HALO:HALO + HWp] = row

    def process_e(e):
        """gy_eff[e] -> ct ring; wgrad & bias grad at e. The gy/y buffers
        for e were DMA'd at the previous step (wait_gy(e) already done)."""
        inb = (e >= 0) & (e < D)

        @pl.when(inb)
        def _():
            sl = gy_slot(e)
            # bf16 math (the value is cast to bf16 for the dots anyway);
            # full-width f32 chains here spill tens of MB of vregs
            gs1 = gs_ref[n, :, 0:1].astype(gybuf.dtype)   # (CO, 1)
            gs2 = (2.0 * gs_ref[n, :, 1:2]).astype(gybuf.dtype)
            cmb = cm_ref[...].astype(gybuf.dtype)
            geb = (gybuf[sl] + gs1 + ybuf[sl] * gs2) * cmb
            geff[:, HALO:HALO + HWp] = geb

            # bias grad (f32 accumulation of the bf16 row)
            s1 = jnp.sum(geb.astype(jnp.float32), axis=1,
            # WINDOW-RELATIVE index below: the (n,0,0) index map already
            # selects this sample's block; [n] wrote OOB for n >= 1
            # (latent round-2 bug; interpret mode clamps OOB indices so
            # CPU tests never caught it — PERF_NOTES round-3)
                         keepdims=True)                   # (CO, 1)

            @pl.when(e == 0)
            def _():
                gb_ref[0, :, 0:1] = s1

            @pl.when(e != 0)
            def _():
                gb_ref[0, :, 0:1] += s1

            # ct[e] = conv_T(gy_eff[e]): flipped taps, channel-transposed.
            # Accumulate in VMEM scratch — a value chain of (C, HWp) f32
            # vectors spills ~65MB of vregs at production sizes.
            t = 0
            for dh in (-1, 0, 1):
                for dw in (-1, 0, 1):
                    # adjoint of tap (dh, dw) reads gy_eff at -offset
                    off = -(dh * Wp + dw)
                    a = geff[:, HALO + off:HALO + off + HWp]
                    contrib = jax.lax.dot_general(
                        w_ref[t * C:(t + 1) * C, :], a,
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=_prec(out_dtype))
                    if t == 0:
                        ct_acc[...] = contrib
                    else:
                        ct_acc[...] += contrib
                    t += 1
            ct_ring[cslot(e)] = ct_acc[...].astype(ct_ring.dtype)

            # wgrad at e: S[e] assembled from parts rings
            assemble_S(e)
            t = 0
            for dh in (-1, 0, 1):
                for dw in (-1, 0, 1):
                    off = dh * Wp + dw
                    stap = sref[:, HALO + off:HALO + off + HWp]
                    gwc = jax.lax.dot_general(
                        stap, geb,
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,   # (C, CO)
                        precision=_prec(out_dtype))

                    @pl.when((n == 0) & (e == 0))
                    def _(t=t, gwc=gwc):
                        gw_ref[t * C:(t + 1) * C, :] = gwc

                    @pl.when(jnp.logical_not((n == 0) & (e == 0)))
                    def _(t=t, gwc=gwc):
                        gw_ref[t * C:(t + 1) * C, :] += gwc
                    t += 1

        @pl.when(jnp.logical_not(inb))
        def _():
            ct_ring[cslot(e)] = jnp.zeros_like(ct_ring[cslot(e)])

    @pl.when((n == 0) & (dd == -4))
    def _():
        sref[...] = jnp.zeros_like(sref)
        geff[...] = jnp.zeros_like(geff)

    # zero-fill the negative-depth ring rows once per sample; those slots
    # are re-fetched with real rows only AFTER assemble_S has consumed the
    # zeros (last read of depth -2 is assemble_S(0) at dd == -2; its slot
    # is restarted at dd == -1)
    @pl.when(dd == -4)
    def _():
        start_parts(jnp.int32(-2))      # zero-fills (inb false)
        start_parts(jnp.int32(-1))
        start_parts(jnp.int32(0))       # waited just below

    wait_parts(dd + 4)      # rows 0..D-1 as dd walks -4..D-1
    start_parts(dd + 5)     # prefetch rides under this step's dots
    wait_gy(dd + 2)
    start_gy(dd + 3)
    process_e(dd + 2)       # e = -2..D+1; invalid e zeroes its ct slot

    # ---- emit gx[dd]: shift adjoint from the ct ring + affine backward
    @pl.when(dd >= 0)
    def _emit():
        for p in range(P):
            p0, p1 = int(part_starts[p]), int(part_starts[p + 1])
            q0 = int(phys_starts[p])
            for (g0, g1, sft) in groups:
                c0, c1 = max(g0, p0), min(g1, p1)
                if c0 >= c1:
                    continue
                l0, l1 = c0 - p0, c1 - p0
                gu = ct_ring[cslot(dd + sft)][q0 + l0:q0 + l1, :]
                if part_affine[p]:
                    x_row = rings[p][slot(dd)][l0:l1, :].astype(jnp.float32)
                    m = aff_refs[2 * aff_idx[p]][n, l0:l1, :]
                    o = aff_refs[2 * aff_idx[p] + 1][n, l0:l1, :]
                    a = x_row * m + o
                    sel = jnp.where(a >= 0, 1.0, LRELU_SLOPE)
                    guf = gu.astype(jnp.float32) * sel * cm_ref[...]
                    gxs[p][0, 0, l0:l1, :] = (guf * m).astype(out_dtype)
                    gm = jnp.sum(guf * x_row, axis=1, keepdims=True)
                    go = jnp.sum(guf, axis=1, keepdims=True)

                    @pl.when(dd == 0)
                    def _(p=p, l0=l0, l1=l1, gm=gm, go=go):
                        gaffs[aff_idx[p]][0, l0:l1, 0:1] = gm
                        gaffs[aff_idx[p]][0, l0:l1, 1:2] = go

                    @pl.when(dd != 0)
                    def _(p=p, l0=l0, l1=l1, gm=gm, go=go):
                        gaffs[aff_idx[p]][0, l0:l1, 0:1] += gm
                        gaffs[aff_idx[p]][0, l0:l1, 1:2] += go
                else:
                    gxs[p][0, 0, l0:l1, :] = gu.astype(out_dtype)


def _bwd_pallas(parts, w2, b, affines, y, gy, gstats, static: FusedStatic):
    """Pallas-kernel backward. Returns (gparts, gw, gb, gaffines) in the
    LOGICAL channel shapes."""
    s = static
    N = parts[0].shape[0]
    HWp = s.H * s.Wp
    dtype = parts[0].dtype
    pad_to = 2 if dtype == jnp.bfloat16 else 8
    # bf16: even sublane count per part for manual DMA; f32: Mosaic
    # crashes on partial (8,128) sublane tiles -> pad parts to 8
    # zero channels (zero weight rows keep the math identical)
    phys = [ci + (-ci) % pad_to for ci in s.part_channels]
    # physicalize parts + weights like the forward
    if phys != list(s.part_channels):
        pparts, wrows = [], []
        off = 0
        for p, (ci, cp) in enumerate(zip(s.part_channels, phys)):
            x = parts[p]
            if cp != ci:
                x = jnp.pad(x, ((0, 0), (0, 0), (0, cp - ci), (0, 0)))
            pparts.append(x)
            rows = w2.reshape(9, sum(s.part_channels), s.CO)[:, off:off + ci]
            if cp != ci:
                rows = jnp.pad(rows, ((0, 0), (0, cp - ci), (0, 0)))
            wrows.append(rows)
            off += ci
        parts = pparts
        w2p = jnp.concatenate(wrows, axis=1).reshape(9 * sum(phys), s.CO)
    else:
        w2p = w2
    C = sum(phys)
    n_aff = sum(s.part_affine)

    lane = np.arange(HWp) % s.Wp
    colmask = jnp.asarray((lane < s.W).astype(np.float32)[None, :])
    if gstats is None:
        gstats = jnp.zeros((N, s.CO, 2), jnp.float32)

    kfn = functools.partial(
        _bwd_kernel, part_channels=tuple(phys),
        part_channels_log=s.part_channels, part_affine=s.part_affine,
        groups=s.groups, D=s.D, H=s.H, W=s.W, Wp=s.Wp, CO=s.CO,
        out_dtype=dtype)

    in_specs = ([pl.BlockSpec(memory_space=pltpu.HBM)] * len(parts)
                + [pl.BlockSpec(memory_space=pltpu.HBM),     # gy
                   pl.BlockSpec(memory_space=pltpu.HBM)]     # y
                + [pl.BlockSpec(memory_space=pltpu.VMEM)] * (3 + 2 * n_aff))
    # grid dim 1 has 4 lead-in steps (see _bwd_kernel); during them the gx
    # block index clamps to 0 — the block is rewritten at the first real
    # step before any flush to HBM (same block until step 5)
    def gx_index(nn_, step):
        z = step - step  # traced 0
        return (nn_, jnp.maximum(step - 4, z), z, z)

    out_specs = (
        [pl.BlockSpec((1, 1, cp, HWp), gx_index,
                      memory_space=pltpu.VMEM) for cp in phys]
        + [pl.BlockSpec((9 * C, s.CO), lambda nn_, step: (0, 0),
                        memory_space=pltpu.VMEM),
           pl.BlockSpec((1, s.CO, 1), lambda nn_, step: (nn_, 0, 0),
                        memory_space=pltpu.VMEM)]
        + [pl.BlockSpec((1, cp, 2), lambda nn_, step: (nn_, 0, 0),
                        memory_space=pltpu.VMEM)
           for p, cp in enumerate(phys) if s.part_affine[p]])
    out_shape = (
        [jax.ShapeDtypeStruct((N, s.D, cp, HWp), dtype) for cp in phys]
        + [jax.ShapeDtypeStruct((9 * C, s.CO), jnp.float32),
           jax.ShapeDtypeStruct((N, s.CO, 1), jnp.float32)]
        + [jax.ShapeDtypeStruct((N, cp, 2), jnp.float32)
           for p, cp in enumerate(phys) if s.part_affine[p]])

    scratch = ([pltpu.VMEM((NSLOT + 1, cp, HWp), dtype)   # +1: prefetch
                for cp in phys]
               + [pltpu.VMEM((2, s.CO, HWp), dtype),           # gybuf (db)
                  pltpu.VMEM((2, s.CO, HWp), dtype),           # ybuf (db)
                  pltpu.VMEM((s.CO, HWp + 2 * HALO), dtype),   # geff halo
                  pltpu.VMEM((NSLOT, C, HWp), dtype),          # ct ring
                  pltpu.VMEM((C, HWp), jnp.float32),           # ct acc
                  pltpu.VMEM((C, HWp + 2 * HALO), dtype),      # sref halo
                  pltpu.SemaphoreType.DMA((len(parts) + 2,))])

    aff_flat = list(affines)
    outs = pl.pallas_call(
        kfn,
        grid=(N, s.D + 4),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=scratch,
        interpret=s.interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            # 127M like qfused: the prefetch ring slots pushed the biggest
            # 2-part level-0 bwd to 120.06M (> the old 120M limit)
            vmem_limit_bytes=127 * 2 ** 20),
        cost_estimate=pl.CostEstimate(
            flops=3 * 2 * N * s.D * HWp * 9 * C * s.CO,
            bytes_accessed=3 * N * s.D * HWp * (C + s.CO) * 2,
            transcendentals=0),
    )(*parts, gy, y, w2p, colmask, gstats, *aff_flat)

    gparts = list(outs[:len(parts)])
    gw_p = outs[len(parts)]
    gb = jnp.sum(outs[len(parts) + 1][..., 0], axis=0).astype(b.dtype)
    gaff_outs = outs[len(parts) + 2:]

    # de-physicalize
    if phys != list(s.part_channels):
        gparts = [g[:, :, :ci, :] for g, ci in zip(gparts, s.part_channels)]
        gw9 = gw_p.reshape(9, C, s.CO)
        cols = []
        off = 0
        for ci, cp in zip(s.part_channels, phys):
            cols.append(gw9[:, off:off + ci])
            off += cp
        gw = jnp.concatenate(cols, axis=1).reshape(
            9 * sum(s.part_channels), s.CO).astype(w2.dtype)
    else:
        gw = gw_p.astype(w2.dtype)

    gaffines = []
    k = 0
    for p in range(len(s.part_channels)):
        if s.part_affine[p]:
            ga = gaff_outs[k][:, :s.part_channels[p], :]
            gaffines.extend([ga[..., 0:1], ga[..., 1:2]])
            k += 1
    return tuple(gparts), gw, gb, tuple(gaffines)


# ---------------------------------------------------------------------------
# XLA reference (numerical oracle + backward)


def _xla_reference(parts, w2, b, affines, static: FusedStatic):
    """Same math in plain XLA on the padded channels-first flat layout."""
    s = static
    N, D = parts[0].shape[0], s.D
    HWp = s.H * s.Wp
    dtype = parts[0].dtype
    lane = np.arange(HWp) % s.Wp
    colmask = jnp.asarray((lane < s.W).astype(np.float32))

    ai = 0
    normed = []
    for p, x in enumerate(parts):
        if s.part_affine[p]:
            mult, off = affines[2 * ai], affines[2 * ai + 1]  # (N, Ci, 1)
            ai += 1
            a = (x.astype(jnp.float32) * mult[:, None, :, :]
                 + off[:, None, :, :])
            a = jnp.maximum(a, a * LRELU_SLOPE) * colmask
            x = a.astype(dtype)
        normed.append(x)
    x = jnp.concatenate(normed, axis=2)                    # (N, D, C, HWp)
    C = x.shape[2]
    ch = jax.lax.broadcasted_iota(jnp.int32, (1, 1, C, 1), 2)
    xp = jnp.pad(x, ((0, 0), (2, 2), (0, 0), (0, 0)))
    sh = None
    for c0, c1, g in s.groups:
        part = jax.lax.slice_in_dim(xp, 2 - g, 2 - g + D, axis=1)
        sh = part if sh is None else jnp.where((ch >= c0) & (ch < c1),
                                               part, sh)
    x2 = sh.reshape(N * D, C, s.H, s.Wp)
    wk = w2.reshape(3, 3, C, s.CO)
    y = jax.lax.conv_general_dilated(
        x2, wk.astype(dtype), window_strides=(1, 1),
        padding=((1, 1), (1, 1)),
        dimension_numbers=("NCHW", "HWIO", "NCHW"),
        preferred_element_type=jnp.float32,
        precision=_prec(dtype))
    y = (y + b.astype(jnp.float32)[None, :, None, None]).reshape(
        N, D, s.CO, HWp)
    # NOTE the kernel's taps read real zeros beyond row ends (padded
    # columns), while this conv's W-axis sees padding columns as
    # neighbors... they ARE zero in x (enforced above and by producers), so
    # results agree on valid columns; mask the padding columns like the
    # kernel does.
    y = (y * colmask).astype(dtype)
    if s.do_stats:
        yf = y.astype(jnp.float32)
        s1 = jnp.sum(yf, axis=(1, 3))
        s2 = jnp.sum(jnp.square(yf), axis=(1, 3))
        return y, jnp.stack([s1, s2], axis=-1)
    return y, None


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _fused_op(parts, w2, b, affines, static):
    y, stats = _forward(list(parts), w2, b, list(affines), static)
    if stats is None:
        stats = jnp.zeros((parts[0].shape[0], static.CO, 2), jnp.float32)
    return y, stats


def _fused_fwd(parts, w2, b, affines, static):
    out = _fused_op(parts, w2, b, affines, static)
    # y rides as a residual: the backward needs it only for the
    # d(stats)/dy = (1, 2y) term, and it is this op's own output — no
    # forward recompute in the backward pass
    return out, (parts, w2, b, affines, out[0])


def _shift_normalize(parts, affines, static: FusedStatic):
    """The normalized input parts (cheap elementwise recompute used by the
    backward for the weight-grad operand)."""
    s = static
    HWp = s.H * s.Wp
    lane = np.arange(HWp) % s.Wp
    colmask = jnp.asarray((lane < s.W).astype(np.float32))
    dtype = parts[0].dtype
    ai = 0
    normed = []
    for p, x in enumerate(parts):
        if s.part_affine[p]:
            mult, off = affines[2 * ai], affines[2 * ai + 1]  # (N, Ci, 1)
            ai += 1
            a = (x.astype(jnp.float32) * mult[:, None, :, :]
                 + off[:, None, :, :])
            x = (jnp.maximum(a, a * LRELU_SLOPE) * colmask).astype(dtype)
        normed.append(x)
    return normed, colmask


def _apply_shift_cf(x, groups, D, sign=+1):
    """Channel-grouped depth shift on (N, D, C, L); sign=-1 is the adjoint."""
    C = x.shape[2]
    ch = jax.lax.broadcasted_iota(jnp.int32, (1, 1, C, 1), 2)
    xp = jnp.pad(x, ((0, 0), (2, 2), (0, 0), (0, 0)))
    out = None
    for c0, c1, g in groups:
        g = sign * g
        part = jax.lax.slice_in_dim(xp, 2 - g, 2 - g + D, axis=1)
        out = part if out is None else jnp.where((ch >= c0) & (ch < c1),
                                                 part, out)
    return out


_USE_PALLAS_BWD = True


def _fused_bwd(static, res, g):
    if _USE_PALLAS_BWD:
        parts, w2, b, affines, y = res
        gy, gstats = g
        return _bwd_pallas(parts, w2, b, affines, y, gy, gstats, static)
    return _fused_bwd_xla(static, res, g)


def _fused_bwd_xla(static, res, g):
    """Manual XLA backward — no forward recompute. Cost: one transposed
    conv (dgrad), one weight-grad contraction, and elementwise passes.
    NOTE: at production sizes XLA hoists every node's wgrad-operand
    recompute and keeps them all live (HBM OOM) — kept as a debugging
    fallback and oracle; the Pallas backward above is the production
    path."""
    s = static
    parts, w2, b, affines, y = res
    gy, gstats = g
    # tie the recompute of the wgrad operand (a full-volume intermediate)
    # to the incoming cotangent: without this barrier XLA hoists every
    # node's recompute to the start of the backward pass and keeps them ALL
    # live (5 x ~1GB at production sizes -> OOM)
    parts, gy = jax.lax.optimization_barrier((parts, gy))
    N, D = parts[0].shape[0], s.D
    HWp = s.H * s.Wp
    C = sum(s.part_channels)
    dtype = parts[0].dtype

    normed, colmask = _shift_normalize(parts, affines, static)

    # effective cotangent of the (masked) conv output
    gy_eff = gy.astype(jnp.float32)
    if s.do_stats and gstats is not None:
        gs1 = gstats[..., 0][:, None, :, None]      # (N, 1, CO, 1)
        gs2 = gstats[..., 1][:, None, :, None]
        gy_eff = gy_eff + gs1 + 2.0 * y.astype(jnp.float32) * gs2
    gy_eff = (gy_eff * colmask).astype(dtype)

    gb = jnp.sum(gy_eff.astype(jnp.float32), axis=(0, 1, 3)).astype(b.dtype)

    wk = w2.reshape(3, 3, C, s.CO)

    # dgrad: gS = conv_transpose(gy_eff) == conv with spatially-flipped,
    # channel-transposed kernel (stride 1, SAME)
    g2 = gy_eff.reshape(N * D, s.CO, s.H, s.Wp)
    wk_t = jnp.flip(wk, axis=(0, 1)).transpose(0, 1, 3, 2)  # (3,3,CO,C)
    gS = jax.lax.conv_general_dilated(
        g2, wk_t.astype(dtype), window_strides=(1, 1),
        padding=((1, 1), (1, 1)),
        dimension_numbers=("NCHW", "HWIO", "NCHW"),
        preferred_element_type=jnp.float32,
        precision=_prec(dtype)).astype(dtype)
    gS = gS.reshape(N, D, C, HWp)

    # wgrad: gw[kh,kw,ci,co] = sum over (n,d,h,w) S[.., h+kh-1, w+kw-1, ci]
    # * gy_eff[.., h, w, co]; contraction via conv with the batch as the
    # contracting dim (standard conv wgrad formulation)
    S = _apply_shift_cf(jnp.concatenate(normed, axis=2), s.groups, D)
    S4 = S.reshape(N * D, C, s.H, s.Wp)
    # (C <- feature, N*D <- batch-contraction): lhs (C, ND, H, Wp) etc.
    # lhs (b=ci, f=nd, H, Wp), rhs (o=co, i=nd, H, Wp) -> out (ci, co, 3, 3)
    gw = jax.lax.conv_general_dilated(
        S4.transpose(1, 0, 2, 3).astype(dtype),        # (C, ND, H, Wp)
        g2.transpose(1, 0, 2, 3).astype(dtype),        # (CO, ND, H, Wp)
        window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        preferred_element_type=jnp.float32,
        precision=_prec(dtype))
    # out (C, CO, 3, 3) -> (3, 3, C, CO) -> (9C, CO)
    gw = gw.transpose(2, 3, 0, 1).reshape(9 * C, s.CO).astype(w2.dtype)

    # shift adjoint (negated offsets), then split to parts + affine bwd
    gU = _apply_shift_cf(gS, s.groups, D, sign=-1)
    gparts, gaffines = [], []
    off0 = 0
    ai = 0
    for p, x in enumerate(parts):
        ci = s.part_channels[p]
        gu = gU[:, :, off0:off0 + ci, :]
        off0 += ci
        if s.part_affine[p]:
            # recompute the affine locally so the lrelu mask fuses into
            # this elementwise chain instead of being materialized in f32
            # across the dgrad conv (an extra ~GB at production sizes)
            mult, off = affines[2 * ai], affines[2 * ai + 1]
            ai += 1
            xf = x.astype(jnp.float32)
            a = xf * mult[:, None, :, :] + off[:, None, :, :]
            sel = jnp.where(a >= 0, 1.0, LRELU_SLOPE)
            guf = gu.astype(jnp.float32) * sel * colmask
            gx = (guf * mult[:, None, :, :]).astype(x.dtype)
            gm = jnp.sum(guf * xf, axis=(1, 3))          # (N, Ci)
            go = jnp.sum(guf, axis=(1, 3))
            gaffines.extend([gm.reshape(N, ci, 1), go.reshape(N, ci, 1)])
            gparts.append(gx)
        else:
            gparts.append(gu.astype(x.dtype))
    return tuple(gparts), gw, gb, tuple(gaffines)


_fused_op.defvjp(_fused_fwd, _fused_bwd)


def fused_shift_conv_block(parts: Sequence[jnp.ndarray],
                           kernel: jnp.ndarray, bias: jnp.ndarray,
                           affines: Sequence[Optional[tuple]],
                           H: int, W: int,
                           shift_size: int = 5,
                           do_shift: bool = True,
                           do_stats: bool = True,
                           use_pallas: bool = True,
                           interpret: bool = False,
                           flips=(False, False, False),
                           groups_override=None):
    """parts: padded channels-first flat tensors (N, D, Ci, H*Wp) — an
    implicit channel concat; padding columns (w >= W) must be zero.
    kernel: (3, 3, C, CO). bias: (CO,). affines: per part, None or a pair
    (mult (Ci,) or (N, Ci), off likewise) f32 — the part's pending
    instance-norm apply + leaky-relu, executed on load.

    flips (fd, fh, fw): the MIRRORED-equivalent block (flip-free TTA) —
    block(x, flips=c) == flip_c(block(flip_c(x))). For this stride-1 block
    that is exactly: mirrored conv kernel (h/w) + negated shift groups (d);
    the tap slices / halo geometry and the Pallas kernel are UNCHANGED.

    Returns (y_raw (N, D, CO, H*Wp): conv output, NOT normalized, padding
             columns zero; stats (N, CO, 2): [sum, sumsq] over valid voxels
             or None).
    """
    part_channels = tuple(int(p.shape[2]) for p in parts)
    C = sum(part_channels)
    D = int(parts[0].shape[1])
    CO = int(kernel.shape[-1])
    Wp = parts[0].shape[3] // H
    assert parts[0].shape[3] == H * Wp and Wp >= W + 1 and Wp <= 255
    if flips[1]:
        kernel = kernel[::-1]
    if flips[2]:
        kernel = kernel[:, ::-1]
    # groups_override: explicit shift groups over the (compact) channel
    # space — sparse-plan path (see qfused.quadrant_fused_block)
    if groups_override is not None:
        groups = tuple(groups_override)
        assert groups[-1][1] == C and groups[0][0] == 0
    else:
        groups = (tuple(group_shifts(C, shift_size)) if do_shift
                  else ((0, C, 0),))
    if flips[0]:
        groups = tuple((c0, c1, -s) for (c0, c1, s) in groups)
    part_affine = tuple(a is not None for a in affines)
    w2 = kernel.reshape(9 * C, CO)
    N = int(parts[0].shape[0])
    flat_affines = []
    for p, a in enumerate(affines):
        if a is not None:
            m, o = a
            ci = part_channels[p]
            m = jnp.broadcast_to(m.astype(jnp.float32).reshape(-1, ci),
                                 (N, ci)).reshape(N, ci, 1)
            o = jnp.broadcast_to(o.astype(jnp.float32).reshape(-1, ci),
                                 (N, ci)).reshape(N, ci, 1)
            flat_affines.extend([m, o])
    static = FusedStatic(part_channels, part_affine, groups, D, H, W, Wp,
                         CO, do_stats, interpret)
    if use_pallas:
        y, stats = _fused_op(tuple(parts), w2, bias, tuple(flat_affines),
                             static)
    else:
        y, stats = _xla_reference(list(parts), w2, bias, flat_affines,
                                  static)
        if stats is None:
            stats = jnp.zeros((parts[0].shape[0], CO, 2), jnp.float32)
    return y, (stats if do_stats else None)


# ---------------------------------------------------------------------------
# layout + norm helpers


def to_padded_cf(x: jnp.ndarray, W: int, Wp: int) -> jnp.ndarray:
    """(N, D, H, W, C) channels-last -> (N, D, C, H*Wp) padded flat."""
    N, D, H, _, C = x.shape
    x = jnp.transpose(x, (0, 1, 4, 2, 3))                 # (N, D, C, H, W)
    x = jnp.pad(x, ((0, 0),) * 4 + ((0, Wp - W),))
    return x.reshape(N, D, C, H * Wp)


def from_padded_cf(x: jnp.ndarray, H: int, W: int) -> jnp.ndarray:
    """(N, D, C, H*Wp) -> (N, D, H, W, C) channels-last."""
    N, D, C, HWp = x.shape
    Wp = HWp // H
    x = x.reshape(N, D, C, H, Wp)[..., :W]
    return jnp.transpose(x, (0, 1, 3, 4, 2))


def norm_affine_from_stats(stats: jnp.ndarray, n_vox: int,
                           scale: jnp.ndarray, nbias: jnp.ndarray,
                           eps: float = INSTNORM_EPS):
    """(mult, off) of the instance-norm apply from accumulated (sum, sumsq).
    stats: (N, CO, 2) -> mult/off (N, CO) f32; consumers compute
    lrelu(x * mult + off). Matches ops.blocks.instance_norm's bf16 fast path
    (E[x^2] - E[x]^2 variance, f32)."""
    s1, s2 = stats[..., 0], stats[..., 1]
    mean = s1 / n_vox
    var = s2 / n_vox - mean * mean
    mult = jax.lax.rsqrt(var + eps) * scale.astype(jnp.float32)[None]
    off = nbias.astype(jnp.float32)[None] - mean * mult
    return mult, off


def pooled_part_cf(x: jnp.ndarray, mult: jnp.ndarray, off: jnp.ndarray,
                   H: int, W: int, window, out_wp: int) -> jnp.ndarray:
    """Normalized + max-pooled down-link part, computed directly in the
    padded channels-first layout: lrelu(x*mult+off) -> maxpool(window) ->
    re-pad. ONE fused XLA pass over the source level (the channels-last
    route costs three relayout passes: materialize CL, pool, convert back).
    x: (N, D, C, H*Wp) pending raw; mult/off (N, C). Padding columns may be
    nonzero in x (they are masked out by the slice)."""
    N, D, C, HWp = x.shape
    Wp = HWp // H
    wd, wh, ww = window
    # bf16 fast path (matches the bf16 instance-norm fma apply in
    # ops/blocks.py): keeping the affine in bf16 keeps the whole VJP chain
    # bf16 — the f32 upcast's backward materializes full-volume f32
    # pad/reshape intermediates (~50 ms/step measured at Heart level 0)
    ct = jnp.float32 if x.dtype == jnp.float32 else x.dtype
    a = (x.astype(ct) * mult.astype(ct)[:, None, :, None]
         + off.astype(ct)[:, None, :, None])
    a = jnp.maximum(a, a * jnp.asarray(LRELU_SLOPE, ct)).astype(x.dtype)
    a = a.reshape(N, D, C, H, Wp)[..., :W]
    a = a.reshape(N, D // wd, wd, C, H // wh, wh, W // ww, ww)
    a = jnp.max(a, axis=(2, 5, 7))                  # (N, D2, C, H2, W2)
    a = jnp.pad(a, ((0, 0),) * 4 + ((0, out_wp - W // ww),))
    return a.reshape(N, D // wd, C, (H // wh) * out_wp)


def pooled_cl_from_cf(x: jnp.ndarray, mult: jnp.ndarray, off: jnp.ndarray,
                      H: int, W: int, window) -> jnp.ndarray:
    """Normalized + max-pooled down-link emitted CHANNELS-LAST for
    unfused (XLA-path) consumers, straight from the pending raw: one
    fused pass + a small transpose of the pooled result — replaces the
    as_cl materialization (full-size CL write + layout copy) followed by
    max_pool (the round-8 profile: ~1.3 ms materialize + 1.6 ms reduce
    per level-1 -> level-2 down-link). Matches max_pool(as_cl(pending))
    exactly: same bf16 affine fast path, same reshape-max.
    x: (N, D, C, H*Wp) pending raw; mult/off (N, C);
    out: (N, D//wd, H//wh, W//ww, C)."""
    N, D, C, HWp = x.shape
    Wp = HWp // H
    wd, wh, ww = window
    ct = jnp.float32 if x.dtype == jnp.float32 else x.dtype
    a = (x.astype(ct) * mult.astype(ct)[:, None, :, None]
         + off.astype(ct)[:, None, :, None])
    a = jnp.maximum(a, a * jnp.asarray(LRELU_SLOPE, ct)).astype(x.dtype)
    a = a.reshape(N, D, C, H, Wp)[..., :W]
    a = a.reshape(N, D // wd, wd, C, H // wh, wh, W // ww, ww)
    a = jnp.max(a, axis=(2, 5, 7))                  # (N, D2, C, H2, W2)
    return jnp.transpose(a, (0, 1, 3, 4, 2))


def apply_norm_lrelu_cf(x: jnp.ndarray, mult: jnp.ndarray, off: jnp.ndarray,
                        colmask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Materialize a pending normalization (for non-fused consumers):
    lrelu(x * mult + off), x (N, D, C, HWp); mult/off (N, C)."""
    ct = jnp.float32 if x.dtype == jnp.float32 else x.dtype  # bf16 fast path
    a = (x.astype(ct) * mult.astype(ct)[:, None, :, None]
         + off.astype(ct)[:, None, :, None])
    a = jnp.maximum(a, a * jnp.asarray(LRELU_SLOPE, ct))
    if colmask is not None:
        a = a * colmask.astype(ct)
    return a.astype(x.dtype)
