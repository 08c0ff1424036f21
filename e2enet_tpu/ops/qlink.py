"""Site-epilogue Pallas kernels for the quadrant inter-level links.

The round-8 sliding profile (PERF_NOTES.md) attributes ~240 ms/volume to
XLA executing the three inter-level boundary ops at ~10x their HBM
bandwidth floor: the pending up-link GEMM (XLA lowers the dot_general to
a slow convolution form — 2.9 ms/call vs a ~0.35 ms floor), the down-link
block-max (2.66 ms kLoop fusion vs ~0.3), and the seg-head pending-norm
materializer (5.1 ms/call).  All three are per-(n, d) SITE-WISE maps over
lane-aligned (C, L = Hq*Wqp) blocks, so each becomes a trivial
grid-(N, D) Pallas kernel with standard BlockSpec pipelining (Mosaic
double-buffers the HBM traffic automatically — no manual DMA, none of the
ring machinery of qfused.py).

Each public op is a jax.custom_vjp. The up-link/seg-head BACKWARDs
delegate to jax.vjp of the XLA twin (the twin's forward dot is
dead-code-eliminated inside the vjp, so the backward is the closed form):
training cost AND numerics are bit-identical to the pre-kernel path. The
down-link backward is hand-derived (same subgradient semantics as the
twin's vjp, f32 cotangent chain instead of the twin's bf16) because the
delegated form re-materialized the twin's forward intermediates to HBM —
see the bwd comment in downlink_block_max and PERF_NOTES round-10/11.

Reference semantics: the transposed-conv up-link, max-pool down-link and
1x1 seg heads of Generic_UNetPlusPlus
(/root/reference/e2enet/network_architecture/unetpp_d.py:449-478
up/concat nest wiring, :394-400 and :480-483 seg_outputs) — relayouted
to the quadrant channels-first flat layout of ops/qfused.py.
"""
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LRELU_SLOPE = 0.01

# VMEM budget for the simple pipelined kernels: in+out blocks are
# double-buffered by Mosaic; keep well under the 128M chip VMEM.
_VMEM_BUDGET = 100 * 2 ** 20


def _site_vmem_bytes(cin: int, cout: int, L: int, in_item: int,
                     out_item: int) -> int:
    # 2x double-buffering on the streamed in/out blocks + f32 temps.
    return 2 * (cin * L * in_item + cout * L * out_item) + 4 * cin * L * 4


def site_link_supported(cin: int, cout: int, L: int, dtype,
                        out_itemsize: int = 2) -> bool:
    """Gate for the qlink kernels: bf16 streams, lane-aligned rows,
    sublane-aligned channel counts, VMEM feasibility."""
    if jnp.dtype(dtype) != jnp.bfloat16:
        return False
    if L % 128 != 0 or cin % 8 != 0 or cout % 8 != 0:
        return False
    return _site_vmem_bytes(cin, cout, L, 2, out_itemsize) < _VMEM_BUDGET


def _pick_rows(D: int, per_row_bytes: int) -> int:
    """Depth rows per grid step: amortizes the ~15 us/step fixed cost
    (measured: 1-row kernels run ~4-6x over their DMA floor) while
    keeping the double-buffered blocks inside the VMEM budget."""
    for r in (8, 4, 2, 1):
        if D % r == 0 and 2 * r * per_row_bytes < _VMEM_BUDGET * 3 // 4:
            return r
    return 1


def _site_specs(N: int, D: int, rows: int, shapes_in, shape_out,
                out_dtype, interpret: bool):
    """pallas_call boilerplate for a grid-(N, D//rows) site kernel.
    shapes_in: list of (C, lanes) streamed per step as (1, rows, C,
    lanes) blocks, or None for a small replicated VMEM operand (full
    array)."""
    in_specs = []
    for s in shapes_in:
        if s is None:
            in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        else:
            c, lanes = s
            in_specs.append(pl.BlockSpec((1, rows, c, lanes),
                                         lambda n, d: (n, d, 0, 0),
                                         memory_space=pltpu.VMEM))
    co, lo = shape_out
    out_specs = pl.BlockSpec((1, rows, co, lo), lambda n, d: (n, d, 0, 0),
                             memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((N, D, co, lo), out_dtype)
    return dict(grid=(N, D // rows), in_specs=in_specs,
                out_specs=out_specs,
                out_shape=out_shape, interpret=interpret,
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("arbitrary", "arbitrary"),
                    vmem_limit_bytes=_VMEM_BUDGET))


# --------------------------------------------------------------------------
# up-link: pending raw -> norm+lrelu+mask -> block-column GEMM
# (the Pallas twin of qfused.transp_conv_quadrant_from_cf)
# --------------------------------------------------------------------------

def _uplink_kernel(x_ref, m_ref, o_ref, cm_ref, w_ref, y_ref, *, rows,
                   interpret):
    m, o = m_ref[0, 0], o_ref[0, 0]                  # (Cin, 1)
    w = w_ref[...]
    if interpret:            # CPU eager dot lacks bf16xbf16->f32; exact
        w = w.astype(jnp.float32)
    for r in range(rows):
        x = x_ref[0, r]                              # (Cin, L) bf16
        a = x * m + o                                # bf16 affine fast path
        a = jnp.maximum(a, a * jnp.asarray(LRELU_SLOPE, a.dtype))
        a = a * cm_ref[...]                          # zero the pad columns
        if interpret:
            a = a.astype(jnp.float32)
        y = jax.lax.dot_general(w, a, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        y_ref[0, r] = y.astype(y_ref.dtype)


@functools.lru_cache(maxsize=64)
def _uplink_call(N, Dq, Cin, KO, L, rows, interpret):
    kw = _site_specs(N, Dq, rows,
                     [(Cin, L), (Cin, 1), (Cin, 1), None, None],
                     (KO, L), jnp.bfloat16, interpret)
    # affine blocks are (1, 1, Cin, 1) slices of (N, 1, Cin, 1)
    kw["in_specs"][1] = pl.BlockSpec((1, 1, Cin, 1),
                                     lambda n, d: (n, 0, 0, 0),
                                     memory_space=pltpu.VMEM)
    kw["in_specs"][2] = pl.BlockSpec((1, 1, Cin, 1),
                                     lambda n, d: (n, 0, 0, 0),
                                     memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_uplink_kernel, rows=rows, interpret=interpret),
        **kw)


def _uplink_pallas(raw, mult, off, w2t, colmask, interpret=False):
    N, Dq, Cin, L = raw.shape
    KO = w2t.shape[0]
    rows = _pick_rows(Dq, (Cin + KO) * L * 2)
    call = _uplink_call(N, Dq, Cin, KO, L, rows, bool(interpret))
    m = mult.astype(jnp.bfloat16).reshape(N, 1, Cin, 1)
    o = off.astype(jnp.bfloat16).reshape(N, 1, Cin, 1)
    return call(raw, m, o, colmask.astype(jnp.bfloat16),
                w2t.astype(jnp.bfloat16))


def uplink_from_cf(raw, mult, off, kernel, q: Tuple[int, int, int],
                   Hq: int, Wq: int, xla_fn, interpret: bool = False):
    """Pallas transp_conv_quadrant_from_cf. xla_fn(raw, mult, off, kernel)
    is the XLA twin (same statics closed over); the custom backward is
    jax.vjp of the twin, so grads are identical to the non-kernel path."""
    qd, qh, qw = q
    N, Dq, Cin, L = raw.shape
    Cout = kernel.shape[-1]
    KO = qd * qh * qw * Cout
    Wqp = L // Hq
    from .qfused import quadrant_colmask

    def run(raw, mult, off, kernel):
        w2t = jnp.transpose(
            kernel.reshape(qd * qh * qw, Cin, Cout),
            (0, 2, 1)).reshape(KO, Cin)
        return _uplink_pallas(raw, mult, off, w2t,
                              quadrant_colmask(Hq, Wq, Wqp),
                              interpret=interpret)

    f = jax.custom_vjp(run)

    def fwd(raw, mult, off, kernel):
        return run(raw, mult, off, kernel), (raw, mult, off, kernel)

    def bwd(res, gy):
        _, pullback = jax.vjp(xla_fn, *res)
        return pullback(gy)

    f.defvjp(fwd, bwd)
    return f(raw, mult, off, kernel)


# --------------------------------------------------------------------------
# down-link: pending raw -> block-max over Q -> norm+lrelu+mask
# (the Pallas twin of qfused.quadrant_block_max_cf)
# --------------------------------------------------------------------------

def _downlink_kernel(x_ref, m_ref, o_ref, sel_ref, cm_ref, y_ref, *,
                     rows, Q, C):
    m, o, sel = m_ref[0, 0], o_ref[0, 0], sel_ref[0, 0]
    for r in range(rows):
        x = x_ref[0, r]                              # (Q*C, L) bf16
        bmax = x[0:C].astype(jnp.float32)
        bmin = bmax
        for k in range(1, Q):
            blk = x[k * C:(k + 1) * C].astype(jnp.float32)
            bmax = jnp.maximum(bmax, blk)
            bmin = jnp.minimum(bmin, blk)
        # jnp.where (not sel*bmax + (1-sel)*bmin) so a +/-inf on the
        # unselected branch can't produce 0*inf=NaN — matches the XLA
        # twin's select semantics exactly.
        pick = jnp.where(sel > 0, bmax, bmin)
        a = pick * m + o
        a = jnp.maximum(a, a * LRELU_SLOPE)
        a = a * cm_ref[...]
        y_ref[0, r] = a.astype(y_ref.dtype)


@functools.lru_cache(maxsize=64)
def _downlink_call(N, Dq, Q, C, L, rows, interpret):
    kw = _site_specs(N, Dq, rows,
                     [(Q * C, L), (C, 1), (C, 1), (C, 1), None],
                     (C, L), jnp.bfloat16, interpret)
    for i in (1, 2, 3):
        kw["in_specs"][i] = pl.BlockSpec((1, 1, C, 1),
                                         lambda n, d: (n, 0, 0, 0),
                                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_downlink_kernel, rows=rows, Q=Q, C=C), **kw)


def downlink_block_max(x, mult, off, C: int, Hq: int, Wq: int, xla_fn,
                       interpret: bool = False):
    """Pallas quadrant_block_max_cf for the Wp_out == Wqp case.
    Matches the XLA twin exactly: raw-bf16 max/min over the Q blocks
    (monotone-affine trick), f32 pick/affine/lrelu, zeroed pad columns."""
    N, Dq, QC, L = x.shape
    Q = QC // C
    Wqp = L // Hq
    from .qfused import quadrant_colmask

    def run(x, mult, off):
        rows = _pick_rows(Dq, (Q * C + C) * L * 2 + 3 * C * L * 4)
        call = _downlink_call(N, Dq, Q, C, L, rows, bool(interpret))
        m = mult.astype(jnp.float32).reshape(N, 1, C, 1)
        o = off.astype(jnp.float32).reshape(N, 1, C, 1)
        sel = (mult > 0).astype(jnp.float32).reshape(N, 1, C, 1)
        return call(x, m, o, sel,
                    quadrant_colmask(Hq, Wq, Wqp).astype(jnp.float32))

    f = jax.custom_vjp(run)

    def fwd(x, mult, off):
        return run(x, mult, off), (x, mult, off)

    def bwd(res, gy):
        # ONE streamed Pallas pass when VMEM allows (the XLA AD of the
        # twin splits into two kLoop fusions per site with ~28
        # materialized pred-mask intermediates — ~20-26 ms/train-step
        # over the 4 Heart-geometry sites, PERF_NOTES round-11; the
        # equivalent hand-written XLA bwd measured the same). The kernel
        # recomputes the block max/min chains in VMEM and routes the
        # pooled gradient with the twin's EXACT jnp.maximum subgradient
        # semantics (ties split 0.5 at every pairwise chain step), so
        # grads match the twin's vjp up to f32-vs-bf16 cotangent rounding
        # (tests/test_qlink.py::test_downlink_grads_identical_to_xla).
        xr, mult_r, off_r = res
        if _downlink_bwd_vmem(Q, C, L) < _VMEM_BUDGET:
            rows = _pick_rows(Dq, _downlink_bwd_vmem(Q, C, L))
            call = _downlink_bwd_call(N, Dq, Q, C, L, rows,
                                      bool(interpret))
            m = mult_r.astype(jnp.float32).reshape(N, 1, C, 1)
            o = off_r.astype(jnp.float32).reshape(N, 1, C, 1)
            sel = (mult_r > 0).astype(jnp.float32).reshape(N, 1, C, 1)
            gx, gm, go = call(
                xr, gy, m, o, sel,
                quadrant_colmask(Hq, Wq, Wqp).astype(jnp.float32))
            gmult = jnp.sum(gm, axis=(1, 3)).astype(mult_r.dtype)
            goff = jnp.sum(go, axis=(1, 3)).astype(off_r.dtype)
            return gx, gmult, goff
        _, pullback = jax.vjp(xla_fn, *res)
        return pullback(gy)

    f.defvjp(fwd, bwd)
    return f(x, mult, off)


def _downlink_bwd_kernel(x_ref, gy_ref, m_ref, o_ref, sel_ref, cm_ref,
                         gx_ref, gm_ref, go_ref, *, rows, Q, C):
    m, o, sel = m_ref[0, 0], o_ref[0, 0], sel_ref[0, 0]   # (C, 1) f32
    use_max = sel > 0
    for r in range(rows):
        x = x_ref[0, r]                                   # (Q*C, L) bf16
        # blocks lifted to f32 once: Mosaic's VPU has no bf16 compare
        # (arith.cmpf on bf16 fails to lower) and f32 max/compare on
        # exact bf16 values is bit-equivalent
        blocks = [x[k * C:(k + 1) * C].astype(jnp.float32)
                  for k in range(Q)]
        run_max, run_min = [blocks[0]], [blocks[0]]
        for k in range(1, Q):
            run_max.append(jnp.maximum(run_max[-1], blocks[k]))
            run_min.append(jnp.minimum(run_min[-1], blocks[k]))
        pick = jnp.where(use_max, run_max[-1], run_min[-1])
        a = pick * m + o
        ga = gy_ref[0, r].astype(jnp.float32) * cm_ref[...]
        ga = jnp.where(a >= 0, ga, ga * LRELU_SLOPE)      # lrelu bwd
        gm_ref[0, r] = jnp.sum(ga * pick, axis=1, keepdims=True)
        go_ref[0, r] = jnp.sum(ga, axis=1, keepdims=True)
        gpick = ga * m

        # Walk each chain backward: w_xk = (x_k beats M_{k-1}) +
        # 0.5*(tie); w_prev = 1 - w_xk.
        def chain_route(cmp_gt):
            run = run_max if cmp_gt else run_min
            g = jnp.where(use_max if cmp_gt else ~use_max, gpick, 0.0)
            gxs = [None] * Q
            for k in range(Q - 1, 0, -1):
                prev = run[k - 1]
                beats = (blocks[k] > prev) if cmp_gt else (blocks[k] < prev)
                w = beats.astype(jnp.float32) \
                    + 0.5 * (blocks[k] == prev).astype(jnp.float32)
                gxs[k] = g * w
                g = g * (1.0 - w)
            gxs[0] = g
            return gxs

        gmaxs = chain_route(True)
        gmins = chain_route(False)
        for k in range(Q):
            gx_ref[0, r, k * C:(k + 1) * C] = \
                (gmaxs[k] + gmins[k]).astype(gx_ref.dtype)


def _downlink_bwd_vmem(Q: int, C: int, L: int) -> int:
    """Rows=1 VMEM model for the bwd kernel: double-buffered x/gy in and
    gx out, the f32 chain prefixes, and the f32 routing temps."""
    io = 2 * (Q * C * L * 2 + C * L * 2 + Q * C * L * 2)
    chains = 2 * (Q - 1) * C * L * 4
    temps = 8 * C * L * 4
    return io + chains + temps + 2 ** 20


@functools.lru_cache(maxsize=64)
def _downlink_bwd_call(N, Dq, Q, C, L, rows, interpret):
    def spec(c, lanes, dtype, affine=False):
        if affine:
            return pl.BlockSpec((1, 1, c, lanes), lambda n, d: (n, 0, 0, 0),
                                memory_space=pltpu.VMEM)
        return pl.BlockSpec((1, rows, c, lanes), lambda n, d: (n, d, 0, 0),
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        functools.partial(_downlink_bwd_kernel, rows=rows, Q=Q, C=C),
        grid=(N, Dq // rows),
        in_specs=[spec(Q * C, L, jnp.bfloat16),
                  spec(C, L, jnp.bfloat16),
                  spec(C, 1, jnp.float32, affine=True),
                  spec(C, 1, jnp.float32, affine=True),
                  spec(C, 1, jnp.float32, affine=True),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=[spec(Q * C, L, jnp.bfloat16),
                   spec(C, 1, jnp.float32),
                   spec(C, 1, jnp.float32)],
        out_shape=[jax.ShapeDtypeStruct((N, Dq, Q * C, L), jnp.bfloat16),
                   jax.ShapeDtypeStruct((N, Dq, C, 1), jnp.float32),
                   jax.ShapeDtypeStruct((N, Dq, C, 1), jnp.float32)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=_VMEM_BUDGET))


# --------------------------------------------------------------------------
# seg head: pending raw -> f32 norm+lrelu -> per-block 1x1 -> f32 logits
# (the Pallas twin of quadrant_apply_norm_lrelu + SegHead's block einsum)
# --------------------------------------------------------------------------

def _seghead_kernel(x_ref, m_ref, o_ref, w_ref, y_ref, *, rows,
                    interpret):
    m, o = m_ref[0, 0], o_ref[0, 0]
    w = w_ref[...]
    if interpret:            # CPU eager dot lacks bf16xbf16->f32; exact
        w = w.astype(jnp.float32)
    for r in range(rows):
        x = x_ref[0, r]                              # (Q*C, L) bf16
        a = x.astype(jnp.float32) * m + o
        a = jnp.maximum(a, a * LRELU_SLOPE)
        a = a.astype(x.dtype)                        # twin: f32 affine->bf16
        if interpret:
            a = a.astype(jnp.float32)
        y = jax.lax.dot_general(w, a, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        y_ref[0, r] = y


@functools.lru_cache(maxsize=64)
def _seghead_call(N, Dq, QC, QK, L, rows, interpret):
    kw = _site_specs(N, Dq, rows, [(QC, L), (QC, 1), (QC, 1), None],
                     (QK, L), jnp.float32, interpret)
    for i in (1, 2):
        kw["in_specs"][i] = pl.BlockSpec((1, 1, QC, 1),
                                         lambda n, d: (n, 0, 0, 0),
                                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_seghead_kernel, rows=rows, interpret=interpret),
        **kw)


def seghead_quadrant(raw, mult, off, w, Q: int, xla_fn,
                     interpret: bool = False):
    """Pending-in quadrant seg head: per-block 1x1 conv as ONE block-
    diagonal (Q*K, Q*C) dot on the normalized raw. Output f32
    (N, Dq, Q*K, L) quadrant logits (de-quadrantize, if wanted, stays
    outside). w: (C, K). The Q*K rows of zero-padding in the block-diag
    weight add exact zeros — bit-equal to the per-block einsum."""
    N, Dq, QC, L = raw.shape
    C = QC // Q
    K = w.shape[-1]

    def run(raw, mult, off, w):
        # block-diagonal (Q*K, Q*C): row q*K+k, col q*C+c = w[c, k]
        eye = jnp.eye(Q, dtype=w.dtype)
        wblk = jnp.einsum("pq,ck->pkqc", eye, w).reshape(Q * K, Q * C)
        rows = _pick_rows(Dq, QC * L * 2 + Q * K * L * 4 + 2 * QC * L * 4)
        call = _seghead_call(N, Dq, QC, Q * K, L, rows, bool(interpret))
        m = jnp.tile(mult.astype(jnp.float32), (1, Q)).reshape(N, 1, QC, 1)
        o = jnp.tile(off.astype(jnp.float32), (1, Q)).reshape(N, 1, QC, 1)
        return call(raw, m, o, wblk.astype(jnp.bfloat16))

    f = jax.custom_vjp(run)

    def fwd(raw, mult, off, w):
        return run(raw, mult, off, w), (raw, mult, off, w)

    def bwd(res, gy):
        _, pullback = jax.vjp(xla_fn, *res)
        return pullback(gy)

    f.defvjp(fwd, bwd)
    return f(raw, mult, off, w)


# --------------------------------------------------------------------------
# seg head v2: pending raw -> norm -> block-diag 1x1 -> SOFTMAX -> bf16
# probs, in ONE pass. The round-9 logits-only kernel (above) lost because
# its f32 output layout broke the downstream softmax-accumulate fusion;
# emitting the PROBS (softmax computed in-kernel, stored bf16) removes
# that boundary entirely: the flip-free TTA sum then just adds 8 bf16
# prob tensors (f32 accumulation) and the (N, Dq, Q*C, L) normalized
# feature tensor is read ONCE from HBM instead of materialized + re-read
# (fusion "seg_head0/convert_element_type": 40.5 ms/volume at bench
# geometry, round-12 sparse profile).
# --------------------------------------------------------------------------

def _seghead_probs_kernel(x_ref, m_ref, o_ref, w_ref, y_ref, yscr, *,
                          rows, Q, K, interpret):
    m, o = m_ref[0, 0], o_ref[0, 0]
    w = w_ref[...]
    if interpret:            # CPU eager dot lacks bf16xbf16->f32; exact
        w = w.astype(jnp.float32)
    for r in range(rows):
        x = x_ref[0, r]                              # (Q*C, L) bf16
        a = x.astype(jnp.float32) * m + o
        a = jnp.maximum(a, a * LRELU_SLOPE)
        a = a.astype(x.dtype)                        # twin: f32 affine->bf16
        if interpret:
            a = a.astype(jnp.float32)
        yscr[...] = jax.lax.dot_general(
            w, a, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)      # (Q*K, L) f32 logits
        # per-block class softmax (jax.nn.softmax semantics: max-subtract,
        # f32). Slices are K-row (K % 8 == 0 gated) reads of the scratch
        # so the big f32 logits never live as one value chain (spill trap).
        for q in range(Q):
            blk = yscr[q * K:(q + 1) * K, :]
            mx = jnp.max(blk, axis=0, keepdims=True)
            e = jnp.exp(blk - mx)
            s = jnp.sum(e, axis=0, keepdims=True)
            y_ref[0, r, q * K:(q + 1) * K, :] = (e / s).astype(y_ref.dtype)


@functools.lru_cache(maxsize=64)
def _seghead_probs_call(N, Dq, QC, Q, K, L, rows, out_dtype, interpret):
    kw = _site_specs(N, Dq, rows, [(QC, L), (QC, 1), (QC, 1), None],
                     (Q * K, L), out_dtype, interpret)
    for i in (1, 2):
        kw["in_specs"][i] = pl.BlockSpec((1, 1, QC, 1),
                                         lambda n, d: (n, 0, 0, 0),
                                         memory_space=pltpu.VMEM)
    kw["scratch_shapes"] = [pltpu.VMEM((Q * K, L), jnp.float32)]
    return pl.pallas_call(
        functools.partial(_seghead_probs_kernel, rows=rows, Q=Q, K=K,
                          interpret=interpret),
        **kw)


def seghead_probs_supported(Q: int, C: int, K: int, L: int, dtype) -> bool:
    """Gate: bf16 stream, lane-aligned rows, sublane-aligned block slices,
    VMEM feasibility (in + out double-buffered + f32 logits scratch)."""
    if jnp.dtype(dtype) != jnp.bfloat16:
        return False
    if L % 128 != 0 or (Q * C) % 8 != 0 or K % 8 != 0:
        return False
    per_row = Q * C * L * 2 + Q * K * L * 2
    return 2 * per_row + Q * K * L * 4 + 4 * Q * C * L * 4 < _VMEM_BUDGET


def seghead_probs_quadrant(raw, mult, off, w, Q: int, xla_fn,
                           out_dtype=jnp.bfloat16,
                           interpret: bool = False):
    """Pending-in quadrant seg head emitting per-block softmax PROBS
    (out_dtype, default bf16): norm+lrelu (f32 affine, bf16 cast — the
    XLA twin's exact order), block-diagonal (Q*K, Q*C) dot with f32
    accumulation, stable per-block softmax in f32, bf16 store. w: (C, K).
    Backward delegates to jax.vjp of the XLA twin. Reference semantics:
    seg_outputs 1x1 conv + inference_apply_nonlin softmax
    (unetpp_d.py:394-401, neural_network.py:207)."""
    N, Dq, QC, L = raw.shape
    C = QC // Q
    K = w.shape[-1]

    def run(raw, mult, off, w):
        eye = jnp.eye(Q, dtype=w.dtype)
        wblk = jnp.einsum("pq,ck->pkqc", eye, w).reshape(Q * K, Q * C)
        rows = _pick_rows(Dq, QC * L * 2 + Q * K * L * 2
                          + Q * K * L * 4 // 2)
        call = _seghead_probs_call(N, Dq, QC, Q, K, L, rows,
                                   jnp.dtype(out_dtype), bool(interpret))
        m = jnp.tile(mult.astype(jnp.float32), (1, Q)).reshape(N, 1, QC, 1)
        o = jnp.tile(off.astype(jnp.float32), (1, Q)).reshape(N, 1, QC, 1)
        return call(raw, m, o, wblk.astype(jnp.bfloat16))

    f = jax.custom_vjp(run)

    def fwd(raw, mult, off, w):
        return run(raw, mult, off, w), (raw, mult, off, w)

    def bwd(res, gy):
        _, pullback = jax.vjp(xla_fn, *res)
        return pullback(gy)

    f.defvjp(fwd, bwd)
    return f(raw, mult, off, w)
