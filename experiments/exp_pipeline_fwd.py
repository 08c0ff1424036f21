"""Does Mosaic overlap the VPU shift-assembly with the MXU dots if we
software-pipeline the fused forward kernel?

The round-6 sliding profile puts the five 2-part level-0 nest kernels at
~1.65 ms/pass each vs a ~0.88 ms flop floor; per-step budget says the gap
is the affine-normalize + shift assembly (VPU) serializing with the dots
(MXU). Variant B double-buffers sref and reorders each grid step to
  dots(d) from sref[d%2]  ->  assemble sref[(d+1)%2] for d+1
so the assembly for the NEXT step has no data dependency on this step's
dots and Mosaic's scheduler may interleave the pipelines.

Run: env PYTHONPATH=/root/repo:/root/.axon_site python -u experiments/exp_pipeline_fwd.py
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

from e2enet_tpu.ops import qfused
from e2enet_tpu.ops.qfused import (HALO, LRELU_SLOPE, QStatic, _arrange_w,
                                   make_tables, quadrant_colmask)
from e2enet_tpu.ops.shift import group_shifts


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _pipe_kernel(*refs, tables, static, n_aff, out_dtype):
    s = static
    P = len(s.part_channels)
    idx = 0
    xs = refs[idx:idx + P]; idx += P
    w_ref = refs[idx]; idx += 1
    b_ref = refs[idx]; idx += 1
    cm_ref = refs[idx]; idx += 1
    aff_refs = refs[idx:idx + 2 * n_aff]; idx += 2 * n_aff
    o_y = refs[idx]; idx += 1
    o_stats = refs[idx]; idx += 1
    rings = refs[idx:idx + P]; idx += P
    sref = refs[idx]; idx += 1          # (2, QC, L + 2*HALO)
    st_acc = refs[idx]; idx += 1
    sem = refs[idx]; idx += 1

    n = pl.program_id(0)
    d = pl.program_id(1)
    L = s.Hq * s.Wqp
    Q = s.q[0] * s.q[1] * s.q[2]
    CO = s.CO
    mdd = tables.max_dd
    nslot = 2 * mdd + 3      # assembly runs one step ahead -> one more live

    def slot(src_d):
        return jax.lax.rem(src_d + 4 * nslot, nslot)

    def start_fetch(src_d):
        sl = slot(src_d)
        inb = (src_d >= 0) & (src_d < s.Dq)

        @pl.when(inb)
        def _():
            for p in range(P):
                pltpu.make_async_copy(xs[p].at[n, src_d], rings[p].at[sl],
                                      sem.at[p]).start()

        @pl.when(jnp.logical_not(inb))
        def _():
            for p in range(P):
                rings[p][sl] = jnp.zeros_like(rings[p][sl])

    def wait_fetch(src_d):
        sl = slot(src_d)
        inb = (src_d >= 0) & (src_d < s.Dq)

        @pl.when(inb)
        def _():
            for p in range(P):
                pltpu.make_async_copy(xs[p].at[n, src_d], rings[p].at[sl],
                                      sem.at[p]).wait()

    aff_idx = []
    ai = 0
    for p in range(P):
        aff_idx.append(ai if s.part_affine[p] else None)
        ai += 1 if s.part_affine[p] else 0

    def assemble(dst, for_d):
        """Build sref[dst] for output step for_d (traced value)."""
        for e in tables.copies:
            row = rings[e.part][slot(for_d + e.dd)][e.src_lo:e.src_hi, :]
            if e.aff_lo >= 0:
                la = e.src_hi - e.src_lo
                m = aff_refs[2 * aff_idx[e.part]][n,
                                                  e.aff_lo:e.aff_lo + la, :]
                o = aff_refs[2 * aff_idx[e.part] + 1][
                    n, e.aff_lo:e.aff_lo + la, :]
                dv = ((for_d + e.dd >= 0)
                      & (for_d + e.dd < s.Dq)).astype(jnp.float32)
                a = row.astype(jnp.float32) * m + o
                a = jnp.maximum(a, a * LRELU_SLOPE) * (dv * cm_ref[...])
                row = a.astype(row.dtype)
            sref[dst, e.dst_lo:e.dst_lo + (e.src_hi - e.src_lo),
                 HALO:HALO + L] = row

    @pl.when((n == 0) & (d == 0))
    def _():
        sref[...] = jnp.zeros_like(sref)

    @pl.when(d == 0)
    def _():
        # fetch everything assembly(0) and assembly(1) need, assemble(0)
        for src in range(-mdd, mdd + 1):
            start_fetch(jnp.int32(src))
            wait_fetch(jnp.int32(src))
        start_fetch(jnp.int32(mdd + 1))
        assemble(0, jnp.int32(0))

    # steady state: rings for d+1+mdd were started last step
    wait_fetch(d + mdd + 1)
    start_fetch(d + mdd + 2)

    cur = jax.lax.rem(d, 2)
    nxt = jax.lax.rem(d + 1, 2)

    # ---- dots for step d from the buffer assembled LAST step
    for out_lo, dots in tables.out_dots:
        acc = (b_ref[out_lo:out_lo + CO].astype(jnp.float32)[:, None]
               * cm_ref[...])
        for e in dots:
            K = e.k_hi - e.k_lo
            a = sref[cur, e.k_lo:e.k_hi, HALO + e.off:HALO + e.off + L]
            acc = acc + jax.lax.dot_general(
                w_ref[e.w_lo:e.w_lo + K, :], a,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        acc = acc * cm_ref[...]
        o_y[0, 0, out_lo:out_lo + CO] = acc.astype(out_dtype)
        s1 = jnp.sum(acc, axis=1, keepdims=True)
        s2 = jnp.sum(acc * acc, axis=1, keepdims=True)

        @pl.when(d == 0)
        def _(out_lo=out_lo, s1=s1, s2=s2):
            st_acc[out_lo:out_lo + CO, 0:1] = s1
            st_acc[out_lo:out_lo + CO, 1:2] = s2

        @pl.when(d != 0)
        def _(out_lo=out_lo, s1=s1, s2=s2):
            st_acc[out_lo:out_lo + CO, 0:1] += s1
            st_acc[out_lo:out_lo + CO, 1:2] += s2

    # ---- assembly for step d+1 (independent of this step's dots)
    @pl.when(d + 1 < s.Dq)
    def _():
        assemble(nxt, d + 1)

    @pl.when(d == s.Dq - 1)
    def _():
        o_stats[0] = st_acc[...]


def pipelined_forward(parts, w_log, b, affines, static: QStatic):
    s = static
    tables = make_tables(s)
    Q = s.q[0] * s.q[1] * s.q[2]
    N = parts[0].shape[0]
    L = s.Hq * s.Wqp
    C_tot = sum(s.part_channels)
    n_aff = sum(s.part_affine)
    dtype = parts[0].dtype

    w_arr = _arrange_w(w_log, tables.w_index, C_tot, s.CO).astype(dtype)
    b_q = jnp.tile(b.astype(dtype), Q)
    cm = quadrant_colmask(s.Hq, s.Wq, s.Wqp)

    kfn = functools.partial(_pipe_kernel, tables=tables, static=s,
                            n_aff=n_aff, out_dtype=dtype)
    in_specs = ([pl.BlockSpec(memory_space=pltpu.HBM)] * len(parts)
                + [pl.BlockSpec(memory_space=pltpu.VMEM)] * (3 + 2 * n_aff))
    out_specs = (pl.BlockSpec((1, 1, Q * s.CO, L), lambda n, d: (n, d, 0, 0),
                              memory_space=pltpu.VMEM),
                 pl.BlockSpec((1, Q * s.CO, 2), lambda n, d: (n, 0, 0),
                              memory_space=pltpu.VMEM))
    out_shape = (jax.ShapeDtypeStruct((N, s.Dq, Q * s.CO, L), dtype),
                 jax.ShapeDtypeStruct((N, Q * s.CO, 2), jnp.float32))

    nslot = 2 * tables.max_dd + 3
    scratch = ([pltpu.VMEM((nslot, Q * cp, L), dtype)
                for cp in s.part_channels]
               + [pltpu.VMEM((2, Q * C_tot, L + 2 * HALO), dtype),
                  pltpu.VMEM((Q * s.CO, 2), jnp.float32),
                  pltpu.SemaphoreType.DMA((len(parts),))])

    affs = []
    for p, a in enumerate(affines):
        if a is not None:
            affs += [a[0].astype(jnp.float32)[..., None],
                     a[1].astype(jnp.float32)[..., None]]
    return pl.pallas_call(
        kfn,
        grid=(N, s.Dq),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=127 * 2 ** 20),
        cost_estimate=pl.CostEstimate(
            flops=2 * N * s.Dq * L * 9 * Q * C_tot * s.CO,
            bytes_accessed=N * s.Dq * L * Q * (C_tot + s.CO) * 2,
            transcendentals=0),
    )(*parts, w_arr, b_q, cm, *affs)


def chained(fn, xs, reps=32):
    def body(c, _):
        y, stats = fn(*c[:len(xs)])
        bump = (stats[0, 0, 0] * 0).astype(c[0].dtype)
        return tuple(x + bump for x in c), stats[0, 0, 0]
    f = jax.jit(lambda *c: jax.lax.scan(
        lambda cc, _: body(cc, None), c, None, length=reps)[1])
    r = f(*xs); np.asarray(r)
    t0 = time.perf_counter()
    r = f(*xs); np.asarray(r)
    return (time.perf_counter() - t0) / reps * 1000


def main():
    q = (2, 2, 2)
    Dq, Hq, Wq, Wqp = 64, 64, 64, 66
    C, CO = 48, 48
    parts_ch = (C, C)
    groups = tuple(group_shifts(2 * C, 5))
    s = QStatic(q, parts_ch, (True, True), groups, Dq, Hq, Wq, Wqp, CO,
                True, False)

    rng = np.random.RandomState(0)
    L = Hq * Wqp
    Q = 8
    mk = lambda *sh: jnp.asarray(rng.randn(*sh).astype(np.float32) * 0.3,
                                 jnp.bfloat16)
    parts = [mk(1, Dq, Q * C, L) for _ in range(2)]
    w = mk(3, 3, 2 * C, CO).astype(jnp.float32)
    b = jnp.asarray(rng.randn(CO).astype(np.float32) * 0.1)
    affines = [(jnp.asarray(rng.rand(1, C).astype(np.float32) + 0.5),
                jnp.asarray(rng.randn(1, C).astype(np.float32) * 0.2))
               for _ in range(2)]

    base = jax.jit(lambda *a: qfused.quadrant_fused_block(
        list(a[:2]), a[2].astype(jnp.bfloat16), a[3].astype(jnp.bfloat16),
        [(a[4], a[5]), (a[6], a[7])], q, Hq, Wq,
        shift_size=5, do_shift=True))
    pipe = jax.jit(lambda *a: pipelined_forward(
        list(a[:2]), a[2], a[3], [(a[4], a[5]), (a[6], a[7])], s))

    args = (*parts, w, b, affines[0][0], affines[0][1],
            affines[1][0], affines[1][1])
    log("compiling baseline...")
    yb, sb = base(*args)
    yb = np.asarray(yb, np.float32)
    log("compiling pipelined...")
    yp, sp = pipe(*args)
    yp = np.asarray(yp, np.float32)
    err = np.abs(yb - yp).max()
    log(f"parity max abs err {err:.3e} (scale {np.abs(yb).max():.3e})")
    serr = np.abs(np.asarray(sb) - np.asarray(sp)).max()
    log(f"stats abs err {serr:.3e}")

    tb = chained(base, args)
    tp = chained(pipe, args)
    log(f"baseline {tb:.3f} ms   pipelined {tp:.3f} ms   "
        f"speedup {tb / tp:.2f}x")


if __name__ == "__main__":
    main()
