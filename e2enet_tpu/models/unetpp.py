"""ShiftUNetPlusPlus — the E2ENet network, TPU-native.

A UNet++ dense-nest topology where every conv is a shifted (1,3,3) conv
(depth-shift + batched 2D conv on the MXU), encoder pooling is convolutional
(strided first conv per stage), nest upsampling is transposed conv with
kernel == stride (a matmul here), and nest down links are max pools.

Reference parity: Generic_UNetPlusPlus (unetpp_d.py:210-591). The reference
hard-codes num_pool == 5 in __init__/forward (loc0..loc4, 6 context stages,
unetpp_d.py:380-389,447-488); here the nest is generated for any num_pool —
for num_pool == 5 the topology, channel counts and node wiring match the
reference exactly.

Node grammar (num_pool = P): encoder outputs x(i, 0) at level i (level 0 =
full resolution, level P = bottleneck). Nest node x(i, j) for j >= 1,
i + j <= P fuses
    concat[ x(i, j-1), transpconv(x(i+1, j-1)), maxpool(x(i-1, j-1)) ]
(the maxpool "dense feature fusion" input only when i > 0; reference forward
unetpp_d.py:447-488). Reference index mapping: x(i, j) = loc{P-i-j}[j-1].
Deep-supervision heads sit on x(0,P), x(1,P-1), x(2,P-2), x(3,P-3)
(unetpp_d.py:394-401,480-483).
"""
from typing import Any, Dict, List, NamedTuple, Optional, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.blocks import (SegHead, StackedConvBlocks, TranspConv, max_pool)

MAX_NUM_FILTERS_3D = 320


class Pending(NamedTuple):
    """A fused-block output whose instance norm + leaky-relu has NOT been
    applied: consumers apply it on load (ops/fused_block.py). Layout is
    padded channels-first flat (N, D, C, H*Wp)."""
    raw: jnp.ndarray      # conv output, unnormalized
    stats: jnp.ndarray    # (N, C, 2) accumulated (sum, sumsq)
    scale: jnp.ndarray    # (C,) norm_scale param
    nbias: jnp.ndarray    # (C,) norm_bias param


class QPending(NamedTuple):
    """Pending output of a QUADRANT fused block (ops/qfused.py): level-0
    data stored in level-1 geometry with Q = prod(pools[0]) times the
    channels, (N, Dq, Q*C, Hq*Wqp); stats are per PHYSICAL row."""
    raw: jnp.ndarray
    stats: jnp.ndarray    # (N, Q*C, 2)
    scale: jnp.ndarray
    nbias: jnp.ndarray


def encoder_channels(base: int, num_pool: int, max_features: int,
                     feat_mul: int = 2) -> List[int]:
    """Output channels per level 0..num_pool (incl. bottleneck)."""
    return [min(base * feat_mul ** d, max_features)
            for d in range(num_pool + 1)]


class ShiftUNetPlusPlus(nn.Module):
    input_channels: int
    num_classes: int
    pool_op_kernel_sizes: Tuple[Tuple[int, int, int], ...]
    base_num_features: int = 48
    max_num_features: int = MAX_NUM_FILTERS_3D
    num_conv_per_stage: int = 2
    shift_size: int = 5
    do_shift: bool = True
    conv_kernel: Tuple[int, int, int] = (1, 3, 3)
    dense_fusion: bool = True      # the maxpool down links (DSFF substrate)
    remat: bool = True             # rematerialize conv blocks in backward
    compute_dtype: Any = jnp.bfloat16
    # architectural-variant knobs (norm/activation trainer zoo,
    # nnUNet_variants/architectural_variants — BN/GN/FRN, ReLU/Mish).
    # Non-default values force the XLA path (fused kernels bake IN+lrelu).
    norm_op: str = "instance"
    nonlin: str = "lrelu"
    nonlin_before_norm: bool = False    # ConvDropoutNonlinNorm variants
    seg_bias: bool = False              # *_biasInSegOutput variants
    # fused=True: run stride-1 conv blocks through the Pallas fused kernel
    # (ops/fused_block.py) at every level where it is supported; normalized
    # activations are then never materialized (consumers apply norm+lrelu on
    # load) and nest concats never built. Parameter tree is identical to the
    # XLA path. fused_interpret runs the kernels in interpret mode (CPU
    # tests).
    fused: bool = False
    fused_interpret: bool = False
    # finest level index allowed to fuse (0 = full resolution). Deeper
    # levels have tiny depth-rows where per-step kernel overhead loses to
    # XLA; levels 0-1 carry ~95% of the compute.
    fused_max_level: int = 1
    # store level-0 tensors in level-1 geometry with prod(pools[0]) x the
    # channels (space-to-depth) and run level 0 through the quadrant fused
    # kernels (ops/qfused.py): kills the transpconv depth-to-space relayout,
    # turns nest down-links into block-max, K-merges the conv dots.
    # Default ON as of round 4: with the quadrant-native sliding-window
    # TTA (quadrant_logits) it measures 13.41 patches/s vs 11.52 for the
    # plain fused path (PERF_NOTES.md round-4 table). Hardware grad parity
    # for the quadrant backward: experiments/logs/grad_parity_tpu_round4.
    quadrant: bool = True
    # with quadrant on and do_ds=False, return the full-res logits in
    # quadrant CF form (N, Dq, Q*K, Hq*Wqp) — consumers (ops/sliding) run
    # the TTA unflip + softmax in quadrant space and de-quadrantize once
    # per tile. Rank tells them apart (4 vs 5).
    quadrant_logits: bool = False
    # full-res (D, H, W) the model may ALSO be fed pre-quadrantized: a
    # rank-4 (N, Dq, Q*Cin, Hq*Wqp) input (Wqp = choose_wqp) skips the
    # internal to_quadrant_cf — the sliding-window TTA quadrantizes once
    # per tile and mirrors the input in quadrant space instead of paying
    # the quadrantize relayout on every mirror pass (ops/sliding).
    # Rank-5 inputs still work (training, init). None = rank-5 only.
    quadrant_input: Optional[Tuple[int, int, int]] = None
    # mirrored-equivalent model (flip-free mirror TTA): net(x, flips=c) ==
    # flip_c(net(flip_c(x))) EXACTLY, with no data flips anywhere — every
    # conv/shift/transpconv/fused kernel computes its mirrored variant
    # (ops/blocks, ops/fused_block, ops/qfused, ops/qstride); norms,
    # nonlins, k==s max pools, 1x1 heads and the quadrant relayouts are
    # flip-equivariant and unchanged. Parameters are IDENTICAL across
    # flip variants (net.clone(flips=...) shares the checkpoint). The
    # sliding-window TTA (ops/sliding) runs one statically-mirrored apply
    # per mirror pass instead of flipping data (reference flips per pass,
    # neural_network.py:529-563).
    flips: Tuple[bool, bool, bool] = (False, False, False)
    # DSFF row-sparse inference plan (models/sparse_plan.build_sparse_plan):
    # a STATIC tuple of ("loc{z}_{k}[ _final]/block{i}" | "up{z}_{k}",
    # alive-channel tuple) pairs derived from a row-structured DSFF mask at
    # checkpoint load. Masked convs then contract only their alive input
    # rows (dead rows carry w == 0 — exact up to summation order), chained
    # up-links / intra-stack convs never compute dead channels at all, and
    # the fused/quadrant kernels run with density x fewer K rows — the
    # MXU FLOP cut the reference's unstructured masks cannot deliver.
    # None = dense (also the only option for kernel-pair-granular masks,
    # which have no machine-exploitable structure — see training/dsff.py).
    sparse_plan: Optional[Tuple[Tuple[str, Tuple[int, ...]], ...]] = None
    # head_probs_dtype: fuse the class softmax into the quadrant seg head
    # and emit PROBS in this dtype (bf16) instead of f32 logits (only
    # takes effect for the quadrant_logits do_ds=False head; see
    # ops/blocks.SegHead.emit_probs_dtype). The sliding-window flip-free
    # TTA detects the non-f32 head output and skips its own softmax.
    # None (default) = exact f32 logits everywhere.
    head_probs_dtype: Optional[Any] = None

    @property
    def num_pool(self) -> int:
        return len(self.pool_op_kernel_sizes)

    @property
    def input_shape_must_be_divisible_by(self) -> np.ndarray:
        return np.prod(np.array(self.pool_op_kernel_sizes), 0)

    def num_ds_outputs(self) -> int:
        return min(4, self.num_pool)

    def _check_divisible(self, x):
        div = self.input_shape_must_be_divisible_by
        spatial = x.shape[1:4]
        if any(int(s) % int(d) != 0 for s, d in zip(spatial, div)):
            raise ValueError(
                f"input spatial shape {tuple(spatial)} must be divisible by "
                f"{tuple(int(d) for d in div)} (pool kernels "
                f"{self.pool_op_kernel_sizes})")

    @nn.compact
    def __call__(self, x, do_ds: bool = True):
        pre_q = x.ndim == 4
        if pre_q:
            assert self.quadrant_input is not None, (
                "rank-4 (pre-quadrantized) input requires quadrant_input="
                "(D, H, W)")
        else:
            self._check_divisible(x)
        P = self.num_pool
        pools = [tuple(p) for p in self.pool_op_kernel_sizes]
        enc = encoder_channels(self.base_num_features, P,
                               self.max_num_features)
        cd = self.compute_dtype
        x = x.astype(cd)

        common = dict(shift_size=self.shift_size, do_shift=self.do_shift,
                      kernel=self.conv_kernel, compute_dtype=cd,
                      norm_op=self.norm_op, nonlin=self.nonlin,
                      nonlin_before_norm=self.nonlin_before_norm,
                      flips=tuple(self.flips))
        # remat: store only block boundaries for the backward pass — the
        # full-res activations of every shift/conv/norm intermediate would
        # not fit in HBM at production patch sizes (jax.checkpoint)
        Stack = (nn.remat(StackedConvBlocks, static_argnums=())
                 if self.remat else StackedConvBlocks)

        # ---------------- fused-layout machinery (ops/fused_block.py)
        from ..ops.fused_block import (apply_norm_lrelu_cf, choose_wp,
                                       from_padded_cf, fused_block_supported,
                                       norm_affine_from_stats, pooled_part_cf,
                                       to_padded_cf)
        from ..ops.qfused import (choose_wqp, from_quadrant_cf,
                                  quadrant_apply_norm_lrelu,
                                  quadrant_block_max_cf,
                                  quadrant_block_max_cl, quadrant_colmask,
                                  quadrant_norm_affine, quadrant_supported,
                                  to_quadrant_cf)

        level_size: List[Tuple[int, int, int]] = [
            tuple(int(s) for s in self.quadrant_input) if pre_q
            else tuple(int(s) for s in x.shape[1:4])]
        for p in pools:
            level_size.append(tuple(int(s) // int(k)
                                    for s, k in zip(level_size[-1], p)))
        # one Wp per level, divisible by the W-stride of the transposed conv
        # feeding it so upsampled tensors are emitted directly in the padded
        # layout (see blocks.transp_conv_matmul_cf)
        level_wp: List[int] = []
        for i, (dd, hh, ww) in enumerate(level_size):
            mult = pools[i][2] if i < P else 1
            try:
                level_wp.append(choose_wp(hh, ww, mult))
            except AssertionError:
                level_wp.append(0)      # level unusable for fusion

        default_norm = (self.norm_op == "instance"
                        and self.nonlin == "lrelu"
                        and not self.nonlin_before_norm)

        def fused_ok(i, part_channels, co):
            if not self.fused or self.conv_kernel != (1, 3, 3) \
                    or not default_norm:
                return False
            if i > self.fused_max_level or level_wp[i] == 0:
                return False
            if cd not in (jnp.bfloat16, jnp.float32) \
                    and not self.fused_interpret:
                return False
            _, H, W = level_size[i]
            return fused_block_supported(
                part_channels, H, W, co,
                itemsize=jnp.dtype(cd).itemsize)

        # ---------------- quadrant (space-to-depth) level 0
        q0 = pools[0]
        Q0 = int(np.prod(q0))
        Hq0, Wq0 = level_size[1][1], level_size[1][2]
        use_quad = (self.fused and self.quadrant and default_norm
                    and self.conv_kernel == (1, 3, 3)
                    and Q0 > 1 and all(k in (1, 2) for k in q0)
                    and (cd == jnp.bfloat16 or self.fused_interpret))
        wqp0 = 0
        if use_quad:
            try:
                wqp0 = choose_wqp(Hq0, Wq0)
            except AssertionError:
                use_quad = False
        if pre_q:
            assert use_quad and quadrant_supported(
                q0, (self.input_channels,), Hq0, Wq0, enc[0]), (
                "pre-quadrantized input requires the level-0 quadrant path")

        def quad_ok(part_channels, co):
            return (use_quad
                    and quadrant_supported(q0, part_channels, Hq0, Wq0, co))

        def q_affine_of(v: QPending):
            return quadrant_norm_affine(v.stats, Q0, n_vox(0), v.scale,
                                        v.nbias)

        def q_as_part(v):
            """(quadrant tensor, pending_affine) for quadrant consumption."""
            if isinstance(v, QPending):
                return v.raw, q_affine_of(v)
            return to_quadrant_cf(as_cl(v, 0), q0, wqp0), None

        def n_vox(i):
            d, h, w = level_size[i]
            return d * h * w

        def affine_of(v: Pending, i):
            return norm_affine_from_stats(v.stats, n_vox(i), v.scale,
                                          v.nbias)

        def as_part(v, i):
            """(cf_tensor, pending_affine_or_None) for fused consumption."""
            if isinstance(v, Pending):
                return v.raw, affine_of(v, i)
            _, H, W = level_size[i]
            if isinstance(v, QPending):     # quadrant -> plain CF fallback
                v = as_cl(v, i)
            return to_padded_cf(v, W, level_wp[i]), None

        def as_cl(v, i):
            """Materialize channels-last (one affine+lrelu+relayout pass)."""
            if isinstance(v, QPending):
                mult, off = q_affine_of(v)
                y = quadrant_apply_norm_lrelu(v.raw, mult, off)
                # padding columns hold lrelu(off) garbage; the slice in
                # from_quadrant_cf drops them
                return from_quadrant_cf(y, q0, Hq0, Wq0, mult.shape[-1])
            if not isinstance(v, Pending):
                return v
            _, H, W = level_size[i]
            Wp = int(v.raw.shape[3]) // H
            lane = np.arange(H * Wp) % Wp
            colmask = jnp.asarray((lane < W).astype(np.float32))
            mult, off = affine_of(v, i)
            y = apply_norm_lrelu_cf(v.raw, mult, off, colmask)
            return from_padded_cf(y, H, W)

        # ---------------- encoder (convolutional pooling: strided 1st conv)
        nodes: Dict[Tuple[int, int], Any] = {}
        h = x
        for d in range(P):
            stride = pools[d - 1] if d > 0 else (1, 1, 1)
            cin = (self.input_channels if d == 0 else enc[d - 1])
            if d == 0 and quad_ok((cin,), enc[0]):
                if pre_q:
                    assert int(x.shape[3]) == Hq0 * wqp0, (
                        f"pre-quadrantized input lanes {x.shape[3]} != "
                        f"Hq*Wqp {Hq0}*{wqp0}")
                xq = x if pre_q else to_quadrant_cf(x, q0, wqp0)
                out = StackedConvBlocks(
                    features=enc[0], num_convs=self.num_conv_per_stage,
                    fused=True, fused_hw=(Hq0, Wq0), fused_q=q0,
                    fused_interpret=self.fused_interpret,
                    name="context0", **common)(([xq], [None]))
                h = QPending(*out)
            elif stride == (1, 1, 1) and fused_ok(d, (cin,), enc[d]):
                _, H, W = level_size[d]
                part, aff = as_part(as_cl(h, d) if not isinstance(h, Pending)
                                    else h, d)
                # no remat around fused stacks (see node remat note)
                out = StackedConvBlocks(
                    features=enc[d], num_convs=self.num_conv_per_stage,
                    fused=True, fused_hw=(H, W),
                    fused_interpret=self.fused_interpret,
                    name=f"context{d}", **common)(([part], [aff]))
                h = Pending(*out)
            elif (d == 1 and isinstance(h, QPending)
                  and stride == tuple(q0)
                  and fused_ok(1, (enc[1],), enc[1])):
                # leave the quadrant level natively: block0 = depth shift +
                # strided conv as block algebra on the quadrant tensor —
                # one Pallas kernel with norm-on-load (ops/qstride.py; XLA
                # fallback ops/qfused.quadrant_strided_shift_conv) — no
                # full-res de-quadrantize + shift-select round trip, no
                # norm materializer
                out = StackedConvBlocks(
                    features=enc[1], num_convs=self.num_conv_per_stage,
                    fused=True,
                    fused_hw=(level_size[1][1], level_size[1][2]),
                    fused_interpret=self.fused_interpret,
                    q_transition=(tuple(q0), Hq0, Wq0, level_wp[1]),
                    name="context1", **common)(([h.raw], [q_affine_of(h)]))
                h = Pending(*out)
            else:
                h = Stack(features=enc[d],
                          num_convs=self.num_conv_per_stage,
                          first_stride=stride,
                          name=f"context{d}", **common)(as_cl(h, d - 1
                                                              if d else 0))
            nodes[(d, 0)] = h
        # bottleneck: (num_conv_per_stage - 1) strided convs + 1 conv
        # (unetpp_d.py:365-371)
        h = Stack(features=enc[P],
                              num_convs=self.num_conv_per_stage - 1,
                              first_stride=pools[P - 1],
                              name=f"context{P}a", **common)(as_cl(h, P - 1))
        h = Stack(features=enc[P], num_convs=1,
                              name=f"context{P}b", **common)(h)
        nodes[(P, 0)] = h

        # ---------------- dense nest
        # each node (transpconv + implicit concat + fusion convs) is ONE
        # remat unit: only the node outputs (the x-grid) are kept for the
        # backward pass; up/concat/conv intermediates are recomputed
        def node_parts(i, has_above):
            return ((enc[i], enc[i]) if not has_above
                    else (enc[i], enc[i], enc[i - 1]))

        def up_fn(mdl, below, z, k, i, cf, sparse_kw=()):
            # cf: False = channels-last, True = padded CF, "quad" = quadrant
            # quadrant up-link from a PENDING below: norm+lrelu on the fly
            # inside the block-column GEMM — no CL materialization, no pad,
            # no layout-hop copies (the round-8 profile's largest glue)
            pend_q = (cf == "quad" and isinstance(below, Pending)
                      and int(below.raw.shape[3])
                      == level_size[i + 1][1] * wqp0)
            up_mod = TranspConv(features=enc[i], stride=pools[i],
                                compute_dtype=cd, flips=tuple(self.flips),
                                cf_out=((level_size[i][1], level_size[i][2],
                                         level_wp[i]) if cf is True
                                        else None),
                                q_out=(wqp0 if cf == "quad" else None),
                                q_in_hw=((level_size[i + 1][1],
                                          level_size[i + 1][2])
                                         if pend_q else None),
                                interpret=self.fused_interpret,
                                # pend_q up-links stay LAZY: the consuming
                                # quadrant kernel computes the GEMM on DMA
                                # arrival (falls back internally if the
                                # geometry/dtype/VMEM gate rejects)
                                lazy=pend_q,
                                **dict(sparse_kw),
                                name=f"up{z}_{k}", parent=mdl)
            if pend_q:
                mult, off = affine_of(below, i + 1)
                return up_mod((below.raw, mult, off))
            return up_mod(as_cl(below, i + 1))

        # fused nodes are NOT remat-wrapped: the fused op's custom-VJP
        # residuals are its inputs and output, which the nest keeps anyway —
        # replaying the kernels in the backward would only cost time. Only
        # the up-link (transpconv + materialization) is rematerialized.
        up_remat = (nn.remat(up_fn, static_argnums=(2, 3, 4, 5, 6))
                    if self.remat else up_fn)

        def down_link_cl(above, i):
            """Channels-last pooled down link from x(i-1, j-1)."""
            if isinstance(above, QPending):
                # the pool window IS the quadrant factors: block-max
                # (channel count from the affine — compact under the
                # sparse plan's emit-union output pruning)
                multq, offq = q_affine_of(above)
                return quadrant_block_max_cl(above.raw, multq, offq, q0,
                                             Hq0, Wq0,
                                             int(multq.shape[-1]))
            if isinstance(above, Pending):
                # norm+pool+CL in ONE pass over the pending raw (no as_cl
                # materialization + layout copy before the reduce)
                from ..ops.fused_block import pooled_cl_from_cf
                _, Hs, Ws = level_size[i - 1]
                mult, off = affine_of(above, i - 1)
                return pooled_cl_from_cf(above.raw, mult, off, Hs, Ws,
                                         pools[i - 1])
            return max_pool(as_cl(above, i - 1), pools[i - 1])

        # -------- DSFF row-sparse plan lookup (see sparse_plan attr)
        plan = dict(self.sparse_plan) if self.sparse_plan else {}

        def pad8(alive, full):
            """Pad an alive set to a multiple of 8 (MXU sublane tile) with
            dead channels — their weights are 0, so this is exact and only
            aligns the contraction rows."""
            alive = sorted(int(c) for c in alive)
            # at least 8 rows (an all-dead part still contributes exact
            # zeros through 8 zero-weight channels — keeps parts non-empty)
            want = min(max(-(-len(alive) // 8) * 8, 8), full)
            dead = (c for c in range(full) if c not in set(alive))
            while len(alive) < want:
                alive.append(next(dead))
            return tuple(sorted(alive))

        # -------- emit-union output compaction: each nest node emits only
        # the UNION of its consumers' alive input rows (sparse_out on its
        # last stack). Consumers take the compact tensor as-is and gather
        # only their WEIGHT rows to union order at trace time — rows in
        # the union a consumer doesn't need carry w == 0 (mask invariant),
        # so this is exact. Kills the full-width (Q*C-row) node outputs
        # the round-10 sparse profile showed dominating (dense output DMA
        # + the S(1) copies riding on them), plus every full-volume input
        # gather between nest nodes.
        n_heads_built = self.num_ds_outputs()

        def emit_union(i, j):
            """Alive-channel union x(i,j)'s consumers need, pad8'ed, or
            None when the output must stay dense (a consumer is unmasked /
            a seg head reads it / everything is alive)."""
            if not plan or j == 0:
                return None       # encoders/stem handled separately
            if j == P - i and i < n_heads_built:
                return None       # seg head consumes ALL channels
            needs = set()
            if j + 1 <= P - i:                    # same-part consumer
                a = plan.get(f"loc{P - i - (j + 1)}_{j}/block0")
                if a is None:
                    return None
                needs.update(c for c in a if c < enc[i])
            if i > 0 and j + 1 <= P - (i - 1):    # up-link consumer
                a = plan.get(f"up{P - (i - 1) - (j + 1)}_{j}")
                if a is None:
                    return None
                needs.update(a)
            if self.dense_fusion and j + 1 <= P - (i + 1):  # down consumer
                a = plan.get(f"loc{P - (i + 1) - (j + 1)}_{j}/block0")
                if a is None:
                    return None
                off2 = 2 * enc[i + 1]
                needs.update(c - off2 for c in a if c >= off2)
            u = pad8(needs or {0}, enc[i])
            return None if len(u) >= enc[i] else u

        emits: Dict[Tuple[int, int], Optional[Tuple[int, ...]]] = {}
        for jj in range(1, P + 1):
            for ii in range(P - jj, -1, -1):
                emits[(ii, jj)] = emit_union(ii, jj)

        def node_sparse(z, k, i, part_channels):
            """Per-node sparse wiring: (stack kwargs for loc{z}_{k},
            up sparse kwargs, final-stack alive rows or None,
            this node's emit union or None)."""
            j = k + 1
            alive = plan.get(f"loc{z}_{k}/block0")
            out_union = emits.get((i, j))
            # producers of this node's input parts (compact when pruned)
            same_u = emits.get((i, j - 1))
            below_u = emits.get((i + 1, j - 1))
            above_u = emits.get((i - 1, j - 1))
            up_kw = {}
            if below_u is not None:
                # below emitted compact: contract its full union (extra
                # rows have zero kernel rows — exact), kernel-row gather
                # only
                up_kw.update(sparse_in=below_u, sparse_in_compact=True,
                             sparse_in_full=enc[i + 1 if i < P else P])
            elif plan.get(f"up{z}_{k}") is not None:
                up_kw["sparse_in"] = pad8(plan[f"up{z}_{k}"],
                                          enc[i + 1 if i < P else P])
            fin0 = plan.get(f"loc{z}_{k}_final/block0")
            fin = pad8(fin0, enc[i]) if fin0 is not None else None
            if alive is None:
                assert same_u is None and above_u is None, \
                    "pruned producer feeding an unmasked consumer"
                stack_kw = {} if fin is None else dict(sparse_out=fin)
                return stack_kw, up_kw, fin, out_union
            off = np.cumsum([0] + list(part_channels))
            alive = np.asarray(alive, np.int64)
            producer_u = (same_u, None, above_u)
            per_part, compact = [], []
            for p in range(len(part_channels)):
                own = tuple(int(c - off[p]) for c in alive
                            if off[p] <= c < off[p + 1])
                if p == 1:
                    # the up part is emitted compact by TranspConv's
                    # output-column prune (exactly this node's alive rows)
                    ua = pad8(own, part_channels[p])
                    if len(ua) < part_channels[p]:
                        up_kw["sparse_out"] = ua
                    per_part.append(ua)
                    compact.append(len(ua) < part_channels[p])
                elif producer_u[p] is not None:
                    # producer emitted its consumer union compact: take it
                    # as-is; this conv's dead rows within it are zero
                    assert set(own) <= set(producer_u[p])
                    per_part.append(producer_u[p])
                    compact.append(True)
                elif i <= max(0, self.fused_max_level):
                    # DENSE producer (encoder/stem or a dense-emitting
                    # node) feeding a fused/quadrant kernel: keep the
                    # FULL part and contract its dead rows with their
                    # zero kernel rows instead of gathering the
                    # activations. The gather on a full (Q*C, L) tensor
                    # costs ~0.7 ms/call in S(1) layout copies (round-11
                    # sparse trace: ~42 ms/volume on the encoder-fed
                    # part alone) while the extra MXU rows cost ~0.04 ms
                    # — the FLOP cut only pays when the producer already
                    # emits compact. Deeper (XLA-path) levels keep the
                    # gather: XLA fuses it into the small convs.
                    per_part.append(tuple(range(part_channels[p])))
                    compact.append(False)
                else:
                    per_part.append(pad8(own, part_channels[p]))
                    compact.append(False)
            stack_kw = dict(sparse_in=tuple(per_part),
                            sparse_in_full=tuple(part_channels),
                            sparse_compact=tuple(compact))
            chain = tuple(
                (pad8(plan[f"loc{z}_{k}/block{b}"], enc[i])
                 if plan.get(f"loc{z}_{k}/block{b}") is not None else None)
                for b in range(self.num_conv_per_stage - 1))
            if any(c is not None for c in chain[1:]):
                stack_kw["sparse_chain"] = chain
            if fin is not None:
                stack_kw["sparse_out"] = fin
            elif out_union is not None:
                # no final stack follows (z > 0): the main stack emits the
                # consumer union directly
                stack_kw["sparse_out"] = out_union
            return stack_kw, up_kw, fin, out_union

        def node_fn(mdl, below, same, above, z, k, i):
            _, H, W = level_size[i]
            use_quad = (i == 0
                        and quad_ok(node_parts(i, above is not None),
                                    enc[i]))
            use_fused = (not use_quad) and fused_ok(
                i, node_parts(i, above is not None), enc[i])
            mode = "quad" if use_quad else use_fused
            stack_kw, up_kw, fin, out_union = node_sparse(
                z, k, i, node_parts(i, above is not None))
            up = (up_remat if (use_fused or use_quad) else up_fn)(
                mdl, below, z, k, i, mode, tuple(sorted(up_kw.items())))

            fin_kw = ({} if fin is None else dict(
                sparse_in=(tuple(fin),), sparse_in_full=(enc[i],),
                sparse_compact=(True,)))
            if out_union is not None and z == 0:
                # the final stack IS the node output: emit the consumer
                # union (exact — consumers gather weight rows to it)
                fin_kw["sparse_out"] = out_union
            if use_quad:
                p_same, a_same = q_as_part(same)
                parts, affines = [p_same, up], [a_same, None]
                out = StackedConvBlocks(
                    features=enc[i], num_convs=self.num_conv_per_stage - 1,
                    fused=True, fused_hw=(Hq0, Wq0), fused_q=q0,
                    fused_interpret=self.fused_interpret,
                    name=f"loc{z}_{k}", parent=mdl, **stack_kw, **common)(
                        (parts, affines))
                if z == 0:
                    raw, stats, scale, nbias = out
                    mult, off = quadrant_norm_affine(stats, Q0, n_vox(0),
                                                     scale, nbias)
                    out = StackedConvBlocks(
                        features=enc[i], num_convs=1, fused=True,
                        fused_hw=(Hq0, Wq0), fused_q=q0,
                        fused_interpret=self.fused_interpret,
                        name=f"loc{z}_{k}_final", parent=mdl,
                        **fin_kw, **common)(([raw], [(mult, off)]))
                return QPending(*out)

            if use_fused:
                p_same, a_same = as_part(same, i)
                parts, affines = [p_same, up], [a_same, None]
                if above is not None:
                    if isinstance(above, QPending):
                        # block-max straight into the padded CF layout the
                        # fused block consumes (no CL round trip)
                        multq, offq = q_affine_of(above)
                        # channel count from the affine: the above node may
                        # emit its consumer union compact (sparse plan)
                        p_down = quadrant_block_max_cf(
                            above.raw, multq, offq, q0, Hq0, Wq0,
                            int(multq.shape[-1]),
                            level_wp[i], interpret=self.fused_interpret)
                    elif isinstance(above, Pending):
                        # normalized + pooled down-link in ONE CF pass
                        _, Hs, Ws = level_size[i - 1]
                        mult, off = affine_of(above, i - 1)
                        p_down = pooled_part_cf(above.raw, mult, off, Hs,
                                                Ws, pools[i - 1],
                                                level_wp[i])
                    else:
                        down = max_pool(as_cl(above, i - 1), pools[i - 1])
                        p_down, _ = as_part(down, i)
                    parts.append(p_down)
                    affines.append(None)
                fused_in = (parts, affines)
                out = StackedConvBlocks(
                    features=enc[i], num_convs=self.num_conv_per_stage - 1,
                    fused=True, fused_hw=(H, W),
                    fused_interpret=self.fused_interpret,
                    name=f"loc{z}_{k}", parent=mdl, **stack_kw,
                    **common)(fused_in)
                if z == 0:
                    raw, stats, scale, nbias = out
                    mult, off = norm_affine_from_stats(
                        stats, n_vox(i), scale, nbias)
                    out = StackedConvBlocks(
                        features=enc[i], num_convs=1, fused=True,
                        fused_hw=(H, W),
                        fused_interpret=self.fused_interpret,
                        name=f"loc{z}_{k}_final", parent=mdl,
                        **fin_kw, **common)(([raw], [(mult, off)]))
                return Pending(*out)

            cat = [as_cl(same, i), up]
            if above is not None:
                cat.append(down_link_cl(above, i))
            # parts list: the first conv computes conv(shift(concat))
            # without materializing the wide concat
            fused = cat
            if z == 0:
                fused = StackedConvBlocks(
                    features=enc[i], num_convs=self.num_conv_per_stage - 1,
                    name=f"loc{z}_{k}", parent=mdl, **stack_kw,
                    **common)(fused)
                fused = StackedConvBlocks(
                    features=enc[i], num_convs=1,
                    name=f"loc{z}_{k}_final", parent=mdl, **fin_kw,
                    **common)(fused)
            else:
                fused = StackedConvBlocks(
                    features=enc[i], num_convs=self.num_conv_per_stage - 1,
                    name=f"loc{z}_{k}", parent=mdl, **stack_kw,
                    **common)(fused)
            return fused

        node = (nn.remat(node_fn, static_argnums=(4, 5, 6))
                if self.remat else node_fn)

        for j in range(1, P + 1):
            for i in range(P - j, -1, -1):
                z = P - i - j          # reference nest index: loc{z}[j-1]
                k = j - 1
                below = nodes[(i + 1, j - 1)]
                same = nodes[(i, j - 1)]
                above = (nodes[(i - 1, j - 1)]
                         if (i > 0 and self.dense_fusion) else None)
                # level-0 fused/quadrant nodes skip the outer remat
                # (residuals are their in/out tensors, kept anyway); deeper
                # fused levels keep it — their extra saved tensors tip HBM
                fn = (node_fn if (i == 0 and (
                    quad_ok(node_parts(i, above is not None), enc[i])
                    or fused_ok(i, node_parts(i, above is not None),
                                enc[i]))) else node)
                nodes[(i, j)] = fn(self, below, same, above, z, k, i)

        # ---------------- deep supervision heads
        n_heads = self.num_ds_outputs()
        outputs = []
        for i in range(n_heads):
            v = nodes[(i, P - i)]
            if isinstance(v, QPending):
                # per-block 1x1 conv on the PENDING (norm fused into the
                # head); only the logits get de-quadrantized
                mult, off = q_affine_of(v)
                emit_q = (self.quadrant_logits and not do_ds and i == 0)
                probs_dt = (self.head_probs_dtype
                            if emit_q and not self.seg_bias else None)
                outputs.append(SegHead(num_classes=self.num_classes,
                                       compute_dtype=cd,
                                       quadrant=(q0, Hq0, Wq0),
                                       emit_quadrant=emit_q,
                                       emit_probs_dtype=probs_dt,
                                       interpret=self.fused_interpret,
                                       use_bias=self.seg_bias,
                                       name=f"seg_head{i}")(
                                           (v.raw, mult, off)))
                continue
            head_in = as_cl(v, i)
            outputs.append(SegHead(num_classes=self.num_classes,
                                   compute_dtype=cd,
                                   use_bias=self.seg_bias,
                                   name=f"seg_head{i}")(head_in))
        if do_ds:
            return outputs
        return outputs[0]


def deep_supervision_scales(pool_op_kernel_sizes,
                            num_outputs: int) -> List[List[float]]:
    """Relative resolution of each DS output (for target downsampling).
    Parity: nnUNetTrainer_simple.setup_DA_params (the [1,1,1] + cumprod
    expression), truncated to the network's actual output count."""
    scales = [[1.0, 1.0, 1.0]] + list(
        (1.0 / np.cumprod(np.vstack(pool_op_kernel_sizes), axis=0)).tolist())
    return [list(map(float, s)) for s in scales[:num_outputs]]


def ds_loss_weights(num_pool: int, num_outputs: int) -> np.ndarray:
    """Exponentially decaying deep-supervision weights with the lowest level
    zeroed, normalized to sum 1 over the first num_pool entries, then
    truncated to the network's output count.
    Parity: nnUNetTrainer_simple.initialize (weights = 1/2^i, last zeroed)."""
    weights = np.array([1.0 / (2 ** i) for i in range(num_pool)])
    mask = np.array([True] + [i < num_pool - 1
                              for i in range(1, num_pool)])
    weights[~mask] = 0.0
    weights = weights / weights.sum()
    return weights[:num_outputs]


def default_fused() -> bool:
    """Fused Pallas blocks on real TPU backends; XLA path on CPU."""
    import jax
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:  # noqa: BLE001
        return False


def build_network(plans_stage, num_modalities: int, num_classes_incl_bg: int,
                  tconv: str = "shiftConvPP", base_num_features: int = 48,
                  compute_dtype=jnp.bfloat16, norm_op: str = "instance",
                  nonlin: str = "lrelu", fused=None,
                  quadrant=None, quadrant_logits: bool = False,
                  remat=None, quadrant_input=None, sparse_plan=None,
                  num_conv_per_stage=None, seg_bias: bool = False,
                  nonlin_before_norm: bool = False, conv_kernel=None):
    """Network factory by Tconv name.
    Parity: nnUNetTrainer_simple.initialize_network (:281-357).
    2D plans (patch D == 1) disable the depth shift — the reference never
    shifts in 2D (torch_shift is dim_num==3 only).
    fused: None = auto (Pallas fused blocks on TPU, XLA on CPU).
    quadrant: None = the model default (on — measured best for BOTH
    inference and, since round 5 (level-1 fusion + prefetched qfused
    backward: 684 vs 709 ms/step), training; PERF_NOTES.md)."""
    if fused is None:
        fused = default_fused()
    arch = dict(norm_op=norm_op, nonlin=nonlin)
    if remat is not None:
        arch["remat"] = bool(remat)
    if num_conv_per_stage is not None:
        # nnUNetTrainerV2_3ConvPerStage[_samefilters]
        arch["num_conv_per_stage"] = int(num_conv_per_stage)
    if seg_bias:
        arch["seg_bias"] = True
    if nonlin_before_norm:
        arch["nonlin_before_norm"] = True
    if conv_kernel is not None:
        # nnUNetTrainerV2_allConv3x3 (:44-46): every conv kernel forced to
        # (3,3,3); the shift is auto-disabled (it applies iff (1,3,3))
        arch["conv_kernel"] = tuple(int(k) for k in conv_kernel)
    # quadrant knobs exist only on ShiftUNetPlusPlus (the quadrant path)
    qlog = dict(quadrant_logits=True) if quadrant_logits else {}
    if quadrant is not None:
        qlog["quadrant"] = bool(quadrant)
    if quadrant_input is not None:
        qlog["quadrant_input"] = tuple(int(s) for s in quadrant_input)
    if sparse_plan is not None:
        # DSFF row-sparse inference plan (models/sparse_plan.py); only the
        # ShiftUNetPlusPlus variants consume it
        qlog["sparse_plan"] = tuple(sparse_plan)
    pools = tuple(tuple(p) for p in plans_stage.pool_op_kernel_sizes)
    if int(plans_stage.patch_size[0]) == 1:
        if tconv in ("shiftConvPP",):
            tconv = "shiftConvPP_noshift"
        elif tconv == "ori":
            return __import__(
                "e2enet_tpu.models.unet", fromlist=["ShiftUNet"]).ShiftUNet(
                input_channels=num_modalities,
                num_classes=num_classes_incl_bg,
                pool_op_kernel_sizes=pools,
                base_num_features=base_num_features, do_shift=False,
                max_num_features=480, compute_dtype=compute_dtype, **arch)
    if tconv == "shiftConvPP":
        return ShiftUNetPlusPlus(
            input_channels=num_modalities, num_classes=num_classes_incl_bg,
            pool_op_kernel_sizes=pools, base_num_features=base_num_features,
            compute_dtype=compute_dtype, fused=fused, **arch, **qlog)
    if tconv == "shiftConvPP_noshift":
        return ShiftUNetPlusPlus(
            input_channels=num_modalities, num_classes=num_classes_incl_bg,
            pool_op_kernel_sizes=pools, base_num_features=base_num_features,
            do_shift=False, compute_dtype=compute_dtype, fused=fused,
            **arch, **qlog)
    if tconv in ("shiftConvPP_313", "shiftConvPP_331"):
        # kernels (3,1,3)/(3,3,1); the reference disables the shift for
        # these ablations ('and False', unetpp_d_313.py:102)
        kern = (3, 1, 3) if tconv.endswith("313") else (3, 3, 1)
        return ShiftUNetPlusPlus(
            input_channels=num_modalities, num_classes=num_classes_incl_bg,
            pool_op_kernel_sizes=pools, base_num_features=base_num_features,
            do_shift=False, conv_kernel=kern, compute_dtype=compute_dtype,
            **arch)
    if tconv == "resenc":
        # residual-encoder UNet (FabiansUNet) — the ResencUNet trainer
        # variants (nnUNetTrainerV2_ResencUNet.py)
        from .resenc import ResidualUNet
        arch.pop("conv_kernel", None)
        arch.pop("nonlin_before_norm", None)
        return ResidualUNet(
            input_channels=num_modalities, num_classes=num_classes_incl_bg,
            pool_op_kernel_sizes=pools,
            base_num_features=base_num_features,
            compute_dtype=compute_dtype, **arch)
    if tconv in ("ori", "shiftConvPP_nodff"):
        from .unet import ShiftUNet
        return ShiftUNet(
            input_channels=num_modalities, num_classes=num_classes_incl_bg,
            pool_op_kernel_sizes=pools, base_num_features=base_num_features,
            shift_size=3 if tconv == "ori" else 5,
            compute_dtype=compute_dtype, **arch)
    raise KeyError(f"Unknown Tconv '{tconv}'")
