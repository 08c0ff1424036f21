"""Sliding-window inference: step grid, Gaussian importance map, and the
whole tiled + mirror-TTA + weighted-accumulation prediction compiled as ONE
XLA program.

Parity: reference SegmentationNetwork
(_compute_steps_for_sliding_window neural_network.py:260-284; _get_gaussian
:244-258; _internal_predict_3D_3Dconv_tiled :286-426;
_internal_maybe_mirror_and_pred_3D :500-565).

TPU-native redesign: instead of a Python loop issuing one forward per tile
and 8 sequential mirror passes (reference :373-393, :529-563), mirror flips
become a batch axis of size 2**len(mirror_axes) inside a single jitted
program that lax.scan's over the tile grid, dynamic-slicing patches and
scatter-adding Gaussian-weighted softmax into on-device accumulators. The
tile count is bucketed (padded with dummy zero-weight tiles) so one compiled
program serves many volume shapes.
"""
import functools
from typing import Callable, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from scipy.ndimage import gaussian_filter


def compute_steps_for_sliding_window(patch_size: Sequence[int],
                                     image_size: Sequence[int],
                                     step_size: float) -> List[List[int]]:
    """Tile start coordinates per axis. Exact port of the reference math
    (neural_network.py:260-284): ceil-spaced starts covering the volume with
    stride at most patch_size*step_size, first tile at 0, last flush with the
    end."""
    assert all(i >= j for i, j in zip(image_size, patch_size)), \
        "image size must be as large or larger than patch_size"
    assert 0 < step_size <= 1, "step_size must be in (0, 1]"

    target_step_sizes_in_voxels = [i * step_size for i in patch_size]
    num_steps = [int(np.ceil((i - k) / j)) + 1 for i, j, k in
                 zip(image_size, target_step_sizes_in_voxels, patch_size)]

    steps = []
    for dim in range(len(patch_size)):
        max_step_value = image_size[dim] - patch_size[dim]
        if num_steps[dim] > 1:
            actual_step_size = max_step_value / (num_steps[dim] - 1)
        else:
            actual_step_size = 99999999999
        steps_here = [int(np.round(actual_step_size * i))
                      for i in range(num_steps[dim])]
        steps.append(steps_here)
    return steps


@functools.lru_cache(maxsize=8)
def gaussian_importance_map(patch_size: Tuple[int, ...],
                            sigma_scale: float = 1.0 / 8) -> np.ndarray:
    """Gaussian tile-blending weights, sigma = patch/8, peak normalized to 1,
    zeros floored to the smallest positive value (so accumulation never
    divides by 0). Parity: _get_gaussian (neural_network.py:244-258)."""
    tmp = np.zeros(patch_size)
    center_coords = [i // 2 for i in patch_size]
    sigmas = [i * sigma_scale for i in patch_size]
    tmp[tuple(center_coords)] = 1
    g = gaussian_filter(tmp, sigmas, 0, mode="constant", cval=0)
    g = g / np.max(g)
    g = g.astype(np.float32)
    g[g == 0] = np.min(g[g != 0])
    return g


def flip_combinations(mirror_axes: Sequence[int]) -> List[Tuple[int, ...]]:
    """All subsets of mirror axes, identity first — the 2**n TTA passes
    (order matches _internal_maybe_mirror_and_pred_3D m=0..7 semantics; order
    is irrelevant since results are averaged)."""
    axes = sorted(mirror_axes)
    combos = [()]
    for a in axes:
        combos = combos + [c + (a,) for c in combos]
    return combos


def pad_volume_to_patch(data: np.ndarray, patch_size: Sequence[int]):
    """Pad (C, X, Y, Z) so every spatial dim >= patch; centered padding,
    constant 0 (reference pad_nd_image usage, neural_network.py:300). Returns
    (padded, slicer to undo)."""
    shape = data.shape[1:]
    new_shape = [max(s, p) for s, p in zip(shape, patch_size)]
    diff = [n - s for n, s in zip(new_shape, shape)]
    lo = [d // 2 for d in diff]
    hi = [d - l for d, l in zip(diff, lo)]
    pad = [(0, 0)] + [(l, h) for l, h in zip(lo, hi)]
    padded = np.pad(data, pad, mode="constant")
    slicer = tuple([slice(None)] + [slice(l, l + s)
                                    for l, s in zip(lo, shape)])
    return padded, slicer


def bucket_num_tiles(n: int, buckets=(1, 2, 4, 8, 16, 32, 64, 128, 256, 512,
                                      1024, 2048, 4096)) -> int:
    """Round tile count up to a bucket so XLA compiles once per bucket."""
    for b in buckets:
        if n <= b:
            return b
    return int(2 ** np.ceil(np.log2(n)))


def _check_prob_dtype(prob_dtype, mirror_apply_fns):
    """prob_dtype only affects the per-pass flip path's unflip chain; under
    flip-free TTA (mirror_apply_fns) there is no unflip chain — the softmax
    fuses straight into the f32 mirror sum. Warn instead of silently
    accepting the knob (round-2 advisor finding)."""
    if prob_dtype is not None and mirror_apply_fns is not None:
        import warnings
        warnings.warn(
            "prob_dtype is a no-op under flip-free TTA (mirror_apply_fns); "
            "ignoring it", stacklevel=3)
        return None
    return prob_dtype


def _nonlin_f32(logits, nonlin: str):
    if nonlin == "sigmoid":
        return jax.nn.sigmoid(logits)
    return jax.nn.softmax(logits, axis=-1)


def make_tiled_predictor(apply_fn: Callable, patch_size: Tuple[int, ...],
                         num_classes: int,
                         mirror_axes: Tuple[int, ...] = (0, 1, 2),
                         do_mirroring: bool = True,
                         accum_dtype=jnp.float32,
                         tta_batch: int = 1,
                         quadrant_meta=None,
                         prob_dtype=None,
                         mirror_apply_fns=None,
                         nonlin: str = "softmax"):
    """Builds the jitted single-program sliding-window predictor.

    apply_fn(params, x) -> logits for x (B, pd, ph, pw, C_in), logits
    (B, pd, ph, pw, num_classes).

    tta_batch: how many mirror flips run per forward as a batch dimension
    (more = more MXU parallelism, x activation memory; 1 = sequential).

    mirror_apply_fns: FLIP-FREE mirror TTA — a list of apply fns, one per
    flip combination in flip_combinations(mirror_axes) order, where
    fns[m](params, x) computes flip_m(net(flip_m(x))) via statically
    MIRRORED operators (models/unetpp flips=...) on unflipped data. The
    per-pass data flips and prob unflips vanish entirely (the reference
    flips data per pass, neural_network.py:529-563); each pass is a
    distinct trace of the network, so the compiled program inlines
    2**len(mirror_axes) mirrored bodies instead of scanning one.

    prob_dtype: dtype the per-pass softmax probs are stored/unflipped in
    (the mirror-pass mean always accumulates in f32). None = exact f32.
    Pass jnp.bfloat16 for bf16 models: the logits heads emit f32 (parity:
    unetpp_d.py:394-401), so this cannot be inferred from the logits —
    bf16 halves the TTA unflip chain's HBM traffic (~138MB prob tensor
    reversed + selected per mirror pass) at bf16-model noise level.

    nonlin: 'softmax' (default) or 'sigmoid' — region-based models
    (BraTS regions trainers) accumulate per-region sigmoid probabilities
    (inference_apply_nonlin, nnUNetTrainerV2BraTSRegions.py:76).
    Sigmoid requires the plain (non-quadrant) path.

    Returned fn(params, volume, starts, n_valid) with
      volume: (X, Y, Z, C_in) padded so X,Y,Z >= patch
      starts: (T, 3) int32 tile starts (padded to a bucket size)
      n_valid: scalar int32, number of real tiles
    -> (probs_sum (X, Y, Z, num_classes), weights (X, Y, Z)) accumulators.
    """
    prob_dtype = _check_prob_dtype(prob_dtype, mirror_apply_fns)
    assert nonlin == "softmax" or quadrant_meta is None, \
        "sigmoid accumulation needs the plain (non-quadrant) path"

    @jax.jit
    def run(params, volume, starts, n_valid):
        tile_ids = jnp.arange(starts.shape[0], dtype=jnp.int32)
        return _tiled_accumulate(
            apply_fn, patch_size, num_classes, mirror_axes, do_mirroring,
            accum_dtype, tta_batch, params, volume, starts, n_valid,
            tile_ids, quadrant_meta=quadrant_meta, prob_dtype=prob_dtype,
            mirror_apply_fns=mirror_apply_fns, nonlin=nonlin)

    return run


def make_tiled_predictor_sharded(apply_fn: Callable,
                                 patch_size: Tuple[int, ...],
                                 num_classes: int, mesh,
                                 axis: str = "data",
                                 mirror_axes: Tuple[int, ...] = (0, 1, 2),
                                 do_mirroring: bool = True,
                                 accum_dtype=jnp.float32,
                                 tta_batch: int = 1,
                                 quadrant_meta=None,
                                 prob_dtype=None,
                                 mirror_apply_fns=None):
    """Multi-chip sliding window: the tile list is sharded over the mesh
    axis; every device scans its tiles into a local accumulator over the
    (replicated) volume and the accumulators are psum'd — the whole
    volume prediction is still ONE XLA program, now spanning the mesh.
    This is the scale-out lever the reference lacks (it shards whole CASES
    across GPUs via separate processes, predict.py:745).

    starts must be padded to a multiple of the axis size (dummy tiles have
    weight 0 via n_valid). Device d processes tiles [d::n_dev] so real tiles
    spread evenly across devices.
    """
    from jax.sharding import PartitionSpec as P

    prob_dtype = _check_prob_dtype(prob_dtype, mirror_apply_fns)

    # the single-device accumulation logic runs per shard via shard_map
    def shard_fn(params, volume, starts, n_valid, tile_ids):
        acc, wacc = _tiled_accumulate(
            apply_fn, patch_size, num_classes, mirror_axes, do_mirroring,
            accum_dtype, tta_batch, params, volume, starts, n_valid,
            tile_ids, quadrant_meta=quadrant_meta, prob_dtype=prob_dtype,
            mirror_apply_fns=mirror_apply_fns)
        acc = jax.lax.psum(acc, axis)
        wacc = jax.lax.psum(wacc, axis)
        return acc, wacc

    mapped = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), P(), P(axis), P(), P(axis)),
        out_specs=(P(), P()),
        check_vma=False)

    def run(params, volume, starts, n_valid):
        T = starts.shape[0]
        n_dev = mesh.shape[axis]
        assert T % n_dev == 0, "pad the tile list to a multiple of the mesh"
        # strided assignment so valid tiles spread across devices
        order = np.arange(T).reshape(-1, n_dev).T.reshape(-1)
        starts_interleaved = jnp.asarray(np.asarray(starts)[order])
        tile_ids = jnp.asarray(order.astype(np.int32))
        return mapped(params, volume, starts_interleaved, n_valid, tile_ids)

    return run


def _tiled_accumulate(apply_fn, patch_size, num_classes, mirror_axes,
                      do_mirroring, accum_dtype, tta_batch, params, volume,
                      starts, n_valid, tile_ids, quadrant_meta=None,
                      prob_dtype=None, mirror_apply_fns=None,
                      nonlin: str = "softmax"):
    """Scan a (sub)list of tiles into local accumulators. tile_ids carries
    each tile's GLOBAL index so validity (id < n_valid) is preserved under
    sharding."""
    pd, ph, pw = patch_size
    combos = flip_combinations(mirror_axes) if do_mirroring else [()]
    n_tta = len(combos)
    gmap = jnp.asarray(gaussian_importance_map(tuple(patch_size)))
    tta_batch = max(1, min(tta_batch, n_tta))
    flip_flags = np.array([[a in c for a in (0, 1, 2)] for c in combos],
                          bool).reshape(-1, tta_batch, 3)
    if mirror_apply_fns is not None:
        assert len(mirror_apply_fns) == n_tta, (
            f"mirror_apply_fns must match flip_combinations order: "
            f"{len(mirror_apply_fns)} fns for {n_tta} TTA passes")
        assert tta_batch == 1, "flip-free TTA runs passes sequentially"

    def apply_flips(x, flags):
        for ax in range(3):
            x = jnp.where(flags[ax], jnp.flip(x, axis=ax), x)
        return x

    X, Y, Z, C = volume.shape
    acc = jnp.zeros((X, Y, Z, num_classes), accum_dtype)
    wacc = jnp.zeros((X, Y, Z), accum_dtype)
    flags_chunks = jnp.asarray(flip_flags)

    # quadrant-layout logits (rank 4): softmax + TTA unflip stay in the
    # quadrant layout; the de-quadrantize happens once per TILE, not once
    # per mirror pass. Unflip algebra (ops/qfused): the d-flip and the
    # COMBINED hw-flip are cheap on the flat lane layout (axis revs +
    # channel-block swaps + one 2-lane roll — no lane-split reshape), so
    # each pass applies d iff flagged and hw iff h flagged; passes where
    # exactly one of (h, w) was mirrored then still owe a single w-flip —
    # those accumulate into a second accumulator that is w-flipped ONCE
    # per tile. (Measured alternatives: per-pass 8-D flip+selects lost
    # ~7 ms/pass to unaligned relayouts; lax.switch over static combos
    # was 10% slower still — HLO conditionals block fusion.)
    out_aval = jax.eval_shape(
        apply_fn, params,
        jax.ShapeDtypeStruct((1, pd, ph, pw, C), volume.dtype))
    quad_out = len(out_aval.shape) == 4
    if quad_out:
        assert quadrant_meta is not None, \
            "apply_fn emits quadrant logits; pass quadrant_meta=(q, Hq, Wq)"
        assert tta_batch == 1, "quadrant logits require tta_batch=1"
        q0, Hq_, Wq_ = quadrant_meta
        from .qfused import (choose_wqp, from_quadrant_cf, quadrant_flip,
                             quadrant_flip_d_cf, quadrant_flip_hw_cf,
                             quadrant_flip_w_cf, quadrant_softmax_f32,
                             to_quadrant_cf)
        # models built with quadrant_input=(D,H,W) also ACCEPT rank-4
        # pre-quadrantized input: then quadrantize once per tile and mirror
        # the input in quadrant space — the quadrantize relayout leaves the
        # per-mirror-pass loop (8x fewer relayouts per tile)
        wqp0 = choose_wqp(Hq_, Wq_)
        Q0 = int(np.prod(q0))
        try:
            jax.eval_shape(apply_fn, params, jax.ShapeDtypeStruct(
                (1, pd // q0[0], Q0 * C, Hq_ * wqp0), volume.dtype))
            quad_in = True
        except Exception:  # noqa: BLE001 — model is rank-5-only
            quad_in = False

    def body(carry, inp):
        acc, wacc = carry
        start, tid = inp
        x0, y0, z0 = start[0], start[1], start[2]
        patch = jax.lax.dynamic_slice(volume, (x0, y0, z0, 0),
                                      (pd, ph, pw, C))

        if quad_out and mirror_apply_fns is not None:
            # flip-free mirror TTA: pass m runs the statically MIRRORED
            # network on the UNFLIPPED tile — no input flips, no prob
            # unflips, no dual accumulator; softmax probs add straight
            # into one f32 sum (XLA fuses the softmax into the add).
            # prob_dtype is deliberately a NO-OP here: with no unflip
            # chain there is no materialized prob tensor to shrink — the
            # softmax fuses into the f32 accumulate, so bf16 probs would
            # only add a rounding step without saving traffic.
            xin = (to_quadrant_cf(patch[None], q0, wqp0) if quad_in
                   else patch[None])
            prob_sum = jnp.zeros(out_aval.shape, jnp.float32)
            for fn_m in mirror_apply_fns:
                lq = fn_m(params, xin)
                if lq.dtype == jnp.float32:
                    p = quadrant_softmax_f32(lq, q0, num_classes,
                                             out_dtype=jnp.float32)
                else:
                    # head emitted fused softmax PROBS (models/unetpp
                    # head_probs_dtype, bf16): the mirror sum still
                    # accumulates f32
                    p = lq.astype(jnp.float32)
                prob_sum = prob_sum + p
            prob_sum = from_quadrant_cf(prob_sum, q0, Hq_, Wq_,
                                        num_classes)[0]
        elif quad_out:
            xq0 = (to_quadrant_cf(patch[None], q0, wqp0) if quad_in
                   else None)

            def tta_pass(acc2, flags):
                f = flags[0]
                if quad_in:
                    # input mirror flips in quadrant space: the tile is
                    # quadrantized ONCE above; per pass only cheap exact
                    # flips (axis revs + block swaps; w keeps the zero
                    # padding lanes) run on the small Q*Cin-channel tensor
                    pf = xq0
                    for ax in range(3):
                        pf = jnp.where(f[ax],
                                       quadrant_flip(pf, q0, Hq_, Wq_,
                                                     (ax,)), pf)
                    lq = apply_fn(params, pf)
                else:
                    lq = apply_fn(params, apply_flips(patch, f)[None])
                # softmax commutes with the spatial unflips (pointwise
                # over the class channels) — run it first. With
                # prob_dtype=bf16 the probs stay bf16 through the unflips,
                # halving the chain's HBM traffic (the ~138MB prob tensor
                # is reversed + selected per pass); the mean over mirror
                # passes still accumulates in f32 below. Default (None)
                # keeps exact f32 probs — the logits heads always emit f32
                # (reference parity), so this must be an explicit caller
                # knob, not keyed off the logits dtype.
                p = quadrant_softmax_f32(lq, q0, num_classes,
                                         out_dtype=(prob_dtype
                                                    or jnp.float32))
                p = jnp.where(f[0], quadrant_flip_d_cf(p, q0), p)
                p = jnp.where(f[1],
                              quadrant_flip_hw_cf(p, q0, Hq_, Wq_), p)
                # residual single w-flip owed iff exactly one of (h, w)
                # was mirrored — route into acc2[1], flipped per tile
                idx = jnp.logical_xor(f[1], f[2]).astype(jnp.int32)
                cur = jax.lax.dynamic_slice_in_dim(acc2, idx, 1, axis=0)
                return jax.lax.dynamic_update_slice_in_dim(
                    acc2, cur + p[None].astype(jnp.float32), idx,
                    axis=0), None

            acc2 = jnp.zeros((2, *out_aval.shape), jnp.float32)
            acc2, _ = jax.lax.scan(tta_pass, acc2, flags_chunks)
            prob_sum = acc2[0]
            if n_tta > 1:
                prob_sum = prob_sum + quadrant_flip_w_cf(acc2[1], q0,
                                                         Hq_, Wq_)
            prob_sum = from_quadrant_cf(prob_sum, q0, Hq_, Wq_,
                                        num_classes)[0]
        elif mirror_apply_fns is not None:
            # flip-free mirror TTA, plain rank-5 logits
            prob_sum = jnp.zeros((pd, ph, pw, num_classes), jnp.float32)
            for fn_m in mirror_apply_fns:
                logits = fn_m(params, patch[None])
                prob_sum = prob_sum + _nonlin_f32(
                    logits[0].astype(jnp.float32), nonlin)
        else:
            def tta_chunk(prob_sum, flags):
                batch = jax.vmap(lambda f: apply_flips(patch, f))(flags)
                logits = apply_fn(params, batch)
                probs = _nonlin_f32(logits.astype(jnp.float32), nonlin)
                unflipped = jax.vmap(apply_flips)(probs, flags)
                return prob_sum + jnp.sum(unflipped, axis=0), None

            prob_sum = jnp.zeros((pd, ph, pw, num_classes), jnp.float32)
            prob_sum, _ = jax.lax.scan(tta_chunk, prob_sum, flags_chunks)
        mean_probs = prob_sum / n_tta

        valid = (tid < n_valid).astype(jnp.float32)
        w = gmap * valid
        contrib = (mean_probs * w[..., None]).astype(accum_dtype)
        w = w.astype(accum_dtype)
        sl = jax.lax.dynamic_slice(acc, (x0, y0, z0, 0),
                                   (pd, ph, pw, num_classes))
        acc = jax.lax.dynamic_update_slice(acc, sl + contrib,
                                           (x0, y0, z0, 0))
        wsl = jax.lax.dynamic_slice(wacc, (x0, y0, z0), (pd, ph, pw))
        wacc = jax.lax.dynamic_update_slice(wacc, wsl + w, (x0, y0, z0))
        return (acc, wacc), None

    (acc, wacc), _ = jax.lax.scan(body, (acc, wacc), (starts, tile_ids))
    return acc, wacc


def predict_volume_tiled(apply_fn, params, data: np.ndarray,
                         patch_size: Sequence[int], num_classes: int,
                         step_size: float = 0.5,
                         mirror_axes: Tuple[int, ...] = (0, 1, 2),
                         do_mirroring: bool = True,
                         use_gaussian: bool = True,
                         predictor=None,
                         min_tile_multiple: int = 1) -> np.ndarray:
    """Host orchestration: pad, build the step grid, run the jitted program,
    normalize, un-pad. data: (C, X, Y, Z) float32 -> softmax (num_classes,
    X, Y, Z).

    Note: when the volume equals the patch (single tile) the reference skips
    the Gaussian (num_tiles > 1 check, :316); with our normalization by the
    accumulated weight map the Gaussian cancels exactly for a single tile, so
    one code path serves both.
    """
    padded, slicer = pad_volume_to_patch(data, patch_size)
    vol = np.moveaxis(padded, 0, -1)  # (X,Y,Z,C)
    steps = compute_steps_for_sliding_window(patch_size, vol.shape[:3],
                                             step_size)
    starts = np.array([(x, y, z) for x in steps[0] for y in steps[1]
                       for z in steps[2]], dtype=np.int32)
    T = starts.shape[0]
    Tb = max(bucket_num_tiles(T), min_tile_multiple)
    if Tb % min_tile_multiple:
        Tb += min_tile_multiple - Tb % min_tile_multiple
    starts_padded = np.zeros((Tb, 3), np.int32)
    starts_padded[:T] = starts

    if predictor is None:
        predictor = make_tiled_predictor(apply_fn, tuple(patch_size),
                                         num_classes, tuple(mirror_axes),
                                         do_mirroring)
    acc, wacc = predictor(params, jnp.asarray(vol),
                          jnp.asarray(starts_padded), jnp.int32(T))
    wacc = np.asarray(wacc)
    # every voxel is covered by >=1 tile so wacc > 0 (the Gaussian's zeros
    # are floored to its min positive value); guard only against true zeros
    wacc = np.where(wacc == 0, 1.0, wacc)
    probs = np.asarray(acc) / wacc[..., None]
    probs = np.moveaxis(probs, -1, 0)  # (C, X, Y, Z)
    return probs[(slice(None),) + slicer[1:]]
