"""Train REAL row-granular DSFF masks at the bench geometry (VERDICT r04
weak #3 / next #2): the bench's sparse "checkpoint" was a synthetic random
row draw; this script produces masks from an actual DSFF training run so
`bench.py --masks_from CKPT` measures the plan a trained checkpoint yields
(density / emit-union structure included).

Setup mirrors the production trainer inner loop exactly (train_state.
make_train_step: DC+CE deep supervision, SGD nesterov 0.99, grad-clip 12,
poly LR 0.01; make_mask_update_step(granularity='row') on the
cosine-decayed death rate, core_channel.py truncate_weights schedule) on
the bench architecture (48 base features, 5x(2,2,2) pools, 16 classes,
128^3 patch, batch 2, bf16 fused+quadrant). Data: synthetic 16-organ
volumes (random ellipsoid "organs" with class-specific intensities over a
noisy body) — a real segmentation loss drives the mask dynamics.

Run: env PYTHONPATH=/root/repo:/root/.axon_site python -u \
    experiments/train_bench_masks.py [--steps 600] [--out /tmp/bench_masks.model]
Then: env PYTHONPATH=/root/repo:/root/.axon_site python bench.py \
    --masks_from /tmp/bench_masks.model
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def make_batch(rng, batch, patch, num_classes, factors):
    """Synthetic 16-organ batch: noisy body + one random ellipsoid per
    foreground class with a class-specific intensity shift."""
    D, H, W = patch
    vols = np.empty((batch, D, H, W, 1), np.float32)
    segs = np.empty((batch, D, H, W), np.int32)
    zz, yy, xx = np.meshgrid(np.arange(D), np.arange(H), np.arange(W),
                             indexing="ij")
    for b in range(batch):
        vol = rng.randn(D, H, W).astype(np.float32) * 0.3
        seg = np.zeros((D, H, W), np.int32)
        for cls in range(1, num_classes):
            c = rng.rand(3) * np.array([D, H, W])
            r = 4 + rng.rand(3) * np.array([D, H, W]) * 0.12
            m = (((zz - c[0]) / r[0]) ** 2 + ((yy - c[1]) / r[1]) ** 2
                 + ((xx - c[2]) / r[2]) ** 2) < 1
            # class-specific mean intensity, overlapping ranges
            vol[m] = (0.15 * cls - 1.2
                      + 0.4 * rng.randn(int(m.sum())).astype(np.float32))
            seg[m] = cls
        vols[b, ..., 0] = vol
        segs[b] = seg
    targets = tuple(
        segs[:, ::f[0], ::f[1], ::f[2]] for f in factors)
    return vols, targets


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--density", type=float, default=0.2)
    ap.add_argument("--update_frequency", type=int, default=30)
    ap.add_argument("--death_rate", type=float, default=0.5)
    ap.add_argument("--growth", default="random",
                    choices=["random", "gradient"],
                    help="row regrowth mode; 'gradient' is the "
                         "recommended narrow-model setting "
                         "(BASELINE.md granularity study)")
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--n_batches", type=int, default=8,
                    help="distinct host batches cycled through")
    ap.add_argument("--out", default="/tmp/bench_masks.model")
    ap.add_argument("--patch", type=int, nargs=3, default=[128, 128, 128])
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    import jax.numpy as jnp
    from e2enet_tpu.models.unetpp import (ShiftUNetPlusPlus,
                                          ds_loss_weights)
    from e2enet_tpu.training import dsff
    from e2enet_tpu.training.checkpoint import save_checkpoint
    from e2enet_tpu.training.train_state import (create_train_state,
                                                 make_mask_update_step,
                                                 make_train_step)

    on_tpu = jax.devices()[0].platform != "cpu"
    patch = tuple(args.patch) if on_tpu else (16, 32, 32)
    num_classes = 16
    pools = ((2, 2, 2),) * 5
    model = ShiftUNetPlusPlus(
        input_channels=1, num_classes=num_classes,
        pool_op_kernel_sizes=pools,
        base_num_features=48 if on_tpu else 8,
        compute_dtype=jnp.bfloat16, fused=on_tpu, remat=False)
    x0 = jnp.zeros((1, *patch, 1), jnp.bfloat16)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x0)["params"]

    masks = dsff.init_masks_row(params, args.density,
                                jax.random.PRNGKey(1),
                                density_48_override=args.density)
    state = create_train_state(params, masks, seed=0)
    n_out = model.num_ds_outputs()
    weights = ds_loss_weights(len(pools), n_out)
    cum = np.cumprod(np.array(pools), axis=0)
    factors = [(1, 1, 1)] + [tuple(int(v) for v in c) for c in cum]
    factors = factors[:n_out]

    step_fn = make_train_step(model, weights)
    mask_update = make_mask_update_step(args.growth, granularity="row")
    grad_step = None
    if args.growth == "gradient":
        from e2enet_tpu.training.train_state import make_grad_step
        grad_step = make_grad_step(model, weights, True)

    rng = np.random.RandomState(3)
    print(f"generating {args.n_batches} host batches "
          f"({args.batch}x{patch})...", flush=True)
    batches = [make_batch(rng, args.batch, patch, num_classes, factors)
               for _ in range(args.n_batches)]
    batches = [(jnp.asarray(v), tuple(jnp.asarray(t) for t in ts))
               for v, ts in batches]

    t_max = args.steps
    t0 = time.time()
    for i in range(args.steps):
        data, targets = batches[i % len(batches)]
        lr = 0.01 * (1 - i / t_max) ** 0.9
        state, metrics = step_fn(state, data, targets, jnp.float32(lr))
        if (i + 1) % args.update_frequency == 0:
            dr = dsff.cosine_death_rate(
                jnp.asarray(i + 1, jnp.float32), args.death_rate, t_max)
            grads = (grad_step(state.params, data, targets)
                     if grad_step is not None else None)
            state = mask_update(state, dr, grads)
            dens = float(dsff.masks_density(state.masks, state.params))
            print(f"step {i+1}: loss={float(metrics['loss']):.4f} "
                  f"DSFF update death_rate={float(dr):.3f} "
                  f"density={dens:.4f} ({time.time()-t0:.0f}s)",
                  flush=True)
        elif (i + 1) % 50 == 0:
            print(f"step {i+1}: loss={float(metrics['loss']):.4f} "
                  f"({time.time()-t0:.0f}s)", flush=True)

    # plan diagnostics on the trained masks
    from e2enet_tpu.models.sparse_plan import build_sparse_plan, \
        plan_density
    host_masks = {k: np.asarray(v) for k, v in state.masks.items()}
    plan = build_sparse_plan(host_masks)
    n_conv = len(plan) if plan else 0
    pd = plan_density(plan, host_masks) if plan else 1.0
    alive_sizes = sorted((k, len(a)) for k, a in (plan or ()))
    print(f"trained plan: {n_conv} convs, plan row density {pd:.4f}")
    for k, n in alive_sizes:
        print(f"  {k}: {n} alive rows")

    save_checkpoint(args.out, state, 0,
                    {"source": "experiments/train_bench_masks.py",
                     "steps": args.steps, "density": args.density,
                     "update_frequency": args.update_frequency})
    print(f"saved -> {args.out}")


if __name__ == "__main__":
    main()
