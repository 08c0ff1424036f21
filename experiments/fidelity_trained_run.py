"""Train 5-pool models for the trained-checkpoint fidelity check.

The reference Generic_UNetPlusPlus hardcodes five nest levels
(unetpp_d.py:384 calls create_nest(2..4) unconditionally — num_pool < 5
crashes in create_nest), so fidelity_check --from_native needs a checkpoint
with a 5-pool plan; the granularity study's tiny-volume plans give 3 pools.
This script trains the sphere task (granularity_study.make_case_spheres,
padded to a 5-pool patch) with the production inner loop (train_state.
make_train_step: DC+CE DS loss, SGD nesterov, poly LR) in TWO configs

    dense : no DSFF
    row   : DSFF row granularity, density 0.2 (the headline bench recipe)

and writes native checkpoints + ModelBundle sidecars to --out_dir. Then:

  python experiments/fidelity_check.py --from_native OUT_DIR/dense \
      --gen spheres --tta
  python experiments/fidelity_check.py --from_native OUT_DIR/row \
      --gen spheres --tta

Run: env PYTHONPATH=/root/repo:/root/.axon_site python -u \
    experiments/fidelity_trained_run.py [--steps 400]
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

POOLS = ((1, 2, 2), (2, 2, 2), (2, 2, 2), (2, 2, 2), (1, 2, 2))
PATCH = (24, 32, 32)
BASE = 24
NCLASS = 3


def make_plans_dict():
    return {
        "num_modalities": 1, "modalities": {0: "MR"},
        "normalization_schemes": {0: "nonCT"},
        "dataset_properties": {}, "num_classes": NCLASS - 1,
        "all_classes": list(range(1, NCLASS)),
        "base_num_features": BASE,
        "use_mask_for_norm": {0: False},
        "transpose_forward": [0, 1, 2], "transpose_backward": [0, 1, 2],
        "data_identifier": "nnUNetData_plans_v2.1", "conv_per_stage": 2,
        "plans_per_stage": {0: {
            "batch_size": 2, "num_pool_per_axis": [3, 5, 5],
            "patch_size": list(PATCH),
            "median_patient_size_in_voxels": list(PATCH),
            "current_spacing": [1.5, 1.0, 1.0],
            "original_spacing": [1.5, 1.0, 1.0],
            "do_dummy_2D_data_aug": False,
            "pool_op_kernel_sizes": [list(p) for p in POOLS],
            "conv_kernel_sizes": [[1, 3, 3]] * 6}},
    }


def make_batches(rng, n_batches, batch, factors, gen="spheres"):
    """Study-task batches: cases padded into PATCH, z-score normalized
    (the preprocessing the predict pipeline applies)."""
    import granularity_study as gs
    gen_fn = {"spheres": gs.make_case_spheres,
              "shells": gs.make_case_shells}[gen]
    D, H, W = PATCH
    out = []
    for _ in range(n_batches):
        vols = np.zeros((batch, D, H, W, 1), np.float32)
        segs = np.zeros((batch, D, H, W), np.int32)
        for b in range(batch):
            vol, seg = gen_fn(rng)
            voln = (vol - vol.mean()) / (vol.std() + 1e-8)
            d0, h0, w0 = vol.shape
            vols[b, :d0, :h0, :w0, 0] = voln
            segs[b, :d0, :h0, :w0] = seg
        targets = tuple(segs[:, ::f[0], ::f[1], ::f[2]] for f in factors)
        out.append((vols, targets))
    return out


def train_one(mode, args, batches_np, factors):
    import jax
    import jax.numpy as jnp
    from e2enet_tpu.models.unetpp import (ShiftUNetPlusPlus,
                                          ds_loss_weights)
    from e2enet_tpu.training import dsff
    from e2enet_tpu.training.checkpoint import save_checkpoint
    from e2enet_tpu.training.train_state import (create_train_state,
                                                 make_mask_update_step,
                                                 make_train_step)
    from e2enet_tpu.utils.files import save_pickle

    on_tpu = jax.devices()[0].platform != "cpu"
    model = ShiftUNetPlusPlus(
        input_channels=1, num_classes=NCLASS, pool_op_kernel_sizes=POOLS,
        base_num_features=BASE, compute_dtype=jnp.bfloat16, fused=on_tpu,
        remat=False)
    x0 = jnp.zeros((1, *PATCH, 1), jnp.bfloat16)
    params = jax.jit(model.init)(jax.random.PRNGKey(args.seed),
                                 x0)["params"]

    masks = None
    if mode == "row":
        masks = dsff.init_masks_row(params, 0.2, jax.random.PRNGKey(1),
                                    density_48_override=0.2)
    state = create_train_state(params, masks, seed=args.seed)
    n_out = model.num_ds_outputs()
    weights = ds_loss_weights(len(POOLS), n_out)
    step_fn = make_train_step(model, weights)
    mask_update = (make_mask_update_step("random", granularity="row")
                   if masks is not None else None)

    batches = [(jnp.asarray(v), tuple(jnp.asarray(t) for t in ts))
               for v, ts in batches_np]
    t0 = time.time()
    for i in range(args.steps):
        data, targets = batches[i % len(batches)]
        lr = 0.01 * (1 - i / args.steps) ** 0.9
        state, metrics = step_fn(state, data, targets, jnp.float32(lr))
        if mask_update is not None and (i + 1) % args.update_frequency == 0:
            dr = dsff.cosine_death_rate(
                jnp.asarray(i + 1, jnp.float32), 0.5, args.steps)
            state = mask_update(state, dr)
        if (i + 1) % 100 == 0:
            print(f"[{mode}] step {i+1}: loss="
                  f"{float(metrics['loss']):.4f} ({time.time()-t0:.0f}s)",
                  flush=True)

    from e2enet_tpu.plans import Plans
    fold_dir = os.path.join(args.out_dir, mode, "fold_0")
    os.makedirs(fold_dir, exist_ok=True)
    ckpt = os.path.join(fold_dir, "shiftConvPP_model_final_checkpoint.model")
    sidecar = {
        "init": {"fold": 0, "stage": 0, "tconv": "shiftConvPP",
                 "batch_dice": True, "base_num_features": BASE,
                 "cascade": False},
        "name": "TPUTrainer",
        "class": "e2enet_tpu.training.trainer.TPUTrainer",
        "plans": Plans.from_reference_pickle(make_plans_dict()).to_dict(),
    }
    save_checkpoint(ckpt, state, 0,
                    {"source": "experiments/fidelity_trained_run.py",
                     "mode": mode, "steps": args.steps}, sidecar)
    print(f"[{mode}] saved -> {ckpt}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--update_frequency", type=int, default=25)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--n_batches", type=int, default=6)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--modes", nargs="+", default=["dense", "row"])
    ap.add_argument("--gen", default="spheres",
                    choices=["spheres", "shells"])
    ap.add_argument("--out_dir", default="/tmp/fidelity_models")
    args = ap.parse_args()
    global NCLASS
    NCLASS = {"spheres": 3, "shells": 4}[args.gen]

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    cum = np.cumprod(np.array(POOLS), axis=0)
    import jax.numpy as jnp  # noqa: F401  (backend init before factors)
    n_out = min(4, len(POOLS))
    factors = ([(1, 1, 1)]
               + [tuple(int(v) for v in c) for c in cum])[:n_out]
    rng = np.random.RandomState(5)
    batches_np = make_batches(rng, args.n_batches, args.batch, factors,
                              gen=args.gen)
    for mode in args.modes:
        train_one(mode, args, batches_np, factors)


if __name__ == "__main__":
    main()
