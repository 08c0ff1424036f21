"""Accuracy-fidelity harness (VERDICT r03 weak #3 / next #5).

Two modes:

1) --synthetic: the largest converted-checkpoint check that runs WITHOUT
   real data: a reference torch Generic_UNetPlusPlus (random init, saved
   in the reference .model format) is converted to a native checkpoint;
   a multi-organ synthetic 192^3 volume goes through BOTH
     * the reference predict_3D (torch CPU, neural_network.py:286-426) and
     * OUR full predict_from_folder pipeline (TPU if attached, else CPU)
   and the harness reports segmentation agreement, per-class Dice of ours
   vs the reference output, and softmax MAE — plus the same for the bf16
   production path (its Dice delta vs exact f32). Results are appended to
   experiments/logs/fidelity_synthetic.json; record the headline in
   BASELINE.md.

2) --amos RAW_DIR --ref_checkpoint CKPT [--ref_summary SUMMARY]: the full
   AMOS/BTCV fold-0 fidelity check, ready to run UNATTENDED the day real
   data mounts: convert -> plan+preprocess -> predict the fold-0
   validation split with the converted reference checkpoint -> evaluate
   vs ground truth -> compare mean foreground Dice against the reference
   summary.json (target: within 0.5 points, BASELINE.json north-star).

Usage (documented in CLAUDE.md):
  python experiments/fidelity_check.py --synthetic [--tta] [--vol 192]
  env PYTHONPATH=/root/repo:/root/.axon_site \
    python experiments/fidelity_check.py --amos /data/AMOS22 \
      --ref_checkpoint /path/model_final_checkpoint.model
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

LOGS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "logs")


def _dice(a, b, c):
    ta, tb = a == c, b == c
    den = ta.sum() + tb.sum()
    return float(2 * (ta & tb).sum() / den) if den else float("nan")


def synthetic(args):
    import torch
    import torch.nn as nn
    import jax.numpy as jnp
    sys.path.insert(0, "/root/reference")
    from tests.conftest import stub_reference_deps, import_reference_unetpp
    stub_reference_deps()
    Ref = import_reference_unetpp()

    patch = tuple(args.patch)
    pools = [[2, 2, 2]] * 5
    nclass = args.classes
    torch.manual_seed(42)
    net = Ref(patch, 1, args.base, nclass, 5, 2, 2, nn.Conv3d,
              nn.InstanceNorm3d, {'eps': 1e-5, 'affine': True}, nn.Dropout3d,
              {'p': 0, 'inplace': True}, nn.LeakyReLU,
              {'negative_slope': 1e-2, 'inplace': True}, True, False,
              lambda x: x, None, pools, [[1, 3, 3]] * 6, False, True, True)
    net.eval()
    net.do_ds = False
    net.inference_apply_nonlin = lambda x: torch.softmax(x, 1)

    import tempfile
    tmp = tempfile.mkdtemp(prefix="fidelity_")
    ckpt = os.path.join(tmp, "shiftConvPP_model_final_checkpoint.model")
    plans = {
        "num_modalities": 1, "modalities": {0: "CT"},
        "normalization_schemes": {0: "nonCT"},
        "dataset_properties": {}, "num_classes": nclass - 1,
        "all_classes": list(range(1, nclass)),
        "base_num_features": args.base,
        "use_mask_for_norm": {0: False},
        "transpose_forward": [0, 1, 2], "transpose_backward": [0, 1, 2],
        "data_identifier": "nnUNetData_plans_v2.1", "conv_per_stage": 2,
        "plans_per_stage": {0: {
            "batch_size": 2, "num_pool_per_axis": [5, 5, 5],
            "patch_size": list(patch),
            "median_patient_size_in_voxels": list(patch),
            "current_spacing": [1, 1, 1], "original_spacing": [1, 1, 1],
            "do_dummy_2D_data_aug": False,
            "pool_op_kernel_sizes": pools,
            "conv_kernel_sizes": [[1, 3, 3]] * 6}},
    }
    torch.save({"epoch": 1, "state_dict": {
        k: v.cpu() for k, v in net.state_dict().items()},
        "optimizer_state_dict": None, "lr_scheduler_state_dict": None,
        "plot_stuff": ([], [], [], [])}, ckpt)
    from e2enet_tpu.utils.files import save_pickle
    save_pickle({"init": (None,) * 9, "name": "nnUNetTrainer_simple",
                 "class": "...", "plans": plans}, ckpt + ".pkl")
    from e2enet_tpu.models.torch_checkpoint import (
        convert_reference_model_to_native)
    fold_dir = os.path.join(tmp, "model", "fold_0")
    os.makedirs(fold_dir)
    convert_reference_model_to_native(
        ckpt, os.path.join(fold_dir,
                           "shiftConvPP_model_final_checkpoint.model"),
        base_num_features=args.base)

    # multi-organ-ish synthetic volume: smooth random field + blobs so the
    # random net's argmax has non-trivial structure; nonzero everywhere
    rng = np.random.RandomState(5)
    V = args.vol
    vol = rng.randn(V, V, V).astype(np.float32)
    from scipy.ndimage import gaussian_filter
    vol = gaussian_filter(vol, 4) * 8 + rng.randn(V, V, V) * 0.5 + 5
    from e2enet_tpu.io.nifti import NiftiImage, read_nifti, write_nifti
    in_dir = os.path.join(tmp, "input")
    os.makedirs(in_dir)
    write_nifti(os.path.join(in_dir, "case1_0000.nii.gz"),
                NiftiImage(vol.copy(), (1.0, 1.0, 1.0)))

    # ---- reference predict_3D (torch CPU)
    data = vol[None].astype(np.float32)
    data = (data - data.mean()) / (data.std() + 1e-8)
    t0 = time.time()
    with torch.no_grad():
        seg_ref, _ = net.predict_3D(
            data, do_mirroring=bool(args.tta), mirror_axes=(0, 1, 2),
            use_sliding_window=True, step_size=0.5, patch_size=patch,
            regions_class_order=None, use_gaussian=True,
            pad_border_mode="constant", pad_kwargs={"constant_values": 0},
            all_in_gpu=False, verbose=False)
    t_ref = time.time() - t0
    print(f"reference predict_3D (torch cpu): {t_ref:.1f}s")

    from e2enet_tpu.inference.predictor import predict_from_folder
    results = {"vol": V, "patch": list(patch), "base": args.base,
               "classes": nclass, "tta": bool(args.tta),
               "ref_seconds": t_ref}
    for name, dtype in [("f32", jnp.float32), ("bf16", jnp.bfloat16)]:
        out_dir = os.path.join(tmp, f"out_{name}")
        t0 = time.time()
        predict_from_folder(
            os.path.join(tmp, "model"), in_dir, out_dir, [0],
            save_npz=False, do_tta=bool(args.tta), step_size=0.5,
            disable_postprocessing=True, compute_dtype=dtype)
        dt = time.time() - t0
        seg = read_nifti(os.path.join(out_dir, "case1.nii.gz")).array
        agree = float((seg == seg_ref).mean())
        dices = [_dice(seg, seg_ref, c) for c in range(1, nclass)]
        results[name] = {
            "seconds": dt, "agreement": agree,
            "mean_fg_dice_vs_ref": float(np.nanmean(dices)),
            "per_class_dice_vs_ref": dices,
        }
        print(f"{name}: agreement {agree:.5f}, mean fg Dice vs ref "
              f"{np.nanmean(dices):.5f} ({dt:.1f}s)")

    os.makedirs(LOGS, exist_ok=True)
    out = os.path.join(LOGS, "fidelity_synthetic.json")
    hist = json.load(open(out)) if os.path.isfile(out) else []
    hist.append(results)
    json.dump(hist, open(out, "w"), indent=1)
    print("recorded ->", out)


def from_native(args):
    """Trained-checkpoint bf16 fidelity (VERDICT r04 weak #2 / next #3):
    a NATIVE trained model (e.g. a granularity_study run) is exported to
    the reference torch network (models/torch_import.
    export_unetpp_state_dict), and in-distribution test volumes go through
      * reference predict_3D on the exported weights (torch CPU, f32) and
      * our predict_case in f32 AND bf16 (the production path),
    all on the SAME preprocessed arrays. Reported: ours-vs-ref agreement/
    Dice per dtype + bf16-vs-f32 — on a TRAINED net, replacing the
    random-init "margins" conjecture with a measurement.
    Reference oracle: neural_network.py:286-426 (predict_3D TTA math)."""
    import torch
    import torch.nn as nn
    import jax.numpy as jnp
    sys.path.insert(0, "/root/reference")
    from tests.conftest import stub_reference_deps, import_reference_unetpp
    stub_reference_deps()
    Ref = import_reference_unetpp()

    from e2enet_tpu.inference.predictor import ModelBundle, predict_case
    from e2enet_tpu.models.torch_import import export_unetpp_state_dict

    model_dir = args.from_native
    bundles = {
        "f32": ModelBundle(model_dir, [0], "shiftConvPP",
                           compute_dtype=jnp.float32),
        "bf16": ModelBundle(model_dir, [0], "shiftConvPP",
                            compute_dtype=jnp.bfloat16),
    }
    b0 = bundles["f32"]
    plans = b0.plans
    stage_plan = b0.stage_plan
    pools = [list(map(int, p)) for p in stage_plan.pool_op_kernel_sizes]
    P = len(pools)
    patch = tuple(int(i) for i in stage_plan.patch_size)
    base = b0.sidecar_init.get("base_num_features", 48)
    nclass = b0.num_classes
    import jax
    params_np = jax.tree_util.tree_map(np.asarray, b0.fold_params[0])
    sd = export_unetpp_state_dict(params_np, num_pool=P,
                                  num_conv_per_stage=plans.conv_per_stage)
    torch.manual_seed(0)
    net = Ref(patch, plans.num_modalities, base, nclass, P,
              plans.conv_per_stage, 2, nn.Conv3d, nn.InstanceNorm3d,
              {'eps': 1e-5, 'affine': True}, nn.Dropout3d,
              {'p': 0, 'inplace': True}, nn.LeakyReLU,
              {'negative_slope': 1e-2, 'inplace': True}, True, False,
              lambda x: x, None, pools, [[1, 3, 3]] * (P + 1), False,
              True, True)
    missing, unexpected = net.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v))
         for k, v in sd.items()}, strict=True)
    assert not missing and not unexpected
    net.eval()
    net.do_ds = False
    net.inference_apply_nonlin = lambda x: torch.softmax(x, 1)

    # in-distribution cases from the study generator
    import granularity_study as gs
    gen = {"spheres": gs.make_case_spheres,
           "shells": gs.make_case_shells}[args.gen]
    import tempfile
    tmp = tempfile.mkdtemp(prefix="fidelity_native_")
    from e2enet_tpu.io.nifti import NiftiImage, write_nifti
    rng = np.random.RandomState(77)
    preprocessor = b0.make_preprocessor()
    tgt_spacing = [float(s) for s in stage_plan.current_spacing]
    results = {"model_dir": model_dir, "gen": args.gen, "patch": list(patch),
               "tta": bool(args.tta), "cases": []}
    for i in range(args.n_cases):
        vol, _seg = gen(rng)
        f = os.path.join(tmp, f"case{i}_0000.nii.gz")
        write_nifti(f, NiftiImage(vol, gs.SPACING))
        d, _s, props = preprocessor.preprocess_test_case([f], tgt_spacing)
        d = d.astype(np.float32)
        with torch.no_grad():
            seg_ref, _ = net.predict_3D(
                d, do_mirroring=bool(args.tta), mirror_axes=(0, 1, 2),
                use_sliding_window=True, step_size=0.5, patch_size=patch,
                regions_class_order=None, use_gaussian=True,
                pad_border_mode="constant",
                pad_kwargs={"constant_values": 0},
                all_in_gpu=False, verbose=False)
        segs = {}
        for name, bundle in bundles.items():
            probs = predict_case(bundle, d, do_tta=bool(args.tta),
                                 step_size=0.5)
            segs[name] = np.asarray(probs).argmax(0)
        case = {}
        for name in segs:
            dices = [_dice(segs[name], seg_ref, c)
                     for c in range(1, nclass)]
            case[name] = {
                "agreement_vs_ref": float((segs[name] == seg_ref).mean()),
                "mean_fg_dice_vs_ref": float(np.nanmean(dices))}
        bd = [_dice(segs["bf16"], segs["f32"], c) for c in range(1, nclass)]
        case["bf16_vs_f32"] = {
            "agreement": float((segs["bf16"] == segs["f32"]).mean()),
            "mean_fg_dice": float(np.nanmean(bd))}
        print(f"case {i}: f32-vs-ref dice "
              f"{case['f32']['mean_fg_dice_vs_ref']:.5f}  bf16-vs-ref "
              f"{case['bf16']['mean_fg_dice_vs_ref']:.5f}  bf16-vs-f32 "
              f"{case['bf16_vs_f32']['mean_fg_dice']:.5f}", flush=True)
        results["cases"].append(case)

    for key in ("f32", "bf16"):
        results[f"{key}_mean_fg_dice_vs_ref"] = float(np.nanmean(
            [c[key]["mean_fg_dice_vs_ref"] for c in results["cases"]]))
    results["bf16_vs_f32_mean_fg_dice"] = float(np.nanmean(
        [c["bf16_vs_f32"]["mean_fg_dice"] for c in results["cases"]]))
    print("MEAN: f32-vs-ref", results["f32_mean_fg_dice_vs_ref"],
          " bf16-vs-ref", results["bf16_mean_fg_dice_vs_ref"],
          " bf16-vs-f32", results["bf16_vs_f32_mean_fg_dice"])
    os.makedirs(LOGS, exist_ok=True)
    out = os.path.join(LOGS, "fidelity_trained.json")
    hist = json.load(open(out)) if os.path.isfile(out) else []
    hist.append(results)
    json.dump(hist, open(out, "w"), indent=1)
    print("recorded ->", out)


def amos(args):
    """Unattended AMOS/BTCV fold-0 fidelity run (for when data mounts)."""
    from e2enet_tpu import paths
    from e2enet_tpu.dataset_conversion.tasks import convert_amos2022
    from e2enet_tpu.cli.plan_and_preprocess import main as ppmain
    from e2enet_tpu.models.torch_checkpoint import (
        convert_reference_model_to_native)
    from e2enet_tpu.inference.predictor import predict_from_folder
    from e2enet_tpu.evaluation.evaluator import evaluate_folder
    from e2enet_tpu.utils.files import load_json, join

    task_id = args.task_id
    convert_amos2022(args.amos, task_id=task_id)
    ppmain(["-t", str(task_id)])

    task_name = [d for d in os.listdir(join(
        paths.get_raw_data_dir(), "nnUNet_raw_data"))
        if d.startswith(f"Task{task_id:03d}")][0]
    model_dir = join(args.workdir or "/tmp/fidelity_amos", "model")
    fold_dir = join(model_dir, "fold_0")
    os.makedirs(fold_dir, exist_ok=True)
    convert_reference_model_to_native(
        args.ref_checkpoint,
        join(fold_dir, "shiftConvPP_model_final_checkpoint.model"),
        base_num_features=args.base)

    raw_images = join(paths.get_raw_data_dir(), "nnUNet_raw_data",
                      task_name, "imagesTr")
    labels = join(paths.get_raw_data_dir(), "nnUNet_raw_data",
                  task_name, "labelsTr")
    out_dir = join(args.workdir or "/tmp/fidelity_amos", "pred")
    predict_from_folder(model_dir, raw_images, out_dir, [0],
                        save_npz=False, do_tta=True, step_size=0.5,
                        disable_postprocessing=True)
    summary = evaluate_folder(labels, out_dir, labels=None)
    ours = summary["results"]["mean"]
    fg = np.nanmean([ours[c]["Dice"] for c in ours if int(c) != 0])
    print(f"OUR fold-0 mean foreground Dice: {fg:.4f}")
    if args.ref_summary:
        ref = load_json(args.ref_summary)["results"]["mean"]
        rfg = np.nanmean([ref[c]["Dice"] for c in ref if int(c) != 0])
        print(f"reference mean foreground Dice: {rfg:.4f} "
              f"(delta {abs(fg - rfg) * 100:.2f} pts; target <= 0.5)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--from_native", default=None,
                    help="trained NATIVE model dir (contains fold_0): "
                         "trained-checkpoint bf16 fidelity vs the "
                         "reference torch net on exported weights")
    ap.add_argument("--gen", default="spheres",
                    choices=["spheres", "shells"],
                    help="--from_native test-volume generator")
    ap.add_argument("--n_cases", type=int, default=3)
    ap.add_argument("--amos", default=None,
                    help="AMOS22 raw dir (imagesTr/labelsTr/dataset.json)")
    ap.add_argument("--ref_checkpoint", default=None)
    ap.add_argument("--ref_summary", default=None)
    ap.add_argument("--workdir", default=None)
    ap.add_argument("--task_id", type=int, default=216)
    ap.add_argument("--vol", type=int, default=192)
    ap.add_argument("--patch", type=int, nargs=3, default=[128, 128, 128])
    ap.add_argument("--base", type=int, default=8,
                    help="base features of the synthetic reference net "
                         "(8 keeps the torch-CPU side tractable)")
    ap.add_argument("--classes", type=int, default=14,
                    help="classes incl. background (AMOS-like 14)")
    ap.add_argument("--tta", action="store_true",
                    help="full 8x mirror TTA on BOTH sides (8x torch-CPU "
                         "cost; default off for the 192^3 synthetic run — "
                         "TTA parity is pinned by test_pipeline_parity)")
    args = ap.parse_args()
    if args.synthetic:
        synthetic(args)
    elif args.from_native:
        from_native(args)
    elif args.amos:
        assert args.ref_checkpoint, "--amos needs --ref_checkpoint"
        amos(args)
    else:
        raise SystemExit("pass --synthetic or --amos DIR")


if __name__ == "__main__":
    main()
