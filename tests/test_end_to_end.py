"""End-to-end pipeline on a tiny synthetic task, driven through the actual
CLI surfaces: plan_and_preprocess -> train (1 epoch, DSFF on) -> predict ->
evaluate. This is the fidelity test SURVEY.md §4 calls for (the reference
has no such test)."""
import os
import sys

import numpy as np
import pytest

from e2enet_tpu.io.nifti import NiftiImage, read_nifti, write_nifti
from e2enet_tpu.utils.files import join, load_json, maybe_mkdir_p, save_json

TASK = "Task099_SynthSpheres"
N_TRAIN = 6
N_TEST = 2
SHAPE = (20, 24, 22)      # (z, y, x) array shape
SPACING = (1.0, 1.0, 1.5)  # ITK (x, y, z)


def _make_case(rng, with_sphere=True):
    vol = np.zeros(SHAPE, np.float32)
    # body: an ellipsoid of noise inside zero background (so cropping and
    # nonzero-mask logic are exercised)
    zz, yy, xx = np.meshgrid(*[np.arange(s) for s in SHAPE], indexing="ij")
    c = [s / 2 for s in SHAPE]
    body = (((zz - c[0]) / (c[0] * 0.9)) ** 2
            + ((yy - c[1]) / (c[1] * 0.9)) ** 2
            + ((xx - c[2]) / (c[2] * 0.9)) ** 2) < 1
    vol[body] = rng.rand(body.sum()).astype(np.float32) + 0.5
    seg = np.zeros(SHAPE, np.uint8)
    if with_sphere:
        # class 1: bright sphere; class 2: dark sphere
        for cls, (dz, dy, dx, r, val) in enumerate(
                [(0, -3, -3, 3.0, 3.0), (2, 3, 3, 2.5, -1.5)], start=1):
            m = ((zz - c[0] - dz) ** 2 + (yy - c[1] - dy) ** 2
                 + (xx - c[2] - dx) ** 2) < r ** 2
            m = m & body
            vol[m] = val + 0.1 * rng.rand(m.sum()).astype(np.float32)
            seg[m] = cls
    return vol, seg


@pytest.fixture(scope="module")
def synth_env(tmp_path_factory):
    base = tmp_path_factory.mktemp("nnunet_env")
    raw_base = base / "raw"
    preproc = base / "preprocessed"
    results = base / "results"
    for d in (raw_base, preproc, results):
        d.mkdir(parents=True, exist_ok=True)
    os.environ["nnUNet_raw_data_base"] = str(raw_base)
    os.environ["nnUNet_preprocessed"] = str(preproc)
    os.environ["RESULTS_FOLDER"] = str(results)

    task_dir = raw_base / "nnUNet_raw_data" / TASK
    for sub in ("imagesTr", "labelsTr", "imagesTs", "labelsTs"):
        (task_dir / sub).mkdir(parents=True, exist_ok=True)

    rng = np.random.RandomState(0)
    training = []
    for i in range(N_TRAIN):
        vol, seg = _make_case(rng)
        name = f"sphere_{i:03d}"
        write_nifti(str(task_dir / "imagesTr" / f"{name}_0000.nii.gz"),
                    NiftiImage(vol, SPACING))
        write_nifti(str(task_dir / "labelsTr" / f"{name}.nii.gz"),
                    NiftiImage(seg, SPACING))
        training.append({"image": f"./imagesTr/{name}.nii.gz",
                         "label": f"./labelsTr/{name}.nii.gz"})
    for i in range(N_TEST):
        vol, seg = _make_case(rng)
        name = f"spheretest_{i:03d}"
        write_nifti(str(task_dir / "imagesTs" / f"{name}_0000.nii.gz"),
                    NiftiImage(vol, SPACING))
        write_nifti(str(task_dir / "labelsTs" / f"{name}.nii.gz"),
                    NiftiImage(seg, SPACING))

    save_json({
        "name": "SynthSpheres", "description": "tiny synthetic e2e task",
        "tensorImageSize": "4D", "reference": "", "licence": "", "release": "",
        "modality": {"0": "MR"},
        "labels": {"0": "background", "1": "bright", "2": "dark"},
        "numTraining": N_TRAIN, "numTest": N_TEST,
        "training": training,
        "test": [f"./imagesTs/spheretest_{i:03d}.nii.gz"
                 for i in range(N_TEST)],
    }, str(task_dir / "dataset.json"))
    return {"base": base, "task_dir": task_dir, "results": results,
            "preproc": preproc}


def test_nifti_roundtrip(synth_env):
    task_dir = synth_env["task_dir"]
    f = str(task_dir / "imagesTr" / "sphere_000_0000.nii.gz")
    img = read_nifti(f)
    assert img.array.shape == SHAPE
    assert img.spacing == pytest.approx(SPACING)


def test_full_pipeline(synth_env):
    from e2enet_tpu.cli import plan_and_preprocess, train, predict, evaluate

    # ---- 1. plan & preprocess (with integrity verification)
    plan_and_preprocess.main(["-t", "99", "--verify_dataset_integrity",
                              "-tf", "1", "-tl", "1"])
    preproc_task = synth_env["preproc"] / TASK
    plans_file = preproc_task / "nnUNetPlansv2.1_plans_3D.json"
    assert plans_file.exists()
    plans = load_json(str(plans_file))
    assert plans["num_classes"] == 2
    stage_dirs = [d for d in os.listdir(preproc_task)
                  if d.startswith("nnUNetData_plans")]
    assert len(stage_dirs) >= 1

    # ---- 2. train 2 epochs with DSFF sparse on, tiny net
    train.main(["--task", "99", "--fold", "0", "--Tconv", "shiftConvPP",
                "--epochs", "2", "--batches", "3", "--val_batches", "1",
                "--base_features", "8", "--fp32",
                "--sparse", "true", "--density", "0.3",
                "--update_frequency", "4"])
    results = synth_env["results"]
    model_dir = (results / "nnUNet" / "3d_fullres" / TASK
                 / "TPUTrainer__nnUNetPlansv2.1" / "fold_0")
    ckpt = model_dir / "shiftConvPP_model_final_checkpoint.model"
    assert ckpt.exists(), os.listdir(model_dir)
    assert (model_dir / "progress.png").exists()
    assert (model_dir / "validation_raw" / "summary.json").exists()
    assert (model_dir.parent / ".." / "..").exists()
    # postprocessing decided on the validation set
    assert (model_dir / "postprocessing.json").exists()

    # ---- 3. predict the test set
    out_dir = synth_env["base"] / "predictions"
    predict.main(["-i", str(synth_env["task_dir"] / "imagesTs"),
                  "-o", str(out_dir), "-t", "99", "-f", "0",
                  "--Tconv", "shiftConvPP", "--step_size", "0.7",
                  "--disable_postprocessing"])
    preds = sorted(os.listdir(out_dir))
    assert f"spheretest_000.nii.gz" in preds
    pred = read_nifti(str(out_dir / "spheretest_000.nii.gz"))
    ref = read_nifti(str(synth_env["task_dir"] / "labelsTs"
                         / "spheretest_000.nii.gz"))
    assert pred.array.shape == ref.array.shape
    assert pred.spacing == pytest.approx(ref.spacing)
    assert set(np.unique(pred.array)).issubset({0, 1, 2})

    # ---- 3b. multi-chip predict (tile grid sharded over a 2-device mesh)
    # must produce identical labels to the single-device run
    out_dir_mc = synth_env["base"] / "predictions_mc"
    predict.main(["-i", str(synth_env["task_dir"] / "imagesTs"),
                  "-o", str(out_dir_mc), "-t", "99", "-f", "0",
                  "--Tconv", "shiftConvPP", "--step_size", "0.7",
                  "--disable_postprocessing", "--num_devices", "2"])
    for f in preds:
        a = read_nifti(str(out_dir / f)).array
        b = read_nifti(str(out_dir_mc / f)).array
        assert (a == b).mean() > 0.999, f"multi-chip predict diverged on {f}"

    # ---- 3c. all_in_gpu (f16 accumulators, the reference's fast mode):
    # must run and broadly agree — near-tie voxels of this 2-epoch model
    # may legitimately flip under f16 rounding
    out_dir_f16 = synth_env["base"] / "predictions_f16"
    predict.main(["-i", str(synth_env["task_dir"] / "imagesTs"),
                  "-o", str(out_dir_f16), "-t", "99", "-f", "0",
                  "--Tconv", "shiftConvPP", "--step_size", "0.7",
                  "--disable_postprocessing", "--all_in_gpu", "True"])
    for f in preds:
        a = read_nifti(str(out_dir / f)).array
        b = read_nifti(str(out_dir_f16 / f)).array
        assert (a == b).mean() > 0.9, f"all_in_gpu diverged on {f}"

    # ---- 4. evaluate
    evaluate.main(["-ref", str(synth_env["task_dir"] / "labelsTs"),
                   "-pred", str(out_dir), "-l", "1", "2"])
    summary = load_json(str(out_dir / "summary.json"))
    assert "results" in summary and "mean" in summary["results"]
    assert "Dice" in summary["results"]["mean"]["1"]
    print("test-set mean Dice:",
          {k: v["Dice"] for k, v in summary["results"]["mean"].items()})


def test_2d_pipeline(synth_env):
    """2D path: plan2d -> train --network 2d -> predict -m 2d."""
    from e2enet_tpu.cli import plan_and_preprocess, train, predict

    plan_and_preprocess.main(["-t", "99", "-pl3d", "None",
                              "-pl2d", "ExperimentPlanner2D_v21",
                              "-tf", "1", "-tl", "1"])
    preproc_task = synth_env["preproc"] / TASK
    plans = load_json(str(preproc_task / "nnUNetPlansv2.1_plans_2D.json"))
    stage = plans["plans_per_stage"]["0"]
    assert stage["patch_size"][0] == 1
    assert all(p[0] == 1 for p in stage["pool_op_kernel_sizes"])

    train.main(["--task", "99", "--network", "2d", "--fold", "0",
                "--Tconv", "shiftConvPP", "--epochs", "1", "--batches", "2",
                "--val_batches", "1", "--base_features", "8", "--fp32"])
    results = synth_env["results"]
    model_dir = (results / "nnUNet" / "2d" / TASK
                 / "TPUTrainer__nnUNetPlansv2.1" / "fold_0")
    assert (model_dir / "shiftConvPP_model_final_checkpoint.model").exists()

    out_dir = synth_env["base"] / "predictions_2d"
    predict.main(["-i", str(synth_env["task_dir"] / "imagesTs"),
                  "-o", str(out_dir), "-t", "99", "-m", "2d", "-f", "0",
                  "--Tconv", "shiftConvPP", "--disable_postprocessing",
                  "--mode", "fast"])
    pred = read_nifti(str(out_dir / "spheretest_000.nii.gz"))
    ref = read_nifti(str(synth_env["task_dir"] / "labelsTs"
                         / "spheretest_000.nii.gz"))
    assert pred.array.shape == ref.array.shape


def test_continue_training_and_ensemble(synth_env):
    """-c resume restores epoch + state; predict with save_npz; ensemble
    merge of two 'models' (same model twice) reproduces its softmax."""
    from e2enet_tpu.cli import train, predict
    # resume: epochs 3 continues from the epoch-2 checkpoint of
    # test_full_pipeline
    train.main(["--task", "99", "--fold", "0", "--Tconv", "shiftConvPP",
                "--epochs", "3", "--batches", "2", "--val_batches", "1",
                "--base_features", "8", "--fp32", "--sparse", "true",
                "--density", "0.3", "--update_frequency", "4", "-c"])
    results = synth_env["results"]
    model_dir = (results / "nnUNet" / "3d_fullres" / TASK
                 / "TPUTrainer__nnUNetPlansv2.1" / "fold_0")
    from e2enet_tpu.training.checkpoint import load_checkpoint
    _, epoch, meta = load_checkpoint(
        str(model_dir / "shiftConvPP_model_final_checkpoint.model"))
    assert epoch == 3
    assert len(meta["all_tr_losses"]) == 3

    # predict with saved softmax npz, then ensemble-merge with itself
    out1 = synth_env["base"] / "pred_npz"
    predict.main(["-i", str(synth_env["task_dir"] / "imagesTs"),
                  "-o", str(out1), "-t", "99", "-f", "0",
                  "--Tconv", "shiftConvPP", "-z",
                  "--disable_postprocessing"])
    assert (out1 / "spheretest_000.npz").exists()
    from e2enet_tpu.inference.ensemble_predictions import merge
    out_ens = synth_env["base"] / "pred_ens"
    merge([str(out1), str(out1)], str(out_ens), override=True)
    a = read_nifti(str(out1 / "spheretest_000.nii.gz")).array
    b = read_nifti(str(out_ens / "spheretest_000.nii.gz")).array
    # mean of identical softmax == the softmax (modulo fp16 storage + order-3
    # vs order-1 resample of the ensemble path) — labels should mostly agree
    assert (a == b).mean() > 0.95


def test_tconv_ori_and_nodff(synth_env):
    """The plain-decoder family ('ori' Generic_UNet equivalent and the
    nodff ablation) trains and predicts end-to-end."""
    from e2enet_tpu.cli import train, predict
    for tconv in ("ori", "shiftConvPP_nodff"):
        train.main(["--task", "99", "--fold", "1", "--Tconv", tconv,
                    "--epochs", "1", "--batches", "2", "--val_batches", "1",
                    "--base_features", "8", "--fp32"])
        out_dir = synth_env["base"] / f"preds_{tconv}"
        predict.main(["-i", str(synth_env["task_dir"] / "imagesTs"),
                      "-o", str(out_dir), "-t", "99", "-f", "1",
                      "--Tconv", tconv, "--disable_postprocessing",
                      "--mode", "fast"])
        pred = read_nifti(str(out_dir / "spheretest_000.nii.gz"))
        assert pred.array.shape == SHAPE
