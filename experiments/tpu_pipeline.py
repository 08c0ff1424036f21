"""Full CLI pipeline smoke on the REAL TPU: plan_and_preprocess -> train
(few epochs, bf16, fused+quadrant production defaults) -> predict (TTA) ->
evaluate, on the tiny synthetic sphere task from tests/test_end_to_end.py.

This is the production-path validation the CPU suite can't give (CPU runs
the XLA path; the TPU trainer takes the fused/quadrant Pallas kernels).

Run: env PYTHONPATH=/root/repo:/root/.axon_site python -u \
    experiments/tpu_pipeline.py [workdir]
"""
import os
import shutil
import sys

import numpy as np


def main():
    base = sys.argv[1] if len(sys.argv) > 1 else "/tmp/tpu_pipeline"
    if os.path.isdir(base):
        shutil.rmtree(base)
    raw_base = os.path.join(base, "raw")
    preproc = os.path.join(base, "preprocessed")
    results = os.path.join(base, "results")
    for d in (raw_base, preproc, results):
        os.makedirs(d, exist_ok=True)
    os.environ["nnUNet_raw_data_base"] = raw_base
    os.environ["nnUNet_preprocessed"] = preproc
    os.environ["RESULTS_FOLDER"] = results

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "tests"))
    from test_end_to_end import _make_case, SHAPE, SPACING, TASK, N_TRAIN, \
        N_TEST
    from e2enet_tpu.io.nifti import NiftiImage, write_nifti
    from e2enet_tpu.utils.files import save_json

    task_dir = os.path.join(raw_base, "nnUNet_raw_data", TASK)
    for sub in ("imagesTr", "labelsTr", "imagesTs", "labelsTs"):
        os.makedirs(os.path.join(task_dir, sub), exist_ok=True)
    rng = np.random.RandomState(0)
    training = []
    for i in range(N_TRAIN):
        vol, seg = _make_case(rng)
        name = f"sphere_{i:03d}"
        write_nifti(os.path.join(task_dir, "imagesTr",
                                 f"{name}_0000.nii.gz"),
                    NiftiImage(vol, SPACING))
        write_nifti(os.path.join(task_dir, "labelsTr", f"{name}.nii.gz"),
                    NiftiImage(seg, SPACING))
        training.append({"image": f"./imagesTr/{name}.nii.gz",
                         "label": f"./labelsTr/{name}.nii.gz"})
    for i in range(N_TEST):
        vol, seg = _make_case(rng)
        name = f"spheretest_{i:03d}"
        write_nifti(os.path.join(task_dir, "imagesTs",
                                 f"{name}_0000.nii.gz"),
                    NiftiImage(vol, SPACING))
        write_nifti(os.path.join(task_dir, "labelsTs", f"{name}.nii.gz"),
                    NiftiImage(seg, SPACING))
    save_json({
        "name": "SynthSpheres", "description": "tpu pipeline smoke",
        "tensorImageSize": "4D", "reference": "", "licence": "",
        "release": "", "modality": {"0": "MR"},
        "labels": {"0": "background", "1": "bright", "2": "dark"},
        "numTraining": N_TRAIN, "numTest": N_TEST,
        "training": training,
        "test": [f"./imagesTs/spheretest_{i:03d}.nii.gz"
                 for i in range(N_TEST)],
    }, os.path.join(task_dir, "dataset.json"))

    from e2enet_tpu.cli import plan_and_preprocess, train, predict, evaluate

    print("== plan_and_preprocess", flush=True)
    plan_and_preprocess.main(["-t", "99", "--verify_dataset_integrity",
                              "-tf", "1", "-tl", "1"])

    print("== train (bf16, fused+quadrant production defaults)", flush=True)
    epochs = os.environ.get("PIPE_EPOCHS", "3")
    batches = os.environ.get("PIPE_BATCHES", "4")
    feats = os.environ.get("PIPE_FEATURES", "16")
    train.main(["--task", "99", "--fold", "0", "--Tconv", "shiftConvPP",
                "--epochs", epochs, "--batches", batches,
                "--val_batches", "2", "--base_features", feats,
                "--sparse", "true", "--density", "0.3",
                "--update_frequency", "4"])

    print("== predict (TTA, fold 0)", flush=True)
    out_dir = os.path.join(base, "preds")
    predict.main(["-i", os.path.join(task_dir, "imagesTs"),
                  "-o", out_dir, "-t", "99", "-f", "0",
                  "--Tconv", "shiftConvPP", "--step_size", "0.7",
                  "--disable_postprocessing"])

    print("== evaluate", flush=True)
    evaluate.main(["-ref", os.path.join(task_dir, "labelsTs"),
                   "-pred", out_dir, "-l", "1", "2"])
    import json
    with open(os.path.join(out_dir, "summary.json")) as f:
        summary = json.load(f)
    dice = {k: v["Dice"] for k, v in summary["results"]["mean"].items()}
    print("mean Dice per class:", dice, flush=True)
    print("PIPELINE OK", flush=True)


if __name__ == "__main__":
    main()
