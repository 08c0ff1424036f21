"""Cascade end-to-end: force a 2-stage plan on the synthetic task, train
3d_lowres (fold 'all' -> predict_next_stage covers every case), train
3d_cascade_fullres, then cascade predict through the CLI."""
import os

import numpy as np
import pytest

from e2enet_tpu.io.nifti import read_nifti
from e2enet_tpu.utils.files import load_json, save_json

import test_end_to_end as T


@pytest.fixture(scope="module")
def cascade_env(tmp_path_factory):
    base = tmp_path_factory.mktemp("cascade_env")
    raw_base = base / "raw"
    preproc = base / "preprocessed"
    results = base / "results"
    for d in (raw_base, preproc, results):
        d.mkdir(parents=True, exist_ok=True)
    os.environ["nnUNet_raw_data_base"] = str(raw_base)
    os.environ["nnUNet_preprocessed"] = str(preproc)
    os.environ["RESULTS_FOLDER"] = str(results)

    task_dir = raw_base / "nnUNet_raw_data" / T.TASK
    for sub in ("imagesTr", "labelsTr", "imagesTs", "labelsTs"):
        (task_dir / sub).mkdir(parents=True, exist_ok=True)
    rng = np.random.RandomState(0)
    from e2enet_tpu.io.nifti import NiftiImage, write_nifti
    training = []
    for i in range(T.N_TRAIN):
        vol, seg = T._make_case(rng)
        name = f"sphere_{i:03d}"
        write_nifti(str(task_dir / "imagesTr" / f"{name}_0000.nii.gz"),
                    NiftiImage(vol, T.SPACING))
        write_nifti(str(task_dir / "labelsTr" / f"{name}.nii.gz"),
                    NiftiImage(seg, T.SPACING))
        training.append({"image": f"./imagesTr/{name}.nii.gz",
                         "label": f"./labelsTr/{name}.nii.gz"})
    vol, seg = T._make_case(rng)
    write_nifti(str(task_dir / "imagesTs" / "casetest_000_0000.nii.gz"),
                NiftiImage(vol, T.SPACING))
    save_json({"name": "SynthSpheres", "description": "",
               "tensorImageSize": "4D", "reference": "", "licence": "",
               "release": "", "modality": {"0": "MR"},
               "labels": {"0": "background", "1": "bright", "2": "dark"},
               "numTraining": T.N_TRAIN, "numTest": 1,
               "training": training,
               "test": ["./imagesTs/casetest_000.nii.gz"]},
              str(task_dir / "dataset.json"))
    return {"base": base, "task_dir": task_dir, "results": results,
            "preproc": preproc}


def test_cascade_pipeline(cascade_env, monkeypatch):
    from e2enet_tpu.cli import plan_and_preprocess, train, predict
    from e2enet_tpu.plans import Plans

    plan_and_preprocess.main(["-t", "99", "-tf", "1", "-tl", "1"])
    plans_file = str(cascade_env["preproc"] / T.TASK
                     / "nnUNetPlansv2.1_plans_3D.json")
    # the tiny task legitimately plans one stage; handcraft a second stage
    # (lowres = 2x spacing) so the cascade machinery is exercised for real
    plans_obj = Plans.load(plans_file)
    import copy
    stage0 = copy.deepcopy(plans_obj.plans_per_stage[0])
    stage0.current_spacing = [2 * s for s in stage0.current_spacing]
    stage0.patch_size = [max(1, p // 2 // 4 * 4) if i > 0 else
                         max(1, p // 2 // 2 * 2)
                         for i, p in enumerate(stage0.patch_size)]
    stage0.pool_op_kernel_sizes = [[2, 2, 2]]
    stage0.conv_kernel_sizes = [[3, 3, 3]] * 2
    stage0.num_pool_per_axis = [1, 1, 1]
    # keep patch divisible by pool product
    stage0.patch_size = [max(2, p - p % 2) for p in stage0.patch_size]
    plans_obj.plans_per_stage = {0: stage0,
                                 1: plans_obj.plans_per_stage[0]}
    plans_obj.num_stages = 2
    plans_obj.save(plans_file)

    # preprocess the new stage 0
    from e2enet_tpu.utils.registry import PREPROCESSORS
    pp = PREPROCESSORS.get(plans_obj.preprocessor_name)(
        plans_obj.normalization_schemes, plans_obj.use_mask_for_norm,
        plans_obj.transpose_forward, plans_obj.intensity_properties)
    cropped = str(cascade_env["base"] / "raw" / "nnUNet_cropped_data"
                  / T.TASK)
    pp.run([stage0.current_spacing, plans_obj.plans_per_stage[1]
            .current_spacing], cropped,
           str(cascade_env["preproc"] / T.TASK),
           plans_obj.data_identifier, 1)

    plans = load_json(plans_file)
    assert plans["num_stages"] == 2

    # 1. lowres on all cases (predict_next_stage then covers every case)
    train.main(["--task", "99", "--network", "3d_lowres", "--fold", "all",
                "--Tconv", "shiftConvPP", "--epochs", "1", "--batches", "2",
                "--val_batches", "1", "--base_features", "8", "--fp32"])
    stage1_dir = [d for d in os.listdir(cascade_env["preproc"] / T.TASK)
                  if d.endswith("_stage1")][0]
    seg_files = [f for f in os.listdir(cascade_env["preproc"] / T.TASK
                                       / stage1_dir)
                 if f.endswith("_segFromPrevStage.npz")]
    assert len(seg_files) == T.N_TRAIN

    # 2. cascade fullres
    train.main(["--task", "99", "--network", "3d_cascade_fullres",
                "--fold", "all", "--Tconv", "shiftConvPP", "--epochs", "1",
                "--batches", "2", "--val_batches", "1",
                "--base_features", "8", "--fp32"])

    # 3. cascade predict (auto-runs the lowres stage)
    out_dir = cascade_env["base"] / "preds_cascade"
    predict.main(["-i", str(cascade_env["task_dir"] / "imagesTs"),
                  "-o", str(out_dir), "-t", "99",
                  "-m", "3d_cascade_fullres", "-f", "all",
                  "--Tconv", "shiftConvPP", "--disable_postprocessing"])
    pred = read_nifti(str(out_dir / "casetest_000.nii.gz"))
    assert pred.array.shape == T.SHAPE
    assert set(np.unique(pred.array)).issubset({0, 1, 2})
