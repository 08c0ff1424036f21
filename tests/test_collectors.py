"""Result collectors / summaries / ranking (evaluation/collectors.py)."""
import os

import numpy as np

from e2enet_tpu.evaluation import collectors
from e2enet_tpu.utils.files import load_json, maybe_mkdir_p, save_json


def _summary(mean_dices):
    return {"results": {
        "mean": {str(i): {"Dice": d, "Jaccard": d / 2}
                 for i, d in enumerate(mean_dices)},
        "all": []}}


def _mk_tree(root, net, task, trainer, fold_dices, folds=(0, 1)):
    for f in folds:
        d = os.path.join(root, net, task, trainer, f"fold_{f}",
                         "validation_raw")
        maybe_mkdir_p(d)
        save_json(_summary(fold_dices[f]), os.path.join(d, "summary.json"))


def test_foreground_mean(tmp_path):
    p = str(tmp_path / "s.json")
    save_json(_summary([0.99, 0.8, 0.6]), p)
    collectors.foreground_mean(p)
    res = load_json(p)["results"]["mean"]
    np.testing.assert_allclose(res["mean"]["Dice"], 0.7)
    np.testing.assert_allclose(res["mean"]["Jaccard"], 0.35)


def test_summarize_and_csv(tmp_path, monkeypatch):
    root = str(tmp_path / "results")
    monkeypatch.setenv("RESULTS_FOLDER", root)
    _mk_tree(root, "3d_fullres", "Task001_Foo", "TPUTrainer__plansA",
             {0: [0.9, 0.8, 0.7], 1: [0.9, 0.6, 0.5]})
    _mk_tree(root, "2d", "Task001_Foo", "TPUTrainer__plansA",
             {0: [0.9, 0.5, 0.5], 1: [0.9, 0.5, 0.5]})
    written = collectors.summarize(
        ("1",), output_dir=str(tmp_path / "sums"), folds=(0, 1),
        results_dir=root)
    assert len(written) == 2
    by_name = {os.path.basename(w): w for w in written}
    full = [w for n, w in by_name.items() if "3d_fullres" in n][0]
    res = load_json(full)["results"]["mean"]
    np.testing.assert_allclose(res["1"]["Dice"], 0.7)   # (0.8+0.6)/2
    np.testing.assert_allclose(res["mean"]["Dice"], 0.65)

    csv = collectors.collect_results_csv(
        str(tmp_path / "out.csv"), folds=(0,), results_dir=root,
        output_dir=str(tmp_path / "sums_f0"))
    lines = open(csv).read().strip().splitlines()
    assert len(lines) == 3  # header + 2 configs
    assert any("3d_fullres" in ln and "0.7500" in ln for ln in lines)


def test_crawl_and_copy(tmp_path):
    src = tmp_path / "tree" / "a" / "fold_0"
    src.mkdir(parents=True)
    save_json({"x": 1}, str(src / "summary.json"))
    (tmp_path / "tree" / "b").mkdir()
    save_json({"x": 2}, str(tmp_path / "tree" / "b" / "summary.json"))
    out = str(tmp_path / "out")
    collectors.crawl_and_copy(str(tmp_path / "tree"), out)
    files = os.listdir(out)
    assert len(files) == 1 and "fold_0" in files[0]


def test_rank_candidates():
    results = {
        "trainerA": {"t1": 0.9, "t2": 0.8},
        "trainerB": {"t1": 0.8, "t2": 0.9},
        "trainerC": {"t1": 0.95, "t2": 0.85},
    }
    ranked = collectors.rank_candidates(results)
    assert ranked[0][1] == "trainerC"        # best mean rank
    assert len(ranked) == 3


def test_rank_trained_candidates(tmp_path, monkeypatch):
    root = str(tmp_path / "results")
    monkeypatch.setenv("RESULTS_FOLDER", root)
    _mk_tree(root, "3d_fullres", "Task001_Foo", "A__p",
             {0: [0.9, 0.9, 0.9]}, folds=(0,))
    _mk_tree(root, "3d_fullres", "Task001_Foo", "B__p",
             {0: [0.9, 0.5, 0.5]}, folds=(0,))
    ranked = collectors.rank_trained_candidates(
        ["Task001_Foo"], results_dir=root)
    assert ranked[0][1] == "A__p"


def test_write_plans_summary(tmp_path):
    from e2enet_tpu.plans import Plans, StagePlan
    sp = StagePlan(batch_size=2, patch_size=[64, 128, 128],
                   current_spacing=[2.0, 1.0, 1.0],
                   original_spacing=[3.0, 1.5, 1.5],
                   pool_op_kernel_sizes=[[2, 2, 2]] * 4,
                   conv_kernel_sizes=[[1, 3, 3]] * 5,
                   num_pool_per_axis=[4, 4, 4],
                   median_patient_size_in_voxels=[100, 200, 200],
                   do_dummy_2D_data_aug=False)
    plans = Plans(
        num_stages=1, num_modalities=1, modalities={0: "CT"},
        normalization_schemes={0: "CT"}, dataset_properties={},
        list_of_npz_files=[], original_spacings=[[3.0, 1.5, 1.5]],
        original_sizes=[[100, 200, 200]], preprocessed_data_folder=None,
        num_classes=2, all_classes=[1, 2], base_num_features=48,
        use_mask_for_norm={0: False}, keep_only_largest_region=None,
        min_region_size_per_class=None, min_size_per_class=None,
        transpose_forward=[0, 1, 2], transpose_backward=[0, 1, 2],
        data_identifier="x", plans_per_stage={0: sp})
    pf = str(tmp_path / "plans.json")
    plans.save(pf)
    csv = collectors.write_plans_summary([pf], str(tmp_path / "p.csv"))
    lines = open(csv).read().strip().splitlines()
    assert len(lines) == 2
    assert "128.000,128.000,128.000" in lines[1]


def test_figure_out_what_to_submit_with_ensembling(tmp_path, monkeypatch):
    """Full submission decision incl. AUTOMATIC pairwise-ensemble build +
    score + postprocessing determination (figure_out_what_to_submit.py:47+,
    ensemble.py:39): two tiny trained configs with saved validation
    softmax -> the ensemble is constructed, scored, ranked, and the
    decision JSON / prediction_commands.txt / summary.csv are written."""
    import pickle
    from e2enet_tpu.evaluation.model_selection import (
        figure_out_what_to_submit)
    from e2enet_tpu.io.nifti import NiftiImage, read_nifti, write_nifti

    monkeypatch.setenv("RESULTS_FOLDER", str(tmp_path / "results"))
    root = str(tmp_path / "results" / "nnUNet")   # paths.get_results_dir
    task, trainer = "Task042_Tiny", "TPUTrainer__nnUNetPlansv2.1"
    rng = np.random.RandomState(0)
    shape = (6, 7, 8)
    cases = ["case_000", "case_001"]

    gt_dir = tmp_path / "gt"
    maybe_mkdir_p(str(gt_dir))
    gts = {}
    for c in cases:
        gt = (rng.rand(*shape) < 0.35).astype(np.uint8)
        gt[2:4, 2:4, 2:4] = 2
        gts[c] = gt
        write_nifti(str(gt_dir / f"{c}.nii.gz"),
                    NiftiImage(array=gt, spacing=(1, 1, 1),
                               origin=(0, 0, 0),
                               direction=tuple(np.eye(3).flatten())))

    props = {"size_after_cropping": shape,
             "original_size_of_raw_data": shape,
             "original_spacing": (1.0, 1.0, 1.0),
             "spacing_after_resampling": (1.0, 1.0, 1.0),
             "crop_bbox": None,
             "itk_spacing": (1, 1, 1), "itk_origin": (0, 0, 0),
             "itk_direction": tuple(np.eye(3).flatten())}

    from e2enet_tpu.evaluation.evaluator import aggregate_scores

    def make_config(net, pflip):
        base = os.path.join(root, net, task, trainer)
        val = os.path.join(base, "fold_0", "validation_raw")
        maybe_mkdir_p(val)
        pairs = []
        for c in cases:
            lab = gts[c].copy()
            flip = rng.rand(*shape) < pflip           # corrupted voxels
            lab[flip] = (lab[flip] + 1) % 3
            soft = np.stack([(lab == k).astype(np.float32) * 0.9 + 0.05
                             for k in range(3)])
            soft /= soft.sum(0, keepdims=True)
            np.savez_compressed(os.path.join(val, f"{c}.npz"),
                                softmax=soft.astype(np.float16))
            with open(os.path.join(val, f"{c}.pkl"), "wb") as f:
                pickle.dump(props, f)
            pred = soft.argmax(0).astype(np.uint8)
            write_nifti(os.path.join(val, f"{c}.nii.gz"),
                        NiftiImage(array=pred, spacing=(1, 1, 1),
                                   origin=(0, 0, 0),
                                   direction=tuple(np.eye(3).flatten())))
            pairs.append([os.path.join(val, f"{c}.nii.gz"),
                          str(gt_dir / f"{c}.nii.gz")])
        aggregate_scores(pairs, labels=[0, 1, 2],
                         json_output_file=os.path.join(val, "summary.json"),
                         num_threads=1)
        return base

    make_config("3d_fullres", pflip=0.02)
    make_config("2d", pflip=0.30)

    report = figure_out_what_to_submit(
        task, networks=("3d_fullres", "2d"), trainer_plan=trainer,
        folds=(0,), gt_folder=str(gt_dir))

    ens_name = f"ensemble_2d__{trainer}--3d_fullres__{trainer}"
    assert ens_name in report["candidates"], report["candidates"].keys()
    assert set(report["ranking"]) == {"3d_fullres", "2d", ens_name}
    assert report["best"] in report["ranking"]
    # the low-noise config must beat the high-noise one
    assert (report["candidates"]["3d_fullres"]["mean_fg_dice"]
            > report["candidates"]["2d"]["mean_fg_dice"])
    ens_base = os.path.join(root, "ensembles", task, ens_name)
    assert os.path.isfile(os.path.join(ens_base, "ensembled_raw",
                                       "summary.json"))
    # postprocessing determination ran on the ensemble
    assert os.path.isfile(os.path.join(ens_base, "postprocessing.json"))
    sf = os.path.join(root, "ensembles", task)
    assert os.path.isfile(os.path.join(sf, "prediction_commands.txt"))
    csv = open(os.path.join(sf, "summary.csv")).read().splitlines()
    assert csv[0] == "model,class1,class2,average"
    assert len(csv) == 4
    # the decision JSON exists and round-trips
    rep2 = load_json(os.path.join(root, f"model_selection_{task}.json"))
    assert rep2["best"] == report["best"]
