"""Pretrained model install/registry.

Parity: reference inference/pretrained_models/download_pretrained_model.py
(:25-326 — URL registry + zip download/install) and
collect_pretrained_models.py (packaging trained models into zips).

This environment has no network egress, so download_and_install is gated;
install_model_from_zip / export_pretrained_model (the packaging side) are
fully functional.
"""
import os
import zipfile

from .. import paths
from ..utils.files import isdir, isfile, join, maybe_mkdir_p

# task -> released model URL (reference registry shape; populate as models
# are published)
PRETRAINED_MODEL_REGISTRY = {}


def print_available_pretrained_models():
    if not PRETRAINED_MODEL_REGISTRY:
        print("No pretrained models registered yet.")
    for k, v in PRETRAINED_MODEL_REGISTRY.items():
        print(k, "->", v.get("description", v.get("url")))


def install_model_from_zip_file(zip_file: str):
    results = paths.require(paths.get_results_dir(), "RESULTS_FOLDER")
    maybe_mkdir_p(results)
    with zipfile.ZipFile(zip_file, "r") as zf:
        zf.extractall(results)
    print(f"installed {zip_file} -> {results}")


def download_and_install_pretrained_model_by_name(task_name: str):
    if task_name not in PRETRAINED_MODEL_REGISTRY:
        raise KeyError(
            f"no pretrained model registered for {task_name}; known: "
            f"{sorted(PRETRAINED_MODEL_REGISTRY)}")
    raise RuntimeError(
        "this environment has no network egress; download the zip "
        "externally and use install_model_from_zip_file()")


def export_pretrained_model(task_name: str, output_file: str,
                            networks=("3d_fullres",),
                            trainer_plan: str = "TPUTrainer__nnUNetPlansv2.1",
                            folds=(0, 1, 2, 3, 4),
                            tconv: str = "shiftConvPP",
                            checkpoint: str = "model_final_checkpoint"):
    """Package trained folds (+ plans/postprocessing) into an installable
    zip (collect_pretrained_models.py equivalent)."""
    results = paths.require(paths.get_results_dir(), "RESULTS_FOLDER")
    with zipfile.ZipFile(output_file, "w", zipfile.ZIP_DEFLATED) as zf:
        for net in networks:
            base = join(results, net, task_name, trainer_plan)
            assert isdir(base), f"missing trained model: {base}"
            for fname in ("plans.json", "postprocessing.json"):
                p = join(base, fname)
                if isfile(p):
                    zf.write(p, os.path.relpath(p, results))
            for f in folds:
                fd = join(base, f"fold_{f}")
                if not isdir(fd):
                    continue
                for fname in (f"{tconv}_{checkpoint}.model",
                              f"{tconv}_{checkpoint}.model.pkl",
                              "debug.json", "progress.png"):
                    p = join(fd, fname)
                    if isfile(p):
                        zf.write(p, os.path.relpath(p, results))
    print(f"exported {task_name} -> {output_file}")
    return output_file
