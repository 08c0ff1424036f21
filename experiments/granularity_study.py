"""Row- vs kernel-granular DSFF convergence study (VERDICT r04 next #2).

The headline bench trains with the TPU-native ``granularity='row'`` DSFF
mode — a deliberate deviation from the reference's kernel-pair granularity
(core_channel.py:647-666 prunes (out, in) kernel pairs). This study bounds
the accuracy cost of that deviation: for each synthetic task x seed it
trains THREE models under identical budgets

    dense   : no DSFF mask
    kernel  : reference granularity, density 0.2
    row     : TPU-native row granularity, density 0.2

through the full CLI pipeline (plan -> train -> predict -> evaluate) and
records the final TEST-set mean foreground Dice. Two tasks:

    spheres : the e2e suite's bright/dark-sphere task (test_end_to_end)
    shells  : concentric shell + rod task (4 classes, lower contrast,
              partly texture-defined) — harder, so capacity loss at
              density 0.2 has somewhere to show

Results append to experiments/logs/granularity_study.json; the summary
table goes in BASELINE.md.

Run (TPU): env PYTHONPATH=/root/repo:/root/.axon_site python -u \
    experiments/granularity_study.py [--seeds 0 1] [--epochs 40]
"""
import argparse
import json
import os
import shutil
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
LOGS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "logs")

SHAPE = (20, 24, 22)
SPACING = (1.0, 1.0, 1.5)


def make_case_spheres(rng):
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), "tests"))
    from test_end_to_end import _make_case
    return _make_case(rng)


def make_case_shells(rng):
    """4-class task: noisy body, a bright shell (class 1) around a
    low-contrast core (class 2), and a dark rod (class 3)."""
    vol = np.zeros(SHAPE, np.float32)
    zz, yy, xx = np.meshgrid(*[np.arange(s) for s in SHAPE], indexing="ij")
    c = [s / 2 for s in SHAPE]
    body = (((zz - c[0]) / (c[0] * 0.9)) ** 2
            + ((yy - c[1]) / (c[1] * 0.9)) ** 2
            + ((xx - c[2]) / (c[2] * 0.9)) ** 2) < 1
    vol[body] = rng.rand(body.sum()).astype(np.float32) + 0.5
    seg = np.zeros(SHAPE, np.uint8)
    dz, dy, dx = rng.randint(-2, 3, 3)
    r2 = ((zz - c[0] - dz) ** 2 + (yy - c[1] - dy) ** 2
          + (xx - c[2] - dx) ** 2)
    shell = (r2 < 6.0 ** 2) & (r2 >= 3.5 ** 2) & body
    core = (r2 < 3.5 ** 2) & body
    vol[shell] = 2.2 + 0.3 * rng.rand(shell.sum()).astype(np.float32)
    # core: only mildly brighter than body (0.5-1.5) -> needs context
    vol[core] = 1.3 + 0.4 * rng.rand(core.sum()).astype(np.float32)
    seg[shell] = 1
    seg[core] = 2
    rod = (np.abs(yy - c[1] + dy) < 1.6) & (np.abs(xx - c[2] - 5) < 1.6) \
        & body
    vol[rod] = -0.8 + 0.2 * rng.rand(rod.sum()).astype(np.float32)
    seg[rod] = 3
    return vol, seg


TASKS = {
    "spheres": (97, make_case_spheres, ("1", "2")),
    "shells": (96, make_case_shells, ("1", "2", "3")),
}

MODES = {
    "dense": [],
    "kernel": ["--sparse", "true", "--density", "0.2",
               "--granularity", "kernel"],
    "row": ["--sparse", "true", "--density", "0.2",
            "--granularity", "row"],
}


def build_task(base, task_name, task_id, gen, n_train=6, n_test=2):
    from e2enet_tpu.io.nifti import NiftiImage, write_nifti
    from e2enet_tpu.utils.files import save_json
    full = f"Task{task_id:03d}_{task_name}"
    task_dir = os.path.join(base, "raw", "nnUNet_raw_data", full)
    for sub in ("imagesTr", "labelsTr", "imagesTs", "labelsTs"):
        os.makedirs(os.path.join(task_dir, sub), exist_ok=True)
    rng = np.random.RandomState(11)
    training = []
    n_cls = int(max(int(l) for l in TASKS[task_name][2])) + 1
    for i in range(n_train):
        vol, seg = gen(rng)
        name = f"{task_name}_{i:03d}"
        write_nifti(os.path.join(task_dir, "imagesTr",
                                 f"{name}_0000.nii.gz"),
                    NiftiImage(vol, SPACING))
        write_nifti(os.path.join(task_dir, "labelsTr", f"{name}.nii.gz"),
                    NiftiImage(seg, SPACING))
        training.append({"image": f"./imagesTr/{name}.nii.gz",
                         "label": f"./labelsTr/{name}.nii.gz"})
    for i in range(n_test):
        vol, seg = gen(rng)
        name = f"{task_name}test_{i:03d}"
        write_nifti(os.path.join(task_dir, "imagesTs",
                                 f"{name}_0000.nii.gz"),
                    NiftiImage(vol, SPACING))
        write_nifti(os.path.join(task_dir, "labelsTs", f"{name}.nii.gz"),
                    NiftiImage(seg, SPACING))
    save_json({
        "name": task_name, "description": "granularity study",
        "tensorImageSize": "4D", "reference": "", "licence": "",
        "release": "", "modality": {"0": "MR"},
        "labels": {str(c): f"class{c}" for c in range(n_cls)},
        "numTraining": n_train, "numTest": n_test,
        "training": training,
        "test": [f"./imagesTs/{task_name}test_{i:03d}.nii.gz"
                 for i in range(n_test)],
    }, os.path.join(task_dir, "dataset.json"))
    return task_dir


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/granularity_study")
    ap.add_argument("--epochs", type=int, default=40)
    ap.add_argument("--batches", type=int, default=10)
    ap.add_argument("--feats", type=int, default=16)
    ap.add_argument("--seeds", type=int, nargs="+", default=[0, 1])
    ap.add_argument("--tasks", nargs="+", default=list(TASKS))
    ap.add_argument("--modes", nargs="+", default=list(MODES))
    ap.add_argument("--update_frequency", type=int, default=25)
    ap.add_argument("--death_rate", type=float, default=None,
                    help="override the DSFF death rate for sparse modes")
    ap.add_argument("--growth", default=None,
                    help="override the DSFF growth mode (random/gradient)")
    args = ap.parse_args()

    base = args.workdir
    if os.path.isdir(base):
        shutil.rmtree(base)
    os.makedirs(os.path.join(base, "raw"), exist_ok=True)
    os.makedirs(os.path.join(base, "preprocessed"), exist_ok=True)
    os.environ["nnUNet_raw_data_base"] = os.path.join(base, "raw")
    os.environ["nnUNet_preprocessed"] = os.path.join(base, "preprocessed")

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    from e2enet_tpu.cli import plan_and_preprocess

    rows = []
    for task_name in args.tasks:
        task_id, gen, fg_labels = TASKS[task_name]
        task_dir = build_task(base, task_name, task_id, gen)
        os.environ["RESULTS_FOLDER"] = os.path.join(base, "results_plan")
        plan_and_preprocess.main(["-t", str(task_id), "-tf", "1",
                                  "-tl", "1"])
        for mode in args.modes:
            for seed in args.seeds:
                run = f"{task_name}_{mode}_s{seed}"
                results = os.path.join(base, "results", run)
                os.makedirs(results, exist_ok=True)
                os.environ["RESULTS_FOLDER"] = results
                from e2enet_tpu.cli import evaluate, predict, train
                print(f"==== {run}: train", flush=True)
                train.main(["--task", str(task_id), "--fold", "0",
                            "--Tconv", "shiftConvPP",
                            "--epochs", str(args.epochs),
                            "--batches", str(args.batches),
                            "--val_batches", "2",
                            "--base_features", str(args.feats),
                            "--seed", str(seed),
                            "--update_frequency",
                            str(args.update_frequency)]
                           + MODES[mode]
                           + (["--death-rate", str(args.death_rate)]
                              if args.death_rate is not None
                              and mode != "dense" else [])
                           + (["--growth", args.growth]
                              if args.growth is not None
                              and mode != "dense" else []))
                print(f"==== {run}: predict+evaluate", flush=True)
                out_dir = os.path.join(base, "preds", run)
                predict.main(["-i", os.path.join(task_dir, "imagesTs"),
                              "-o", out_dir, "-t", str(task_id),
                              "-f", "0", "--Tconv", "shiftConvPP",
                              "--step_size", "0.7",
                              "--disable_postprocessing"])
                evaluate.main(["-ref", os.path.join(task_dir, "labelsTs"),
                               "-pred", out_dir, "-l", *fg_labels])
                with open(os.path.join(out_dir, "summary.json")) as f:
                    summary = json.load(f)
                dice = {k: v["Dice"]
                        for k, v in summary["results"]["mean"].items()}
                fg = float(np.nanmean([dice[k] for k in fg_labels]))
                row = {"task": task_name, "mode": mode, "seed": seed,
                       "epochs": args.epochs, "batches": args.batches,
                       "feats": args.feats, "density":
                       (0.2 if mode != "dense" else 1.0),
                       "death_rate": (args.death_rate
                                      if mode != "dense" else None),
                       "growth": (args.growth if mode != "dense"
                                  else None),
                       "mean_fg_dice": fg, "per_class": dice}
                print("RESULT", json.dumps(row), flush=True)
                rows.append(row)
                # free disk: drop kernel-mode checkpoints; dense + row are
                # kept (fidelity_check --from_native consumes them)
                if mode == "kernel":
                    shutil.rmtree(results, ignore_errors=True)

    os.makedirs(LOGS, exist_ok=True)
    out = os.path.join(LOGS, "granularity_study.json")
    hist = json.load(open(out)) if os.path.isfile(out) else []
    hist.extend(rows)
    json.dump(hist, open(out, "w"), indent=1)
    print("recorded ->", out)
    # summary table
    print(f"{'task':8s} {'mode':7s} " + " ".join(
        f"s{s}" for s in args.seeds))
    for task_name in args.tasks:
        for mode in args.modes:
            vals = [r["mean_fg_dice"] for r in rows
                    if r["task"] == task_name and r["mode"] == mode]
            print(f"{task_name:8s} {mode:7s} "
                  + " ".join(f"{v:.4f}" for v in vals))


if __name__ == "__main__":
    main()
