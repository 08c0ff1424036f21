"""Per-challenge dataset converters for the headline benchmark tasks.

Parity: reference e2enet/dataset_conversion/ (36 scripts). The benchmark
tasks of BASELINE.json are covered here:
  * AMOS 2022 task1/task2 (Task216/217, reference Task216_Amos2022_task1.py)
  * BTCV / BeyondTheCranialVault (Task017,
    reference Task017_BeyondCranialVaultAbdominalOrganSegmentation.py)
  * BraTS-style 4-modality conversion (Task032/043/082 pattern: relabel
    4 -> 3, modalities t1/t1ce/t2/flair)
  * KiTS (Task040 pattern)
Decathlon tasks (Hippocampus/Prostate/Heart/...) use
utils.convert_decathlon_task.
"""
import os
import shutil

from .. import paths
from ..io.nifti import read_nifti, write_nifti, NiftiImage
from ..utils.files import join, load_json, maybe_mkdir_p, subfiles
from .utils import generate_dataset_json

BTCV_LABELS = {
    0: "background", 1: "spleen", 2: "right kidney", 3: "left kidney",
    4: "gallbladder", 5: "esophagus", 6: "liver", 7: "stomach", 8: "aorta",
    9: "inferior vena cava", 10: "portal vein and splenic vein",
    11: "pancreas", 12: "right adrenal gland", 13: "left adrenal gland",
}

AMOS_LABELS = {
    0: "background", 1: "spleen", 2: "right kidney", 3: "left kidney",
    4: "gall bladder", 5: "esophagus", 6: "liver", 7: "stomach", 8: "aorta",
    9: "postcava", 10: "pancreas", 11: "right adrenal gland",
    12: "left adrenal gland", 13: "duodenum", 14: "bladder",
    15: "prostate/uterus",
}


def _out_base(task_id: int, task_name: str) -> str:
    foldername = "Task%03.0d_%s" % (task_id, task_name)
    out_base = join(paths.require(paths.get_raw_data_dir(), "raw data dir"),
                    foldername)
    for sub in ("imagesTr", "imagesTs", "labelsTr"):
        maybe_mkdir_p(join(out_base, sub))
    return out_base


def convert_amos2022(amos_base: str, task_id: int = 216,
                     task_name: str = "AMOS2022_task1",
                     dataset_json_name: str = "task1_dataset.json"):
    """AMOS22 download -> nnU-Net raw layout (Task216_Amos2022_task1.py)."""
    out_base = _out_base(task_id, task_name)
    src_json = join(amos_base, dataset_json_name)
    if not os.path.isfile(src_json):
        src_json = join(amos_base, "dataset.json")
    dataset_json_source = load_json(src_json)

    training_identifiers = [i["image"].split("/")[-1][:-7]
                            for i in dataset_json_source["training"]]
    for tr in training_identifiers:
        shutil.copy(join(amos_base, "imagesTr", tr + ".nii.gz"),
                    join(out_base, "imagesTr", f"{tr}_0000.nii.gz"))
        shutil.copy(join(amos_base, "labelsTr", tr + ".nii.gz"),
                    join(out_base, "labelsTr", f"{tr}.nii.gz"))
    test_identifiers = [i.split("/")[-1][:-7]
                        for i in dataset_json_source.get("test", [])]
    for ts in test_identifiers:
        shutil.copy(join(amos_base, "imagesTs", ts + ".nii.gz"),
                    join(out_base, "imagesTs", f"{ts}_0000.nii.gz"))
    labels = dataset_json_source.get("labels") or \
        {str(k): v for k, v in AMOS_LABELS.items()}
    labels = {int(k): v for k, v in labels.items()}
    generate_dataset_json(join(out_base, "dataset.json"),
                          join(out_base, "imagesTr"),
                          join(out_base, "imagesTs"), ("CT",), labels,
                          os.path.basename(out_base))
    return out_base


def convert_btcv(btcv_base: str, task_id: int = 17,
                 task_name: str = "AbdominalOrganSegmentation"):
    """BTCV (Synapse Abdomen) RawData.zip layout -> nnU-Net raw
    (Task017_BeyondCranialVaultAbdominalOrganSegmentation.py): images in
    Training/img/imgXXXX.nii.gz, labels Training/label/labelXXXX.nii.gz."""
    out_base = _out_base(task_id, task_name)
    train_img = join(btcv_base, "Training", "img")
    train_lbl = join(btcv_base, "Training", "label")
    test_img = join(btcv_base, "Testing", "img")
    for f in subfiles(train_img, join=False, suffix=".nii.gz"):
        ident = f[3:-7]  # imgXXXX.nii.gz -> XXXX
        shutil.copy(join(train_img, f),
                    join(out_base, "imagesTr", f"img{ident}_0000.nii.gz"))
        shutil.copy(join(train_lbl, f"label{ident}.nii.gz"),
                    join(out_base, "labelsTr", f"img{ident}.nii.gz"))
    if os.path.isdir(test_img):
        for f in subfiles(test_img, join=False, suffix=".nii.gz"):
            ident = f[3:-7]
            shutil.copy(join(test_img, f),
                        join(out_base, "imagesTs",
                             f"img{ident}_0000.nii.gz"))
    generate_dataset_json(join(out_base, "dataset.json"),
                          join(out_base, "imagesTr"),
                          join(out_base, "imagesTs"), ("CT",), BTCV_LABELS,
                          os.path.basename(out_base))
    return out_base


def convert_brats(brats_base: str, task_id: int, task_name: str,
                  year: str = "2020"):
    """BraTS training download -> nnU-Net raw (Task082_BraTS_2020.py
    pattern): per-case folders with _t1/_t1ce/_t2/_flair modalities and _seg
    labels; label 4 (enhancing) -> 3."""
    out_base = _out_base(task_id, task_name)
    case_dirs = [d for d in os.listdir(brats_base)
                 if os.path.isdir(join(brats_base, d))]
    for case in sorted(case_dirs):
        cdir = join(brats_base, case)
        mods = ["t1", "t1ce", "t2", "flair"]
        if not all(os.path.isfile(join(cdir, f"{case}_{m}.nii.gz"))
                   for m in mods):
            print("skipping incomplete case", case)
            continue
        for i, m in enumerate(mods):
            shutil.copy(join(cdir, f"{case}_{m}.nii.gz"),
                        join(out_base, "imagesTr",
                             f"{case}_{i:04d}.nii.gz"))
        seg_file = join(cdir, f"{case}_seg.nii.gz")
        if os.path.isfile(seg_file):
            img = read_nifti(seg_file)
            seg = img.array.copy()
            seg[seg == 4] = 3
            write_nifti(join(out_base, "labelsTr", f"{case}.nii.gz"),
                        NiftiImage(seg.astype("uint8"), img.spacing,
                                   img.origin, img.direction))
    generate_dataset_json(
        join(out_base, "dataset.json"), join(out_base, "imagesTr"), None,
        ("T1", "T1ce", "T2", "FLAIR"),
        {0: "background", 1: "edema", 2: "non-enhancing", 3: "enhancing"},
        os.path.basename(out_base))
    return out_base


def convert_kits(kits_base: str, task_id: int = 64,
                 task_name: str = "KiTS_labelsFixed"):
    """KiTS19 download (case_XXXXX/imaging.nii.gz + segmentation.nii.gz) ->
    nnU-Net raw (Task064_KiTS_labelsFixed.py pattern)."""
    out_base = _out_base(task_id, task_name)
    cases = sorted(d for d in os.listdir(kits_base)
                   if d.startswith("case_"))
    for case in cases:
        img = join(kits_base, case, "imaging.nii.gz")
        seg = join(kits_base, case, "segmentation.nii.gz")
        if not os.path.isfile(img):
            continue
        shutil.copy(img, join(out_base, "imagesTr",
                              f"{case}_0000.nii.gz"))
        if os.path.isfile(seg):
            shutil.copy(seg, join(out_base, "labelsTr", f"{case}.nii.gz"))
        else:
            shutil.copy(img, join(out_base, "imagesTs",
                                  f"{case}_0000.nii.gz"))
            os.remove(join(out_base, "imagesTr", f"{case}_0000.nii.gz"))
    generate_dataset_json(join(out_base, "dataset.json"),
                          join(out_base, "imagesTr"),
                          join(out_base, "imagesTs"), ("CT",),
                          {0: "background", 1: "kidney", 2: "tumor"},
                          os.path.basename(out_base))
    return out_base
