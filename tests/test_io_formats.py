"""IO formats (mhd/nrrd/tiff/png/dicom), file conversions, RAS
reorientation, and the long-tail dataset converters."""
import os
import struct

import numpy as np
import pytest

from e2enet_tpu.io.metaimage import read_mhd, write_mhd
from e2enet_tpu.io.nrrd import read_nrrd, write_nrrd
from e2enet_tpu.io.nifti import NiftiImage, read_nifti, write_nifti
from e2enet_tpu.io.images2d import (read_2d_image, read_tiff_stack,
                                    write_2d_image, write_tiff_stack)


def _geo_image(rng, shape=(4, 5, 6), dtype=np.float32):
    arr = (rng.rand(*shape) * 100).astype(dtype)
    return NiftiImage(arr, spacing=(1.5, 2.0, 3.0),
                      origin=(10.0, -5.0, 2.5),
                      direction=(0, 1, 0, 1, 0, 0, 0, 0, -1))


@pytest.mark.parametrize("ext,compressed", [(".mha", False), (".mha", True),
                                            (".mhd", False), (".mhd", True)])
def test_mhd_roundtrip(tmp_path, ext, compressed):
    rng = np.random.RandomState(0)
    img = _geo_image(rng, dtype=np.int16)
    p = str(tmp_path / ("vol" + ext))
    write_mhd(p, img, compressed=compressed)
    back = read_mhd(p)
    np.testing.assert_array_equal(back.array, img.array)
    np.testing.assert_allclose(back.spacing, img.spacing)
    np.testing.assert_allclose(back.origin, img.origin)
    np.testing.assert_allclose(back.direction, img.direction)


@pytest.mark.parametrize("compressed", [False, True])
def test_nrrd_roundtrip(tmp_path, compressed):
    rng = np.random.RandomState(1)
    img = _geo_image(rng, dtype=np.float32)
    p = str(tmp_path / "vol.nrrd")
    write_nrrd(p, img, compressed=compressed)
    back = read_nrrd(p)
    np.testing.assert_allclose(back.array, img.array, rtol=1e-6)
    np.testing.assert_allclose(back.spacing, img.spacing)
    np.testing.assert_allclose(back.origin, img.origin)
    np.testing.assert_allclose(back.direction, img.direction, atol=1e-12)


def test_nrrd_detached_header(tmp_path):
    """.nhdr with separate raw data file."""
    arr = np.arange(24, dtype=np.uint16).reshape(2, 3, 4)
    with open(tmp_path / "vol.raw", "wb") as f:
        f.write(arr.tobytes())
    with open(tmp_path / "vol.nhdr", "w") as f:
        f.write("NRRD0004\ntype: uint16\ndimension: 3\n"
                "sizes: 4 3 2\nspacings: 1 2 3\nencoding: raw\n"
                "data file: vol.raw\n\n")
    back = read_nrrd(str(tmp_path / "vol.nhdr"))
    np.testing.assert_array_equal(back.array, arr)
    assert back.spacing == (1.0, 2.0, 3.0)


def test_tiff_and_png_roundtrip(tmp_path):
    rng = np.random.RandomState(2)
    stack = rng.randint(0, 255, (5, 16, 17), dtype=np.uint8)
    p = str(tmp_path / "s.tif")
    write_tiff_stack(p, stack)
    np.testing.assert_array_equal(read_tiff_stack(p), stack)

    img2d = rng.randint(0, 255, (16, 17, 3), dtype=np.uint8)
    p2 = str(tmp_path / "i.png")
    write_2d_image(p2, img2d)
    np.testing.assert_array_equal(read_2d_image(p2), img2d)


def _make_dicom_slice(path, pix, position, instance, spacing=(1.2, 0.8)):
    """Minimal explicit-VR-little-endian part-10 file."""
    def elem(group, el, vr, value):
        if vr in (b"OB", b"OW", b"UN", b"SQ", b"UT"):
            return (struct.pack("<HH", group, el) + vr + b"\0\0"
                    + struct.pack("<I", len(value)) + value)
        return (struct.pack("<HH", group, el) + vr
                + struct.pack("<H", len(value)) + value)

    def ds_val(*vals):
        s = "\\".join(f"{v:g}" for v in vals).encode()
        return s + b" " if len(s) % 2 else s

    ts = b"1.2.840.10008.1.2.1\x00"
    meta = elem(0x0002, 0x0010, b"UI", ts)
    meta = elem(0x0002, 0x0000, b"UL", struct.pack("<I", len(meta))) + meta
    rows, cols = pix.shape
    body = b"".join([
        elem(0x0018, 0x0050, b"DS", ds_val(2.0)),
        elem(0x0020, 0x0013, b"IS", str(instance).encode().ljust(2)),
        elem(0x0020, 0x0032, b"DS", ds_val(*position)),
        elem(0x0020, 0x0037, b"DS", ds_val(1, 0, 0, 0, 1, 0)),
        elem(0x0028, 0x0010, b"US", struct.pack("<H", rows)),
        elem(0x0028, 0x0011, b"US", struct.pack("<H", cols)),
        elem(0x0028, 0x0030, b"DS", ds_val(*spacing)),
        elem(0x0028, 0x0100, b"US", struct.pack("<H", 16)),
        elem(0x0028, 0x0103, b"US", struct.pack("<H", 1)),
        elem(0x0028, 0x1052, b"DS", ds_val(-1024.0)),
        elem(0x0028, 0x1053, b"DS", ds_val(1.0)),
        elem(0x7FE0, 0x0010, b"OW", pix.astype("<i2").tobytes()),
    ])
    with open(path, "wb") as f:
        f.write(b"\0" * 128 + b"DICM" + meta + body)


def test_dicom_series(tmp_path):
    from e2enet_tpu.io.dicom import read_dicom_series
    rng = np.random.RandomState(3)
    slices = rng.randint(0, 3000, (4, 8, 10)).astype(np.int16)
    d = tmp_path / "series"
    d.mkdir()
    # write out of order to exercise position sorting
    for z in (2, 0, 3, 1):
        _make_dicom_slice(str(d / f"slice{z}.dcm"), slices[z],
                          (0.0, 0.0, 2.5 * z), instance=z + 1)
    vol = read_dicom_series(str(d))
    np.testing.assert_allclose(
        vol.array, slices.astype(np.float32) - 1024.0)
    np.testing.assert_allclose(vol.spacing, (0.8, 1.2, 2.5))
    assert vol.array.shape == (4, 8, 10)


def test_reorientation_roundtrip(tmp_path):
    from e2enet_tpu.preprocessing.reorientation import (
        aff2axcodes, ras_affine, reorient_to_ras, revert_reorientation)
    rng = np.random.RandomState(4)
    # a PIR-oriented volume (permuted + flipped axes)
    direction = (0, 0, 1,
                 -1, 0, 0,
                 0, -1, 0)
    img = NiftiImage((rng.rand(4, 5, 6) * 50).astype(np.float32),
                     spacing=(1.0, 2.0, 3.0), origin=(5.0, 6.0, 7.0),
                     direction=direction)
    p = str(tmp_path / "vol.nii.gz")
    write_nifti(p, img)
    orig = read_nifti(p)

    reorient_to_ras(p)
    assert os.path.isfile(p[:-7] + "_originalAffine.pkl")
    ras = read_nifti(p)
    assert aff2axcodes(ras_affine(ras)) == ("R", "A", "S")
    assert sorted(ras.array.shape) == sorted(orig.array.shape)
    # voxel multiset is preserved
    np.testing.assert_allclose(np.sort(ras.array.ravel()),
                               np.sort(orig.array.ravel()))

    revert_reorientation(p)
    back = read_nifti(p)
    np.testing.assert_allclose(back.array, orig.array)
    np.testing.assert_allclose(ras_affine(back), ras_affine(orig),
                               atol=1e-4)
    assert not os.path.isfile(p[:-7] + "_originalAffine.pkl")


def test_2d_image_conversion_roundtrip(tmp_path):
    from e2enet_tpu.dataset_conversion.file_conversions import (
        convert_2d_image_to_nifti, convert_2d_segmentation_nifti_to_img)
    rng = np.random.RandomState(5)
    rgb = rng.randint(0, 255, (10, 12, 3), dtype=np.uint8)
    seg = rng.randint(0, 2, (10, 12)).astype(np.uint8) * 255
    write_2d_image(str(tmp_path / "img.png"), rgb)
    write_2d_image(str(tmp_path / "seg.png"), seg)

    convert_2d_image_to_nifti(str(tmp_path / "img.png"),
                              str(tmp_path / "case"))
    for j in range(3):
        ch = read_nifti(str(tmp_path / f"case_{j:04d}.nii.gz"))
        assert ch.array.shape == (1, 10, 12)
        np.testing.assert_array_equal(ch.array[0], rgb[..., j])

    convert_2d_image_to_nifti(str(tmp_path / "seg.png"),
                              str(tmp_path / "case_seg"), is_seg=True,
                              transform=lambda x: (x == 255).astype(int))
    s = read_nifti(str(tmp_path / "case_seg.nii.gz"))
    np.testing.assert_array_equal(s.array[0], (seg == 255))

    convert_2d_segmentation_nifti_to_img(
        str(tmp_path / "case_seg.nii.gz"), str(tmp_path / "out.png"))
    np.testing.assert_array_equal(
        read_2d_image(str(tmp_path / "out.png")), (seg == 255))


def test_extra_converters(tmp_path, monkeypatch):
    """Promise (mhd), RoadSegm (png), RibFrac (csv+nii), MyoPS."""
    from e2enet_tpu.dataset_conversion import tasks_extra
    from e2enet_tpu.utils.files import load_json
    raw = tmp_path / "raw"
    (raw / "nnUNet_raw_data").mkdir(parents=True)
    monkeypatch.setenv("nnUNet_raw_data_base", str(raw))
    rng = np.random.RandomState(6)

    # ---- Promise2012 (mhd)
    pr = tmp_path / "promise"
    (pr / "train").mkdir(parents=True)
    (pr / "test").mkdir()
    for case in ("Case00", "Case01"):
        write_mhd(str(pr / "train" / f"{case}.mhd"),
                  NiftiImage(rng.rand(3, 4, 5).astype(np.float32),
                             (1, 1, 3)))
        write_mhd(str(pr / "train" / f"{case}_segmentation.mhd"),
                  NiftiImage(rng.randint(0, 2, (3, 4, 5))
                             .astype(np.uint8), (1, 1, 3)))
    write_mhd(str(pr / "test" / "Case10.mhd"),
              NiftiImage(rng.rand(3, 4, 5).astype(np.float32), (1, 1, 3)))
    out = tasks_extra.convert_promise2012(str(pr))
    d = load_json(os.path.join(out, "dataset.json"))
    assert d["numTraining"] == 2 and d["numTest"] == 1
    seg = read_nifti(os.path.join(out, "labelsTr", "Case00.nii.gz"))
    assert set(np.unique(seg.array)).issubset({0, 1})

    # ---- RoadSegm (png 2D)
    rd = tmp_path / "roads"
    for sub in ("training/input", "training/output"):
        (rd / sub).mkdir(parents=True)
    img = rng.randint(0, 255, (8, 9, 3), dtype=np.uint8)
    lab = (rng.rand(8, 9) > 0.5).astype(np.uint8) * 255
    write_2d_image(str(rd / "training/input/img-1.png"), img)
    write_2d_image(str(rd / "training/output/img-1.png"), lab)
    out = tasks_extra.convert_road_segm(str(rd))
    d = load_json(os.path.join(out, "dataset.json"))
    assert d["numTraining"] == 1
    assert len(d["modality"]) == 3

    # ---- RibFrac (instance csv -> semantic)
    import pandas as pd
    rf = tmp_path / "ribfrac"
    for sub in ("imagesTr", "labelsTr"):
        (rf / sub).mkdir(parents=True)
    inst = np.zeros((3, 4, 5), np.uint8)
    inst[0, 0, 0] = 1
    inst[1, 1, 1] = 2
    write_nifti(str(rf / "imagesTr" / "RibFrac1-image.nii.gz"),
                NiftiImage(rng.rand(3, 4, 5).astype(np.float32),
                           (1, 1, 1)))
    write_nifti(str(rf / "labelsTr" / "RibFrac1-label.nii.gz"),
                NiftiImage(inst, (1, 1, 1)))
    pd.DataFrame({"public_id": ["RibFrac1", "RibFrac1"],
                  "label_id": [1, 2],
                  "label_code": [2, -1]}).to_csv(
        rf / "ribfrac-train-info-1.csv", index=False)
    out = tasks_extra.convert_ribfrac(str(rf))
    sem = read_nifti(os.path.join(out, "labelsTr",
                                  "RibFrac_0001.nii.gz")).array
    assert sem[0, 0, 0] == 2 and sem[1, 1, 1] == 5   # -1 -> ignore 5

    # ---- MyoPS label mapping
    my = tmp_path / "myops"
    for sub in ("train25", "train25_myops_gd"):
        (my / sub).mkdir(parents=True)
    vol = rng.rand(3, 4, 5).astype(np.float32)
    gd = np.zeros((3, 4, 5), np.int16)
    gd[0, 0, 0] = 500
    gd[1, 1, 1] = 2221
    for m in ("C0", "DE", "T2"):
        write_nifti(str(my / "train25" / f"myops_training_101_{m}.nii.gz"),
                    NiftiImage(vol, (1, 1, 1)))
    write_nifti(str(my / "train25_myops_gd"
                    / "myops_training_101_gd.nii.gz"),
                NiftiImage(gd, (1, 1, 1)))
    out = tasks_extra.convert_myops2020(str(my))
    seg = read_nifti(os.path.join(
        out, "labelsTr", "myops_training_101.nii.gz")).array
    assert seg[0, 0, 0] == 1 and seg[1, 1, 1] == 5


def test_chaos_converter(tmp_path, monkeypatch):
    """CHAOS: DICOM series + png label stacks (io.dicom path)."""
    from e2enet_tpu.dataset_conversion import tasks_extra
    raw = tmp_path / "raw"
    (raw / "nnUNet_raw_data").mkdir(parents=True)
    monkeypatch.setenv("nnUNet_raw_data_base", str(raw))
    rng = np.random.RandomState(7)

    base = tmp_path / "chaos"
    for p in ("1",):
        for series in ("T1DUAL/DICOM_anon/InPhase",
                       "T1DUAL/DICOM_anon/OutPhase",
                       "T2SPIR/DICOM_anon"):
            d = base / "MR" / p / series
            d.mkdir(parents=True)
            for z in range(3):
                _make_dicom_slice(
                    str(d / f"i{z}.dcm"),
                    rng.randint(0, 1000, (6, 7)).astype(np.int16),
                    (0, 0, 2.0 * z), z + 1)
        for ground in ("T1DUAL/Ground", "T2SPIR/Ground"):
            g = base / "MR" / p / ground
            g.mkdir(parents=True)
            for z in range(3):
                write_2d_image(str(g / f"s{z}.png"),
                               np.full((6, 7), 63, np.uint8))
    out = tasks_extra.convert_chaos(str(base))
    seg = read_nifti(os.path.join(out, "labelsTr", "T1_1.nii.gz")).array
    assert seg.shape == (3, 6, 7)
    assert set(np.unique(seg)) == {1}      # intensity 63 -> liver
    img = read_nifti(os.path.join(out, "imagesTr", "T1_1_0000.nii.gz"))
    assert img.array.shape == (3, 6, 7)
