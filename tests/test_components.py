"""Unit tests for breadth components: loss zoo, Ranger, element-granular
sparse engine, cascade plumbing, dataset conversion, region evaluation,
NIfTI geometry round-trip, plans round-trip."""
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from e2enet_tpu.io.nifti import NiftiImage, read_nifti, write_nifti


def test_nifti_geometry_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    arr = (rng.rand(5, 6, 7) * 100).astype(np.float32)
    img = NiftiImage(arr, spacing=(0.7, 1.1, 2.5), origin=(-12.5, 3.25, 9.0),
                     direction=(1, 0, 0, 0, 0, -1, 0, 1, 0))
    f = str(tmp_path / "x.nii.gz")
    write_nifti(f, img)
    back = read_nifti(f)
    np.testing.assert_allclose(back.array, arr, rtol=1e-6)
    np.testing.assert_allclose(back.spacing, img.spacing, rtol=1e-5)
    np.testing.assert_allclose(back.origin, img.origin, atol=1e-4)
    np.testing.assert_allclose(back.direction, img.direction, atol=1e-5)


def test_loss_zoo_finiteness():
    from e2enet_tpu.ops import losses
    rng = np.random.RandomState(0)
    logits = jnp.asarray(rng.randn(2, 4, 6, 6, 3).astype(np.float32))
    target = jnp.asarray(rng.randint(0, 3, (2, 4, 6, 6)).astype(np.int32))
    for name in ("dc_ce", "dice", "dice_squared", "gdl", "gdl_ce",
                 "dc_topk", "topk", "ce", "focal"):
        val = float(losses.LOSS_REGISTRY[name](logits, target))
        assert np.isfinite(val), name
    onehot = jax.nn.one_hot(target, 3)
    assert np.isfinite(float(losses.dc_and_bce_loss(logits, onehot)))


@pytest.mark.skipif(not os.path.isdir("/root/reference"),
                    reason="reference not mounted")
def test_gdl_matches_reference():
    from conftest import stub_reference_deps
    stub_reference_deps()
    torch = pytest.importorskip("torch")
    from e2enet.training.loss_functions.dice_loss import GDL
    from e2enet_tpu.ops.losses import generalized_dice_loss
    rng = np.random.RandomState(1)
    logits = rng.randn(2, 4, 6, 6, 3).astype(np.float32)
    target = rng.randint(0, 3, (2, 4, 6, 6))
    ref = GDL(apply_nonlin=lambda x: torch.softmax(x, 1), batch_dice=True,
              do_bg=False, smooth=1.0)
    theirs = float(ref(torch.from_numpy(np.moveaxis(logits, -1, 1)),
                       torch.from_numpy(target[:, None]).float()))
    ours = float(generalized_dice_loss(jnp.asarray(logits),
                                       jnp.asarray(target), batch_dice=True,
                                       do_bg=False, smooth=1.0))
    assert ours == pytest.approx(theirs, rel=1e-4)


def test_ranger_step_decreases_quadratic():
    from e2enet_tpu.training.ranger import ranger_init, ranger_update
    params = {"w": jnp.asarray(np.ones(8, np.float32) * 3.0)}
    state = ranger_init(params)
    for _ in range(50):
        grads = {"w": 2 * params["w"]}   # d/dw w^2
        params, state = ranger_update(params, state, grads, lr=1e-1)
    assert float(jnp.sum(params["w"] ** 2)) < 8 * 9.0


def test_element_masks_and_snip():
    from e2enet_tpu.models.unetpp import ShiftUNetPlusPlus
    from e2enet_tpu.training import dsff
    m = ShiftUNetPlusPlus(input_channels=1, num_classes=2,
                          pool_op_kernel_sizes=((2, 2, 2), (2, 2, 2)),
                          base_num_features=8, max_num_features=16,
                          compute_dtype=jnp.float32)
    params = m.init(jax.random.PRNGKey(0),
                    jnp.zeros((1, 8, 8, 8, 1)))["params"]
    masked = dsff.select_masked(params)

    em = dsff.init_masks_element(params, 0.3, jax.random.PRNGKey(1),
                                 "uniform_ori")
    dens = float(dsff.masks_density(em, params))
    assert 0.2 < dens < 0.4
    for p, msk in em.items():
        assert msk.shape == masked[p].shape

    erk = dsff.init_masks_element(params, 0.3, jax.random.PRNGKey(2), "ERK")
    dens = float(dsff.masks_density(erk, params))
    assert 0.15 < dens < 0.5

    grads = jax.tree_util.tree_map(
        lambda x: jnp.asarray(np.random.RandomState(3).randn(*x.shape)
                              .astype(np.float32)), params)
    snip = dsff.init_masks_element(params, 0.2, jax.random.PRNGKey(3),
                                   "snip", grads=grads)
    dens = float(dsff.masks_density(snip, params))
    assert dens == pytest.approx(0.2, abs=0.02)

    # element death/growth keeps count
    mp = dsff.apply_masks(params, em)
    new_masks, _ = dsff.death_growth_update(mp, None, em,
                                            jax.random.PRNGKey(4),
                                            jnp.float32(0.5))
    for p in em:
        assert int(new_masks[p].sum()) == int(em[p].sum())


def test_cascade_onehot_and_augment():
    from e2enet_tpu.training.cascade import (cascade_augment_onehot,
                                             move_seg_as_onehot_to_data)
    rng = np.random.RandomState(0)
    data = rng.randn(2, 1, 8, 8, 8).astype(np.float32)
    seg_prev = rng.randint(0, 3, (2, 8, 8, 8))
    out = move_seg_as_onehot_to_data(data, seg_prev, [1, 2])
    assert out.shape == (2, 3, 8, 8, 8)
    np.testing.assert_array_equal(out[:, 1], (seg_prev == 1))
    np.testing.assert_array_equal(out[:, 2], (seg_prev == 2))
    oh = out[:, 1:].copy()
    cascade_augment_onehot(oh, rng, p_binary_op=1.0, p_remove_component=1.0)
    assert set(np.unique(oh)).issubset({0.0, 1.0})


def test_generate_dataset_json_and_split4d(tmp_path):
    from e2enet_tpu.dataset_conversion.utils import (generate_dataset_json,
                                                     split_4d_nifti)
    imagesTr = tmp_path / "imagesTr"
    labelsTr = tmp_path / "labelsTr"
    imagesTr.mkdir()
    labelsTr.mkdir()
    rng = np.random.RandomState(0)
    for i in range(2):
        write_nifti(str(imagesTr / f"case_{i:03d}_0000.nii.gz"),
                    NiftiImage(rng.rand(4, 5, 6).astype(np.float32),
                               (1, 1, 1)))
    d = generate_dataset_json(str(tmp_path / "dataset.json"), str(imagesTr),
                              None, ("CT",), {0: "background", 1: "organ"},
                              "TestTask")
    assert d["numTraining"] == 2
    assert d["modality"]["0"] == "CT"

    # 3D file split = copy with _0000 suffix
    src = tmp_path / "raw.nii.gz"
    write_nifti(str(src), NiftiImage(rng.rand(4, 5, 6).astype(np.float32),
                                     (1, 1, 1)))
    outdir = tmp_path / "out"
    outdir.mkdir()
    split_4d_nifti(str(src), str(outdir))
    assert (outdir / "raw_0000.nii.gz").exists()


def test_region_based_evaluation(tmp_path):
    from e2enet_tpu.evaluation.region_based_evaluation import (
        evaluate_regions, get_brats_regions)
    gt_dir = tmp_path / "gt"
    pred_dir = tmp_path / "pred"
    gt_dir.mkdir()
    pred_dir.mkdir()
    rng = np.random.RandomState(0)
    seg = rng.randint(0, 4, (8, 8, 8)).astype(np.uint8)
    write_nifti(str(gt_dir / "c1.nii.gz"), NiftiImage(seg, (1, 1, 1)))
    write_nifti(str(pred_dir / "c1.nii.gz"), NiftiImage(seg, (1, 1, 1)))
    res = evaluate_regions(str(pred_dir), str(gt_dir), get_brats_regions())
    for r, vals in res.items():
        assert vals[0] == pytest.approx(1.0)
    assert (pred_dir / "summary.csv").exists()


def test_plans_roundtrip(tmp_path):
    from e2enet_tpu.plans import Plans, StagePlan
    sp = StagePlan(batch_size=2, num_pool_per_axis=[3, 3, 3],
                   patch_size=[64, 64, 64],
                   median_patient_size_in_voxels=[100, 100, 100],
                   current_spacing=[1, 1, 1], original_spacing=[1, 1, 1],
                   do_dummy_2D_data_aug=False,
                   pool_op_kernel_sizes=[[2, 2, 2]] * 3,
                   conv_kernel_sizes=[[3, 3, 3]] * 4)
    p = Plans(num_stages=1, num_modalities=1, modalities={0: "CT"},
              normalization_schemes={0: "CT"}, dataset_properties={},
              list_of_npz_files=[], original_spacings=[],
              original_sizes=[], preprocessed_data_folder=None,
              num_classes=2, all_classes=[1, 2], base_num_features=32,
              use_mask_for_norm={0: False}, keep_only_largest_region=None,
              min_region_size_per_class=None, min_size_per_class=None,
              transpose_forward=[0, 1, 2], transpose_backward=[0, 1, 2],
              data_identifier="test", plans_per_stage={0: sp})
    f = str(tmp_path / "plans.json")
    p.save(f)
    q = Plans.load(f)
    assert q.num_classes == 2
    assert q.plans_per_stage[0].patch_size == [64, 64, 64]
    assert q.normalization_schemes[0] == "CT"


def test_pretrained_transfer():
    from e2enet_tpu.training.pretrained import transfer_matching_params
    src = {"context0": {"block0": {"kernel": jnp.ones((3, 3, 1, 8))}},
           "loc0_0": {"block0": {"kernel": jnp.ones((3, 3, 8, 8))}}}
    tgt = {"context0": {"block0": {"kernel": jnp.zeros((3, 3, 1, 8))}},
           "loc0_0": {"block0": {"kernel": jnp.zeros((3, 3, 8, 8))}}}
    new, n = transfer_matching_params(tgt, src, "context", verbose=False)
    assert n == 1
    assert float(new["context0"]["block0"]["kernel"].sum()) == 3 * 3 * 8
    assert float(new["loc0_0"]["block0"]["kernel"].sum()) == 0


@pytest.mark.parametrize("kshape,flat", [((1, 3, 3), 0), ((3, 1, 3), 1),
                                         ((3, 3, 1), 2)])
def test_conv3d_one_flat_matches_torch(kshape, flat):
    """313/331 ablation kernels: any flat-axis conv matches torch conv3d."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F
    from e2enet_tpu.ops.blocks import conv3d_one_flat
    rng = np.random.RandomState(0)
    x = rng.randn(1, 6, 8, 10, 4).astype(np.float32)   # (N,D,H,W,C)
    w = rng.randn(5, 4, *kshape).astype(np.float32) * 0.1
    ref = F.conv3d(torch.from_numpy(np.moveaxis(x, -1, 1)),
                   torch.from_numpy(w),
                   padding=tuple(k // 2 for k in kshape)).numpy()
    wj = np.transpose(np.squeeze(w, axis=2 + flat), (2, 3, 1, 0))
    got = conv3d_one_flat(jnp.asarray(x), jnp.asarray(wj), None, (1, 1, 1),
                          flat, jnp.float32)
    np.testing.assert_allclose(np.moveaxis(np.asarray(got), -1, 1), ref,
                               rtol=1e-4, atol=1e-5)


def test_tconv_313_331_build_and_forward():
    from e2enet_tpu.models.unetpp import build_network
    from e2enet_tpu.plans import StagePlan
    sp = StagePlan(batch_size=1, num_pool_per_axis=[2, 2, 2],
                   patch_size=[8, 8, 8],
                   median_patient_size_in_voxels=[8, 8, 8],
                   current_spacing=[1, 1, 1], original_spacing=[1, 1, 1],
                   do_dummy_2D_data_aug=False,
                   pool_op_kernel_sizes=[[2, 2, 2]] * 2,
                   conv_kernel_sizes=[[3, 3, 3]] * 3)
    for tconv in ("shiftConvPP_313", "shiftConvPP_331"):
        net = build_network(sp, 1, 3, tconv=tconv, base_num_features=4,
                            compute_dtype=jnp.float32)
        x = jnp.zeros((1, 8, 8, 8, 1))
        params = net.init(jax.random.PRNGKey(0), x)
        out = net.apply(params, x, do_ds=False)
        assert out.shape == (1, 8, 8, 8, 3)


def test_grasp_init():
    from e2enet_tpu.models.unetpp import ShiftUNetPlusPlus
    from e2enet_tpu.ops.losses import dc_and_ce_loss
    from e2enet_tpu.training import dsff
    m = ShiftUNetPlusPlus(input_channels=1, num_classes=2,
                          pool_op_kernel_sizes=((2, 2, 2), (2, 2, 2)),
                          base_num_features=4, max_num_features=8,
                          compute_dtype=jnp.float32)
    rng = np.random.RandomState(0)
    data = jnp.asarray(rng.randn(1, 8, 8, 8, 1).astype(np.float32))
    target = jnp.asarray(rng.randint(0, 2, (1, 8, 8, 8)).astype(np.int32))
    params = m.init(jax.random.PRNGKey(0), data)["params"]

    def loss_fn(p, d, t):
        out = m.apply({"params": p}, d, do_ds=False)
        return dc_and_ce_loss(out, t)

    masks = dsff.init_masks_grasp(loss_fn, params, 0.25, data, target)
    dens = float(dsff.masks_density(masks, params))
    assert dens == pytest.approx(0.25, abs=0.03)


def test_amos2022_device_resample():
    from e2enet_tpu.inference.amos2022 import resample_softmax_on_device
    rng = np.random.RandomState(0)
    sm = rng.rand(3, 8, 10, 12).astype(np.float32)
    seg = resample_softmax_on_device(sm, (16, 20, 24))
    assert seg.shape == (16, 20, 24)
    assert set(np.unique(seg)).issubset({0, 1, 2})
    # identity resample == plain argmax
    seg_same = resample_softmax_on_device(sm, (8, 10, 12))
    np.testing.assert_array_equal(seg_same, sm.argmax(0))


def test_dataset_converters(tmp_path, monkeypatch):
    """AMOS/BTCV/KiTS/BraTS converters produce valid nnU-Net raw layouts."""
    import e2enet_tpu.dataset_conversion.tasks as tasks
    from e2enet_tpu.utils.files import save_json, load_json
    raw = tmp_path / "raw"
    (raw / "nnUNet_raw_data").mkdir(parents=True)
    monkeypatch.setenv("nnUNet_raw_data_base", str(raw))
    rng = np.random.RandomState(0)

    def mk(path, seg=False):
        arr = (rng.randint(0, 4, (4, 5, 6)).astype(np.uint8) if seg
               else rng.rand(4, 5, 6).astype(np.float32))
        write_nifti(str(path), NiftiImage(arr, (1, 1, 1)))

    # AMOS-style source
    amos = tmp_path / "amos"
    for sub in ("imagesTr", "labelsTr", "imagesTs"):
        (amos / sub).mkdir(parents=True)
    mk(amos / "imagesTr" / "amos_0001.nii.gz")
    mk(amos / "labelsTr" / "amos_0001.nii.gz", seg=True)
    mk(amos / "imagesTs" / "amos_0009.nii.gz")
    save_json({"training": [{"image": "./imagesTr/amos_0001.nii.gz",
                             "label": "./labelsTr/amos_0001.nii.gz"}],
               "test": ["./imagesTs/amos_0009.nii.gz"],
               "labels": {str(k): v for k, v in
                          tasks.AMOS_LABELS.items()}},
              str(amos / "task1_dataset.json"))
    out = tasks.convert_amos2022(str(amos))
    d = load_json(os.path.join(out, "dataset.json"))
    assert d["numTraining"] == 1 and d["modality"]["0"] == "CT"
    assert os.path.isfile(os.path.join(out, "imagesTr",
                                       "amos_0001_0000.nii.gz"))

    # BTCV-style source
    btcv = tmp_path / "btcv"
    for sub in ("Training/img", "Training/label", "Testing/img"):
        (btcv / sub).mkdir(parents=True)
    mk(btcv / "Training/img/img0001.nii.gz")
    mk(btcv / "Training/label/label0001.nii.gz", seg=True)
    mk(btcv / "Testing/img/img0061.nii.gz")
    out = tasks.convert_btcv(str(btcv))
    assert os.path.isfile(os.path.join(out, "imagesTr",
                                       "img0001_0000.nii.gz"))
    assert os.path.isfile(os.path.join(out, "labelsTr", "img0001.nii.gz"))

    # KiTS-style source
    kits = tmp_path / "kits"
    (kits / "case_00000").mkdir(parents=True)
    mk(kits / "case_00000" / "imaging.nii.gz")
    mk(kits / "case_00000" / "segmentation.nii.gz", seg=True)
    out = tasks.convert_kits(str(kits))
    assert os.path.isfile(os.path.join(out, "labelsTr",
                                       "case_00000.nii.gz"))

    # BraTS-style source (seg has label 4 -> remapped to 3)
    brats = tmp_path / "brats"
    c = brats / "BraTS20_Training_001"
    c.mkdir(parents=True)
    for m in ("t1", "t1ce", "t2", "flair"):
        mk(c / f"BraTS20_Training_001_{m}.nii.gz")
    seg = np.zeros((4, 5, 6), np.uint8)
    seg[0, 0, 0] = 4
    seg[1, 1, 1] = 1
    write_nifti(str(c / "BraTS20_Training_001_seg.nii.gz"),
                NiftiImage(seg, (1, 1, 1)))
    out = tasks.convert_brats(str(brats), 82, "BraTS2020")
    conv = read_nifti(os.path.join(out, "labelsTr",
                                   "BraTS20_Training_001.nii.gz")).array
    assert conv[0, 0, 0] == 3 and conv[1, 1, 1] == 1

    # LiTS-style source
    lits = tmp_path / "lits"
    lits.mkdir()
    mk(lits / "volume-3.nii")
    mk(lits / "segmentation-3.nii", seg=True)
    out = tasks.convert_lits(str(lits))
    assert os.path.isfile(os.path.join(out, "imagesTr",
                                       "train_3_0000.nii.gz"))
    assert os.path.isfile(os.path.join(out, "labelsTr", "train_3.nii.gz"))

    # ACDC-style source
    acdc = tmp_path / "acdc" / "patient001"
    acdc.mkdir(parents=True)
    mk(acdc / "patient001_frame01.nii.gz")
    mk(acdc / "patient001_frame01_gt.nii.gz", seg=True)
    mk(acdc / "patient001_frame12.nii.gz")  # no gt -> skipped
    out = tasks.convert_acdc(str(tmp_path / "acdc"))
    assert os.path.isfile(os.path.join(
        out, "imagesTr", "patient001_frame01_0000.nii.gz"))
    assert not os.path.isfile(os.path.join(
        out, "imagesTr", "patient001_frame12_0000.nii.gz"))

    # SegTHOR-style source
    st = tmp_path / "segthor" / "Patient_01"
    st.mkdir(parents=True)
    mk(st / "Patient_01.nii.gz")
    mk(st / "GT.nii.gz", seg=True)
    out = tasks.convert_segthor(str(tmp_path / "segthor"))
    assert os.path.isfile(os.path.join(out, "labelsTr",
                                       "Patient_01.nii.gz"))

    # NIH pancreas source
    pan = tmp_path / "pancreas"
    (pan / "data").mkdir(parents=True)
    (pan / "TCIA_pancreas_labels-02-05-2017").mkdir()
    mk(pan / "data" / "PANCREAS_0001.nii.gz")
    mk(pan / "TCIA_pancreas_labels-02-05-2017" / "label0001.nii.gz",
       seg=True)
    out = tasks.convert_nih_pancreas(str(pan))
    assert os.path.isfile(os.path.join(out, "imagesTr",
                                       "pancreas_0001_0000.nii.gz"))

    # CovidSeg source (stacked 2D slices -> 5 pseudo-3D parts)
    cov = tmp_path / "covid"
    cov.mkdir()
    arr = rng.rand(10, 5, 6).astype(np.float32)
    write_nifti(str(cov / "tr_im.nii.gz"), NiftiImage(arr, (1, 1, 1)))
    write_nifti(str(cov / "tr_mask.nii.gz"),
                NiftiImage((arr > 0.5).astype(np.uint8), (1, 1, 1)))
    out = tasks.convert_covidseg(str(cov))
    p0 = read_nifti(os.path.join(out, "imagesTr",
                                 "part_0_0000.nii.gz")).array
    assert p0.shape == (2, 5, 6)
    np.testing.assert_allclose(p0, arr[0::5])

    # KiTS2021 source
    k21 = tmp_path / "kits21"
    (k21 / "case_00001").mkdir(parents=True)
    mk(k21 / "case_00001" / "imaging.nii.gz")
    mk(k21 / "case_00001" / "aggregated_MAJ_seg.nii.gz", seg=True)
    out = tasks.convert_kits2021(str(k21))
    assert os.path.isfile(os.path.join(out, "labelsTr",
                                       "case_00001.nii.gz"))


def test_device_augmenter():
    from e2enet_tpu.ops.device_augment import make_device_augmenter
    rng = np.random.RandomState(0)
    B, C = 2, 1
    in_patch, patch = (12, 14, 14), (8, 8, 8)
    data = jnp.asarray(rng.randn(B, *in_patch, C).astype(np.float32))
    seg = jnp.asarray(rng.randint(-1, 3, (B, *in_patch)).astype(np.float32))
    aug = make_device_augmenter(patch, in_patch, 3,
                                [[1, 1, 1], [.5, .5, .5]])
    d, targets = aug(jax.random.PRNGKey(0), data, seg)
    assert d.shape == (B, *patch, C)
    assert targets[0].shape == (B, *patch)
    assert targets[1].shape == (B, 4, 4, 4)
    assert int(jnp.min(targets[0])) >= 0          # -1 relabeled
    assert int(jnp.max(targets[0])) <= 2
    assert bool(jnp.all(jnp.isfinite(d)))
    # deterministic per key, different across keys
    d2, _ = aug(jax.random.PRNGKey(0), data, seg)
    np.testing.assert_array_equal(np.asarray(d), np.asarray(d2))
    d3, _ = aug(jax.random.PRNGKey(1), data, seg)
    assert not np.allclose(np.asarray(d), np.asarray(d3))


def test_device_augment_trainer_smoke(tmp_path):
    from e2enet_tpu.plans import Plans, StagePlan
    from e2enet_tpu.training.trainer import TPUTrainer
    sp = StagePlan(batch_size=2, num_pool_per_axis=[2, 2, 2],
                   patch_size=[8, 16, 16],
                   median_patient_size_in_voxels=[8, 16, 16],
                   current_spacing=[1, 1, 1], original_spacing=[1, 1, 1],
                   do_dummy_2D_data_aug=False,
                   pool_op_kernel_sizes=[[2, 2, 2]] * 2,
                   conv_kernel_sizes=[[3, 3, 3]] * 3)
    plans = Plans(num_stages=1, num_modalities=1, modalities={0: "MR"},
                  normalization_schemes={0: "nonCT"}, dataset_properties={},
                  list_of_npz_files=[], original_spacings=[],
                  original_sizes=[], preprocessed_data_folder=None,
                  num_classes=2, all_classes=[1, 2], base_num_features=8,
                  use_mask_for_norm={0: False},
                  keep_only_largest_region=None,
                  min_region_size_per_class=None, min_size_per_class=None,
                  transpose_forward=[0, 1, 2], transpose_backward=[0, 1, 2],
                  data_identifier="t", plans_per_stage={0: sp})
    tr = TPUTrainer(plans, 0, str(tmp_path), max_num_epochs=1,
                    num_batches_per_epoch=2, num_val_batches_per_epoch=0,
                    base_num_features=4, fp16=False, dummy_load=True,
                    device_augment=True)
    tr.initialize(True)
    # dummy_load yields pre-augmented batches; exercise the device-augment
    # branch directly with a raw-style batch
    rng = np.random.RandomState(0)
    basic = tr.basic_generator_patch_size
    batch = {"data": rng.randn(2, 1, *[int(i) for i in basic])
             .astype(np.float32),
             "seg": rng.randint(-1, 3, (2, 1, *[int(i) for i in basic]))
             .astype(np.float32)}
    gen = iter([batch])

    class G:
        def __next__(self):
            return batch
    loss = tr.run_iteration(G(), 1e-2, True)
    assert np.isfinite(np.asarray(loss))
