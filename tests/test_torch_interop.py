"""Checkpoint interop: a reference-format torch checkpoint (torch.save dict
+ pkl sidecar, nnUNetTrainer_simple.py:1140-1176) converted to a native
checkpoint must produce the same predictions through our TPU predictor as
the torch model does directly."""
import numpy as np
import pytest
import jax.numpy as jnp

from conftest import has_reference, import_reference_unetpp
from e2enet_tpu.utils.files import save_pickle

POOLS = [[1, 2, 2], [2, 2, 2], [2, 2, 2], [2, 2, 2], [1, 2, 2]]


@pytest.mark.skipif(not has_reference(), reason="reference not mounted")
def test_reference_checkpoint_roundtrip(tmp_path):
    torch = pytest.importorskip("torch")
    import torch.nn as nn
    Ref = import_reference_unetpp()
    torch.manual_seed(3)
    net = Ref((8, 64, 64), 1, 8, 3, 5, 2, 2, nn.Conv3d, nn.InstanceNorm3d,
              {'eps': 1e-5, 'affine': True}, nn.Dropout3d,
              {'p': 0, 'inplace': True}, nn.LeakyReLU,
              {'negative_slope': 1e-2, 'inplace': True}, True, False,
              lambda x: x, None, POOLS, [[1, 3, 3]] * 6, False, True, True)
    net.eval()

    # write a reference-format checkpoint + sidecar (plans.pkl dict shape)
    ckpt_file = str(tmp_path / "shiftConvPP_model_final_checkpoint.model")
    torch.save({"epoch": 42,
                "state_dict": {k: v.cpu() for k, v in
                               net.state_dict().items()},
                "optimizer_state_dict": None,
                "lr_scheduler_state_dict": None,
                "plot_stuff": ([], [], [], [])}, ckpt_file)
    raw_plans = {
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
            "patch_size": [8, 64, 64],
            "median_patient_size_in_voxels": [8, 64, 64],
            "current_spacing": [1, 1, 1], "original_spacing": [1, 1, 1],
            "do_dummy_2D_data_aug": False,
            "pool_op_kernel_sizes": POOLS,
            "conv_kernel_sizes": [[1, 3, 3]] * 6}},
    }
    save_pickle({"init": (None,) * 9, "name": "nnUNetTrainer_simple",
                 "class": "...", "plans": raw_plans}, ckpt_file + ".pkl")

    # convert to native format
    from e2enet_tpu.models.torch_checkpoint import (
        convert_reference_model_to_native)
    fold_dir = tmp_path / "model" / "fold_0"
    fold_dir.mkdir(parents=True)
    native = str(fold_dir / "shiftConvPP_model_final_checkpoint.model")
    convert_reference_model_to_native(ckpt_file, native,
                                      base_num_features=8)

    # serve it with our predictor machinery
    from e2enet_tpu.inference.predictor import ModelBundle, predict_case
    bundle = ModelBundle(str(tmp_path / "model"), [0], "shiftConvPP",
                         compute_dtype=jnp.float32)
    rng = np.random.RandomState(0)
    data = rng.randn(1, 8, 64, 64).astype(np.float32)  # (C, X, Y, Z)
    probs = predict_case(bundle, data, do_tta=False, step_size=1.0)
    seg_ours = probs.argmax(0)

    with torch.no_grad():
        logits = net(torch.from_numpy(data[None]))
        # do_ds=True -> list; take full-res head
        ref_probs = torch.softmax(logits[0], 1)[0].numpy()
    seg_ref = ref_probs.argmax(0)
    agreement = (seg_ours == seg_ref).mean()
    assert agreement > 0.999, f"agreement {agreement}"
    np.testing.assert_allclose(probs, ref_probs, atol=2e-3)


@pytest.mark.skipif(not has_reference(), reason="reference not mounted")
def test_native_to_torch_export_roundtrip():
    """export_unetpp_state_dict is the exact inverse of
    convert_unetpp_state_dict, and the exported dict strict-loads into the
    reference torch network (the trained-checkpoint fidelity bridge)."""
    torch = pytest.importorskip("torch")
    import torch.nn as nn
    Ref = import_reference_unetpp()
    torch.manual_seed(7)
    net = Ref((8, 64, 64), 1, 8, 3, 5, 2, 2, nn.Conv3d, nn.InstanceNorm3d,
              {'eps': 1e-5, 'affine': True}, nn.Dropout3d,
              {'p': 0, 'inplace': True}, nn.LeakyReLU,
              {'negative_slope': 1e-2, 'inplace': True}, True, False,
              lambda x: x, None, POOLS, [[1, 3, 3]] * 6, False, True, True)
    sd = {k: v.cpu().numpy() for k, v in net.state_dict().items()}

    from e2enet_tpu.models.torch_import import (convert_unetpp_state_dict,
                                                export_unetpp_state_dict)
    params = convert_unetpp_state_dict(sd, num_pool=5)
    back = export_unetpp_state_dict(params, num_pool=5)
    assert set(back) == set(sd), (
        f"key mismatch: {sorted(set(back) ^ set(sd))[:6]}")
    for k in sd:
        np.testing.assert_array_equal(back[k], sd[k], err_msg=k)
    missing, unexpected = net.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v))
         for k, v in back.items()}, strict=True)
    assert not missing and not unexpected
