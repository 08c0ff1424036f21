import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Tests run on a virtual 8-device CPU mesh so multi-chip sharding paths are
# exercised without TPU hardware. NOTE: this environment has an `axon` TPU
# plugin loaded via sitecustomize that pre-imports jax with
# JAX_PLATFORMS=axon, so env vars (JAX_PLATFORMS / XLA_FLAGS) set here come
# too late — use runtime config instead, which works as long as no backend
# has been initialized yet.
import jax  # noqa: E402
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# persistent XLA compile cache: the 1-CPU host pays ~10s+ per conv shape to
# compile; caching makes re-runs fast
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

REFERENCE_DIR = "/root/reference"

# Tests measured >5s warm-cache on the 1-CPU host (pytest --durations,
# round-4 run: 251 tests, 21:39 cold / ~4 min warm). Everything else is
# auto-marked `quick` so `-m quick` gives a ~2-min smoke signal before
# committing; `-m slow` runs the heavy remainder. Keep this list in sync
# when adding big model/pipeline tests.
_SLOW_TESTS = {
    "test_flips.py::test_full_model_flips",
    "test_flips.py::test_flip_free_sliding_matches_flip_tta",
    "test_flips.py::test_quadrant_fused_block_flips",
    "test_flips.py::test_qstride_kernel_flips",
    "test_qfused.py::test_sliding_with_quadrant_logits_matches_plain",
    "test_qfused.py::test_model_quadrant_grad_matches",
    "test_qfused.py::test_model_quadrant_matches_xla_path",
    "test_qfused.py::test_lazy_up_matches_materialized",
    "test_qfused.py::test_backward_matches_xla_reference",
    "test_qfused.py::test_backward_chunked_matches_xla_reference",
    "test_parallel.py::test_dryrun_multichip",
    "test_sparse_plan.py::test_sparse_plan_quadrant_logits_and_bf16",
    "test_sparse_plan.py::test_sparse_forward_matches_dense_masked",
    "test_sparse_plan.py::test_sparse_plan_skips_unstructured_masks",
    "test_end_to_end.py::test_full_pipeline",
    "test_end_to_end.py::test_continue_training_and_ensemble",
    "test_end_to_end.py::test_2d_pipeline",
    "test_end_to_end.py::test_tconv_ori_and_nodff",
    "test_pipeline_parity.py::test_full_predict_pipeline_matches_reference",
    "test_model.py::test_param_count_parity",
    "test_model.py::test_output_shapes_and_ds",
    "test_model.py::test_forward_parity_with_reference",
    "test_components.py::test_grasp_init",
    "test_components.py::test_element_masks_and_snip",
    "test_training_parity.py::test_train_step_matches_reference_torch",
    "test_resenc.py::test_resenc_shapes_and_ds",
    "test_resenc.py::test_resenc_forward_parity",
    "test_resenc.py::test_allconv3x3_model_builds",
    "test_qstride.py::test_grad_matches_reference_exactly",
    "test_fused_block.py::test_model_fused_grad_matches",
    "test_fused_block.py::test_model_fused_matches_xla_path",
    "test_fused_block.py::test_fused_grad_matches_oracle",
    "test_cascade.py::test_cascade_pipeline",
    "test_dsff.py::test_global_update_density_schedule",
}


def pytest_collection_modifyitems(config, items):
    import pytest as _pytest
    for item in items:
        key = "%s::%s" % (os.path.basename(str(item.fspath)),
                          item.name.split("[")[0])
        if key in _SLOW_TESTS:
            item.add_marker(_pytest.mark.slow)
        else:
            item.add_marker(_pytest.mark.quick)


def has_reference():
    return os.path.isdir(REFERENCE_DIR)


def stub_reference_deps():
    """Make the reference package importable as a numerical oracle by
    stubbing the host libraries absent in this image (batchgenerators,
    SimpleITK)."""
    import types
    if REFERENCE_DIR not in sys.path:
        sys.path.insert(0, REFERENCE_DIR)

    def _fail(*a, **k):
        raise NotImplementedError("stub")

    def pad_nd_image(image, new_shape=None, mode="constant", kwargs=None,
                     return_slicer=False, shape_must_be_divisible_by=None):
        """Faithful batchgenerators.augmentations.utils.pad_nd_image —
        needed by the reference predict_3D (neural_network.py:300)."""
        import numpy as _np
        if kwargs is None:
            kwargs = {"constant_values": 0}
        if new_shape is not None:
            old_shape = _np.array(image.shape[-len(new_shape):])
        else:
            assert shape_must_be_divisible_by is not None
            new_shape = image.shape[-len(shape_must_be_divisible_by):]
            old_shape = new_shape
        num_axes_nopad = len(image.shape) - len(new_shape)
        new_shape = [max(new_shape[i], old_shape[i])
                     for i in range(len(new_shape))]
        if shape_must_be_divisible_by is not None:
            if not isinstance(shape_must_be_divisible_by,
                              (list, tuple, _np.ndarray)):
                shape_must_be_divisible_by = \
                    [shape_must_be_divisible_by] * len(new_shape)
            elif len(shape_must_be_divisible_by) < len(new_shape):
                shape_must_be_divisible_by = (
                    [1] * (len(new_shape) - len(shape_must_be_divisible_by))
                    + list(shape_must_be_divisible_by))
            for i in range(len(new_shape)):
                if new_shape[i] % shape_must_be_divisible_by[i] == 0:
                    new_shape[i] -= shape_must_be_divisible_by[i]
            new_shape = _np.array(
                [new_shape[i] + shape_must_be_divisible_by[i]
                 - new_shape[i] % shape_must_be_divisible_by[i]
                 for i in range(len(new_shape))])
        difference = new_shape - old_shape
        pad_below = difference // 2
        pad_above = difference // 2 + difference % 2
        pad_list = ([[0, 0]] * num_axes_nopad
                    + [list(i) for i in zip(pad_below, pad_above)])
        if not _np.all(_np.array(pad_list) == 0):
            res = _np.pad(image, pad_list, mode, **kwargs)
        else:
            res = image
        if not return_slicer:
            return res
        pad_list = _np.array(pad_list)
        pad_list[:, 1] = _np.array(res.shape) - pad_list[:, 1]
        slicer = [slice(*i) for i in pad_list]
        return res, slicer

    if "batchgenerators" not in sys.modules:
        bg = types.ModuleType("batchgenerators")
        aug = types.ModuleType("batchgenerators.augmentations")
        aug_utils = types.ModuleType("batchgenerators.augmentations.utils")
        aug_utils.pad_nd_image = pad_nd_image
        util = types.ModuleType("batchgenerators.utilities")
        ffo = types.ModuleType(
            "batchgenerators.utilities.file_and_folder_operations")
        ffo.join = os.path.join
        ffo.isdir = os.path.isdir
        ffo.isfile = os.path.isfile
        ffo.maybe_mkdir_p = lambda d: os.makedirs(d, exist_ok=True)
        ffo.subfiles = _fail
        ffo.subdirs = _fail
        ffo.load_pickle = _fail
        ffo.save_pickle = _fail
        ffo.load_json = _fail
        ffo.save_json = _fail
        bg.augmentations = aug
        aug.utils = aug_utils
        bg.utilities = util
        util.file_and_folder_operations = ffo
        for name, mod in [("batchgenerators", bg),
                          ("batchgenerators.augmentations", aug),
                          ("batchgenerators.augmentations.utils", aug_utils),
                          ("batchgenerators.utilities", util),
                          ("batchgenerators.utilities."
                           "file_and_folder_operations", ffo)]:
            sys.modules[name] = mod
    if "SimpleITK" not in sys.modules:
        sitk = types.ModuleType("SimpleITK")
        sitk.ReadImage = _fail
        sitk.WriteImage = _fail
        sitk.GetArrayFromImage = _fail
        sitk.GetImageFromArray = _fail
        sys.modules["SimpleITK"] = sitk


def import_reference_unetpp():
    stub_reference_deps()
    from e2enet.network_architecture.unetpp_d import Generic_UNetPlusPlus
    return Generic_UNetPlusPlus
