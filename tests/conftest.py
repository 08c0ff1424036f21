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
