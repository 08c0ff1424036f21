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

    if "batchgenerators" not in sys.modules:
        bg = types.ModuleType("batchgenerators")
        aug = types.ModuleType("batchgenerators.augmentations")
        aug_utils = types.ModuleType("batchgenerators.augmentations.utils")
        aug_utils.pad_nd_image = _fail
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
