from .nifti import NiftiImage, read_nifti, write_nifti  # noqa: F401
