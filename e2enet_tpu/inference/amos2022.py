"""AMOS2022 competition inference variant.

Parity: reference inference/amos2022/inference_code.py
(predict_cases_amos2022 :15+): keep everything on device (all_in_gpu) and
resample the softmax to the original geometry ON DEVICE (F.interpolate)
instead of the host spline path — the speed-oriented competition setup.

TPU version: the tiled predictor already keeps accumulation on device; this
module adds device-side trilinear softmax resampling (jax.image.resize) so
the host only receives the final original-geometry label map.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..io.nifti import NiftiImage, write_nifti
from ..utils.files import maybe_mkdir_p


def resample_softmax_on_device(softmax: np.ndarray, target_shape,
                               method: str = "trilinear") -> np.ndarray:
    """softmax: (C, X, Y, Z) -> argmax label map at target_shape, with the
    resampling done on the accelerator (F.interpolate equivalent)."""
    x = jnp.asarray(softmax)
    out_shape = (x.shape[0], *[int(i) for i in target_shape])
    method = {"trilinear": "linear", "linear": "linear",
              "nearest": "nearest"}[method]

    @jax.jit
    def _run(x):
        y = jax.image.resize(x, out_shape, method=method)
        return jnp.argmax(y, axis=0).astype(jnp.uint8)

    return np.asarray(_run(x))


def export_softmax_amos2022(softmax: np.ndarray, out_fname: str,
                            properties: dict):
    """Device-resampled export: softmax at network geometry -> label map at
    original geometry -> paste into pre-crop canvas -> write."""
    target_shape = properties["size_after_cropping"]
    seg = resample_softmax_on_device(softmax, target_shape)

    bbox = properties.get("crop_bbox")
    shape_original = properties["original_size_of_raw_data"]
    if bbox is not None:
        canvas = np.zeros([int(i) for i in shape_original], np.uint8)
        for c in range(3):
            bbox[c][1] = np.min((bbox[c][0] + seg.shape[c],
                                 int(shape_original[c])))
        canvas[bbox[0][0]:bbox[0][1], bbox[1][0]:bbox[1][1],
               bbox[2][0]:bbox[2][1]] = seg
    else:
        canvas = seg
    d = os.path.dirname(out_fname)
    if d:
        maybe_mkdir_p(d)
    write_nifti(out_fname, NiftiImage(canvas, properties["itk_spacing"],
                                      properties["itk_origin"],
                                      properties["itk_direction"]))


def predict_from_folder_amos2022(model_folder: str, input_folder: str,
                                 output_folder: str, folds,
                                 tconv: str = "shiftConvPP",
                                 do_tta: bool = True,
                                 step_size: float = 0.5):
    """predict_cases_amos2022 equivalent: fold-ensemble sliding window with
    device-side softmax resampling export."""
    from .predictor import (ModelBundle, check_input_folder_and_return_caseIDs,
                            predict_case)
    from ..utils.files import join, subfiles
    maybe_mkdir_p(output_folder)
    bundle = ModelBundle(model_folder, folds, tconv)
    case_ids = check_input_folder_and_return_caseIDs(
        input_folder, bundle.plans.num_modalities)
    all_files = subfiles(input_folder, join=False, suffix=".nii.gz",
                         sort=True)
    preprocessor = bundle.make_preprocessor()
    target_spacing = bundle.stage_plan.current_spacing
    cache = {}
    for c in case_ids:
        files = [join(input_folder, f) for f in all_files
                 if f.startswith(c) and len(f) == len(c) + 12]
        d, s, props = preprocessor.preprocess_test_case(files,
                                                        target_spacing)
        softmax = predict_case(bundle, d, do_tta=do_tta,
                               step_size=step_size, predictor_cache=cache)
        softmax = softmax.transpose(
            [0] + [int(i) + 1 for i in bundle.plans.transpose_backward])
        export_softmax_amos2022(softmax, join(output_folder, f"{c}.nii.gz"),
                                props)
        print("amos2022 export:", c)
