"""Folder prediction: case discovery, preprocessing, fold-ensemble
sliding-window inference, export.

Parity: reference inference/predict.py (predict_from_folder :675-771,
predict_cases :194-356, case discovery by the _0000.nii.gz convention
:639-672, multi-process sharding [part_id::num_parts] :745) and
training/model_restore.py (restore trainer + all fold params :44-154, Tconv
recovered from the checkpoint name :144-148).

TPU redesign: per tile, the 8 mirror-TTA flips run as one batched forward
inside a single compiled program (ops/sliding.make_tiled_predictor); fold
ensembling hot-swaps param pytrees on device and accumulates softmax on the
host. A background thread preprocesses the next case while the TPU predicts
the current one (reference's preprocess_multithreaded Queue(1), :93-128).
"""
import os
import queue
import threading
from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np

from ..ops.sliding import (make_tiled_predictor, make_tiled_predictor_sharded,
                           predict_volume_tiled)
from ..plans import Plans
from ..preprocessing.preprocessor import GenericPreprocessor
from ..models.unetpp import build_network
from ..training.checkpoint import load_checkpoint
from ..utils.files import (isdir, isfile, join, load_pickle, maybe_mkdir_p, subfiles)
from .export import save_segmentation_nifti_from_softmax


def check_input_folder_and_return_caseIDs(input_folder: str,
                                          expected_num_modalities: int):
    """Case discovery by the _XXXX.nii.gz convention (predict.py:639-672)."""
    files = subfiles(input_folder, join=False, suffix=".nii.gz", sort=True)
    maybe_case_ids = np.unique([i[:-12] for i in files])
    remaining = set(files)
    missing = []
    for c in maybe_case_ids:
        for n in range(expected_num_modalities):
            expected = f"{c}_{n:04d}.nii.gz"
            if expected in remaining:
                remaining.remove(expected)
            else:
                missing.append(expected)
    assert len(missing) == 0, f"missing modality files: {missing}"
    if len(remaining):
        print("WARNING: unexpected files:", sorted(remaining))
    return list(maybe_case_ids)


class ModelBundle:
    """All folds of one trained model, restored from checkpoints."""

    def __init__(self, model_folder: str, folds: Sequence, tconv: str,
                 checkpoint_name: Optional[str] = None,
                 compute_dtype=jnp.bfloat16):
        self.model_folder = model_folder
        self.tconv = tconv
        checkpoint_name = checkpoint_name or f"{tconv}_model_final_checkpoint"

        if folds is None or (isinstance(folds, (list, tuple))
                             and folds[0] == "all"):
            fold_dirs = [join(model_folder, "all")] if isdir(
                join(model_folder, "all")) else sorted(
                [join(model_folder, d) for d in os.listdir(model_folder)
                 if d.startswith("fold_")])
        else:
            fold_dirs = [join(model_folder, f"fold_{f}") for f in folds]
        assert len(fold_dirs) > 0, f"no folds found in {model_folder}"

        self.fold_params = []
        sidecar = None
        fold_plans = []
        for fd in fold_dirs:
            ckpt = join(fd, checkpoint_name + ".model")
            assert isfile(ckpt), f"checkpoint missing: {ckpt}"
            state, _epoch, _meta = load_checkpoint(ckpt)
            from ..training import dsff
            params = state.params
            if state.masks is not None:
                params = dsff.apply_masks(params, state.masks)
                from ..models.sparse_plan import build_sparse_plan
                fold_plans.append(build_sparse_plan(state.masks))
            else:
                fold_plans.append(None)
            self.fold_params.append(params)
            if sidecar is None and isfile(ckpt + ".pkl"):
                sidecar = load_pickle(ckpt + ".pkl")
        # DSFF row-sparse inference: realize the FLOP cut when every fold
        # shares one plan (a single fold, or identically-structured masks);
        # otherwise run dense — mixed per-fold plans would need one
        # compiled program per fold. Unstructured (kernel-pair) masks give
        # plan None and run dense, exactly like the reference.
        self.sparse_plan = (fold_plans[0]
                            if fold_plans and fold_plans[0] is not None
                            and all(p == fold_plans[0] for p in fold_plans)
                            else None)
        assert sidecar is not None, "checkpoint sidecar pkl missing"
        self.sidecar_init = sidecar["init"]
        self.plans = Plans.from_dict(sidecar["plans"])
        self.stage = sidecar["init"].get("stage", 0) or 0
        self.stage_plan = self.plans.plans_per_stage[self.stage]
        self.num_classes = self.plans.num_classes + 1
        num_in = self.plans.num_modalities
        if sidecar["init"].get("cascade", False):
            num_in += self.num_classes - 1
        self.patch_size = tuple(int(i) for i in self.stage_plan.patch_size)
        self.network = build_network(
            self.stage_plan, num_in, self.num_classes,
            tconv=tconv,
            base_num_features=sidecar["init"].get("base_num_features", 48),
            compute_dtype=compute_dtype, quadrant_logits=True,
            quadrant_input=self.patch_size,
            sparse_plan=(self.sparse_plan if tconv in (
                "shiftConvPP", "shiftConvPP_noshift") else None))

    def quadrant_meta(self):
        """(q0, Hq, Wq) for ops/sliding's quadrant-logits path; harmless
        if the network falls back to plain logits (rank decides)."""
        q0 = tuple(int(k) for k in self.stage_plan.pool_op_kernel_sizes[0])
        return (q0, self.patch_size[1] // q0[1],
                self.patch_size[2] // q0[2])

    def make_preprocessor(self) -> GenericPreprocessor:
        return GenericPreprocessor(
            self.plans.normalization_schemes,
            self.plans.use_mask_for_norm,
            self.plans.transpose_forward,
            self.plans.intensity_properties)


def sidecar_requires_cascade(bundle: "ModelBundle") -> bool:
    return bool(bundle.sidecar_init.get("cascade", False))


def append_prev_stage_onehot(data: np.ndarray, out_file: str,
                             prev_stage_folder: str, transpose_forward,
                             fg_labels):
    """Load the lowres prediction for this case, bring it to the
    preprocessed geometry (transpose + label-safe resize) and append one-hot
    channels (reference predict.py cascade path)."""
    from ..io.nifti import read_nifti
    from ..preprocessing.resampling import resize_segmentation
    case = os.path.basename(out_file)
    prev_file = join(prev_stage_folder, case)
    assert isfile(prev_file), f"missing lowres prediction {prev_file}"
    seg = read_nifti(prev_file).array.astype(np.float32)
    seg = seg.transpose([int(i) for i in transpose_forward])
    if seg.shape != data.shape[1:]:
        seg = resize_segmentation(seg, data.shape[1:], order=1)
    onehot = np.stack([(seg == l).astype(np.float32) for l in fg_labels])
    return np.concatenate([data, onehot], axis=0)


def mirror_apply_fns_for(network, mirror_axes=(0, 1, 2),
                         wrap_params=True):
    """Flip-free mirror TTA: one statically MIRRORED apply per flip
    combination (ops/sliding.flip_combinations order), all sharing the
    SAME parameter tree — net.clone(flips=c) computes
    flip_c(net(flip_c(x))) exactly via mirrored operators (models/unetpp
    `flips`), so the sliding predictor never flips data (the reference
    flips per pass, neural_network.py:529-563).

    wrap_params: True when callers pass the bare params tree (ModelBundle
    style — apply gets {"params": params}); False when callers pass the
    full variables dict from model.init (bench/experiment style)."""
    from ..ops.sliding import flip_combinations
    fns = []
    for c in flip_combinations(mirror_axes):
        f = tuple(a in c for a in (0, 1, 2))
        net_m = network.clone(flips=f) if any(f) else network
        fns.append(lambda params, x, _n=net_m: _n.apply(
            {"params": params} if wrap_params else params, x, do_ds=False))
    return fns


def _make_mesh(num_devices: int):
    import jax
    from jax.sharding import Mesh
    devs = jax.devices()[:num_devices]
    assert len(devs) == num_devices, (
        f"requested {num_devices} devices, only {len(jax.devices())} present")
    return Mesh(np.array(devs), ("data",))


def predict_case(bundle: ModelBundle, data: np.ndarray,
                 do_tta: bool = True, step_size: float = 0.5,
                 predictor_cache: Optional[dict] = None,
                 num_devices: int = 1,
                 all_in_gpu: bool = False,
                 flip_free: Optional[bool] = None) -> np.ndarray:
    """Fold-ensemble softmax for preprocessed data (C, X, Y, Z).

    num_devices > 1 shards the TILE list of every volume over a device mesh
    (ops/sliding.make_tiled_predictor_sharded) — the TPU answer to the
    reference's per-process case sharding (predict.py:745): every chip works
    on the same case, so single-case latency drops too.

    all_in_gpu mirrors the reference's fast mode (neural_network.py:337-363:
    fp16 accumulators kept on device): f16 sliding-window accumulators,
    ~2%% faster; default keeps exact f32 accumulation.

    flip_free: mirror TTA via statically mirrored operators instead of
    data flips (mirror_apply_fns_for; exact — same math, no flips).
    None = auto: on whenever TTA runs."""
    if flip_free is None:
        flip_free = do_tta
    net = bundle.network
    if (all_in_gpu and flip_free and do_tta
            and getattr(net, "compute_dtype", None) == jnp.bfloat16
            and getattr(net, "quadrant_logits", False)
            and hasattr(net, "head_probs_dtype")):
        # fast mode on the flip-free quadrant path: fuse the class softmax
        # into the seg head (one Pallas pass emitting bf16 probs —
        # qlink.seghead_probs_quadrant; bench headline path). Exact mode
        # (all_in_gpu=False) keeps f32 logits + separate softmax.
        net = net.clone(head_probs_dtype=jnp.bfloat16)
    apply_fn = lambda params, x: net.apply(
        {"params": params}, x, do_ds=False)
    mirror_fns = (mirror_apply_fns_for(net)
                  if (flip_free and do_tta) else None)
    accum = jnp.float16 if all_in_gpu else jnp.float32
    # fast mode also keeps the per-pass TTA probs bf16 (for bf16 models);
    # the logits heads emit f32 regardless, so this is an explicit knob.
    # Under flip-free TTA there is no unflip chain — prob_dtype is a no-op
    # there, so pass None to avoid the sliding-window guard warning.
    prob_dtype = (jnp.bfloat16 if all_in_gpu and mirror_fns is None
                  and bundle.network.compute_dtype == jnp.bfloat16
                  else None)
    key = (bundle.patch_size, do_tta, num_devices, all_in_gpu,
           bool(mirror_fns))
    if predictor_cache is not None and key in predictor_cache:
        predictor = predictor_cache[key]
    else:
        qmeta = bundle.quadrant_meta()
        if num_devices > 1:
            predictor = make_tiled_predictor_sharded(
                apply_fn, bundle.patch_size, bundle.num_classes,
                _make_mesh(num_devices), mirror_axes=(0, 1, 2),
                do_mirroring=do_tta, accum_dtype=accum,
                quadrant_meta=qmeta, prob_dtype=prob_dtype,
                mirror_apply_fns=mirror_fns)
        else:
            predictor = make_tiled_predictor(
                apply_fn, bundle.patch_size, bundle.num_classes,
                mirror_axes=(0, 1, 2), do_mirroring=do_tta,
                accum_dtype=accum, quadrant_meta=qmeta,
                prob_dtype=prob_dtype,
                mirror_apply_fns=mirror_fns)
        if predictor_cache is not None:
            predictor_cache[key] = predictor
    softmax_sum = None
    for params in bundle.fold_params:
        probs = predict_volume_tiled(
            apply_fn, params, data, bundle.patch_size, bundle.num_classes,
            step_size=step_size, do_mirroring=do_tta, predictor=predictor,
            min_tile_multiple=num_devices)
        softmax_sum = probs if softmax_sum is None else softmax_sum + probs
    return softmax_sum / len(bundle.fold_params)


def predict_from_folder(model_folder: str, input_folder: str,
                        output_folder: str, folds, save_npz: bool,
                        do_tta: bool = True, step_size: float = 0.5,
                        checkpoint_name: Optional[str] = None,
                        tconv: str = "shiftConvPP",
                        part_id: int = 0, num_parts: int = 1,
                        overwrite_existing: bool = True,
                        disable_postprocessing: bool = False,
                        mode: str = "normal",
                        segs_from_prev_stage_folder: Optional[str] = None,
                        num_devices: int = 1,
                        all_in_gpu: bool = False,
                        compute_dtype=jnp.bfloat16):
    """mode (reference predict_cases/_fast/_fastest, predict.py:194,362,514):
      normal : resample the full softmax back to original geometry (order 1)
      fast   : argmax at network resolution, resample the label map only
      fastest: like fast, and TTA disabled
    """
    assert mode in ("normal", "fast", "fastest")
    if mode == "fastest":
        do_tta = False
    maybe_mkdir_p(output_folder)
    bundle = ModelBundle(model_folder, folds, tconv, checkpoint_name,
                         compute_dtype=compute_dtype)
    expected_num_modalities = bundle.plans.num_modalities
    case_ids = check_input_folder_and_return_caseIDs(
        input_folder, expected_num_modalities)
    case_ids = case_ids[part_id::num_parts]

    all_files = subfiles(input_folder, join=False, suffix=".nii.gz",
                         sort=True)
    list_of_lists = [
        [join(input_folder, f) for f in all_files
         if f[:len(c)].startswith(c) and len(f) == len(c) + 12]
        for c in case_ids]
    output_files = [join(output_folder, f"{c}.nii.gz") for c in case_ids]

    if not overwrite_existing:
        keep = [i for i, o in enumerate(output_files) if not isfile(o)]
        list_of_lists = [list_of_lists[i] for i in keep]
        output_files = [output_files[i] for i in keep]
        case_ids = [case_ids[i] for i in keep]

    cascade = bool(sidecar_requires_cascade(bundle))
    if cascade:
        assert segs_from_prev_stage_folder is not None, (
            "this is a cascade model: pass the lowres predictions via "
            "segs_from_prev_stage_folder (predict with -m 3d_cascade_fullres "
            "to run the lowres stage automatically)")
    preprocessor = bundle.make_preprocessor()
    target_spacing = bundle.stage_plan.current_spacing

    # background preprocessing: overlap host prep of case i+1 with device
    # inference of case i (reference Queue(1) pipeline, predict.py:93-128)
    q: "queue.Queue" = queue.Queue(maxsize=1)

    def producer():
        for files, ofile in zip(list_of_lists, output_files):
            d, s, props = preprocessor.preprocess_test_case(files,
                                                            target_spacing)
            if cascade:
                d = append_prev_stage_onehot(
                    d, ofile, segs_from_prev_stage_folder,
                    bundle.plans.transpose_forward,
                    list(range(1, bundle.num_classes)))
            q.put((d, props, ofile))
        q.put(None)

    t = threading.Thread(target=producer, daemon=True)
    t.start()

    pp_file = join(model_folder, "postprocessing.json")
    postprocess = None
    if not disable_postprocessing and isfile(pp_file):
        from ..postprocessing.connected_components import \
            load_postprocessing_fn
        postprocess = load_postprocessing_fn(pp_file)

    predictor_cache = {}
    results = []
    while True:
        item = q.get()
        if item is None:
            break
        data, props, ofile = item
        print("predicting", os.path.basename(ofile))
        softmax = predict_case(bundle, data, do_tta=do_tta,
                               all_in_gpu=all_in_gpu,
                               step_size=step_size,
                               predictor_cache=predictor_cache,
                               num_devices=num_devices)
        transpose_backward = bundle.plans.transpose_backward
        softmax = softmax.transpose(
            [0] + [int(i) + 1 for i in transpose_backward])
        npz_file = ofile[:-7] + ".npz" if save_npz else None
        if mode in ("fast", "fastest"):
            from .export import save_segmentation_nifti
            seg = softmax.argmax(0).astype(np.uint8)
            save_segmentation_nifti(seg, ofile, props, 1)
        elif postprocess is not None:
            save_segmentation_nifti_from_softmax(
                softmax, ofile, props, 1, None, postprocess["fn"],
                postprocess["args"], npz_file)
        else:
            save_segmentation_nifti_from_softmax(
                softmax, ofile, props, 1, None, None, None, npz_file)
        results.append(ofile)
    t.join()
    return results
