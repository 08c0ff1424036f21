"""Segmentation losses: soft Dice + cross-entropy with deep supervision.
TPU notes: tp/fp/fn use the sum identities (one product reduction) and CE
contracts against the shared one-hot instead of gathering — the naive forms
cost 82 ms/step at Heart geometry (fusion-duplicated reductions + gathers).

Parity: reference e2enet/training/loss_functions/dice_loss.py
(get_tp_fp_fn_tn :100-192, SoftDiceLoss :195-232, DC_and_CE_loss :302-359),
crossentropy.py (RobustCrossEntropyLoss), TopK_loss.py,
deep_supervision.py (MultipleOutputLoss2 :19-43).

Layout: logits (N, D, H, W, C); target (N, D, H, W) integer labels.
All loss math in float32.
"""
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def softmax_helper(x):
    return jax.nn.softmax(x, axis=-1)


def one_hot(target: jnp.ndarray, num_classes: int) -> jnp.ndarray:
    return jax.nn.one_hot(target, num_classes, dtype=jnp.float32)


def get_tp_fp_fn_tn(probs: jnp.ndarray, target: jnp.ndarray,
                    batch_dice: bool,
                    loss_mask: Optional[jnp.ndarray] = None):
    """Soft confusion counts. probs: (N, ..., C) post-softmax;
    target: (N, ...) int. Sums over spatial axes, and over the batch axis
    too when batch_dice (reference SoftDiceLoss axes selection)."""
    num_classes = probs.shape[-1]
    y = one_hot(target, num_classes)
    if loss_mask is not None:
        m = loss_mask[..., None].astype(jnp.float32)
        probs = probs * m
        y = y * m
    axes = tuple(range(0 if batch_dice else 1, probs.ndim - 1))
    # fp = sum(p (1-y)) = sum(p) - tp; fn = sum((1-p) y) = sum(y) - tp:
    # one product reduction instead of three (XLA loop fusions recompute
    # the elementwise body once PER reduction — measured 82 ms/loss at
    # production sizes with the naive form)
    tp = jnp.sum(probs * y, axis=axes)
    fp = jnp.sum(probs, axis=axes) - tp
    fn = jnp.sum(y, axis=axes) - tp
    return tp, fp, fn


def soft_dice_loss(logits: jnp.ndarray, target: jnp.ndarray,
                   batch_dice: bool = True, do_bg: bool = False,
                   smooth: float = 1e-5,
                   loss_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    probs = softmax_helper(logits.astype(jnp.float32))
    tp, fp, fn = get_tp_fp_fn_tn(probs, target, batch_dice, loss_mask)
    nominator = 2.0 * tp + smooth
    denominator = 2.0 * tp + fp + fn + smooth
    dc = nominator / (denominator + 1e-8)
    if not do_bg:
        dc = dc[1:] if batch_dice else dc[:, 1:]
    return -jnp.mean(dc)


def robust_cross_entropy(logits: jnp.ndarray, target: jnp.ndarray,
                         loss_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Mean CE over all voxels (reference RobustCrossEntropyLoss = standard
    nn.CrossEntropyLoss on long labels)."""
    logits = logits.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    # one-hot contraction instead of take_along_axis: per-voxel gathers are
    # slow on TPU; the one_hot is shared (CSE) with the dice term
    y = one_hot(target, logits.shape[-1])
    nll = -jnp.sum(logp * y, axis=-1)
    if loss_mask is not None:
        m = loss_mask.astype(jnp.float32)
        return jnp.sum(nll * m) / jnp.maximum(jnp.sum(m), 1.0)
    return jnp.mean(nll)


def dc_and_ce_loss(logits: jnp.ndarray, target: jnp.ndarray,
                   batch_dice: bool = True, weight_ce: float = 1.0,
                   weight_dice: float = 1.0, smooth: float = 1e-5,
                   ignore_label: Optional[int] = None) -> jnp.ndarray:
    """The default training loss (DC_and_CE_loss, dice_loss.py:302-359;
    constructed with batch_dice, smooth 1e-5, do_bg=False at
    nnUNetTrainer_simple.py:100)."""
    loss_mask = None
    if ignore_label is not None:
        loss_mask = (target != ignore_label)
        target = jnp.where(loss_mask, target, 0)
    dc = soft_dice_loss(logits, target, batch_dice=batch_dice, do_bg=False,
                        smooth=smooth, loss_mask=loss_mask)
    ce = robust_cross_entropy(logits, target, loss_mask=loss_mask)
    return weight_ce * ce + weight_dice * dc


def topk_cross_entropy(logits: jnp.ndarray, target: jnp.ndarray,
                       k_percent: float = 10.0) -> jnp.ndarray:
    """TopK loss (TopK_loss.py:20): mean over the k% highest-CE voxels."""
    logits = logits.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, target[..., None].astype(jnp.int32),
                               axis=-1)[..., 0].reshape(-1)
    num = int(nll.shape[0] * k_percent / 100.0)
    vals, _ = jax.lax.top_k(nll, max(num, 1))
    return jnp.mean(vals)


def make_loss(name: str, batch_dice: bool = True, **loss_kwargs):
    """Resolve a loss by registry name to fn(logits, target) (the variant
    trainers' loss dispatch). loss_kwargs are forwarded to the loss (e.g.
    smooth=0 for nnUNetTrainerV2_Loss_DiceCE_noSmooth, weight_ce/weight_dice
    for the CE->Dice transition trainer)."""
    fn = LOSS_REGISTRY[name]
    takes_batch_dice = name in ("dc_ce", "dice", "dice_squared", "gdl",
                                "gdl_ce", "dc_topk", "dc_bce",
                                "dice_regions")
    if takes_batch_dice:
        return lambda o, t: fn(o, t, batch_dice=batch_dice, **loss_kwargs)
    if loss_kwargs:
        return lambda o, t: fn(o, t, **loss_kwargs)
    return fn


def deep_supervision_loss(outputs: Sequence[jnp.ndarray],
                          targets: Sequence[jnp.ndarray],
                          weights: Sequence[float],
                          batch_dice: bool = True,
                          loss_name: str = "dc_ce",
                          loss_kwargs=None) -> jnp.ndarray:
    """MultipleOutputLoss2 (deep_supervision.py:19-43): weighted sum of the
    configured loss over deep-supervision heads; zero-weight heads skipped."""
    loss_fn = make_loss(loss_name, batch_dice, **(loss_kwargs or {}))
    total = jnp.asarray(0.0, jnp.float32)
    for o, t, w in zip(outputs, targets, weights):
        if float(w) == 0.0:
            continue
        total = total + jnp.float32(w) * loss_fn(o, t)
    return total


def generalized_dice_loss(logits: jnp.ndarray, target: jnp.ndarray,
                          batch_dice: bool = False, do_bg: bool = True,
                          smooth: float = 1.0,
                          square_volumes: bool = False) -> jnp.ndarray:
    """GDL (dice_loss.py:25-97): per-class tp/fp/fn weighted by 1/volume,
    summed over classes before the Dice ratio."""
    probs = softmax_helper(logits.astype(jnp.float32))
    num_classes = probs.shape[-1]
    y = one_hot(target, num_classes)
    if not do_bg:
        probs = probs[..., 1:]
        y = y[..., 1:]
    axes = tuple(range(0 if batch_dice else 1, probs.ndim - 1))
    tp = jnp.sum(probs * y, axis=axes)
    fp = jnp.sum(probs * (1.0 - y), axis=axes)
    fn = jnp.sum((1.0 - probs) * y, axis=axes)
    volumes = jnp.sum(y, axis=axes) + 1e-6
    if square_volumes:
        volumes = volumes ** 2
    tp, fp, fn = tp / volumes, fp / volumes, fn / volumes
    axis = 0 if batch_dice else 1
    tp = jnp.sum(tp, axis=axis)
    fp = jnp.sum(fp, axis=axis)
    fn = jnp.sum(fn, axis=axis)
    dc = (2 * tp + smooth) / (2 * tp + fp + fn + smooth)
    return -jnp.mean(dc)


def soft_dice_loss_squared(logits: jnp.ndarray, target: jnp.ndarray,
                           batch_dice: bool = False, do_bg: bool = True,
                           smooth: float = 1.0) -> jnp.ndarray:
    """SoftDiceLossSquared (dice_loss.py:235-289): denominator uses
    probs^2 + onehot^2."""
    probs = softmax_helper(logits.astype(jnp.float32))
    num_classes = probs.shape[-1]
    y = one_hot(target, num_classes)
    axes = tuple(range(0 if batch_dice else 1, probs.ndim - 1))
    intersect = jnp.sum(probs * y, axis=axes) + smooth
    denominator = jnp.sum(probs ** 2 + y ** 2, axis=axes) + smooth
    dc = 2 * intersect / denominator
    if not do_bg:
        dc = dc[1:] if batch_dice else dc[:, 1:]
    return -jnp.mean(dc)


def dc_and_bce_loss(logits: jnp.ndarray, target_onehot: jnp.ndarray,
                    batch_dice: bool = False, smooth: float = 1.0) -> jnp.ndarray:
    """DC_and_BCE_loss (dice_loss.py:362-388): sigmoid multi-label loss for
    region-based training (BraTS regions). target_onehot: (..., C) 0/1."""
    logits = logits.astype(jnp.float32)
    t = target_onehot.astype(jnp.float32)
    bce = jnp.mean(jnp.maximum(logits, 0) - logits * t
                   + jnp.log1p(jnp.exp(-jnp.abs(logits))))
    probs = jax.nn.sigmoid(logits)
    axes = tuple(range(0 if batch_dice else 1, probs.ndim - 1))
    tp = jnp.sum(probs * t, axis=axes)
    fp = jnp.sum(probs * (1 - t), axis=axes)
    fn = jnp.sum((1 - probs) * t, axis=axes)
    dc = (2 * tp + smooth) / (2 * tp + fp + fn + smooth + 1e-8)
    return bce - jnp.mean(dc)


def gdl_and_ce_loss(logits, target, **gdl_kwargs):
    """GDL_and_CE_loss (dice_loss.py:391-405)."""
    return (generalized_dice_loss(logits, target, **gdl_kwargs)
            + robust_cross_entropy(logits, target))


def dc_and_topk_loss(logits, target, batch_dice: bool = True,
                     k_percent: float = 10.0, smooth: float = 1e-5):
    """DC_and_topk_loss (dice_loss.py:408-430)."""
    return (soft_dice_loss(logits, target, batch_dice=batch_dice,
                           do_bg=False, smooth=smooth)
            + topk_cross_entropy(logits, target, k_percent))


def focal_loss(logits: jnp.ndarray, target: jnp.ndarray,
               gamma: float = 2.0, alpha: float = 0.25,
               smooth: float = 1e-5) -> jnp.ndarray:
    """FocalLoss (focal_loss.py:23-108): per-voxel CE scaled by
    alpha * (1 - p_t)^gamma, with label smoothing of the one-hot target."""
    logits = logits.astype(jnp.float32)
    num_classes = logits.shape[-1]
    probs = softmax_helper(logits).reshape(-1, num_classes)
    t = target.reshape(-1).astype(jnp.int32)
    pt = jnp.take_along_axis(probs, t[:, None], axis=-1)[:, 0]
    if smooth:
        pt = jnp.clip(pt, smooth, 1.0 - smooth)
    logpt = jnp.log(pt)
    # scalar alpha balances class 0 vs rest (reference balance_index=0)
    alpha_t = jnp.where(t == 0, alpha, 1.0 - alpha)
    loss = -alpha_t * jnp.power(1.0 - pt, gamma) * logpt
    return jnp.mean(loss)


def mcc_loss(logits: jnp.ndarray, target: jnp.ndarray,
             batch_dice: bool = True, do_bg: bool = True,
             smooth: float = 0.0,
             loss_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Matthews-correlation-coefficient loss (reference
    dice_loss.py:195-240 MCCLoss; batch_mcc follows batch_dice like the
    nnUNetTrainerV2_Loss_MCC variant). Counts are normalized by the voxel
    count before the MCC formula."""
    probs = softmax_helper(logits.astype(jnp.float32))
    voxels = float(np.prod(logits.shape[1:-1]))
    tp, fp, fn = get_tp_fp_fn_tn(probs, target, batch_dice, loss_mask)
    if loss_mask is None:
        total = voxels * (logits.shape[0] if batch_dice else 1)
    else:
        axes = tuple(range(0 if batch_dice else 1, probs.ndim - 1))
        total = jnp.sum(loss_mask.astype(jnp.float32), axis=axes)[..., None]
    tn = total - tp - fp - fn
    tp, fp, fn, tn = (v / voxels for v in (tp, fp, fn, tn))
    nominator = tp * tn - fp * fn + smooth
    denominator = jnp.sqrt(
        (tp + fp) * (tp + fn) * (tn + fp) * (tn + fn)) + smooth
    mcc = nominator / (denominator + 1e-8)
    if not do_bg:
        mcc = mcc[1:] if batch_dice else mcc[:, 1:]
    return -jnp.mean(mcc)


def soft_dice_regions(logits: jnp.ndarray, target_onehot: jnp.ndarray,
                      batch_dice: bool = False,
                      smooth: float = 0.0) -> jnp.ndarray:
    """SoftDiceLoss(apply_nonlin=sigmoid, do_bg=True, smooth=0) — the
    nnUNetTrainerV2BraTSRegions_Dice loss (BraTS2020 trainer :192-198).
    target_onehot: (..., R) 0/1 region channels."""
    probs = jax.nn.sigmoid(logits.astype(jnp.float32))
    t = target_onehot.astype(jnp.float32)
    axes = tuple(range(0 if batch_dice else 1, probs.ndim - 1))
    tp = jnp.sum(probs * t, axis=axes)
    fp = jnp.sum(probs * (1 - t), axis=axes)
    fn = jnp.sum((1 - probs) * t, axis=axes)
    dc = (2 * tp + smooth) / (2 * tp + fp + fn + smooth + 1e-8)
    return -jnp.mean(dc)


def hard_tp_fp_fn_regions(logits: jnp.ndarray, target_onehot: jnp.ndarray):
    """Per-region hard counts for the online eval of region-based
    trainers (nnUNetTrainerV2BraTSRegions.run_online_evaluation :120-131:
    pred = sigmoid(out) > 0.5 per region channel)."""
    pred = jax.nn.sigmoid(logits.astype(jnp.float32)) > 0.5
    t = target_onehot > 0.5
    axes = tuple(range(0, pred.ndim - 1))
    tp = jnp.sum(pred & t, axis=axes).astype(jnp.float32)
    fp = jnp.sum(pred & ~t, axis=axes).astype(jnp.float32)
    fn = jnp.sum(~pred & t, axis=axes).astype(jnp.float32)
    return tp, fp, fn


LOSS_REGISTRY = {
    "dc_ce": dc_and_ce_loss,
    "mcc": mcc_loss,
    "dice": soft_dice_loss,
    "dice_squared": soft_dice_loss_squared,
    "gdl": generalized_dice_loss,
    "gdl_ce": gdl_and_ce_loss,
    "dc_topk": dc_and_topk_loss,
    "topk": topk_cross_entropy,
    "ce": robust_cross_entropy,
    "focal": focal_loss,
    "dc_bce": dc_and_bce_loss,
    "dice_regions": soft_dice_regions,
}


def hard_tp_fp_fn(logits: jnp.ndarray, target: jnp.ndarray):
    """Per-class hard counts for the online foreground-Dice estimate
    (nnUNetTrainer_simple.run_online_evaluation :373-405). Returns (C-1,)
    arrays for foreground classes, summed over batch + spatial."""
    num_classes = logits.shape[-1]
    seg = jnp.argmax(logits, axis=-1)
    tp, fp, fn = [], [], []
    for c in range(1, num_classes):
        pred_c = (seg == c)
        tgt_c = (target == c)
        tp.append(jnp.sum(pred_c & tgt_c))
        fp.append(jnp.sum(pred_c & ~tgt_c))
        fn.append(jnp.sum(~pred_c & tgt_c))
    return (jnp.stack(tp).astype(jnp.float32),
            jnp.stack(fp).astype(jnp.float32),
            jnp.stack(fn).astype(jnp.float32))


def downsample_seg_for_ds(seg: jnp.ndarray,
                          scales: Sequence[Sequence[float]]) -> List[jnp.ndarray]:
    """Nearest-neighbour target downsampling for deep supervision. All E2ENet
    scales are reciprocals of integer pool products, so this is exact strided
    slicing (anchor 0), matching order-0 resize on axis-aligned grids.
    Parity: DownsampleSegForDSTransform2 (data_augmentation/downsampling.py).
    """
    outs = []
    for s in scales:
        f = [int(round(1.0 / x)) for x in s]
        outs.append(seg[:, ::f[0], ::f[1], ::f[2]])
    return outs
