"""Train state + jitted train/eval steps.

The whole inner loop of the reference trainer
(nnUNetTrainer_simple.run_iteration :528-581: forward -> DC+CE deep
supervision -> backward -> grad-clip 12 -> SGD(momentum .99, nesterov,
wd 3e-5) -> mask.step()) is one jitted function of (state, batch, lr).

Optimizer semantics are torch.optim.SGD exactly (weight decay added to the
gradient, momentum buffer b = m*b + g, nesterov update g + m*b), implemented
directly so DSFF momentum masking (apply_mask zeroing momentum_buffer,
core_channel.py:427-434) is a plain tree op on the state.

Precision: params float32, network compute bfloat16 (reference trains fp16
autocast + GradScaler; bf16 needs no loss scaling on TPU), loss/grad-norm
math float32.
"""
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
from flax import struct

from ..ops.losses import (deep_supervision_loss, hard_tp_fp_fn,
                          hard_tp_fp_fn_regions)
from . import dsff

GRAD_CLIP_NORM = 12.0
MOMENTUM = 0.99
WEIGHT_DECAY = 3e-5


@struct.dataclass
class TrainState:
    params: Any
    momentum: Any             # SGD momentum tree, or RangerState/AdamState
    masks: Any                # dict path-tuple -> (in,out) mask, or None
    rng: jax.Array
    step: jnp.ndarray         # int32 global step


def create_train_state(params, masks=None, seed: int = 0,
                       optimizer: str = "sgd") -> TrainState:
    if masks is not None:
        params = dsff.apply_masks(params, masks)
    if optimizer == "sgd":
        momentum = jax.tree_util.tree_map(jnp.zeros_like, params)
    elif optimizer == "ranger":
        from .ranger import ranger_init
        momentum = ranger_init(params)
    elif optimizer == "adam":
        momentum = adam_init(params)
    else:
        raise ValueError(f"unknown optimizer '{optimizer}'")
    return TrainState(params=params, momentum=momentum, masks=masks,
                      rng=jax.random.PRNGKey(seed),
                      step=jnp.asarray(0, jnp.int32))


def global_norm(tree) -> jnp.ndarray:
    leaves = jax.tree_util.tree_leaves(tree)
    return jnp.sqrt(sum(jnp.sum(jnp.square(x.astype(jnp.float32)))
                        for x in leaves))


def clip_by_global_norm(tree, max_norm: float):
    norm = global_norm(tree)
    scale = jnp.minimum(1.0, max_norm / (norm + 1e-6))
    return jax.tree_util.tree_map(lambda g: g * scale, tree), norm


def sgd_nesterov_update(params, momentum, grads, lr,
                        weight_decay: float = WEIGHT_DECAY,
                        mom: float = MOMENTUM):
    """torch.optim.SGD(momentum, nesterov=True, weight_decay) semantics."""
    tm = jax.tree_util.tree_map
    g_wd = tm(lambda g, p: g.astype(jnp.float32) + weight_decay * p,
              grads, params)
    new_momentum = tm(lambda b, g: mom * b + g, momentum, g_wd)
    new_params = tm(lambda p, g, b: p - lr * (g + mom * b),
                    params, g_wd, new_momentum)
    return new_params, new_momentum


class AdamState(NamedTuple):
    step: jnp.ndarray
    exp_avg: Any
    exp_avg_sq: Any
    max_exp_avg_sq: Any


def adam_init(params) -> AdamState:
    z = lambda: jax.tree_util.tree_map(jnp.zeros_like, params)
    return AdamState(step=jnp.zeros((), jnp.int32), exp_avg=z(),
                     exp_avg_sq=z(), max_exp_avg_sq=z())


def adam_update(params, state: AdamState, grads, lr, betas=(0.9, 0.999),
                eps: float = 1e-8, weight_decay: float = 0.0):
    """torch.optim.Adam(amsgrad=True) semantics (L2 weight decay added to
    the gradient) — nnUNetTrainerV2_Adam.py:23."""
    b1, b2 = betas
    step = state.step + 1
    tf = step.astype(jnp.float32)
    tm = jax.tree_util.tree_map
    g_wd = tm(lambda g, p: g.astype(jnp.float32) + weight_decay * p,
              grads, params)
    exp_avg = tm(lambda m, g: b1 * m + (1 - b1) * g, state.exp_avg, g_wd)
    exp_avg_sq = tm(lambda v, g: b2 * v + (1 - b2) * g * g,
                    state.exp_avg_sq, g_wd)
    max_sq = tm(jnp.maximum, state.max_exp_avg_sq, exp_avg_sq)
    bc1 = 1 - b1 ** tf
    bc2 = 1 - b2 ** tf
    new_params = tm(
        lambda p, m, v: p - (lr / bc1) * m / (jnp.sqrt(v / bc2) + eps),
        params, exp_avg, max_sq)
    return new_params, AdamState(step=step, exp_avg=exp_avg,
                                 exp_avg_sq=exp_avg_sq, max_exp_avg_sq=max_sq)


def mask_opt_state(opt_state, masks):
    """Apply DSFF masks to optimizer state (the analogue of the reference's
    momentum-buffer zeroing, core_channel.py:427-434) for any optimizer."""
    if masks is None:
        return opt_state
    if isinstance(opt_state, tuple) and hasattr(opt_state, "_fields"):
        masked = {f: (dsff.apply_masks(v, masks)
                      if isinstance(v, dict) else v)
                  for f, v in zip(opt_state._fields, opt_state)}
        return type(opt_state)(**masked)
    return dsff.apply_masks(opt_state, masks)


def make_train_step(model, ds_weights, batch_dice: bool = True,
                    donate: bool = True, jit_compile: bool = True,
                    loss_name: str = "dc_ce", momentum: float = MOMENTUM,
                    weight_decay: float = WEIGHT_DECAY,
                    optimizer: str = "sgd", loss_kwargs=None,
                    dynamic_loss_weights: bool = False,
                    dynamic_momentum: bool = False,
                    do_ds: bool = True):
    """Returns jitted train_step(state, data, targets, lr) ->
    (state, metrics). data: (B, D, H, W, C) f32; targets: tuple of int32
    arrays per DS level. optimizer: 'sgd' (nesterov, reference default) |
    'ranger' (nnUNetTrainerV2_Ranger_*) | 'adam' (nnUNetTrainerV2_Adam*);
    state.momentum must have been created by create_train_state with the
    same optimizer.
    loss_kwargs: static extra kwargs for the configured loss (variant
    presets, e.g. smooth=0).
    dynamic_loss_weights: the step takes two extra TRACED args
    (weight_ce, weight_dice) — per-epoch CE->Dice transition
    (nnUNetTrainerV2_graduallyTransitionFromCEToDice) without recompiles.
    dynamic_momentum: one extra traced arg `mom` (the per-epoch momentum
    reduction of nnUNetTrainerV2_reduceMomentumDuringTraining)."""
    weights = [float(w) for w in ds_weights]
    if optimizer not in ("sgd", "ranger", "adam"):
        raise ValueError(f"unknown optimizer '{optimizer}'")
    if dynamic_momentum and optimizer != "sgd":
        raise ValueError("dynamic momentum is an SGD-only variant")

    def loss_fn(params, data, targets, extra_kw):
        # params are kept masked invariantly (create_train_state + the
        # post-update re-mask below), so gradients here are the FULL
        # gradients incl. dead kernels — matching the reference, where
        # apply_mask zeroes weight.data and grads flow at w=0 (needed by
        # kernel_grad_growth).
        outs = model.apply({"params": params}, data, do_ds=do_ds)
        if not isinstance(outs, (list, tuple)):
            outs = [outs]     # ds_mode='none' (noDeepSupervision variant)
        loss = deep_supervision_loss(outs, targets, weights,
                                     batch_dice=batch_dice,
                                     loss_name=loss_name,
                                     loss_kwargs={**(loss_kwargs or {}),
                                                  **extra_kw})
        return loss

    def train_step(state: TrainState, data, targets, lr, *extras):
        extras = list(extras)
        extra_kw = {}
        if dynamic_loss_weights:
            extra_kw["weight_ce"] = extras.pop(0)
            extra_kw["weight_dice"] = extras.pop(0)
        mom = extras.pop(0) if dynamic_momentum else momentum
        loss, grads = jax.value_and_grad(loss_fn)(
            state.params, data, targets, extra_kw)
        grads, gnorm = clip_by_global_norm(grads, GRAD_CLIP_NORM)
        if optimizer == "sgd":
            new_params, new_momentum = sgd_nesterov_update(
                state.params, state.momentum, grads, lr,
                weight_decay=weight_decay, mom=mom)
        elif optimizer == "ranger":
            from .ranger import ranger_update
            new_params, new_momentum = ranger_update(
                state.params, state.momentum, grads, lr,
                weight_decay=weight_decay)
        else:  # adam
            new_params, new_momentum = adam_update(
                state.params, state.momentum, grads, lr,
                weight_decay=weight_decay)
        if state.masks is not None:
            new_params = dsff.apply_masks(new_params, state.masks)
            new_momentum = mask_opt_state(new_momentum, state.masks)
        new_state = state.replace(params=new_params, momentum=new_momentum,
                                  step=state.step + 1)
        return new_state, {"loss": loss, "grad_norm": gnorm}

    if not jit_compile:
        return train_step
    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def make_eval_step(model, ds_weights, batch_dice: bool = True,
                   loss_name: str = "dc_ce", loss_kwargs=None,
                   dynamic_loss_weights: bool = False,
                   do_ds: bool = True, regions: bool = False):
    """Jitted validation iteration: loss + hard tp/fp/fn of the full-res
    head (run_online_evaluation parity). regions=True switches the online
    counts to per-region sigmoid thresholding
    (nnUNetTrainerV2BraTSRegions.run_online_evaluation)."""
    weights = [float(w) for w in ds_weights]

    def eval_step(params, data, targets, *extras):
        extra_kw = ({"weight_ce": extras[0], "weight_dice": extras[1]}
                    if dynamic_loss_weights else {})
        outs = model.apply({"params": params}, data, do_ds=do_ds)
        if not isinstance(outs, (list, tuple)):
            outs = [outs]
        loss = deep_supervision_loss(outs, targets, weights,
                                     batch_dice=batch_dice,
                                     loss_name=loss_name,
                                     loss_kwargs={**(loss_kwargs or {}),
                                                  **extra_kw})
        if regions:
            tp, fp, fn = hard_tp_fp_fn_regions(outs[0], targets[0])
        else:
            tp, fp, fn = hard_tp_fp_fn(outs[0], targets[0])
        return {"loss": loss, "tp": tp, "fp": fp, "fn": fn}

    return jax.jit(eval_step)


def make_mask_update_step(growth_mode: str = "random",
                          prune_mode: str = "local",
                          granularity: str = None):
    """Jitted DSFF truncate_weights: (state, death_rate, grads?,
    regrow_ratio?) -> state with new masks applied to params + momentum.
    prune_mode 'local' = per-layer truncate_weights; 'global' = cross-layer
    truncate_weights_global driven by the gradual-density schedule's
    regrow_ratio (pass it as a jnp scalar to avoid recompiles)."""
    assert prune_mode in ("local", "global"), prune_mode

    def update(state: TrainState, death_rate, grads=None,
               regrow_ratio=1.0):
        rng, sub = jax.random.split(state.rng)
        if prune_mode == "global":
            new_masks, _stats = dsff.truncate_weights_global(
                state.params, grads, state.masks, sub, death_rate,
                regrow_ratio)
        else:
            new_masks, _stats = dsff.death_growth_update(
                state.params, grads, state.masks, sub, death_rate,
                growth_mode=growth_mode, granularity=granularity)
        params = dsff.apply_masks(state.params, new_masks)
        momentum = mask_opt_state(state.momentum, new_masks)
        return state.replace(params=params, momentum=momentum,
                             masks=new_masks, rng=rng)

    return jax.jit(update)


def make_grad_step(model, ds_weights, batch_dice: bool = True,
                   loss_name: str = "dc_ce"):
    """Jitted plain gradient of the DS loss — the analogue of the
    reference's weight.grad that kernel_grad_growth / the global grow
    phase read (get_gradient_for_weights). Used by the trainer to feed
    DSFF updates that need gradients (growth='gradient' or
    prune_mode='global')."""
    weights = [float(w) for w in ds_weights]

    def grad_step(params, data, targets):
        def loss_fn(p):
            outs = model.apply({"params": p}, data, do_ds=True)
            return deep_supervision_loss(outs, targets, weights,
                                         batch_dice=batch_dice,
                                         loss_name=loss_name)
        return jax.grad(loss_fn)(params)

    return jax.jit(grad_step)
