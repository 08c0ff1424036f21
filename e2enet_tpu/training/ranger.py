"""Ranger optimizer (RAdam + Lookahead) for the variant trainers.

Parity: reference e2enet/training/optimizer/ranger.py:11-120 (defaults
lr, alpha=0.5, k=6, N_sma_threshhold=5, betas=(0.95, 0.999), eps=1e-5,
weight_decay=0) used by nnUNetTrainerV2_Ranger* variants.
"""
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp


class RangerState(NamedTuple):
    step: jnp.ndarray
    exp_avg: Any
    exp_avg_sq: Any
    slow: Any


def ranger_init(params) -> RangerState:
    z = lambda: jax.tree_util.tree_map(jnp.zeros_like, params)
    # jnp.copy, not asarray: slow must be a distinct buffer from params or
    # jit donation of the train state donates the same buffer twice
    return RangerState(step=jnp.zeros((), jnp.int32), exp_avg=z(),
                       exp_avg_sq=z(),
                       slow=jax.tree_util.tree_map(jnp.copy, params))


def ranger_update(params, state: RangerState, grads, lr,
                  betas=(0.95, 0.999), eps: float = 1e-5,
                  weight_decay: float = 0.0, alpha: float = 0.5,
                  k: int = 6, n_sma_threshhold: int = 5):
    b1, b2 = betas
    step = state.step + 1
    tf = step.astype(jnp.float32)
    tm = jax.tree_util.tree_map

    exp_avg = tm(lambda m, g: b1 * m + (1 - b1) * g, state.exp_avg, grads)
    exp_avg_sq = tm(lambda v, g: b2 * v + (1 - b2) * g * g,
                    state.exp_avg_sq, grads)

    beta2_t = b2 ** tf
    n_sma_max = 2.0 / (1 - b2) - 1
    n_sma = n_sma_max - 2 * tf * beta2_t / (1 - beta2_t)
    use_var = n_sma > n_sma_threshhold
    r = jnp.sqrt(jnp.maximum(
        (n_sma - 4) / jnp.maximum(n_sma_max - 4, 1e-8)
        * (n_sma - 2) / jnp.maximum(n_sma, 1e-8)
        * n_sma_max / (n_sma_max - 2), 0.0))
    step_size = jnp.where(use_var,
                          r / (1 - b1 ** tf),
                          1.0 / (1 - b1 ** tf))

    def upd(p, m, v):
        p32 = p.astype(jnp.float32)
        if weight_decay != 0:
            p32 = p32 - lr * weight_decay * p32
        denom = jnp.sqrt(v / (1 - beta2_t)) + eps
        delta = jnp.where(use_var, m / denom, m)
        return (p32 - lr * step_size * delta).astype(p.dtype)

    new_params = tm(upd, params, exp_avg, exp_avg_sq)

    # lookahead: every k steps interpolate toward the slow weights
    do_la = (step % k) == 0
    slow = tm(lambda s, p: jnp.where(do_la, s + alpha * (p - s), s),
              state.slow, new_params)
    new_params = tm(lambda p, s: jnp.where(do_la, s, p), new_params, slow)

    return new_params, RangerState(step=step, exp_avg=exp_avg,
                                   exp_avg_sq=exp_avg_sq, slow=slow)
