"""Dynamic Sparse Feature Fusion (DSFF) — kernel-granular dynamic sparse
training of the UNet++ fusion ("loc") convs and nest transposed convs ("up").

Parity: reference sparselearning/core_channel.py (the engine simple_main
uses):
  * masked params: names containing 'loc' (not 'context') or 'up', excluding
    biases/norms (add_module :320-336);
  * masks are 0/1 at whole-(out,in)-kernel granularity;
  * uniform init picks round(in*out*density) random kernel pairs per layer;
    layers whose torch dim-0 is 48 use density 0.2 regardless (init :141-169);
  * every step: weights AND optimizer momentum are re-masked
    (apply_mask :427-434), death rate follows cosine decay (:32-41);
  * every `update_frequency` steps: kernel_death prunes the death_rate
    fraction of alive kernels with smallest L1 (:647-666), then
    kernel_growth revives the same number of random dead kernels (:721-739)
    or kernel_grad_growth the highest-|grad| dead kernels (:771-790);
  * fired-mask (ITOP) bookkeeping tracks every kernel ever activated
    (:861-876).

TPU-native design: masks live in the train-state pytree as (in, out) float
arrays broadcast over the spatial kernel dims (sparsity as dense masked
weights — elementwise multiply, exactly the reference semantics and
MXU-friendly). The death/growth update is a single jitted function of
(params, grads, masks, rng, death_rate) — dynamic prune counts are realized
via sort + traced-index thresholding so all shapes stay static.
"""
from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

MASKED_TOKENS = ("loc", "up")
EXCLUDED_TOKENS = ("context",)


def is_masked_path(path: Tuple[str, ...], leaf_name: str) -> bool:
    """Reference name targeting: ('loc' in name and 'context' not in name)
    or 'up' in name; biases and norm params removed (core_channel.py:320-336).
    """
    if leaf_name != "kernel":
        return False
    joined = "/".join(path)
    if any(t in joined for t in EXCLUDED_TOKENS):
        return False
    return any(t in joined for t in MASKED_TOKENS)


def _torch_dim0(shape) -> int:
    """Size of the reference weight's dim 0 (used by the density-0.2 rule):
    conv (out,in,kd,kh,kw) -> out = our shape[-1];
    transpconv (in,out,kd,kh,kw) -> in = our shape[-2]."""
    if len(shape) == 4:      # conv (kh,kw,in,out)
        return shape[-1]
    return shape[-2]         # transpconv (kd,kh,kw,in,out)


def _kernel_numel(shape) -> int:
    """prod of the spatial kernel dims (reference k_size = prod(shape[-3:]);
    conv kernels here are (kh,kw,...) with implicit kd=1)."""
    if len(shape) == 4:
        return int(shape[0] * shape[1])
    return int(shape[0] * shape[1] * shape[2])


def select_masked(params: dict) -> Dict[Tuple[str, ...], Any]:
    """Returns {path-tuple: leaf} for every maskable kernel."""
    out = {}
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    for path, leaf in flat:
        keys = tuple(
            k.key if hasattr(k, "key") else str(k) for k in path)
        if is_masked_path(keys[:-1], keys[-1]):
            out[keys] = leaf
    return out


def init_masks(params: dict, density: float, rng: jax.Array,
               mode: str = "uniform",
               density_48_override: float = 0.2) -> Dict[Tuple[str, ...], jnp.ndarray]:
    """Uniform kernel-pair init. Returns {path: (in, out) float mask}."""
    masked = select_masked(params)
    masks = {}
    for path, w in sorted(masked.items()):
        cin, cout = int(w.shape[-2]), int(w.shape[-1])
        if mode == "dense":
            masks[path] = jnp.ones((cin, cout), jnp.float32)
            continue
        d = density
        if _torch_dim0(w.shape) == 48:
            d = density_48_override
        kernel_num = int(round(cin * cout * d))
        kernel_num = max(1, min(kernel_num, cin * cout))
        rng, sub = jax.random.split(rng)
        perm = jax.random.permutation(sub, cin * cout)
        flat = jnp.zeros((cin * cout,), jnp.float32).at[perm[:kernel_num]].set(1.0)
        masks[path] = flat.reshape(cin, cout)
    return masks


def apply_masks(params: dict, masks: Dict[Tuple[str, ...], jnp.ndarray]) -> dict:
    """w * mask on every masked kernel (apply_mask, core_channel.py:427-434).
    Kernel-granular masks (in, out) broadcast over the spatial dims;
    element-granular masks (core.py engine) are full weight shaped."""
    if not masks:
        return params

    flat = jax.tree_util.tree_flatten_with_path(params)
    leaves, treedef = flat[0], flat[1]
    new_leaves = []
    for path, leaf in leaves:
        keys = tuple(k.key if hasattr(k, "key") else str(k) for k in path)
        if keys in masks:
            m = masks[keys].astype(leaf.dtype)
            if m.shape != leaf.shape:
                m = m.reshape((1,) * (leaf.ndim - 2) + m.shape)
            leaf = leaf * m
        new_leaves.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def init_masks_element(params: dict, density: float, rng: jax.Array,
                       mode: str = "uniform_ori",
                       grads: Optional[dict] = None,
                       erk_power_scale: float = 1.0):
    """Element-granular mask init — the original ITOP engine
    (sparselearning/core.py):
      uniform_ori: iid Bernoulli(density) over every weight (core.py
                   'uniform' :...);
      ERK: per-layer density proportional to (sum(dims)/numel)^scale,
           normalized so the global density matches (core.py ERK init);
      snip: keep the globally top-density |g * w| saliencies (snip.py:19).
    Returns {path: full-shape float mask}."""
    masked = select_masked(params)
    masks = {}
    if mode == "uniform_ori":
        for path, w in sorted(masked.items()):
            rng, sub = jax.random.split(rng)
            masks[path] = (jax.random.uniform(sub, w.shape)
                           < density).astype(jnp.float32)
        return masks
    if mode == "ERK":
        # raw ERK score per layer: (sum of dims) / numel
        raw = {}
        total = 0
        for path, w in masked.items():
            raw[path] = (float(np.sum(w.shape)) / float(np.prod(w.shape))) \
                ** erk_power_scale
            total += np.prod(w.shape)
        # scale epsilon so sum(density_l * numel_l) == density * total
        denom = sum(raw[p] * np.prod(masked[p].shape) for p in masked)
        eps = density * total / denom
        for path, w in sorted(masked.items()):
            d = float(np.clip(eps * raw[path], 0.0, 1.0))
            rng, sub = jax.random.split(rng)
            masks[path] = (jax.random.uniform(sub, w.shape)
                           < d).astype(jnp.float32)
        return masks
    if mode == "snip":
        assert grads is not None, "snip init requires gradients"
        gm = select_masked(grads)
        scores = {p: jnp.abs(masked[p].astype(jnp.float32)
                             * gm[p].astype(jnp.float32)) for p in masked}
        flat = jnp.concatenate([s.reshape(-1) for _, s in sorted(
            scores.items())])
        keep = max(1, int(flat.size * density))
        thr = jnp.sort(flat)[::-1][keep - 1]
        for path in sorted(masked.keys()):
            masks[path] = (scores[path] >= thr).astype(jnp.float32)
        return masks
    raise KeyError(f"unknown element init mode '{mode}'")


def init_masks_grasp(loss_fn, params: dict, density: float,
                     data, targets):
    """GraSP saliency init (snip.py GraSP :115-215): score = -theta * (H g)
    with Hg = d/dtheta (g_w . g(theta)); normalize by |sum|; REMOVE the
    (1 - density) largest scores (keep the lowest).
    loss_fn(params, data, targets) -> scalar."""
    g1 = jax.grad(loss_fn)(params, data, targets)
    g1_masked = select_masked(g1)

    def inner(p):
        g = jax.grad(loss_fn)(p, data, targets)
        gm = select_masked(g)
        return sum(jnp.sum(g1_masked[k].astype(jnp.float32)
                           * gm[k].astype(jnp.float32)) for k in g1_masked)

    Hg = jax.grad(inner)(params)
    w_masked = select_masked(params)
    hg_masked = select_masked(Hg)
    scores = {k: -(w_masked[k].astype(jnp.float32)
                   * hg_masked[k].astype(jnp.float32)) for k in w_masked}
    flat = jnp.concatenate([s.reshape(-1) for _, s in sorted(scores.items())])
    norm = jnp.abs(jnp.sum(flat)) + 1e-10
    flat = flat / norm
    num_rm = int(flat.size * (1.0 - density))
    thr = jnp.sort(flat)[::-1][max(num_rm - 1, 0)]
    masks = {}
    for k in sorted(scores.keys()):
        masks[k] = ((scores[k] / norm) <= thr).astype(jnp.float32) \
            if num_rm > 0 else jnp.ones_like(scores[k])
    return masks


def _layer_death_growth_element(w, grad, mask, rng, death_rate,
                                growth_mode: str):
    """Element-granular death/growth (core.py magnitude_death :...,
    random_growth / gradient_growth)."""
    n = mask.size
    absw = jnp.abs(w.astype(jnp.float32)) * mask
    nonzeros = jnp.sum(mask)
    zeros = n - nonzeros
    num_remove = jnp.ceil(death_rate * nonzeros).astype(jnp.int32)
    sorted_w = jnp.sort(absw.reshape(-1))
    kill_idx = jnp.clip(zeros.astype(jnp.int32) + num_remove - 1, 0, n - 1)
    thr = sorted_w[kill_idx]
    survived = (absw > thr).astype(jnp.float32) * mask
    num_death = (jnp.sum(mask) - jnp.sum(survived)).astype(jnp.int32)

    dead = 1.0 - survived
    if growth_mode == "gradient":
        score = jnp.abs(grad.astype(jnp.float32)) * dead
    else:
        score = jax.random.uniform(rng, mask.shape) * dead
    score = jnp.where(dead > 0, score, -jnp.inf)
    sorted_desc = jnp.sort(score.reshape(-1))[::-1]
    gthr = sorted_desc[jnp.clip(num_death - 1, 0, n - 1)]
    grow = jnp.where(num_death > 0,
                     ((score >= gthr) & (dead > 0)).astype(jnp.float32),
                     jnp.zeros_like(dead))
    return jnp.clip(survived + grow, 0.0, 1.0), num_death


def cosine_death_rate(step: jnp.ndarray, death_rate: float, t_max: int,
                      eta_min: float = 0.001) -> jnp.ndarray:
    """CosineAnnealingLR of the death rate (core_channel.py:32-41)."""
    frac = jnp.clip(step.astype(jnp.float32) / max(t_max, 1), 0.0, 1.0)
    return eta_min + (death_rate - eta_min) * 0.5 * (1.0 + jnp.cos(
        jnp.pi * frac))


def kernel_death_survive(w, mask, death_rate):
    """The death half of one layer's update — kill the (num_zero_kernels +
    prune_num) smallest-L1 kernels; already-dead ones have L1 == 0.
    Parity: kernel_death (core_channel.py:647-666); selection is
    deterministic given (w, mask, death_rate) and is pinned against the
    reference torch implementation in tests/test_training_parity.py.
    Returns (survived (in,out) 0/1 float, num_death killed among alive)."""
    cin, cout = mask.shape
    k_size = _kernel_numel(w.shape)
    n_pairs = cin * cout

    spatial_axes = tuple(range(w.ndim - 2))
    l1 = jnp.sum(jnp.abs(w.astype(jnp.float32)), axis=spatial_axes)  # (in,out)
    l1 = l1 * mask  # only alive kernels carry weight mass

    nonzeros_el = jnp.sum(mask) * k_size
    zeros_el = n_pairs * k_size - nonzeros_el

    prune_num = jnp.ceil(death_rate * nonzeros_el / k_size).astype(jnp.int32)
    num_zero_k = jnp.ceil(zeros_el / k_size).astype(jnp.int32)
    sorted_l1 = jnp.sort(l1.reshape(-1))
    kill_idx = jnp.clip(num_zero_k + prune_num - 1, 0, n_pairs - 1)
    thr = sorted_l1[kill_idx]
    survived = (l1 > thr).astype(jnp.float32) * mask
    # exact count killed among alive (ties can over-kill, as in reference)
    num_death = (jnp.sum(mask) - jnp.sum(survived)).astype(jnp.int32)
    return survived, num_death


def _layer_death_growth(w, grad, mask, rng, death_rate, growth_mode: str):
    """One layer's prune + regrow. All-static shapes; dynamic counts through
    sorted-threshold indexing."""
    cin, cout = mask.shape
    n_pairs = cin * cout
    survived, num_death = kernel_death_survive(w, mask, death_rate)

    # --- growth: revive num_death dead kernels
    dead = 1.0 - survived
    if growth_mode == "gradient":
        g = jnp.sum(jnp.abs(grad.astype(jnp.float32)),
                    axis=tuple(range(w.ndim - 2)))
        score = g * dead
        sorted_desc = jnp.sort(score.reshape(-1))[::-1]
        gthr_idx = jnp.clip(num_death - 1, 0, n_pairs - 1)
        gthr = sorted_desc[gthr_idx]
        grow = jnp.where(num_death > 0,
                         ((score >= gthr) & (dead > 0)).astype(jnp.float32),
                         jnp.zeros_like(dead))
    else:  # random (kernel_growth :721-739)
        r = jax.random.uniform(rng, (cin, cout))
        score = jnp.where(dead > 0, r, -jnp.inf)
        sorted_desc = jnp.sort(score.reshape(-1))[::-1]
        gthr_idx = jnp.clip(num_death - 1, 0, n_pairs - 1)
        gthr = sorted_desc[gthr_idx]
        grow = jnp.where(num_death > 0,
                         (score >= gthr).astype(jnp.float32),
                         jnp.zeros_like(dead))
    new_mask = jnp.clip(survived + grow, 0.0, 1.0)
    return new_mask, num_death


def death_growth_update(params: dict, grads: Optional[dict],
                        masks: Dict[Tuple[str, ...], jnp.ndarray],
                        rng: jax.Array, death_rate: jnp.ndarray,
                        growth_mode: str = "random"):
    """truncate_weights (core_channel.py:555-600 path): per masked layer,
    kernel (or element) death then growth. The granularity is inferred per
    layer from the mask shape. Returns (new_masks, stats)."""
    masked = select_masked(params)
    gmasked = select_masked(grads) if grads is not None else {
        k: jnp.zeros_like(v) for k, v in masked.items()}
    new_masks = {}
    deaths = []
    for path in sorted(masks.keys()):
        rng, sub = jax.random.split(rng)
        fn = (_layer_death_growth
              if masks[path].shape != masked[path].shape
              else _layer_death_growth_element)
        nm, nd = fn(masked[path], gmasked[path], masks[path], sub,
                    death_rate, growth_mode)
        new_masks[path] = nm
        deaths.append(nd)
    total_death = jnp.sum(jnp.stack(deaths)) if deaths else jnp.int32(0)
    return new_masks, {"total_death": total_death}


def masks_density(masks: Dict[Tuple[str, ...], jnp.ndarray],
                  params: dict) -> jnp.ndarray:
    """Current element density over the masked params (cal_nonzero_counts)."""
    masked = select_masked(params)
    nz = 0.0
    tot = 0.0
    for path, m in masks.items():
        k_size = (1 if m.shape == masked[path].shape
                  else _kernel_numel(masked[path].shape))
        nz = nz + jnp.sum(m) * k_size
        tot = tot + m.size * k_size
    return nz / tot


def update_fired(fired: Dict[Tuple[str, ...], jnp.ndarray],
                 masks: Dict[Tuple[str, ...], jnp.ndarray]):
    """ITOP fired-mask tracking (core_channel.py:861-876)."""
    return {k: jnp.maximum(fired[k], masks[k]) for k in masks}


@dataclass
class DSFFConfig:
    """CLI-visible knobs (add_sparse_args, core_channel.py:17-31)."""
    sparse: bool = True
    sparse_init: str = "uniform"
    growth: str = "random"
    death: str = "magnitude"
    death_rate: float = 0.5
    density: float = 0.3
    final_density: float = 0.05
    update_frequency: int = 1200
    fix: bool = False
    decay_schedule: str = "cosine"
