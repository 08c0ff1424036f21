"""Transfer pretrained weights between runs.

Parity: reference run/load_pretrained_weights.py (:16-60): load a checkpoint
and copy only the shape-matching encoder ('conv_blocks'/'context') params
into a freshly initialized network — used to warm-start cascades or
fine-tuning on new tasks.
"""

import jax

from .checkpoint import load_checkpoint


def transfer_matching_params(target_params, source_params,
                             prefix_filter: str = "context",
                             verbose: bool = True):
    """Copy leaves whose path starts with `prefix_filter` and whose shape
    matches. Returns (new_params, n_transferred)."""
    src_flat = {tuple(k.key if hasattr(k, "key") else str(k) for k in p): v
                for p, v in
                jax.tree_util.tree_flatten_with_path(source_params)[0]}
    leaves, treedef = jax.tree_util.tree_flatten_with_path(target_params)
    new_leaves = []
    n = 0
    for path, leaf in leaves:
        keys = tuple(k.key if hasattr(k, "key") else str(k) for k in path)
        if (keys and keys[0].startswith(prefix_filter) and keys in src_flat
                and src_flat[keys].shape == leaf.shape):
            new_leaves.append(src_flat[keys].astype(leaf.dtype))
            n += 1
            if verbose:
                print("transferred", "/".join(keys))
        else:
            new_leaves.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, new_leaves), n


def load_pretrained_weights(target_params, checkpoint_path: str,
                            prefix_filter: str = "context",
                            verbose: bool = True):
    state, _epoch, _meta = load_checkpoint(checkpoint_path)
    new_params, n = transfer_matching_params(target_params, state.params,
                                             prefix_filter, verbose)
    print(f"loaded {n} pretrained tensors from {checkpoint_path}")
    return new_params
