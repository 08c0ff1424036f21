"""Checkpoint save/load.

Parity: reference checkpoint format (nnUNetTrainer_simple.py:1140-1176):
torch dict {epoch, state_dict, optimizer state, loss/metric history, best-MA
tuple} named '{Tconv}_model_{latest,best,final_checkpoint}.model' plus a
pickle sidecar {init, name, class, plans} consumed by model restore
(model_restore.py:44-99). Here the state is the JAX train-state pytree
(params, momentum, masks, step) stored as a compressed npz + a json-free
pickle for metadata, same file naming so CLI workflows match.
"""
import os
import pickle
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np

from ..utils.files import save_pickle
from .train_state import TrainState


def _mask_key_to_str(k: Tuple[str, ...]) -> str:
    return "|".join(k)


def _mask_key_from_str(s: str) -> Tuple[str, ...]:
    return tuple(s.split("|"))


def state_to_numpy(state: TrainState) -> Dict[str, Any]:
    to_np = lambda t: jax.tree_util.tree_map(np.asarray, t)
    masks = None
    if state.masks is not None:
        masks = {_mask_key_to_str(k): np.asarray(v)
                 for k, v in state.masks.items()}
    return {
        "params": to_np(state.params),
        "momentum": to_np(state.momentum),
        "masks": masks,
        "rng": np.asarray(state.rng),
        "step": int(state.step),
    }


def numpy_to_state(d: Dict[str, Any]) -> TrainState:
    import jax.numpy as jnp
    masks = None
    if d.get("masks") is not None:
        masks = {_mask_key_from_str(k): jnp.asarray(v)
                 for k, v in d["masks"].items()}
    return TrainState(
        params=jax.tree_util.tree_map(jnp.asarray, d["params"]),
        momentum=jax.tree_util.tree_map(jnp.asarray, d["momentum"]),
        masks=masks,
        rng=jnp.asarray(d["rng"]),
        step=jnp.asarray(d.get("step", 0), jnp.int32),
    )


def save_checkpoint(path: str, state: TrainState, epoch: int,
                    metadata: Optional[dict] = None,
                    sidecar: Optional[dict] = None):
    payload = {
        "epoch": epoch,
        "state": state_to_numpy(state),
        "metadata": metadata or {},
    }
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(payload, f, protocol=4)
    os.replace(tmp, path)
    if sidecar is not None:
        save_pickle(sidecar, path + ".pkl")


def load_checkpoint(path: str):
    with open(path, "rb") as f:
        payload = pickle.load(f)
    return (numpy_to_state(payload["state"]), payload["epoch"],
            payload.get("metadata", {}))
