"""Load reference-trained PyTorch checkpoints for inference with this
framework.

Parity: reference checkpoint files '{Tconv}_model_*.model' are
torch.save dicts with a cpu state_dict (nnUNetTrainer_simple.py:1157-1167)
plus a '.model.pkl' sidecar {init, name, class, plans}
(model_restore.py:44-99). This module reads both (torch CPU is available in
this image), converts the state_dict with models/torch_import.py, and writes
a checkpoint in OUR format so reference-trained models can be served by the
TPU predictor — the fidelity bridge SURVEY.md §7 calls for.
"""
import os
from typing import Optional


from ..plans import Plans
from ..utils.files import isfile, load_pickle
from .torch_import import convert_unetpp_state_dict


def load_reference_checkpoint(model_file: str,
                              sidecar_file: Optional[str] = None):
    """Returns (flax_params_dict, plans: Plans, info dict)."""
    import torch
    sidecar_file = sidecar_file or model_file + ".pkl"
    assert isfile(model_file), model_file
    ckpt = torch.load(model_file, map_location="cpu", weights_only=False)
    sd = ckpt["state_dict"]
    sd = {k[7:] if k.startswith("module.") else k: v.cpu().numpy()
          for k, v in sd.items()}

    assert isfile(sidecar_file), (
        f"sidecar {sidecar_file} missing — cannot recover plans/init args")
    sidecar = load_pickle(sidecar_file)
    plans = Plans.from_reference_pickle(sidecar["plans"])

    stage = max(plans.plans_per_stage.keys())
    num_pool = len(plans.plans_per_stage[stage].pool_op_kernel_sizes)
    params = convert_unetpp_state_dict(sd, num_pool=num_pool,
                                       num_conv_per_stage=plans.conv_per_stage)
    info = {
        "epoch": ckpt.get("epoch"),
        "num_pool": num_pool,
        "stage": stage,
        "trainer_name": sidecar.get("name"),
    }
    return params, plans, info


def convert_reference_model_to_native(model_file: str, output_file: str,
                                      tconv: str = "shiftConvPP",
                                      base_num_features: int = 48,
                                      fold=0):
    """Write a native checkpoint (+sidecar) loadable by
    inference.predictor.ModelBundle from a reference .model file."""
    import jax
    import jax.numpy as jnp
    from ..training.checkpoint import save_checkpoint
    from ..training.train_state import create_train_state

    params, plans, info = load_reference_checkpoint(model_file)
    params = jax.tree_util.tree_map(jnp.asarray, params)
    state = create_train_state(params)
    sidecar = {
        "init": {"fold": fold, "stage": info["stage"], "tconv": tconv,
                 "batch_dice": True, "base_num_features": base_num_features,
                 "cascade": False},
        "name": "TPUTrainer",
        "class": "e2enet_tpu.training.trainer.TPUTrainer",
        "plans": plans.to_dict(),
        "converted_from": os.path.abspath(model_file),
    }
    save_checkpoint(output_file, state, info.get("epoch") or 0,
                    {"converted_from": model_file}, sidecar)
    print(f"converted {model_file} -> {output_file}")
    return output_file
