"""Named trainer variants — the reference's ablation-trainer zoo as
configuration presets.

Parity: reference training/network_training/nnUNet_variants/ (~60
subclasses, ~3.5k LoC). Each reference variant subclasses nnUNetTrainerV2
and overrides one knob (loss, optimizer, DA level, momentum, epochs...).
Here they are declarative presets applied to TPUTrainer's constructor and
AugmentParams/loss configuration; same names resolve via VARIANTS.
"""
from typing import Any, Dict

VARIANTS: Dict[str, Dict[str, Any]] = {
    # --- default
    "TPUTrainer": {},
    "nnUNetTrainerV2": {},
    # --- benchmarking (expected_epoch_times.md methodology)
    "nnUNetTrainerV2_2epochs": {"max_num_epochs": 2},
    "nnUNetTrainerV2_5epochs": {"max_num_epochs": 5},
    "nnUNetTrainerV2_dummyLoad": {"dummy_load": True},
    # --- losses (nnUNet_variants/loss_function/*)
    "nnUNetTrainerV2_Loss_DiceTopK10": {"loss": "dc_topk"},
    "nnUNetTrainerV2_Loss_Dice": {"loss": "dice"},
    "nnUNetTrainerV2_Loss_CE": {"loss": "ce"},
    "nnUNetTrainerV2_focalLoss": {"loss": "focal"},
    "nnUNetTrainerV2_Loss_GDL": {"loss": "gdl"},
    # --- optimizer / momentum (nnUNet_variants/optimizer_and_lr/*)
    "nnUNetTrainerV2_Ranger_lr3en4": {"optimizer": "ranger",
                                      "initial_lr": 3e-4},
    "nnUNetTrainerV2_Ranger_lr3en3": {"optimizer": "ranger",
                                      "initial_lr": 3e-3},
    "nnUNetTrainerV2_Ranger_lr1en2": {"optimizer": "ranger",
                                      "initial_lr": 1e-2},
    "nnUNetTrainerV2_Adam": {"optimizer": "adam"},
    "nnUNetTrainerV2_Adam_lr_3en4": {"optimizer": "adam",
                                     "initial_lr": 3e-4},
    "nnUNetTrainerV2_momentum09": {"momentum": 0.9},
    "nnUNetTrainerV2_momentum095": {"momentum": 0.95},
    "nnUNetTrainerV2_momentum098": {"momentum": 0.98},
    "nnUNetTrainerV2_SGD_lr1en1": {"initial_lr": 1e-1},
    "nnUNetTrainerV2_SGD_lr1en3": {"initial_lr": 1e-3},
    # --- data augmentation levels (nnUNet_variants/data_augmentation/*)
    "nnUNetTrainerV2_noDA": {"da": "none"},
    "nnUNetTrainerV2_noMirroring": {"da": "no_mirror"},
    "nnUNetTrainerV2_insaneDA": {"da": "insane"},
    "nnUNetTrainerV2_DA2": {"da": "da2"},
    # --- precision
    "nnUNetTrainerV2_fp32": {"fp16": False},
    # --- cascade
    "nnUNetTrainerV2_CascadeFullRes": {"cascade": True},
    # --- losses (cont.)
    "nnUNetTrainerV2_Loss_MCC": {"loss": "mcc"},
    "nnUNetTrainerV2_Loss_MCCnoBG": {"loss": "mcc"},
    # --- architectural variants (nnUNet_variants/architectural_variants/*:
    # norm_op/nonlin knobs on the network)
    "nnUNetTrainerV2_BN": {"norm_op": "batch"},
    "nnUNetTrainerV2_GN": {"norm_op": "group"},
    "nnUNetTrainerV2_FRN": {"norm_op": "frn"},
    "nnUNetTrainerV2_NoNormalization": {"norm_op": "none"},
    "nnUNetTrainerV2_ReLU": {"nonlin": "relu"},
    "nnUNetTrainerV2_GeLU": {"nonlin": "gelu"},
    "nnUNetTrainerV2_Mish": {"nonlin": "mish"},
    "nnUNetTrainerV2_BN_ReLU": {"norm_op": "batch", "nonlin": "relu"},
    "nnUNetTrainerV2_FRN_LReLU": {"norm_op": "frn"},
    "nnUNetTrainerV2_NoNormalization_lr1en3": {"norm_op": "none",
                                               "initial_lr": 1e-3},
}


def apply_da_level(da_params, level: str):
    """Mutate AugmentParams according to the named DA level."""
    if level == "none":
        da_params.do_rotation = False
        da_params.do_scaling = False
        da_params.do_mirror = False
        da_params.do_gamma = False
    elif level == "no_mirror":
        da_params.do_mirror = False
    elif level == "insane":
        da_params.p_rot = 0.7
        da_params.p_scale = 0.7
        da_params.scale_range = (0.5, 1.6)
    elif level == "da2":
        da_params.scale_range = (0.65, 1.6)
    return da_params


def resolve_variant(name: str) -> Dict[str, Any]:
    if name not in VARIANTS:
        raise KeyError(f"unknown trainer variant '{name}'; known: "
                       f"{sorted(VARIANTS)}")
    return dict(VARIANTS[name])
