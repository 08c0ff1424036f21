"""Import reference PyTorch checkpoints into e2enet_tpu param pytrees.

Maps Generic_UNetPlusPlus state_dict names (unetpp_d.py:307-438; checkpoint
format nnUNetTrainer_simple.py:1140-1176) onto our flax module tree, including
the layout transposes:
    conv weight      (out, in, 1, kh, kw) -> (kh, kw, in, out)
    transpconv weight (in, out, kd, kh, kw) -> (kd, kh, kw, in, out)
    seg head weight  (out, in, 1, 1, 1)   -> (in, out)
Used for fidelity checks against the reference and to serve inference from
reference-trained models.
"""
from typing import Dict

import numpy as np


def _conv_w(w):
    w = np.asarray(w)
    assert w.ndim == 5 and w.shape[2] == 1, f"expected (o,i,1,kh,kw), got {w.shape}"
    return np.transpose(w[:, :, 0], (2, 3, 1, 0))  # (kh,kw,in,out)


def _transp_w(w):
    w = np.asarray(w)
    return np.transpose(w, (2, 3, 4, 0, 1))  # (kd,kh,kw,in,out)


def _seg_w(w):
    w = np.asarray(w)
    return np.transpose(w[:, :, 0, 0, 0], (1, 0))  # (in,out)


def _block(sd: Dict[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    return {
        "kernel": _conv_w(sd[f"{prefix}.conv.weight"]),
        "bias": np.asarray(sd[f"{prefix}.conv.bias"]),
        "norm_scale": np.asarray(sd[f"{prefix}.instnorm.weight"]),
        "norm_bias": np.asarray(sd[f"{prefix}.instnorm.bias"]),
    }


def convert_unetpp_state_dict(sd: Dict[str, np.ndarray], num_pool: int,
                              num_conv_per_stage: int = 2) -> dict:
    """Returns a flax `params` dict for ShiftUNetPlusPlus."""
    P = num_pool
    params = {}

    # encoder stages 0..P-1
    for d in range(P):
        stage = {}
        for i in range(num_conv_per_stage):
            stage[f"block{i}"] = _block(
                sd, f"conv_blocks_context.{d}.blocks.{i}")
        params[f"context{d}"] = stage
    # bottleneck: Sequential(Stacked(num-1), Stacked(1))
    stage_a = {}
    for i in range(num_conv_per_stage - 1):
        stage_a[f"block{i}"] = _block(
            sd, f"conv_blocks_context.{P}.0.blocks.{i}")
    params[f"context{P}a"] = stage_a
    params[f"context{P}b"] = {
        "block0": _block(sd, f"conv_blocks_context.{P}.1.blocks.0")}

    # nests
    for z in range(P):
        n_nodes = P - z
        for k in range(n_nodes):
            params[f"up{z}_{k}"] = {
                "kernel": _transp_w(sd[f"up{z}.{k}.weight"])}
            if z == 0:
                blk = {}
                for i in range(num_conv_per_stage - 1):
                    blk[f"block{i}"] = _block(sd, f"loc{z}.{k}.0.blocks.{i}")
                params[f"loc{z}_{k}"] = blk
                params[f"loc{z}_{k}_final"] = {
                    "block0": _block(sd, f"loc{z}.{k}.1.blocks.0")}
            else:
                blk = {}
                for i in range(num_conv_per_stage - 1):
                    blk[f"block{i}"] = _block(sd, f"loc{z}.{k}.0.blocks.{i}")
                params[f"loc{z}_{k}"] = blk

    # seg heads: seg_outputs.{i} maps to seg_head{i} (both index by level)
    n_heads = min(4, P)
    for i in range(n_heads):
        params[f"seg_head{i}"] = {"kernel": _seg_w(sd[f"seg_outputs.{i}.weight"])}
    return params


def _inv_conv_w(w):
    w = np.asarray(w)                       # (kh,kw,in,out)
    return np.transpose(w, (3, 2, 0, 1))[:, :, None]  # (out,in,1,kh,kw)


def _inv_transp_w(w):
    w = np.asarray(w)                       # (kd,kh,kw,in,out)
    return np.transpose(w, (3, 4, 0, 1, 2))  # (in,out,kd,kh,kw)


def _inv_seg_w(w):
    w = np.asarray(w)                       # (in,out)
    return np.transpose(w, (1, 0))[:, :, None, None, None]


def _inv_block(blk, prefix: str):
    return {
        f"{prefix}.conv.weight": _inv_conv_w(blk["kernel"]),
        f"{prefix}.conv.bias": np.asarray(blk["bias"]),
        f"{prefix}.instnorm.weight": np.asarray(blk["norm_scale"]),
        f"{prefix}.instnorm.bias": np.asarray(blk["norm_bias"]),
    }


def export_unetpp_state_dict(params: dict, num_pool: int,
                             num_conv_per_stage: int = 2
                             ) -> Dict[str, np.ndarray]:
    """Inverse of convert_unetpp_state_dict: our flax params -> a reference
    Generic_UNetPlusPlus state_dict (numpy values; caller wraps in torch
    tensors). Used by the trained-checkpoint fidelity harness: a NATIVE
    trained model round-trips into the reference torch network so
    predict_3D can serve as the accuracy oracle on trained weights."""
    P = num_pool
    sd = {}
    for d in range(P):
        for i in range(num_conv_per_stage):
            sd.update(_inv_block(params[f"context{d}"][f"block{i}"],
                                 f"conv_blocks_context.{d}.blocks.{i}"))
    for i in range(num_conv_per_stage - 1):
        sd.update(_inv_block(params[f"context{P}a"][f"block{i}"],
                             f"conv_blocks_context.{P}.0.blocks.{i}"))
    sd.update(_inv_block(params[f"context{P}b"]["block0"],
                         f"conv_blocks_context.{P}.1.blocks.0"))
    for z in range(P):
        for k in range(P - z):
            sd[f"up{z}.{k}.weight"] = _inv_transp_w(
                params[f"up{z}_{k}"]["kernel"])
            for i in range(num_conv_per_stage - 1):
                sd.update(_inv_block(params[f"loc{z}_{k}"][f"block{i}"],
                                     f"loc{z}.{k}.0.blocks.{i}"))
            if z == 0:
                sd.update(_inv_block(params[f"loc{z}_{k}_final"]["block0"],
                                     f"loc{z}.{k}.1.blocks.0"))
    for i in range(min(4, P)):
        sd[f"seg_outputs.{i}.weight"] = _inv_seg_w(
            params[f"seg_head{i}"]["kernel"])
    return sd


def nchw_to_ndhwc(x: np.ndarray) -> np.ndarray:
    """(N, C, D, H, W) -> (N, D, H, W, C)."""
    return np.transpose(x, (0, 2, 3, 4, 1))


def ndhwc_to_nchw(x: np.ndarray) -> np.ndarray:
    return np.transpose(x, (0, 4, 1, 2, 3))
