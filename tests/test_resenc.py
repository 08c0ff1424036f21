"""ResidualUNet (FabiansUNet) forward parity vs the reference torch
implementation (generic_modular_residual_UNet.py) with converted weights.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from e2enet_tpu.models.resenc import ResidualUNet

from conftest import has_reference, stub_reference_deps


def _t2j(w):
    return np.asarray(w.detach().cpu().numpy())


def build_reference(P, base, ncls, blocks_enc, blocks_dec):
    import torch.nn as nn
    stub_reference_deps()
    from e2enet.network_architecture.generic_modular_residual_UNet import (
        FabiansUNet, get_default_network_config)
    cfg = get_default_network_config(3, None, norm_type="in")
    cfg["nonlin"] = nn.LeakyReLU
    cfg["nonlin_kwargs"] = {"negative_slope": 1e-2, "inplace": True}
    pool_kernels = [[1, 1, 1]] + [[2, 2, 2]] * P
    conv_kernels = [[3, 3, 3]] * (P + 1)
    net = FabiansUNet(1, base, list(blocks_enc), 2, pool_kernels,
                      conv_kernels, cfg, ncls, list(blocks_dec),
                      deep_supervision=True, upscale_logits=False,
                      max_features=320)
    net.eval()
    return net


def convert_weights(net, P, blocks_enc, blocks_dec):
    params = {}
    enc = net.encoder
    params["initial_conv"] = _t2j(enc.initial_conv.weight).transpose(
        2, 3, 4, 1, 0)
    params["initial_bias"] = _t2j(enc.initial_conv.bias)
    params["initial_scale"] = _t2j(enc.initial_norm.weight)
    params["initial_nbias"] = _t2j(enc.initial_norm.bias)
    for s in range(P + 1):
        stage = {}
        for b in range(blocks_enc[s]):
            blk = enc.stages[s].convs[b]
            d = {
                "conv1": _t2j(blk.conv1.weight).transpose(2, 3, 4, 1, 0),
                "bias1": _t2j(blk.conv1.bias),
                "scale1": _t2j(blk.norm1.weight),
                "nbias1": _t2j(blk.norm1.bias),
                "conv2": _t2j(blk.conv2.weight).transpose(2, 3, 4, 1, 0),
                "bias2": _t2j(blk.conv2.bias),
                "scale2": _t2j(blk.norm2.weight),
                "nbias2": _t2j(blk.norm2.bias),
            }
            if not callable(blk.downsample_skip) or hasattr(
                    blk.downsample_skip, "__getitem__"):
                d["skip_conv"] = _t2j(
                    blk.downsample_skip[0].weight).transpose(2, 3, 4, 1, 0)
                d["skip_scale"] = _t2j(blk.downsample_skip[1].weight)
                d["skip_nbias"] = _t2j(blk.downsample_skip[1].bias)
            stage[f"block{b}"] = d
        params[f"encoder{s}"] = stage
    dec = net.decoder
    for i in range(P):
        params[f"up{i}"] = {"kernel": _t2j(
            dec.tus[i].weight).transpose(2, 3, 4, 0, 1)}
        stage = {}
        for b in range(blocks_dec[i]):
            blk = dec.stages[i].convs[b]
            stage[f"block{b}"] = {
                "kernel": _t2j(blk.conv.weight).transpose(2, 3, 4, 1, 0),
                "bias": _t2j(blk.conv.bias),
                "norm_scale": _t2j(blk.norm.weight),
                "norm_bias": _t2j(blk.norm.bias),
            }
        params[f"decoder{i}"] = stage
    # heads: seg_head0 = full-res segmentation_output; seg_head{u>=1} =
    # deep_supervision_outputs[P - 1 - u] (built for s descending, s != 0)
    params["seg_head0"] = {"kernel": _t2j(
        dec.segmentation_output.weight)[:, :, 0, 0, 0].T}
    for u in range(1, min(4, P)):
        params[f"seg_head{u}"] = {"kernel": _t2j(
            dec.deep_supervision_outputs[P - 1 - u].weight)[
                :, :, 0, 0, 0].T}
    return jax.tree_util.tree_map(jnp.asarray, params)


@pytest.mark.skipif(not has_reference(), reason="reference not mounted")
def test_resenc_forward_parity():
    import torch
    P, base, ncls = 2, 4, 3
    blocks_enc, blocks_dec = (1, 2, 2), (1, 1)
    torch.manual_seed(3)
    net = build_reference(P, base, ncls, blocks_enc, blocks_dec)

    model = ResidualUNet(
        input_channels=1, num_classes=ncls,
        pool_op_kernel_sizes=((2, 2, 2),) * P, base_num_features=base,
        blocks_per_stage_encoder=blocks_enc,
        blocks_per_stage_decoder=blocks_dec,
        compute_dtype=jnp.float32)
    x = np.random.RandomState(0).randn(1, 8, 8, 8, 1).astype(np.float32)
    params = convert_weights(net, P, blocks_enc, blocks_dec)
    # init once to check the converted tree covers every param
    ref_tree = model.init(jax.random.PRNGKey(0),
                          jnp.asarray(x))["params"]
    ref_paths = {p for p, _ in
                 jax.tree_util.tree_flatten_with_path(ref_tree)[0]}
    got_paths = {p for p, _ in
                 jax.tree_util.tree_flatten_with_path(params)[0]}
    assert ref_paths == got_paths

    ours = model.apply({"params": params}, jnp.asarray(x), do_ds=True)
    with torch.no_grad():
        theirs = net(torch.from_numpy(
            np.moveaxis(x, -1, 1)))          # NDHWC -> NCDHW
    assert len(theirs) >= len(ours)
    for u, o in enumerate(ours):
        t = np.moveaxis(theirs[u].numpy(), 1, -1)
        np.testing.assert_allclose(np.asarray(o), t, atol=2e-4, rtol=1e-3)


def test_resenc_shapes_and_ds():
    model = ResidualUNet(input_channels=2, num_classes=4,
                         pool_op_kernel_sizes=((2, 2, 2), (2, 2, 2),
                                               (1, 2, 2)),
                         base_num_features=4, compute_dtype=jnp.float32)
    x = jnp.zeros((1, 8, 16, 16, 2), jnp.float32)
    p = model.init(jax.random.PRNGKey(0), x)["params"]
    outs = model.apply({"params": p}, x, do_ds=True)
    assert len(outs) == model.num_ds_outputs() == 3
    assert outs[0].shape == (1, 8, 16, 16, 4)
    assert outs[1].shape == (1, 4, 8, 8, 4)
    assert outs[2].shape == (1, 2, 4, 4, 4)
    single = model.apply({"params": p}, x, do_ds=False)
    np.testing.assert_allclose(np.asarray(single), np.asarray(outs[0]))


def test_allconv3x3_model_builds():
    """nnUNetTrainerV2_allConv3x3: every kernel (3,3,3), shift disabled."""
    from e2enet_tpu.models.unetpp import ShiftUNetPlusPlus
    m = ShiftUNetPlusPlus(
        input_channels=1, num_classes=3,
        pool_op_kernel_sizes=((2, 2, 2),) * 2, base_num_features=4,
        conv_kernel=(3, 3, 3), compute_dtype=jnp.float32,
        fused=False, quadrant=False)
    x = jnp.zeros((1, 8, 8, 8, 1), jnp.float32)
    p = m.init(jax.random.PRNGKey(0), x)["params"]
    assert p["context0"]["block0"]["kernel"].shape == (3, 3, 3, 1, 4)
    out = m.apply({"params": p}, x, do_ds=False)
    assert out.shape == (1, 8, 8, 8, 3)
