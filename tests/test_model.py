"""ShiftUNetPlusPlus: shape checks, param-count and forward-output parity
against the reference Generic_UNetPlusPlus (unetpp_d.py:210-591)."""
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from conftest import has_reference, import_reference_unetpp
from e2enet_tpu.models.unetpp import (ShiftUNetPlusPlus, ds_loss_weights,
                                      deep_supervision_scales,
                                      encoder_channels)
from e2enet_tpu.models.torch_import import (convert_unetpp_state_dict,
                                            nchw_to_ndhwc, ndhwc_to_nchw)

POOLS_5 = ((1, 2, 2), (2, 2, 2), (2, 2, 2), (2, 2, 2), (1, 2, 2))


def small_model(num_classes=3, base=8, pools=POOLS_5, dtype=jnp.float32):
    return ShiftUNetPlusPlus(
        input_channels=1, num_classes=num_classes,
        pool_op_kernel_sizes=pools, base_num_features=base,
        max_num_features=64, compute_dtype=dtype)


def test_encoder_channels():
    assert encoder_channels(48, 5, 320) == [48, 96, 192, 320, 320, 320]


def test_output_shapes_and_ds():
    m = small_model()
    x = jnp.zeros((1, 8, 32, 32, 1))
    params = m.init(jax.random.PRNGKey(0), x)
    outs = m.apply(params, x, do_ds=True)
    assert len(outs) == 4
    # full res first, then 1/p0, 1/(p0*p1), ...
    assert outs[0].shape == (1, 8, 32, 32, 3)
    assert outs[1].shape == (1, 8, 16, 16, 3)
    assert outs[2].shape == (1, 4, 8, 8, 3)
    assert outs[3].shape == (1, 2, 4, 4, 3)
    single = m.apply(params, x, do_ds=False)
    np.testing.assert_allclose(np.asarray(single), np.asarray(outs[0]))


def test_ds_weights_and_scales():
    w = ds_loss_weights(5, 4)
    np.testing.assert_allclose(w.sum(), 1.0)
    np.testing.assert_allclose(w, np.array([1, .5, .25, .125]) / 1.875)
    s = deep_supervision_scales(POOLS_5, 4)
    assert s[0] == [1., 1., 1.]
    assert s[1] == [1., .5, .5]
    assert s[2] == [.5, .25, .25]


@pytest.mark.skipif(not has_reference(), reason="reference not mounted")
def test_param_count_parity():
    torch = pytest.importorskip("torch")
    import torch.nn as nn
    Ref = import_reference_unetpp()
    pools = [list(p) for p in POOLS_5]
    net = Ref((32, 128, 128), 2, 48, 5, 5, 2, 2, nn.Conv3d, nn.InstanceNorm3d,
              {'eps': 1e-5, 'affine': True}, nn.Dropout3d,
              {'p': 0, 'inplace': True}, nn.LeakyReLU,
              {'negative_slope': 1e-2, 'inplace': True}, True, False,
              lambda x: x, None, pools, [[1, 3, 3]] * 6, False, True, True)
    ref_count = sum(p.numel() for p in net.parameters())

    m = ShiftUNetPlusPlus(input_channels=2, num_classes=5,
                          pool_op_kernel_sizes=POOLS_5,
                          base_num_features=48, compute_dtype=jnp.float32)
    params = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 32, 32, 2)))
    our_count = sum(int(np.prod(p.shape))
                    for p in jax.tree_util.tree_leaves(params))
    assert our_count == ref_count


@pytest.mark.skipif(not has_reference(), reason="reference not mounted")
def test_forward_parity_with_reference():
    """Gold test: convert reference weights, feed identical input, compare
    all four deep-supervision logits in float32."""
    torch = pytest.importorskip("torch")
    import torch.nn as nn
    Ref = import_reference_unetpp()
    pools = [list(p) for p in POOLS_5]
    torch.manual_seed(0)
    net = Ref((8, 64, 64), 1, 8, 3, 5, 2, 2, nn.Conv3d, nn.InstanceNorm3d,
              {'eps': 1e-5, 'affine': True}, nn.Dropout3d,
              {'p': 0, 'inplace': True}, nn.LeakyReLU,
              {'negative_slope': 1e-2, 'inplace': True}, True, False,
              lambda x: x, None, pools, [[1, 3, 3]] * 6, False, True, True,
              max_num_features=64)
    net.eval()
    sd = {k: v.detach().numpy() for k, v in net.state_dict().items()}

    m = ShiftUNetPlusPlus(input_channels=1, num_classes=3,
                          pool_op_kernel_sizes=POOLS_5, base_num_features=8,
                          max_num_features=64, compute_dtype=jnp.float32)
    params = {"params": convert_unetpp_state_dict(sd, num_pool=5)}

    # init once to validate the converted tree structure matches exactly
    ref_tree = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 64, 64, 1)))
    ref_paths = {jax.tree_util.keystr(p): v.shape for p, v in
                 jax.tree_util.tree_flatten_with_path(ref_tree)[0]}
    got_paths = {jax.tree_util.keystr(p): v.shape for p, v in
                 jax.tree_util.tree_flatten_with_path(params)[0]}
    assert ref_paths == got_paths

    rng = np.random.RandomState(42)
    x = rng.randn(1, 1, 8, 64, 64).astype(np.float32)  # NCDHW
    with torch.no_grad():
        ref_outs = net(torch.from_numpy(x))
    outs = m.apply(params, jnp.asarray(nchw_to_ndhwc(x)), do_ds=True)
    assert len(ref_outs) == len(outs) == 4
    for ro, o in zip(ref_outs, outs):
        got = ndhwc_to_nchw(np.asarray(o))
        np.testing.assert_allclose(got, ro.numpy(), rtol=2e-4, atol=2e-4)


def test_norm_nonlin_variants():
    """Architectural-variant knobs: every norm_op x nonlin builds and runs
    (nnUNet_variants/architectural_variants parity)."""
    import itertools
    import jax
    import jax.numpy as jnp
    from e2enet_tpu.models.unetpp import ShiftUNetPlusPlus
    x = jnp.ones((1, 4, 8, 8, 1), jnp.float32)
    for norm, nl in [("batch", "lrelu"), ("group", "relu"),
                     ("frn", "lrelu"), ("none", "mish"),
                     ("instance", "gelu")]:
        m = ShiftUNetPlusPlus(
            input_channels=1, num_classes=2,
            pool_op_kernel_sizes=((2, 2, 2),), base_num_features=4,
            compute_dtype=jnp.float32, norm_op=norm, nonlin=nl,
            remat=False)
        params = m.init(jax.random.PRNGKey(0), x)
        outs = m.apply(params, x)
        assert all(bool(jnp.all(jnp.isfinite(o))) for o in outs)
        if norm == "frn":
            flat = jax.tree_util.tree_flatten_with_path(params)[0]
            assert any("frn_tau" in jax.tree_util.keystr(k)
                       for k, _ in flat)


def test_norm_ops_match_torch():
    """BN/GN numerics vs torch (the reference variants' norm layers)."""
    import pytest
    torch = pytest.importorskip("torch")
    import jax.numpy as jnp
    from e2enet_tpu.ops.blocks import batch_norm, group_norm, mish
    rng = np.random.RandomState(0)
    x = rng.randn(2, 3, 4, 5, 6).astype(np.float32)   # (N,D,H,W,C)
    scale = rng.rand(6).astype(np.float32) + 0.5
    bias = rng.randn(6).astype(np.float32)

    ours = np.asarray(batch_norm(jnp.asarray(x), jnp.asarray(scale),
                                 jnp.asarray(bias)))
    bn = torch.nn.BatchNorm3d(6, eps=1e-5, affine=True)
    bn.weight.data = torch.from_numpy(scale)
    bn.bias.data = torch.from_numpy(bias)
    bn.train()
    xt = torch.from_numpy(np.moveaxis(x, -1, 1))
    theirs = np.moveaxis(bn(xt).detach().numpy(), 1, -1)
    np.testing.assert_allclose(ours, theirs, atol=2e-5)

    ours = np.asarray(group_norm(jnp.asarray(x), jnp.asarray(scale),
                                 jnp.asarray(bias), num_groups=3))
    gn = torch.nn.GroupNorm(3, 6, eps=1e-5, affine=True)
    gn.weight.data = torch.from_numpy(scale)
    gn.bias.data = torch.from_numpy(bias)
    theirs = np.moveaxis(gn(xt).detach().numpy(), 1, -1)
    np.testing.assert_allclose(ours, theirs, atol=2e-5)

    ours = np.asarray(mish(jnp.asarray(x)))
    theirs = np.moveaxis(
        torch.nn.functional.mish(xt).numpy(), 1, -1)
    np.testing.assert_allclose(ours, theirs, atol=2e-5)
