"""Flip-free mirror TTA substrate: every op/block/model, invoked with
flips=c, must compute flip_c(op(flip_c(x))) EXACTLY — mirrored kernels +
re-anchored strided windows + negated shift groups instead of flipping
data (reference flips data per pass, neural_network.py:529-563)."""
import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from e2enet_tpu.ops import blocks
from e2enet_tpu.ops.blocks import conv3d_one_flat

COMBOS = list(itertools.product([False, True], repeat=3))


def _flip(x, flips, axes=(1, 2, 3)):
    for f, ax in zip(flips, axes):
        if f:
            x = jnp.flip(x, axis=ax)
    return x


@pytest.mark.parametrize("stride", [(1, 1, 1), (2, 2, 2), (1, 2, 2),
                                    (2, 1, 2)])
@pytest.mark.parametrize("flat_axis", [0, 1, 2])
def test_conv3d_one_flat_flips(stride, flat_axis):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 8, 8, 8, 5).astype(np.float32))
    spatial = [3, 3, 3]
    spatial[flat_axis] = 1
    ks = [k for k in spatial if k != 1] or [1]
    if len(ks) == 1:
        ks = ks + [1]
    kern = jnp.asarray(rng.randn(*ks, 5, 6).astype(np.float32) * 0.3)
    bias = jnp.asarray(rng.randn(6).astype(np.float32) * 0.1)
    ref0 = conv3d_one_flat(x, kern, bias, stride, flat_axis, jnp.float32)
    for c in COMBOS:
        got = conv3d_one_flat(x, kern, bias, stride, flat_axis,
                              jnp.float32, flips=c)
        ref = _flip(conv3d_one_flat(_flip(x, c), kern, bias, stride,
                                    flat_axis, jnp.float32), c)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5,
                                   err_msg=f"flips={c}")
    # identity combo really is the baseline
    np.testing.assert_array_equal(
        np.asarray(conv3d_one_flat(x, kern, bias, stride, flat_axis,
                                   jnp.float32, flips=(False,) * 3)),
        np.asarray(ref0))


@pytest.mark.parametrize("stride", [(2, 2, 2), (1, 2, 2)])
def test_transp_conv_flips(stride):
    from e2enet_tpu.ops.blocks import flip_transp_kernel, transp_conv_matmul
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 4, 4, 4, 5).astype(np.float32))
    kern = jnp.asarray(rng.randn(*stride, 5, 6).astype(np.float32) * 0.3)
    for c in COMBOS:
        got = transp_conv_matmul(x, flip_transp_kernel(kern, c), stride,
                                 jnp.float32)
        ref = _flip(transp_conv_matmul(_flip(x, c), kern, stride,
                                       jnp.float32), c)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5,
                                   err_msg=f"flips={c}")


def _q_setup(q, C=7, CO=6, shape=(8, 8, 8), N=2):
    from e2enet_tpu.ops.qfused import choose_wqp, to_quadrant_cf
    D, H, W = shape
    qd, qh, qw = q
    Hq, Wq = H // qh, W // qw
    Wqp = choose_wqp(Hq, Wq)
    ks = jax.random.split(jax.random.PRNGKey(5), 5)
    x = jax.random.normal(ks[0], (N, D, H, W, C), jnp.float32)
    xq = to_quadrant_cf(x, q, Wqp)
    mult = jax.random.normal(ks[1], (N, C), jnp.float32) * 0.5 + 1.0
    off = jax.random.normal(ks[2], (N, C), jnp.float32) * 0.3
    kern = jax.random.normal(ks[3], (3, 3, C, CO), jnp.float32) * 0.3
    bias = jax.random.normal(ks[4], (CO,), jnp.float32) * 0.2
    return x, xq, mult, off, kern, bias, Hq, Wq, Wqp


@pytest.mark.parametrize("q", [(2, 2, 2), (1, 2, 2), (2, 2, 1)])
def test_quadrant_strided_shift_conv_flips(q):
    """XLA strided transition with flips == flip(op(flip(x))) computed at
    full resolution via the channels-last oracle."""
    from e2enet_tpu.ops import blocks as B
    from e2enet_tpu.ops.qfused import (quadrant_strided_shift_conv,
                                       to_quadrant_cf)
    from e2enet_tpu.ops.shift import depth_shift
    x, xq, _, _, kern, bias, Hq, Wq, Wqp = _q_setup(q)
    for c in COMBOS:
        y, _ = quadrant_strided_shift_conv(
            xq, kern, bias, q, Hq, Wq, Wqp, compute_dtype=jnp.float32,
            flips=c)
        got = y.reshape(2, -1, kern.shape[-1], Hq, Wqp)[..., :Wq]
        got = jnp.transpose(got, (0, 1, 3, 4, 2))
        xf = _flip(x, c)
        ref = B.conv3d_one_flat(depth_shift(xf, 5), kern, bias, q, 0,
                                jnp.float32)
        ref = _flip(ref, c)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5,
                                   err_msg=f"flips={c}")


@pytest.mark.parametrize("q", [(2, 2, 2), (1, 2, 2)])
def test_qstride_kernel_flips(q):
    """Pallas strided-transition kernel flips == the XLA reference with
    the same flips (which the previous test pins to the oracle)."""
    from e2enet_tpu.ops import qstride
    from e2enet_tpu.ops.qstride import QSStatic, quadrant_strided_fused
    x, xq, mult, off, kern, bias, Hq, Wq, Wqp = _q_setup(q)
    for c in COMBOS:
        static = QSStatic(tuple(q), 7, 6, int(xq.shape[1]), Hq, Wq, Wqp,
                          5, True, True, c)
        yk, sk = quadrant_strided_fused(xq, mult, off, kern, bias, static)
        yr, sr = qstride._ref_forward(xq, mult, off, kern, bias, static)
        np.testing.assert_allclose(np.asarray(yk), np.asarray(yr),
                                   rtol=2e-5, atol=2e-5,
                                   err_msg=f"flips={c}")
        np.testing.assert_allclose(np.asarray(sk), np.asarray(sr),
                                   rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("q", [(2, 2, 2), (2, 1, 1)])
def test_quadrant_fused_block_flips(q):
    """Quadrant fused block with flips (negated shift tables + mirrored
    kernel) == flip(block(flip(x))) via the channels-last oracle."""
    from e2enet_tpu.ops import blocks as B
    from e2enet_tpu.ops.qfused import (choose_wqp, from_quadrant_cf,
                                       quadrant_fused_block, to_quadrant_cf)
    from e2enet_tpu.ops.shift import depth_shift
    rng = np.random.RandomState(7)
    C, CO = 6, 4
    D, H, W = 8, 8, 8
    qd, qh, qw = q
    Hq, Wq = H // qh, W // qw
    Wqp = choose_wqp(Hq, Wq)
    x = jnp.asarray(rng.randn(2, D, H, W, C).astype(np.float32))
    kern = jnp.asarray(rng.randn(3, 3, C, CO).astype(np.float32) * 0.3)
    bias = jnp.asarray(rng.randn(CO).astype(np.float32) * 0.2)
    xq = to_quadrant_cf(x, q, Wqp)
    for c in COMBOS:
        y, _ = quadrant_fused_block([xq], kern, bias, [None], q, Hq, Wq,
                                    interpret=True, flips=c)
        got = from_quadrant_cf(y, q, Hq, Wq, CO)
        xf = _flip(x, c)
        ref = B.conv3d_one_flat(depth_shift(xf, 5), kern, bias,
                                (1, 1, 1), 0, jnp.float32)
        ref = _flip(ref, c)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5,
                                   err_msg=f"flips={c}")


MODEL_COMBOS = [(True, False, False), (False, True, False),
                (False, False, True), (True, True, True)]


@pytest.mark.parametrize("quadrant", [True, False])
def test_full_model_flips(quadrant):
    """ShiftUNetPlusPlus.clone(flips=c).apply(params, x) ==
    flip_c(net(flip_c(x))) — the whole nest composed of mirrored
    operators telescopes to the mirrored model (quadrant kernels in
    interpret mode AND the plain XLA path)."""
    from e2enet_tpu.models.unetpp import ShiftUNetPlusPlus
    kw = dict(input_channels=1, num_classes=3,
              pool_op_kernel_sizes=((2, 2, 2), (2, 2, 2)),
              base_num_features=4, compute_dtype=jnp.float32, remat=False)
    if quadrant:
        kw.update(fused=True, fused_interpret=True, quadrant=True)
    else:
        kw.update(fused=False, quadrant=False)
    net = ShiftUNetPlusPlus(**kw)
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 8, 8, 16, 1),
                          jnp.float32)
    params = net.init(jax.random.PRNGKey(4), x)
    for c in MODEL_COMBOS:
        got = net.clone(flips=c).apply(params, x, do_ds=False)
        ref = _flip(net.apply(params, _flip(x, c), do_ds=False), c)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4,
                                   err_msg=f"flips={c}")


def test_flip_free_sliding_matches_flip_tta():
    """The flip-free sliding-window TTA (mirror_apply_fns: statically
    mirrored network per pass, zero data flips) == the flip-based TTA,
    for both the quadrant-logits path and the plain path."""
    from e2enet_tpu.models.unetpp import ShiftUNetPlusPlus
    from e2enet_tpu.ops.sliding import (flip_combinations,
                                        make_tiled_predictor,
                                        predict_volume_tiled)
    kw = dict(input_channels=1, num_classes=3,
              pool_op_kernel_sizes=((2, 2, 2), (2, 2, 2)),
              base_num_features=4, compute_dtype=jnp.float32, remat=False,
              fused=True, fused_interpret=True, quadrant=True)
    patch = (4, 8, 16)
    net = ShiftUNetPlusPlus(**kw, quadrant_logits=True,
                            quadrant_input=patch)
    x0 = jnp.zeros((1, *patch, 1), jnp.float32)
    params = net.init(jax.random.PRNGKey(0), x0)
    apply_fn = lambda p, x: net.apply(p, x, do_ds=False)
    mirror_fns = []
    for c in flip_combinations((0, 1, 2)):
        f = tuple(a in c for a in (0, 1, 2))
        net_m = net.clone(flips=f) if any(f) else net
        mirror_fns.append(lambda p, x, _n=net_m: _n.apply(
            p, x, do_ds=False))
    qmeta = ((2, 2, 2), patch[1] // 2, patch[2] // 2)
    vol = np.random.RandomState(5).randn(1, 6, 12, 24).astype(np.float32)
    pred_flip = make_tiled_predictor(apply_fn, patch, 3,
                                     quadrant_meta=qmeta)
    pred_free = make_tiled_predictor(apply_fn, patch, 3,
                                     quadrant_meta=qmeta,
                                     mirror_apply_fns=mirror_fns)
    probs_flip = predict_volume_tiled(apply_fn, params, vol, patch, 3,
                                      predictor=pred_flip)
    probs_free = predict_volume_tiled(apply_fn, params, vol, patch, 3,
                                      predictor=pred_free)
    np.testing.assert_allclose(np.asarray(probs_free),
                               np.asarray(probs_flip),
                               rtol=1e-5, atol=1e-6)

    # plain (rank-5 logits) model through the flip-free path
    net_p = ShiftUNetPlusPlus(**{**kw, "fused": False, "quadrant": False})
    apply_p = lambda p, x: net_p.apply(p, x, do_ds=False)
    params_p = net_p.init(jax.random.PRNGKey(1), x0)
    fns_p = []
    for c in flip_combinations((0, 1, 2)):
        f = tuple(a in c for a in (0, 1, 2))
        net_m = net_p.clone(flips=f) if any(f) else net_p
        fns_p.append(lambda p, x, _n=net_m: _n.apply(p, x, do_ds=False))
    pf = make_tiled_predictor(apply_p, patch, 3)
    pff = make_tiled_predictor(apply_p, patch, 3, mirror_apply_fns=fns_p)
    a = predict_volume_tiled(apply_p, params_p, vol, patch, 3,
                             predictor=pf)
    b = predict_volume_tiled(apply_p, params_p, vol, patch, 3,
                             predictor=pff)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                               rtol=1e-5, atol=1e-6)


def test_fused_block_cf_flips():
    """Plain (non-quadrant) fused CF block with flips vs the oracle."""
    from e2enet_tpu.ops import blocks as B
    from e2enet_tpu.ops.fused_block import (choose_wp, fused_shift_conv_block)
    from e2enet_tpu.ops.shift import depth_shift
    rng = np.random.RandomState(9)
    C, CO = 6, 4
    D, H, W = 6, 8, 8
    Wp = choose_wp(H, W)
    x = jnp.asarray(rng.randn(2, D, H, W, C).astype(np.float32))
    kern = jnp.asarray(rng.randn(3, 3, C, CO).astype(np.float32) * 0.3)
    bias = jnp.asarray(rng.randn(CO).astype(np.float32) * 0.2)
    xcf = jnp.pad(jnp.transpose(x, (0, 1, 4, 2, 3)),
                  ((0, 0),) * 4 + ((0, Wp - W),))
    xcf = xcf.reshape(2, D, C, H * Wp)
    for c in COMBOS:
        y, _ = fused_shift_conv_block([xcf], kern, bias, [None], H, W,
                                      interpret=True, flips=c)
        got = y.reshape(2, D, CO, H, Wp)[..., :W]
        got = jnp.transpose(got, (0, 1, 3, 4, 2))
        xf = _flip(x, c)
        ref = B.conv3d_one_flat(depth_shift(xf, 5), kern, bias,
                                (1, 1, 1), 0, jnp.float32)
        ref = _flip(ref, c)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5,
                                   err_msg=f"flips={c}")
