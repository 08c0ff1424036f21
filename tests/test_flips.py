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
