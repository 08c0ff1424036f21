"""Strided quadrant-transition Pallas kernel (ops/qstride.py): forward
parity vs the XLA reference composition (norm materializer +
quadrant_strided_shift_conv) and gradient parity (the custom VJP delegates
to the reference's autodiff, so grads must match EXACTLY)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from e2enet_tpu.ops import qstride
from e2enet_tpu.ops.qfused import choose_wqp, to_quadrant_cf
from e2enet_tpu.ops.qstride import (QSStatic, qstrided_supported,
                                    quadrant_strided_fused)

QS = [(2, 2, 2), (1, 2, 2), (2, 1, 1), (2, 2, 1)]


def _setup(q, C=7, CO=6, shape=(8, 8, 8), N=2, dtype=jnp.float32):
    D, H, W = shape
    qd, qh, qw = q
    Hq, Wq = H // qh, W // qw
    Wqp = choose_wqp(Hq, Wq)
    ks = jax.random.split(jax.random.PRNGKey(3), 5)
    x = jax.random.normal(ks[0], (N, D, H, W, C), jnp.float32)
    xq = to_quadrant_cf(x.astype(dtype), q, Wqp)
    mult = jax.random.normal(ks[1], (N, C), jnp.float32) * 0.5 + 1.0
    off = jax.random.normal(ks[2], (N, C), jnp.float32) * 0.3
    kern = jax.random.normal(ks[3], (3, 3, C, CO), jnp.float32) * 0.3
    bias = jax.random.normal(ks[4], (CO,), jnp.float32) * 0.2
    static = QSStatic(tuple(q), C, CO, D // qd, Hq, Wq, Wqp,
                      5, True, True)
    return xq, mult, off, kern.astype(dtype), bias, static


@pytest.mark.parametrize("q", QS)
@pytest.mark.parametrize("shift", [True, False])
def test_forward_matches_reference(q, shift):
    xq, mult, off, kern, bias, static = _setup(q)
    static = static._replace(do_shift=shift)
    y, stats = quadrant_strided_fused(xq, mult, off, kern, bias, static)
    y_ref, stats_ref = qstride._ref_forward(xq, mult, off, kern, bias,
                                            static)
    assert y.shape == y_ref.shape and y.dtype == y_ref.dtype
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(stats), np.asarray(stats_ref),
                               rtol=1e-4, atol=1e-4)


def test_forward_bf16():
    """bf16 kernel vs the f32 reference (the CPU backend has no bf16 dot
    for the reference einsum; on TPU both paths run bf16)."""
    q = (2, 2, 2)
    xq, mult, off, kern, bias, static = _setup(q, dtype=jnp.bfloat16)
    y, stats = quadrant_strided_fused(xq, mult, off, kern, bias, static)
    y_ref, stats_ref = qstride._ref_forward(
        xq.astype(jnp.float32), mult, off, kern.astype(jnp.float32), bias,
        static)
    assert y.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(y, np.float32),
                               np.asarray(y_ref, np.float32),
                               rtol=0.05, atol=0.05)
    np.testing.assert_allclose(np.asarray(stats), np.asarray(stats_ref),
                               rtol=0.02, atol=0.05)


@pytest.mark.parametrize("q", [(2, 2, 2), (1, 2, 2)])
def test_grad_matches_reference_exactly(q):
    """The custom VJP IS jax.vjp of the reference composition — bitwise
    identical cotangents."""
    xq, mult, off, kern, bias, static = _setup(q)

    def loss_kernel(*a):
        y, stats = quadrant_strided_fused(*a, static)
        return (jnp.sum(y * y) + jnp.sum(stats)).astype(jnp.float32)

    def loss_ref(*a):
        y, stats = qstride._ref_forward(*a, static)
        return (jnp.sum(y * y) + jnp.sum(stats)).astype(jnp.float32)

    gk = jax.grad(loss_kernel, argnums=(0, 1, 2, 3, 4))(
        xq, mult, off, kern, bias)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(
        xq, mult, off, kern, bias)
    for a, b in zip(gk, gr):
        # the y*y loss term sees the kernel's forward (tiny reduction-order
        # f32 differences vs the reference's nine separate tap einsums)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-4, atol=3e-4)


def test_gate():
    assert qstrided_supported((2, 2, 2), 48, 96, 64, 64, 66, 66)
    # output re-pad needed -> XLA fallback
    assert not qstrided_supported((2, 2, 2), 48, 96, 64, 64, 66, 68)
    # no quadrant factor
    assert not qstrided_supported((1, 1, 1), 48, 96, 64, 64, 66, 66)
    # lane misalignment
    assert not qstrided_supported((2, 2, 2), 48, 96, 64, 64, 65, 65)
