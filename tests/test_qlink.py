"""Parity of the ops/qlink.py site-epilogue Pallas kernels (interpret
mode) against their XLA twins, including the custom-VJP backward (which
must be IDENTICAL to the XLA path — it delegates to jax.vjp of the twin).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from e2enet_tpu.ops import qfused
from e2enet_tpu.ops.qlink import site_link_supported

Q = (2, 2, 2)
HQ, WQ, WQP = 8, 15, 16        # L = 128 (lane-aligned), 1 pad column
L = HQ * WQP


def _rand(rng, shape, dtype=jnp.bfloat16):
    return jnp.asarray(rng.randn(*shape), jnp.float32).astype(dtype)


def test_uplink_pallas_matches_xla():
    rng = np.random.RandomState(0)
    raw = _rand(rng, (2, 3, 16, L))
    mult = jnp.asarray(rng.rand(2, 16) + 0.5, jnp.float32)
    off = jnp.asarray(rng.randn(2, 16), jnp.float32)
    kern = _rand(rng, (2, 2, 2, 16, 8), jnp.float32)
    assert site_link_supported(16, 64, L, jnp.bfloat16)
    ref = qfused._transp_conv_quadrant_from_cf_xla(
        raw, mult, off, kern, Q, HQ, WQ)
    out = qfused.transp_conv_quadrant_from_cf(
        raw, mult, off, kern, Q, HQ, WQ, interpret=True)
    assert out.shape == ref.shape and out.dtype == ref.dtype
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=0.05, atol=0.05)


def test_uplink_grads_identical_to_xla():
    rng = np.random.RandomState(1)
    raw = _rand(rng, (1, 2, 8, L))
    mult = jnp.asarray(rng.rand(1, 8) + 0.5, jnp.float32)
    off = jnp.asarray(rng.randn(1, 8), jnp.float32)
    kern = _rand(rng, (2, 2, 2, 8, 8), jnp.float32)

    def loss_pallas(*args):
        y = qfused.transp_conv_quadrant_from_cf(*args, Q, HQ, WQ,
                                                interpret=True)
        return jnp.sum(y.astype(jnp.float32) ** 2)

    def loss_xla(*args):
        y = qfused._transp_conv_quadrant_from_cf_xla(*args, Q, HQ, WQ)
        return jnp.sum(y.astype(jnp.float32) ** 2)

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2, 3))(raw, mult, off, kern)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2, 3))(raw, mult, off, kern)
    # backward delegates to jax.vjp of the twin: bit-identical grads
    # except for the cotangent, which passes through the (bit-close)
    # pallas forward inside the loss
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=0.08, atol=0.08)


def test_downlink_pallas_matches_xla():
    rng = np.random.RandomState(2)
    C = 16
    x = _rand(rng, (2, 3, 8 * C, L))
    # mixed-sign mult exercises the max/min pick
    mult = jnp.asarray(rng.randn(2, C), jnp.float32)
    off = jnp.asarray(rng.randn(2, C), jnp.float32)
    ref = qfused._quadrant_block_max_cf_xla(x, mult, off, Q, HQ, WQ, C,
                                            WQP)
    out = qfused.quadrant_block_max_cf(x, mult, off, Q, HQ, WQ, C, WQP,
                                       interpret=True)
    assert out.shape == ref.shape and out.dtype == ref.dtype
    # FMA-vs-mul+add contraction differs between the interpret kernel and
    # the XLA fusion: agreement is to the last f32 ulp pre-cast, not bitwise
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=0.02, atol=2e-6)


def test_downlink_wp_mismatch_falls_back():
    rng = np.random.RandomState(3)
    C = 16
    x = _rand(rng, (1, 2, 8 * C, L))
    mult = jnp.asarray(rng.rand(1, C) + 0.5, jnp.float32)
    off = jnp.asarray(rng.randn(1, C), jnp.float32)
    ref = qfused._quadrant_block_max_cf_xla(x, mult, off, Q, HQ, WQ, C,
                                            WQP + 2)
    out = qfused.quadrant_block_max_cf(x, mult, off, Q, HQ, WQ, C,
                                       WQP + 2, interpret=True)
    # Wp mismatch => the XLA twin runs on both sides: bitwise equal
    np.testing.assert_array_equal(np.asarray(out, np.float32),
                                  np.asarray(ref, np.float32))


def test_downlink_grads_identical_to_xla():
    rng = np.random.RandomState(4)
    C = 8
    x = _rand(rng, (1, 2, 8 * C, L))
    mult = jnp.asarray(rng.randn(1, C), jnp.float32)
    off = jnp.asarray(rng.randn(1, C), jnp.float32)

    def loss(fn, *args):
        return jnp.sum(fn(*args).astype(jnp.float32) ** 2)

    gp = jax.grad(
        lambda *a: loss(lambda *b: qfused.quadrant_block_max_cf(
            *b, Q, HQ, WQ, C, WQP, interpret=True), *a),
        argnums=(0, 1, 2))(x, mult, off)
    gx = jax.grad(
        lambda *a: loss(lambda *b: qfused._quadrant_block_max_cf_xla(
            *b, Q, HQ, WQ, C, WQP), *a),
        argnums=(0, 1, 2))(x, mult, off)
    for a, b in zip(gp, gx):
        # backward delegates to the twin's vjp; residual FMA-contraction
        # noise in the forward cotangent bounds the diff at ulp level
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=0.02, atol=1e-5)


def test_seghead_pending_matches_materialized():
    rng = np.random.RandomState(5)
    C, K = 16, 8
    raw = _rand(rng, (2, 3, 8 * C, L))
    mult = jnp.asarray(rng.rand(2, C) + 0.5, jnp.float32)
    off = jnp.asarray(rng.randn(2, C), jnp.float32)
    w = jnp.asarray(rng.randn(C, K), jnp.float32)
    from e2enet_tpu.ops.qlink import seghead_quadrant

    def twin(raw, mult, off, w):
        xq = qfused.quadrant_apply_norm_lrelu(raw, mult, off)
        N, Dq, QC, Lx = xq.shape
        # production uses a bf16 einsum with f32 accumulation; the CPU
        # backend can't execute bf16 dots, so round to bf16 then upcast —
        # bf16 values are exact in f32, the accumulator is f32 either way
        xb = (xq.reshape(N, Dq, 8, C, Lx).astype(jnp.bfloat16)
              .astype(jnp.float32))
        wb = w.astype(jnp.bfloat16).astype(jnp.float32)
        y = jnp.einsum("ndqcl,ck->ndqkl", xb, wb,
                       preferred_element_type=jnp.float32)
        return y.reshape(N, Dq, 8 * K, Lx)

    ref = jax.jit(twin)(raw, mult, off, w)
    out = seghead_quadrant(raw, mult, off, w, 8, twin, interpret=True)
    assert out.shape == ref.shape and out.dtype == ref.dtype
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)

    def loss(fn):
        return jnp.sum(fn(raw, mult, off, w) ** 2)

    gp = jax.jit(jax.grad(lambda r, m, o, ww: jnp.sum(seghead_quadrant(
        r, m, o, ww, 8, twin, interpret=True) ** 2),
        argnums=(0, 1, 2, 3)))(raw, mult, off, w)
    gx = jax.jit(jax.grad(
        lambda r, m, o, ww: jnp.sum(twin(r, m, o, ww) ** 2),
        argnums=(0, 1, 2, 3)))(raw, mult, off, w)
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=1e-4, atol=1e-4)


def test_supported_gates():
    assert not site_link_supported(16, 64, 130, jnp.bfloat16)  # lanes
    assert not site_link_supported(12, 64, 128, jnp.bfloat16)  # sublanes
    assert not site_link_supported(16, 64, 128, jnp.float32)   # dtype


def test_seghead_probs_matches_twin():
    """Fused norm+1x1+softmax probs kernel (round-12): bf16 probs match
    the XLA composition (norm materialize -> block einsum -> softmax) to
    bf16 rounding, and the custom backward is the twin's vjp."""
    rng = np.random.RandomState(9)
    C, K = 16, 8
    raw = _rand(rng, (2, 3, 8 * C, L))
    mult = jnp.asarray(rng.rand(2, C) + 0.5, jnp.float32)
    off = jnp.asarray(rng.randn(2, C), jnp.float32)
    w = jnp.asarray(rng.randn(C, K), jnp.float32)
    from e2enet_tpu.ops.qlink import (seghead_probs_quadrant,
                                      seghead_probs_supported)
    assert seghead_probs_supported(8, C, K, L, jnp.bfloat16)

    def twin(raw, mult, off, w):
        xq = qfused.quadrant_apply_norm_lrelu(raw, mult, off)
        N, Dq, QC, Lx = xq.shape
        xb = (xq.reshape(N, Dq, 8, C, Lx).astype(jnp.bfloat16)
              .astype(jnp.float32))
        wb = w.astype(jnp.bfloat16).astype(jnp.float32)
        y = jnp.einsum("ndqcl,ck->ndqkl", xb, wb,
                       preferred_element_type=jnp.float32)
        p = jax.nn.softmax(y, axis=3)
        return p.reshape(N, Dq, 8 * K, Lx).astype(jnp.bfloat16)

    ref = jax.jit(twin)(raw, mult, off, w)
    out = seghead_probs_quadrant(raw, mult, off, w, 8, twin,
                                 interpret=True)
    assert out.shape == ref.shape and out.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=0, atol=1.6e-2)
    # probs are a distribution per block
    s = np.asarray(out, np.float32).reshape(2, 3, 8, K, L).sum(3)
    np.testing.assert_allclose(s, 1.0, atol=2e-2)

    gp = jax.jit(jax.grad(lambda r, m, o, ww: jnp.sum(
        seghead_probs_quadrant(r, m, o, ww, 8, twin,
                               interpret=True).astype(jnp.float32) ** 2),
        argnums=(1, 2, 3)))(raw, mult, off, w)
    gx = jax.jit(jax.grad(lambda r, m, o, ww: jnp.sum(
        twin(r, m, o, ww).astype(jnp.float32) ** 2),
        argnums=(1, 2, 3)))(raw, mult, off, w)
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=1e-4, atol=1e-4)


def test_seghead_probs_model_path_matches_logits_path():
    """ShiftUNetPlusPlus head_probs_dtype=bf16: the flip-free predictor's
    prob sums match the exact f32-logits path to bf16 tolerance (CPU:
    the model takes the XLA-twin branch; the contract — probs out, no
    second softmax — is what this pins)."""
    from e2enet_tpu.models.unetpp import ShiftUNetPlusPlus
    from e2enet_tpu.ops.qfused import quadrant_softmax_f32
    kw = dict(input_channels=1, num_classes=3,
              pool_op_kernel_sizes=((2, 2, 2), (2, 2, 2)),
              base_num_features=4, compute_dtype=jnp.float32, remat=False,
              fused=True, fused_interpret=True, quadrant=True,
              quadrant_logits=True)
    m_logits = ShiftUNetPlusPlus(**kw)
    m_probs = ShiftUNetPlusPlus(head_probs_dtype=jnp.bfloat16, **kw)
    x = jnp.asarray(np.random.RandomState(0).randn(1, 4, 8, 16, 1),
                    jnp.float32)
    params = m_logits.init(jax.random.PRNGKey(0), x)
    lq = m_logits.apply(params, x, do_ds=False)
    assert lq.ndim == 4 and lq.dtype == jnp.float32
    p_ref = quadrant_softmax_f32(lq, (2, 2, 2), 3)
    p = m_probs.apply(params, x, do_ds=False)
    assert p.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(p, np.float32),
                               np.asarray(p_ref), rtol=0, atol=1.6e-2)
