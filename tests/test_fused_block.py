"""Fused channels-first shift-conv block (ops/fused_block.py) vs the
channels-last XLA oracle (ops/shift.depth_shift + ops/blocks.conv3d_as_2d +
instance_norm + lrelu). Runs the Pallas kernel in interpret mode on CPU."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from e2enet_tpu.ops import blocks
from e2enet_tpu.ops.fused_block import (apply_norm_lrelu_cf, choose_wp,
                                        from_padded_cf, fused_shift_conv_block,
                                        norm_affine_from_stats, to_padded_cf)
from e2enet_tpu.ops.shift import depth_shift


def _mk(key, shape, dtype=jnp.float32):
    return jax.random.normal(key, shape, jnp.float32).astype(dtype)


def _oracle_shift_conv(x_cl, wk, b):
    return blocks.conv3d_as_2d(depth_shift(x_cl, 5), wk, b, (1, 1, 1),
                               compute_dtype=x_cl.dtype)


@pytest.mark.parametrize("C,CO", [(8, 6), (1, 5)])
def test_fused_single_part(C, CO):
    N, D, H, W = 2, 6, 8, 13          # W=13 -> Wp padding exercised
    Wp = choose_wp(H, W)
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    x = _mk(ks[0], (N, D, H, W, C))
    wk = _mk(ks[1], (3, 3, C, CO)) * 0.3
    b = _mk(ks[2], (CO,)) * 0.1

    ref = _oracle_shift_conv(x, wk, b)

    x_cf = to_padded_cf(x, W, Wp)
    y, stats = fused_shift_conv_block([x_cf], wk, b, [None], H, W,
                                      interpret=True)
    y_cl = from_padded_cf(y, H, W)
    np.testing.assert_allclose(np.asarray(y_cl), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
    # stats are sums over valid voxels of the f32 accumulator
    yf = np.asarray(y_cl, np.float64)
    np.testing.assert_allclose(np.asarray(stats[..., 0]),
                               yf.sum((1, 2, 3)), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(stats[..., 1]),
                               (yf ** 2).sum((1, 2, 3)), rtol=1e-4,
                               atol=1e-4)


def test_fused_multipart_matches_concat():
    """conv(shift(concat(parts))) without materializing the concat; shift
    group boundaries computed on the total channel count."""
    N, D, H, W, CO = 1, 5, 8, 16, 7
    Wp = choose_wp(H, W)
    ks = jax.random.split(jax.random.PRNGKey(1), 4)
    a = _mk(ks[0], (N, D, H, W, 5))
    c = _mk(ks[1], (N, D, H, W, 3))
    wk = _mk(ks[2], (3, 3, 8, CO)) * 0.3
    b = _mk(ks[3], (CO,)) * 0.1

    ref = _oracle_shift_conv(jnp.concatenate([a, c], -1), wk, b)

    parts = [to_padded_cf(a, W, Wp), to_padded_cf(c, W, Wp)]
    y, _ = fused_shift_conv_block(parts, wk, b, [None, None], H, W,
                                  interpret=True)
    np.testing.assert_allclose(np.asarray(from_padded_cf(y, H, W)),
                               np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_fused_block_chain_with_onload_norm():
    """Two chained fused blocks where block 2 applies block 1's instance
    norm + lrelu ON LOAD == the channels-last block chain."""
    N, D, H, W, C = 2, 6, 8, 16, 6
    Wp = choose_wp(H, W)
    ks = jax.random.split(jax.random.PRNGKey(2), 6)
    x = _mk(ks[0], (N, D, H, W, C))
    w1 = _mk(ks[1], (3, 3, C, C)) * 0.3
    b1 = _mk(ks[2], (C,)) * 0.1
    w2 = _mk(ks[3], (3, 3, C, C)) * 0.3
    b2 = _mk(ks[4], (C,)) * 0.1
    gamma = 1.0 + 0.1 * _mk(ks[5], (C,))
    beta = 0.05 * _mk(ks[5], (C,))

    # ---- channels-last oracle chain
    y1 = _oracle_shift_conv(x, w1, b1)
    y1n = blocks.leaky_relu(blocks.instance_norm(y1, gamma, beta))
    ref = _oracle_shift_conv(y1n, w2, b2)

    # ---- fused chain (normalized tensor never materialized)
    x_cf = to_padded_cf(x, W, Wp)
    r1, st1 = fused_shift_conv_block([x_cf], w1, b1, [None], H, W,
                                     interpret=True)
    mult, off = norm_affine_from_stats(st1, D * H * W, gamma, beta)
    r2, _ = fused_shift_conv_block([r1], w2, b2, [(mult, off)], H, W,
                                   interpret=True)
    np.testing.assert_allclose(np.asarray(from_padded_cf(r2, H, W)),
                               np.asarray(ref), rtol=2e-4, atol=2e-4)

    # materialization helper agrees with the oracle's normalized tensor
    lane = np.arange(H * Wp) % Wp
    colmask = jnp.asarray((lane < W).astype(np.float32))
    mat = apply_norm_lrelu_cf(r1, mult, off, colmask)
    np.testing.assert_allclose(np.asarray(from_padded_cf(mat, H, W)),
                               np.asarray(y1n), rtol=2e-4, atol=2e-4)


def test_fused_grad_matches_oracle():
    """The custom VJP (XLA-reference backward) == autodiff through the
    channels-last oracle, including the stats -> affine path."""
    N, D, H, W, C = 1, 4, 4, 5, 4
    Wp = choose_wp(H, W)
    ks = jax.random.split(jax.random.PRNGKey(3), 5)
    x = _mk(ks[0], (N, D, H, W, C))
    w1 = _mk(ks[1], (3, 3, C, C)) * 0.3
    b1 = _mk(ks[2], (C,)) * 0.1
    w2 = _mk(ks[3], (3, 3, C, C)) * 0.3
    b2 = _mk(ks[4], (C,)) * 0.1
    gamma = jnp.ones((C,))
    beta = jnp.zeros((C,))

    def loss_oracle(w1_, w2_, x_):
        y1 = _oracle_shift_conv(x_, w1_, b1)
        y1n = blocks.leaky_relu(blocks.instance_norm(y1, gamma, beta))
        y2 = _oracle_shift_conv(y1n, w2_, b2)
        return jnp.sum(y2 * y2)

    def loss_fused(w1_, w2_, x_):
        x_cf = to_padded_cf(x_, W, Wp)
        r1, st1 = fused_shift_conv_block([x_cf], w1_, b1, [None], H, W,
                                         interpret=True)
        mult, off = norm_affine_from_stats(st1, D * H * W, gamma, beta)
        r2, _ = fused_shift_conv_block([r1], w2_, b2, [(mult, off)], H, W,
                                       interpret=True)
        y2 = from_padded_cf(r2, H, W)
        return jnp.sum(y2 * y2)

    g_ref = jax.grad(loss_oracle, argnums=(0, 1, 2))(w1, w2, x)
    g_fus = jax.grad(loss_fused, argnums=(0, 1, 2))(w1, w2, x)
    for a, b_ in zip(g_ref, g_fus):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                   rtol=5e-3, atol=5e-4)


def test_model_fused_matches_xla_path():
    """ShiftUNetPlusPlus(fused=True, interpret) == the XLA path, same
    params. Shapes chosen so BOTH level 0 and level 1 run fused (level-1
    nodes exercise the 3-part down-link path)."""
    from e2enet_tpu.models.unetpp import ShiftUNetPlusPlus

    kw = dict(input_channels=1, num_classes=3,
              pool_op_kernel_sizes=((2, 2, 2), (2, 2, 2)),
              base_num_features=4, compute_dtype=jnp.float32, remat=False)
    m_ref = ShiftUNetPlusPlus(**kw)
    m_fus = ShiftUNetPlusPlus(**kw, fused=True, fused_interpret=True,
                              quadrant=False)

    x = _mk(jax.random.PRNGKey(5), (1, 8, 8, 16, 1))
    params = m_ref.init(jax.random.PRNGKey(6), x)
    # identical parameter trees (checkpoint interop)
    p2 = m_fus.init(jax.random.PRNGKey(6), x)
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(p2))

    outs_ref = m_ref.apply(params, x)
    outs_fus = m_fus.apply(params, x)
    assert len(outs_ref) == len(outs_fus)
    for a, b in zip(outs_ref, outs_fus):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-3, atol=5e-4)


def test_model_fused_grad_matches():
    """Gradients through the fused model (XLA-reference VJP + remat) match
    the standard path."""
    from e2enet_tpu.models.unetpp import ShiftUNetPlusPlus

    kw = dict(input_channels=1, num_classes=2,
              pool_op_kernel_sizes=((2, 2, 2),),
              base_num_features=4, compute_dtype=jnp.float32, remat=True)
    m_ref = ShiftUNetPlusPlus(**kw)
    m_fus = ShiftUNetPlusPlus(**kw, fused=True, fused_interpret=True,
                              quadrant=False)
    x = _mk(jax.random.PRNGKey(7), (1, 4, 8, 16, 1))
    params = m_ref.init(jax.random.PRNGKey(8), x)

    def loss(m):
        def f(p):
            outs = m.apply(p, x)
            return sum(jnp.sum(o * o) for o in outs)
        return f

    g_ref = jax.grad(loss(m_ref))(params)
    g_fus = jax.grad(loss(m_fus))(params)
    flat_r, _ = jax.tree_util.tree_flatten(g_ref)
    flat_f, _ = jax.tree_util.tree_flatten(g_fus)
    for a, b in zip(flat_r, flat_f):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-2, atol=1e-3)


def test_xla_reference_path_matches():
    """use_pallas=False (the pure-XLA fallback) equals the kernel."""
    N, D, H, W, C, CO = 1, 5, 8, 16, 6, 4
    Wp = choose_wp(H, W)
    ks = jax.random.split(jax.random.PRNGKey(4), 3)
    x = to_padded_cf(_mk(ks[0], (N, D, H, W, C)), W, Wp)
    wk = _mk(ks[1], (3, 3, C, CO)) * 0.3
    b = _mk(ks[2], (CO,)) * 0.1
    y1, s1 = fused_shift_conv_block([x], wk, b, [None], H, W,
                                    interpret=True)
    y2, s2 = fused_shift_conv_block([x], wk, b, [None], H, W,
                                    use_pallas=False)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), rtol=2e-5,
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-4,
                               atol=1e-4)
