"""Quadrant (space-to-depth) fused block (ops/qfused.py): table invariants,
layout round-trips, forward parity vs the channels-last oracle, and gradient
parity of the Pallas backward (interpret mode) vs autodiff of the XLA
reference."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from e2enet_tpu.ops import blocks, qfused
from e2enet_tpu.ops.qfused import (QStatic, choose_wqp, from_quadrant_cf,
                                   make_tables, quadrant_block_max_cl,
                                   quadrant_fused_block, quadrant_norm_affine,
                                   to_quadrant_cf, transp_conv_quadrant)
from e2enet_tpu.ops.shift import depth_shift, group_shifts

QS = [(2, 2, 2), (1, 2, 2), (2, 1, 1), (2, 2, 1)]


def _mk(key, shape, scale=1.0):
    return jax.random.normal(key, shape, jnp.float32) * scale


def _static(q, parts, affine, C_tot, shape, CO, shift=True, stats=True):
    D, H, W = shape
    qd, qh, qw = q
    Hq, Wq = H // qh, W // qw
    Wqp = choose_wqp(Hq, Wq)
    groups = (tuple(group_shifts(C_tot, 5)) if shift else ((0, C_tot, 0),))
    return QStatic(q, tuple(parts), tuple(affine), groups, D // qd,
                   Hq, Wq, Wqp, CO, stats, True)


@pytest.mark.parametrize("q", QS)
def test_tables_invariants(q):
    s = _static(q, (5, 3), (True, False), 8, (4, 8, 8), 6)
    t = make_tables(s)
    Q = q[0] * q[1] * q[2]
    C_tot = 8
    # FLOPs preserved: sum of dot K == Q blocks x 9 taps x C_tot
    sumK = sum(e.k_hi - e.k_lo for _, dots in t.out_dots for e in dots)
    assert sumK == Q * 9 * C_tot
    assert t.w_index.shape == (sumK,)
    # every sref row assembled exactly once
    rows = sorted((e.dst_lo, e.dst_lo + e.src_hi - e.src_lo)
                  for e in t.copies)
    cur = 0
    for lo, hi in rows:
        assert lo == cur
        cur = hi
    assert cur == Q * C_tot
    # every physical source row read exactly once per part
    for p, cp in enumerate(s.part_channels):
        src = sorted((e.src_lo, e.src_hi) for e in t.copies if e.part == p)
        cur = 0
        for lo, hi in src:
            assert lo == cur
            cur = hi
        assert cur == Q * cp
    # wgrad taps accumulate LOGICAL weight rows: every (dh, dw) run gets
    # contributions from all Q blocks, with exactly one initializing writer
    n_taps = 0
    firsts = []
    for slab_copies, taps in t.wgrad_blocks:
        for off, w_lo, out_lo, first in taps:
            assert w_lo % C_tot == 0 and 0 <= w_lo < 9 * C_tot
            n_taps += 1
            if first:
                firsts.append(w_lo)
    assert n_taps == Q * 9
    assert sorted(firsts) == [i * C_tot for i in range(9)]
    assert t.max_dd <= (1 if q[0] == 2 else 2)


@pytest.mark.parametrize("q", QS)
def test_quadrant_roundtrip(q):
    x = _mk(jax.random.PRNGKey(0), (2, 4, 8, 6, 5))
    Wqp = choose_wqp(8 // q[1], 6 // q[2])
    xq = to_quadrant_cf(x, q, Wqp)
    back = from_quadrant_cf(xq, q, 8 // q[1], 6 // q[2], 5)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def _oracle_cl(x_cl, wk, b, shift=True):
    if shift:
        x_cl = depth_shift(x_cl, 5)
    return blocks.conv3d_as_2d(x_cl, wk, b, (1, 1, 1),
                               compute_dtype=x_cl.dtype)


@pytest.mark.parametrize("q", QS)
@pytest.mark.parametrize("shift", [True, False])
def test_fwd_single_part(q, shift):
    N, D, H, W, C, CO = 2, 4, 8, 6, 5, 4
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    x = _mk(ks[0], (N, D, H, W, C))
    wk = _mk(ks[1], (3, 3, C, CO), 0.3)
    b = _mk(ks[2], (CO,), 0.1)
    ref = _oracle_cl(x, wk, b, shift)

    Hq, Wq = H // q[1], W // q[2]
    Wqp = choose_wqp(Hq, Wq)
    xq = to_quadrant_cf(x, q, Wqp)
    y, stats = quadrant_fused_block([xq], wk, b, [None], q, Hq, Wq,
                                    do_shift=shift, interpret=True)
    y_cl = from_quadrant_cf(y, q, Hq, Wq, CO)
    np.testing.assert_allclose(np.asarray(y_cl), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
    yf = np.asarray(y_cl, np.float64)
    Q = q[0] * q[1] * q[2]
    s_log = np.asarray(stats).reshape(N, Q, CO, 2).sum(1)
    np.testing.assert_allclose(s_log[..., 0], yf.sum((1, 2, 3)),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(s_log[..., 1], (yf ** 2).sum((1, 2, 3)),
                               rtol=1e-4, atol=1e-4)


def test_fwd_multipart_affine():
    """Two parts (one pending-norm affine, one raw) == concat oracle with
    the affine+lrelu pre-applied; C=1 second part exercises tiny parts."""
    q = (2, 2, 2)
    N, D, H, W, CO = 2, 4, 8, 6, 7
    ks = jax.random.split(jax.random.PRNGKey(2), 6)
    xa = _mk(ks[0], (N, D, H, W, 5))
    xb = _mk(ks[1], (N, D, H, W, 1))
    wk = _mk(ks[2], (3, 3, 6, CO), 0.3)
    b = _mk(ks[3], (CO,), 0.1)
    mult = _mk(ks[4], (N, 5), 0.5) + 1.0
    off = _mk(ks[5], (N, 5), 0.2)

    an = xa * mult[:, None, None, None, :] + off[:, None, None, None, :]
    an = jnp.maximum(an, an * 0.01)
    ref = _oracle_cl(jnp.concatenate([an, xb], -1), wk, b)

    Hq, Wq = H // 2, W // 2
    Wqp = choose_wqp(Hq, Wq)
    parts = [to_quadrant_cf(xa, q, Wqp), to_quadrant_cf(xb, q, Wqp)]
    y, _ = quadrant_fused_block(parts, wk, b, [(mult, off), None],
                                q, Hq, Wq, interpret=True)
    np.testing.assert_allclose(np.asarray(from_quadrant_cf(y, q, Hq, Wq, CO)),
                               np.asarray(ref), rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("q", [(2, 2, 2), (1, 2, 2)])
def test_backward_matches_xla_reference(q):
    """Full gradient parity (parts, kernel, bias, affines) between the
    Pallas backward kernel (interpret) and autodiff of the XLA reference,
    with nonzero cotangents on BOTH outputs (y and stats)."""
    N, D, H, W, CO = 2, 4, 8, 6, 4
    Ca, Cb = 5, 3
    ks = jax.random.split(jax.random.PRNGKey(3), 8)
    xa = _mk(ks[0], (N, D, H, W, Ca))
    xb = _mk(ks[1], (N, D, H, W, Cb))
    wk = _mk(ks[2], (3, 3, Ca + Cb, CO), 0.3)
    b = _mk(ks[3], (CO,), 0.1)
    mult = _mk(ks[4], (N, Ca), 0.5) + 1.0
    off = _mk(ks[5], (N, Ca), 0.2)

    Hq, Wq = H // q[1], W // q[2]
    Wqp = choose_wqp(Hq, Wq)
    pa = to_quadrant_cf(xa, q, Wqp)
    pb = to_quadrant_cf(xb, q, Wqp)
    Q = q[0] * q[1] * q[2]
    r1 = _mk(ks[6], (N, D // q[0], Q * CO, Hq * Wqp))
    r2 = _mk(ks[7], (N, Q * CO, 2), 0.01)

    def loss(use_pallas, pa, pb, wk, b, mult, off):
        y, stats = quadrant_fused_block(
            [pa, pb], wk, b, [(mult, off), None], q, Hq, Wq,
            use_pallas=use_pallas, interpret=True)
        return jnp.sum(y.astype(jnp.float32) * r1) + jnp.sum(stats * r2)

    args = (pa, pb, wk, b, mult, off)
    g_ref = jax.grad(lambda *a: loss(False, *a), argnums=tuple(range(6)))(
        *args)
    g_pal = jax.grad(lambda *a: loss(True, *a), argnums=tuple(range(6)))(
        *args)
    names = ["pa", "pb", "wk", "b", "mult", "off"]
    for nm, gr, gp in zip(names, g_ref, g_pal):
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gr),
                                   rtol=2e-4, atol=2e-4, err_msg=nm)


@pytest.mark.parametrize("q", [(2, 2, 2), (1, 2, 2)])
def test_backward_chunked_matches_xla_reference(q, monkeypatch):
    """Gradient parity with the backward FORCED onto the per-part chunked
    path (_qfused_bwd splits when the unified kernel exceeds the VMEM
    budget — the production case for 2-part level-0 nest nodes)."""
    from e2enet_tpu.ops import qfused as QF
    N, D, H, W, CO = 2, 4, 8, 6, 4
    Ca, Cb = 5, 3
    ks = jax.random.split(jax.random.PRNGKey(7), 8)
    xa = _mk(ks[0], (N, D, H, W, Ca))
    xb = _mk(ks[1], (N, D, H, W, Cb))
    wk = _mk(ks[2], (3, 3, Ca + Cb, CO), 0.3)
    b = _mk(ks[3], (CO,), 0.1)
    mult = _mk(ks[4], (N, Ca), 0.5) + 1.0
    off = _mk(ks[5], (N, Ca), 0.2)

    Hq, Wq = H // q[1], W // q[2]
    Wqp = choose_wqp(Hq, Wq)
    pa = to_quadrant_cf(xa, q, Wqp)
    pb = to_quadrant_cf(xb, q, Wqp)
    Q = q[0] * q[1] * q[2]
    r1 = _mk(ks[6], (N, D // q[0], Q * CO, Hq * Wqp))
    r2 = _mk(ks[7], (N, Q * CO, 2), 0.01)

    # budget above the single-part footprint but below the unified one ->
    # the bwd must run as two chunks
    uni = QF._bwd_vmem_bytes(q, (Ca, Cb), Hq, Wq, CO)
    solo = max(QF._bwd_vmem_bytes(q, (c,), Hq, Wq, CO) for c in (Ca, Cb))
    assert solo < uni
    monkeypatch.setattr(QF, "_VMEM_BUDGET", (solo + uni) // 2)
    assert QF._bwd_chunks(q, (Ca, Cb), Hq, Wq, CO) == [(0, 1), (1, 2)]

    def loss(use_pallas, pa, pb, wk, b, mult, off):
        y, stats = quadrant_fused_block(
            [pa, pb], wk, b, [(mult, off), None], q, Hq, Wq,
            use_pallas=use_pallas, interpret=True)
        return jnp.sum(y.astype(jnp.float32) * r1) + jnp.sum(stats * r2)

    args = (pa, pb, wk, b, mult, off)
    g_ref = jax.grad(lambda *a: loss(False, *a), argnums=tuple(range(6)))(
        *args)
    g_pal = jax.grad(lambda *a: loss(True, *a), argnums=tuple(range(6)))(
        *args)
    names = ["pa", "pb", "wk", "b", "mult", "off"]
    for nm, gr, gp in zip(names, g_ref, g_pal):
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gr),
                                   rtol=2e-4, atol=2e-4, err_msg=nm)


def test_transp_conv_quadrant_matches_matmul():
    from e2enet_tpu.ops.blocks import transp_conv_matmul
    q = (2, 2, 2)
    N, Dq, Hq, Wq, Cin, Cout = 2, 3, 4, 6, 5, 4
    ks = jax.random.split(jax.random.PRNGKey(4), 2)
    x = _mk(ks[0], (N, Dq, Hq, Wq, Cin))
    k = _mk(ks[1], (2, 2, 2, Cin, Cout), 0.3)
    ref = transp_conv_matmul(x, k, (2, 2, 2), compute_dtype=jnp.float32)
    Wqp = choose_wqp(Hq, Wq)
    yq = transp_conv_quadrant(x, k, q, Wqp, compute_dtype=jnp.float32)
    np.testing.assert_allclose(
        np.asarray(from_quadrant_cf(yq, q, Hq, Wq, Cout)),
        np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_block_max_and_norm_affine():
    """Down-link: pending-norm apply + block max == channels-last
    instance-norm + lrelu + max_pool; norm affine folded from per-physical-
    row stats == logical instance norm."""
    q = (2, 2, 2)
    N, D, H, W, C = 2, 4, 8, 6, 5
    x = _mk(jax.random.PRNGKey(5), (N, D, H, W, C))
    scale = _mk(jax.random.PRNGKey(6), (C,), 0.3) + 1.0
    nbias = _mk(jax.random.PRNGKey(7), (C,), 0.2)

    ref_norm = blocks.instance_norm(x, scale, nbias)
    ref = blocks.max_pool(blocks.leaky_relu(ref_norm), q)

    Hq, Wq = H // 2, W // 2
    Wqp = choose_wqp(Hq, Wq)
    xq = to_quadrant_cf(x, q, Wqp)
    cm = qfused.quadrant_colmask(Hq, Wq, Wqp)
    xf = xq.astype(jnp.float32) * cm
    s1 = jnp.sum(xf, axis=(1, 3))
    s2 = jnp.sum(xf * xf, axis=(1, 3))
    stats = jnp.stack([s1, s2], -1)                      # (N, Q*C, 2)
    mult, off = quadrant_norm_affine(stats, 8, D * H * W, scale, nbias)
    got = quadrant_block_max_cl(xq, mult, off, q, Hq, Wq, C)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_model_quadrant_matches_xla_path():
    """ShiftUNetPlusPlus(fused + quadrant, interpret) == the XLA path with
    identical params (checkpoint interop): level 0 runs the quadrant
    kernels, level 1 the round-2 fused kernels."""
    from e2enet_tpu.models.unetpp import ShiftUNetPlusPlus

    kw = dict(input_channels=1, num_classes=3,
              pool_op_kernel_sizes=((2, 2, 2), (2, 2, 2)),
              base_num_features=4, compute_dtype=jnp.float32, remat=False)
    m_ref = ShiftUNetPlusPlus(**kw, quadrant=False)
    m_q = ShiftUNetPlusPlus(**kw, fused=True, fused_interpret=True,
                            quadrant=True)

    x = _mk(jax.random.PRNGKey(10), (1, 8, 8, 16, 1))
    params = m_ref.init(jax.random.PRNGKey(11), x)
    p2 = m_q.init(jax.random.PRNGKey(11), x)
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(p2))

    outs_ref = m_ref.apply(params, x)
    outs_q = m_q.apply(params, x)
    assert len(outs_ref) == len(outs_q)
    for a, b in zip(outs_ref, outs_q):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-3, atol=5e-4)


def test_model_quadrant_grad_matches():
    """Gradients through the quadrant model (Pallas bwd kernels in
    interpret mode + up-link remat) match the standard XLA path."""
    from e2enet_tpu.models.unetpp import ShiftUNetPlusPlus

    kw = dict(input_channels=1, num_classes=2,
              pool_op_kernel_sizes=((2, 2, 2),),
              base_num_features=4, compute_dtype=jnp.float32, remat=True)
    m_ref = ShiftUNetPlusPlus(**kw, quadrant=False)
    m_q = ShiftUNetPlusPlus(**kw, fused=True, fused_interpret=True,
                            quadrant=True)
    x = _mk(jax.random.PRNGKey(12), (1, 4, 8, 16, 1))
    params = m_ref.init(jax.random.PRNGKey(13), x)

    def loss(m):
        def f(p):
            outs = m.apply(p, x)
            return sum(jnp.sum(o * o) for o in outs)
        return f

    g_ref = jax.grad(loss(m_ref))(params)
    g_q = jax.grad(loss(m_q))(params)
    flat_r, _ = jax.tree_util.tree_flatten(g_ref)
    flat_q, _ = jax.tree_util.tree_flatten(g_q)
    for a, b in zip(flat_r, flat_q):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-2, atol=1e-3)


def test_quadrant_flip_matches_true_flip():
    """quadrant_flip on the quadrant tensor == flip in true space."""
    from e2enet_tpu.ops.qfused import (from_quadrant_cf, quadrant_flip,
                                       to_quadrant_cf)
    rng = np.random.RandomState(0)
    q = (2, 2, 2)
    N, D, H, W, C = 1, 4, 6, 10, 3
    Hq, Wq = H // 2, W // 2
    Wqp = Wq + 3
    x = jnp.asarray(rng.randn(N, D, H, W, C).astype(np.float32))
    xq = to_quadrant_cf(x, q, Wqp)
    for combo in [(), (0,), (1,), (2,), (0, 2), (0, 1, 2)]:
        fq = quadrant_flip(xq, q, Hq, Wq, combo)
        back = from_quadrant_cf(fq, q, Hq, Wq, C)
        ref = jnp.flip(x, axis=tuple(a + 1 for a in combo)) if combo else x
        np.testing.assert_allclose(np.asarray(back), np.asarray(ref))


def test_quadrant_softmax_matches():
    from e2enet_tpu.ops.qfused import (from_quadrant_cf,
                                       quadrant_softmax_f32, to_quadrant_cf)
    rng = np.random.RandomState(1)
    q = (2, 2, 2)
    N, D, H, W, C = 1, 4, 6, 10, 5
    Hq, Wq = H // 2, W // 2
    Wqp = Wq + 3
    x = jnp.asarray(rng.randn(N, D, H, W, C).astype(np.float32))
    xq = to_quadrant_cf(x, q, Wqp)
    sq = quadrant_softmax_f32(xq, q, C)
    back = from_quadrant_cf(sq, q, Hq, Wq, C)
    ref = jax.nn.softmax(x, axis=-1)
    np.testing.assert_allclose(np.asarray(back), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_sliding_with_quadrant_logits_matches_plain():
    """The quadrant-logits sliding path (unflip+softmax in quadrant space,
    de-quadrantize per tile) == the plain path, exact."""
    from e2enet_tpu.models.unetpp import ShiftUNetPlusPlus
    from e2enet_tpu.ops.sliding import (make_tiled_predictor,
                                        predict_volume_tiled)
    kw = dict(input_channels=1, num_classes=3,
              pool_op_kernel_sizes=((2, 2, 2), (2, 2, 2)),
              base_num_features=4, compute_dtype=jnp.float32, remat=False,
              fused=True, fused_interpret=True, quadrant=True)
    patch = (4, 8, 16)
    m_plain = ShiftUNetPlusPlus(**kw)
    m_q = ShiftUNetPlusPlus(**kw, quadrant_logits=True)
    x0 = jnp.zeros((1, *patch, 1), jnp.float32)
    params = m_plain.init(jax.random.PRNGKey(0), x0)
    # sanity: the quadrant_logits model emits rank-4 on do_ds=False
    out = m_q.apply(params, x0, do_ds=False)
    assert out.ndim == 4, out.shape

    vol = np.random.RandomState(2).randn(1, 6, 12, 24).astype(np.float32)
    apply_plain = lambda p, x: m_plain.apply(p, x, do_ds=False)
    apply_q = lambda p, x: m_q.apply(p, x, do_ds=False)
    qmeta = ((2, 2, 2), patch[1] // 2, patch[2] // 2)
    pred_plain = make_tiled_predictor(apply_plain, patch, 3)
    pred_q = make_tiled_predictor(apply_q, patch, 3, quadrant_meta=qmeta)
    probs_plain = predict_volume_tiled(apply_plain, params, vol, patch, 3,
                                       predictor=pred_plain)
    probs_q = predict_volume_tiled(apply_q, params, vol, patch, 3,
                                   predictor=pred_q)
    np.testing.assert_allclose(np.asarray(probs_q),
                               np.asarray(probs_plain),
                               rtol=1e-5, atol=1e-6)

    # quadrant_input: the predictor quadrantizes per TILE and mirrors the
    # input in quadrant space (rank-4 model input) — must match exactly
    m_qi = ShiftUNetPlusPlus(**kw, quadrant_logits=True,
                             quadrant_input=patch)
    apply_qi = lambda p, x: m_qi.apply(p, x, do_ds=False)
    pred_qi = make_tiled_predictor(apply_qi, patch, 3, quadrant_meta=qmeta)
    probs_qi = predict_volume_tiled(apply_qi, params, vol, patch, 3,
                                    predictor=pred_qi)
    np.testing.assert_allclose(np.asarray(probs_qi),
                               np.asarray(probs_plain),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("q", QS)
@pytest.mark.parametrize("shift", [True, False])
def test_quadrant_strided_shift_conv_matches(q, shift):
    """The quadrant-native encoder transition (block-algebra depth shift +
    strided (1,3,3) conv, ops/qfused.quadrant_strided_shift_conv) == the
    full-res oracle depth_shift -> strided conv, and its stats match the
    direct sums."""
    D, H, W, C, CO = 8, 8, 8, 7, 6
    k0, k1, k2, k3 = jax.random.split(jax.random.PRNGKey(11), 4)
    x = _mk(k0, (2, D, H, W, C))
    kern = _mk(k1, (3, 3, C, CO), 0.3)
    bias = _mk(k2, (CO,), 0.2)
    qd, qh, qw = q
    Hq, Wq = H // qh, W // qw
    Wqp = choose_wqp(Hq, Wq)

    xs = depth_shift(x, 5) if shift else x
    y_ref = blocks.conv3d_one_flat(xs, kern, bias, q, 0, jnp.float32)
    # keep only the strided-output geometry (D//qd, H//qh, W//qw)
    assert y_ref.shape == (2, D // qd, Hq, Wq, CO)

    xq = to_quadrant_cf(x, q, Wqp)
    Wp_out = Wqp + qw           # exercise the output re-pad too
    y, stats = qfused.quadrant_strided_shift_conv(
        xq, kern, bias, q, Hq, Wq, Wp_out, do_shift=shift,
        compute_dtype=jnp.float32)
    assert y.shape == (2, D // qd, CO, Hq * Wp_out)
    got = y.reshape(2, D // qd, CO, Hq, Wp_out)[..., :Wq]
    got = jnp.transpose(got, (0, 1, 3, 4, 2))
    np.testing.assert_allclose(np.asarray(got), np.asarray(y_ref),
                               rtol=2e-5, atol=2e-5)
    # padding columns zero
    padcols = np.asarray(y.reshape(2, D // qd, CO, Hq, Wp_out)[..., Wq:])
    assert np.all(padcols == 0)
    # stats = [sum, sumsq] over valid voxels, f32
    yf = np.asarray(y_ref, np.float32)
    np.testing.assert_allclose(np.asarray(stats[..., 0]),
                               yf.sum((1, 2, 3)), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(stats[..., 1]),
                               (yf * yf).sum((1, 2, 3)), rtol=1e-4,
                               atol=1e-4)


@pytest.mark.parametrize("q", QS)
def test_quadrant_flip_cf_primitives(q):
    """The flat-layout flip primitives (d / combined-hw / w-only) == flips
    in true space (valid region; padding lanes are allowed to differ)."""
    from e2enet_tpu.ops.qfused import (quadrant_flip_d_cf,
                                       quadrant_flip_hw_cf,
                                       quadrant_flip_w_cf)
    D, H, W, C = 8, 8, 8, 3
    qd, qh, qw = q
    Hq, Wq = H // qh, W // qw
    Wqp = choose_wqp(Hq, Wq)
    x = _mk(jax.random.PRNGKey(21), (2, D, H, W, C))
    xq = to_quadrant_cf(x, q, Wqp)

    for fn, axes in ((lambda t: quadrant_flip_d_cf(t, q), (1,)),
                     (lambda t: quadrant_flip_hw_cf(t, q, Hq, Wq), (2, 3)),
                     (lambda t: quadrant_flip_w_cf(t, q, Hq, Wq), (3,))):
        got = from_quadrant_cf(fn(xq), q, Hq, Wq, C)
        ref = jnp.flip(x, axis=axes)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_lazy_up_matches_materialized():
    """quadrant_fused_block with a LazyUp part (up-link GEMM computed on
    DMA arrival inside the kernel, interpret mode) == the dense path on
    the materialized up-link tensor; grads close (the lazy backward
    rematerializes u via the XLA twin)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from e2enet_tpu.ops.qfused import (LazyUp, quadrant_fused_block,
                                       transp_conv_quadrant_from_cf)

    q = (2, 2, 2)
    Q = 8
    Hq, Wq, Wqp = 8, 15, 16
    L = Hq * Wqp
    N, Dq = 1, 4
    C_same, cin, C_up, CO = 8, 16, 8, 8
    rng = np.random.RandomState(7)

    def bf(shape):
        return jnp.asarray(rng.randn(*shape), jnp.float32).astype(
            jnp.bfloat16)

    # valid quadrant parts must have zero pad columns
    cm = (np.arange(L) % Wqp < Wq).astype(np.float32)
    p_same = (bf((N, Dq, Q * C_same, L)) * cm).astype(jnp.bfloat16)
    raw = bf((N, Dq, cin, L))
    umult = jnp.asarray(rng.rand(N, cin) + 0.5, jnp.float32)
    uoff = jnp.asarray(rng.randn(N, cin), jnp.float32)
    ukern = jnp.asarray(rng.randn(2, 2, 2, cin, C_up) * 0.2, jnp.float32)
    wk = jnp.asarray(rng.randn(3, 3, C_same + C_up, CO) * 0.2,
                     jnp.float32).astype(jnp.bfloat16)
    b = jnp.zeros((CO,), jnp.bfloat16)
    smult = jnp.asarray(rng.rand(N, C_same) + 0.5, jnp.float32)
    soff = jnp.asarray(rng.randn(N, C_same), jnp.float32)

    def dense(p_same, raw, umult, uoff, ukern, wk, b):
        u = transp_conv_quadrant_from_cf(raw, umult, uoff, ukern, q, Hq,
                                         Wq, interpret=True)
        return quadrant_fused_block([p_same, u], wk, b,
                                    [(smult, soff), None], q, Hq, Wq,
                                    interpret=True)

    def lazy(p_same, raw, umult, uoff, ukern, wk, b):
        lz = LazyUp(raw, umult, uoff, ukern)
        return quadrant_fused_block([p_same, lz], wk, b,
                                    [(smult, soff), None], q, Hq, Wq,
                                    interpret=True)

    yd, sd = dense(p_same, raw, umult, uoff, ukern, wk, b)
    yl, sl = lazy(p_same, raw, umult, uoff, ukern, wk, b)
    assert yl.shape == yd.shape and yl.dtype == yd.dtype
    np.testing.assert_allclose(np.asarray(yl, np.float32),
                               np.asarray(yd, np.float32),
                               rtol=0.05, atol=0.05)
    np.testing.assert_allclose(np.asarray(sl), np.asarray(sd),
                               rtol=2e-2, atol=2e-2)

    def loss(fn, *args):
        y, stats = fn(*args)
        return (jnp.sum(y.astype(jnp.float32) ** 2)
                + jnp.sum(stats ** 2) * 1e-3)

    gd = jax.grad(lambda *a: loss(dense, *a),
                  argnums=(0, 1, 2, 3, 4, 5, 6))(
        p_same, raw, umult, uoff, ukern, wk, b)
    gl = jax.grad(lambda *a: loss(lazy, *a),
                  argnums=(0, 1, 2, 3, 4, 5, 6))(
        p_same, raw, umult, uoff, ukern, wk, b)
    for a, bb in zip(gl, gd):
        sc = max(1.0, float(np.abs(np.asarray(bb, np.float32)).max()))
        np.testing.assert_allclose(np.asarray(a, np.float32) / sc,
                                   np.asarray(bb, np.float32) / sc,
                                   rtol=0.05, atol=0.05)


def test_lazy_up_f32_falls_back():
    """f32 parts reject the lazy kernel; the internal fallback must
    reproduce the dense path exactly."""
    import jax.numpy as jnp
    import numpy as np
    from e2enet_tpu.ops.qfused import (LazyUp, quadrant_fused_block,
                                       transp_conv_quadrant_from_cf)

    q = (2, 2, 2)
    Hq, Wq, Wqp = 8, 15, 16
    L = Hq * Wqp
    N, Dq, cin, C_up, CO = 1, 4, 8, 8, 8
    rng = np.random.RandomState(8)
    cm = (np.arange(L) % Wqp < Wq).astype(np.float32)
    p_same = jnp.asarray(rng.randn(N, Dq, 8 * 8, L) * cm, jnp.float32)
    raw = jnp.asarray(rng.randn(N, Dq, cin, L), jnp.float32)
    umult = jnp.asarray(rng.rand(N, cin) + 0.5, jnp.float32)
    uoff = jnp.asarray(rng.randn(N, cin), jnp.float32)
    ukern = jnp.asarray(rng.randn(2, 2, 2, cin, C_up) * 0.2, jnp.float32)
    wk = jnp.asarray(rng.randn(3, 3, 8 + C_up, CO) * 0.2, jnp.float32)
    b = jnp.zeros((CO,), jnp.float32)
    smult = jnp.asarray(rng.rand(N, 8) + 0.5, jnp.float32)
    soff = jnp.asarray(rng.randn(N, 8), jnp.float32)

    u = transp_conv_quadrant_from_cf(raw, umult, uoff, ukern, q, Hq, Wq,
                                     compute_dtype=jnp.float32,
                                     interpret=True)
    yd, _ = quadrant_fused_block([p_same, u], wk, b,
                                 [(smult, soff), None], q, Hq, Wq,
                                 interpret=True)
    yl, _ = quadrant_fused_block([p_same, LazyUp(raw, umult, uoff, ukern)],
                                 wk, b, [(smult, soff), None], q, Hq, Wq,
                                 interpret=True)
    np.testing.assert_array_equal(np.asarray(yl), np.asarray(yd))
