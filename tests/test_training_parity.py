"""Step-level TRAINING parity vs the reference torch trainer.

The training-side twin of test_pipeline_parity: identical converted weights
and an identical batch through

  * the reference inner loop — forward(do_ds) -> MultipleOutputLoss2(
    DC_and_CE_loss) -> backward -> clip_grad_norm_(12) -> SGD(momentum .99,
    nesterov, wd 3e-5).step  (nnUNetTrainer_simple.run_iteration :528-581,
    loss wiring :195-215)
  * OUR jitted train step (training/train_state.make_train_step)

asserting loss equality, per-leaf gradient agreement, the gradient global
norm (the clip coefficient), and the updated parameter tree after TWO steps
(step 2 exercises the momentum buffer + nesterov lookahead + weight decay).

Also pins the DSFF kernel-death SELECTION identity vs the reference
Masking.kernel_death (core_channel.py:647-666) — death is deterministic
given (weights, mask, death_rate); growth RNG legitimately differs, so the
death set is compared before growth.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from conftest import has_reference, import_reference_unetpp, \
    stub_reference_deps

POOLS = [[1, 2, 2], [2, 2, 2], [2, 2, 2], [2, 2, 2], [1, 2, 2]]
PATCH = (8, 64, 64)
NUM_CLASSES = 3
LR = 0.01


def _nchw_to_ndhwc(x):
    return np.moveaxis(x, 1, -1)


def _build_ref_net(torch, nn):
    Ref = import_reference_unetpp()
    torch.manual_seed(11)
    net = Ref(PATCH, 1, 8, 3, 5, 2, 2, nn.Conv3d, nn.InstanceNorm3d,
              {'eps': 1e-5, 'affine': True}, nn.Dropout3d,
              {'p': 0, 'inplace': True}, nn.LeakyReLU,
              {'negative_slope': 1e-2, 'inplace': True}, True, False,
              lambda x: x, None, [list(p) for p in POOLS],
              [[1, 3, 3]] * 6, False, True, True, max_num_features=64)
    return net


@pytest.mark.skipif(not has_reference(), reason="reference not mounted")
def test_train_step_matches_reference_torch():
    torch = pytest.importorskip("torch")
    import torch.nn as nn
    stub_reference_deps()
    from e2enet.training.loss_functions.deep_supervision import (
        MultipleOutputLoss2)
    from e2enet.training.loss_functions.dice_loss import DC_and_CE_loss

    from e2enet_tpu.models.torch_import import convert_unetpp_state_dict
    from e2enet_tpu.models.unetpp import ShiftUNetPlusPlus, ds_loss_weights
    from e2enet_tpu.ops.losses import deep_supervision_loss
    from e2enet_tpu.training.train_state import (create_train_state,
                                                 make_train_step)

    # ---- reference net + exact trainer loss/optimizer wiring
    net = _build_ref_net(torch, nn)
    net.train()
    net.do_ds = True
    sd0 = {k: v.detach().numpy().copy() for k, v in net.state_dict().items()}

    # weights = 1/2^i over net_numpool, lowest zeroed, normalized
    # (nnUNetTrainer_simple.initialize :206-215)
    w5 = np.array([1 / (2 ** i) for i in range(5)])
    w5[-1] = 0
    w5 = w5 / w5.sum()
    loss_ref = MultipleOutputLoss2(
        DC_and_CE_loss({'batch_dice': True, 'smooth': 1e-5,
                        'do_bg': False}, {}), w5)
    opt = torch.optim.SGD(net.parameters(), lr=LR, momentum=0.99,
                          nesterov=True, weight_decay=3e-5)

    # ---- identical batches and deep-supervision targets for both steps
    rng = np.random.RandomState(3)
    with torch.no_grad():
        probe = net(torch.from_numpy(
            rng.randn(1, 1, *PATCH).astype(np.float32)))
    ds_shapes = [tuple(o.shape[2:]) for o in probe]
    assert len(ds_shapes) == 4
    batches = []
    for _ in range(2):
        data = rng.randn(2, 1, *PATCH).astype(np.float32)
        tgts = [rng.randint(0, NUM_CLASSES, (2, *s)).astype(np.int32)
                for s in ds_shapes]
        batches.append((data, tgts))

    ref_losses, ref_gnorms, ref_grads = [], [], []
    for data, tgts in batches:
        opt.zero_grad()
        out = net(torch.from_numpy(data))
        l = loss_ref(out, [torch.from_numpy(t[:, None]).float()
                           for t in tgts])
        l.backward()
        gnorm = torch.nn.utils.clip_grad_norm_(net.parameters(), 12)
        ref_losses.append(float(l))
        ref_gnorms.append(float(gnorm))
        ref_grads.append({k: p.grad.detach().numpy().copy()
                          for k, p in net.named_parameters()})
        opt.step()
    sd_final = {k: v.detach().numpy().copy()
                for k, v in net.state_dict().items()}

    # ---- our jitted train step on the converted weights
    model = ShiftUNetPlusPlus(input_channels=1, num_classes=NUM_CLASSES,
                              pool_op_kernel_sizes=POOLS,
                              base_num_features=8, max_num_features=64,
                              compute_dtype=jnp.float32)
    params0 = convert_unetpp_state_dict(sd0, num_pool=5)
    w4 = ds_loss_weights(5, 4)
    np.testing.assert_allclose(w4, w5[:4])
    step_fn = make_train_step(model, w4, batch_dice=True, donate=False)
    state = create_train_state(params0)

    def loss_only(p, data, targets):
        outs = model.apply({"params": p}, data, do_ds=True)
        return deep_supervision_loss(outs, targets, [float(w) for w in w4],
                                     batch_dice=True)

    # per-leaf UNCLIPPED gradient agreement vs torch at the IDENTICAL
    # initial params (step >=1 runs from already noise-diverged params, so
    # per-step grad comparison is only meaningful here), via the same
    # state_dict -> flax converter the checkpoint bridge uses
    grad_fn = jax.jit(jax.grad(loss_only))
    ours_g = grad_fn(state.params, jnp.asarray(_nchw_to_ndhwc(batches[0][0])),
                     tuple(jnp.asarray(t) for t in batches[0][1]))
    ref_g = convert_unetpp_state_dict(ref_grads[0], num_pool=5)
    flat_o = jax.tree_util.tree_flatten_with_path(ours_g)[0]
    flat_r = jax.tree_util.tree_flatten_with_path(ref_g)[0]
    assert len(flat_o) == len(flat_r)
    for (po, go), (pr, gr) in zip(flat_o, flat_r):
        assert jax.tree_util.keystr(po) == jax.tree_util.keystr(pr)
        # Tolerance calibration (experiments/grad_parity_f64.py): in
        # float64 every leaf agrees to ~1e-15 — the implementations are
        # mathematically identical — while in float32 torch's own
        # f32-vs-f64 noise reaches 3.5e-3 L2-relative and ours-vs-torch
        # reaches 1.5e-2 (different reduction orders through 40 layers
        # of instance-norm chains). 2e-2 catches any semantic
        # divergence (wrong weights/momentum/clip are O(1) errors).
        # Absolute floor 1e-5 for the gauge leaves: conv biases feeding
        # instance norm have true grad = 0 (the norm subtracts them).
        ref_n = float(np.linalg.norm(gr))
        err_n = float(np.linalg.norm(np.asarray(go) - gr))
        assert err_n <= 2e-2 * ref_n + 1e-5, (
            f"grad mismatch at {jax.tree_util.keystr(po)}: "
            f"L2 err {err_n:.3e} vs ref norm {ref_n:.3e}")

    for i, (data, tgts) in enumerate(batches):
        data_j = jnp.asarray(_nchw_to_ndhwc(data))
        tgts_j = tuple(jnp.asarray(t) for t in tgts)
        state, metrics = step_fn(state, data_j, tgts_j, jnp.float32(LR))
        # step 0 starts from identical params (tight); step 1's loss/norm
        # inherit the trajectory's f32 noise divergence
        assert float(metrics["loss"]) == pytest.approx(
            ref_losses[i], rel=1e-4 if i == 0 else 1e-3)
        # the clip coefficient is min(1, 12/gnorm) — pin the norm itself
        # (loose: the global norm inherits the per-leaf f32 noise above)
        assert float(metrics["grad_norm"]) == pytest.approx(
            ref_gnorms[i], rel=1e-2 if i == 0 else 3e-2)

    # ---- updated parameters after 2 steps (momentum + nesterov + wd)
    ref_final = convert_unetpp_state_dict(sd_final, num_pool=5)
    flat_o = jax.tree_util.tree_flatten_with_path(state.params)[0]
    flat_r = jax.tree_util.tree_flatten_with_path(ref_final)[0]
    for (po, vo), (pr, vr) in zip(flat_o, flat_r):
        assert jax.tree_util.keystr(po) == jax.tree_util.keystr(pr)
        # after 2 steps the trajectories have diverged by
        # ~lr * grad-noise * (1 + momentum) ~ 1e-4 L2 — far below any
        # semantic optimizer difference (wrong wd/momentum/nesterov moves
        # params by ~lr*|g| ~ 1e-2 relative)
        ref_n = float(np.linalg.norm(vr))
        err_n = float(np.linalg.norm(np.asarray(vo) - vr))
        # floor 5e-5: norm biases start at 0 so their whole norm IS two
        # updates (~5e-4) — noise relative to the update, not the value
        assert err_n <= 1e-3 * ref_n + 5e-5, (
            f"param mismatch at {jax.tree_util.keystr(po)}: "
            f"L2 err {err_n:.3e} vs ref norm {ref_n:.3e}")


@pytest.mark.skipif(not has_reference(), reason="reference not mounted")
def test_dsff_kernel_death_matches_reference():
    """kernel_death selection identity: same weights + same kernel mask +
    same death rate -> the same set of killed (out, in) kernel pairs, at
    several sparsity levels (exercises the num_zeros offset path)."""
    torch = pytest.importorskip("torch")
    stub_reference_deps()
    from e2enet.training.network_training.sparselearning.core_channel import (
        Masking)
    from e2enet_tpu.training.dsff import kernel_death_survive

    rng = np.random.RandomState(5)
    cout, cin, kh, kw = 24, 16, 3, 3
    for density, death_rate in [(1.0, 0.3), (0.5, 0.4), (0.25, 0.5)]:
        # our-side layout (kh, kw, in, out); torch (out, in, 1, kh, kw)
        w = rng.randn(kh, kw, cin, cout).astype(np.float32)
        mask_io = (rng.rand(cin, cout) < density).astype(np.float32)
        if density == 1.0:
            mask_io[:] = 1.0
        w = w * mask_io[None, None]  # reference keeps dead weights at 0

        w_t = torch.from_numpy(
            np.transpose(w, (3, 2, 0, 1))[:, :, None])  # (out,in,1,kh,kw)
        w_t.grad = None
        mask_t = torch.from_numpy(
            np.broadcast_to(np.transpose(mask_io)[:, :, None, None, None],
                            w_t.shape).copy())

        msk = Masking.__new__(Masking)
        msk.death_rate = death_rate
        nonzeros = float(mask_t.sum())
        msk.name2nonzeros = {"w": nonzeros}
        msk.name2zeros = {"w": float(mask_t.numel() - nonzeros)}

        class _P:  # kernel_death reads weight.data / weight.shape
            data = w_t
            shape = w_t.shape
        new_mask_t, prune_num = msk.kernel_death(mask_t.clone(), _P, "w")
        ref_alive = (new_mask_t.numpy().reshape(cout, cin, -1).sum(-1)
                     > 0)                                     # (out, in)

        survived, num_death = kernel_death_survive(
            jnp.asarray(w), jnp.asarray(mask_io), death_rate)
        ours_alive = np.asarray(survived).T > 0               # (out, in)

        np.testing.assert_array_equal(ours_alive, ref_alive)
        assert int(num_death) >= int(prune_num) or density < 1.0


# ---------------------------------------------------------------------------
# DSFF gradual-density schedule / global prune-grow / GMP / lottery parity
# (core_channel.py:350-386 cal_grow_schedule, :469-553
# truncate_weights_global, :436-467 truncate_weights_GMP, :119-139 lottery)
# ---------------------------------------------------------------------------

def _masking_stub(torch, weights_t, masks_t):
    """A Masking object bypassing __init__ (the real one wants CUDA),
    carrying a tiny module whose parameter names hit the 'loc' filter."""
    from e2enet.training.network_training.sparselearning.core_channel import (
        Masking)
    import collections
    import torch.nn as nn

    class _Mod(nn.Module):
        def __init__(self):
            super().__init__()
            for i, w in enumerate(weights_t):
                self.register_parameter(f"loc{i}", nn.Parameter(w.clone()))

    mod = _Mod()
    msk = Masking.__new__(Masking)
    msk.modules = [mod]
    msk.module = mod
    msk.masks = {f"loc{i}": m.clone() for i, m in enumerate(masks_t)}
    msk.name2nonzeros = {}
    msk.name2zeros = {}
    msk.pruned_masks = {}
    msk.regrowed_masks = {}
    msk.num_remove = {}
    msk.num_death = {}

    class _Opt:
        state = collections.defaultdict(dict)
    msk.optimizer = _Opt()
    return msk, mod


@pytest.mark.skipif(not has_reference(), reason="reference not mounted")
def test_grow_schedule_matches_reference():
    """regrow_ratio trajectory identity at 3 sparsity levels: the cubic
    gradual-density ramp (cal_grow_schedule, core_channel.py:350-386)."""
    torch = pytest.importorskip("torch")
    stub_reference_deps()
    from e2enet_tpu.training.dsff import grow_schedule_ratio

    rng = np.random.RandomState(7)
    update_freq, iters_per_epoch = 5, 10
    for density, final_density in [(0.3, 0.05), (0.5, 0.2), (0.2, 0.1)]:
        w = torch.from_numpy(rng.randn(12, 8, 1, 3, 3).astype(np.float32))
        m = (torch.rand(12, 8, 1, 3, 3) < density).float()
        msk, mod = _masking_stub(torch, [w], [m])
        msk.prune_every_k_steps = update_freq

        class _Args:
            pass
        _Args.density = density
        _Args.final_density = final_density
        _Args.init_prune_epoch = 0
        _Args.final_prune_epoch = 8
        msk.args = _Args
        msk.loader = list(range(iters_per_epoch))
        msk.death_rate = 0.5
        msk.regrow_ratio = 1.01
        msk.curr_density = float(m.sum() / m.numel())
        ours_prev = 1.01
        for steps in range(update_freq, update_freq * 20, update_freq):
            msk.steps = steps
            msk.cal_grow_schedule()
            ours = grow_schedule_ratio(
                steps, update_freq, iters_per_epoch, density, final_density,
                msk.death_rate, float(m.numel()), float(m.sum()),
                msk.curr_density, ours_prev,
                init_prune_epoch=0, final_prune_epoch=8)
            assert abs(ours - msk.regrow_ratio) < 1e-9, (
                f"steps={steps} d={density}: {ours} vs {msk.regrow_ratio}")
            ours_prev = ours


@pytest.mark.skipif(not has_reference(), reason="reference not mounted")
def test_global_prune_grow_matches_reference(monkeypatch):
    """truncate_weights_global identity (core_channel.py:469-553): same
    weights + masks + grads + the SAME uniform draws -> identical new
    masks (global magnitude prune, Bernoulli-allocated gradient regrow)."""
    torch = pytest.importorskip("torch")
    stub_reference_deps()
    from e2enet_tpu.training import dsff

    monkeypatch.setattr(torch.Tensor, "cuda",
                        lambda self, *a, **k: self, raising=False)

    rng = np.random.RandomState(3)
    shapes = [(10, 6, 1, 3, 3), (8, 12, 1, 3, 3)]
    death_rate, regrow_ratio, density = 0.4, 0.9, 0.4

    ws, ms, gs, us = [], [], [], []
    for s in shapes:
        m = (rng.rand(*s) < density).astype(np.float32)
        w = rng.randn(*s).astype(np.float32) * m     # dead weights at 0
        g = rng.randn(*s).astype(np.float32)
        u = rng.rand(*s).astype(np.float32)
        ws.append(w); ms.append(m); gs.append(g); us.append(u)

    # ---- reference
    wts = [torch.from_numpy(w) for w in ws]
    msk, mod = _masking_stub(torch, wts,
                             [torch.from_numpy(m) for m in ms])
    for i, (name, p) in enumerate(mod.named_parameters()):
        p.grad = torch.from_numpy(gs[i])
    msk.death_rate = death_rate
    msk.regrow_ratio = regrow_ratio
    msk.name2nonzeros = {}
    draws = iter([torch.from_numpy(np.concatenate(
        [u.reshape(-1) for u in us]))])
    monkeypatch.setattr(torch, "rand",
                        lambda *shape, **k: next(draws).reshape(*shape)
                        if len(shape) == 1 else torch.empty(*shape).uniform_())
    msk.truncate_weights_global()
    ref_masks = [msk.masks[f"loc{i}"].numpy() for i in range(len(shapes))]

    # ---- ours: torch (out,in,kd,kh,kw) -> our conv layout (kh,kw,in,out)
    # is irrelevant here (elementwise); keep torch layout via fake paths
    params = {f"loc{i}": {"kernel": jnp.asarray(np.transpose(
        w, (2, 3, 4, 1, 0)))} for i, w in enumerate(ws)}
    grads = {f"loc{i}": {"kernel": jnp.asarray(np.transpose(
        g, (2, 3, 4, 1, 0)))} for i, g in enumerate(gs)}
    masks = {(f"loc{i}", "kernel"): jnp.asarray(np.transpose(
        m, (2, 3, 4, 1, 0))) for i, m in enumerate(ms)}
    uts = {(f"loc{i}", "kernel"): jnp.asarray(np.transpose(
        u, (2, 3, 4, 1, 0))) for i, u in enumerate(us)}
    new_masks, stats = dsff.truncate_weights_global(
        params, grads, masks, jax.random.PRNGKey(0),
        jnp.float32(death_rate), jnp.float32(regrow_ratio),
        _uniform_draws=uts)
    for i in range(len(shapes)):
        ours = np.transpose(np.asarray(new_masks[(f"loc{i}", "kernel")]),
                            (4, 3, 0, 1, 2))
        np.testing.assert_array_equal(ours, ref_masks[i])


@pytest.mark.skipif(not has_reference(), reason="reference not mounted")
def test_gmp_prune_matches_reference(monkeypatch):
    """truncate_weights_GMP trajectory identity over a 3-epoch ramp
    (core_channel.py:436-467): same weights -> identical masks and
    density trajectory at each epoch."""
    torch = pytest.importorskip("torch")
    stub_reference_deps()
    from e2enet_tpu.training import dsff

    monkeypatch.setattr(torch.Tensor, "cuda",
                        lambda self, *a, **k: self, raising=False)
    rng = np.random.RandomState(9)
    shapes = [(6, 4, 1, 3, 3), (4, 8, 1, 3, 3)]
    density = 0.25
    ws = [rng.randn(*s).astype(np.float32) for s in shapes]

    msk, mod = _masking_stub(
        torch, [torch.from_numpy(w) for w in ws],
        [torch.ones(s) for s in shapes])

    class _Args:
        multiplier = 1
        init_prune_epoch = 0
        final_prune_epoch = 3
    msk.args = _Args
    msk.density = density

    params = {f"loc{i}": {"kernel": jnp.asarray(np.transpose(
        w, (2, 3, 4, 1, 0)))} for i, w in enumerate(ws)}
    masks = {(f"loc{i}", "kernel"): jnp.ones(
        np.transpose(ws[i], (2, 3, 4, 1, 0)).shape, jnp.float32)
        for i in range(len(shapes))}

    for epoch in range(4):
        msk.truncate_weights_GMP(epoch)
        masks = dsff.gmp_prune_masks(params, masks, epoch, density,
                                     init_prune_epoch=0,
                                     final_prune_epoch=3, multiplier=1)
        params = dsff.apply_masks(params, masks)
        for i in range(len(shapes)):
            ours = np.transpose(
                np.asarray(masks[(f"loc{i}", "kernel")]), (4, 3, 0, 1, 2))
            np.testing.assert_array_equal(
                ours, msk.masks[f"loc{i}"].numpy(),
                err_msg=f"epoch {epoch} layer {i}")


@pytest.mark.skipif(not has_reference(), reason="reference not mounted")
def test_lottery_init_matches_reference(monkeypatch):
    """lottery_ticket init identity (core_channel.py:119-139): global
    top-|w| threshold across masked layers."""
    torch = pytest.importorskip("torch")
    stub_reference_deps()
    from e2enet_tpu.training import dsff

    monkeypatch.setattr(torch.Tensor, "cuda",
                        lambda self, *a, **k: self, raising=False)
    rng = np.random.RandomState(13)
    shapes = [(6, 4, 1, 3, 3), (8, 10, 1, 3, 3)]
    density = 0.3
    ws = [rng.randn(*s).astype(np.float32) for s in shapes]

    msk, mod = _masking_stub(
        torch, [torch.from_numpy(w) for w in ws],
        [torch.zeros(s) for s in shapes])
    msk.density = density
    msk.init(mode='lottery_ticket', density=density)
    ref = [msk.masks[f"loc{i}"].numpy() for i in range(len(shapes))]

    params = {f"loc{i}": {"kernel": jnp.asarray(np.transpose(
        w, (2, 3, 4, 1, 0)))} for i, w in enumerate(ws)}
    ours = dsff.init_masks_lottery(params, density)
    for i in range(len(shapes)):
        got = np.transpose(np.asarray(ours[(f"loc{i}", "kernel")]),
                           (4, 3, 0, 1, 2))
        np.testing.assert_array_equal(got, ref[i])
