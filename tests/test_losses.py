"""Loss parity vs the reference torch implementations (dice_loss.py)."""
import numpy as np
import pytest
import jax.numpy as jnp

from e2enet_tpu.ops.losses import (dc_and_ce_loss, deep_supervision_loss,
                                   downsample_seg_for_ds, hard_tp_fp_fn,
                                   robust_cross_entropy, soft_dice_loss)


def _rand(shape, seed=0):
    return np.random.RandomState(seed).randn(*shape).astype(np.float32)


def test_ce_matches_torch():
    torch = pytest.importorskip("torch")
    logits = _rand((2, 4, 6, 6, 3))          # our layout: (...,C)
    target = np.random.RandomState(1).randint(0, 3, (2, 4, 6, 6))
    ours = float(robust_cross_entropy(jnp.asarray(logits),
                                      jnp.asarray(target)))
    lt = torch.from_numpy(np.moveaxis(logits, -1, 1))  # (B,C,...)
    tt = torch.from_numpy(target).long()
    theirs = float(torch.nn.functional.cross_entropy(lt, tt))
    assert ours == pytest.approx(theirs, rel=1e-5)


def test_soft_dice_matches_reference_formula():
    """Replicates SoftDiceLoss(batch_dice=True, do_bg=False, smooth=1e-5)
    numerically with numpy."""
    logits = _rand((2, 4, 6, 6, 3), seed=2)
    target = np.random.RandomState(3).randint(0, 3, (2, 4, 6, 6))
    probs = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    onehot = np.eye(3)[target]
    axes = (0, 1, 2, 3)
    tp = (probs * onehot).sum(axes)
    fp = (probs * (1 - onehot)).sum(axes)
    fn = ((1 - probs) * onehot).sum(axes)
    dc = (2 * tp + 1e-5) / (2 * tp + fp + fn + 1e-5 + 1e-8)
    expected = -dc[1:].mean()
    ours = float(soft_dice_loss(jnp.asarray(logits), jnp.asarray(target),
                                batch_dice=True, do_bg=False))
    assert ours == pytest.approx(float(expected), rel=1e-5)


@pytest.mark.skipif(not __import__("os").path.isdir("/root/reference"),
                    reason="reference not mounted")
def test_dc_and_ce_matches_reference_torch():
    from conftest import stub_reference_deps
    stub_reference_deps()
    torch = pytest.importorskip("torch")
    from e2enet.training.loss_functions.dice_loss import DC_and_CE_loss
    loss_ref = DC_and_CE_loss({'batch_dice': True, 'smooth': 1e-5,
                               'do_bg': False}, {})
    logits = _rand((2, 4, 6, 6, 4), seed=5)
    target = np.random.RandomState(6).randint(0, 4, (2, 4, 6, 6))
    lt = torch.from_numpy(np.moveaxis(logits, -1, 1))
    tt = torch.from_numpy(target[:, None]).float()
    theirs = float(loss_ref(lt, tt))
    ours = float(dc_and_ce_loss(jnp.asarray(logits), jnp.asarray(target),
                                batch_dice=True))
    assert ours == pytest.approx(theirs, rel=1e-4)


def test_deep_supervision_weighting():
    logits = [jnp.asarray(_rand((1, 4, 4, 4, 2), seed=i)) for i in range(3)]
    targets = [jnp.asarray(np.zeros((1, 4, 4, 4), np.int32))] * 3
    w = [0.5, 0.5, 0.0]
    total = float(deep_supervision_loss(logits, targets, w))
    l0 = float(dc_and_ce_loss(logits[0], targets[0]))
    l1 = float(dc_and_ce_loss(logits[1], targets[1]))
    assert total == pytest.approx(0.5 * l0 + 0.5 * l1, rel=1e-5)


def test_hard_tp_fp_fn():
    logits = np.zeros((1, 2, 2, 2, 3), np.float32)
    logits[..., 1] = 10.0      # predict class 1 everywhere
    target = np.ones((1, 2, 2, 2), np.int32)
    tp, fp, fn = hard_tp_fp_fn(jnp.asarray(logits), jnp.asarray(target))
    assert float(tp[0]) == 8 and float(fp[0]) == 0 and float(fn[0]) == 0
    assert float(tp[1]) == 0 and float(fp[1]) == 0 and float(fn[1]) == 0


def test_downsample_targets():
    seg = jnp.asarray(np.arange(64).reshape(1, 4, 4, 4) % 3)
    outs = downsample_seg_for_ds(seg, [[1, 1, 1], [0.5, 0.5, 0.5]])
    assert outs[0].shape == (1, 4, 4, 4)
    assert outs[1].shape == (1, 2, 2, 2)
    np.testing.assert_array_equal(np.asarray(outs[1]),
                                  np.asarray(seg)[:, ::2, ::2, ::2])


@pytest.mark.skipif(not __import__("os").path.isdir("/root/reference"),
                    reason="reference not mounted")
def test_mcc_matches_reference_torch():
    from conftest import stub_reference_deps
    stub_reference_deps()
    torch = pytest.importorskip("torch")
    from e2enet.training.loss_functions.dice_loss import MCCLoss
    from e2enet.utilities.nd_softmax import softmax_helper
    from e2enet_tpu.ops.losses import mcc_loss
    loss_ref = MCCLoss(apply_nonlin=softmax_helper, batch_mcc=True,
                       do_bg=True, smooth=0.0)
    logits = _rand((2, 4, 6, 6, 4), seed=7)
    target = np.random.RandomState(8).randint(0, 4, (2, 4, 6, 6))
    lt = torch.from_numpy(np.moveaxis(logits, -1, 1))
    tt = torch.from_numpy(target[:, None]).float()
    theirs = float(loss_ref(lt, tt))
    ours = float(mcc_loss(jnp.asarray(logits), jnp.asarray(target),
                          batch_dice=True, do_bg=True))
    assert ours == pytest.approx(theirs, rel=1e-4, abs=1e-5)

    loss_ref_nobg = MCCLoss(apply_nonlin=softmax_helper, batch_mcc=False,
                            do_bg=False, smooth=0.0)
    theirs = float(loss_ref_nobg(lt, tt))
    ours = float(mcc_loss(jnp.asarray(logits), jnp.asarray(target),
                          batch_dice=False, do_bg=False))
    assert ours == pytest.approx(theirs, rel=1e-4, abs=1e-5)
