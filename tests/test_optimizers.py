"""Optimizer-variant knobs: ranger / adam train steps
(nnUNetTrainerV2_Ranger_*.py, nnUNetTrainerV2_Adam*.py) driven through the
same jitted train step as SGD, plus checkpoint roundtrip of their state."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from e2enet_tpu.models.unetpp import ShiftUNetPlusPlus
from e2enet_tpu.training import dsff
from e2enet_tpu.training.train_state import (adam_init, adam_update,
                                             create_train_state,
                                             make_train_step)

POOLS = ((2, 2, 2), (2, 2, 2), (2, 2, 2))


@pytest.fixture(scope="module")
def model_and_params():
    m = ShiftUNetPlusPlus(input_channels=1, num_classes=3,
                          pool_op_kernel_sizes=POOLS, base_num_features=8,
                          max_num_features=32, compute_dtype=jnp.float32)
    params = m.init(jax.random.PRNGKey(0),
                    jnp.zeros((1, 16, 16, 16, 1)))["params"]
    return m, params


def _batch(rng):
    data = jnp.asarray(rng.randn(1, 16, 16, 16, 1).astype(np.float32))
    targets = tuple(jnp.asarray(
        rng.randint(0, 3, (1, 16 // f, 16 // f, 16 // f)).astype(np.int32))
        for f in (1, 2, 4))
    return data, targets


@pytest.mark.parametrize("opt", ["ranger", "adam"])
def test_optimizer_train_step_reduces_loss(model_and_params, opt):
    m, params = model_and_params
    state = create_train_state(params, optimizer=opt)
    step = make_train_step(m, [1.0, 0.0, 0.0], donate=False, optimizer=opt)
    rng = np.random.RandomState(0)
    data, targets = _batch(rng)
    losses = []
    for _ in range(8):
        state, metrics = step(state, data, targets, jnp.float32(1e-3))
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]
    assert int(state.step) == 8


def test_adam_matches_torch():
    torch = pytest.importorskip("torch")
    w0 = np.random.RandomState(1).randn(4, 3).astype(np.float32)
    tw = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    opt = torch.optim.Adam([tw], lr=1e-2, weight_decay=3e-5, amsgrad=True)
    params = {"w": jnp.asarray(w0)}
    st = adam_init(params)
    for i in range(7):
        g = np.random.RandomState(10 + i).randn(4, 3).astype(np.float32)
        opt.zero_grad()
        tw.grad = torch.from_numpy(g.copy())
        opt.step()
        params, st = adam_update(params, st, {"w": jnp.asarray(g)},
                                 lr=1e-2, weight_decay=3e-5)
    np.testing.assert_allclose(np.asarray(params["w"]),
                               tw.detach().numpy(), atol=1e-6)


def test_ranger_train_step_with_masks(model_and_params):
    """DSFF masking must zero dead kernels in params AND the full ranger
    state (exp_avg / exp_avg_sq / slow)."""
    m, params = model_and_params
    masks = dsff.init_masks(params, density=0.3, rng=jax.random.PRNGKey(5))
    state = create_train_state(params, masks, optimizer="ranger")
    step = make_train_step(m, [1.0, 0.0, 0.0], donate=False,
                           optimizer="ranger")
    rng = np.random.RandomState(0)
    data, targets = _batch(rng)
    new_state, metrics = step(state, data, targets, jnp.float32(1e-3))
    assert np.isfinite(float(metrics["loss"]))
    for tree in (new_state.params, new_state.momentum.exp_avg,
                 new_state.momentum.exp_avg_sq):
        for path, w in dsff.select_masked(tree).items():
            msk = np.asarray(masks[path])
            l1 = np.abs(np.asarray(w)).sum(tuple(range(w.ndim - 2)))
            assert (l1[msk == 0] == 0).all(), path


def test_optimizer_state_checkpoint_roundtrip(model_and_params, tmp_path):
    from e2enet_tpu.training.checkpoint import (load_checkpoint,
                                                save_checkpoint)
    m, params = model_and_params
    state = create_train_state(params, optimizer="ranger")
    step = make_train_step(m, [1.0, 0.0, 0.0], donate=False,
                           optimizer="ranger")
    rng = np.random.RandomState(0)
    data, targets = _batch(rng)
    state, _ = step(state, data, targets, jnp.float32(1e-3))
    path = str(tmp_path / "ranger_ckpt.model")
    save_checkpoint(path, state, epoch=1)
    restored, epoch, _meta = load_checkpoint(path)
    assert epoch == 1
    assert type(restored.momentum).__name__ == "RangerState"
    assert int(restored.momentum.step) == int(state.momentum.step)
    a = jax.tree_util.tree_leaves(state.momentum.exp_avg)
    b = jax.tree_util.tree_leaves(restored.momentum.exp_avg)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_variant_presets_resolve():
    from e2enet_tpu.training.variants import resolve_variant
    assert resolve_variant("nnUNetTrainerV2_Ranger_lr3en4") == {
        "optimizer": "ranger", "initial_lr": 3e-4}
    assert resolve_variant("nnUNetTrainerV2_Adam")["optimizer"] == "adam"
    assert resolve_variant("nnUNetTrainerV2_momentum098") == {
        "momentum": 0.98}
