"""DSFF dynamic sparse engine: mask targeting, uniform init densities,
apply/death/growth invariants (parity: sparselearning/core_channel.py)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from e2enet_tpu.models.unetpp import ShiftUNetPlusPlus
from e2enet_tpu.training import dsff
from e2enet_tpu.training.train_state import (create_train_state,
                                             make_mask_update_step,
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


def test_mask_targeting(model_and_params):
    _, params = model_and_params
    masked = dsff.select_masked(params)
    names = {"/".join(k) for k in masked}
    # every loc conv + up transpconv kernel, nothing else
    assert any(n.startswith("loc0_0") for n in names)
    assert any(n.startswith("up0_0") for n in names)
    assert all(("loc" in n) or ("up" in n) for n in names)
    assert not any("context" in n for n in names)
    assert not any("seg_head" in n for n in names)
    assert not any("norm" in n or "bias" in n for n in names)
    # P=3 nest has 6 nodes -> 6 transposed convs
    ups = [n for n in names if n.startswith("up")]
    assert len(ups) == 6


def test_uniform_init_density(model_and_params):
    _, params = model_and_params
    masks = dsff.init_masks(params, density=0.3, rng=jax.random.PRNGKey(1))
    masked = dsff.select_masked(params)
    for path, m in masks.items():
        w = masked[path]
        cin, cout = w.shape[-2], w.shape[-1]
        d = 0.2 if dsff._torch_dim0(w.shape) == 48 else 0.3
        expected = max(1, min(round(cin * cout * d), cin * cout))
        assert int(m.sum()) == expected
        assert m.shape == (cin, cout)


def test_apply_masks(model_and_params):
    _, params = model_and_params
    masks = dsff.init_masks(params, density=0.3, rng=jax.random.PRNGKey(2))
    mp = dsff.apply_masks(params, masks)
    masked = dsff.select_masked(mp)
    for path, w in masked.items():
        m = np.asarray(masks[path])
        wnp = np.asarray(w)
        l1 = np.abs(wnp).sum(tuple(range(wnp.ndim - 2)))
        assert (l1[m == 0] == 0).all()
        assert (l1[m == 1] > 0).all()


def test_death_growth_preserves_count(model_and_params):
    _, params = model_and_params
    masks = dsff.init_masks(params, density=0.3, rng=jax.random.PRNGKey(3))
    mp = dsff.apply_masks(params, masks)
    new_masks, stats = dsff.death_growth_update(
        mp, None, masks, jax.random.PRNGKey(4),
        jnp.float32(0.5), growth_mode="random")
    for path in masks:
        before = int(masks[path].sum())
        after = int(new_masks[path].sum())
        # growth revives exactly as many kernels as died
        assert after == before
        # masks stay binary
        vals = np.unique(np.asarray(new_masks[path]))
        assert set(vals.tolist()) <= {0.0, 1.0}
    # but the support changed (some kernels moved)
    moved = sum(int(np.sum(np.abs(np.asarray(new_masks[p])
                                  - np.asarray(masks[p]))))
                for p in masks)
    assert moved > 0


def test_cosine_death_rate():
    dr0 = dsff.cosine_death_rate(jnp.asarray(0.0), 0.5, 1000)
    dr_half = dsff.cosine_death_rate(jnp.asarray(500.0), 0.5, 1000)
    dr_end = dsff.cosine_death_rate(jnp.asarray(1000.0), 0.5, 1000)
    assert float(dr0) == pytest.approx(0.5)
    assert float(dr_half) == pytest.approx((0.5 + 0.001) / 2, rel=1e-3)
    assert float(dr_end) == pytest.approx(0.001, abs=1e-6)


def test_train_step_keeps_masks_applied(model_and_params):
    m, params = model_and_params
    masks = dsff.init_masks(params, density=0.3, rng=jax.random.PRNGKey(5))
    state = create_train_state(params, masks)
    step = make_train_step(m, [1.0, 0.0, 0.0], donate=False)
    rng = np.random.RandomState(0)
    data = jnp.asarray(rng.randn(1, 16, 16, 16, 1).astype(np.float32))
    targets = tuple(jnp.asarray(
        rng.randint(0, 3, (1, 16 // f, 16 // f, 16 // f)).astype(np.int32))
        for f in (1, 2, 4))
    new_state, metrics = step(state, data, targets, jnp.float32(1e-2))
    assert np.isfinite(float(metrics["loss"]))
    masked = dsff.select_masked(new_state.params)
    for path, w in masked.items():
        msk = np.asarray(masks[path])
        l1 = np.abs(np.asarray(w)).sum(tuple(range(w.ndim - 2)))
        assert (l1[msk == 0] == 0).all(), f"dead kernels updated in {path}"
    # momentum masked too
    mom = dsff.select_masked(new_state.momentum)
    for path, b in mom.items():
        msk = np.asarray(masks[path])
        l1 = np.abs(np.asarray(b)).sum(tuple(range(b.ndim - 2)))
        assert (l1[msk == 0] == 0).all()
