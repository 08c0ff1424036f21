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


def test_gmp_init_and_epoch_ramp(model_and_params):
    """GMP: dense start, per-epoch cubic magnitude ramp down to density."""
    _, params = model_and_params
    masks = dsff.init_masks_gmp(params)
    masked = dsff.select_masked(params)
    assert all(int(m.sum()) == m.size for m in masks.values())
    assert all(masks[p].shape == masked[p].shape for p in masks)
    density = 0.25
    dens_traj = []
    p = params
    for epoch in range(5):
        masks = dsff.gmp_prune_masks(p, masks, epoch, density,
                                     init_prune_epoch=0,
                                     final_prune_epoch=4)
        p = dsff.apply_masks(p, masks)
        dens_traj.append(float(dsff.masks_density(masks, p)))
    # monotone non-increasing toward density
    assert all(a >= b - 1e-6 for a, b in zip(dens_traj, dens_traj[1:]))
    assert dens_traj[-1] == pytest.approx(density, abs=0.02)


def test_lottery_init_density(model_and_params):
    _, params = model_and_params
    masks = dsff.init_masks_lottery(params, density=0.3)
    masked = dsff.select_masked(params)
    tot = sum(m.size for m in masks.values())
    nz = sum(int(m.sum()) for m in masks.values())
    assert nz / tot == pytest.approx(0.3, abs=0.01)
    assert all(masks[p].shape == masked[p].shape for p in masks)


def test_mask_granularity_explicit(model_and_params):
    _, params = model_and_params
    km = dsff.init_masks(params, 0.3, jax.random.PRNGKey(0))
    em = dsff.init_masks_element(params, 0.3, jax.random.PRNGKey(0),
                                 mode="uniform_ori")
    assert dsff.mask_granularity(km, params) == "kernel"
    assert dsff.mask_granularity(em, params) == "element"
    mixed = dict(km)
    k0 = sorted(em.keys())[0]
    mixed[k0] = em[k0]
    with pytest.raises(AssertionError):
        dsff.mask_granularity(mixed, params)


def test_global_update_density_schedule(model_and_params):
    """global prune/grow under the gradual schedule in the reference's
    "low to high regrow" direction (cal_grow_schedule's process_flag keeps
    firing while regrow_ratio > 1): density ramps from `density` up toward
    `final_density` and ends within noise of the target; fired-mask (ITOP)
    ratio only grows. Between updates, grown weights receive simulated
    training noise (in the reference 1200 SGD steps run between updates, so
    grown weights are nonzero by the next global prune)."""
    m, params = model_and_params
    density, final_density, death_rate = 0.1, 0.3, 0.5
    masks = dsff.init_masks_element(params, density, jax.random.PRNGKey(1),
                                    mode="uniform_ori")
    p = dsff.apply_masks(params, masks)
    nrng = np.random.RandomState(0)
    grads = jax.tree_util.tree_map(
        lambda x: jnp.asarray(nrng.randn(*x.shape).astype(np.float32)), p)
    fired = dict(masks)
    update_freq, iters_per_epoch, final_epoch = 10, 20, 10
    prev_ratio = 1.01
    dens0 = float(dsff.masks_density(masks, p))
    rng = jax.random.PRNGKey(2)
    dens_traj = []
    for k in range(1, 24):
        steps = k * update_freq
        tw = float(sum(mm.size for mm in masks.values()))
        tn = float(sum(np.asarray(mm).sum() for mm in masks.values()))
        ratio = dsff.grow_schedule_ratio(
            steps, update_freq, iters_per_epoch, density, final_density,
            death_rate, tw, tn, tn / tw, prev_ratio,
            init_prune_epoch=0, final_prune_epoch=final_epoch)
        prev_ratio = ratio
        rng, sub = jax.random.split(rng)
        masks, _ = dsff.truncate_weights_global(
            p, grads, masks, sub, jnp.float32(death_rate),
            jnp.float32(ratio))
        # simulate the inter-update SGD steps: alive weights move, so
        # freshly grown (zero) weights become nonzero before the next prune
        p = jax.tree_util.tree_map(
            lambda x: x + 0.05 * jnp.asarray(
                nrng.randn(*x.shape).astype(np.float32)), p)
        p = dsff.apply_masks(p, masks)
        old_fired = fired
        fired = dsff.update_fired(fired, masks)
        assert all(np.all(np.asarray(fired[q]) >= np.asarray(old_fired[q]))
                   for q in fired)
        dens_traj.append(float(dsff.masks_density(masks, p)))
    assert dens_traj[2] > dens0  # growing toward final_density
    assert dens_traj[-1] == pytest.approx(final_density, abs=0.03)
    assert float(dsff.fired_ratio(fired)) >= dens0


def test_mask_update_step_global(model_and_params):
    """make_mask_update_step(prune_mode='global') jits and keeps params +
    momentum masked."""
    from e2enet_tpu.training.train_state import make_mask_update_step
    m, params = model_and_params
    masks = dsff.init_masks_element(params, 0.4, jax.random.PRNGKey(3),
                                    mode="ERK")
    state = create_train_state(params, masks)
    grads = jax.tree_util.tree_map(jnp.ones_like, state.params)
    upd = make_mask_update_step("gradient", prune_mode="global",
                                granularity="element")
    new_state = upd(state, jnp.float32(0.3), grads, jnp.float32(1.0))
    masked = dsff.select_masked(new_state.params)
    for path, w in masked.items():
        msk = np.asarray(new_state.masks[path])
        assert (np.abs(np.asarray(w))[msk == 0] == 0).all()
