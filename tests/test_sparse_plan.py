"""DSFF row-sparse inference plan: the sparse forward (gathered alive
channels, pruned up-links, chained intra-stack pruning) must match the
dense masked (w * mask) forward — the reference's inference semantics
(core_channel.py:427-434) — up to summation order.

Covers the quadrant level-0 kernels (interpret mode), the plain fused CF
kernels, and the deep XLA path in one model, plus the pure-XLA model."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from e2enet_tpu.models.sparse_plan import build_sparse_plan, plan_density
from e2enet_tpu.models.unetpp import ShiftUNetPlusPlus
from e2enet_tpu.training import dsff

POOLS = ((2, 2, 2), (2, 2, 2), (2, 2, 2))


def _mk(key, shape):
    return jax.random.normal(key, shape, jnp.float32)


def _row_masked_setup(model, x, density=0.4, seed=3):
    params = model.init(jax.random.PRNGKey(1), x)["params"]
    masks = dsff.init_masks_row(params, density, jax.random.PRNGKey(seed),
                                density_48_override=density)
    params = dsff.apply_masks(params, masks)
    plan = build_sparse_plan(masks)
    assert plan is not None and len(plan) > 0
    assert plan_density(plan, masks) < 0.7
    return params, masks, plan


@pytest.mark.parametrize("fused", [False, True])
def test_sparse_forward_matches_dense_masked(fused):
    kw = dict(input_channels=1, num_classes=3, pool_op_kernel_sizes=POOLS,
              base_num_features=8, max_num_features=32,
              compute_dtype=jnp.float32, remat=False)
    if fused:
        kw.update(fused=True, fused_interpret=True, quadrant=True)
    else:
        kw.update(fused=False, quadrant=False)
    dense = ShiftUNetPlusPlus(**kw)
    x = _mk(jax.random.PRNGKey(0), (1, 8, 16, 16, 1))
    params, masks, plan = _row_masked_setup(dense, x)

    sparse = ShiftUNetPlusPlus(**kw, sparse_plan=plan)
    # identical parameter tree: the plan only gathers at trace time
    outs_d = dense.apply({"params": params}, x, do_ds=True)
    outs_s = sparse.apply({"params": params}, x, do_ds=True)
    assert len(outs_d) == len(outs_s)
    for a, b in zip(outs_d, outs_s):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-5, atol=2e-5)


def test_sparse_plan_skips_unstructured_masks():
    m = ShiftUNetPlusPlus(input_channels=1, num_classes=2,
                          pool_op_kernel_sizes=POOLS[:2],
                          base_num_features=8, max_num_features=32,
                          compute_dtype=jnp.float32)
    params = m.init(jax.random.PRNGKey(0),
                    jnp.zeros((1, 4, 8, 8, 1)))["params"]
    km = dsff.init_masks(params, 0.3, jax.random.PRNGKey(1))  # pair-granular
    assert build_sparse_plan(km) is None


def test_sparse_plan_quadrant_logits_and_bf16():
    """The production inference config (bf16 weights, quadrant logits,
    flip variants) under a sparse plan stays consistent with its own dense
    run — bf16 tolerance."""
    kw = dict(input_channels=1, num_classes=3,
              pool_op_kernel_sizes=POOLS[:2], base_num_features=8,
              max_num_features=32, compute_dtype=jnp.float32,
              fused=True, fused_interpret=True, quadrant=True, remat=False)
    dense = ShiftUNetPlusPlus(**kw)
    x = _mk(jax.random.PRNGKey(5), (1, 8, 16, 16, 1))
    params, masks, plan = _row_masked_setup(dense, x, seed=9)
    for flips in [(False, False, False), (True, False, True)]:
        d = ShiftUNetPlusPlus(**kw, flips=flips)
        s = ShiftUNetPlusPlus(**kw, flips=flips, sparse_plan=plan)
        a = d.apply({"params": params}, x, do_ds=False)
        b = s.apply({"params": params}, x, do_ds=False)
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-5, atol=2e-5)
