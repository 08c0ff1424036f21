"""Variant-zoo machinery: LR/momentum/loss schedules, region-based
training pieces, noDeepSupervision, seg bias / block-order knobs.

Reference parity anchors are cited per test (the variant subclasses in
/root/reference/e2enet/training/network_training/nnUNet_variants/ and
competitions_with_custom_Trainers/).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from e2enet_tpu.training import lr as lrs


def test_warmup_schedule_matches_reference_formula():
    # nnUNetTrainerV2_warmup.maybe_update_lr (:26-39)
    initial = 1e-2
    for ep in range(0, 50):
        assert lrs.warmup_poly_lr(ep, 1050, initial) == pytest.approx(
            (ep + 1) / 50 * initial)
    # after warmup: poly on (ep - 49)
    assert lrs.warmup_poly_lr(50, 1050, initial) == pytest.approx(
        lrs.poly_lr(1, 1050, initial, 0.9))
    assert lrs.warmup_poly_lr(500, 1050, initial) == pytest.approx(
        lrs.poly_lr(451, 1050, initial, 0.9))


def test_fixed_schedules():
    # nnUNetTrainerV2_SGD_fixedSchedule(:30-40) / fixedSchedule2(:37-44)
    lr0 = 1e-2
    assert lrs.fixed_schedule_lr(0, lr0) == lr0
    assert lrs.fixed_schedule_lr(499, lr0) == lr0
    assert lrs.fixed_schedule_lr(500, lr0) == pytest.approx(lr0 * 0.1)
    assert lrs.fixed_schedule_lr(675, lr0) == pytest.approx(lr0 * 0.01)
    assert lrs.fixed_schedule_lr(850, lr0) == pytest.approx(lr0 * 0.001)
    assert lrs.fixed_schedule2_lr(674, 1000, lr0) == pytest.approx(lr0 * 0.1)
    assert lrs.fixed_schedule2_lr(675, 1000, lr0) == pytest.approx(
        lrs.poly_lr(0, 325, lr0 * 0.1, 0.9))


def test_cycle_at_end():
    # nnUNetTrainerV2_cycleAtEnd (cycle_lr :22-29, maybe_update_lr :52-63)
    lr0 = 1e-2
    assert lrs.cycle_at_end_lr(999, lr0) == pytest.approx(
        lrs.poly_lr(999, 1000, lr0, 0.9))
    assert lrs.cycle_at_end_lr(1000, lr0) == pytest.approx(1e-6)
    assert lrs.cycle_at_end_lr(1050, lr0) == pytest.approx(1e-3)
    # falling edge
    assert lrs.cycle_at_end_lr(1075, lr0) == pytest.approx(
        1e-3 - (1e-3 - 1e-6) / 50 * 25)


def test_reduce_momentum():
    # nnUNetTrainerV2_reduceMomentumDuringTraining (:27-37)
    assert lrs.reduce_momentum(800) == 0.99
    assert lrs.reduce_momentum(900) == pytest.approx(
        0.99 - (0.99 - 0.9) / 200 * 100)
    assert lrs.reduce_momentum(1000) == pytest.approx(0.9)
    assert lrs.reduce_momentum(5000) == 0.9


def test_ce_to_dice_weights():
    # nnUNetTrainerV2_graduallyTransitionFromCEToDice.update_loss (:28-41)
    assert lrs.ce_to_dice_weights(0, 1000) == (2.0, 0.0)
    assert lrs.ce_to_dice_weights(500, 1000) == (2.0, 0.0)
    wce, wd = lrs.ce_to_dice_weights(625, 1000)
    assert wce == pytest.approx(1.0) and wd == pytest.approx(1.0)
    assert lrs.ce_to_dice_weights(751, 1000) == (0.0, 2.0)


def test_plateau_scheduler_reduces_after_patience():
    # torch ReduceLROnPlateau(mode min, factor .2, patience 30, thr 1e-3)
    # as configured in nnUNetTrainer.py:271-274
    sch = lrs.ReduceLROnPlateau(1e-2, factor=0.2, patience=3,
                                threshold=1e-3)
    sch.step(1.0)
    for _ in range(3):
        assert sch.step(1.0) == pytest.approx(1e-2)   # within patience
    assert sch.step(1.0) == pytest.approx(2e-3)       # 4th bad epoch
    # improvement resets the counter
    sch.step(0.5)
    for _ in range(3):
        assert sch.step(0.5) == pytest.approx(2e-3)


def test_region_target_conversion_and_losses():
    # ConvertSegmentationToRegionsTransform + DC_and_BCE semantics
    # (nnUNetTrainerV2BraTSRegions.py:66-140)
    from e2enet_tpu.training.regions import (convert_seg_to_regions,
                                             get_brats_regions,
                                             regions_seg_from_probs)
    regions = tuple(get_brats_regions().values())
    assert regions == ((1, 2, 3), (2, 3), (3,))
    seg = np.array([[[[0, 1], [2, 3]]]], np.int32)        # (1,1,2,2)
    t = convert_seg_to_regions(seg, regions)
    assert t.shape == (1, 1, 2, 2, 3)
    np.testing.assert_array_equal(t[0, 0, :, :, 0], [[0, 1], [1, 1]])
    np.testing.assert_array_equal(t[0, 0, :, :, 1], [[0, 0], [1, 1]])
    np.testing.assert_array_equal(t[0, 0, :, :, 2], [[0, 0], [0, 1]])

    # losses accept the one-hot region targets
    from e2enet_tpu.ops.losses import (dc_and_bce_loss,
                                       hard_tp_fp_fn_regions,
                                       make_loss, soft_dice_regions)
    logits = jnp.asarray(np.random.RandomState(0).randn(1, 1, 2, 2, 3),
                         jnp.float32)
    tj = jnp.asarray(t)
    l1 = dc_and_bce_loss(logits, tj, batch_dice=False, smooth=0.0)
    l2 = soft_dice_regions(logits, tj)
    assert np.isfinite(float(l1)) and np.isfinite(float(l2))
    fn = make_loss("dice_regions", batch_dice=False, smooth=0.0)
    assert float(fn(logits, tj)) == pytest.approx(float(l2))
    tp, fp, fnn = hard_tp_fp_fn_regions(logits, tj)
    # hard counts: pred = sigmoid > 0.5 == logits > 0
    pred = np.asarray(logits) > 0
    np.testing.assert_array_equal(
        np.asarray(tp), (pred & (t > 0.5)).sum((0, 1, 2, 3)))

    # label reconstruction via regions_class_order
    probs = np.zeros((3, 1, 2, 2), np.float32)
    probs[0, 0] = [[0.9, 0.9], [0.9, 0.9]]
    probs[1, 0] = [[0, 0.9], [0, 0.9]]
    probs[2, 0] = [[0, 0], [0, 0.9]]
    out = regions_seg_from_probs(probs, (1, 2, 3))
    np.testing.assert_array_equal(out[0], [[1, 2], [1, 3]])


def test_dynamic_loss_weights_and_momentum_train_step():
    """CE->Dice transition + momentum reduction as traced args: one
    compile serves all epochs, and the weights/momentum actually bind."""
    from flax import linen as nn
    from e2enet_tpu.training.train_state import (create_train_state,
                                                 make_train_step)

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x, do_ds=True):
            y = nn.Dense(3)(x)
            return [y] if do_ds else y

    model = Tiny()
    x = jnp.ones((2, 4, 4, 4, 1), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    tgt = (jnp.zeros((2, 4, 4, 4), jnp.int32),)

    step = make_train_step(model, [1.0], donate=False,
                           dynamic_loss_weights=True,
                           dynamic_momentum=True)
    s0 = create_train_state(params, seed=0)
    s1, m1 = step(s0, x, tgt, jnp.float32(1e-2),
                  jnp.float32(2.0), jnp.float32(0.0), jnp.float32(0.99))
    s0b = create_train_state(params, seed=0)
    s2, m2 = step(s0b, x, tgt, jnp.float32(1e-2),
                  jnp.float32(0.0), jnp.float32(2.0), jnp.float32(0.9))
    # CE-only vs Dice-only losses differ; momentum difference changes params
    assert abs(float(m1["loss"]) - float(m2["loss"])) > 1e-6

    # reference formula check: loss(wce, wdice) == wce*ce + wdice*dc
    from e2enet_tpu.ops.losses import (robust_cross_entropy,
                                       soft_dice_loss)
    def fwd(p):
        return model.apply({"params": p}, x, do_ds=True)[0]
    logits = fwd(s0.params)
    ce = float(robust_cross_entropy(logits, tgt[0]))
    assert float(m1["loss"]) == pytest.approx(2.0 * ce, rel=1e-5)
    dc = float(soft_dice_loss(logits, tgt[0], batch_dice=True))
    assert float(m2["loss"]) == pytest.approx(2.0 * dc, rel=1e-5)


def test_no_deep_supervision_step():
    """ds_mode='none' (nnUNetTrainerV2_noDeepSupervision): single head,
    plain loss, do_ds=False apply."""
    from flax import linen as nn
    from e2enet_tpu.training.train_state import (create_train_state,
                                                 make_train_step)

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x, do_ds=True):
            y = nn.Dense(3)(x)
            return [y, y] if do_ds else y

    model = Tiny()
    x = jnp.ones((1, 2, 2, 2, 1), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    step = make_train_step(model, [1.0], donate=False, do_ds=False)
    s0 = create_train_state(params, seed=0)
    _, m = step(s0, x, (jnp.zeros((1, 2, 2, 2), jnp.int32),),
                jnp.float32(1e-2))
    assert np.isfinite(float(m["loss"]))


def test_model_variant_knobs_param_shapes():
    """seg_bias adds a head bias; nonlin_before_norm + lrelu2e1 build and
    run; 3ConvPerStage adds a third conv per stack."""
    from e2enet_tpu.models.unetpp import ShiftUNetPlusPlus
    common = dict(input_channels=1, num_classes=3,
                  pool_op_kernel_sizes=((2, 2, 2),) * 2,
                  base_num_features=4, compute_dtype=jnp.float32,
                  fused=False, quadrant=False)
    x = jnp.zeros((1, 8, 8, 8, 1), jnp.float32)

    m = ShiftUNetPlusPlus(seg_bias=True, **common)
    p = m.init(jax.random.PRNGKey(0), x)["params"]
    assert "bias" in p["seg_head0"]
    out = m.apply({"params": p}, x, do_ds=False)
    assert out.shape == (1, 8, 8, 8, 3)

    m2 = ShiftUNetPlusPlus(nonlin_before_norm=True, nonlin="lrelu2e1",
                           **common)
    p2 = m2.init(jax.random.PRNGKey(0), x)["params"]
    out2 = m2.apply({"params": p2}, x, do_ds=False)
    assert np.isfinite(np.asarray(out2)).all()

    m3 = ShiftUNetPlusPlus(num_conv_per_stage=3, **common)
    p3 = m3.init(jax.random.PRNGKey(0), x)["params"]
    assert "block2" in p3["context0"]


def test_variants_table_resolves():
    from e2enet_tpu.training.variants import VARIANTS, resolve_variant
    assert len(VARIANTS) >= 85
    for name in ("nnUNetTrainerV2_warmup", "nnUNetTrainerV2BraTSRegions",
                 "nnUNetTrainerV2_MMS", "nnUNetTrainerV2_fullEvals",
                 "nnUNetTrainerV2_DA3",
                 "nnUNetTrainerV2CascadeFullRes_EducatedGuess3"):
        resolve_variant(name)


def test_da_levels_apply():
    from e2enet_tpu.data.augment import AugmentParams
    from e2enet_tpu.training.variants import apply_da_level
    p = apply_da_level(AugmentParams(), "da3")
    assert p.independent_scale_per_axis and p.do_additive_brightness
    assert p.scale_range == (0.65, 1.6)
    p = apply_da_level(AugmentParams(), "cascade_eg3")
    assert p.cascade_random_binary_transform_p == 1.0
    assert p.cascade_random_binary_transform_p_per_label == 0.33
    assert p.cascade_remove_conn_comp_p == 0.0


def test_sigmoid_sliding_predictor():
    """Region-mode sliding window accumulates sigmoid probabilities
    (inference_apply_nonlin, BraTS trainers)."""
    from e2enet_tpu.ops.sliding import (make_tiled_predictor,
                                        predict_volume_tiled)
    num_regions = 2

    def apply_fn(params, x):
        # deterministic toy "network": logits from the input channel
        base = x[..., :1]
        return jnp.concatenate([base, -base], axis=-1)

    patch = (4, 4, 4)
    pred = make_tiled_predictor(apply_fn, patch, num_regions,
                                do_mirroring=False, nonlin="sigmoid")
    vol = np.random.RandomState(0).randn(1, 6, 6, 6).astype(np.float32)
    out = predict_volume_tiled(apply_fn, {}, vol, patch, num_regions,
                               do_mirroring=False, predictor=pred)
    expect = 1.0 / (1.0 + np.exp(-vol[0]))
    np.testing.assert_allclose(out[0], expect, atol=2e-3)
    np.testing.assert_allclose(out[1], 1 - expect, atol=2e-3)
