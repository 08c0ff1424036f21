"""Sliding-window step grid: port of the reference's only real unit test
(tests/test_steps_for_sliding_window_prediction.py) — hand-verified grids,
degenerate cases, and a randomized full-coverage property test — plus checks
of the Gaussian map and the fused tiled predictor."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from e2enet_tpu.ops.sliding import (bucket_num_tiles,
                                    compute_steps_for_sliding_window,
                                    flip_combinations,
                                    gaussian_importance_map,
                                    make_tiled_predictor,
                                    pad_volume_to_patch,
                                    predict_volume_tiled)


def _verify_steps(steps, patch_size, image_size, step_size):
    for dim in range(len(steps)):
        steps_here = steps[dim]
        assert steps_here[0] == 0
        assert steps_here[-1] == image_size[dim] - patch_size[dim]
        # reference invariant: gaps at most ceil(patch*step_size) and tiles
        # overlap or touch (reference test :49-58)
        target = np.ceil(patch_size[dim] * step_size)
        for s0, s1 in zip(steps_here[:-1], steps_here[1:]):
            assert 0 < s1 - s0 <= target
            assert s1 <= s0 + patch_size[dim]
        # full coverage
        covered = np.zeros(image_size[dim], bool)
        for s in steps_here:
            covered[s:s + patch_size[dim]] = True
        assert covered.all()


def test_degenerate_patch_equals_image():
    steps = compute_steps_for_sliding_window((64, 64, 64), (64, 64, 64), 0.5)
    assert steps == [[0], [0], [0]]


def test_known_grid():
    # reference docstring case: image 110, patch 64, step 0.5 -> 0, 23, 46
    steps = compute_steps_for_sliding_window((64,), (110,), 0.5)
    assert steps == [[0, 23, 46]]


@pytest.mark.parametrize("patch,image,step", [
    ((30, 224, 224), (162, 333, 333), 0.5),   # Heart-ish
    ((64, 160, 160), (64, 320, 320), 0.5),    # Liver-ish
    ((40, 56, 40), (36 + 40, 60, 48), 0.5),   # Hippocampus-ish
    ((96, 160, 128), (96, 160, 128), 1.0),
])
def test_grid_properties(patch, image, step):
    steps = compute_steps_for_sliding_window(patch, image, step)
    _verify_steps(steps, patch, image, step)


def test_randomized_coverage():
    rng = np.random.RandomState(42)
    for _ in range(300):
        dim = 3
        patch = rng.randint(8, 64, dim)
        image = patch + rng.randint(0, 80, dim)
        step = rng.uniform(0.3, 1.0)
        steps = compute_steps_for_sliding_window(tuple(patch), tuple(image),
                                                 step)
        _verify_steps(steps, patch, image, step)


@pytest.mark.skipif(not __import__("os").path.isdir("/root/reference"),
                    reason="reference not mounted")
def test_steps_match_reference():
    from conftest import stub_reference_deps
    stub_reference_deps()
    from e2enet.network_architecture.neural_network import NeuralNetwork, \
        SegmentationNetwork
    ref_fn = SegmentationNetwork._compute_steps_for_sliding_window
    rng = np.random.RandomState(0)
    for _ in range(100):
        patch = tuple(rng.randint(8, 64, 3))
        image = tuple(np.array(patch) + rng.randint(0, 64, 3))
        step = float(rng.uniform(0.3, 1.0))
        assert compute_steps_for_sliding_window(patch, image, step) == \
            ref_fn(patch, image, step)


def test_gaussian_map_properties():
    g = gaussian_importance_map((16, 24, 20))
    assert g.shape == (16, 24, 20)
    assert g.max() == pytest.approx(1.0)
    assert (g > 0).all()
    center = g[8, 12, 10]
    assert center == pytest.approx(1.0)


@pytest.mark.skipif(not __import__("os").path.isdir("/root/reference"),
                    reason="reference not mounted")
def test_gaussian_matches_reference():
    from conftest import stub_reference_deps
    stub_reference_deps()
    from e2enet.network_architecture.neural_network import SegmentationNetwork
    ours = gaussian_importance_map((12, 20, 16))
    theirs = SegmentationNetwork._get_gaussian((12, 20, 16))
    np.testing.assert_allclose(ours, theirs, rtol=1e-6, atol=1e-7)


def test_flip_combinations():
    combos = flip_combinations((0, 1, 2))
    assert len(combos) == 8
    assert combos[0] == ()
    assert set(map(frozenset, combos)) == {
        frozenset(c) for c in [(), (0,), (1,), (2,), (0, 1), (0, 2), (1, 2),
                               (0, 1, 2)]}


def test_pad_and_bucket():
    data = np.zeros((2, 10, 30, 30), np.float32)
    padded, slicer = pad_volume_to_patch(data, (16, 16, 16))
    assert padded.shape == (2, 16, 30, 30)
    assert padded[slicer].shape == data.shape
    assert bucket_num_tiles(3) == 4
    assert bucket_num_tiles(1) == 1
    assert bucket_num_tiles(100) == 128


def test_tiled_predictor_uniform_model():
    """A constant-logits model must produce exactly the softmax of its
    logits everywhere after Gaussian-weighted accumulation + normalization,
    independent of tiling — validates scatter-add and weight bookkeeping."""
    logits = np.array([0.5, -1.0, 2.0], np.float32)

    def apply_fn(params, x):
        B, d, h, w, _ = x.shape
        return jnp.broadcast_to(jnp.asarray(logits), (B, d, h, w, 3))

    data = np.random.RandomState(0).randn(1, 20, 28, 24).astype(np.float32)
    probs = predict_volume_tiled(apply_fn, {}, data, (16, 16, 16), 3,
                                 step_size=0.5, do_mirroring=True)
    assert probs.shape == (3, 20, 28, 24)
    expected = np.exp(logits) / np.exp(logits).sum()
    for c in range(3):
        np.testing.assert_allclose(probs[c], expected[c], rtol=1e-4,
                                   atol=1e-5)


def test_tiled_predictor_respects_content():
    """A model that passes through channel 0 of the input: flips must undo
    correctly (TTA equivariance) so output tracks the input."""
    def apply_fn(params, x):
        v = x[..., :1]
        return jnp.concatenate([v, -v], axis=-1) * 5.0

    rng = np.random.RandomState(1)
    data = rng.randn(1, 16, 16, 16).astype(np.float32)
    probs = predict_volume_tiled(apply_fn, {}, data, (16, 16, 16), 2,
                                 step_size=0.5, do_mirroring=True)
    # where data > 0, class 0 should dominate
    seg = probs.argmax(0)
    agree = ((data[0] > 0) == (seg == 0)).mean()
    assert agree > 0.99
