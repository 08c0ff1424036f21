"""Native C++ affine warp (e2enet_tpu/native) vs scipy semantics, plus a
throughput sanity check against the scipy path it replaces."""
import numpy as np
import pytest
from scipy.ndimage import affine_transform

from e2enet_tpu.native import (affine_warp, affine_warp_seg,
                               native_available)

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="no g++ / native build failed")


def _rot(ax):
    c, s = np.cos(ax), np.sin(ax)
    return np.array([[1, 0, 0], [0, c, -s], [0, s, c]])


def test_order1_matches_scipy():
    rng = np.random.RandomState(0)
    vol = rng.rand(2, 12, 14, 16).astype(np.float32)
    M = _rot(0.3) * 1.1
    offset = np.array([1.2, -0.7, 0.4])
    out_shape = (10, 12, 13)
    ref = np.stack([affine_transform(vol[c].astype(float), M, offset=offset,
                                     output_shape=out_shape, order=1,
                                     mode="constant", cval=0.0)
                    for c in range(2)])
    out = affine_warp(vol, M, offset, out_shape, order=1)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_order0_matches_scipy():
    rng = np.random.RandomState(1)
    vol = rng.rand(10, 11, 12).astype(np.float32)
    M = np.eye(3) * 0.9
    offset = np.array([0.3, 0.3, 0.3])
    ref = affine_transform(vol.astype(float), M, offset=offset,
                           output_shape=(9, 9, 9), order=0,
                           mode="constant", cval=0.0)
    out = affine_warp(vol, M, offset, (9, 9, 9), order=0)
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_order3_sane():
    """Keys cubic (not scipy's B-spline): check interpolation properties —
    reproduces the identity exactly and stays close to linear."""
    rng = np.random.RandomState(2)
    vol = rng.rand(10, 12, 14).astype(np.float32)
    eye = np.eye(3)
    out = affine_warp(vol, eye, np.zeros(3), vol.shape, order=3)
    np.testing.assert_allclose(out, vol, atol=1e-5)
    M = _rot(0.2)
    offset = np.array([0.5, -0.25, 0.1])
    o3 = affine_warp(vol, M, offset, (8, 10, 12), order=3)
    o1 = affine_warp(vol, M, offset, (8, 10, 12), order=1)
    assert np.abs(o3 - o1).mean() < 0.06
    assert np.isfinite(o3).all()


def test_seg_warp_matches_per_label_threshold():
    """Single-pass label warp == the reference's per-label linear + >=0.5
    ascending-overwrite loop (data/augment.py:_interpolate_seg)."""
    rng = np.random.RandomState(3)
    seg = (rng.rand(12, 13, 14) * 3.99).astype(int).astype(np.float32)
    M = _rot(0.25) * 1.05
    offset = np.array([0.8, -0.3, 0.6])
    out_shape = (10, 11, 12)
    cval = 0.0
    result = np.ones(out_shape) * cval
    for c in np.unique(seg):
        r = affine_transform((seg == c).astype(float), M, offset=offset,
                             output_shape=out_shape, order=1,
                             mode="constant", cval=0)
        result[r >= 0.5] = c
    out = affine_warp_seg(seg, M, offset, out_shape, cval=cval)
    agree = (out == result).mean()
    assert agree > 0.995, agree      # borderline 0.5 ties may differ in f32


def test_augment_uses_native(monkeypatch):
    """spatial_augment_sample routes through the native path and produces
    the right shapes/labels."""
    from e2enet_tpu.data.augment import AugmentParams, spatial_augment_sample
    rng = np.random.RandomState(4)
    data = rng.rand(1, 20, 22, 24).astype(np.float32)
    seg = (rng.rand(1, 20, 22, 24) * 2.99).astype(int).astype(np.float32)
    params = AugmentParams(patch_size=(12, 12, 12), p_rot=1.0, p_scale=1.0)
    d, s = spatial_augment_sample(data, seg, params,
                                  np.random.RandomState(5))
    assert d.shape == (1, 12, 12, 12) and s.shape == (1, 12, 12, 12)
    assert set(np.unique(s)).issubset({-1, 0, 1, 2})
    assert np.isfinite(d).all()
