"""Depth-shift op: parity with the reference torch_shift semantics
(unetpp_d.py:38-59) including torch.chunk group boundaries when C % n != 0."""
import numpy as np
import pytest
import jax.numpy as jnp

from e2enet_tpu.ops.shift import (chunk_sizes, depth_shift,
                                  depth_shift_reference_numpy, group_shifts)


@pytest.mark.parametrize("C,n", [(48, 5), (10, 5), (4, 5), (7, 5), (3, 5),
                                 (96, 5), (320, 5), (48, 3), (1, 5), (5, 5)])
def test_chunk_sizes_match_torch(C, n):
    torch = pytest.importorskip("torch")
    t = torch.zeros(1, C, 2)
    expected = [c.shape[1] for c in torch.chunk(t, n, 1)]
    assert chunk_sizes(C, n) == expected


def test_group_shifts_basic():
    # C=48, n=5 -> groups [10,10,10,10,8], shifts [-2,-1,0,1,2]
    gs = group_shifts(48, 5)
    assert [g[2] for g in gs] == [-2, -1, 0, 1, 2]
    assert [g[1] - g[0] for g in gs] == [10, 10, 10, 10, 8]


def test_group_shifts_fewer_chunks():
    # C=4, n=5 -> torch.chunk gives 4 chunks of 1; shifts truncate to
    # [-2,-1,0,1] by zip semantics
    gs = group_shifts(4, 5)
    assert [g[2] for g in gs] == [-2, -1, 0, 1]


@pytest.mark.parametrize("C,D,n", [(48, 8, 5), (10, 6, 5), (7, 5, 5),
                                   (96, 4, 5), (12, 7, 3)])
def test_depth_shift_matches_numpy_oracle(C, D, n):
    rng = np.random.RandomState(0)
    x = rng.randn(2, C, D, 3, 4).astype(np.float32)   # NCDHW oracle layout
    expected = depth_shift_reference_numpy(x, n)
    # ours: channels-last, depth axis 1
    x_cl = np.transpose(x, (0, 2, 3, 4, 1))
    got = np.asarray(depth_shift(jnp.asarray(x_cl), n, axis=1))
    got_ncdhw = np.transpose(got, (0, 4, 1, 2, 3))
    np.testing.assert_allclose(got_ncdhw, expected, rtol=0, atol=0)


def test_depth_shift_matches_torch_reference():
    """Oracle constructed with torch ops exactly as the reference does:
    pad -> chunk -> roll -> cat -> narrow (unetpp_d.py:45-59)."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F
    rng = np.random.RandomState(1)
    for C, n in [(48, 5), (13, 5), (4, 5), (30, 3)]:
        x = torch.from_numpy(rng.randn(1, C, 9, 4, 5).astype(np.float32))
        pad = n // 2
        xp = F.pad(x, (0, 0, 0, 0, pad, pad))
        xs = torch.chunk(xp, n, 1)
        x_shift = [torch.roll(x_c, s, 2) for x_c, s in
                   zip(xs, range(-pad, pad + 1))]
        expected = torch.narrow(torch.cat(x_shift, 1), 2, pad,
                                x.shape[2]).numpy()
        x_cl = np.transpose(x.numpy(), (0, 2, 3, 4, 1))
        got = np.asarray(depth_shift(jnp.asarray(x_cl), n))
        np.testing.assert_allclose(
            np.transpose(got, (0, 4, 1, 2, 3)), expected, atol=0)


def test_depth_shift_identity_when_size_one():
    x = jnp.arange(24, dtype=jnp.float32).reshape(1, 2, 3, 4, 1).repeat(5, -1)
    np.testing.assert_array_equal(np.asarray(depth_shift(x, 1)), np.asarray(x))
