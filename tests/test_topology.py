"""Pool/conv topology solver: parity with the reference
get_pool_and_conv_props (common_utils.py:89-154) on known geometries."""
import numpy as np
import pytest

from e2enet_tpu.planning.topology import (get_network_numpool,
                                          get_pool_and_conv_props,
                                          get_shape_must_be_divisible_by,
                                          pad_shape)


def test_isotropic_128():
    npa, pools, convs, patch, div = get_pool_and_conv_props(
        (1.0, 1.0, 1.0), (128, 128, 128), 4, 999)
    assert npa == [5, 5, 5]
    assert pools == [[2, 2, 2]] * 5
    assert convs == [[3, 3, 3]] * 6
    assert list(patch) == [128, 128, 128]
    assert list(div) == [32, 32, 32]


def test_anisotropic_spacing_delays_pooling():
    # spacing (3.0, 0.78, 0.78): first pools hit only in-plane axes; the
    # first conv kernels are (1,3,3) until z spacing falls within 2x
    npa, pools, convs, patch, div = get_pool_and_conv_props(
        (3.0, 0.78, 0.78), (48, 192, 192), 4, 999)
    assert pools[0] == [1, 2, 2]
    assert convs[0] == [1, 3, 3]
    assert convs[-1] == [3, 3, 3]  # bottleneck always full
    # every axis divisible by 2**num_pool_per_axis
    for i in range(3):
        assert patch[i] % (2 ** npa[i]) == 0


def test_pad_shape():
    assert list(pad_shape([100, 100, 100], [32, 32, 32])) == [128, 128, 128]
    assert list(pad_shape([128, 64, 32], [32, 32, 32])) == [128, 64, 32]
    assert list(pad_shape([33, 31, 1], [8, 8, 1])) == [40, 32, 1]


def test_get_network_numpool():
    assert get_network_numpool([128, 128, 128]) == [5, 5, 5]
    assert get_network_numpool([40, 56, 40]) == [3, 3, 3]


@pytest.mark.skipif(not __import__("os").path.isdir("/root/reference"),
                    reason="reference not mounted")
@pytest.mark.parametrize("spacing,patch", [
    ((1.0, 1.0, 1.0), (128, 128, 128)),
    ((3.0, 0.78, 0.78), (48, 192, 192)),
    ((1.0, 0.5, 0.5), (96, 160, 160)),
    ((5.0, 0.8, 0.8), (20, 192, 192)),
    ((2.5, 0.85, 0.85), (64, 128, 128)),
])
def test_against_reference_solver(spacing, patch):
    from conftest import stub_reference_deps
    stub_reference_deps()
    from e2enet.experiment_planning.common_utils import (
        get_pool_and_conv_props as ref_solver)
    ours = get_pool_and_conv_props(spacing, patch, 4, 999)
    theirs = ref_solver(spacing, patch, 4, 999)
    assert ours[0] == theirs[0]
    assert ours[1] == theirs[1]
    assert ours[2] == theirs[2]
    np.testing.assert_array_equal(ours[3], theirs[3])
    np.testing.assert_array_equal(ours[4], theirs[4])
