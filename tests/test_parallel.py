"""Multi-device sharding: dp+sp mesh train step on the virtual 8-CPU mesh
(the dryrun_multichip path the driver validates)."""
import numpy as np
import pytest
import jax

import sys
sys.path.insert(0, __file__.rsplit("/tests/", 1)[0])


def test_mesh_shapes():
    from e2enet_tpu.parallel.mesh import make_mesh
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(jax.devices()[:8], spatial_parallel=2)
    assert mesh.shape == {"data": 4, "space": 2}
    mesh2 = make_mesh(jax.devices()[:8])
    assert mesh2.shape == {"data": 8, "space": 1}


def test_dryrun_multichip():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from __graft_entry__ import dryrun_multichip
    dryrun_multichip(8)


def test_entry_compiles():
    from __graft_entry__ import entry
    fn, (params, x) = entry()
    out_shape = jax.eval_shape(jax.jit(fn), params, x)
    assert out_shape.shape == (1, 8, 64, 64, 3)
