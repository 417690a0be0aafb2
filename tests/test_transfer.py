"""Grid-transfer operators: exactness on linears, transpose property
(reference tests: tests/hyteg/P1/P1ProlongateTest.cpp, restriction tests)."""

import numpy as np
import pytest

import jax.numpy as jnp

from hyteg_tpu.functions.p1 import P1Space
from hyteg_tpu.mesh import meshinfo as mi
from hyteg_tpu.operators.transfer import P1Transfer
from hyteg_tpu.primitives.storage import CellStorage
from tests.test_operator import _from_blocks, _to_blocks


@pytest.mark.parametrize(
    "mesh_fn,clevel",
    [
        (lambda: mi.mesh_unit_cube(1), 1),
        (lambda: mi.mesh_rectangle((0, 0), (1, 1), 2, 1), 2),
        (lambda: mi.mesh_spherical_shell(0, 1, 0.5, 1.0), 1),
    ],
)
def test_prolongation_exact_on_linears(mesh_fn, clevel):
    storage = CellStorage(mesh_fn(), num_shards=1)
    cs, fs = P1Space(storage, clevel), P1Space(storage, clevel + 1)
    tr = P1Transfer(cs, fs)
    lin = lambda x: 1.0 + 2 * x[..., 0] - x[..., 1] + 3 * x[..., 2]
    uc = cs.function().interpolate(lin)
    uf_expect = fs.function().interpolate(lin)
    uf = tr.prolongate(uc.cells)
    assert np.allclose(np.asarray(uf), np.asarray(uf_expect.cells), atol=1e-5)


def test_prolongation_keeps_replica_consistency():
    from tests.test_p1_ops import _replica_spread

    storage = CellStorage(mi.mesh_unit_cube(1), num_shards=1)
    cs, fs = P1Space(storage, 1), P1Space(storage, 2)
    tr = P1Transfer(cs, fs)
    rng = np.random.default_rng(3)
    v = rng.standard_normal(cs.num_global_dofs())
    uc = _to_blocks(cs, v)
    uf = tr.prolongate(uc)
    assert _replica_spread(fs, uf) == 0.0


def test_restriction_is_transpose():
    storage = CellStorage(mi.mesh_unit_cube(1), num_shards=1)
    cs, fs = P1Space(storage, 1), P1Space(storage, 2)
    tr = P1Transfer(cs, fs)
    rng = np.random.default_rng(4)
    nc, nf = cs.num_global_dofs(), fs.num_global_dofs()
    # build dense P by prolongating unit vectors
    P = np.zeros((nf, nc))
    for j in range(nc):
        e = np.zeros(nc)
        e[j] = 1.0
        P[:, j] = _from_blocks(fs, tr.prolongate(_to_blocks(cs, e)))
    # build dense R by restricting unit vectors
    R = np.zeros((nc, nf))
    for j in range(nf):
        e = np.zeros(nf)
        e[j] = 1.0
        R[:, j] = _from_blocks(cs, tr.restrict(_to_blocks(fs, e)))
    assert np.allclose(R, P.T, atol=1e-5)


def test_injection():
    storage = CellStorage(mi.mesh_unit_cube(1), num_shards=1)
    cs, fs = P1Space(storage, 1), P1Space(storage, 2)
    tr = P1Transfer(cs, fs)
    lin = lambda x: x[..., 0] * x[..., 1] + x[..., 2]
    uf = fs.function().interpolate(lin)
    uc = tr.restrict_injection(uf.cells)
    uc_expect = cs.function().interpolate(lin)
    assert np.allclose(np.asarray(uc), np.asarray(uc_expect.cells), atol=1e-5)
