"""VolumeDoF / P0 space: counts, integrals, mass operator, P1<->P0
conversions (reference: tests for VolumeDoFFunction / P0Function)."""

import numpy as np
import jax.numpy as jnp
import pytest

from hyteg_tpu.core.types import BoundaryCondition, DoFType
from hyteg_tpu.functions.p1 import P1Space
from hyteg_tpu.functions.volume import (P0Function, VolumeDoFSpace, p0_to_p1,
                                        p1_to_p0)
from hyteg_tpu.mesh import meshinfo as mi
from hyteg_tpu.primitives.storage import CellStorage


@pytest.mark.parametrize("dim,level", [(2, 3), (3, 2)])
def test_counts_and_volumes(dim, level):
    mesh = mi.mesh_rectangle(nx=2, ny=1) if dim == 2 else mi.mesh_unit_cube(1)
    st = CellStorage(mesh, num_shards=1)
    vs = VolumeDoFSpace(st, level)
    n_macro = int(np.asarray(st.cell_valid).sum())
    # uniform refinement: (2^level)^dim * T_per... each macro-simplex splits
    # into (2^dim)^level micro-elements
    expect = n_macro * (2 ** dim) ** level
    assert vs.num_global_dofs() == expect
    # volumes sum to the domain measure (unit square area 1 / cube volume 1)
    total = float(jnp.sum(vs.elem_volumes))
    np.testing.assert_allclose(total, 1.0, rtol=1e-5)


def test_interpolate_and_integral():
    st = CellStorage(mi.mesh_rectangle(nx=1, ny=1), num_shards=1)
    vs = VolumeDoFSpace(st, 4)
    f = P0Function(vs).interpolate(lambda x: x[..., 0])
    # midpoint quadrature of x over the unit square = 1/2 (exact for linears)
    np.testing.assert_allclose(float(f.integral()), 0.5, rtol=1e-5)
    m = vs.mass_apply(f.values)
    np.testing.assert_allclose(float(jnp.sum(m * 1.0)), 0.5, rtol=1e-5)
    back = vs.inverse_mass_apply(m)
    np.testing.assert_allclose(np.asarray(back), np.asarray(f.values),
                               rtol=1e-5)


def test_p1_p0_roundtrip_constant():
    st = CellStorage(mi.mesh_unit_cube(1), num_shards=1)
    level = 2
    sp = P1Space(st, level)
    vs = VolumeDoFSpace(st, level)
    bc = BoundaryCondition.all_dirichlet()
    u = sp.interpolate(lambda x: 3.0 + 0 * x[..., 0], sp.zeros(),
                       DoFType.ALL, bc)
    p0 = p1_to_p0(sp, u, vs)
    w = vs._valid_weight > 0
    np.testing.assert_allclose(np.asarray(p0)[w], 3.0, rtol=1e-6)
    u2 = p0_to_p1(vs, p0, sp)
    mask = np.asarray(sp.vertex_mask)
    vals = np.asarray(u2)[:, mask][np.asarray(st.cell_valid)]
    np.testing.assert_allclose(vals, 3.0, rtol=1e-5)


def test_p1_to_p0_linear_mean():
    st = CellStorage(mi.mesh_rectangle(nx=1, ny=1), num_shards=1)
    level = 3
    sp = P1Space(st, level)
    vs = VolumeDoFSpace(st, level)
    bc = BoundaryCondition.all_dirichlet()
    u = sp.interpolate(lambda x: x[..., 0] + 2 * x[..., 1], sp.zeros(),
                       DoFType.ALL, bc)
    p0 = p1_to_p0(sp, u, vs)
    # element mean of a linear == value at centroid
    cent = np.asarray(vs.elem_centroids())
    want = cent[..., 0] + 2 * cent[..., 1]
    sel = vs._valid_weight > 0
    np.testing.assert_allclose(np.asarray(p0)[sel], want[sel], rtol=1e-4)


def test_multidof():
    st = CellStorage(mi.mesh_rectangle(nx=1, ny=1), num_shards=1)
    vs = VolumeDoFSpace(st, 2, ndofs=3)
    z = vs.zeros()
    assert z.shape[-1] == 3
    assert vs.num_global_dofs() == 3 * 2 * 4 ** 2
    u = vs.interpolate(1.0)
    assert float(vs.dot(u, u)) == vs.num_global_dofs()
