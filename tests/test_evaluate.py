"""Point evaluation (functions/evaluate.py) — exact reproduction of
polynomials of the space's degree, gradient evaluation, and macro-cell
crossing (the reference's VertexDoFFunction::evaluate semantics)."""

import numpy as np
import jax.numpy as jnp
import pytest

from hyteg_tpu.core.types import BoundaryCondition, DoFType
from hyteg_tpu.functions.evaluate import FieldEvaluator
from hyteg_tpu.functions.p1 import P1Space
from hyteg_tpu.functions.p2 import P2Space
from hyteg_tpu.mesh import meshinfo as mi
from hyteg_tpu.primitives.storage import CellStorage

RNG = np.random.default_rng(7)


def _pts(dim, q=64):
    return RNG.uniform(0.06, 0.94, size=(q, dim))


@pytest.mark.parametrize("dim", [2, 3])
def test_p1_linear_exact(dim):
    mesh = mi.mesh_rectangle(nx=2, ny=2) if dim == 2 else mi.mesh_unit_cube(1)
    storage = CellStorage(mesh, num_shards=1)
    sp = P1Space(storage, 2)
    f = lambda x: 2.0 * x[..., 0] - 0.5 * x[..., 1] + (x[..., 2] if dim == 3 else 0.0) + 1.0
    u = sp.interpolate(f, sp.zeros(), DoFType.ALL, BoundaryCondition.all_dirichlet())
    ev = FieldEvaluator(storage, 2, degree=1)
    pts = _pts(dim)
    got = np.asarray(ev.evaluate(u, jnp.asarray(pts)))
    want = 2.0 * pts[:, 0] - 0.5 * pts[:, 1] + (pts[:, 2] if dim == 3 else 0.0) + 1.0
    np.testing.assert_allclose(got, want, rtol=0, atol=5e-5)


@pytest.mark.parametrize("dim", [2, 3])
def test_p2_quadratic_exact(dim):
    mesh = mi.mesh_rectangle(nx=2, ny=1) if dim == 2 else mi.mesh_unit_cube(1)
    storage = CellStorage(mesh, num_shards=1)
    sp = P2Space(storage, 1)
    f = lambda x: x[..., 0] ** 2 - 2.0 * x[..., 0] * x[..., 1] + 3.0 * x[..., 1] + 0.25
    u = sp.interpolate(f, sp.zeros(), DoFType.ALL, BoundaryCondition.all_dirichlet())
    ev = FieldEvaluator(storage, 1, degree=2)
    pts = _pts(dim)
    got = np.asarray(ev.evaluate(u, jnp.asarray(pts)))
    want = pts[:, 0] ** 2 - 2.0 * pts[:, 0] * pts[:, 1] + 3.0 * pts[:, 1] + 0.25
    np.testing.assert_allclose(got, want, rtol=0, atol=2e-4)


def test_batched_components():
    mesh = mi.mesh_rectangle(nx=1, ny=1)
    storage = CellStorage(mesh, num_shards=1)
    sp = P1Space(storage, 3)
    bc = BoundaryCondition.all_dirichlet()
    ux = sp.interpolate(lambda x: x[..., 0], sp.zeros(), DoFType.ALL, bc)
    uy = sp.interpolate(lambda x: -x[..., 1], sp.zeros(), DoFType.ALL, bc)
    ev = FieldEvaluator(storage, 3, degree=1)
    pts = _pts(2, 16)
    got = np.asarray(ev.evaluate(jnp.stack([ux, uy]), jnp.asarray(pts)))
    np.testing.assert_allclose(got[0], pts[:, 0], atol=5e-6)
    np.testing.assert_allclose(got[1], -pts[:, 1], atol=5e-6)


def test_p1_gradient():
    mesh = mi.mesh_rectangle(nx=2, ny=2)
    storage = CellStorage(mesh, num_shards=1)
    sp = P1Space(storage, 2)
    bc = BoundaryCondition.all_dirichlet()
    u = sp.interpolate(lambda x: 3.0 * x[..., 0] + 7.0 * x[..., 1],
                       sp.zeros(), DoFType.ALL, bc)
    ev = FieldEvaluator(storage, 2, degree=1)
    g = np.asarray(ev.evaluate_gradient(u, jnp.asarray(_pts(2, 16))))
    np.testing.assert_allclose(g[:, 0], 3.0, atol=2e-4)
    np.testing.assert_allclose(g[:, 1], 7.0, atol=2e-4)


def test_outside_points_clamp():
    """Points outside the domain are clamped to the nearest cell (the MMOC
    departure-point clamping path): finite and within the field's range."""
    mesh = mi.mesh_rectangle(nx=1, ny=1)
    storage = CellStorage(mesh, num_shards=1)
    sp = P1Space(storage, 2)
    bc = BoundaryCondition.all_dirichlet()
    u = sp.interpolate(lambda x: x[..., 0] + x[..., 1], sp.zeros(), DoFType.ALL, bc)
    ev = FieldEvaluator(storage, 2, degree=1)
    pts = np.array([[-0.05, 0.5], [1.05, 0.5], [0.5, -0.03], [1.2, 1.2]])
    got = np.asarray(ev.evaluate(u, jnp.asarray(pts)))
    assert np.isfinite(got).all()
    # clamped evaluation stays within the field's range on the domain
    assert (got >= -1e-4).all() and (got <= 2.0 + 1e-4).all()
