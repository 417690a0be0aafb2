"""TransportOperatorStd: SUPG advection, shear/adiabatic heating."""

import jax.numpy as jnp
import numpy as np
import pytest

from hyteg_tpu.core.types import BoundaryCondition, DoFType
from hyteg_tpu.mesh import meshinfo as mi
from hyteg_tpu.operators import forms
from hyteg_tpu.operators.p1_elementwise import P1ElementwiseOperator
from hyteg_tpu.primitives.storage import CellStorage
from hyteg_tpu.functions.p1 import P1Space
from hyteg_tpu.terraneo.transport_std import (
    SUPGAdvectionOperator, TransportOperatorStd, shear_heating_source)


@pytest.fixture(scope="module")
def space():
    storage = CellStorage(mi.mesh_unit_cube(1), num_shards=1)
    return P1Space(storage, 3)


def test_advection_kills_constants(space):
    op = SUPGAdvectionOperator(space, supg=True)
    T = jnp.ones(space.block_shape, jnp.float32) * jnp.asarray(
        space.vertex_mask[None], jnp.float32)
    vel = tuple(space.interpolate(lambda x, i=i: x[..., i] + 0.5,
                                  space.zeros(), DoFType.ALL)
                for i in range(3))
    y = op.apply_raw(T, vel)
    mask = np.broadcast_to(np.asarray(space.vertex_mask)[None],
                           space.block_shape) > 0
    assert np.abs(np.asarray(y)[mask]).max() < 1e-5


def test_galerkin_advection_exact_on_linears(space):
    """For constant v and linear T: v . grad T = c, so the Galerkin
    advection equals the mass operator applied to the constant c."""
    op = SUPGAdvectionOperator(space, supg=False)
    v = (0.7, -0.3, 0.2)
    vel = tuple(jnp.full(space.block_shape, vi, jnp.float32) for vi in v)
    T = space.interpolate(
        lambda x: 2 * x[..., 0] - x[..., 1] + 3 * x[..., 2],
        space.zeros(), DoFType.ALL)
    c = 2 * v[0] - v[1] + 3 * v[2]
    mass = P1ElementwiseOperator(space, forms.mass_form)
    ones = jnp.ones(space.block_shape, jnp.float32)
    want = c * np.asarray(mass.apply_raw(ones))
    got = np.asarray(op.apply_raw(T, vel))
    mask = np.broadcast_to(np.asarray(space.vertex_mask)[None],
                           space.block_shape) > 0
    np.testing.assert_allclose(got[mask], want[mask], rtol=1e-4, atol=1e-5)


def test_shear_heating_uniform_shear(space):
    """u = (g*y, 0, 0), eta const: Q = eta * g^2 everywhere."""
    g, eta_v = 1.5, 0.8
    vel = (space.interpolate(lambda x: g * x[..., 1], space.zeros(),
                             DoFType.ALL),
           space.zeros(), space.zeros())
    eta = jnp.full(space.block_shape, eta_v, jnp.float32)
    Q = np.asarray(shear_heating_source(space, vel, eta))
    mask = np.broadcast_to(np.asarray(space.vertex_mask)[None],
                           space.block_shape) > 0
    np.testing.assert_allclose(Q[mask], eta_v * g * g, rtol=1e-4)


def test_transport_step_runs_and_preserves_boundary(space):
    op = TransportOperatorStd(space, kappa=1e-2,
                              terms={"ADVECTION_EULERIAN": True,
                                     "SHEAR_HEATING": True,
                                     "ADIABATIC_HEATING": True,
                                     "INTERNAL_HEATING": True})
    op.adiabatic_coeff = space.interpolate(lambda x: 0.1 + 0 * x[..., 0],
                                           space.zeros(), DoFType.ALL)
    op.internal_heating = 0.05
    T0 = space.interpolate(
        lambda x: jnp.sin(jnp.pi * x[..., 0]) * x[..., 1],
        space.zeros(), DoFType.ALL)
    vel = tuple(space.interpolate(lambda x, i=i: 0.2 * x[..., i],
                                  space.zeros(), DoFType.ALL)
                for i in range(3))
    eta = jnp.ones(space.block_shape, jnp.float32)
    T1 = op.step(T0, 1e-2, vel=vel, eta=eta)
    assert bool(jnp.isfinite(T1).all())
    # Dirichlet rows untouched
    bnd = np.asarray(op._inner_mask(jnp.float32)) == 0
    valid = np.broadcast_to(np.asarray(space.vertex_mask)[None],
                            space.block_shape) > 0
    sel = bnd & valid
    np.testing.assert_allclose(np.asarray(T1)[sel], np.asarray(T0)[sel],
                               atol=1e-6)
