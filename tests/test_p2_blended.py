"""Blended P2 epsilon / div operators: identity-map exactness + shell solve."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hyteg_tpu.core.types import BoundaryCondition, DoFType, FLAG_INNER
from hyteg_tpu.functions.p1 import P1Space
from hyteg_tpu.functions.p2 import P2Space
from hyteg_tpu.geometry.maps import GeometryMap, IcosahedralShellMap
from hyteg_tpu.mesh import meshinfo as mi
from hyteg_tpu.operators.p2_blended_stokes import (P2BlendedEpsilonOperator,
                                                   P2P1BlendedDivOperator)
from hyteg_tpu.operators.p2_epsilon import P2VectorEpsilonOperator
from hyteg_tpu.operators.mixed import P2ToP1DivOperator
from hyteg_tpu.primitives.storage import CellStorage


@pytest.fixture(scope="module")
def cube():
    storage = CellStorage(mi.mesh_unit_cube(1), num_shards=1)
    level = 2
    pitch = (1 << (level + 1)) + 1
    p2 = P2Space(storage, level, pitch=pitch)
    p1 = P1Space(storage, level, pitch=pitch)
    return storage, p2, p1


def _rand_vec(p2, seed=0):
    """Replica-consistent random FE vector (interface values synced)."""
    key = jax.random.PRNGKey(seed)
    ks = jax.random.split(key, 3)
    m = jnp.asarray(p2.vertex_mask[None], jnp.float32)
    sd = p2.resolve_sd(None)
    return tuple(
        p2.exchange_rep(jax.random.normal(k, p2.block_shape, jnp.float32) * m,
                        sd)
        for k in ks)


@pytest.mark.parametrize("full", [False, True])
def test_blended_epsilon_matches_affine_on_identity(cube, full):
    _, p2, p1 = cube
    xs = _rand_vec(p2)
    aff = P2VectorEpsilonOperator(p2, full=full)
    ble = P2BlendedEpsilonOperator(p2, GeometryMap(), full=full)
    ya = aff.apply_raw(xs)
    yb = ble.apply_raw(xs)
    for a, b in zip(ya, yb):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=2e-5)


def test_blended_epsilon_diagonal_matches_affine(cube):
    _, p2, p1 = cube
    aff = P2VectorEpsilonOperator(p2)
    ble = P2BlendedEpsilonOperator(p2, GeometryMap())
    da = aff.diagonal_raw()
    db = ble.diagonal_raw()
    for a, b in zip(da, db):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=2e-5)


def test_blended_div_grad_match_affine_on_identity(cube):
    _, p2, p1 = cube
    xs = _rand_vec(p2, seed=1)
    aff = P2ToP1DivOperator(p2, p1)
    ble = P2P1BlendedDivOperator(p2, p1, GeometryMap())
    np.testing.assert_allclose(
        np.asarray(ble.apply_div_local(xs)),
        np.asarray(aff.apply_div_local(xs)), rtol=2e-4, atol=2e-5)
    p = jax.random.normal(jax.random.PRNGKey(2), p1.block_shape, jnp.float32)
    p = p * jnp.asarray(p1.vertex_mask[None], jnp.float32)
    for d in range(3):
        np.testing.assert_allclose(
            np.asarray(ble.apply_gradient_component_local(p, d)),
            np.asarray(aff.apply_gradient_component_local(p, d)),
            rtol=2e-4, atol=2e-5)


def test_blended_epsilon_symmetric_on_shell():
    """<K u, v> == <u, K v> on the blended shell (operator symmetry is a
    strong correctness probe for the vargeom quadrature)."""
    storage = CellStorage(mi.mesh_spherical_shell(1, 2, 0.55, 1.0),
                          num_shards=1)
    p2 = P2Space(storage, 1)
    op = P2BlendedEpsilonOperator(p2, IcosahedralShellMap())
    us = _rand_vec(p2, seed=3)
    vs = _rand_vec(p2, seed=4)
    Ku = op.apply_raw(us)
    Kv = op.apply_raw(vs)
    sd = p2.resolve_sd(None)
    lhs = sum(float(p2.dot(a, b, DoFType.ALL, sd)) for a, b in zip(Ku, vs))
    rhs = sum(float(p2.dot(a, b, DoFType.ALL, sd)) for a, b in zip(us, Kv))
    assert abs(lhs - rhs) < 1e-3 * max(abs(lhs), 1.0), (lhs, rhs)
    # and positive semi-definite on the random vector
    quad = sum(float(p2.dot(a, b, DoFType.ALL, sd)) for a, b in zip(Ku, us))
    assert quad > 0.0


@pytest.mark.slow  # ~110 s XLA:CPU compile of the blended Stokes cycle
def test_blended_shell_stokes_uzawa_converges():
    """Blended epsilon-Stokes GMG (Uzawa) V-cycles reduce the residual on
    the icosahedral shell — the TerraNeo-on-shell configuration
    (reference: P2P1ElementwiseBlendingStokesOperator + Uzawa GMG)."""
    from hyteg_tpu.solvers.uzawa import make_stokes_gmg

    storage = CellStorage(mi.mesh_spherical_shell(1, 2, 0.55, 1.0),
                          num_shards=1)
    # fixed eigs: the in-trace power iterations would add two more
    # full blended-apply compiles (minutes each on this 2-core host)
    stokes, gmg = make_stokes_gmg(
        storage, 0, 1, epsilon=True, gmap=IcosahedralShellMap(),
        coarse_iters=40, eigs={0: 3.0, 1: 3.0})
    st = stokes[1]
    key = jax.random.PRNGKey(0)
    b = st.zeros()
    m = jnp.asarray(st.vel_space.vertex_mask[None], jnp.float32)
    vel = tuple(jax.random.normal(k, st.vel_space.block_shape, jnp.float32)
                * m for k in jax.random.split(key, 3))
    b = type(b)(vel, b.pre)
    b = st.apply_inner(b * 0.0 + b, FLAG_INNER)  # restrict to solved rows

    x = st.zeros()
    r0 = float(st.norm(b - st.apply_inner(x, FLAG_INNER)))
    cyc = jax.jit(lambda x: gmg.cycle(x, b))
    for _ in range(3):
        x = cyc(x)
    r3 = float(st.norm(b - st.apply_inner(x, FLAG_INNER)))
    assert r3 < 0.2 * r0, (r0, r3)
