"""DG1 SIP Laplace + P0 upwind advection tests
(reference: tests/hyteg/dg/ DGOperator/DGPoisson tests and upwind
transport tests)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hyteg_tpu.core.types import DoFType
from hyteg_tpu.functions.dg import DG1Space, p1_to_dg1
from hyteg_tpu.functions.p1 import P1Space
from hyteg_tpu.functions.volume import VolumeDoFSpace
from hyteg_tpu.indexing import micro
from hyteg_tpu.mesh import meshinfo as mi
from hyteg_tpu.operators.dg_ops import (
    DG1SIPLaplaceOperator,
    P0UpwindAdvectionOperator,
    facet_tables,
)
from hyteg_tpu.primitives.storage import CellStorage
from hyteg_tpu.solvers.krylov import cg_solve


def test_facet_tables_symmetric():
    """The neighbor of my neighbor across the shared facet is me."""
    for dim in (2, 3):
        nbr_class, nbr_shift, facet_verts = facet_tables(dim)
        offs = micro.offsets(dim)
        T, F = nbr_class.shape
        for t in range(T):
            for f in range(F):
                t2, s = int(nbr_class[t, f]), nbr_shift[t, f]
                # the shared facet, in absolute coords
                mine = {tuple(offs[t, v]) for v in facet_verts[t, f]}
                # find which facet of (t2, s) it is, then check reciprocity
                found = False
                for f2 in range(F):
                    theirs = {tuple(offs[t2, v] + s)
                              for v in facet_verts[t2, f2]}
                    if theirs == mine:
                        assert int(nbr_class[t2, f2]) == t
                        assert np.array_equal(nbr_shift[t2, f2], -s)
                        found = True
                assert found


@pytest.mark.parametrize("dim", [2, 3])
def test_sip_symmetric_positive(dim):
    mesh = mi.mesh_single_triangle() if dim == 2 else mi.mesh_single_tet()
    storage = CellStorage(mesh, num_shards=1)
    sp = DG1Space(storage, 2)
    op = DG1SIPLaplaceOperator(sp)
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    w = jnp.asarray(sp._valid_weight, dtype=sp.dtype)[..., None]
    x = jax.random.normal(k1, sp.block_shape, dtype=sp.dtype) * w
    y = jax.random.normal(k2, sp.block_shape, dtype=sp.dtype) * w
    xay = float(sp.dot(x, op.apply(y)))
    yax = float(sp.dot(y, op.apply(x)))
    assert np.isclose(xay, yax, rtol=1e-3)
    xax = float(sp.dot(x, op.apply(x)))
    assert xax > 0


def _solve_poisson(dim, level):
    mesh = mi.mesh_single_triangle() if dim == 2 else mi.mesh_single_tet()
    storage = CellStorage(mesh, num_shards=1)
    sp = DG1Space(storage, level)
    op = DG1SIPLaplaceOperator(sp)
    if dim == 2:
        U = lambda p: p[..., 0] * p[..., 1] * (1 - p[..., 0] - p[..., 1])
        F = lambda p: 2 * (p[..., 0] + p[..., 1])
    else:
        U = lambda p: (p[..., 0] * p[..., 1] * p[..., 2]
                       * (1 - p[..., 0] - p[..., 1] - p[..., 2]))
        F = lambda p: 2 * (p[..., 0] * p[..., 1] + p[..., 1] * p[..., 2]
                           + p[..., 0] * p[..., 2])
    f = sp.interpolate(F)
    b = sp.mass_apply(f)
    res = cg_solve(op.apply, sp.dot, b, jnp.zeros_like(b), 2000, rtol=1e-7)
    u_ex = sp.interpolate(U)
    e = res.x - u_ex
    me = sp.mass_apply(e)
    return float(jnp.sqrt(sp.dot(e, me)))


@pytest.mark.parametrize("dim", [2, 3])
def test_sip_poisson_converges(dim):
    """Manufactured zero-boundary Poisson problem: L2 error must shrink
    ~O(h^2) under refinement (reference: DGPoisson2DConvergenceTest)."""
    lv = (2, 3)
    e_coarse = _solve_poisson(dim, lv[0])
    e_fine = _solve_poisson(dim, lv[1])
    assert e_fine < e_coarse / 2.8
    assert e_fine < 2e-3


def test_p1_to_dg1_exact_embedding():
    storage = CellStorage(mi.mesh_single_triangle(), num_shards=1)
    level = 3
    p1 = P1Space(storage, level)
    dg = DG1Space(storage, level)
    expr = lambda p: 1.0 + 2.0 * p[..., 0] - 0.5 * p[..., 1]
    u1 = p1.interpolate(expr, p1.zeros(), DoFType.ALL)
    udg = p1_to_dg1(p1, u1, dg)
    udg_direct = dg.interpolate(expr)
    np.testing.assert_allclose(np.asarray(udg), np.asarray(udg_direct),
                               atol=1e-5)
    # integral of 1 over the unit triangle = 1/2
    one = dg.interpolate(1.0)
    assert np.isclose(float(dg.integral(one)), 0.5, rtol=1e-5)


def test_upwind_advection_stable_and_conservative():
    """Constant-velocity upwind FV on a single macro-triangle: bounded
    (max principle) and mass only leaves through the outflow boundary."""
    storage = CellStorage(mi.mesh_single_triangle(), num_shards=1)
    sp = VolumeDoFSpace(storage, 4)
    vel = (1.0, 0.25)
    op = P0UpwindAdvectionOperator(sp, vel)
    blob = sp.interpolate(
        lambda c: jnp.exp(-80.0 * ((c[..., 0] - 0.25) ** 2
                                   + (c[..., 1] - 0.25) ** 2)))
    vols = sp.elem_volumes
    # CFL: dt <= min(vol/sum|an|)
    an_abs = np.abs(np.asarray(op.an)).sum(axis=-1)  # (C, T)
    h = np.asarray(vols)[:, :, 0, 0]
    dt = 0.5 * float(np.min(h[h > 0] / an_abs[h > 0]))
    u = blob
    m0 = float(sp.integral(u))
    mx0 = float(sp.dof_max(u))
    step = jax.jit(lambda u: op.step(u, dt))
    for _ in range(20):
        u = step(u)
    assert float(sp.dof_max(u)) <= mx0 * (1 + 1e-5)
    assert float(jnp.min(u)) >= -1e-6
    m1 = float(sp.integral(u))
    assert m1 <= m0 + 1e-6  # mass only decreases (outflow)
    assert m1 > 0.2 * m0    # but hasn't all left after a short time


@pytest.mark.parametrize("dim", [2, 3])
def test_sip_cross_macro_symmetric_and_converges(dim):
    """Multi-macro DG: cross-macro SIP coupling keeps the operator
    symmetric and the Poisson solve converging at the DG1 rate
    (reference: DGOperator inner-facet forms across primitive boundaries)."""
    if dim == 2:
        mesh = mi.mesh_rectangle((0, 0), (1, 1), 2, 1)
        U = lambda p: (p[..., 0] * (1 - p[..., 0])
                       * p[..., 1] * (1 - p[..., 1]))
        F = lambda p: 2 * (p[..., 0] * (1 - p[..., 0])
                           + p[..., 1] * (1 - p[..., 1]))
    else:
        mesh = mi.mesh_unit_cube(1)
        U = lambda p: (p[..., 0] * (1 - p[..., 0]) * p[..., 1]
                       * (1 - p[..., 1]) * p[..., 2] * (1 - p[..., 2]))

        def F(p):
            x, y, z = p[..., 0], p[..., 1], p[..., 2]
            return 2 * (y * (1 - y) * z * (1 - z)
                        + x * (1 - x) * z * (1 - z)
                        + x * (1 - x) * y * (1 - y))
    storage = CellStorage(mesh, num_shards=1)

    def solve(level):
        sp = DG1Space(storage, level)
        op = DG1SIPLaplaceOperator(sp)
        assert op._cross is not None  # macro interfaces were matched
        key = jax.random.PRNGKey(0)
        w = jnp.asarray(sp._valid_weight, dtype=sp.dtype)[..., None]
        x = jax.random.normal(key, sp.block_shape, dtype=sp.dtype) * w
        y = jax.random.normal(jax.random.PRNGKey(1), sp.block_shape,
                              dtype=sp.dtype) * w
        assert np.isclose(float(sp.dot(x, op.apply(y))),
                          float(sp.dot(y, op.apply(x))), rtol=1e-3)
        b = sp.mass_apply(sp.interpolate(F))
        res = cg_solve(op.apply, sp.dot, b, jnp.zeros_like(b), 3000,
                       rtol=1e-8)
        e = res.x - sp.interpolate(U)
        return float(jnp.sqrt(sp.dot(e, sp.mass_apply(e))))

    l0 = 2 if dim == 2 else 1
    e_c, e_f = solve(l0), solve(l0 + 1)
    # ~O(h^2) in the L2 norm (3D levels 1->2 are pre-asymptotic on the
    # 6-tet Kuhn cube, observed rate ~2.3)
    assert e_f < e_c / (3.0 if dim == 2 else 2.0)
