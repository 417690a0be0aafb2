"""Solver convergence tests (reference: tests/hyteg/convergence/
P1CGConvergenceTest.cpp, P1GMG3DConvergenceTest.cpp)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hyteg_tpu.core.types import BoundaryCondition, DoFType, FLAG_INNER
from hyteg_tpu.functions.p1 import P1Space
from hyteg_tpu.mesh import meshinfo as mi
from hyteg_tpu.operators import forms
from hyteg_tpu.operators.p1_elementwise import P1ElementwiseOperator
from hyteg_tpu.primitives.storage import CellStorage
from hyteg_tpu.solvers.krylov import cg_solve
from hyteg_tpu.solvers.templates import make_p1_gmg
from tests.test_operator import (
    _assemble_dense,
    _from_blocks,
    _np_laplace_elmat,
    _to_blocks,
)


def _poisson_setup(storage, level, u_exact, f_rhs):
    """x with Dirichlet data, b = M f on inner rows."""
    sp = P1Space(storage, level)
    bc = BoundaryCondition.all_dirichlet()
    lap = P1ElementwiseOperator(sp, forms.laplace_form)
    mass = P1ElementwiseOperator(sp, forms.mass_form)
    x = sp.function(bc).interpolate(u_exact, flag=DoFType.DIRICHLET)
    fvals = sp.function(bc).interpolate(f_rhs)
    b_full = mass.apply_raw(fvals.cells)
    b = sp.restore_rows(b_full, sp.zeros(), FLAG_INNER, bc)
    return sp, bc, lap, mass, x, b


U = lambda x: jnp.sin(jnp.pi * x[..., 0]) * jnp.sin(jnp.pi * x[..., 1]) * jnp.sin(
    jnp.pi * x[..., 2]
)
F = lambda x: 3 * jnp.pi**2 * U(x)


def test_cg_matches_dense_solve():
    storage = CellStorage(mi.mesh_unit_cube(1), num_shards=1)
    level = 2
    sp, bc, lap, mass, x, b = _poisson_setup(storage, level, U, F)

    apply_fn = lambda v: lap.apply_inner(v, bc, FLAG_INNER)
    dot_fn = lambda u, v: sp.dot(u, v, FLAG_INNER, bc)
    res = cg_solve(apply_fn, dot_fn, b, x.cells, max_iter=200, rtol=1e-7)

    # dense reference solve with Dirichlet elimination
    A = _assemble_dense(storage, sp, _np_laplace_elmat)
    gid = sp.global_ids()
    bg = _from_blocks(sp, b)
    xg0 = _from_blocks(sp, x.cells)
    inner = np.zeros(sp.num_global_dofs(), dtype=bool)
    inner[: sp.maps.num_ifc] = sp.maps.ifc_meshflag == 0
    inner[sp.maps.num_ifc:] = True
    rhs = bg[inner] - A[np.ix_(inner, ~inner)] @ xg0[~inner]
    sol = np.linalg.solve(A[np.ix_(inner, inner)], rhs)
    got = _from_blocks(sp, res.x)
    assert np.allclose(got[inner], sol, atol=5e-4)
    assert np.allclose(got[~inner], xg0[~inner])  # BC untouched


@pytest.mark.parametrize("smoother", ["jacobi", "chebyshev"])
def test_gmg_vcycle_convergence(smoother):
    storage = CellStorage(mi.mesh_unit_cube(1), num_shards=1)
    stack = make_p1_gmg(storage, min_level=0, max_level=3, smoother=smoother)
    sp = stack.space()
    bc = BoundaryCondition.all_dirichlet()
    mass = P1ElementwiseOperator(sp, forms.mass_form)
    x = sp.function(bc).interpolate(U, flag=DoFType.DIRICHLET)
    f = sp.function(bc).interpolate(F)
    b = sp.restore_rows(mass.apply_raw(f.cells), sp.zeros(), FLAG_INNER, bc)

    cycle = jax.jit(lambda x, b: stack.gmg.cycle(x, b))
    rnorm = jax.jit(lambda x, b: stack.residual_norm(x, b))

    r0 = float(rnorm(x.cells, b))
    xs = x.cells
    norms = [r0]
    for _ in range(6):
        xs = cycle(xs, b)
        norms.append(float(rnorm(xs, b)))
    rates = [norms[i + 1] / norms[i] for i in range(len(norms) - 1)]
    # healthy GMG: strong reduction per V-cycle
    assert norms[-1] < 1e-3 * norms[0], norms
    assert min(rates[:3]) < 0.35, rates

    # solution accuracy vs manufactured solution (discretization error level)
    uex = sp.function(bc).interpolate(U)
    err = xs - uex.cells
    merr = mass.apply_raw(err)
    l2 = float(jnp.sqrt(sp.dot(err, merr, DoFType.ALL, bc)))
    assert l2 < 0.03, l2  # P1 discretization error at h=1/8


def test_gmg_w_cycle_and_fmg_run():
    from hyteg_tpu.core.types import CycleType

    storage = CellStorage(mi.mesh_unit_cube(1), num_shards=1)
    stack = make_p1_gmg(storage, 0, 2)
    stack.gmg.cycle_type = CycleType.W
    sp = stack.space()
    bc = BoundaryCondition.all_dirichlet()
    mass = P1ElementwiseOperator(sp, forms.mass_form)
    x = sp.function(bc).interpolate(U, flag=DoFType.DIRICHLET)
    f = sp.function(bc).interpolate(F)
    b = sp.restore_rows(mass.apply_raw(f.cells), sp.zeros(), FLAG_INNER, bc)
    r0 = float(stack.residual_norm(x.cells, b))
    xs = stack.gmg.cycle(x.cells, b)
    xs = stack.gmg.cycle(xs, b)
    assert float(stack.residual_norm(xs, b)) < 0.2 * r0
