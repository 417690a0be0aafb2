"""GMRES/FGMRES, colored GS, FAS tests (reference: tests/hyteg/
solvers, convergence/P1FASConvergenceTest, smooth+solve)."""

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
from hyteg_tpu.solvers.colored_gs import colored_gs_smooth, parity_masks
from hyteg_tpu.solvers.gmres import fgmres_solve
from tests.test_solvers import F, U, _poisson_setup


def test_gmres_solves_poisson():
    storage = CellStorage(mi.mesh_unit_cube(1), num_shards=1)
    sp, bc, lap, mass, x, b = _poisson_setup(storage, 2, U, F)
    apply_fn = lambda v: lap.apply_inner(v, bc)
    dot_fn = lambda u, v: sp.dot(u, v, FLAG_INNER, bc)
    xs, res, k = fgmres_solve(apply_fn, dot_fn, b, x.cells if hasattr(x, "cells") else x,
                              restart=40, max_restarts=5, rtol=1e-6)
    r = b - apply_fn(xs)
    rn = float(jnp.sqrt(dot_fn(r, r)))
    bn = float(jnp.sqrt(dot_fn(b, b)))
    assert rn < 1e-5 * bn, (rn, bn, int(k))


def test_fgmres_with_jacobi_preconditioner():
    storage = CellStorage(mi.mesh_unit_cube(1), num_shards=1)
    sp, bc, lap, mass, x, b = _poisson_setup(storage, 2, U, F)
    apply_fn = lambda v: lap.apply_inner(v, bc)
    dot_fn = lambda u, v: sp.dot(u, v, FLAG_INNER, bc)
    invd = lap.inverse_diagonal()
    prec = lambda r: invd * r
    x0 = x.cells if hasattr(x, "cells") else x
    xs, res, k1 = fgmres_solve(apply_fn, dot_fn, b, x0, restart=40,
                               max_restarts=5, rtol=1e-6, prec_fn=prec)
    r = b - apply_fn(xs)
    assert float(jnp.sqrt(dot_fn(r, r))) < 1e-5 * float(jnp.sqrt(dot_fn(b, b)))


def test_parity_coloring_is_valid():
    """No two stencil-coupled micro-vertices share a parity color."""
    from hyteg_tpu.indexing import micro

    dirs = micro.stencil_directions(3)
    for d in dirs:
        if all(v == 0 for v in d):
            continue
        assert any(v % 2 != 0 for v in d), d
    masks = parity_masks(2, 3)
    total = sum(m.sum() for m in masks)
    assert total == micro.vertex_mask(2, 3).sum()


def test_colored_gs_smoother_converges():
    """GS as a standalone iteration converges on the Poisson problem."""
    storage = CellStorage(mi.mesh_unit_cube(1), num_shards=1)
    level = 2
    sp, bc, lap, mass, x, b = _poisson_setup(storage, level, U, F)
    apply_fn = lambda v: lap.apply_inner(v, bc)
    dot_fn = lambda u, v: sp.dot(u, v, FLAG_INNER, bc)
    invd = lap.inverse_diagonal()
    x0 = x.cells if hasattr(x, "cells") else x

    def rnorm(v):
        r = b - apply_fn(v)
        return float(jnp.sqrt(dot_fn(r, r)))

    r0 = rnorm(x0)
    xs = x0
    smooth = jax.jit(lambda v: colored_gs_smooth(apply_fn, invd, b, v, level, 3,
                                                 omega=1.0, num_sweeps=5))
    for _ in range(6):
        xs = smooth(xs)
    # GS converges (slowly but monotonically) — 30 sweeps should reduce a lot
    assert rnorm(xs) < 0.15 * r0, (rnorm(xs), r0)
    # Dirichlet rows untouched
    dt = np.asarray(xs - x0)
    m = sp.maps
    flat = dt.reshape(-1)
    sf = m.slot_flat[0]
    dirichlet = (m.slot_meshflag[0] != 0) & (sf < flat.shape[0])
    assert np.abs(flat[sf[dirichlet]]).max() == 0.0


def test_fas_matches_linear_vcycle_behavior():
    """For a linear operator FAS must converge like plain GMG."""
    from hyteg_tpu.solvers.fas import FASLevel, FASSolver
    from hyteg_tpu.solvers.krylov import cg_solve_fixed
    from hyteg_tpu.solvers.smoothers import jacobi_smooth
    from hyteg_tpu.operators.transfer import P1Transfer

    storage = CellStorage(mi.mesh_unit_cube(1), num_shards=1)
    bc = BoundaryCondition.all_dirichlet()
    min_l, max_l = 0, 2
    spaces = {l: P1Space(storage, l) for l in range(min_l, max_l + 1)}
    ops = {l: P1ElementwiseOperator(spaces[l], forms.laplace_form) for l in spaces}
    trs = {l: P1Transfer(spaces[l - 1], spaces[l]) for l in range(min_l + 1, max_l + 1)}
    invd = {l: ops[l].inverse_diagonal() for l in spaces}

    applies = {l: (lambda v, l=l: ops[l].apply_inner(v, bc)) for l in spaces}
    dots = {l: (lambda u, v, l=l: spaces[l].dot(u, v, FLAG_INNER, bc)) for l in spaces}

    levels = {}
    for l in spaces:
        levels[l] = FASLevel(
            apply=applies[l],
            smooth=(lambda x, b, l=l: spaces[l].restore_rows(
                jacobi_smooth(applies[l], invd[l], b, x), x, FLAG_INNER,
                spaces[l].shard_data(0, bc))),
            restrict=(lambda r, l=l: trs[l].restrict(r)) if l > min_l else None,
            restrict_inj=(lambda x, l=l: trs[l].restrict_injection(x)) if l > min_l else None,
            prolongate=(lambda xc, l=l: spaces[l].restore_rows(
                trs[l].prolongate(xc), spaces[l].zeros(), FLAG_INNER,
                spaces[l].shard_data(0, bc))) if l > min_l else None,
            zeros=(lambda l=l: spaces[l].zeros()),
        )

    coarse = lambda b, x0: cg_solve_fixed(applies[min_l], dots[min_l], b, x0, 40)
    fas = FASSolver(levels, coarse, min_l, max_l)

    sp, _, lap, mass, x, b = _poisson_setup(storage, max_l, U, F)
    x0 = x.cells if hasattr(x, "cells") else x
    rn = lambda v: float(jnp.sqrt(dots[max_l](b - applies[max_l](v),
                                              b - applies[max_l](v))))
    r0 = rn(x0)
    xs = x0
    cyc = jax.jit(lambda v: fas.cycle(v, b))
    for _ in range(5):
        xs = cyc(xs)
    assert rn(xs) < 1e-2 * r0, (rn(xs), r0)
