"""Canned solver stacks (reference: src/hyteg/solvers/solvertemplates/).

These wire spaces, operators, transfers, smoothers and the coarse solver
into a ready GeometricMultigridSolver for the common cases; everything is
returned as raw-array callables so the assembled solve jits as one XLA
program. Passing ``sd_per_level`` (traced P1ShardData) builds the same stack
inside a shard_map trace for multi-device SPMD execution.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp

from ..core.types import BoundaryCondition, DoFType, FLAG_INNER
from ..functions.p1 import P1ShardData, P1Space
from ..operators import forms
from ..operators.p1_elementwise import P1ElementwiseOperator
from ..operators.transfer import P1Transfer
from ..primitives.storage import CellStorage
from .gmg import GeometricMultigridSolver, GMGLevel
from .krylov import cg_solve_fixed
from .smoothers import chebyshev_smooth, estimate_spectral_radius, jacobi_smooth


@dataclasses.dataclass
class P1GMGStack:
    storage: CellStorage
    spaces: dict[int, P1Space]
    operators: dict[int, P1ElementwiseOperator]
    transfers: dict[int, P1Transfer]  # keyed by fine level
    inv_diags: dict[int, jnp.ndarray]
    sds: dict[int, P1ShardData]
    gmg: GeometricMultigridSolver
    flag: DoFType
    axis_name: str | None = None

    def space(self, level=None) -> P1Space:
        return self.spaces[max(self.spaces) if level is None else level]

    def sd(self, level=None) -> P1ShardData:
        return self.sds[max(self.sds) if level is None else level]

    def residual(self, x, b, level=None):
        level = max(self.spaces) if level is None else level
        op, sp, sd = self.operators[level], self.spaces[level], self.sds[level]
        r = b - op.apply_inner(x, sd, self.flag, axis_name=self.axis_name)
        return sp.restore_rows(r, jnp.zeros_like(r), self.flag, sd)

    def residual_norm(self, x, b, level=None):
        level = max(self.spaces) if level is None else level
        r = self.residual(x, b, level)
        sp = self.spaces[level]
        return jnp.sqrt(sp.dot(r, r, self.flag, self.sds[level], self.axis_name))


def make_p1_gmg(
    storage: CellStorage,
    min_level: int,
    max_level: int,
    form: Callable = forms.laplace_form,
    bc: BoundaryCondition | None = None,
    flag: DoFType = FLAG_INNER,
    smoother: str = "chebyshev",
    pre_smooth: int = 3,
    post_smooth: int = 3,
    cheb_order: int = 4,
    jacobi_omega: float = 2.0 / 3.0,
    coarse_iters: int = 100,
    shard: int = 0,
    axis_name: str | None = None,
    sd_per_level: dict[int, P1ShardData] | None = None,
    eigs: dict[int, float] | None = None,
    dtype=jnp.float32,
    space_kind: str = "p1",
    coarse_solve_fn=None,
) -> P1GMGStack:
    """GMG stack for a scalar P1 operator (reference pattern:
    tutorials/FA.01_GeometricMultigrid + GeometricMultigridSolver.hpp:39).

    In the traced (shard_map) path, pass sd_per_level; element matrices and
    diagonals are then computed inside the trace and spectral-radius
    estimates run as part of the traced program.
    """
    bc = bc or BoundaryCondition.all_dirichlet()
    lrange = range(min_level, max_level + 1)
    # one lane pitch across all levels -> grid transfers are pure stride-2
    # slicing on the flat layout (see indexing/flat.py)
    if space_kind == "p1":
        pitch = (1 << max_level) + 1
        spaces = {l: P1Space(storage, l, dtype=dtype, pitch=pitch)
                  for l in lrange}
    else:
        from ..functions.p2 import P2Space

        pitch = (1 << (max_level + 1)) + 1
        spaces = {l: P2Space(storage, l, dtype=dtype, pitch=pitch)
                  for l in lrange}
    if sd_per_level is None:
        sds = {l: spaces[l].shard_data(shard, bc) for l in lrange}
        traced = False
    else:
        sds = sd_per_level
        traced = True
    if space_kind == "p1":
        if traced:
            ops = {l: P1ElementwiseOperator.from_shard_data(spaces[l], form, sds[l])
                   for l in lrange}
        else:
            ops = {l: P1ElementwiseOperator(spaces[l], form, shard) for l in lrange}
        transfers = {
            l: P1Transfer(spaces[l - 1], spaces[l])
            for l in range(min_level + 1, max_level + 1)
        }
    else:
        from ..operators.p2_elementwise import P2ElementwiseOperator
        from ..operators.p2_transfer import P2Transfer

        kind = form if isinstance(form, str) else "laplace"
        if traced:
            ops = {l: P2ElementwiseOperator.from_shard_data(spaces[l], kind, sds[l])
                   for l in lrange}
        else:
            ops = {l: P2ElementwiseOperator(spaces[l], kind, shard) for l in lrange}
        transfers = {
            l: P2Transfer(spaces[l - 1], spaces[l])
            for l in range(min_level + 1, max_level + 1)
        }
    inv_diags = {l: ops[l].inverse_diagonal(sd=sds[l], axis_name=axis_name)
                 for l in lrange}

    def make_apply(l):
        return lambda x: ops[l].apply_inner(x, sds[l], flag, axis_name=axis_name)

    def make_dot(l):
        return lambda u, v: spaces[l].dot(u, v, flag, sds[l], axis_name)

    applies = {l: make_apply(l) for l in lrange}
    dots = {l: make_dot(l) for l in lrange}

    # spectral radius of D^-1 A per level for Chebyshev
    if smoother == "chebyshev" and eigs is None:
        eigs = {}
        for l in lrange:
            if (not traced and space_kind == "p1"
                    and hasattr(ops[l], "stencil")):
                # analytic symbol bound — no on-device compile per level
                from .smoothers import p1_stencil_eig_fourier

                eigs[l] = p1_stencil_eig_fourier(ops[l].stencil,
                                                 spaces[l].dim)
                continue
            lam = estimate_spectral_radius(
                applies[l], inv_diags[l], dots[l], spaces[l].block_shape,
                num_iter=25, dtype=dtype,
            )
            eigs[l] = lam if traced else float(jax.jit(lambda: lam)())

    def make_smooth(l):
        sp = spaces[l]

        if smoother == "chebyshev":
            def smooth(x, b):
                xn = chebyshev_smooth(
                    applies[l], inv_diags[l], b, x, eigs[l], order=cheb_order
                )
                return sp.restore_rows(xn, x, flag, sds[l])
        else:
            def smooth(x, b):
                xn = jacobi_smooth(applies[l], inv_diags[l], b, x, jacobi_omega)
                return sp.restore_rows(xn, x, flag, sds[l])
        return smooth

    def make_restrict(l):  # fine level l -> l-1
        sp_c = spaces[l - 1]

        def restrict(r):
            rc = transfers[l].restrict(r, sds[l], sds[l - 1], axis_name)
            # rows outside the solved flag (Dirichlet/padding) must carry no
            # residual: the coarse apply zeroes them, and a CG coarse solve
            # on an rhs outside range(A) diverges (search directions grow
            # unboundedly until overflow)
            return sp_c.restore_rows(rc, jnp.zeros_like(rc), flag, sds[l - 1])

        return restrict

    def make_prolongate_add(l):
        sp = spaces[l]

        def padd(xc, xf):
            xn = transfers[l].prolongate_and_add(xc, xf, sds[l], axis_name)
            return sp.restore_rows(xn, xf, flag, sds[l])

        return padd

    def make_residual(l):
        sp = spaces[l]

        def residual(x, b):
            r = ops[l].residual(x, b, sd=sds[l], axis_name=axis_name)
            return sp.restore_rows(r, jnp.zeros_like(r), flag, sds[l])

        return residual

    levels = {}
    for l in lrange:
        levels[l] = GMGLevel(
            apply=applies[l],
            smooth=make_smooth(l),
            dot=dots[l],
            zeros=(lambda l=l: spaces[l].zeros()),
            restrict=make_restrict(l) if l > min_level else None,
            prolongate_add=make_prolongate_add(l) if l > min_level else None,
            residual=make_residual(l) if space_kind == "p1" else None,
        )

    def coarse_solve(b, x0):
        if coarse_solve_fn is not None:
            return coarse_solve_fn(b, x0)
        return cg_solve_fixed(applies[min_level], dots[min_level], b, x0, coarse_iters)

    gmg = GeometricMultigridSolver(
        levels, coarse_solve, min_level, max_level, pre_smooth, post_smooth
    )
    return P1GMGStack(
        storage, spaces, ops, transfers, inv_diags, sds, gmg, flag, axis_name
    )


def make_p2_gmg(storage, min_level: int, max_level: int, form: str = "laplace",
                **kwargs) -> P1GMGStack:
    """P2 GMG stack with quadratic transfers (reference pattern:
    P2 multigrid with P2toP2Quadratic P/R, GeometricMultigridSolver)."""
    return make_p1_gmg(storage, min_level, max_level, form=form,
                       space_kind="p2", **kwargs)
