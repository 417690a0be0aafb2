"""Geometric multigrid on the structured box fast path.

The box analog of the reference's GeometricMultigridSolver
(reference: src/hyteg/solvers/GeometricMultigridSolver.hpp:141-204 —
pre-smooth, restrict, recurse, prolongate-add, post-smooth) with
Chebyshev smoothing (reference: src/hyteg/solvers/ChebyshevSmoother.hpp)
and a fixed-iteration CG coarse solve.  Everything jits whole: the
recursion unrolls over the static level list.

Dirichlet boundary: the eliminated form — boundary rows act as identity
(operator.apply_dirichlet), corrections are masked to the interior on
every level, so the homogeneous boundary of the error equation is exact.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp

from ..operators import forms
from . import transfer
from .box import BoxDomain
from .operator import BoxStencilOperator


def estimate_eig_max(op: BoxStencilOperator, iters: int = 50) -> float:
    """Power iteration for lambda_max(D^-1 A) on the interior (concrete)."""
    dom = op.domain
    inner = jnp.asarray(dom.interior_mask, dtype=dom.dtype)
    dinv = op.inverse_diagonal

    def body(x, _):
        y = inner * (dinv * op.apply_raw(inner * x))
        return y / jnp.linalg.norm(y.reshape(-1)), None

    x0 = jnp.ones(dom.block_shape, dtype=dom.dtype)
    x, _ = jax.lax.scan(body, x0 / jnp.linalg.norm(x0.reshape(-1)),
                        None, length=iters)
    y = inner * (dinv * op.apply_raw(inner * x))
    lam = jnp.vdot(x.reshape(-1), y.reshape(-1))
    return float(lam)


@dataclass
class BoxLevel:
    domain: BoxDomain
    op: BoxStencilOperator
    eig_max: float
    inner: jnp.ndarray = field(default=None)

    def __post_init__(self):
        if self.inner is None:
            self.inner = jnp.asarray(self.domain.interior_mask,
                                     dtype=self.domain.dtype)


def build_hierarchy(domain: BoxDomain, form=forms.laplace_form,
                    min_level: int = 1) -> list[BoxLevel]:
    """Fine-to-coarse list of levels with operators + spectral bounds.

    lambda_max(D^-1 A) is refinement-invariant for a uniformly refined
    constant-coefficient operator (h scales out of D^-1 A), so the power
    iteration runs once on a coarse representative."""
    probe = BoxDomain(domain.m, min(domain.level, 3), domain.extent,
                      domain.dtype)
    eig = estimate_eig_max(BoxStencilOperator(probe, form))
    levels = []
    d = domain
    while True:
        levels.append(BoxLevel(d, BoxStencilOperator(d, form), eig))
        if d.level <= min_level:
            break
        d = d.coarse()
    return levels


def _cheby(lvl: BoxLevel, x, b, degree: int):
    """Standard three-term Chebyshev recurrence (textbook form)."""
    # 1.25 safety margin: the power iteration underestimates lambda_max
    # and the top of the spectrum creeps up slightly with refinement;
    # Chebyshev must never leave the highest modes outside the interval
    lmax = lvl.eig_max * 1.25
    lmin = lvl.eig_max * 0.3
    theta = 0.5 * (lmax + lmin)
    delta = 0.5 * (lmax - lmin)
    dinv = lvl.op.inverse_diagonal
    inner = lvl.inner

    def resid(x):
        return inner * (dinv * (b - lvl.op.apply_raw(x)))

    d = resid(x) / theta
    x = x + d
    sigma = theta / delta
    rho = 1.0 / sigma
    for _ in range(degree - 1):
        rho_new = 1.0 / (2.0 * sigma - rho)
        d = rho_new * rho * d + (2.0 * rho_new / delta) * resid(x)
        x = x + d
        rho = rho_new
    return x


def coarse_cg(lvl: BoxLevel, b, iters: int = 40):
    """Fixed-iteration CG on the interior (jits as a scan)."""
    inner = lvl.inner

    def A(v):
        return inner * lvl.op.apply_raw(inner * v)

    x = jnp.zeros_like(b)
    r = inner * b
    p = r
    rs = jnp.vdot(r.reshape(-1), r.reshape(-1))

    def body(carry, _):
        x, r, p, rs = carry
        Ap = A(p)
        denom = jnp.vdot(p.reshape(-1), Ap.reshape(-1))
        alpha = jnp.where(denom > 0, rs / jnp.maximum(denom, 1e-30), 0.0)
        x = x + alpha * p
        r = r - alpha * Ap
        rs_new = jnp.vdot(r.reshape(-1), r.reshape(-1))
        beta = jnp.where(rs > 0, rs_new / jnp.maximum(rs, 1e-30), 0.0)
        p = r + beta * p
        return (x, r, p, rs_new), None

    (x, *_), _ = jax.lax.scan(body, (x, r, p, rs), None, length=iters)
    return x


def vcycle(levels: list[BoxLevel], x, b, pre: int = 2, post: int = 2,
           coarse_iters: int = 40, _k: int = 0):
    """One V-cycle on levels[_k:] (unrolled recursion, jittable)."""
    lvl = levels[_k]
    if _k == len(levels) - 1:
        return coarse_cg(lvl, b, coarse_iters)
    x = _cheby(lvl, x, b, pre)
    r = lvl.inner * lvl.op.residual(x, b)
    r_c = transfer.restrict(r, lvl.domain, levels[_k + 1].domain)
    r_c = levels[_k + 1].inner * r_c
    e_c = vcycle(levels, jnp.zeros_like(r_c), r_c, pre, post,
                 coarse_iters, _k + 1)
    e = transfer.prolongate(levels[_k + 1].inner * e_c,
                            levels[_k + 1].domain, lvl.domain)
    x = x + lvl.inner * e
    return _cheby(lvl, x, b, post)


def solve_poisson(levels: list[BoxLevel], f, g=None, cycles: int = 8,
                  pre: int = 2, post: int = 2):
    """Dirichlet Poisson solve: A u = f interior, u = g on the boundary.

    Returns (u, per-cycle residual norms)."""
    lvl = levels[0]
    dom = lvl.domain
    bnd = jnp.asarray(dom.boundary_mask, dtype=dom.dtype)
    g = jnp.zeros_like(f) if g is None else g
    x = bnd * g
    # move the inhomogeneous boundary into the rhs
    b = lvl.inner * (f - lvl.op.apply_raw(bnd * g))

    def body(x, _):
        x = vcycle(levels, x, b, pre, post)
        rn = jnp.linalg.norm((lvl.inner * lvl.op.residual(x, b)).reshape(-1))
        return x, rn

    x_in, rns = jax.lax.scan(body, lvl.inner * x, None, length=cycles)
    return x_in + bnd * g, rns
