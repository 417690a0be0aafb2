"""Manufactured solutions for convergence studies.

The reference scatters these across its test drivers (e.g.
tests/hyteg/P1/P1PetscSolveTest.cpp, apps/MultigridStudies — sin/cos
product eigenfunctions, polynomial solutions, Stokes stream functions);
this module collects them behind one API so tests and apps share them.

Each entry is a ManufacturedSolution with callables taking coordinate
arrays ``x`` of shape (..., dim):

    u(x)      exact scalar (or tuple for vector) solution
    f(x)      matching right-hand side of the PDE
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

import jax.numpy as jnp


@dataclass(frozen=True)
class ManufacturedSolution:
    name: str
    dim: int
    u: Callable
    f: Callable
    description: str = ""


def _sin3(x):
    p = jnp.pi
    return (jnp.sin(p * x[..., 0]) * jnp.sin(p * x[..., 1])
            * jnp.sin(p * x[..., 2]))


def _sin2(x):
    p = jnp.pi
    return jnp.sin(p * x[..., 0]) * jnp.sin(p * x[..., 1])


#: -Delta u = f on the unit cube, u = 0 on the boundary
poisson_sin_3d = ManufacturedSolution(
    "poisson_sin_3d", 3, _sin3, lambda x: 3 * jnp.pi**2 * _sin3(x),
    "Laplace eigenfunction on the unit cube")

poisson_sin_2d = ManufacturedSolution(
    "poisson_sin_2d", 2, _sin2, lambda x: 2 * jnp.pi**2 * _sin2(x),
    "Laplace eigenfunction on the unit square")

#: polynomial solution exactly representable at machine precision by P2
poisson_quadratic_3d = ManufacturedSolution(
    "poisson_quadratic_3d", 3,
    lambda x: x[..., 0] * x[..., 1] + x[..., 2] ** 2,
    lambda x: -2.0 * jnp.ones_like(x[..., 0]),
    "quadratic: P2-exact, Dirichlet data inhomogeneous")


def _stokes_vel_2d(x):
    """Divergence-free velocity from the stream function
    psi = sin(pi x)^2 sin(pi y)^2 (zero on the boundary)."""
    p = jnp.pi
    sx, sy = jnp.sin(p * x[..., 0]), jnp.sin(p * x[..., 1])
    cx, cy = jnp.cos(p * x[..., 0]), jnp.cos(p * x[..., 1])
    u = 2 * p * sx**2 * sy * cy
    v = -2 * p * sx * cx * sy**2
    return u, v


def _stokes_pressure_2d(x):
    p = jnp.pi
    return jnp.sin(p * x[..., 0]) * jnp.cos(p * x[..., 1])


def _stokes_rhs_2d(x):
    """f = -Delta u + grad p, derived by autodiff from the exact fields
    (safer than hand-deriving fourth-order stream-function terms)."""
    import jax

    def vel_i(pt, i):
        return _stokes_vel_2d(pt[None, :])[i][0]

    def lap_i(pt, i):
        H = jax.hessian(lambda q: vel_i(q, i))(pt)
        return jnp.trace(H)

    def grad_p(pt):
        return jax.grad(lambda q: _stokes_pressure_2d(q[None, :])[0])(pt)

    pts = x.reshape(-1, x.shape[-1])
    lap_u = jax.vmap(lambda q: lap_i(q, 0))(pts)
    lap_v = jax.vmap(lambda q: lap_i(q, 1))(pts)
    gp = jax.vmap(grad_p)(pts)
    fu = (-lap_u + gp[:, 0]).reshape(x.shape[:-1])
    fv = (-lap_v + gp[:, 1]).reshape(x.shape[:-1])
    return fu, fv


stokes_stream_2d = ManufacturedSolution(
    "stokes_stream_2d", 2, _stokes_vel_2d, _stokes_rhs_2d,
    "div-free stream-function Stokes solution, p = sin(pi x) cos(pi y)")

ALL = {s.name: s for s in (poisson_sin_3d, poisson_sin_2d,
                           poisson_quadratic_3d, stokes_stream_2d)}
