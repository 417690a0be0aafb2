"""Krylov solvers as pure JAX control flow.

Reference: src/hyteg/solvers/CGSolver.hpp:94 (preconditioned CG). Solvers
operate on raw DoF blocks; ``apply_fn`` must return A x restricted to the
solved rows (zero on Dirichlet rows) and ``dot_fn`` must count every global
DoF exactly once (the reference's dotGlobal).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class CGResult(NamedTuple):
    x: jnp.ndarray
    iterations: jnp.ndarray
    residual_norm2: jnp.ndarray


def cg_solve(
    apply_fn: Callable,
    dot_fn: Callable,
    b: jnp.ndarray,
    x0: jnp.ndarray,
    max_iter: int,
    rtol: float = 1e-8,
    atol: float = 0.0,
    prec_fn: Callable | None = None,
) -> CGResult:
    """(Preconditioned) conjugate gradients with lax.while_loop."""
    prec = prec_fn if prec_fn is not None else (lambda r: r)

    r0 = b - apply_fn(x0)
    z0 = prec(r0)
    rz0 = dot_fn(r0, z0)
    rr0 = dot_fn(r0, r0)
    tol2 = jnp.maximum(rtol * rtol * rr0, atol * atol)

    def cond(state):
        _, r, _, _, rr, k = state
        return (k < max_iter) & (rr > tol2)

    def body(state):
        x, r, p, rz, rr, k = state
        ap = apply_fn(p)
        pap = dot_fn(p, ap)
        alpha = rz / jnp.where(pap == 0, 1.0, pap)
        x = x + alpha * p
        r = r - alpha * ap
        z = prec(r)
        rz_new = dot_fn(r, z)
        beta = rz_new / jnp.where(rz == 0, 1.0, rz)
        p = z + beta * p
        return x, r, p, rz_new, dot_fn(r, r), k + 1

    x, r, _, _, rr, k = jax.lax.while_loop(
        cond, body, (x0, r0, z0, rz0, rr0, jnp.asarray(0))
    )
    return CGResult(x, k, rr)


def cg_solve_fixed(
    apply_fn: Callable,
    dot_fn: Callable,
    b: jnp.ndarray,
    x0: jnp.ndarray,
    num_iter: int,
) -> jnp.ndarray:
    """Fixed-iteration CG via fori_loop (cheap-to-compile coarse solver)."""
    r0 = b - apply_fn(x0)
    rr0 = dot_fn(r0, r0)

    def body(_, state):
        x, r, p, rr = state
        ap = apply_fn(p)
        pap = dot_fn(p, ap)
        safe_pap = jnp.where(pap <= 0, 1.0, pap)
        alpha = jnp.where(pap <= 0, 0.0, rr / safe_pap)
        x = x + alpha * p
        r = r - alpha * ap
        rr_new = dot_fn(r, r)
        beta = jnp.where(rr == 0, 0.0, rr_new / jnp.where(rr == 0, 1.0, rr))
        p = r + beta * p
        return x, r, p, rr_new

    x, _, _, _ = jax.lax.fori_loop(0, num_iter, body, (x0, r0, r0, rr0))
    return x
