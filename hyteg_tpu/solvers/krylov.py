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


def minres_solve(
    apply_fn: Callable,
    dot_fn: Callable,
    b,
    x0,
    max_iter: int,
    rtol: float = 1e-8,
    prec_fn: Callable | None = None,
):
    """Preconditioned MINRES (reference: src/hyteg/solvers/MinresSolver.hpp)
    — the Stokes/saddle-point workhorse. Operands may be any pytree
    supporting +, -, scalar *, matching apply_fn/dot_fn."""
    prec = prec_fn if prec_fn is not None else (lambda r: r)

    import jax.tree_util as jtu

    def axpy(a, x, y):  # a*x + y over pytrees
        return jtu.tree_map(lambda u, v: a * u + v, x, y)

    def scale(a, x):
        return jtu.tree_map(lambda u: a * u, x)

    def zeros_like(x):
        return jtu.tree_map(jnp.zeros_like, x)

    r1 = jtu.tree_map(lambda u, v: u - v, b, apply_fn(x0))
    y = prec(r1)
    beta1 = jnp.sqrt(jnp.maximum(dot_fn(r1, y), 0.0))
    tol = rtol * beta1

    state = dict(
        x=x0, r1=r1, r2=r1, y=y,
        oldb=jnp.asarray(0.0), beta=beta1, dbar=jnp.asarray(0.0),
        epsln=jnp.asarray(0.0), phibar=beta1,
        cs=jnp.asarray(-1.0), sn=jnp.asarray(0.0),
        w=zeros_like(x0), w2=zeros_like(x0),
        k=jnp.asarray(0),
    )

    def cond(s):
        return (s["k"] < max_iter) & (s["phibar"] > tol)

    def body(s):
        v = scale(1.0 / jnp.where(s["beta"] == 0, 1.0, s["beta"]), s["y"])
        y = apply_fn(v)
        coef = jnp.where(s["k"] >= 1, s["beta"] / jnp.where(s["oldb"] == 0, 1.0, s["oldb"]), 0.0)
        y = axpy(-coef, s["r1"], y)
        alfa = dot_fn(v, y)
        y = axpy(-alfa / jnp.where(s["beta"] == 0, 1.0, s["beta"]), s["r2"], y)
        r1, r2 = s["r2"], y
        y = prec(r2)
        oldb = s["beta"]
        beta = jnp.sqrt(jnp.maximum(dot_fn(r2, y), 0.0))
        oldeps = s["epsln"]
        delta = s["cs"] * s["dbar"] + s["sn"] * alfa
        gbar = s["sn"] * s["dbar"] - s["cs"] * alfa
        epsln = s["sn"] * beta
        dbar = -s["cs"] * beta
        gamma = jnp.maximum(jnp.sqrt(gbar**2 + beta**2), 1e-30)
        cs = gbar / gamma
        sn = beta / gamma
        phi = cs * s["phibar"]
        phibar = sn * s["phibar"]
        w1 = s["w2"]
        w2 = s["w"]
        w = scale(
            1.0 / gamma,
            axpy(-oldeps, w1, axpy(-delta, w2, v)),
        )
        x = axpy(phi, w, s["x"])
        return dict(
            x=x, r1=r1, r2=r2, y=y, oldb=oldb, beta=beta, dbar=dbar,
            epsln=epsln, phibar=phibar, cs=cs, sn=sn, w=w, w2=w2,
            k=s["k"] + 1,
        )

    out = jax.lax.while_loop(cond, body, state)
    return out["x"], out["k"], out["phibar"]


def cg_solve_fixed(
    apply_fn: Callable,
    dot_fn: Callable,
    b: jnp.ndarray,
    x0: jnp.ndarray,
    num_iter: int,
) -> jnp.ndarray:
    """Fixed-iteration CG via fori_loop (cheap-to-compile coarse solver).

    Updates freeze once the residual has dropped ~to round-off relative to
    the initial residual: continuing fixed iterations past (float32)
    convergence would otherwise amplify rounding noise through the search
    direction (beta ~ ratio of noise) and destroy the coarse correction."""
    r0 = b - apply_fn(x0)
    rr0 = dot_fn(r0, r0)
    # attainable float accuracy: |r|/|r0| ~ O(eps); below that only noise
    eps = jnp.finfo(rr0.dtype).eps
    tol2 = (64.0 * eps) ** 2 * rr0

    def body(_, state):
        x, r, p, rr = state
        active = rr > tol2
        ap = apply_fn(p)
        pap = dot_fn(p, ap)
        ok = active & (pap > 0)
        alpha = jnp.where(ok, rr / jnp.where(pap <= 0, 1.0, pap), 0.0)
        x = x + alpha * p
        r = r - alpha * ap
        rr_new = jnp.where(ok, dot_fn(r, r), rr)
        beta = jnp.where(ok, rr_new / jnp.where(rr == 0, 1.0, rr), 0.0)
        p = jnp.where(ok, r + beta * p, p)
        return x, r, p, rr_new

    x, _, _, _ = jax.lax.fori_loop(0, num_iter, body, (x0, r0, r0, rr0))
    return x
