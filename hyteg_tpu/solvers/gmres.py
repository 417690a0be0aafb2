"""(F)GMRES and GKB solvers over pytree vectors.

Reference: src/hyteg/solvers/GMRESSolver.hpp, FGMRESSolver.hpp,
GKBSolver.hpp:61. Restart dimension is static (fixed-size Arnoldi basis
stacked along a leading axis via tree_map), so the whole solver jits as one
XLA program.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import jax.tree_util as jtu


def _axpy(a, x, y):
    return jtu.tree_map(lambda u, v: a * u + v, x, y)


def _scale(a, x):
    return jtu.tree_map(lambda u: a * u, x)


def _zeros_like(x):
    return jtu.tree_map(jnp.zeros_like, x)


def _basis_zeros(x, m):
    return jtu.tree_map(lambda u: jnp.zeros((m,) + u.shape, u.dtype), x)


def _basis_set(B, k, x):
    return jtu.tree_map(lambda b, u: b.at[k].set(u), B, x)


def _basis_get(B, k):
    return jtu.tree_map(lambda b: b[k], B)


def _basis_comb(B, coeffs):
    """sum_k coeffs[k] * B[k]."""
    def comb(b):
        return jnp.tensordot(coeffs, b, axes=1)

    return jtu.tree_map(comb, B)


def fgmres_solve(
    apply_fn: Callable,
    dot_fn: Callable,
    b,
    x0,
    restart: int = 30,
    max_restarts: int = 10,
    rtol: float = 1e-8,
    prec_fn: Callable | None = None,
):
    """Flexible right-preconditioned restarted GMRES.

    With a constant (or no) preconditioner this is standard restarted
    GMRES; a varying preconditioner (e.g. an inner GMG cycle) is supported
    because the preconditioned vectors Z are stored explicitly.
    """
    prec = prec_fn if prec_fn is not None else (lambda r: r)
    m = restart

    def norm(v):
        return jnp.sqrt(jnp.maximum(dot_fn(v, v), 0.0))

    b_norm = norm(b)
    tol = rtol * jnp.where(b_norm == 0, 1.0, b_norm)

    def one_cycle(x):
        r = jtu.tree_map(lambda u, v: u - v, b, apply_fn(x))
        beta = norm(r)
        V = _basis_set(_basis_zeros(x, m + 1), 0,
                       _scale(1.0 / jnp.where(beta == 0, 1.0, beta), r))
        Z = _basis_zeros(x, m)
        H = jnp.zeros((m + 1, m))
        cs = jnp.zeros(m)
        sn = jnp.zeros(m)
        g = jnp.zeros(m + 1).at[0].set(beta)

        def arnoldi_step(k, state):
            V, Z, H, cs, sn, g = state
            vk = _basis_get(V, k)
            zk = prec(vk)
            w = apply_fn(zk)
            # modified Gram-Schmidt
            hcol = jnp.zeros(m + 1)

            def mgs(j, carry):
                w, hcol = carry
                vj = _basis_get(V, j)
                hij = jnp.where(j <= k, dot_fn(w, vj), 0.0)
                w = _axpy(-hij, vj, w)
                return w, hcol.at[j].set(hij)

            w, hcol = jax.lax.fori_loop(0, m + 1, mgs, (w, hcol))
            hk1 = norm(w)
            hcol = hcol.at[k + 1].set(hk1)
            w = _scale(1.0 / jnp.where(hk1 == 0, 1.0, hk1), w)
            V = _basis_set(V, k + 1, w)
            Z = _basis_set(Z, k, zk)

            # apply accumulated Givens rotations to the new column
            def giv(j, hcol):
                a = hcol[j]
                bb = hcol[j + 1]
                upd = jnp.where(
                    j < k,
                    jnp.array([cs[j] * a + sn[j] * bb, -sn[j] * a + cs[j] * bb]),
                    jnp.array([a, bb]),
                )
                return hcol.at[j].set(upd[0]).at[j + 1].set(upd[1])

            hcol = jax.lax.fori_loop(0, m, giv, hcol)
            denom = jnp.sqrt(hcol[k] ** 2 + hcol[k + 1] ** 2)
            denom = jnp.where(denom == 0, 1.0, denom)
            ck, sk = hcol[k] / denom, hcol[k + 1] / denom
            hcol = hcol.at[k].set(ck * hcol[k] + sk * hcol[k + 1]).at[k + 1].set(0.0)
            g_new = g.at[k + 1].set(-sk * g[k]).at[k].set(ck * g[k])
            H = H.at[:, k].set(hcol[: m + 1])
            cs = cs.at[k].set(ck)
            sn = sn.at[k].set(sk)
            return V, Z, H, cs, sn, g_new

        V, Z, H, cs, sn, g = jax.lax.fori_loop(
            0, m, arnoldi_step, (V, Z, H, cs, sn, g)
        )
        # back substitution: solve H[:m,:m] y = g[:m]
        Hm = H[:m, :m] + jnp.eye(m) * 1e-30
        y = jax.scipy.linalg.solve_triangular(Hm, g[:m], lower=False)
        dx = _basis_comb(Z, y)
        return jtu.tree_map(lambda u, v: u + v, x, dx), jnp.abs(g[m])

    def cond(state):
        x, res, k = state
        return (k < max_restarts) & (res > tol)

    def body(state):
        x, _, k = state
        x, res = one_cycle(x)
        return x, res, k + 1

    r0 = norm(jtu.tree_map(lambda u, v: u - v, b, apply_fn(x0)))
    x, res, k = jax.lax.while_loop(cond, body, (x0, r0, jnp.asarray(0)))
    return x, res, k


gmres_solve = fgmres_solve  # constant-preconditioner case


def gkb_solve(
    apply_K: Callable,
    apply_B: Callable,
    apply_Bt: Callable,
    inner_solve: Callable,
    dot_u: Callable,
    dot_p: Callable,
    f,
    g,
    u0,
    p0,
    max_iter: int = 30,
    tol: float = 1e-8,
):
    """Golub-Kahan bidiagonalization for the saddle-point system
    [K B^T; B 0] (reference: GKBSolver.hpp:61, Arioli's algorithm).

    inner_solve(rhs) must approximately solve K w = rhs.
    u-space vectors use the K-inner product (via inner_solve), p-space the
    mass-ish dot_p. Simplified: nu = 0 (no augmented Lagrangian).
    """
    # init: u = K^{-1} f; then bidiagonalize on the residual of B u = g
    u = inner_solve(f)
    r0 = jtu.tree_map(lambda a, b_: a - b_, g, apply_B(u))
    beta = jnp.sqrt(jnp.maximum(dot_p(r0, r0), 0.0))
    q = _scale(1.0 / jnp.where(beta == 0, 1.0, beta), r0)

    w_raw = inner_solve(apply_Bt(q))
    alpha2 = dot_u(w_raw, apply_K(w_raw))
    alpha = jnp.sqrt(jnp.maximum(alpha2, 1e-30))
    v = _scale(1.0 / alpha, w_raw)

    z = beta / alpha
    u = _axpy(z, v, u)
    p = _scale(-z / alpha, q)
    d = _scale(1.0 / alpha, q)

    def body(state):
        u, p, v, q, d, alpha, z, k, res = state
        # q_{k+1}
        bv = apply_B(v)
        q_new_raw = jtu.tree_map(lambda a, b_: a - alpha * b_, bv, q)
        beta = jnp.sqrt(jnp.maximum(dot_p(q_new_raw, q_new_raw), 1e-30))
        q = _scale(1.0 / beta, q_new_raw)
        # v_{k+1}
        w_raw = inner_solve(apply_Bt(q))
        w_raw = jtu.tree_map(lambda a, b_: a - (beta / alpha) * b_, w_raw, v)
        alpha2 = dot_u(w_raw, apply_K(w_raw))
        alpha_new = jnp.sqrt(jnp.maximum(alpha2, 1e-30))
        v = _scale(1.0 / alpha_new, w_raw)
        z = -beta / alpha_new * z
        u = _axpy(z, v, u)
        d = _scale(1.0 / beta, jtu.tree_map(lambda a, b_: a - alpha * b_, q, d))
        # note: q here is already normalized q_{k+1}; d recurrence per Arioli
        p = _axpy(-z / alpha_new, d, p)
        return u, p, v, q, d, alpha_new, z, k + 1, jnp.abs(z)

    def cond(state):
        *_, k, res = state
        return (k < max_iter) & (res > tol)

    state = (u, p, v, q, d, alpha, z, jnp.asarray(1), jnp.abs(z))
    u, p, *_ , k, res = jax.lax.while_loop(cond, body, state)
    return u, p, k, res
