"""Diagnose the level-dependent box-GMG convergence degradation.

Experiments:
  1. accurate lambda_max(D^-1 A) per level (long power iteration)
  2. V(2,2) asymptotic rates per level (homogeneous problem, random x0)
  3. two-grid rates per level (exact-ish coarse solve) to isolate
     smoother+transfer from the recursion
  4. Galerkin check: A_c vs P^T A_f P on a tiny case
"""
import os
import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp

from hyteg_tpu.structured.box import BoxDomain
from hyteg_tpu.structured.operator import BoxStencilOperator
from hyteg_tpu.structured import gmg, transfer

DT = "float64"


def eig_accurate(op, iters=600):
    dom = op.domain
    inner = jnp.asarray(dom.interior_mask, dtype=dom.dtype)
    dinv = op.inverse_diagonal
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(dom.block_shape), dtype=dom.dtype)
    x = inner * x
    lam = 0.0
    for _ in range(iters):
        y = inner * (dinv * op.apply_raw(inner * x))
        lam = float(jnp.vdot(x.reshape(-1), y.reshape(-1)) /
                    jnp.vdot(x.reshape(-1), x.reshape(-1)))
        x = y / jnp.linalg.norm(y.reshape(-1))
    return lam


def vrate(levels, pre=2, post=2, ncyc=12):
    lvl = levels[0]
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal(lvl.domain.block_shape),
                    dtype=lvl.domain.dtype) * jnp.asarray(
        lvl.domain.interior_mask, dtype=lvl.domain.dtype)
    b = jnp.zeros_like(x)
    rates = []
    rn_prev = float(jnp.linalg.norm(
        (lvl.inner * lvl.op.residual(x, b)).reshape(-1)))
    for _ in range(ncyc):
        x = gmg.vcycle(levels, x, b, pre, post)
        rn = float(jnp.linalg.norm(
            (lvl.inner * lvl.op.residual(x, b)).reshape(-1)))
        rates.append(rn / max(rn_prev, 1e-300))
        rn_prev = rn
    return rates


def main():
    print("== lambda_max(D^-1 A) per level (accurate) ==")
    for lv in (2, 3, 4, 5):
        dom = BoxDomain((2, 2, 2), lv, dtype=DT)
        op = BoxStencilOperator(dom)
        lam = eig_accurate(op, iters=300)
        print(f"  level {lv}: lam_max = {lam:.6f}")

    print("== V(2,2) rates per level, per-level accurate eig ==")
    for lv in (3, 4, 5):
        dom = BoxDomain((2, 2, 2), lv, dtype=DT)
        levels = []
        d = dom
        while True:
            op = BoxStencilOperator(d)
            lam = eig_accurate(op, iters=200)
            levels.append(gmg.BoxLevel(d, op, lam))
            if d.level <= 1:
                break
            d = d.coarse()
        rates = vrate(levels)
        print(f"  level {lv}: rates = {[f'{r:.3f}' for r in rates]}")

    print("== two-grid rates per level (coarse solved hard) ==")
    for lv in (3, 4, 5):
        dom = BoxDomain((2, 2, 2), lv, dtype=DT)
        op = BoxStencilOperator(dom)
        lam = eig_accurate(op, iters=200)
        cd = dom.coarse()
        cop = BoxStencilOperator(cd)
        clam = eig_accurate(cop, iters=200)
        levels = [gmg.BoxLevel(dom, op, lam), gmg.BoxLevel(cd, cop, clam)]
        rates = vrate(levels, ncyc=10)  # coarse_cg 40 iters on cd
        print(f"  level {lv}: two-grid rates = {[f'{r:.3f}' for r in rates]}")

    print("== Galerkin check (level 2 -> 1, m=(1,1,1)) ==")
    fine = BoxDomain((1, 1, 1), 2, dtype=DT)
    coarse = fine.coarse()
    fop = BoxStencilOperator(fine)
    cop = BoxStencilOperator(coarse)
    nC = coarse.num_dofs()
    I = np.eye(nC)
    err = 0.0
    Ac = np.zeros((nC, nC))
    Ag = np.zeros((nC, nC))
    for j in range(nC):
        ec = jnp.asarray(I[j].reshape(coarse.block_shape), dtype=DT)
        Ac[:, j] = np.asarray(cop.apply_raw(ec)).reshape(-1)
        pf = transfer.prolongate(ec, coarse, fine)
        af = fop.apply_raw(pf)
        Ag[:, j] = np.asarray(
            transfer.restrict(af, fine, coarse)).reshape(-1)
    print(f"  ||A_c - P^T A_f P||_max = {np.abs(Ac - Ag).max():.3e}")
    print(f"  ||A_c||_max = {np.abs(Ac).max():.3e}")


if __name__ == "__main__":
    main()
