"""EG-P0 Stokes: epsilon form, div/grad adjointness, convergence.

Reference pattern: the EGApplyConvergence / EGP0StokesConvergence tests
of src/hyteg/egfunctionspace (EGEpsilonFormNitscheBC, EGDivFormNitscheBC).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hyteg_tpu.core.types import BoundaryCondition, DoFType, FLAG_INNER
from hyteg_tpu.functions.eg import EGFunction, EGSpace
from hyteg_tpu.mesh import meshinfo as mi
from hyteg_tpu.operators import forms
from hyteg_tpu.operators.eg_ops import EGLaplaceOperator
from hyteg_tpu.operators.eg_stokes import (EGP0StokesFunction,
                                           EGP0StokesOperator)
from hyteg_tpu.operators.p1_elementwise import P1ElementwiseOperator
from hyteg_tpu.primitives.storage import CellStorage
from hyteg_tpu.solvers.krylov import minres_solve


def _space(level):
    storage = CellStorage(mi.mesh_single_tet(), num_shards=1)
    return EGSpace(storage, level)


def _rand(sp, seed=0):
    key = jax.random.PRNGKey(seed)
    ks = jax.random.split(key, 4)
    m = jnp.asarray(sp.p1.vertex_mask[None], jnp.float32)
    sd = sp.p1.resolve_sd(None)
    vel = tuple(
        sp.p1.exchange_rep(
            jax.random.normal(k, sp.p1.block_shape, jnp.float32) * m, sd)
        for k in ks[:3])
    enr = (jax.random.normal(ks[3], sp.p0.block_shape, jnp.float32)
           * jnp.asarray(sp.p0._valid_weight, jnp.float32))
    return EGFunction(vel, enr, sp)


def test_eg_epsilon_symmetric_psd():
    sp = _space(2)
    op = EGLaplaceOperator(sp, form="epsilon")
    u, v = _rand(sp, 0), _rand(sp, 1)
    Au, Av = op.apply(u), op.apply(v)
    lhs, rhs = float(sp.dot(Au, v)), float(sp.dot(u, Av))
    assert abs(lhs - rhs) < 1e-3 * max(abs(lhs), 1.0), (lhs, rhs)
    assert float(sp.dot(Au, u)) > 0.0


def test_eg_epsilon_rigid_modes_in_kernel():
    """Constants AND linearized rotations u = w x x are in the kernel of
    the epsilon form (they are NOT in the kernel of the laplace form —
    the classic distinction between the two viscous blocks)."""
    sp = _space(2)
    op = EGLaplaceOperator(sp, form="epsilon")
    sd = sp.p1.resolve_sd(None)
    rot = (lambda p: p[..., 1], lambda p: -p[..., 0],
           lambda p: jnp.zeros_like(p[..., 0]))
    vel = tuple(sp.p1.interpolate(f, sp.p1.zeros(), DoFType.ALL, sd)
                for f in rot)
    u = EGFunction(vel, sp.p0.zeros(), sp)
    Au = op.apply(u)
    ref = max(float(jnp.abs(v).max()) for v in u.vel)
    for v in Au.vel:
        assert float(jnp.abs(v).max()) < 1e-4 * ref
    assert float(jnp.abs(Au.enr).max()) < 1e-4 * ref


def test_eg_div_adjoint():
    """<B u, q> == <u, B^T q> (the grad block is the exact transpose)."""
    sp = _space(2)
    op = EGP0StokesOperator(sp, form="epsilon")
    u = _rand(sp, 3)
    q = (jax.random.normal(jax.random.PRNGKey(7), sp.p0.block_shape)
         * jnp.asarray(sp.p0._valid_weight, jnp.float32))
    lhs = float(jnp.sum(op.apply_div(u) * q))
    rhs = float(sp.dot(u, op.apply_divT(q)))
    assert abs(lhs - rhs) < 1e-4 * max(abs(lhs), 1.0), (lhs, rhs)


def test_eg_div_exact_on_linear():
    """B applied to an affine divergence-free CG field is zero (affine
    fields are in [P1]^3, their element divergence is exact, and all
    enrichment jumps vanish)."""
    sp = _space(2)
    op = EGP0StokesOperator(sp)
    sd = sp.p1.resolve_sd(None)
    aff = (lambda p: p[..., 0] - 2.0 * p[..., 1],
           lambda p: p[..., 1] + p[..., 2],
           lambda p: -2.0 * p[..., 2] + p[..., 0])
    vel = tuple(sp.p1.interpolate(f, sp.p1.zeros(), DoFType.ALL, sd)
                for f in aff)
    u = EGFunction(vel, sp.p0.zeros(), sp)
    d = op.apply_div(u)
    assert float(jnp.abs(d).max()) < 1e-5


# -- manufactured Stokes -----------------------------------------------------


def _exact_u(p):
    """Divergence-free quadratic (nonzero Dirichlet data, imposed via
    interpolant lifting).  A zero-trace div-free field on a tet needs
    the degree-8 curl of the squared bubble, which is nowhere near its
    asymptotic regime on the levels a unit test can afford."""
    return jnp.stack([p[1] ** 2, p[2] ** 2, p[0] ** 2])


def _exact_p(p):
    return p[0] + p[1] + p[2] - 0.75


def _force(p):
    """f = -div(2 eps(u)) + grad p = -lap u + grad p (u divergence-free)."""
    lap = jnp.stack([
        jnp.trace(jax.hessian(lambda q: _exact_u(q)[d])(p))
        for d in range(3)])
    return -lap + jax.grad(_exact_p)(p)


def _solve(level, iters):
    sp = _space(level)
    op = EGP0StokesOperator(sp, form="epsilon")
    bc = BoundaryCondition.all_dirichlet()
    sd = sp.p1.resolve_sd(bc)

    mass = P1ElementwiseOperator(sp.p1, forms.mass_form)

    def _interp(fn):
        return sp.p1.interpolate(
            lambda pts: jax.vmap(fn)(pts.reshape(-1, 3))
            .reshape(pts.shape[:-1]),
            sp.p1.zeros(), DoFType.ALL, sd)

    # lifting: x0 carries the (interpolated) Dirichlet data; solve the
    # homogeneous-correction saddle system for delta = x - x0
    u0 = EGFunction(
        tuple(_interp(lambda q, d=d: _exact_u(q)[d]) for d in range(3)),
        sp.p0.zeros(), sp)
    a0 = op.visc.apply(u0)
    bvel = []
    for d in range(3):
        fd = _interp(lambda q, d=d: _force(q)[d])
        bvel.append(sp.p1.restore_rows(
            mass.apply_raw(fd) - a0.vel[d], sp.p1.zeros(), FLAG_INNER, sd))
    # enrichment rows: int f . psi_T = 0 exactly for constant f
    b = EGP0StokesFunction(
        EGFunction(tuple(bvel), -a0.enr, sp), -op.apply_div(u0))

    h = 1.0 / (1 << level)
    vol = jnp.asarray(sp.p0.elem_volumes) + 1e-30

    def apply_fn(x):
        xp = EGP0StokesFunction(x.u, op.project_pressure_mean(x.p))
        y = op.apply(xp, FLAG_INNER)
        return EGP0StokesFunction(y.u, op.project_pressure_mean(y.p))

    def prec_fn(r):
        # block equilibration: velocity rows ~ h, pressure rows ~ vol
        return EGP0StokesFunction(
            (1.0 / h) * r.u,
            op.project_pressure_mean(
                r.p / vol * jnp.asarray(sp.p0._valid_weight, r.p.dtype)))

    x, _, _ = jax.jit(lambda: minres_solve(
        apply_fn, op.dot, b, EGP0StokesFunction(sp.zeros(), sp.p0.zeros()),
        iters, rtol=1e-8, prec_fn=prec_fn))()
    return sp, x + EGP0StokesFunction(u0, sp.p0.zeros())


def _vel_l2_error(sp, x):
    """||u_CG + c psi - u_exact||_L2 by vectorized degree-2 quadrature."""
    from hyteg_tpu.indexing import flat, micro
    from hyteg_tpu.operators import quadrature as q

    dim, n, T = sp.dim, sp.p0.n, sp.p0.T
    pts, w = q.simplex_rule(dim, 2)
    pts, w = np.asarray(pts), np.asarray(w)
    lam = np.concatenate([1 - pts.sum(-1, keepdims=True), pts], -1)
    offs = micro.offsets(dim).astype(np.float64)
    N = sp.p1.N
    grids = [np.asarray(flat.unflatten_field(np.asarray(v), N, sp.p1.pitch))
             for v in x.u.vel]
    enr = np.asarray(x.u.enr)
    cv = np.asarray(sp.storage.cell_vertices)[..., :dim]
    uex = jax.jit(jax.vmap(_exact_u))
    err2 = 0.0
    for c in range(cv.shape[0]):
        v0, J = cv[c, 0], (cv[c, 1:] - cv[c, :1]).T  # J: (dim, dim)
        vol_e = abs(np.linalg.det(J)) / 6.0 / n ** dim
        for t in range(T):
            B = np.argwhere(np.asarray(sp.p0.base_mask[t]))  # (M, dim)
            ce = enr[c, t][tuple(B.T)]                        # (M,)
            for iq in range(len(w)):
                loc = lam[iq] @ offs[t]                       # (dim,)
                xq = v0 + ((B + loc) / n) @ J.T               # (M, dim)
                psi = (J @ (loc - offs[t].mean(0))) / n       # (dim,)
                ue = np.asarray(uex(jnp.asarray(xq)))         # (M, dim)
                for d in range(dim):
                    uh = sum(lam[iq, a]
                             * grids[d][c][tuple((B + offs[t, a]
                                                  .astype(int)).T)]
                             for a in range(dim + 1)) + ce * psi[d]
                    err2 += vol_e * w[iq] * float(
                        ((uh - ue[:, d]) ** 2).sum())
    return float(np.sqrt(err2))


@pytest.mark.slow
def test_eg_stokes_converges_second_order():
    """Velocity L2 error of the epsilon-form EG-P0 Stokes solve drops
    ~4x per refinement (reference: EG Stokes convergence studies)."""
    errs = {}
    for lvl, iters in ((2, 700), (3, 1600)):
        sp, x = _solve(lvl, iters)
        errs[lvl] = _vel_l2_error(sp, x)
    ratio = errs[2] / errs[3]
    assert ratio > 2.5, (errs, ratio)


def test_eg_stokes_coupled_symmetric():
    sp = _space(1)
    op = EGP0StokesOperator(sp, form="epsilon")
    u = EGP0StokesFunction(
        _rand(sp, 0),
        jax.random.normal(jax.random.PRNGKey(1), sp.p0.block_shape)
        * jnp.asarray(sp.p0._valid_weight, jnp.float32))
    v = EGP0StokesFunction(
        _rand(sp, 2),
        jax.random.normal(jax.random.PRNGKey(3), sp.p0.block_shape)
        * jnp.asarray(sp.p0._valid_weight, jnp.float32))
    sd = sp.p1.resolve_sd(None)
    for s in (u, v):
        vel = tuple(
            sp.p1.restore_rows(c, jnp.zeros_like(c), FLAG_INNER, sd)
            for c in s.u.vel)
        s.u = EGFunction(vel, s.u.enr, sp)
    lhs = float(op.dot(op.apply(u), v))
    rhs = float(op.dot(u, op.apply(v)))
    assert abs(lhs - rhs) < 1e-3 * max(abs(lhs), 1.0), (lhs, rhs)
