"""EG (enriched Galerkin) space: operator structure + convergence."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hyteg_tpu.core.types import BoundaryCondition, DoFType, FLAG_INNER
from hyteg_tpu.functions.eg import EGFunction, EGSpace
from hyteg_tpu.mesh import meshinfo as mi
from hyteg_tpu.operators.eg_ops import EGLaplaceOperator
from hyteg_tpu.operators import forms
from hyteg_tpu.operators.p1_elementwise import P1ElementwiseOperator
from hyteg_tpu.primitives.storage import CellStorage
from hyteg_tpu.solvers.krylov import cg_solve


def _space(level):
    storage = CellStorage(mi.mesh_single_tet(), num_shards=1)
    return EGSpace(storage, level)


def _rand(sp, seed=0, with_enr=True):
    key = jax.random.PRNGKey(seed)
    ks = jax.random.split(key, 4)
    m = jnp.asarray(sp.p1.vertex_mask[None], jnp.float32)
    sd = sp.p1.resolve_sd(None)
    vel = tuple(
        sp.p1.exchange_rep(
            jax.random.normal(k, sp.p1.block_shape, jnp.float32) * m, sd)
        for k in ks[:3])
    enr = (jax.random.normal(ks[3], sp.p0.block_shape, jnp.float32)
           * jnp.asarray(sp.p0._valid_weight, jnp.float32)
           if with_enr else sp.p0.zeros())
    return EGFunction(vel, enr, sp)


def test_eg_operator_symmetric_and_psd():
    sp = _space(2)
    op = EGLaplaceOperator(sp)
    u = _rand(sp, 0)
    v = _rand(sp, 1)
    Au = op.apply(u)
    Av = op.apply(v)
    lhs = float(sp.dot(Au, v))
    rhs = float(sp.dot(u, Av))
    assert abs(lhs - rhs) < 1e-3 * max(abs(lhs), 1.0), (lhs, rhs)
    quad = float(sp.dot(Au, u))
    assert quad > 0.0


def test_eg_constants_in_kernel():
    """A constant CG vector field with zero enrichment is in the kernel."""
    sp = _space(2)
    op = EGLaplaceOperator(sp)
    ones = EGFunction(
        tuple(jnp.asarray(sp.p1.vertex_mask[None], jnp.float32)
              for _ in range(3)),
        sp.p0.zeros(), sp)
    Au = op.apply(ones)
    for v in Au.vel:
        assert float(jnp.abs(v).max()) < 1e-4, float(jnp.abs(v).max())
    assert float(jnp.abs(Au.enr).max()) < 1e-4


def _solve(level, cg_iters=400):
    """Vector Poisson with the tet bubble solution (zero trace)."""
    sp = _space(level)
    op = EGLaplaceOperator(sp)
    bc = BoundaryCondition.all_dirichlet()
    sd = sp.p1.resolve_sd(bc)

    bub = lambda p: (p[..., 0] * p[..., 1] * p[..., 2]
                     * (1.0 - p[..., 0] - p[..., 1] - p[..., 2]))
    # -laplace(bubble) = 2 (xy + yz + xz)
    f = lambda p: 2.0 * (p[..., 0] * p[..., 1] + p[..., 1] * p[..., 2]
                         + p[..., 0] * p[..., 2])
    mass = P1ElementwiseOperator(sp.p1, forms.mass_form)
    fh = sp.p1.interpolate(f, sp.p1.zeros(), DoFType.ALL, sd)
    bvel = sp.p1.restore_rows(mass.apply_raw(fh), sp.p1.zeros(),
                              FLAG_INNER, sd)
    # int_T f . psi_T = O(h^{d+2}) (int psi = 0): higher order, dropped
    b = EGFunction((bvel,) * 3, sp.p0.zeros(), sp)

    def apply_fn(x):
        return op.apply_inner(x, FLAG_INNER)

    def dot_fn(a, bb):
        return sp.dot(a, bb)

    res = cg_solve(apply_fn, dot_fn, b, sp.zeros(), cg_iters, rtol=1e-7)
    x = res.x
    return _total_l2_error(sp, x, bub)


def _total_l2_error(sp, x, exact_scalar):
    """L2 error of the TOTAL EG field u_CG + c psi vs exact (all three
    components equal ``exact_scalar``), by degree-2 element quadrature —
    the enrichment is part of the approximant, so comparing the CG block
    alone under-reports the EG accuracy."""
    from hyteg_tpu.indexing import flat, micro
    from hyteg_tpu.operators import quadrature as q

    dim, n = sp.dim, sp.p0.n
    pts, w = q.simplex_rule(dim, 2)
    pts, w = np.asarray(pts), np.asarray(w)
    lam = np.concatenate([1 - pts.sum(-1, keepdims=True), pts], -1)  # (Q,nv)
    ev = np.asarray(sp.p0.elem_vertices())  # (C, T, n.., nv, dim)
    vols = np.asarray(sp.p0.elem_volumes)   # (C, T, n..)
    N = sp.p1.N
    grids = [np.asarray(flat.unflatten_field(np.asarray(v), N, sp.p1.pitch))
             for v in x.vel]  # (C, N, N, N)
    enr = np.asarray(x.enr)
    offs = micro.offsets(dim)
    err2 = 0.0
    C = ev.shape[0]
    for c in range(C):
        for t in range(sp.p0.T):
            bases = np.argwhere(np.asarray(sp.p0.base_mask[t]))
            for bidx in bases:
                b3 = tuple(bidx)
                verts = ev[(c, t) + b3]          # (nv, dim)
                ce = enr[(c, t) + b3]
                m = verts.mean(axis=0)
                nodal = np.stack(
                    [[grids[d][(c,) + tuple(bidx + offs[t, a])]
                      for a in range(dim + 1)] for d in range(dim)],
                    axis=0)                      # (dim, nv)
                xq = lam @ verts                 # (Q, dim)
                ucg = (lam @ nodal.T)            # (Q, dim)
                utot = ucg + ce * (xq - m[None])
                uex = exact_scalar(xq)[:, None] * np.ones((1, dim))
                err2 += vols[(c, t) + b3] * float(
                    (w * ((utot - uex) ** 2).sum(-1)).sum())
    return float(np.sqrt(err2))


def test_eg_poisson_converges_second_order():
    e2 = _solve(2)
    e3 = _solve(3)
    assert e3 < e2 / 2.5, (e2, e3)
