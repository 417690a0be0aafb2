"""P2-P1 Taylor-Hood Stokes (reference: tests/hyteg/composites/
P2P1StokesOperatorTest, tests/hyteg/convergence/P2P1StokesMinResConvergenceTest)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hyteg_tpu.composites.stokes import P2P1TaylorHoodStokes, TaylorHoodVec
from hyteg_tpu.core.types import BoundaryCondition, DoFType, FLAG_INNER
from hyteg_tpu.mesh import meshinfo as mi
from hyteg_tpu.operators.p2_elementwise import P2ElementwiseOperator
from hyteg_tpu.primitives.storage import CellStorage
from hyteg_tpu.solvers.krylov import minres_solve


# 2D manufactured solution: u = curl psi (div-free, zero on boundary),
# psi = sin^2(pi x) sin^2(pi y); p = cos(pi x) cos(pi y) (zero mean)
PSI = lambda x, y: jnp.sin(jnp.pi * x) ** 2 * jnp.sin(jnp.pi * y) ** 2
U0 = lambda p: jax.grad(PSI, argnums=1)(p[0], p[1])
U1 = lambda p: -jax.grad(PSI, argnums=0)(p[0], p[1])
PFN = lambda p: jnp.cos(jnp.pi * p[0]) * jnp.cos(jnp.pi * p[1])


def _vec_fn(fn):
    """Vectorize a scalar fn of (x, y) over coordinate arrays (..., 3)."""
    def wrapped(coords):
        flat = coords.reshape(-1, coords.shape[-1])
        vals = jax.vmap(fn)(flat[:, :2])
        return vals.reshape(coords.shape[:-1])
    return wrapped


def _forcing(d):
    """f_d = -lap(u_d) + dp/dx_d via autodiff."""
    u_fn = U0 if d == 0 else U1

    def f(xy):
        hess = jax.hessian(u_fn)(xy)
        lap = hess[0][0] + hess[1][1]
        dp = jax.grad(lambda q: PFN(q))(xy)[d]
        return -lap + dp

    def wrapped(coords):
        flat = coords.reshape(-1, coords.shape[-1])
        vals = jax.vmap(f)(flat[:, :2])
        return vals.reshape(coords.shape[:-1])

    return wrapped


@pytest.fixture(scope="module")
def stokes2d():
    storage = CellStorage(mi.mesh_rectangle((0, 0), (1, 1), 2, 2), num_shards=1)
    return P2P1TaylorHoodStokes(storage, level=2)


def test_divergence_annihilates_divfree(stokes2d):
    st = stokes2d
    x = st.zeros()
    x = st.interpolate_velocity([_vec_fn(U0), _vec_fn(U1)], x)
    y = st.apply_raw(x)
    # weak divergence of the interpolant of a div-free field: small
    # (interpolation error only) — compare to the divergence of a non-div-
    # free field of similar magnitude
    div_norm = float(jnp.sqrt(st.pre_space.dot(y.pre, y.pre, DoFType.ALL,
                                               st._pre_sd)))
    x2 = st.zeros()
    x2 = st.interpolate_velocity([_vec_fn(U0), _vec_fn(U0)], x2)
    y2 = st.apply_raw(x2)
    ref_norm = float(jnp.sqrt(st.pre_space.dot(y2.pre, y2.pre, DoFType.ALL,
                                               st._pre_sd)))
    assert div_norm < 0.15 * ref_norm, (div_norm, ref_norm)


def test_stokes_operator_symmetry(stokes2d):
    st = stokes2d
    rng = np.random.default_rng(0)

    def rand_vec():
        vel = []
        for _ in range(st.dim):
            v = jnp.asarray(rng.standard_normal(st.vel_space.block_shape)
                            .astype(np.float32) * st.vel_space.vertex_mask[None])
            v = st.vel_space.exchange_rep(v, st._vel_sd)
            v = st.vel_space.restore_rows(v, jnp.zeros_like(v), FLAG_INNER,
                                          st._vel_sd)
            vel.append(v)
        p = jnp.asarray(rng.standard_normal(st.pre_space.block_shape)
                        .astype(np.float32) * st.pre_space.vertex_mask[None])
        p = st.pre_space.exchange_rep(p, st._pre_sd)
        return TaylorHoodVec(tuple(vel), p)

    a, b = rand_vec(), rand_vec()
    Aa, Ab = st.apply_inner(a), st.apply_inner(b)
    s1, s2 = float(st.dot(b, Aa)), float(st.dot(a, Ab))
    assert np.isclose(s1, s2, rtol=2e-3), (s1, s2)


def test_stokes_minres_solve(stokes2d):
    st = stokes2d
    mass = P2ElementwiseOperator(st.vel_space, "mass")

    # rhs: b_u = M f (autodiff forcing), b_p = 0
    x = st.zeros()  # homogeneous velocity BC
    b = st.zeros()
    fvals = [st.vel_space.interpolate(_forcing(d), st.vel_space.zeros(),
                                      DoFType.ALL, st._vel_sd)
             for d in range(2)]
    bvel = tuple(
        st.vel_space.restore_rows(
            mass.apply_raw(fvals[d]), st.vel_space.zeros(), FLAG_INNER,
            st._vel_sd)
        for d in range(2)
    )
    b = TaylorHoodVec(bvel, st.pre_space.zeros())

    apply_fn = lambda v: st.apply_inner(v)
    dot_fn = lambda u, v: st.dot(u, v)
    prec = st.block_diag_preconditioner()
    solve = jax.jit(lambda b, x: minres_solve(apply_fn, dot_fn, b, x,
                                              max_iter=400, rtol=1e-6,
                                              prec_fn=prec))
    xs, iters, phibar = solve(b, x)
    r = b - st.apply_inner(xs)
    rnorm = float(st.norm(r))
    b0 = float(st.norm(b))
    assert rnorm < 1e-4 * b0, (rnorm, b0, int(iters))

    # velocity accuracy vs manufactured solution
    uex = st.interpolate_velocity([_vec_fn(U0), _vec_fn(U1)], st.zeros())
    err2 = 0.0
    for d in range(2):
        e = xs.vel[d] - uex.vel[d]
        err2 += float(st.vel_space.dot(e, mass.apply_raw(e), DoFType.ALL,
                                       st._vel_sd))
    l2 = np.sqrt(err2)
    assert l2 < 0.02, l2

    # pressure accuracy (after mean projection)
    pex = st.interpolate_pressure(_vec_fn(PFN), st.zeros())
    ph = st.project_mean(xs.pre)
    pe = st.project_mean(pex.pre)
    perr = ph - pe
    pl2 = float(jnp.sqrt(st.pre_space.dot(perr, perr, DoFType.ALL, st._pre_sd)))
    pref = float(jnp.sqrt(st.pre_space.dot(pe, pe, DoFType.ALL, st._pre_sd)))
    assert pl2 < 0.25 * pref, (pl2, pref)


def test_stokes_gmg_uzawa():
    """Stokes GMG with inexact Uzawa smoothing converges
    (reference: P1P1StokesUzawaConvergenceTest pattern)."""
    from hyteg_tpu.solvers.uzawa import make_stokes_gmg

    storage = CellStorage(mi.mesh_rectangle((0, 0), (1, 1), 2, 2), num_shards=1)
    stokes, gmg = make_stokes_gmg(storage, 1, 2, pre_smooth=3, post_smooth=3,
                                  omega_p=0.4, coarse_iters=120)
    st = stokes[2]
    mass = P2ElementwiseOperator(st.vel_space, "mass")
    fvals = [st.vel_space.interpolate(_forcing(d), st.vel_space.zeros(),
                                      DoFType.ALL, st._vel_sd)
             for d in range(2)]
    b = TaylorHoodVec(
        tuple(st.vel_space.restore_rows(mass.apply_raw(f),
                                        st.vel_space.zeros(), FLAG_INNER,
                                        st._vel_sd) for f in fvals),
        st.pre_space.zeros(),
    )
    x = st.zeros()
    cyc = jax.jit(lambda x, b: gmg.cycle(x, b))
    r0 = float(st.norm(b - st.apply_inner(x)))
    norms = [r0]
    for _ in range(6):
        x = cyc(x, b)
        norms.append(float(st.norm(b - st.apply_inner(x))))
    # Uzawa-GMG: sustained reduction per cycle
    assert norms[-1] < 0.02 * norms[0], norms
    rates = [norms[i + 1] / max(norms[i], 1e-30) for i in range(6)]
    assert min(rates) < 0.6, rates
