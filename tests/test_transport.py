"""Semi-Lagrangian MMOC transport + UnsteadyDiffusion.

Mirrors the reference's MMOC advection benchmarks (circular flow,
tests/convection_particles/) and UnsteadyDiffusion convergence tests."""

import numpy as np
import jax
import jax.numpy as jnp

from hyteg_tpu.core.types import BoundaryCondition, DoFType
from hyteg_tpu.functions.p1 import P1Space
from hyteg_tpu.functions.p2 import P2Space
from hyteg_tpu.mesh import meshinfo as mi
from hyteg_tpu.numerictools import BDF2, UnsteadyDiffusion, cfl_max_dt
from hyteg_tpu.operators import forms
from hyteg_tpu.operators.p1_elementwise import P1ElementwiseOperator
from hyteg_tpu.primitives.storage import CellStorage
from hyteg_tpu.transport import MMOCTransport


def _blob(cx, cy, s=0.08):
    return lambda x: jnp.exp(-((x[..., 0] - cx) ** 2 + (x[..., 1] - cy) ** 2)
                             / (2 * s * s))


def test_mmoc_circular_flow_p2():
    """Advect a Gaussian blob an eighth-turn around the origin with the
    rigid rotation v = (-y, x); compare against the analytically rotated
    blob (reference: MMOC circular-flow benchmark)."""
    mesh = mi.mesh_rectangle(lower=(-1.0, -1.0), upper=(1.0, 1.0), nx=2, ny=2)
    storage = CellStorage(mesh, num_shards=1)
    level = 4
    sp = P2Space(storage, level)
    bc = BoundaryCondition.all_dirichlet()
    c0 = sp.interpolate(_blob(0.5, 0.0), sp.zeros(), DoFType.ALL, bc)
    vx = sp.interpolate(lambda x: -x[..., 1], sp.zeros(), DoFType.ALL, bc)
    vy = sp.interpolate(lambda x: x[..., 0], sp.zeros(), DoFType.ALL, bc)

    mm = MMOCTransport(storage, level, degree=2, vel_degree=2)
    theta = np.pi / 4.0
    steps = 8
    dt = theta / steps

    @jax.jit
    def run(c):
        def body(c, _):
            return mm.step(c, (vx, vy), dt, rk=4), None

        c, _ = jax.lax.scan(body, c, None, length=steps)
        return c

    c = run(c0)
    want = sp.interpolate(
        _blob(0.5 * np.cos(theta), 0.5 * np.sin(theta)),
        sp.zeros(), DoFType.ALL, bc,
    )
    num = float(sp.dot(c - want, c - want, DoFType.ALL))
    den = float(sp.dot(want, want, DoFType.ALL))
    assert np.sqrt(num / den) < 0.15  # interpolation-limited at level 4
    # maximum principle (approximately): no big over/undershoots
    assert float(sp.dof_max(c, DoFType.ALL)) < 1.15
    assert float(sp.dof_max(-c, DoFType.ALL)) < 0.2


def test_mmoc_mass_fix():
    mesh = mi.mesh_rectangle(lower=(-1.0, -1.0), upper=(1.0, 1.0), nx=2, ny=2)
    storage = CellStorage(mesh, num_shards=1)
    sp = P1Space(storage, 4)
    bc = BoundaryCondition.all_dirichlet()
    c0 = sp.interpolate(_blob(0.4, 0.0, 0.15), sp.zeros(), DoFType.ALL, bc)
    vx = sp.interpolate(lambda x: -x[..., 1], sp.zeros(), DoFType.ALL, bc)
    vy = sp.interpolate(lambda x: x[..., 0], sp.zeros(), DoFType.ALL, bc)
    mm = MMOCTransport(storage, 4, degree=1, vel_degree=1)
    M = P1ElementwiseOperator(sp, forms.mass_form)

    def mass_dot(a, b):
        return sp.dot(M.apply_raw(a), b, DoFType.ALL)

    c1 = mm.step(c0, (vx, vy), 0.1, rk=2)
    c1f = mm.mass_fix(c1, c0, mass_dot)
    m0 = float(mass_dot(c0, jnp.ones_like(c0)))
    m1 = float(mass_dot(c1f, jnp.ones_like(c1f)))
    np.testing.assert_allclose(m1, m0, rtol=1e-5)


def test_unsteady_diffusion_decay():
    """Backward-Euler heat equation: u = sin(pi x) sin(pi y) decays with
    rate exp(-2 pi^2 t) (reference: UnsteadyDiffusion tests)."""
    mesh = mi.mesh_rectangle(nx=1, ny=1)
    storage = CellStorage(mesh, num_shards=1)
    sp = P1Space(storage, 5)
    bc = BoundaryCondition.all_dirichlet()
    A = P1ElementwiseOperator(sp, forms.laplace_form)
    M = P1ElementwiseOperator(sp, forms.mass_form)
    ud = UnsteadyDiffusion(sp, A, M, bc, theta=1.0, cg_iters=400, cg_rtol=1e-9)
    U0 = lambda x: jnp.sin(jnp.pi * x[..., 0]) * jnp.sin(jnp.pi * x[..., 1])
    u = sp.interpolate(U0, sp.zeros(), DoFType.ALL, bc)
    u = sp.restore_rows(u, jnp.zeros_like(u), DoFType.INNER, sp.resolve_sd(bc))
    dt, nsteps = 2e-3, 4
    step = jax.jit(lambda u: ud.step(u, dt))
    for _ in range(nsteps):
        u = step(u)
    t = dt * nsteps
    decay = float(sp.dof_max(u, DoFType.ALL))
    want = np.exp(-2 * np.pi**2 * t)
    np.testing.assert_allclose(decay, want, rtol=0.05)


def test_bdf2_and_cfl():
    b = BDF2()
    np.testing.assert_allclose(b.lhs_coeff(0.1), 15.0)
    np.testing.assert_allclose(b.rhs_coeffs(0.1), (20.0, -5.0))
    np.testing.assert_allclose(float(cfl_max_dt(0.01, 2.0, cfl=0.5)), 0.0025,
                               rtol=1e-6)
