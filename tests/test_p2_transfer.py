"""P2 quadratic transfers + P2 GMG convergence (reference:
tests/hyteg/P2/P2QuadraticProlongationTest, tests/hyteg/convergence/)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hyteg_tpu.core.types import BoundaryCondition, DoFType, FLAG_INNER
from hyteg_tpu.functions.p2 import P2Space
from hyteg_tpu.mesh import meshinfo as mi
from hyteg_tpu.operators.p2_elementwise import P2ElementwiseOperator
from hyteg_tpu.operators.p2_transfer import P2Transfer
from hyteg_tpu.primitives.storage import CellStorage
from tests.test_p2 import _from_blocks, _to_blocks


@pytest.mark.parametrize(
    "mesh_fn,clevel",
    [
        (lambda: mi.mesh_unit_cube(1), 0),
        (lambda: mi.mesh_unit_cube(1), 1),
        (lambda: mi.mesh_rectangle((0, 0), (1, 1), 2, 1), 1),
    ],
)
def test_p2_prolongation_exact_on_quadratics(mesh_fn, clevel):
    storage = CellStorage(mesh_fn(), num_shards=1)
    cs, fs = P2Space(storage, clevel), P2Space(storage, clevel + 1)
    tr = P2Transfer(cs, fs)
    Q = lambda p: (
        1.0 + 2 * p[..., 0] - p[..., 1] + 0.5 * p[..., 0] * p[..., 1]
        + p[..., 0] ** 2 - 0.3 * p[..., 1] ** 2 + 0.1 * p[..., 2] * p[..., 0]
    )
    uc = cs.function().interpolate(Q)
    uf_expect = fs.function().interpolate(Q)
    uf = jax.jit(tr.prolongate_local)(uc.cells)
    err = np.abs(np.asarray(uf) - np.asarray(uf_expect.cells)).max()
    assert err < 5e-5, err


def test_p2_restriction_is_transpose():
    """<P uc, rf> == <uc, R rf> for random vectors (adjoint identity in the
    euclidean global-DoF inner product)."""
    storage = CellStorage(mi.mesh_unit_cube(1), num_shards=1)
    cs, fs = P2Space(storage, 1), P2Space(storage, 2)
    tr = P2Transfer(cs, fs)
    prol = jax.jit(tr.prolongate_local)
    restr = jax.jit(tr.restrict)
    rng = np.random.default_rng(5)
    nc, nf = cs.num_global_dofs(), fs.num_global_dofs()
    for trial in range(3):
        uc = rng.standard_normal(nc)
        rf = rng.standard_normal(nf)
        Puc = _from_blocks(fs, prol(_to_blocks(cs, uc)))
        Rrf = _from_blocks(cs, restr(_to_blocks(fs, rf)))
        lhs = float(np.dot(Puc, rf))
        rhs = float(np.dot(uc, Rrf))
        assert np.isclose(lhs, rhs, rtol=2e-4), (trial, lhs, rhs)


def test_p2_gmg_convergence():
    from hyteg_tpu.solvers.templates import make_p2_gmg

    storage = CellStorage(mi.mesh_unit_cube(1), num_shards=1)
    stack = make_p2_gmg(storage, 0, 2, smoother="chebyshev", coarse_iters=60)
    sp = stack.space()
    bc = BoundaryCondition.all_dirichlet()
    U = lambda p: jnp.sin(jnp.pi * p[..., 0]) * jnp.sin(jnp.pi * p[..., 1]) * jnp.sin(
        jnp.pi * p[..., 2]
    )
    F = lambda p: 3 * jnp.pi**2 * U(p)
    mass = P2ElementwiseOperator(sp, "mass")
    x = sp.interpolate(U, sp.zeros(), DoFType.DIRICHLET, bc)
    f = sp.interpolate(F, sp.zeros(), DoFType.ALL, bc)
    b = sp.restore_rows(mass.apply_raw(f), sp.zeros(), FLAG_INNER, bc)

    cycle = jax.jit(lambda x, b: stack.gmg.cycle(x, b))
    r0 = float(stack.residual_norm(x, b))
    xs = x
    norms = [r0]
    for _ in range(5):
        xs = cycle(xs, b)
        norms.append(float(stack.residual_norm(xs, b)))
    assert norms[-1] < 1e-3 * norms[0], norms

    # discretization error O(h^3): much smaller than P1's at same h
    uex = sp.interpolate(U, sp.zeros(), DoFType.ALL, bc)
    err = xs - uex
    l2 = float(jnp.sqrt(sp.dot(err, mass.apply_raw(err), DoFType.ALL, bc)))
    assert l2 < 5e-3, l2


def test_p2_variable_coefficient_gmg():
    """BASELINE config 2: P2 variable-coefficient diffusion, Chebyshev
    V-cycle — operator div(k grad) with nodal coefficient field."""
    from hyteg_tpu.operators.p2_elementwise import p2_apply_local

    storage = CellStorage(mi.mesh_unit_cube(1), num_shards=1)
    sp = P2Space(storage, 2)
    bc = BoundaryCondition.all_dirichlet()
    kf = lambda p: 1.0 + 0.5 * p[..., 0] + 0.25 * p[..., 1] * p[..., 2]
    k = sp.interpolate(kf, sp.zeros(), DoFType.ALL, bc)
    lap = P2ElementwiseOperator(sp, "laplace")
    # variable apply runs and is symmetric positive on a random vector
    rng = np.random.default_rng(0)
    v = jnp.asarray(
        rng.standard_normal(sp.block_shape).astype(np.float32)
        * sp.vertex_mask[None]
    )
    v = sp.exchange_rep(v, bc)
    Av = lap.apply_raw(v, coeff=k)
    quad = float(sp.dot(v, Av, DoFType.ALL, bc))
    assert quad > 0, quad  # k > 0 -> SPD
    w = jnp.asarray(
        rng.standard_normal(sp.block_shape).astype(np.float32)
        * sp.vertex_mask[None]
    )
    w = sp.exchange_rep(w, bc)
    Aw = lap.apply_raw(w, coeff=k)
    s1 = float(sp.dot(w, Av, DoFType.ALL, bc))
    s2 = float(sp.dot(v, Aw, DoFType.ALL, bc))
    assert np.isclose(s1, s2, rtol=1e-3), (s1, s2)  # symmetry
