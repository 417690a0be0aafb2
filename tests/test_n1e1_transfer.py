"""N1E1 Whitney transfers + Hiptmair-smoothed GMG for curl-curl.

Reference: N1E1toN1E1Prolongation/Restriction and the hybrid-smoother
multigrid of tests/hyteg/N1E1/N1E1CurlCurlConvergenceTest.cpp."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hyteg_tpu.core.types import BoundaryCondition, FLAG_INNER
from hyteg_tpu.functions.n1e1 import N1E1Space
from hyteg_tpu.mesh import meshinfo as mi
from hyteg_tpu.operators.n1e1_ops import N1E1ElementwiseOperator
from hyteg_tpu.operators.n1e1_transfer import (N1E1Transfer,
                                               whitney_stencil_table)
from hyteg_tpu.primitives.storage import CellStorage
from hyteg_tpu.solvers.hiptmair import HiptmairSmoother


@pytest.fixture(scope="module")
def storage():
    return CellStorage(mi.mesh_unit_cube(1), num_shards=1)


def test_table_covers_all_odd_patterns():
    tab = whitney_stencil_table()
    assert len(tab) == 4 ** 3 - 2 ** 3  # all mod-4 patterns with an odd coord
    for entries in tab.values():
        assert 1 <= len(entries) <= 6


def test_prolongation_preserves_constant_fields(storage):
    """A constant vector field w is exactly representable on every level;
    its coarse interpolant must prolongate to the fine interpolant."""
    csp = N1E1Space(storage, 1)
    fsp = N1E1Space(storage, 2)
    tr = N1E1Transfer(csp, fsp)
    w = jnp.asarray([0.3, -0.7, 0.51])
    expr = lambda p: jnp.broadcast_to(w, p.shape[:-1] + (3,))
    uc = csp.interpolate(expr)
    uf_want = fsp.interpolate(expr)
    uf = tr.prolongate_local(uc)
    em = jnp.asarray(fsp.edge_mask, dtype=jnp.float32)[None]
    err = float(jnp.max(jnp.abs((uf - uf_want) * em)))
    assert err < 1e-5, err


def test_prolongation_preserves_linear_fields(storage):
    """Whitney spaces contain fields with constant curl (lowest-order
    Nedelec): w(x) = a + b x x is reproduced exactly by interpolation,
    so coarse-interpolate-then-prolongate equals fine-interpolate."""
    csp = N1E1Space(storage, 1)
    fsp = N1E1Space(storage, 2)
    tr = N1E1Transfer(csp, fsp)
    a = jnp.asarray([0.2, 0.1, -0.4])
    b = jnp.asarray([-0.3, 0.9, 0.5])

    def expr(p):
        return a + jnp.cross(jnp.broadcast_to(b, p.shape[:-1] + (3,)), p)

    uc = csp.interpolate(expr, n_gauss=4)
    uf_want = fsp.interpolate(expr, n_gauss=4)
    uf = tr.prolongate_local(uc)
    em = jnp.asarray(fsp.edge_mask, dtype=jnp.float32)[None]
    err = float(jnp.max(jnp.abs((uf - uf_want) * em)))
    assert err < 1e-5, err


def test_restriction_is_transpose(storage):
    """<P uc, rf>_fine == <uc, R rf>_coarse over unique DoFs."""
    csp = N1E1Space(storage, 1)
    fsp = N1E1Space(storage, 2)
    tr = N1E1Transfer(csp, fsp)
    key = jax.random.PRNGKey(3)
    k1, k2 = jax.random.split(key)
    cm = jnp.asarray(csp.edge_mask, dtype=jnp.float32)[None]
    fm = jnp.asarray(fsp.edge_mask, dtype=jnp.float32)[None]
    uc = jax.random.normal(k1, csp.block_shape) * cm
    uc = csp.exchange_rep(uc)
    rf = jax.random.normal(k2, fsp.block_shape) * fm
    rf = fsp.exchange_rep(rf)
    lhs = float(fsp.node_space.dot(tr.prolongate_local(uc), rf))
    rhs = float(csp.node_space.dot(uc, tr.restrict(rf)))
    assert abs(lhs - rhs) < 1e-4 * max(1.0, abs(lhs)), (lhs, rhs)


def test_curlcurl_gmg_converges_mesh_independently(storage):
    """Hiptmair-smoothed V-cycles on alpha curl curl + beta id: the
    residual reduction per cycle stays bounded as the level grows."""
    bc = BoundaryCondition.all_dirichlet()
    rates = []
    for max_level in (1, 2):
        spaces = {l: N1E1Space(storage, l) for l in range(0, max_level + 1)}
        ops = {l: N1E1ElementwiseOperator(spaces[l], alpha=1.0, beta=0.1)
               for l in spaces}
        smoothers = {l: HiptmairSmoother(ops[l]) for l in spaces}
        transfers = {l: N1E1Transfer(spaces[l - 1], spaces[l])
                     for l in range(1, max_level + 1)}

        sp = spaces[max_level]
        op = ops[max_level]
        sd = sp.resolve_sd(None)

        def apply_inner_l(l, x):
            spl = spaces[l]
            sdl = spl.resolve_sd(None)
            y = ops[l].apply_raw(x, sdl)
            return spl.restore_rows(y, jnp.zeros_like(y), FLAG_INNER, sdl)
        em = jnp.asarray(sp.edge_mask, dtype=jnp.float32)[None]
        key = jax.random.PRNGKey(0)
        b = jax.random.normal(key, sp.block_shape) * em
        b = sp.exchange_rep(b, sd)
        b = sp.restore_rows(b, jnp.zeros_like(b), FLAG_INNER, sd)

        def cycle(x, b, l):
            if l == 0:
                # coarse: many Hiptmair sweeps act as the coarse solve
                return smoothers[0].smooth(x, b, num_sweeps=30)
            x = smoothers[l].smooth(x, b, num_sweeps=2)
            r = b - apply_inner_l(l, x)
            rc = transfers[l].restrict(r)
            rc = spaces[l - 1].restore_rows(
                rc, jnp.zeros_like(rc), FLAG_INNER,
                spaces[l - 1].resolve_sd(None))
            ec = cycle(jnp.zeros_like(rc), rc, l - 1)
            pc = transfers[l].prolongate_local(ec)
            # homogeneous-Dirichlet error equation: corrections must not
            # touch boundary DoFs
            pc = spaces[l].restore_rows(pc, jnp.zeros_like(pc), FLAG_INNER,
                                        spaces[l].resolve_sd(None))
            x = x + pc
            return smoothers[l].smooth(x, b, num_sweeps=2)

        def rn(x):
            r = b - apply_inner_l(max_level, x)
            return float(jnp.sqrt(sp.dot(r, r)))

        x = jnp.zeros_like(b)
        r0 = rn(x)
        step = jax.jit(lambda x: cycle(x, b, max_level))
        for _ in range(4):
            x = step(x)
        r4 = rn(x)
        rates.append((r4 / r0) ** 0.25)
    # converges and does not degrade with the level
    assert rates[-1] < 0.5, rates
    assert rates[1] < max(2.5 * rates[0], 0.5), rates
