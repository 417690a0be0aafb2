"""N1E1 (Nedelec) space, curl-curl operator and Hiptmair smoother tests
(reference: tests/hyteg/N1E1/N1E1CurlCurlConvergenceTest.cpp and the
operator/form tests under tests/hyteg/N1E1/)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hyteg_tpu.core.types import BoundaryCondition, DoFType, FLAG_INNER
from hyteg_tpu.functions.n1e1 import (
    N1E1Space,
    directions,
    edge_tables,
    lex_sign,
    parities,
)
from hyteg_tpu.functions.edgedof import EdgeDoFSpace
from hyteg_tpu.indexing import micro
from hyteg_tpu.mesh import meshinfo as mi
from hyteg_tpu.operators.n1e1_ops import N1E1ElementwiseOperator, n1e1_elmats
from hyteg_tpu.primitives.storage import CellStorage
from hyteg_tpu.solvers.hiptmair import HiptmairSmoother
from hyteg_tpu.solvers.krylov import cg_solve


def _space(level=1, nmesh=1):
    storage = CellStorage(mi.mesh_unit_cube(nmesh), num_shards=1)
    return N1E1Space(storage, level), storage


def test_edge_tables_consistent():
    node_offs, par_idx, s_local = edge_tables(3)
    assert node_offs.shape == (6, 6, 3)
    assert set(np.unique(s_local)) <= {-1.0, 1.0}
    pars, dirs = parities(3), directions(3)
    for t in range(6):
        for e in range(6):
            p = node_offs[t, e] % 2
            assert np.array_equal(p, pars[par_idx[t, e]])


def test_num_edge_dofs_matches_unique_midpoints():
    sp, storage = _space(level=1, nmesh=1)
    sd = sp.resolve_sd(None)
    coords = np.asarray(sp.node_space.coords_from(sd.cell_vertices))
    mask = sp.edge_mask
    pts = []
    for c in range(storage.cells_per_shard):
        if not storage.cell_valid[c]:
            continue
        pts.append(coords[c][mask])
    pts = np.concatenate(pts)
    uniq = np.unique(np.round(pts * 1e6).astype(np.int64), axis=0)
    assert sp.num_global_dofs() == len(uniq)


def test_gradient_of_linear_potential_equals_interpolated_constant():
    """Circulation of grad(p) along an edge is p(head)-p(tail) exactly; for
    p = c . x both the discrete gradient and the 2-pt Gauss interpolation of
    the constant field c are exact, so they must agree to roundoff."""
    sp, _ = _space(level=2, nmesh=1)
    sd = sp.resolve_sd(None)
    c = jnp.asarray([0.3, -1.1, 0.7])
    coords = sp.node_space.coords_from(sd.cell_vertices)
    p = jnp.sum(coords * c, axis=-1) * jnp.asarray(
        sp.node_space.vertex_mask[None], dtype=sp.dtype)
    g = sp.gradient_apply(p)
    e = sp.interpolate(lambda x: jnp.broadcast_to(c, x.shape))
    np.testing.assert_allclose(np.asarray(g), np.asarray(e),
                               atol=5e-6, rtol=1e-4)


def test_curlcurl_kills_gradients():
    """curl(grad p) = 0: the curl-curl apply of G p must vanish (tests the
    canonical-orientation signs across macro-cell interfaces too)."""
    sp, _ = _space(level=1, nmesh=1)
    sd = sp.resolve_sd(None)
    op = N1E1ElementwiseOperator(sp, alpha=1.0, beta=0.0)
    key = jax.random.PRNGKey(3)
    p = jax.random.normal(key, sp.block_shape, dtype=sp.dtype)
    p = sp.node_space.exchange_rep(p, sd) * jnp.asarray(
        sp.node_space.vertex_mask[None], dtype=sp.dtype)
    gp = sp.gradient_apply(p)
    y = op.apply_raw(gp, sd)
    scale = float(jnp.max(jnp.abs(gp))) + 1.0
    assert float(jnp.max(jnp.abs(y))) < 1e-4 * scale


def _assemble_n1e1_dense(storage, sp, alpha, beta):
    """Independent numpy assembly of alpha*curlcurl + beta*mass."""
    gids = np.asarray(sp.node_space.global_ids(0))
    gids_grid = np.asarray(sp.node_space.global_ids_grid(0))
    elm = np.asarray(n1e1_elmats(sp, alpha, beta))  # signed, (C,T,6,6)
    node_offs, _, _ = edge_tables(3)
    ndof = int(gids.max()) + 1
    A = np.zeros((ndof, ndof))
    n = sp.n
    for c in range(storage.cells_per_shard):
        if not storage.cell_valid[c]:
            continue
        for t in range(6):
            bases = np.argwhere(micro.elem_base_mask(sp.level, t, 3))
            for base in bases:
                ids = [gids_grid[(c,) + tuple(2 * base + node_offs[t, e])]
                       for e in range(6)]
                for i in range(6):
                    for j in range(6):
                        A[ids[i], ids[j]] += elm[c, t, i, j]
    return A, gids


def test_apply_vs_dense_assembly_multicell():
    """Matrix-free apply == dense assembled matvec on a 6-cell cube (tests
    sign consistency of shared edges between macro-cells)."""
    sp, storage = _space(level=1, nmesh=1)
    sd = sp.resolve_sd(None)
    op = N1E1ElementwiseOperator(sp, alpha=1.0, beta=0.5)
    A, gids = _assemble_n1e1_dense(storage, sp, 1.0, 0.5)

    key = jax.random.PRNGKey(7)
    u = jax.random.normal(key, sp.block_shape, dtype=sp.dtype)
    u = sp.exchange_rep(u, sd) * jnp.asarray(sp.edge_mask[None], sp.dtype)
    y = np.asarray(op.apply_raw(u, sd))

    un = np.asarray(u)
    edge_sel = sp.edge_mask
    # gather one value per global edge DoF
    xg = np.zeros(A.shape[0])
    yg_ref = np.zeros(A.shape[0])
    for c in range(storage.cells_per_shard):
        if not storage.cell_valid[c]:
            continue
        ids = gids[c][edge_sel]
        xg[ids] = un[c][edge_sel]
    yd = A @ xg
    for c in range(storage.cells_per_shard):
        if not storage.cell_valid[c]:
            continue
        ids = gids[c][edge_sel]
        np.testing.assert_allclose(y[c][edge_sel], yd[ids],
                                   rtol=2e-3, atol=5e-5)


def test_mass_energy_of_constant_field():
    """E = const c: E^T M E must equal |c|^2 * vol(cube) = |c|^2."""
    sp, _ = _space(level=2, nmesh=1)
    sd = sp.resolve_sd(None)
    mass = N1E1ElementwiseOperator(sp, alpha=0.0, beta=1.0)
    c = jnp.asarray([0.4, -0.2, 0.9])
    e = sp.interpolate(lambda x: jnp.broadcast_to(c, x.shape), sd)
    me = mass.apply_raw(e, sd)
    energy = float(sp.dot(e, me, DoFType.ALL, sd))
    assert np.isclose(energy, float(jnp.sum(c * c)), rtol=2e-2)


def test_hiptmair_beats_jacobi():
    """CG on (curlcurl + mass) preconditioned by one Hiptmair sweep must
    reduce the residual far faster than Jacobi-preconditioned CG
    (reference: HybridSmoother motivation)."""
    sp, _ = _space(level=2, nmesh=1)
    bc = BoundaryCondition.all_dirichlet()
    sd = sp.resolve_sd(bc)
    op = N1E1ElementwiseOperator(sp, alpha=1.0, beta=1.0)
    hipt = HiptmairSmoother(op, sd)
    key = jax.random.PRNGKey(11)
    b = jax.random.normal(key, sp.block_shape, dtype=sp.dtype)
    b = sp.exchange_rep(b, sd) * jnp.asarray(sp.edge_mask[None], sp.dtype)
    zeros = jnp.zeros_like(b)
    b = sp.restore_rows(b, zeros, FLAG_INNER, sd)

    def apply_inner(x):
        y = op.apply_raw(x, sd)
        return sp.restore_rows(y, zeros, FLAG_INNER, sd)

    dot = lambda u, v: sp.dot(u, v, DoFType.ALL, sd)
    iters = 50
    inv_diag_masked = sp.restore_rows(op.inverse_diagonal(sd), zeros,
                                      FLAG_INNER, sd)
    x_j = cg_solve(apply_inner, dot, b, zeros, iters, rtol=1e-12,
                   prec_fn=lambda r: inv_diag_masked * r).x
    x_h = cg_solve(apply_inner, dot, b, zeros, iters, rtol=1e-12,
                   prec_fn=hipt.as_preconditioner()).x
    r_j = float(jnp.sqrt(dot(b - apply_inner(x_j), b - apply_inner(x_j))))
    r_h = float(jnp.sqrt(dot(b - apply_inner(x_h), b - apply_inner(x_h))))
    b0 = float(jnp.sqrt(dot(b, b)))
    # one-level Jacobi-Hiptmair: measured ~1.4e-5 vs Jacobi ~5.6e-2 at 50 its
    assert r_h < 2e-4 * b0
    assert r_h < 0.02 * max(r_j, 1e-30)


def test_edgedof_space_counts_and_interpolate():
    """Standalone EdgeDoF space (reference: EdgeDoFFunction)."""
    storage = CellStorage(mi.mesh_unit_cube(1), num_shards=1)
    ed = EdgeDoFSpace(storage, 1)
    n1 = N1E1Space(storage, 1)
    assert ed.num_global_dofs() == n1.num_global_dofs()
    u = ed.interpolate(1.0)
    # sum counts every edge exactly once
    assert np.isclose(float(ed.dof_sum(u)), ed.num_global_dofs(), rtol=1e-5)
    # 7 orientations tile the odd nodes
    assert ed.orientation_masks.shape[0] == 7
    assert np.array_equal(ed.orientation_masks.any(0), ed.edge_mask)
