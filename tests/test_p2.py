"""P2 space + operator tests (reference: tests/hyteg/P2/
P2ElementwiseOperatorTest, P2PetscApplyTest-style dense equivalence)."""

import numpy as np
import pytest

import jax.numpy as jnp

from hyteg_tpu.core.types import BoundaryCondition, DoFType, FLAG_INNER
from hyteg_tpu.functions.p2 import P2Space
from hyteg_tpu.indexing import micro
from hyteg_tpu.mesh import meshinfo as mi
from hyteg_tpu.operators import quadrature as q
from hyteg_tpu.operators.p2_elementwise import (
    P2ElementwiseOperator,
    compute_p2_elmats,
    p2_node_offsets,
)
from hyteg_tpu.primitives.storage import CellStorage


def test_node_offsets_are_midpoints():
    """Node O_t(g) must equal the physical P2 node of the micro-element."""
    for dim in (2, 3):
        offs = micro.offsets(dim)
        gs = q.p2_offsets(dim)
        node_offs = p2_node_offsets(dim)
        for t in range(offs.shape[0]):
            for A, g in enumerate(gs):
                # barycentric point g/2 of element with vertices offs[t]
                w0 = (2 - g.sum()) / 2.0
                pt = w0 * offs[t, 0] + sum(
                    (g[i] / 2.0) * offs[t, 1 + i] for i in range(dim)
                )
                # node-grid coordinate = 2 * element-grid coordinate
                assert np.allclose(2 * pt, node_offs[t, A])


def _assemble_p2_dense(storage, p2, elmat_np):
    """Independent numpy assembly over all micro-elements."""
    ndof = p2.num_global_dofs()
    A = np.zeros((ndof, ndof))
    dim, n = p2.dim, p2.n
    offs = micro.offsets(dim)
    node_offs = p2_node_offsets(dim)
    gids = p2.global_ids_grid(0)
    verts_all = p2.cell_vertices(0)
    for c in range(storage.cells_per_shard):
        if not storage.cell_valid[c]:
            continue
        v = verts_all[c][:, :dim] if dim == 2 else verts_all[c]
        v0, J = v[0], (v[1:] - v[:1])
        for t in range(offs.shape[0]):
            bases = np.argwhere(micro.elem_base_mask(p2.level, t, dim))
            mv = v0 + (offs[t] / n) @ J
            el = elmat_np(mv)
            for base in bases:
                ids = [
                    gids[(c,) + tuple(2 * base + node_offs[t, A])]
                    for A in range(node_offs.shape[1])
                ]
                for a in range(len(ids)):
                    for b in range(len(ids)):
                        A[ids[a], ids[b]] += el[a, b]
    return A


def _np_p2_stiffness(verts):
    dim = verts.shape[1]
    pts, w = q.simplex_rule(dim, 2)
    grads = q.p2_grads_at(dim, pts)
    J = (verts[1:] - verts[:1]).T
    Jinv = np.linalg.inv(J)
    detJ = abs(np.linalg.det(J))
    g = np.einsum("aqd,de->aqe", grads, Jinv)
    return detJ * np.einsum("q,aqe,bqe->ab", w, g, g)


def _to_blocks(p2, vec):
    gids = p2.global_ids(0)
    out = np.zeros(p2.block_shape)
    sel = gids >= 0
    out[sel] = vec[gids[sel]]
    return jnp.asarray(out, dtype=p2.dtype)


def _from_blocks(p2, blocks):
    gids = p2.global_ids(0)
    vec = np.full(p2.num_global_dofs(), np.nan)
    sel = gids >= 0
    vec[gids[sel]] = np.asarray(blocks)[sel]
    return vec


@pytest.mark.parametrize(
    "mesh_fn,level",
    [
        (lambda: mi.mesh_unit_cube(1), 1),
        (lambda: mi.mesh_rectangle((0, 0), (1, 1), 2, 1), 1),
        (lambda: mi.mesh_rectangle((0, 0), (1, 1), 1, 1), 2),
    ],
)
def test_p2_laplace_matches_dense(mesh_fn, level):
    storage = CellStorage(mesh_fn(), num_shards=1)
    p2 = P2Space(storage, level)
    op = P2ElementwiseOperator(p2, "laplace")
    A = _assemble_p2_dense(storage, p2, _np_p2_stiffness)
    rng = np.random.default_rng(0)
    v = rng.standard_normal(p2.num_global_dofs())
    got = _from_blocks(p2, op.apply_raw(_to_blocks(p2, v)))
    scale = np.abs(A @ v).max()
    assert np.allclose(got, A @ v, atol=2e-4 * max(scale, 1.0))


def test_p2_mass_total_volume():
    storage = CellStorage(mi.mesh_unit_cube(1), num_shards=1)
    p2 = P2Space(storage, 1)
    op = P2ElementwiseOperator(p2, "mass")
    ones = p2.function().interpolate(1.0)
    total = float(p2.dot(ones.cells, op.apply_raw(ones.cells)))
    assert np.isclose(total, 1.0, rtol=1e-4)


def test_p2_interpolation_exact_for_quadratics():
    """P2 captures quadratics exactly: mass-weighted L2 error of the
    interpolant of x^2+xy is ~0 when tested against quadrature."""
    storage = CellStorage(mi.mesh_unit_cube(1), num_shards=1)
    p2 = P2Space(storage, 1)
    lap = P2ElementwiseOperator(p2, "laplace")
    uq = p2.function().interpolate(
        lambda p: p[..., 0] ** 2 + p[..., 0] * p[..., 1]
    )
    # A u_quad on interior rows equals the weak Laplacian load: for
    # u = x^2 + xy, -div grad u = -2, so A u = -(-2) M 1 ... check against
    # mass路 instead: A u + 2*(M 1) should vanish on interior rows
    mass = P2ElementwiseOperator(p2, "mass")
    ones = p2.function().interpolate(1.0)
    r = lap.apply_raw(uq.cells) + 2.0 * mass.apply_raw(ones.cells)
    flat = np.asarray(r).reshape(-1)
    m = p2.node_space.maps
    sf = m.slot_flat[0]
    inner_slots = (m.slot_meshflag[0] == 0) & (sf < flat.shape[0])
    interior_vals = np.asarray(r)[:, p2.interior_mask]
    scale = np.abs(np.asarray(lap.apply_raw(uq.cells))).max()
    assert np.max(np.abs(interior_vals)) < 2e-4 * scale
    assert np.max(np.abs(flat[sf[inner_slots]])) < 2e-4 * scale


def test_p2_poisson_solve_better_than_p1():
    from hyteg_tpu.operators import forms
    from hyteg_tpu.operators.p1_elementwise import P1ElementwiseOperator
    from hyteg_tpu.functions.p1 import P1Space
    from hyteg_tpu.solvers.krylov import cg_solve

    storage = CellStorage(mi.mesh_unit_cube(1), num_shards=1)
    level = 2
    bc = BoundaryCondition.all_dirichlet()
    U = lambda p: jnp.sin(jnp.pi * p[..., 0]) * jnp.sin(jnp.pi * p[..., 1]) * jnp.sin(
        jnp.pi * p[..., 2]
    )
    F = lambda p: 3 * jnp.pi**2 * U(p)

    def solve_p2():
        p2 = P2Space(storage, level)
        lap = P2ElementwiseOperator(p2, "laplace")
        mass = P2ElementwiseOperator(p2, "mass")
        x = p2.interpolate(U, p2.zeros(), DoFType.DIRICHLET, bc)
        f = p2.interpolate(F, p2.zeros(), DoFType.ALL, bc)
        b = p2.restore_rows(mass.apply_raw(f), p2.zeros(), FLAG_INNER, bc)
        apply_fn = lambda v: lap.apply_inner(v, bc)
        dot_fn = lambda u, v: p2.dot(u, v, FLAG_INNER, bc)
        res = cg_solve(apply_fn, dot_fn, b, x, max_iter=400, rtol=1e-7)
        err = res.x - p2.interpolate(U, p2.zeros(), DoFType.ALL, bc)
        return float(jnp.sqrt(p2.dot(err, mass.apply_raw(err), DoFType.ALL, bc)))

    def solve_p1():
        sp = P1Space(storage, level)
        lap = P1ElementwiseOperator(sp, forms.laplace_form)
        mass = P1ElementwiseOperator(sp, forms.mass_form)
        x = sp.interpolate(U, sp.zeros(), DoFType.DIRICHLET, bc)
        f = sp.interpolate(F, sp.zeros(), DoFType.ALL, bc)
        b = sp.restore_rows(mass.apply_raw(f), sp.zeros(), FLAG_INNER, bc)
        apply_fn = lambda v: lap.apply_inner(v, bc)
        dot_fn = lambda u, v: sp.dot(u, v, FLAG_INNER, bc)
        res = cg_solve(apply_fn, dot_fn, b, x, max_iter=400, rtol=1e-7)
        err = res.x - sp.interpolate(U, sp.zeros(), DoFType.ALL, bc)
        return float(jnp.sqrt(sp.dot(err, mass.apply_raw(err), DoFType.ALL, bc)))

    e2, e1 = solve_p2(), solve_p1()
    # P2 error O(h^3) vs P1 O(h^2): at h=1/4 expect ~5-10x better
    assert e2 < 0.25 * e1, (e2, e1)
