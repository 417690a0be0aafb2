"""Adaptive macro refinement: red-green conformity, measure preservation,
error indicator + marking, cross-mesh transfer
(reference: tests/hyteg/adaptiveRefinement/)."""

import itertools

import numpy as np
import jax.numpy as jnp
import pytest

from hyteg_tpu.adaptivity import (interpolate_between_storages,
                                  macro_gradient_indicator, mark_dorfler,
                                  refine_rg, refine_uniform)
from hyteg_tpu.core.types import BoundaryCondition, DoFType
from hyteg_tpu.functions.p1 import P1Space
from hyteg_tpu.mesh import meshinfo as mi
from hyteg_tpu.mesh.meshinfo import boundary_facets
from hyteg_tpu.primitives.storage import CellStorage


def _measure(mesh):
    v = mesh.points[mesh.elements][..., : mesh.dim]
    J = v[:, 1:] - v[:, :1]
    det = np.abs(np.linalg.det(J))
    return det.sum() / (2.0 if mesh.dim == 2 else 6.0)


def _conforming(mesh):
    """Every facet appears in <= 2 elements, and the boundary measure
    matches the mesh's convex geometry (no hanging facets)."""
    els = mesh.elements
    combos = list(itertools.combinations(range(mesh.dim + 1), mesh.dim))
    all_f = np.concatenate([els[:, c] for c in combos], axis=0)
    key = np.sort(all_f, axis=1)
    _, counts = np.unique(key, axis=0, return_counts=True)
    return counts.max() <= 2


def _boundary_measure(mesh):
    f = boundary_facets(mesh.elements, mesh.dim)
    pts = mesh.points[f][..., : mesh.dim]
    if mesh.dim == 2:
        return np.linalg.norm(pts[:, 1] - pts[:, 0], axis=1).sum()
    a = pts[:, 1] - pts[:, 0]
    b = pts[:, 2] - pts[:, 0]
    return 0.5 * np.linalg.norm(np.cross(a, b), axis=1).sum()


@pytest.mark.parametrize("dim", [2, 3])
def test_uniform_refinement(dim):
    mesh = mi.mesh_rectangle(nx=1, ny=1) if dim == 2 else mi.mesh_unit_cube(1)
    ref = refine_uniform(mesh)
    assert ref.num_elements == mesh.num_elements * 2 ** dim
    np.testing.assert_allclose(_measure(ref), _measure(mesh), rtol=1e-12)
    np.testing.assert_allclose(_boundary_measure(ref),
                               _boundary_measure(mesh), rtol=1e-12)
    assert _conforming(ref)
    # boundary flags survive
    assert ref.vertex_boundary_flag.max() == 1


@pytest.mark.parametrize("dim", [2, 3])
def test_rg_single_mark(dim):
    mesh = mi.mesh_rectangle(nx=2, ny=2) if dim == 2 else mi.mesh_unit_cube(1)
    res = refine_rg(mesh, [0])
    ref = res.mesh
    assert _conforming(ref)
    np.testing.assert_allclose(_measure(ref), _measure(mesh), rtol=1e-12)
    np.testing.assert_allclose(_boundary_measure(ref),
                               _boundary_measure(mesh), rtol=1e-12)
    assert ref.num_elements > mesh.num_elements
    assert (res.parent >= 0).all() and res.parent.max() < mesh.num_elements
    # marked element was red-refined into 2^dim children
    assert (res.parent == 0).sum() == 2 ** dim
    assert res.is_green.any()  # closure produced greens somewhere


def test_rg_custom_flags_preserved():
    mesh = mi.mesh_annulus(0.5, 1.0, 6, 1)
    res = refine_rg(mesh, [0, 1])
    f = res.mesh.vertex_boundary_flag
    assert set(np.unique(f)) <= {0, 1, 2}
    assert (f == 1).sum() >= (mesh.vertex_boundary_flag == 1).sum()
    assert _conforming(res.mesh)


def test_indicator_and_marking():
    mesh = mi.mesh_rectangle(nx=4, ny=4)
    st = CellStorage(mesh, num_shards=1)
    sp = P1Space(st, 3)
    bc = BoundaryCondition.all_dirichlet()
    # steep bump near (0.1, 0.1): highest gradient in the corner cells
    u = sp.interpolate(
        lambda x: jnp.exp(-(((x[..., 0] - 0.1) ** 2 + (x[..., 1] - 0.1) ** 2)
                            / 0.005)),
        sp.zeros(), DoFType.ALL, bc)
    eta = macro_gradient_indicator(sp, u)
    assert eta.shape[0] == st.cells_per_shard
    cmax = int(np.argmax(eta))
    cent = np.asarray(st.cell_vertices)[cmax, :, :2].mean(0)
    assert np.linalg.norm(cent - [0.1, 0.1]) < 0.3
    marked = mark_dorfler(eta, 0.5)
    assert 0 < len(marked) < st.cells_per_shard
    assert cmax in marked


def test_amr_cycle_with_transfer():
    """Refine where the indicator is large, rebuild storage, transfer the
    field; linear fields transfer exactly."""
    mesh = mi.mesh_rectangle(nx=2, ny=2)
    st = CellStorage(mesh, num_shards=1)
    level = 2
    sp = P1Space(st, level)
    bc = BoundaryCondition.all_dirichlet()
    u = sp.interpolate(lambda x: 2 * x[..., 0] - x[..., 1], sp.zeros(),
                       DoFType.ALL, bc)
    eta = macro_gradient_indicator(sp, u)
    res = refine_rg(mesh, mark_dorfler(eta, 0.4))
    st2 = CellStorage(res.mesh, num_shards=1)
    u2 = interpolate_between_storages(st, level, 1, u, st2)
    sp2 = P1Space(st2, level)
    want = sp2.interpolate(lambda x: 2 * x[..., 0] - x[..., 1], sp2.zeros(),
                           DoFType.ALL, bc)
    sel = np.asarray(sp2.vertex_mask)[None] & np.asarray(
        st2.cell_valid)[:, None, None]
    np.testing.assert_allclose(np.asarray(u2)[sel], np.asarray(want)[sel],
                               atol=5e-5)
