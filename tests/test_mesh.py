"""Mesh generator sanity: volumes, conformity, boundary flags
(reference tests: tests/hyteg/meshes/)."""

import itertools

import numpy as np
import pytest

from hyteg_tpu.mesh import meshinfo as mi


def _volumes(mesh):
    v = mesh.points[mesh.elements]
    if mesh.dim == 3:
        J = v[:, 1:] - v[:, :1]
        return np.linalg.det(J) / 6.0
    e1 = v[:, 1, :2] - v[:, 0, :2]
    e2 = v[:, 2, :2] - v[:, 0, :2]
    return 0.5 * (e1[:, 0] * e2[:, 1] - e1[:, 1] * e2[:, 0])


def _check_conforming(mesh):
    """every interior facet in exactly 2 elements, boundary facets in 1."""
    els, dim = mesh.elements, mesh.dim
    combos = list(itertools.combinations(range(dim + 1), dim))
    facets = np.sort(np.concatenate([els[:, c] for c in combos]), axis=1)
    _, counts = np.unique(facets, axis=0, return_counts=True)
    assert counts.max() <= 2
    return counts


def test_unit_cube():
    mesh = mi.mesh_unit_cube(2)
    assert mesh.num_elements == 6 * 8
    vols = _volumes(mesh)
    assert np.all(np.abs(vols) > 0)
    assert np.isclose(np.abs(vols).sum(), 1.0)
    _check_conforming(mesh)
    # all 8 cube corners flagged boundary
    assert mesh.vertex_boundary_flag.sum() > 0


def test_cuboid_conforming_and_volume():
    mesh = mi.mesh_cuboid((0, 0, 0), (2.0, 1.0, 1.0), 2, 1, 3)
    assert np.isclose(np.abs(_volumes(mesh)).sum(), 2.0)
    _check_conforming(mesh)


def test_rectangle():
    for flavor in ("criss", "cross", "crisscross"):
        mesh = mi.mesh_rectangle((0, 0), (2, 1), 2, 2, flavor)
        assert np.isclose(np.abs(_volumes(mesh)).sum(), 2.0)
        _check_conforming(mesh)


def test_annulus():
    mesh = mi.mesh_annulus(0.5, 1.0, ntan=12, nrad=2)
    _check_conforming(mesh)
    # area of the polygonal annulus < exact annulus area, close for ntan=12
    area = np.abs(_volumes(mesh)).sum()
    exact = np.pi * (1.0**2 - 0.5**2)
    assert 0.9 * exact < area < exact
    assert set(np.unique(mesh.vertex_boundary_flag)) == {0, 1, 2}


def test_spherical_shell():
    mesh = mi.mesh_spherical_shell(ntan=1, nrad=2, rmin=0.5, rmax=1.0)
    counts = _check_conforming(mesh)
    vols = _volumes(mesh)
    assert np.all(np.abs(vols) > 1e-12)
    exact = 4.0 / 3.0 * np.pi * (1.0**3 - 0.5**3)
    polyhedral = np.abs(vols).sum()
    assert 0.8 * exact < polyhedral < exact
    assert set(np.unique(mesh.vertex_boundary_flag)) == {0, 1, 2}


def test_face_chain():
    mesh = mi.mesh_face_chain(7)
    assert mesh.num_elements == 7
    assert np.allclose(np.abs(_volumes(mesh)), np.sqrt(3) / 4)
    _check_conforming(mesh)


def test_torus():
    mesh = mi.mesh_torus(8, 6)
    vols = _volumes(mesh)
    assert np.all(np.abs(vols) > 1e-12)
    _check_conforming(mesh)
    # solid torus volume 2 pi^2 R r^2; coarse mesh underestimates
    exact = 2 * np.pi**2 * 2.0 * 1.0**2
    assert 0.5 * exact < np.abs(vols).sum() < exact


def test_gmsh_roundtrip(tmp_path):
    path = tmp_path / "square.msh"
    path.write_text(
        "$MeshFormat\n2.2 0 8\n$EndMeshFormat\n"
        "$Nodes\n4\n1 0 0 0\n2 1 0 0\n3 1 1 0\n4 0 1 0\n$EndNodes\n"
        "$Elements\n2\n1 2 2 0 1 1 2 3\n2 2 2 0 1 1 3 4\n$EndElements\n"
    )
    mesh = mi.from_gmsh_file(str(path))
    assert mesh.dim == 2
    assert mesh.num_elements == 2
    assert np.isclose(np.abs(_volumes(mesh)).sum(), 1.0)
