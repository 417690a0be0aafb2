"""Cross-validate the owner-primitive global DoF numbering and interface maps
against brute-force coordinate identification (reference behavior:
consistent enumeration + halo exchange, tests/hyteg/communication/)."""

import numpy as np
import pytest

from hyteg_tpu.indexing import levelinfo, micro
from hyteg_tpu.mesh import meshinfo as mi
from hyteg_tpu.primitives.storage import CellStorage


def _coord_key_validation(storage, level):
    """Group every (cell, boundary position) by exact rational barycentric
    coordinates; assert the owner-scheme gid agrees."""
    n = 1 << level
    dim = storage.dim
    m = storage.p1_level_maps(level)
    N = m.N
    block = N**dim

    # dense gid per position per shard
    coords_of_gid: dict[int, tuple] = {}
    for d in range(storage.num_shards):
        sf, sg = m.slot_flat[d], m.slot_gid[d]
        ok = (sf < storage.cells_per_shard * block) & (sg < m.num_ifc)
        for s in np.nonzero(ok)[0]:
            flat = int(sf[s])
            c_local = flat // block
            rem = flat % block
            if dim == 3:
                x, y, z = rem // (N * N), (rem // N) % N, rem % N
                w = (n - x - y - z, x, y, z)
            else:
                x, y = rem // N, rem % N
                w = (n - x - y, x, y)
            cell = d * storage.cells_per_shard + c_local
            gids = storage.cell_gids[cell]
            key = tuple(sorted((int(g), int(wi)) for g, wi in zip(gids, w) if wi > 0))
            gid = int(sg[s])
            if gid in coords_of_gid:
                assert coords_of_gid[gid] == key, (
                    f"gid {gid} maps to two distinct physical points"
                )
            else:
                coords_of_gid[gid] = key

    # injectivity: distinct gids -> distinct points
    keys = list(coords_of_gid.values())
    assert len(set(keys)) == len(keys), "two gids share a physical point"
    return coords_of_gid


@pytest.mark.parametrize("shards", [1, 3])
@pytest.mark.parametrize(
    "mesh_fn,level",
    [
        (lambda: mi.mesh_unit_cube(1), 2),
        (lambda: mi.mesh_cuboid((0, 0, 0), (1, 1, 1), 2, 1, 1), 2),
        (lambda: mi.mesh_rectangle((0, 0), (1, 1), 2, 2), 3),
        (lambda: mi.mesh_spherical_shell(0, 1, 0.5, 1.0), 1),
    ],
)
def test_gid_consistency(mesh_fn, level, shards):
    storage = CellStorage(mesh_fn(), num_shards=shards)
    m = storage.p1_level_maps(level)
    mapping = _coord_key_validation(storage, level)
    # every interface DoF has at least one slot
    assert len(mapping) == m.num_ifc
    # multiplicity equals replica count
    counts = np.zeros(m.num_ifc + 1, dtype=np.int64)
    np.add.at(counts, m.slot_gid.reshape(-1), 1)
    assert np.array_equal(counts[: m.num_ifc], m.ifc_mult)
    assert np.all(m.ifc_mult >= 1)


def test_global_dof_count_unit_cube():
    # unit cube, 6 tets: micro-vertex count of the refined hex grid is known:
    # (n+1)^3 grid points + edge/face/diagonal points... validate against
    # brute-force coordinate dedup instead.
    level = 2
    storage = CellStorage(mi.mesh_unit_cube(1), num_shards=1)
    m = storage.p1_level_maps(level)
    n = 1 << level
    N = n + 1
    pts = set()
    for cell in range(storage.num_cells):
        verts = storage.cell_vertices[cell]
        for x in range(N):
            for y in range(N):
                for z in range(N):
                    if x + y + z > n:
                        continue
                    w0 = (n - x - y - z) / n
                    p = (
                        w0 * verts[0]
                        + (x / n) * verts[1]
                        + (y / n) * verts[2]
                        + (z / n) * verts[3]
                    )
                    pts.add(tuple(np.round(p, 9)))
    assert m.num_global_dofs == len(pts)


def test_partition_padding():
    mesh = mi.mesh_face_chain(5)  # 5 cells over 3 shards -> padding
    storage = CellStorage(mesh, num_shards=3)
    assert storage.num_cells == 6
    assert storage.cell_valid.sum() == 5
    m = storage.p1_level_maps(2)
    # padded slots dropped: all valid gids < num_ifc
    valid = m.slot_gid < m.num_ifc
    counts = np.zeros(m.num_ifc, dtype=np.int64)
    np.add.at(counts, m.slot_gid[valid], 1)
    assert counts.min() >= 1
