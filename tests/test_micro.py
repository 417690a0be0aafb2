"""Verify the derived micro-element structure against a from-scratch
re-derivation via Bey's red refinement (reference behavior:
src/hyteg/volumedofspace/CellDoFIndexing.hpp micro-cell types and
src/hyteg/Levelinfo.hpp closed forms)."""

import numpy as np

from hyteg_tpu.indexing import levelinfo, micro


def _mid(a, b):
    return tuple((ai + bi) / 2 for ai, bi in zip(a, b))


def _bey_children(t):
    v0, v1, v2, v3 = t
    m01, m02, m03 = _mid(v0, v1), _mid(v0, v2), _mid(v0, v3)
    m12, m13, m23 = _mid(v1, v2), _mid(v1, v3), _mid(v2, v3)
    return [
        (v0, m01, m02, m03), (m01, v1, m12, m13),
        (m02, m12, v2, m23), (m03, m13, m23, v3),
        (m01, m02, m03, m13), (m01, m02, m12, m13),
        (m02, m03, m13, m23), (m02, m12, m13, m23),
    ]


def test_tet_classes_match_bey_refinement():
    level = 3
    tets = [((0.0, 0.0, 0.0), (1.0, 0.0, 0.0), (0.0, 1.0, 0.0), (0.0, 0.0, 1.0))]
    for _ in range(level):
        tets = [c for t in tets for c in _bey_children(t)]
    scale = 2**level
    classes = {}
    for t in tets:
        it = [tuple(int(round(c * scale)) for c in v) for v in t]
        mn = tuple(min(v[i] for v in it) for i in range(3))
        off = tuple(tuple(v[i] - mn[i] for i in range(3)) for v in it)
        classes.setdefault(off, []).append(mn)

    assert len(classes) == micro.NUM_TET_CLASSES
    derived = {tuple(map(tuple, micro.TET_OFFSETS[t])) for t in range(6)}
    assert set(classes.keys()) == derived

    # base regions are the closed-form tet regions with the stored margins
    n = scale
    for t in range(6):
        off = tuple(map(tuple, micro.TET_OFFSETS[t]))
        bases = set(classes[off])
        margin = int(micro.TET_BASE_MARGIN[t])
        expect = {
            (x, y, z)
            for x in range(n)
            for y in range(n)
            for z in range(n)
            if x + y + z <= n - margin
        }
        assert bases == expect

    # union covers, count n^3
    assert len(tets) == n**3 == levelinfo.num_microcells_per_cell(level)


def test_stencil_directions():
    assert micro.stencil_directions(3).shape[0] == 15  # 15-point P1 tet stencil
    assert micro.stencil_directions(2).shape[0] == 7


def test_levelinfo_counts():
    for level in range(0, 5):
        N = levelinfo.num_points_per_edge(level)
        assert micro.vertex_mask_3d(level).sum() == levelinfo.num_microvertices_per_cell(level)
        assert micro.vertex_mask_2d(level).sum() == levelinfo.num_microvertices_per_face(level)
        # class base masks tile the micro-cell count
        total = sum(micro.cell_base_mask(level, t).sum() for t in range(6))
        assert total == levelinfo.num_microcells_per_cell(level)
        total2d = sum(micro.face_base_mask(level, t).sum() for t in range(2))
        assert total2d == levelinfo.num_microfaces_per_face(level)


def test_interface_interior_partition():
    for dim in (2, 3):
        for level in (1, 2, 3):
            vm = micro.vertex_mask(level, dim)
            im = micro.interior_mask(level, dim)
            fm = micro.interface_mask(level, dim)
            assert not np.any(im & fm)
            assert np.array_equal(im | fm, vm)
