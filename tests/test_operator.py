"""Matrix-free operator apply vs. independently assembled sparse matrix
(reference tests: tests/hyteg/P1/P1LaplaceOperator3DTest.cpp,
tests/hyteg/Petsc/P1PetscApplyTest.cpp — assembled-vs-matrix-free check)."""

import numpy as np
import pytest

import jax.numpy as jnp

from hyteg_tpu.core.types import BoundaryCondition, DoFType
from hyteg_tpu.functions.p1 import P1Space
from hyteg_tpu.indexing import micro
from hyteg_tpu.mesh import meshinfo as mi
from hyteg_tpu.operators import forms
from hyteg_tpu.operators.p1_elementwise import P1ElementwiseOperator
from hyteg_tpu.primitives.storage import CellStorage


def _np_laplace_elmat(verts):
    """Independent numpy P1 stiffness matrix (verts: (nv, dim))."""
    dim = verts.shape[1]
    J = (verts[1:] - verts[:1]).T
    vol = abs(np.linalg.det(J)) / (6.0 if dim == 3 else 2.0)
    ghat = np.concatenate([-np.ones((1, dim)), np.eye(dim)], axis=0)
    g = ghat @ np.linalg.inv(J)
    return vol * (g @ g.T)


def _np_mass_elmat(verts):
    dim = verts.shape[1]
    nv = dim + 1
    J = (verts[1:] - verts[:1]).T
    vol = abs(np.linalg.det(J)) / (6.0 if dim == 3 else 2.0)
    return vol * (np.ones((nv, nv)) + np.eye(nv)) / (20.0 if dim == 3 else 12.0)


def _assemble_dense(storage, space, elmat_fn):
    """Assemble the global matrix by looping every micro-element (numpy)."""
    ndof = space.num_global_dofs()
    A = np.zeros((ndof, ndof))
    dim = storage.dim
    n = space.n
    offs = micro.offsets(dim)
    for shard in range(storage.num_shards):
        gids = space.global_ids_grid(shard)
        verts_all = space.cell_vertices(shard)
        lo = shard * storage.cells_per_shard
        for c in range(storage.cells_per_shard):
            if not storage.cell_valid[lo + c]:
                continue
            v = verts_all[c][:, :dim] if dim == 2 else verts_all[c]
            v0, J = v[0], (v[1:] - v[:1])
            for t in range(offs.shape[0]):
                bases = np.argwhere(micro.elem_base_mask(space.level, t, dim))
                for base in bases:
                    mv = v0 + ((base + offs[t]) / n) @ J
                    el = elmat_fn(mv)
                    dofs = [tuple(base + offs[t, a]) for a in range(dim + 1)]
                    ids = [gids[(c,) + d] for d in dofs]
                    for a in range(dim + 1):
                        for b in range(dim + 1):
                            A[ids[a], ids[b]] += el[a, b]
    return A


def _to_blocks(space, vec, shard=0):
    gids = space.global_ids(shard)
    out = np.zeros(space.block_shape)
    sel = gids >= 0
    out[sel] = vec[gids[sel]]
    return jnp.asarray(out, dtype=space.dtype)


def _from_blocks(space, blocks, shard=0):
    """Read one value per global DoF (representative copy)."""
    gids = space.global_ids(shard)
    vec = np.full(space.num_global_dofs(), np.nan)
    flat_g = gids.reshape(-1)
    flat_v = np.asarray(blocks).reshape(-1)
    sel = flat_g >= 0
    vec[flat_g[sel]] = flat_v[sel]
    return vec


CASES = [
    (lambda: mi.mesh_unit_cube(1), 2),
    (lambda: mi.mesh_rectangle((0, 0), (1, 1), 2, 1), 2),
    (lambda: mi.mesh_annulus(0.5, 1.0, 6, 1), 2),
    (lambda: mi.mesh_spherical_shell(0, 1, 0.5, 1.0), 1),
]


@pytest.mark.parametrize("mesh_fn,level", CASES)
def test_laplace_apply_matches_dense(mesh_fn, level):
    storage = CellStorage(mesh_fn(), num_shards=1)
    space = P1Space(storage, level)
    op = P1ElementwiseOperator(space, forms.laplace_form)
    A = _assemble_dense(storage, space, _np_laplace_elmat)

    rng = np.random.default_rng(0)
    v = rng.standard_normal(space.num_global_dofs())
    expect = A @ v

    x = _to_blocks(space, v)
    got = _from_blocks(space, op.apply_raw(x))
    assert np.allclose(got, expect, rtol=1e-4, atol=1e-4)


def test_laplace_multishard_matches_dense():
    """Emulate the cross-shard psum in numpy and compare to dense."""
    from hyteg_tpu.operators.p1_elementwise import p1_apply_local

    storage = CellStorage(mi.mesh_unit_cube(1), num_shards=2)
    level = 1
    space = P1Space(storage, level)
    A = _assemble_dense(storage, space, _np_laplace_elmat)
    rng = np.random.default_rng(1)
    v = rng.standard_normal(space.num_global_dofs())
    expect = A @ v

    m = space.maps
    g = np.zeros(m.num_ifc + 1)
    local = {}
    for d in range(2):
        op = P1ElementwiseOperator(space, forms.laplace_form, shard=d)
        x = _to_blocks(space, v, d)
        y = np.asarray(p1_apply_local(x, op.elmats, level, space.dim))
        local[d] = y
        flat = y.reshape(-1)
        sf, sg = m.slot_flat[d], m.slot_gid[d]
        ok = sf < flat.shape[0]
        np.add.at(g, sg[ok], flat[sf[ok]])
    got = np.full(space.num_global_dofs(), np.nan)
    for d in range(2):
        flat = local[d].reshape(-1).copy()
        sf, sg = m.slot_flat[d], m.slot_gid[d]
        ok = sf < flat.shape[0]
        flat[sf[ok]] = g[sg[ok]]
        blocks = flat.reshape(space.block_shape)
        vals = _from_blocks(space, blocks, d)
        sel = ~np.isnan(vals)
        got[sel] = vals[sel]
    assert np.allclose(got, expect, rtol=1e-4, atol=1e-4)


def test_mass_total_equals_volume():
    storage = CellStorage(mi.mesh_unit_cube(1), num_shards=1)
    space = P1Space(storage, 2)
    op = P1ElementwiseOperator(space, forms.mass_form)
    ones = space.function().interpolate(1.0)
    m_ones = op.apply_raw(ones.cells)
    total = float(space.dot(ones.cells, m_ones))
    assert np.isclose(total, 1.0, rtol=1e-5)  # unit cube volume


def test_laplace_annihilates_linears():
    storage = CellStorage(mi.mesh_unit_cube(1), num_shards=1)
    space = P1Space(storage, 2)
    op = P1ElementwiseOperator(space, forms.laplace_form)
    u = space.function().interpolate(
        lambda x: 1.0 + 2 * x[..., 0] - 3 * x[..., 1] + 0.5 * x[..., 2]
    )
    y = op.apply_raw(u.cells)
    # rows of interior DoFs must vanish (Galerkin Laplacian of a linear fn)
    interior = np.asarray(y)[:, space.interior_mask]
    assert np.max(np.abs(interior)) < 1e-4
    # also non-domain-boundary interface rows vanish
    m = space.maps
    flat = np.asarray(y).reshape(-1)
    sf = m.slot_flat[0]
    inner = (m.slot_meshflag[0] == 0) & (sf < flat.shape[0])
    assert np.max(np.abs(flat[sf[inner]])) < 1e-4


def test_diagonal_matches_dense():
    storage = CellStorage(mi.mesh_unit_cube(1), num_shards=1)
    space = P1Space(storage, 1)
    op = P1ElementwiseOperator(space, forms.laplace_form)
    A = _assemble_dense(storage, space, _np_laplace_elmat)
    d = _from_blocks(space, op.diagonal_raw())
    assert np.allclose(d, np.diag(A), rtol=1e-4, atol=1e-5)


def test_variable_coefficient_operator():
    """div(k grad) with elementwise-averaged nodal k vs numpy assembly."""
    storage = CellStorage(mi.mesh_unit_cube(1), num_shards=1)
    level = 1
    space = P1Space(storage, level)
    kfn = lambda x: 1.0 + x[..., 0] + 0.5 * x[..., 1]
    k = space.function().interpolate(kfn)
    op = P1ElementwiseOperator(space, forms.laplace_form)

    def elmat_var(verts):
        kbar = np.mean(1.0 + verts[:, 0] + 0.5 * verts[:, 1])
        return kbar * _np_laplace_elmat(verts)

    A = _assemble_dense(storage, space, elmat_var)
    rng = np.random.default_rng(2)
    v = rng.standard_normal(space.num_global_dofs())
    x = _to_blocks(space, v)
    y = op.apply_raw(x, coeff=k.cells)
    got = _from_blocks(space, y)
    assert np.allclose(got, A @ v, rtol=1e-4, atol=1e-4)


def test_coeff_averaging_modes():
    """Harmonic/geometric coefficient averaging (reference:
    src/hyteg/forms/CoefficientAveraging.hpp) vs direct recomputation."""
    import jax.numpy as jnp
    import numpy as np
    from hyteg_tpu.mesh import meshinfo as mi
    from hyteg_tpu.operators import forms
    from hyteg_tpu.operators.averaging import coeff_average
    from hyteg_tpu.operators.p1_elementwise import P1ElementwiseOperator
    from hyteg_tpu.primitives.storage import CellStorage
    from hyteg_tpu.functions.p1 import P1Space

    storage = CellStorage(mi.mesh_single_tet(), num_shards=1)
    space = P1Space(storage, 2)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal(space.block_shape), jnp.float32)
    k = jnp.asarray(0.5 + rng.random(space.block_shape), jnp.float32)

    outs = {}
    for mode in ("arithmetic", "harmonic", "geometric"):
        op = P1ElementwiseOperator(space, forms.laplace_form, coeff_avg=mode)
        outs[mode] = np.asarray(op.apply_raw(x, coeff=k))
    # modes genuinely differ ...
    assert not np.allclose(outs["arithmetic"], outs["harmonic"])
    assert not np.allclose(outs["arithmetic"], outs["geometric"])
    # ... and agree for a constant coefficient
    kc = jnp.full_like(k, 2.0)
    ref = None
    for mode in ("arithmetic", "harmonic", "geometric"):
        op = P1ElementwiseOperator(space, forms.laplace_form, coeff_avg=mode)
        y = np.asarray(op.apply_raw(x, coeff=kc))
        if ref is None:
            ref = y
        np.testing.assert_allclose(y, ref, rtol=1e-5, atol=1e-6)
