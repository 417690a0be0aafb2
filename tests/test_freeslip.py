"""Free-slip normal projection (reference: ProjectNormalOperator tests)."""

import numpy as np
import jax.numpy as jnp

from hyteg_tpu.core.types import BoundaryCondition, DoFType
from hyteg_tpu.functions.p2 import P2Space
from hyteg_tpu.mesh import meshinfo as mi
from hyteg_tpu.operators.freeslip import NormalProjection, StrongFreeSlipWrapper
from hyteg_tpu.primitives.storage import CellStorage


def _setup():
    # annulus: flag 1 = inner rim (Dirichlet), flag 2 = outer rim (freeslip)
    mesh = mi.mesh_annulus(0.5, 1.0, 6, 1)
    st = CellStorage(mesh, num_shards=1)
    bc = BoundaryCondition.all_dirichlet().with_flag(2, DoFType.FREESLIP)
    sp = P2Space(st, 2)
    return st, sp, bc


def test_projection_zeroes_normal_component():
    st, sp, bc = _setup()
    proj = NormalProjection(sp, bc, lambda x: x[..., :2])  # radial normal
    vx = sp.interpolate(lambda x: 1.0 + 0 * x[..., 0], sp.zeros(),
                        DoFType.ALL, bc)
    vy = sp.interpolate(lambda x: 0.5 + 0 * x[..., 0], sp.zeros(),
                        DoFType.ALL, bc)
    px, py = proj.project((vx, vy))
    # on freeslip rows: (u.n) == 0 afterwards
    n = np.asarray(proj.normals)
    mask = np.asarray(proj.mask) > 0
    un = np.asarray(px) * n[..., 0] + np.asarray(py) * n[..., 1]
    assert np.abs(un[mask]).max() < 1e-5
    # off freeslip rows nothing changes
    np.testing.assert_array_equal(np.asarray(px)[~mask],
                                  np.asarray(vx)[~mask])
    # projecting twice is idempotent
    qx, qy = proj.project((px, py))
    np.testing.assert_allclose(np.asarray(qx), np.asarray(px), atol=1e-6)


def test_tangential_field_unchanged():
    st, sp, bc = _setup()
    proj = NormalProjection(sp, bc, lambda x: x[..., :2])
    # rigid rotation is tangential to circles: untouched by the projection
    vx = sp.interpolate(lambda x: -x[..., 1], sp.zeros(), DoFType.ALL, bc)
    vy = sp.interpolate(lambda x: x[..., 0], sp.zeros(), DoFType.ALL, bc)
    px, py = proj.project((vx, vy))
    # the macro rims are straight chords, so the discrete normal (radial)
    # is not exactly the chord normal; tolerance reflects that
    np.testing.assert_allclose(np.asarray(px), np.asarray(vx), atol=1e-5)
    np.testing.assert_allclose(np.asarray(py), np.asarray(vy), atol=1e-5)


def test_wrapped_operator_identity_on_normal_space():
    st, sp, bc = _setup()
    proj = NormalProjection(sp, bc, lambda x: x[..., :2])
    wrapped = StrongFreeSlipWrapper(lambda v: tuple(2.0 * a for a in v), proj)
    vx = sp.interpolate(lambda x: x[..., 0], sp.zeros(), DoFType.ALL, bc)
    vy = sp.interpolate(lambda x: x[..., 1], sp.zeros(), DoFType.ALL, bc)
    out = wrapped((vx, vy))
    # normal part passes through with identity; tangential part doubled
    pn = proj.normal_part((vx, vy))
    pt = proj.project((vx, vy))
    want = tuple(2.0 * t + n for t, n in zip(pt, pn))
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(want[0]),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(out[1]), np.asarray(want[1]),
                               atol=1e-5)
