"""Geometry blending + blended/surrogate operators (reference:
tests/hyteg/blending/, tests/hyteg/geometry/, surrogate tests)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hyteg_tpu.core.types import BoundaryCondition, DoFType, FLAG_INNER
from hyteg_tpu.functions.p1 import P1Space
from hyteg_tpu.geometry.maps import RadialMap
from hyteg_tpu.mesh import meshinfo as mi
from hyteg_tpu.operators import forms
from hyteg_tpu.operators.p1_blended import (
    P1BlendedOperator,
    P1SurrogateOperator,
    blended_coords,
)
from hyteg_tpu.operators.p1_elementwise import P1ElementwiseOperator
from hyteg_tpu.primitives.storage import CellStorage


def test_radial_map_snaps_rims():
    storage = CellStorage(mi.mesh_annulus(0.5, 1.0, 8, 2), num_shards=1)
    sp = P1Space(storage, 3)
    co = np.asarray(blended_coords(sp, RadialMap()))
    radii = np.linalg.norm(co[..., :2], axis=-1)
    vm = sp.vertex_mask
    r = radii[:, vm]
    assert r.min() > 0.5 - 1e-5 and r.max() < 1.0 + 1e-5
    # boundary-flagged slots must sit exactly on the rims
    m = sp.maps
    flat_r = radii.reshape(radii.shape[0], -1)
    sf = m.slot_flat[0]
    ok = sf < flat_r.size
    vals = flat_r.reshape(-1)[sf[ok]]
    flags = m.slot_meshflag[0][ok]
    assert np.allclose(vals[flags == 1], 0.5, atol=1e-5)
    assert np.allclose(vals[flags == 2], 1.0, atol=1e-5)


def test_blended_mass_matches_true_area():
    """Blended annulus mass total must beat the polygonal area by a wide
    margin (the signature of blending)."""
    storage = CellStorage(mi.mesh_annulus(0.5, 1.0, 12, 2), num_shards=1)
    sp = P1Space(storage, 4)
    exact = np.pi * (1.0**2 - 0.5**2)

    flat_op = P1ElementwiseOperator(sp, forms.mass_form)
    ones = sp.function().interpolate(1.0)
    area_flat = float(sp.dot(ones.cells, flat_op.apply_raw(ones.cells)))

    blended = P1BlendedOperator(sp, forms.mass_form, RadialMap())
    area_blend = float(sp.dot(ones.cells, blended.apply_raw(ones.cells)))

    err_flat = abs(area_flat - exact)
    err_blend = abs(area_blend - exact)
    assert err_blend < 0.05 * err_flat, (area_flat, area_blend, exact)


def test_blended_reduces_to_affine_on_identity():
    from hyteg_tpu.geometry.maps import GeometryMap

    storage = CellStorage(mi.mesh_unit_cube(1), num_shards=1)
    sp = P1Space(storage, 2)
    aff = P1ElementwiseOperator(sp, forms.laplace_form)
    ble = P1BlendedOperator(sp, forms.laplace_form, GeometryMap())
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(sp.block_shape).astype(np.float32)
                    * sp.vertex_mask[None])
    ya = np.asarray(aff.apply_raw(x))
    yb = np.asarray(ble.apply_raw(x))
    assert np.allclose(ya, yb, atol=2e-4 * max(1.0, np.abs(ya).max()))


def test_blended_annulus_poisson_gmg():
    """BASELINE config 4 (2D part): Laplace on the blended annulus with a
    manufactured polar solution; GMG-free check via CG."""
    from hyteg_tpu.solvers.krylov import cg_solve

    storage = CellStorage(mi.mesh_annulus(0.5, 1.0, 12, 2), num_shards=1)
    level = 3
    sp = P1Space(storage, level)
    bc = BoundaryCondition.create_0123().with_flag(2, DoFType.DIRICHLET)
    gmap = RadialMap()
    lap = P1BlendedOperator(sp, forms.laplace_form, gmap)
    mass = P1BlendedOperator(sp, forms.mass_form, gmap)

    # manufactured: u = ln(r)/ln(2) harmonic! f = 0; u(0.5) = -... choose
    # u = ln(r); -lap u = 0 in 2D; Dirichlet from exact values.
    co = blended_coords(sp, gmap)
    r_field = jnp.linalg.norm(co[..., :2], axis=-1)
    uex = jnp.log(jnp.maximum(r_field, 1e-9)) * jnp.asarray(
        sp.vertex_mask[None], jnp.float32)
    sd = sp.shard_data(0, bc)
    uex = sp.exchange_rep(uex, sd)

    x = sp.restore_rows(uex, sp.zeros(), DoFType.DIRICHLET, sd)
    b = sp.zeros()
    apply_fn = lambda v: lap.apply_inner(v, sd)
    dot_fn = lambda u, v: sp.dot(u, v, FLAG_INNER, sd)
    res = cg_solve(apply_fn, dot_fn, b, x, max_iter=400, rtol=1e-7)
    err = res.x - uex
    merr = mass.apply_raw(err)
    l2 = float(jnp.sqrt(sp.dot(err, merr, DoFType.ALL, sd)))
    assert l2 < 2e-3, l2  # P1 discretization error on the curved annulus


def test_surrogate_operator_accuracy():
    storage = CellStorage(mi.mesh_annulus(0.5, 1.0, 8, 1), num_shards=1)
    sp = P1Space(storage, 4)
    gmap = RadialMap()
    exact = P1BlendedOperator(sp, forms.laplace_form, gmap)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal(sp.block_shape).astype(np.float32)
                    * sp.vertex_mask[None])
    x = sp.exchange_rep(x, BoundaryCondition.all_dirichlet())
    errs = []
    for deg in (1, 2, 3):
        sur = P1SurrogateOperator(sp, forms.laplace_form, gmap, degree=deg)
        errs.append(float(sur.compute_surrogate_error(exact, x)))
    # increasing polynomial degree improves the surrogate
    assert errs[2] < errs[0], errs
    assert errs[2] < 0.05, errs
