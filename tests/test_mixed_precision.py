"""Mixed-precision tests (reference: tests/hyteg/mixedPrecision/
{basicMixedPrecisionTest,float16SupportTest,
mixedPrecisionIterativeRefinement}.cpp)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hyteg_tpu.core.types import BoundaryCondition, DoFType, FLAG_INNER
from hyteg_tpu.functions.p1 import P1Space
from hyteg_tpu.mesh import meshinfo as mi
from hyteg_tpu.operators import forms
from hyteg_tpu.operators.p1_elementwise import P1ElementwiseOperator
from hyteg_tpu.primitives.storage import CellStorage
from hyteg_tpu.solvers.refinement import iterative_refinement
from hyteg_tpu.solvers.smoothers import jacobi_smooth


def test_bf16_space_basic_ops():
    """Spaces are dtype-generic (reference: ValueType-templated functions):
    interpolation, exchange and dots work in bfloat16."""
    storage = CellStorage(mi.mesh_unit_cube(1), num_shards=1)
    sp = P1Space(storage, 2, dtype=jnp.bfloat16)
    bc = BoundaryCondition.all_dirichlet()
    sd = sp.resolve_sd(bc)
    u = sp.interpolate(lambda p: p[..., 0], sp.zeros(), DoFType.ALL, sd)
    assert u.dtype == jnp.bfloat16
    s = float(sp.dof_sum(u, DoFType.ALL, sd))
    # sum of x over all DoFs is positive and finite
    assert np.isfinite(s) and s > 0
    v = sp.exchange_add(u, sd)
    assert v.dtype == jnp.bfloat16


def test_iterative_refinement_recovers_f32_accuracy():
    """bf16 inner Jacobi + f32 outer refinement must reach ~f32 accuracy,
    far beyond what pure bf16 smoothing attains."""
    storage = CellStorage(mi.mesh_unit_cube(1), num_shards=1)
    level = 2
    bc = BoundaryCondition.all_dirichlet()

    sp32 = P1Space(storage, level, dtype=jnp.float32)
    sd32 = sp32.resolve_sd(bc)
    op32 = P1ElementwiseOperator(sp32, forms.laplace_form)

    sp16 = P1Space(storage, level, dtype=jnp.bfloat16)
    sd16 = sp16.resolve_sd(bc)
    op16 = P1ElementwiseOperator(sp16, forms.laplace_form)

    zeros32 = sp32.zeros()

    def apply32(x):
        y = op32.apply_raw(x, sd=sd32)
        return sp32.restore_rows(y, zeros32, FLAG_INNER, sd32)

    inv_diag16 = op16.inverse_diagonal(sd=sd16)
    zeros16 = sp16.zeros()
    inv_diag16 = sp16.restore_rows(inv_diag16, zeros16, FLAG_INNER, sd16)

    def inner16(r16):
        def ap(x):
            y = op16.apply_raw(x, sd=sd16)
            return sp16.restore_rows(y, zeros16, FLAG_INNER, sd16)

        return jacobi_smooth(ap, inv_diag16, r16, jnp.zeros_like(r16),
                             omega=0.66, num_sweeps=60)

    U = lambda p: jnp.sin(jnp.pi * p[..., 0]) * jnp.sin(
        jnp.pi * p[..., 1]) * jnp.sin(jnp.pi * p[..., 2])
    mass = P1ElementwiseOperator(sp32, forms.mass_form)
    f = sp32.interpolate(lambda p: 3 * jnp.pi**2 * U(p), sp32.zeros(),
                         DoFType.ALL, sd32)
    b = sp32.restore_rows(mass.apply_raw(f, sd=sd32), zeros32,
                          FLAG_INNER, sd32)

    x = iterative_refinement(apply32, inner16, b, zeros32, num_outer=30)
    rel = float(
        jnp.sqrt(sp32.dot(b - apply32(x), b - apply32(x), DoFType.ALL, sd32))
        / jnp.sqrt(sp32.dot(b, b, DoFType.ALL, sd32)))

    # pure-bf16 baseline: same work, no f32 outer loop
    b16 = b.astype(jnp.bfloat16)
    x16 = jnp.zeros_like(b16)
    for _ in range(30):
        r16 = b16 - op16.apply_raw(x16, sd=sd16)
        r16 = sp16.restore_rows(r16, zeros16, FLAG_INNER, sd16)
        x16 = x16 + inner16(r16)
    x16f = x16.astype(jnp.float32)
    rel16 = float(
        jnp.sqrt(sp32.dot(b - apply32(x16f), b - apply32(x16f),
                          DoFType.ALL, sd32))
        / jnp.sqrt(sp32.dot(b, b, DoFType.ALL, sd32)))

    assert rel < 5e-5          # refinement reaches ~f32 accuracy
    assert rel < 0.1 * rel16   # and beats pure bf16 by >= 10x
