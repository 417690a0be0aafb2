"""Paired-tet fast path: pack/unpack roundtrip, exchanged apply vs the
classic elementwise path, chaining semantics (interpret-mode kernels)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hyteg_tpu.functions.p1 import P1Space
from hyteg_tpu.mesh import meshinfo as mi
from hyteg_tpu.operators import forms
from hyteg_tpu.operators.p1_elementwise import P1ElementwiseOperator
from hyteg_tpu.primitives.storage import CellStorage
from hyteg_tpu.tetpair import TetPairEngine


@pytest.fixture(scope="module")
def setup():
    storage = CellStorage(mi.mesh_unit_cube(1), num_shards=1)
    space = P1Space(storage, 3)
    op = P1ElementwiseOperator(space, forms.laplace_form)
    sd = space.resolve_sd(None)
    x = jax.random.normal(jax.random.PRNGKey(0), space.block_shape,
                          dtype=space.dtype)
    x = x * jnp.asarray(space.vertex_mask[None], dtype=space.dtype)
    x = space.exchange_rep(x, sd)
    eng = TetPairEngine(space, op.elmats, interpret=True)
    return space, op, sd, x, eng


def test_roundtrip(setup):
    space, op, sd, x, eng = setup
    rt = eng.lower(eng.lift(x))
    mask = jnp.asarray(space.vertex_mask[None], dtype=space.dtype)
    assert float(jnp.max(jnp.abs((rt - x) * mask))) == 0.0


def test_apply_matches_elementwise(setup):
    space, op, sd, x, eng = setup
    ref = op.apply_raw(x, sd=sd)
    got = eng.apply_full(x)
    mask = jnp.asarray(space.vertex_mask[None], dtype=space.dtype)
    err = float(jnp.max(jnp.abs((got - ref) * mask)))
    assert err <= 2e-6 * float(jnp.max(jnp.abs(ref)))


def test_chained_apply(setup):
    space, op, sd, x, eng = setup
    st = eng.apply_ex(eng.apply_ex(eng.lift(x)))
    got = eng.lower(st)
    ref = op.apply_raw(op.apply_raw(x, sd=sd), sd=sd)
    mask = jnp.asarray(space.vertex_mask[None], dtype=space.dtype)
    err = float(jnp.max(jnp.abs((got - ref) * mask)))
    assert err <= 5e-6 * float(jnp.max(jnp.abs(ref)))


def test_sorted_vertex_invariant():
    """tetpair's identity-frame fast path relies on sorted cell gids."""
    for mesh in (mi.mesh_unit_cube(2), mi.mesh_spherical_shell(2, 2, 0.55, 1.0)):
        st = CellStorage(mesh, num_shards=1)
        assert np.all(np.diff(st.cell_gids, axis=1) > 0)
