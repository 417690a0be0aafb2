"""Sharded box GMG: 8-device CPU mesh vs the single-device solver."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hyteg_tpu.structured import BoxDomain, BoxStencilOperator
from hyteg_tpu.structured import gmg, spmd


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 2:
        pytest.skip("needs the virtual multi-device CPU platform")
    return spmd.device_mesh(jax.devices())


def test_spmd_apply_matches_single(mesh):
    dom = BoxDomain((2, 1, 1), level=3)
    op = BoxStencilOperator(dom)
    sop = spmd.SpmdBoxOperator(op, mesh)
    u = jax.random.normal(jax.random.PRNGKey(0), dom.block_shape,
                          dtype=jnp.float32)
    ref = np.asarray(op.apply_raw(u))
    up = spmd.shard_field(u, dom, mesh)
    out = np.asarray(spmd.unshard_field(jax.jit(sop.apply_raw)(up), dom))
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


def test_spmd_vcycle_matches_single(mesh):
    """The sharded V-cycle must produce the single-device V-cycle result
    (same operators, same transfers, same Chebyshev intervals)."""
    dom = BoxDomain((2, 1, 1), level=4)
    levels1 = gmg.build_hierarchy(dom, min_level=2)
    levelsN = spmd.build_spmd_hierarchy(dom, mesh, min_level=2)
    for l1, lN in zip(levels1, levelsN):
        lN.eig_max = l1.eig_max  # identical intervals for exact comparison

    f = dom.interpolate(lambda x, y, z: jnp.sin(jnp.pi * x) * y * (1 - z))
    b1 = jnp.asarray(dom.interior_mask, jnp.float32) * f

    x1 = gmg.vcycle(levels1, jnp.zeros_like(b1), b1)
    xN = jax.jit(lambda b: spmd.spmd_vcycle(levelsN, jnp.zeros_like(b), b))(b1)
    np.testing.assert_allclose(np.asarray(xN), np.asarray(x1),
                               rtol=2e-4, atol=2e-5)


def test_spmd_solve_converges(mesh):
    dom = BoxDomain((2, 1, 1), level=4)
    levels = spmd.build_spmd_hierarchy(dom, mesh, min_level=2)
    f = dom.interpolate(
        lambda x, y, z: jnp.sin(jnp.pi * x) * jnp.sin(jnp.pi * y)
        * jnp.sin(jnp.pi * z))
    solve = jax.jit(lambda f: spmd.spmd_solve_poisson(levels, f, cycles=4))
    _, rns = solve(f)
    rns = np.asarray(rns)
    assert (rns[1:] < rns[:-1]).all(), rns
    assert rns[-1] < 0.05 * rns[0], rns
