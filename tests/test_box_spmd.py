"""Box fast path under SPMD row-slab sharding (8 virtual CPU devices)."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from hyteg_tpu.structured import BoxDomain, BoxStencilOperator
from hyteg_tpu.structured import spmd


def test_sharded_apply_matches_single_device():
    dom = BoxDomain((2, 1, 1), level=3)  # X = 17 rows over 8 devices
    op = BoxStencilOperator(dom)
    mesh = spmd.device_mesh()
    assert mesh.devices.size == 8
    sop = spmd.SpmdBoxOperator(op, mesh)

    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal(dom.block_shape), jnp.float32)
    want = op.apply_raw(u)
    up = spmd.shard_field(u, dom, mesh)
    got = spmd.unshard_field(sop.apply_raw(up), dom)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=1e-5)


@pytest.mark.slow  # ~100 s of 8-device XLA:CPU shard_map compiles
def test_sharded_jacobi_matches_single_device():
    dom = BoxDomain((1, 1, 1), level=3)
    op = BoxStencilOperator(dom)
    mesh = spmd.device_mesh()
    sop = spmd.SpmdBoxOperator(op, mesh)

    rng = np.random.default_rng(1)
    inner = jnp.asarray(dom.interior_mask, jnp.float32)
    b = inner * jnp.asarray(rng.standard_normal(dom.block_shape), jnp.float32)
    x = jnp.zeros_like(b)
    # single-device reference sweeps
    dinv = op.inverse_diagonal
    want = x
    for _ in range(3):
        want = want + 0.8 * inner * dinv * (b - op.apply_raw(want))

    xp = spmd.shard_field(x, dom, mesh)
    bp = spmd.shard_field(b, dom, mesh)
    for _ in range(3):
        xp = sop.jacobi_step(xp, bp)
    got = spmd.unshard_field(xp, dom)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=1e-5)
