"""Neighbor-wise (ppermute) interface exchange vs the psum fallback."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hyteg_tpu.core.types import BoundaryCondition
from hyteg_tpu.functions.p1 import P1Space
from hyteg_tpu.mesh import meshinfo as mi
from hyteg_tpu.parallel import spmd
from hyteg_tpu.primitives.storage import CellStorage


@pytest.fixture(scope="module")
def ctx8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    storage = CellStorage(mi.mesh_unit_cube(2), num_shards=8)
    return spmd.SpmdContext(storage, spmd.device_mesh(jax.devices()[:8]))


@pytest.mark.parametrize("kind", ["add", "rep"])
def test_neighbor_exchange_matches_psum(ctx8, kind):
    level = 2
    sp = ctx8.space(level)
    bc = BoundaryCondition.all_dirichlet()
    sd_nbr = sp.stacked_shard_data(bc, neighbor=True)
    sd_psum = sp.stacked_shard_data(bc, neighbor=False)
    assert sd_nbr.nbr_pack is not None
    assert sd_psum.nbr_pack is None

    x = jax.random.normal(
        jax.random.PRNGKey(3),
        (ctx8.storage.num_cells, sp.N, sp.lanes), dtype=jnp.float32)

    def run(sd):
        def body(u, s):
            s = spmd._squeeze_sd(s)
            fn = sp.exchange_add if kind == "add" else sp.exchange_rep
            return fn(u, s, axis_name=spmd.AXIS)

        return spmd.shard_map(
            body, mesh=ctx8.mesh,
            in_specs=(spmd.P(spmd.AXIS), spmd._sd_specs(sd)),
            out_specs=spmd.P(spmd.AXIS), check_vma=False,
        )(x, sd)

    out_n = np.asarray(jax.jit(lambda: run(sd_nbr))())
    out_p = np.asarray(jax.jit(lambda: run(sd_psum))())
    np.testing.assert_allclose(out_n, out_p, rtol=1e-5, atol=1e-5)


def test_neighbor_comm_volume_is_local(ctx8):
    """The pack tables bound per-round traffic by the max PAIR interface,
    not the global interface size."""
    sp = ctx8.space(3)
    slot_lid, L_max, pack, recv, perms = sp._nbr_tables
    R, M = pack.shape[1], pack.shape[2]
    total_ifc = sp.maps.num_ifc
    # per apply each device moves <= R * M values; the global interface
    # is much larger on this 48-cell mesh
    assert R * M < total_ifc, (R, M, total_ifc)
    # every round is a valid partial matching (each device at most once
    # as source and destination)
    for perm in perms:
        srcs = [a for a, _ in perm]
        dsts = [b for _, b in perm]
        assert len(srcs) == len(set(srcs))
        assert len(dsts) == len(set(dsts))
