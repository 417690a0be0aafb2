"""Overlapped (interface-first / interior-while-comm) SPMD apply.

Reference: the startCommunication/endCommunication split of
src/hyteg/communication/BufferedCommunication.hpp:92-100 — interface
packing runs from the interface-cell partial apply alone, the interior
sweep is data-independent of the ppermutes, so XLA's latency-hiding
scheduler can overlap them.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hyteg_tpu.core.types import BoundaryCondition
from hyteg_tpu.mesh import meshinfo as mi
from hyteg_tpu.operators import forms
from hyteg_tpu.operators.p1_elementwise import P1ElementwiseOperator
from hyteg_tpu.parallel import spmd
from hyteg_tpu.primitives.storage import CellStorage


@pytest.fixture(scope="module")
def ctx8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    storage = CellStorage(mi.mesh_unit_cube(2), num_shards=8)
    return spmd.SpmdContext(storage, spmd.device_mesh(jax.devices()[:8]))


def test_overlap_tables_cover_cells(ctx8):
    sp = ctx8.space(2)
    ovl_cells, ovl_flat, ovl_lid, K = sp._ovl_tables
    D, C_loc = ovl_cells.shape
    assert 0 < K <= C_loc
    for d in range(D):
        # a permutation: every local cell exactly once
        assert sorted(ovl_cells[d]) == list(range(C_loc))
    # every cross-device slot points into the phase-A subblock
    cell_sz = sp.block_size // C_loc
    live = ovl_flat < K * cell_sz
    slot_lid, L_max, pack, recv, perms = sp._nbr_tables
    # every lid referenced by a pack list must be fed by a live slot
    for d in range(D):
        packed = set(pack[d].reshape(-1)) - {L_max}
        fed = set(ovl_lid[d][live[d]])
        assert packed <= fed, (d, packed - fed)


def test_overlapped_apply_matches_psum(ctx8):
    """The overlapped interface/interior split apply equals the plain
    psum-exchanged apply at 8 devices."""
    level = 2
    sp = ctx8.space(level)
    bc = BoundaryCondition.all_dirichlet()
    sd_ovl = sp.stacked_shard_data(bc, neighbor=True)
    sd_psum = sp.stacked_shard_data(bc, neighbor=False)
    assert sd_ovl.ovl_cells is not None and sd_ovl.ovl_k > 0

    x = jax.random.normal(
        jax.random.PRNGKey(11),
        (ctx8.storage.num_cells, sp.N, sp.lanes), dtype=jnp.float32)

    def run(sd):
        def body(u, s):
            s = spmd._squeeze_sd(s)
            op = P1ElementwiseOperator.from_shard_data(
                sp, forms.laplace_form, s)
            return op.apply_raw(u, sd=s, axis_name=spmd.AXIS)

        return spmd.shard_map(
            body, mesh=ctx8.mesh,
            in_specs=(spmd.P(spmd.AXIS), spmd._sd_specs(sd)),
            out_specs=spmd.P(spmd.AXIS), check_vma=False,
        )(x, sd)

    out_o = np.asarray(jax.jit(lambda: run(sd_ovl))())
    out_p = np.asarray(jax.jit(lambda: run(sd_psum))())
    np.testing.assert_allclose(out_o, out_p, rtol=2e-5, atol=2e-5)
