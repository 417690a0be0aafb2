"""Load balancer + migration tests (reference: tests for
src/hyteg/primitivestorage/loadbalancing/ and migration tests)."""

import numpy as np
import pytest

import jax.numpy as jnp

from hyteg_tpu.core.types import BoundaryCondition, DoFType
from hyteg_tpu.functions.p1 import P1Space
from hyteg_tpu.mesh import meshinfo as mi
from hyteg_tpu.primitives.loadbalancing import (
    cell_volumes,
    interface_cut,
    make_storage,
    migrate,
    partition_greedy,
    partition_sfc,
    rebalance,
)
from hyteg_tpu.primitives.storage import CellStorage


def test_sfc_beats_round_robin_on_cut():
    """SFC locality must cut fewer interface DoFs than round-robin on a
    structured cube mesh."""
    mesh = mi.mesh_unit_cube(2)  # 48 cells
    rr = CellStorage(mesh, num_shards=4, partitioner="round_robin")
    sfc = make_storage(mesh, 4, "sfc")
    cut_rr = interface_cut(rr, 2)
    cut_sfc = interface_cut(sfc, 2)
    assert cut_sfc < cut_rr


def test_partitions_balanced():
    mesh = mi.mesh_unit_cube(2)
    centroids = mesh.points[mesh.elements].mean(axis=1)
    for nshards in (2, 4, 6):
        a = partition_sfc(centroids, nshards)
        counts = np.bincount(a, minlength=nshards)
        assert counts.min() >= 1
        assert counts.max() - counts.min() <= max(2, len(a) // nshards // 2)
        w = cell_volumes(mesh)
        g = partition_greedy(nshards, w)
        loads = np.bincount(g, weights=w, minlength=nshards)
        assert loads.max() < 1.5 * loads.min() + 1e-12


def test_migration_preserves_fields():
    """A DoF field migrated between layouts equals the field interpolated
    directly on the new layout (reference: migration data-handling tests)."""
    mesh = mi.mesh_unit_cube(1)
    old = CellStorage(mesh, num_shards=2, partitioner="round_robin")
    new = make_storage(mesh, 2, "sfc")
    info = migrate(old, new)

    level = 2
    bc = BoundaryCondition.all_dirichlet()
    expr = lambda p: 1.0 + p[..., 0] * 2 + p[..., 1] - 0.3 * p[..., 2]

    sp_old = P1Space(old, level)
    u_old = sp_old.interpolate(expr, sp_old.zeros(), DoFType.ALL,
                               sp_old.global_shard_data(bc))
    sp_new = P1Space(new, level)
    u_new_direct = sp_new.interpolate(expr, sp_new.zeros(), DoFType.ALL,
                                      sp_new.global_shard_data(bc))
    u_migr = info.migrate_cellwise(u_old)
    np.testing.assert_allclose(np.asarray(u_migr), np.asarray(u_new_direct),
                               atol=1e-5)


def test_rebalance_roundtrip():
    mesh = mi.mesh_unit_cube(1)
    st = CellStorage(mesh, num_shards=3, partitioner="round_robin")
    info = rebalance(st, "greedy_volume")
    # all real cells survive the move
    assert (info.src_slot >= 0).sum() == st.topo.num_cells
    assert info.new_storage.num_shards == 3
