"""Cross-shard particle migration: all_to_all handoff correctness."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hyteg_tpu.mesh import meshinfo as mi
from hyteg_tpu.parallel import spmd
from hyteg_tpu.primitives.storage import CellStorage
from hyteg_tpu.transport.migration import migrate
from hyteg_tpu.transport.particles import ParticleDomain, create_particles


@pytest.fixture(scope="module")
def setup():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    storage = CellStorage(mi.mesh_unit_cube(2), num_shards=8)
    dom = ParticleDomain(storage, level=2)
    mesh = spmd.device_mesh(jax.devices()[:8])
    return storage, dom, mesh


def test_migrate_moves_particles_to_owner_shard(setup):
    storage, dom, mesh = setup
    D = 8
    P = 64  # local capacity per shard
    rng = np.random.default_rng(0)

    # seed every shard with random points spread over the WHOLE domain:
    # most particles are "owned" elsewhere and must migrate
    pts = rng.uniform(0.05, 0.95, size=(D, P, 3))
    payload = rng.standard_normal((D, P)).astype(np.float32)
    sets = []
    for d in range(D):
        ps = create_particles(pts[d], capacity=2 * P)
        ps = dataclasses.replace(
            ps, temperature=jnp.asarray(np.pad(payload[d], (0, P))))
        sets.append(ps)
    stacked = jax.tree.map(lambda *a: jnp.stack(a), *sets)

    cps = storage.cells_per_shard

    def body(ps):
        ps = jax.tree.map(lambda a: a[0], ps)
        owner_cell, _ = dom.ev.locate_cells(ps.position)
        owner_shard = owner_cell // cps
        out, dropped = migrate(ps, owner_shard, spmd.AXIS, D, M=P)
        return (jax.tree.map(lambda a: a[None], out), dropped[None])

    out, dropped = jax.jit(spmd.shard_map(
        body, mesh=mesh,
        in_specs=(jax.tree.map(lambda _: spmd.P(spmd.AXIS), stacked),),
        out_specs=(jax.tree.map(lambda _: spmd.P(spmd.AXIS), stacked),
                   spmd.P(spmd.AXIS)),
        check_vma=False,
    ))(stacked)

    assert int(jnp.sum(dropped)) == 0
    # total particle count conserved
    total_before = D * P
    total_after = int(jnp.sum(out.active))
    assert total_after == total_before, (total_before, total_after)
    # every active particle now sits on its owner shard, payload intact
    pos = np.asarray(out.position)
    act = np.asarray(out.active)
    temp = np.asarray(out.temperature)
    src_payloads = set(np.round(payload.reshape(-1), 5).tolist())
    for d in range(D):
        pp = pos[d][act[d]]
        if pp.size == 0:
            continue
        oc, _ = dom.ev.locate_cells(jnp.asarray(pp))
        np.testing.assert_array_equal(np.asarray(oc) // cps, d)
        for v in np.round(temp[d][act[d]], 5).tolist():
            assert v in src_payloads
