"""SPMD path over the 8-virtual-device CPU mesh: the driver contract
(__graft_entry__) plus sharded-vs-single-device operator equivalence."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hyteg_tpu.core.types import BoundaryCondition, DoFType
from hyteg_tpu.mesh import meshinfo as mi
from hyteg_tpu.parallel import spmd
from hyteg_tpu.primitives.storage import CellStorage


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
@pytest.mark.slow  # the driver exercises dryrun_multichip every round
def test_dryrun_multichip_contract():
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)


def test_entry_contract():
    import __graft_entry__

    fn, args = __graft_entry__.entry()
    out = jax.jit(fn)(*args)
    assert bool(jnp.isfinite(out).all())


@pytest.mark.skipif(jax.device_count() < 4, reason="needs 4 virtual devices")
def test_sharded_apply_matches_single_device():
    mesh_info = mi.mesh_unit_cube(1)
    level = 2

    # single-shard reference
    st1 = CellStorage(mesh_info, num_shards=1)
    from hyteg_tpu.functions.p1 import P1Space
    from hyteg_tpu.operators import forms
    from hyteg_tpu.operators.p1_elementwise import P1ElementwiseOperator

    sp1 = P1Space(st1, level)
    bc = BoundaryCondition.all_dirichlet()
    f = lambda p: p[..., 0] * p[..., 1] + 2.0 * p[..., 2]
    x1 = sp1.interpolate(f, sp1.zeros(), DoFType.ALL, bc)
    y1 = P1ElementwiseOperator(sp1, forms.laplace_form).apply_raw(
        x1, sd=sp1.shard_data(0, bc))

    # 4-device sharded apply
    devs = jax.devices()[:4]
    dmesh = spmd.device_mesh(devs)
    st4 = CellStorage(mesh_info, num_shards=4)
    ctx = spmd.SpmdContext(st4, dmesh, bc)
    apply4 = spmd.build_spmd_apply(ctx, level)
    sp4 = ctx.space(level)
    xs = []
    for d in range(4):
        sd = sp4.shard_data(d, bc)
        xs.append(np.asarray(sp4.interpolate(f, sp4.zeros(), DoFType.ALL, sd)))
    from jax.sharding import NamedSharding, PartitionSpec as P

    x4 = jax.device_put(jnp.concatenate([jnp.asarray(a) for a in xs]),
                        NamedSharding(dmesh, P(spmd.AXIS)))
    y4 = np.asarray(apply4(x4))

    # compare per global DoF id
    g1 = {}
    ids1 = sp1.global_ids(0)
    v1 = np.asarray(y1)
    for c in range(ids1.shape[0]):
        sel = ids1[c] >= 0
        for gid, val in zip(ids1[c][sel].ravel(), v1[c][sel].ravel()):
            g1[int(gid)] = float(val)

    C_loc = st4.cells_per_shard
    for d in range(4):
        ids4 = sp4.global_ids(d)
        y4d = y4[d * C_loc : (d + 1) * C_loc]
        for c in range(C_loc):
            sel = ids4[c] >= 0
            for gid, val in zip(ids4[c][sel].ravel(), y4d[c][sel].ravel()):
                np.testing.assert_allclose(val, g1[int(gid)], rtol=2e-4,
                                           atol=2e-5)


@pytest.mark.skipif(jax.device_count() < 4, reason="needs 4 virtual devices")
def test_agglomerated_coarse_solve_matches():
    """SPMD V-cycle with the redundant gathered coarse solve (the
    AgglomerationWrapper analog) agrees with the per-shard-map coarse CG."""
    mesh_info = mi.mesh_unit_cube(1)
    devs = jax.devices()[:4]
    dmesh = spmd.device_mesh(devs)
    st = CellStorage(mesh_info, num_shards=4)
    bc = BoundaryCondition.all_dirichlet()
    ctx = spmd.SpmdContext(st, dmesh, bc)
    v_plain = spmd.build_spmd_poisson_vcycle(ctx, 0, 2, coarse_iters=40)
    v_aggl = spmd.build_spmd_poisson_vcycle(ctx, 0, 2, coarse_iters=40,
                                            agglomerate_coarse=True)
    sp = ctx.space(2)
    from jax.sharding import NamedSharding, PartitionSpec as P

    xs = []
    for d in range(4):
        sd = sp.shard_data(d, bc)
        xs.append(np.asarray(sp.interpolate(
            lambda p: p[..., 0] * p[..., 1] + p[..., 2], sp.zeros(),
            DoFType.ALL, sd)))
    x0 = jax.device_put(jnp.concatenate([jnp.asarray(a) for a in xs]),
                        NamedSharding(dmesh, P(spmd.AXIS)))
    b = ctx.global_zeros(2)
    xa = np.asarray(v_plain(x0, b))
    xb = np.asarray(v_aggl(x0, b))
    assert np.isfinite(xa).all() and np.isfinite(xb).all()
    scale = np.abs(xa).max() + 1e-12
    assert np.abs(xa - xb).max() / scale < 2e-3


@pytest.mark.skipif(jax.device_count() < 4, reason="needs 4 virtual devices")
def test_spmd_stokes_vcycle_matches_single_device():
    """One Uzawa V-cycle on the P2-P1 Stokes system: 4-device shard_map vs
    single-device make_stokes_gmg, compared per global DoF id."""
    from hyteg_tpu.composites.stokes import TaylorHoodVec
    from hyteg_tpu.solvers.uzawa import make_stokes_gmg

    mesh_info = mi.mesh_rectangle((0, 0), (1, 1), 2, 2)
    min_l, max_l = 0, 1
    bc = BoundaryCondition.all_dirichlet()
    eigs = {l: 2.0 for l in range(min_l, max_l + 1)}

    # single-device reference
    st1 = CellStorage(mesh_info, num_shards=1)
    stokes1, gmg1 = make_stokes_gmg(st1, min_l, max_l, bc=bc,
                                    coarse_iters=25, eigs=eigs)
    st_f = stokes1[max_l]
    uf = lambda p: p[..., 0] * (1 - p[..., 0]) * p[..., 1]
    b1 = st_f.zeros()
    b1 = st_f.interpolate_velocity([uf] * st_f.dim, b1, DoFType.ALL)
    x1 = jax.jit(gmg1.cycle)(st_f.zeros(), b1)

    # 4-device sharded
    devs = jax.devices()[:4]
    dmesh = spmd.device_mesh(devs)
    st4 = CellStorage(mesh_info, num_shards=4)
    ctx = spmd.SpmdContext(st4, dmesh, bc)
    vcycle = spmd.build_spmd_stokes_vcycle(ctx, min_l, max_l,
                                           coarse_iters=25, eigs=eigs)
    from hyteg_tpu.functions.p1 import P1Space
    from jax.sharding import NamedSharding, PartitionSpec as P

    pitch4 = (1 << (max_l + 1)) + 1
    vel_sp = P1Space(st4, max_l + 1, pitch=pitch4)
    pre_sp = P1Space(st4, max_l, pitch=pitch4)
    vels = []
    for d in range(4):
        sd = vel_sp.shard_data(d, bc)
        vels.append(np.asarray(vel_sp.interpolate(uf, vel_sp.zeros(),
                                                  DoFType.ALL, sd)))
    shd = NamedSharding(dmesh, P(spmd.AXIS))
    bv = jax.device_put(jnp.concatenate([jnp.asarray(a) for a in vels]), shd)
    zeros_v = jax.device_put(jnp.zeros_like(bv), shd)
    C4, Np, Lp = st4.num_cells, pre_sp.N, pre_sp.lanes
    zp = jax.device_put(jnp.zeros((C4, Np, Lp), jnp.float32), shd)
    b4 = TaylorHoodVec((bv,) * st4.dim, zp)
    x4 = vcycle(TaylorHoodVec((zeros_v,) * st4.dim, zp), b4)

    # compare velocity component 0 per global DoF id
    sp1v = stokes1[max_l].vel_space
    ids1 = sp1v.global_ids(0)
    v1 = np.asarray(x1.vel[0])
    g1 = {}
    for c in range(ids1.shape[0]):
        sel = ids1[c] >= 0
        for gid, val in zip(ids1[c][sel].ravel(), v1[c][sel].ravel()):
            g1[int(gid)] = float(val)
    y4 = np.asarray(x4.vel[0])
    C_loc = st4.cells_per_shard
    scale = max(abs(v) for v in g1.values()) + 1e-12
    for d in range(4):
        ids4 = P1Space(st4, max_l + 1, pitch=pitch4).global_ids(d)
        y4d = y4[d * C_loc:(d + 1) * C_loc]
        for c in range(C_loc):
            sel = ids4[c] >= 0
            for gid, val in zip(ids4[c][sel].ravel(), y4d[c][sel].ravel()):
                assert abs(val - g1[int(gid)]) / scale < 5e-3
