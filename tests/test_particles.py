"""Batched Lagrangian particle engine tests.

Mirrors the reference's convection_particles tests (circular-flow tracking,
particle ownership / migration, temperature integration kernel)."""

import numpy as np
import jax
import jax.numpy as jnp

from hyteg_tpu.core.types import BoundaryCondition, DoFType
from hyteg_tpu.functions.p1 import P1Space
from hyteg_tpu.mesh import meshinfo as mi
from hyteg_tpu.primitives.storage import CellStorage
from hyteg_tpu.transport.particles import (ParticleDomain, create_particles)


def _setup(level=3):
    mesh = mi.mesh_rectangle(lower=(-1.0, -1.0), upper=(1.0, 1.0), nx=2, ny=2)
    storage = CellStorage(mesh, num_shards=1)
    sp = P1Space(storage, level)
    bc = BoundaryCondition.all_dirichlet()
    vx = sp.interpolate(lambda x: -x[..., 1], sp.zeros(), DoFType.ALL, bc)
    vy = sp.interpolate(lambda x: x[..., 0], sp.zeros(), DoFType.ALL, bc)
    dom = ParticleDomain(storage, level, degree=1)
    return storage, sp, dom, (vx, vy)


def test_rigid_rotation_rk4():
    """Particles in the rigid rotation v = (-y, x) follow circles: after
    integrating an angle theta, positions match the rotated seeds."""
    _, _, dom, vel = _setup()
    rng = np.random.default_rng(7)
    seeds = rng.uniform(-0.6, 0.6, size=(32, 2))
    ps = create_particles(seeds, capacity=40)

    theta = np.pi / 4
    steps = 16
    run = jax.jit(lambda p: dom.integrate(p, vel, theta, steps=steps,
                                          method="rk4"))
    out = run(ps)
    R = np.array([[np.cos(theta), -np.sin(theta)],
                  [np.sin(theta), np.cos(theta)]])
    want = seeds @ R.T
    got = np.asarray(out.position)[:32]
    assert np.max(np.linalg.norm(got - want, axis=1)) < 5e-3
    # inactive padding slots must not move
    assert np.allclose(np.asarray(out.position)[32:], 0.0)


def test_integrator_order():
    """RK4 beats RK2 beats Euler on the same rotation step count."""
    _, _, dom, vel = _setup(level=4)
    seeds = np.array([[0.5, 0.0]])
    theta = np.pi / 2
    errs = {}
    for m in ("euler", "rk2", "rk4"):
        ps = create_particles(seeds)
        out = dom.integrate(ps, vel, theta, steps=8, method=m)
        want = np.array([0.5 * np.cos(theta), 0.5 * np.sin(theta)])
        errs[m] = float(np.linalg.norm(np.asarray(out.position)[0] - want))
    assert errs["rk4"] < errs["rk2"] < errs["euler"]


def test_owners_and_temperature():
    """Owner lookup returns valid cells; the temperature kernel relaxes the
    particle payload toward the background field."""
    storage, sp, dom, vel = _setup()
    bc = BoundaryCondition.all_dirichlet()
    tfield = sp.interpolate(lambda x: x[..., 0] + 2.0, sp.zeros(),
                            DoFType.ALL, bc)
    seeds = np.array([[0.25, 0.25], [-0.5, 0.1], [0.0, -0.75]])
    ps = create_particles(seeds)
    own = np.asarray(dom.owners(ps))
    assert own.shape == (3,)
    assert (own >= 0).all() and (own < storage.cell_vertices.shape[0]).all()

    # relax hard (rate*dt = 1): temperature jumps to the field value
    out = dom.integrate_temperature(ps, tfield, dt=1.0, rate=1.0)
    want = seeds[:, 0] + 2.0
    assert np.allclose(np.asarray(out.temperature), want, atol=1e-4)
