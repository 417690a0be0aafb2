"""Multi-shard TerraNeo convection step (BASELINE config 5).

Composes the existing SPMD building blocks into one coupled mantle-
convection time step over a device mesh — the pod-slice analog of the
reference's distributed flagship app
(reference: apps/TerraNeo/Origin/Convection.cpp:27-60,
apps/2020-scaling-workshop/Helpers.cpp:103-173):

  * momentum: Taylor-Hood Stokes with buoyancy rhs Ra T e_r, solved by
    N fully-sharded Uzawa GMG V-cycles
    (parallel/spmd.py:build_spmd_stokes_vcycle),
  * energy: temperature on the velocity node grid (P1 at level+1),
    advanced by an implicit-diffusion / explicit-SUPG-advection theta
    step whose CG runs entirely inside one shard_map region with psum
    dot products (terraneo/transport_std.py operators built in-trace
    from device-local cell data).

The sharded step is bit-compatible with itself at any shard count
(tests/test_terraneo_spmd.py gates 8 devices against 1 on the same
mesh), which is the reference's multi-rank-vs-serial equivalence
pattern.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..composites.stokes import TaylorHoodVec
from ..core.types import BoundaryCondition, DoFType, FLAG_INNER
from ..functions.p1 import P1Space
from ..mesh import meshinfo as mi
from ..operators.p1_elementwise import P1ElementwiseOperator
from ..parallel.spmd import AXIS, SpmdContext, build_spmd_stokes_vcycle
from ..primitives.storage import CellStorage
from .params import ConvectionParameters
from .transport_std import SUPGAdvectionOperator


class ShardedConvectionSimulation:
    """One-step functional driver for the sharded convection model."""

    def __init__(self, params: ConvectionParameters | None = None,
                 num_shards: int = 1, devices=None,
                 stokes_cycles: int = 2, min_level: int = 0):
        self.p = p = params or ConvectionParameters()
        if p.dim == 2:
            mesh = mi.mesh_annulus(p.rmin, p.rmax, p.ntan, p.nrad)
        else:
            mesh = mi.mesh_spherical_shell(p.ntan, p.nrad, p.rmin, p.rmax)
        self.storage = CellStorage(mesh, num_shards=num_shards)
        devices = (jax.devices()[:num_shards]
                   if devices is None else devices)
        self.mesh = Mesh(np.asarray(devices), (AXIS,))
        self.ctx = SpmdContext(self.storage, self.mesh)
        self.dim = self.storage.dim
        self.level = p.level
        self.stokes_cycles = stokes_cycles

        # temperature lives on the velocity node grid: P1 at level+1
        self.Tlvl = p.level + 1
        pitch = (1 << self.Tlvl) + 1
        self.T_sp = P1Space(self.storage, self.Tlvl, pitch=pitch)
        self.sd_T = self.T_sp.stacked_shard_data(
            BoundaryCondition.all_dirichlet())

        self.stokes_step = build_spmd_stokes_vcycle(
            self.ctx, min_level, p.level, viscosity=p.viscosity,
            eigs={l: 3.0 for l in range(min_level, p.level + 1)},
        )

    # -- sharded array helpers ------------------------------------------------

    def global_T_zeros(self):
        shape = (self.storage.num_cells, self.T_sp.N, self.T_sp.lanes)
        return jax.device_put(
            jnp.zeros(shape, jnp.float32), NamedSharding(self.mesh, P(AXIS)))

    def initial_state(self):
        """(T, x) with the conductive + perturbed temperature profile."""
        p = self.p

        def T0(pt):
            r = jnp.sqrt(jnp.sum(pt[..., : self.dim] ** 2, axis=-1))
            base = jnp.clip((p.rmax - r) / (p.rmax - p.rmin), 0.0, 1.0)
            theta = jnp.arctan2(pt[..., 1], pt[..., 0])
            return base + 0.1 * jnp.sin(4 * theta) * base * (1 - base)

        def init(sd):
            sp = self.T_sp
            vals = sp.interpolate(T0, sp.zeros(), DoFType.ALL, sd,
                                  axis_name=AXIS)
            return vals

        fn = self.ctx.shard(lambda sd: init(sd), [self.Tlvl], 0)
        T = fn()
        vel = tuple(self.global_T_zeros() for _ in range(self.dim))
        pre_sp = P1Space(self.storage, self.p.level,
                         pitch=self.T_sp.pitch)
        pre = jax.device_put(
            jnp.zeros((self.storage.num_cells, pre_sp.N, pre_sp.lanes),
                      jnp.float32), NamedSharding(self.mesh, P(AXIS)))
        return T, TaylorHoodVec(vel, pre)

    # -- coupled step ---------------------------------------------------------

    @functools.cached_property
    def _buoyancy(self):
        Ra = self.p.rayleigh
        dim = self.dim

        def body(T, sd):
            sp = self.T_sp
            from ..operators import forms

            mass = P1ElementwiseOperator.from_shard_data(
                sp, forms.mass_form, sd)
            xyz = sp.coords_from(sd.cell_vertices)
            r = jnp.sqrt(jnp.sum(xyz[..., :dim] ** 2, axis=-1,
                                 keepdims=True))
            e_r = xyz[..., :dim] / jnp.maximum(r, 1e-30)
            out = []
            for d in range(dim):
                f = Ra * mass.apply_raw(T * e_r[..., d], sd=sd,
                                        axis_name=AXIS)
                f = sp.restore_rows(f, jnp.zeros_like(f), FLAG_INNER, sd)
                out.append(f)
            return tuple(out)

        return self.ctx.shard(body, [self.Tlvl], 1,
                              out_spec=tuple([P(AXIS)] * dim))

    @functools.cached_property
    def _energy(self):
        p = self.p
        dim = self.dim

        def body(T, vx, *rest):
            vel = (vx,) + rest[: dim - 1]
            sd = rest[dim - 1]
            sp = self.T_sp
            from ..operators import forms

            A = P1ElementwiseOperator.from_shard_data(sp, forms.laplace_form,
                                                      sd)
            M = P1ElementwiseOperator.from_shard_data(sp, forms.mass_form,
                                                      sd)
            adv = SUPGAdvectionOperator(sp, supg=True,
                                        kappa=p.diffusivity,
                                        cell_vertices=sd.cell_vertices)
            dt = p.max_dt

            def lhs(x):
                y = (M.apply_raw(x, sd=sd, axis_name=AXIS)
                     + dt * p.diffusivity
                     * A.apply_raw(x, sd=sd, axis_name=AXIS))
                return sp.restore_rows(y, jnp.zeros_like(y), FLAG_INNER, sd)

            rhs = (M.apply_raw(T, sd=sd, axis_name=AXIS)
                   - dt * adv.apply_raw(T, vel, sd=sd, axis_name=AXIS))
            if p.internal_heating != 0.0:
                rhs = rhs + dt * M.apply_raw(
                    jnp.full_like(T, p.internal_heating), sd=sd,
                    axis_name=AXIS)
            rhs = sp.restore_rows(rhs, T, FLAG_INNER, sd)

            def dot(u, v):
                return sp.dot(u, v, FLAG_INNER, sd, axis_name=AXIS)

            # CG on the inner rows, Dirichlet rows carried through
            x = T
            r = sp.restore_rows(rhs - lhs(x), jnp.zeros_like(x),
                                FLAG_INNER, sd)
            q = r
            rs = dot(r, r)

            def cg(carry, _):
                x, r, q, rs = carry
                Aq = lhs(q)
                alpha = rs / jnp.maximum(dot(q, Aq), 1e-30)
                x = x + alpha * q
                r = r - alpha * Aq
                rs_new = dot(r, r)
                q = r + (rs_new / jnp.maximum(rs, 1e-30)) * q
                return (x, r, q, rs_new), None

            (x, *_), _ = jax.lax.scan(cg, (x, r, q, rs), None,
                                      length=p.energy_cg_iters)
            return x

        return self.ctx.shard(body, [self.Tlvl], 1 + dim)

    def step(self, T, x: TaylorHoodVec):
        """One coupled step: Stokes V-cycles then an energy theta-step."""
        bv = self._buoyancy(T)
        b = TaylorHoodVec(bv, jnp.zeros_like(x.pre))
        for _ in range(self.stokes_cycles):
            x = self.stokes_step(x, b)
        T = self._energy(T, *x.vel)
        return T, x
