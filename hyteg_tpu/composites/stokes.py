"""P2-P1 Taylor-Hood Stokes composite (function + block operator).

Reference: src/hyteg/composites/P2P1TaylorHoodFunction.hpp,
src/mixed_operator/P2P1TaylorHoodStokesOperator.hpp. The block system

    [ K   B^T ] [u]   [f]
    [ B   0   ] [p] = [g]

with K = vector P2 viscous block (componentwise Laplace for constant
viscosity; epsilon-operator via the quadrature engine later), B = P2 -> P1
divergence. Velocity Dirichlet rows are masked per component; the pressure
carries no BC (its constant nullspace is removed by mean projection, the
reference's projectMean)."""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp

from ..core.types import BoundaryCondition, DoFType, FLAG_INNER
from ..functions.p1 import P1Space
from ..functions.p2 import P2Space
from ..operators.mixed import P2ToP1DivOperator
from ..operators.p2_elementwise import P2ElementwiseOperator


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class TaylorHoodVec:
    """(velocity components..., pressure) raw blocks as one pytree."""

    vel: tuple
    pre: jnp.ndarray

    def tree_flatten(self):
        return (self.vel, self.pre), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(tuple(children[0]), children[1])

    def __add__(self, o):
        return TaylorHoodVec(
            tuple(a + b for a, b in zip(self.vel, o.vel)), self.pre + o.pre
        )

    def __sub__(self, o):
        return TaylorHoodVec(
            tuple(a - b for a, b in zip(self.vel, o.vel)), self.pre - o.pre
        )

    def __mul__(self, s):
        return TaylorHoodVec(tuple(s * a for a in self.vel), s * self.pre)

    __rmul__ = __mul__


class P2P1TaylorHoodStokes:
    """Spaces + operators + BC handling for the Stokes system."""

    def __init__(self, storage, level: int, bc: BoundaryCondition | None = None,
                 viscosity: float = 1.0, shard: int = 0,
                 pitch: int | None = None, mu_field=None, epsilon: bool = False,
                 full_viscous: bool = False, vel_sd=None, pre_sd=None,
                 gmap=None):
        """``mu_field``: nodal viscosity on the velocity node grid (or a
        callable of coords) — switches K to the variable-viscosity epsilon
        operator (reference: P2P1ElementwiseBlendingStokesOperator with
        epsilon forms). ``epsilon`` forces the epsilon form at constant
        viscosity; ``full_viscous`` adds the -2/3 mu div u div v term.

        ``vel_sd``/``pre_sd``: traced per-device shard data — pass inside
        shard_map so the whole composite (element matrices included) builds
        from the device-local maps."""
        self.storage = storage
        self.level = level
        self.dim = storage.dim
        self.bc = bc or BoundaryCondition.all_dirichlet()
        # velocity node grid and pressure vertex grid share one lane pitch
        # so the mixed operators are pure strided slicing (see mixed.py);
        # multi-level (GMG) stacks pass the max-level pitch explicitly
        pitch = ((1 << (level + 1)) + 1) if pitch is None else pitch
        self.pitch = pitch
        self.vel_space = P2Space(storage, level, pitch=pitch)
        self.pre_space = P1Space(storage, level, pitch=pitch)
        self.shard = shard
        self.visc = viscosity
        self._vel_sd = (vel_sd if vel_sd is not None
                        else self.vel_space.shard_data(shard, self.bc))
        self._pre_sd = (pre_sd if pre_sd is not None
                        else self.pre_space.shard_data(
                            shard, BoundaryCondition.all_neumann()))
        cv = self._vel_sd.cell_vertices
        self.gmap = gmap
        self.use_epsilon = (epsilon or full_viscous or (mu_field is not None)
                            or gmap is not None)
        if callable(mu_field):
            mu_field = self.vel_space.interpolate(
                mu_field, self.vel_space.zeros(), DoFType.ALL, self._vel_sd)
        self.mu_field = mu_field
        if gmap is not None:
            # blended geometry: epsilon viscous block + div/grad evaluated
            # with per-micro-element Jacobians from the blended node field
            # (reference: P2P1ElementwiseBlendingStokesOperator and the
            # epsilon x IcosahedralShellMap generated operator family)
            from ..operators.p2_blended_stokes import (
                P2BlendedEpsilonOperator, P2P1BlendedDivOperator)

            self.K_eps = P2BlendedEpsilonOperator(self.vel_space, gmap,
                                                  shard, full=full_viscous)
            self.K = None
            self.B = P2P1BlendedDivOperator(self.vel_space, self.pre_space,
                                            gmap, shard)
            return
        if self.use_epsilon:
            from ..operators.p2_epsilon import P2VectorEpsilonOperator

            self.K_eps = P2VectorEpsilonOperator(self.vel_space, shard,
                                                 full=full_viscous,
                                                 cell_vertices=cv)
            self.K = None
        else:
            self.K = P2ElementwiseOperator.from_shard_data(
                self.vel_space, "laplace", self._vel_sd)
            self.K_eps = None
        from ..operators.mixed import compute_divergence_elmats

        self.B = P2ToP1DivOperator(
            self.vel_space, self.pre_space, shard,
            elmats=compute_divergence_elmats(self.vel_space, cv))

    # -- vectors -------------------------------------------------------------

    def zeros(self) -> TaylorHoodVec:
        return TaylorHoodVec(
            tuple(self.vel_space.zeros() for _ in range(self.dim)),
            self.pre_space.zeros(),
        )

    def interpolate_velocity(self, fns: Sequence, x: TaylorHoodVec,
                             flag: DoFType = DoFType.ALL) -> TaylorHoodVec:
        vel = tuple(
            self.vel_space.interpolate(fns[d], x.vel[d], flag, self._vel_sd)
            for d in range(self.dim)
        )
        return TaylorHoodVec(vel, x.pre)

    def interpolate_pressure(self, fn, x: TaylorHoodVec,
                             flag: DoFType = DoFType.ALL) -> TaylorHoodVec:
        return TaylorHoodVec(
            x.vel, self.pre_space.interpolate(fn, x.pre, flag, self._pre_sd)
        )

    def dot(self, a: TaylorHoodVec, b: TaylorHoodVec,
            flag: DoFType = FLAG_INNER, axis_name=None):
        acc = jnp.asarray(0.0, jnp.float32)
        for d in range(self.dim):
            acc = acc + self.vel_space.dot(a.vel[d], b.vel[d], flag,
                                           self._vel_sd, axis_name)
        acc = acc + self.pre_space.dot(a.pre, b.pre, DoFType.ALL,
                                       self._pre_sd, axis_name)
        return acc

    def norm(self, a, flag: DoFType = FLAG_INNER, axis_name=None):
        return jnp.sqrt(self.dot(a, a, flag, axis_name))

    def project_mean(self, p: jnp.ndarray, axis_name=None) -> jnp.ndarray:
        """Subtract the algebraic mean over pressure DoFs
        (reference: vertexdof::projectMean)."""
        sp = self.pre_space
        total = sp.dof_sum(p, DoFType.ALL, self._pre_sd, axis_name)
        mean = total / sp.num_global_dofs()
        mask = jnp.asarray(sp.vertex_mask[None], dtype=p.dtype)
        return (p - mean) * mask

    # -- operator ------------------------------------------------------------

    def apply_K(self, vel: tuple, mu=None, axis_name=None) -> tuple:
        """Viscous block only (componentwise Laplace or epsilon)."""
        if self.use_epsilon:
            mu = self.mu_field if mu is None else mu
            ys = self.K_eps.apply_raw(vel, coeff=mu, sd=self._vel_sd,
                                      axis_name=axis_name)
            return tuple(self.visc * y for y in ys)
        return tuple(
            self.visc * self.K.apply_raw(v, sd=self._vel_sd,
                                         axis_name=axis_name)
            for v in vel
        )

    def K_inverse_diagonal(self, mu=None, axis_name=None) -> tuple:
        """Per-component 1/diag of the viscous block."""
        if self.use_epsilon:
            mu = self.mu_field if mu is None else mu
            ds = self.K_eps.inverse_diagonal(coeff=mu, sd=self._vel_sd,
                                             axis_name=axis_name)
            return tuple(d / self.visc for d in ds)
        d = self.K.inverse_diagonal(sd=self._vel_sd, axis_name=axis_name)
        return tuple(d / self.visc for _ in range(self.dim))

    def apply_raw(self, x: TaylorHoodVec, axis_name=None,
                  mu=None) -> TaylorHoodVec:
        """Full block apply (no row masking). ``mu``: per-call nodal
        viscosity override (e.g. eta(T) updated every time step)."""
        vsp, psp = self.vel_space, self.pre_space
        ku = self.apply_K(x.vel, mu=mu, axis_name=axis_name)
        out_v = []
        for d in range(self.dim):
            btp = self.B.apply_gradient_component_local(x.pre, d)
            btp = vsp.exchange_add(btp, self._vel_sd, axis_name)
            out_v.append(ku[d] + btp)
        div = self.B.apply_div_local(x.vel)
        div = psp.exchange_add(div, self._pre_sd, axis_name)
        return TaylorHoodVec(tuple(out_v), div)

    def apply_inner(self, x: TaylorHoodVec, flag: DoFType = FLAG_INNER,
                    axis_name=None, mu=None) -> TaylorHoodVec:
        """Velocity rows restricted to ``flag`` (Dirichlet rows zeroed);
        pressure rows free."""
        y = self.apply_raw(x, axis_name, mu=mu)
        vel = tuple(
            self.vel_space.restore_rows(y.vel[d], jnp.zeros_like(y.vel[d]),
                                        flag, self._vel_sd)
            for d in range(self.dim)
        )
        pre = y.pre * jnp.asarray(
            self.pre_space.vertex_mask[None], dtype=y.pre.dtype
        )
        return TaylorHoodVec(vel, pre)

    # -- block-diagonal preconditioner ---------------------------------------

    def block_diag_preconditioner(self, axis_name=None, mu=None):
        """SPD diagonal preconditioner: inverse diag of K per velocity
        component, inverse lumped P1 mass for pressure (reference:
        P2P1StokesBlockPreconditioner)."""
        from ..operators import forms
        from ..operators.p1_elementwise import P1ElementwiseOperator

        kdiag = self.K_inverse_diagonal(mu=mu, axis_name=axis_name)
        pmass = P1ElementwiseOperator.from_shard_data(
            self.pre_space, forms.mass_form, self._pre_sd)
        pinv = pmass.lumped_inverse_diagonal(sd=self._pre_sd,
                                             axis_name=axis_name)

        def prec(r: TaylorHoodVec) -> TaylorHoodVec:
            return TaylorHoodVec(
                tuple(kd * rv for kd, rv in zip(kdiag, r.vel)), pinv * r.pre
            )

        return prec
