"""Free-slip boundary handling: normal projection of vector fields.

Reference: src/hyteg/p1functionspace/freeslip/ and
src/hyteg/composites/StrongFreeSlipWrapper.hpp — ProjectNormalOperator
removes the normal component of a velocity field on FREESLIP-flagged
boundary DoFs (u <- u - (u.n) n), and the wrapper conjugates an operator
with that projection so Krylov solvers see the constrained system
A_fs = P A P + (I - P).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.types import BoundaryCondition, DoFType


class NormalProjection:
    """Projects out the normal component on FREESLIP rows.

    ``normal_fn(x) -> (..., dim)`` outward unit normal, evaluated at node
    coordinates (e.g. radial for annulus/shell domains).
    """

    def __init__(self, space, bc: BoundaryCondition, normal_fn, shard: int = 0):
        self.space = space
        self.bc = bc
        self.dim = space.dim
        sd = space.resolve_sd(bc, shard)
        self._sd = sd
        xyz = space.coords(shard) if hasattr(space, "coords") else None
        n = jnp.asarray(normal_fn(xyz), dtype=xyz.dtype)
        nrm = jnp.sqrt(jnp.sum(n * n, axis=-1, keepdims=True))
        n = n / jnp.maximum(nrm, 1e-30)
        ns = getattr(space, "node_space", space)
        ones = jnp.ones(ns.block_shape, dtype=n.dtype)
        mask = ns.restore_rows(ones, jnp.zeros_like(ones), DoFType.FREESLIP,
                               sd)
        self.mask = mask                      # 1 on freeslip rows
        self.normals = n * mask[..., None]    # zero elsewhere

    def project(self, vel: tuple) -> tuple:
        """u <- u - (u.n) n on freeslip rows (reference: projectNormal)."""
        un = None
        for d in range(self.dim):
            t = vel[d] * self.normals[..., d]
            un = t if un is None else un + t
        return tuple(vel[d] - un * self.normals[..., d]
                     for d in range(self.dim))

    def normal_part(self, vel: tuple) -> tuple:
        un = None
        for d in range(self.dim):
            t = vel[d] * self.normals[..., d]
            un = t if un is None else un + t
        return tuple(un * self.normals[..., d] for d in range(self.dim))


class StrongFreeSlipWrapper:
    """A_fs x = P A (P x) + (I - P) x  (reference: StrongFreeSlipWrapper).

    ``apply_vel`` maps a velocity tuple to a velocity tuple; solvers using
    the wrapped operator automatically keep u.n = 0 at convergence when the
    rhs is projected as well (use ``project_rhs``).
    """

    def __init__(self, apply_vel, projection: NormalProjection):
        self.apply_vel = apply_vel
        self.proj = projection

    def __call__(self, vel: tuple) -> tuple:
        pv = self.proj.project(vel)
        ap = self.proj.project(self.apply_vel(pv))
        n = self.proj.normal_part(vel)
        return tuple(a + b for a, b in zip(ap, n))

    def project_rhs(self, rhs: tuple) -> tuple:
        return self.proj.project(rhs)
