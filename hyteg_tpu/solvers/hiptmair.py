"""Hiptmair hybrid smoother for H(curl) (N1E1) problems.

TPU-native redesign of the reference's HybridSmoother
(reference: src/mixed_operator/HybridSmoother.hpp): point smoothing in the
edge space is blind to the large gradient kernel of the curl-curl operator,
so each sweep adds a correction in the potential space,

    x <- x + omega_e D_A^{-1} (b - A x)                 (edge relaxation)
    r <- b - A x
    q <- omega_v D_{G^T A G}^{-1} (G^T r)               (potential relaxation)
    x <- x + G q

with G the discrete gradient P1 -> N1E1. The reference plugs arbitrary
sub-smoothers into both halves; here both are weighted Jacobi (the
TPU-idiomatic choice; Chebyshev acceleration composes on top).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from ..core.types import DoFType, FLAG_INNER
from ..functions.n1e1 import N1E1Space
from ..operators.n1e1_ops import N1E1ElementwiseOperator


class HiptmairSmoother:
    """Multiplicative two-space smoother bound to an N1E1 operator."""

    def __init__(self, op: N1E1ElementwiseOperator, sd=None,
                 omega_edge: float = 2.0 / 3.0,
                 omega_vertex: float = 2.0 / 3.0,
                 flag: DoFType = FLAG_INNER):
        self.op = op
        self.space: N1E1Space = op.space
        self.sd = self.space.resolve_sd(sd)
        self.omega_e = omega_edge
        self.omega_v = omega_vertex
        self.flag = flag
        self.inv_diag_e = op.inverse_diagonal(self.sd)
        self.inv_diag_v = op.potential_inverse_diagonal(self.sd)

    def _masked(self, upd):
        z = jnp.zeros_like(upd)
        return self.space.restore_rows(upd, z, self.flag, self.sd)

    def smooth(self, x, b, num_sweeps: int = 1):
        """Symmetric multiplicative sweep: edge -> potential -> edge."""
        sp, op, sd = self.space, self.op, self.sd

        def edge(x):
            r = b - op.apply_raw(x, sd)
            return x + self._masked(self.omega_e * self.inv_diag_e * r)

        def body(_, x):
            x = edge(x)
            r = b - op.apply_raw(x, sd)
            rv = sp.exchange_add(sp.gradient_transpose_apply(r, sd), sd)
            q = self._masked(self.omega_v * self.inv_diag_v * rv)
            return edge(x + sp.gradient_apply(q))

        return jax.lax.fori_loop(0, num_sweeps, body, x)

    def as_preconditioner(self) -> Callable:
        """Symmetric (additive) Hiptmair preconditioner for CG/MinRes:
        M^{-1} = D_A^{-1} + G D_{G^T A G}^{-1} G^T (SPD by construction)."""
        sp, sd = self.space, self.sd

        def prec(r):
            xe = self._masked(self.inv_diag_e * r)
            rv = sp.exchange_add(sp.gradient_transpose_apply(r, sd), sd)
            q = self._masked(self.inv_diag_v * rv)
            return xe + sp.gradient_apply(q)

        return prec
