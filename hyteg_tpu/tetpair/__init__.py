"""Paired-tet fast path for the general P1 constant-stencil apply.

The performance-critical redesign of the general macro-tet path
(reference: src/constant_stencil_operator/P1ConstantOperator.cpp:239-667):
two macro-tets share one dense (N, N*pitch) block — tet A in the lower
corner (x+y+z <= n), tet B point-reflected into the upper corner
(x+y+z >= 2n) — which cuts the dense-layout storage redundancy from ~6x
to ~3x, and the halo exchange is chain-fused into the stencil kernel
(install summed interface values in the prologue, extract partial boundary
sums in the epilogue) so one apply streams each block exactly once.
"""

from .engine import TetPairEngine

__all__ = ["TetPairEngine"]
