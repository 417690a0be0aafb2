"""Inter-level grid transfer operators (P1 linear P/R + injection).

TPU-native redesign of the reference's grid transfers
(reference: src/hyteg/gridtransferoperators/P1toP1LinearProlongation.hpp,
P1toP1LinearRestriction.hpp and the generated kernels under
gridtransferoperators/generatedKernels/).

Every odd-parity fine micro-vertex is the midpoint of exactly one coarse
micro-edge; the 7 parity classes map to the 7 edge directions of the
structured tet grid (3 in 2D). Prolongation is pure per-cell slicing (no
communication: both cells adjacent to a macro-face compute bit-identical
values from synced coarse data). Restriction is the exact transpose:
interface residuals are pre-scaled by 1/multiplicity so that after the
additive exchange every fine DoF contributes exactly once.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..functions.p1 import P1Space
from ..indexing import micro

# parity -> (end offset 1, end offset 2) in coarse index space
_PARITY_ENDS_3D = {
    (1, 0, 0): ((0, 0, 0), (1, 0, 0)),
    (0, 1, 0): ((0, 0, 0), (0, 1, 0)),
    (0, 0, 1): ((0, 0, 0), (0, 0, 1)),
    (1, 1, 0): ((0, 1, 0), (1, 0, 0)),
    (1, 0, 1): ((0, 0, 1), (1, 0, 0)),
    (0, 1, 1): ((0, 0, 1), (0, 1, 0)),
    (1, 1, 1): ((0, 1, 0), (1, 0, 1)),  # octahedron diagonal of Bey's split
}

_PARITY_ENDS_2D = {
    (1, 0): ((0, 0), (1, 0)),
    (0, 1): ((0, 0), (0, 1)),
    (1, 1): ((0, 1), (1, 0)),
}


def _parity_ends(dim: int):
    return _PARITY_ENDS_3D if dim == 3 else _PARITY_ENDS_2D


def _read_shifted(u, off, dim):
    if all(o == 0 for o in off):
        return u
    idx = (Ellipsis,) + tuple(slice(int(o), None) for o in off)
    pads = [(0, 0)] * (u.ndim - dim) + [(0, int(o)) for o in off]
    return jnp.pad(u[idx], pads)


class P1Transfer:
    """Prolongation/restriction between two levels on the same storage."""

    def __init__(self, coarse: P1Space, fine: P1Space):
        assert fine.level == coarse.level + 1
        assert fine.storage is coarse.storage
        self.coarse = coarse
        self.fine = fine
        self.dim = coarse.dim

    def prolongate_local(self, uc: jnp.ndarray) -> jnp.ndarray:
        """(C, Nc...) -> (C, Nf...) linear interpolation, per-cell."""
        dim, Nc, Nf = self.dim, self.coarse.N, self.fine.N
        out_shape = (uc.shape[0],) + (Nf,) * dim
        out = jnp.zeros(out_shape, dtype=uc.dtype)
        even = (slice(None),) + (slice(0, None, 2),) * dim
        out = out.at[even].set(uc)
        for parity, (e1, e2) in _parity_ends(dim).items():
            v = 0.5 * (_read_shifted(uc, e1, dim) + _read_shifted(uc, e2, dim))
            dst_idx = (slice(None),) + tuple(slice(p, None, 2) for p in parity)
            src_idx = (slice(None),) + tuple(slice(0, Nc - p) for p in parity)
            out = out.at[dst_idx].set(v[src_idx])
        fine_mask = jnp.asarray(
            micro.vertex_mask(self.fine.level, dim)[None], dtype=uc.dtype
        )
        return out * fine_mask

    def prolongate(self, uc, sd_fine=None, axis_name=None):
        return self.prolongate_local(uc)

    def prolongate_and_add(self, uc, uf, sd_fine=None, axis_name=None):
        return uf + self.prolongate_local(uc)

    def restrict(self, rf: jnp.ndarray, sd_fine=None, sd_coarse=None,
                 axis_name=None) -> jnp.ndarray:
        """(C, Nf...) -> (C, Nc...), exact transpose of prolongate.

        Fine interface replicas are pre-scaled by 1/mult so each fine DoF
        contributes once globally; the coarse result is exchanged additively.
        """
        dim, Nc = self.dim, self.coarse.N
        fsp = self.fine
        sd_f = fsp.resolve_sd(sd_fine)
        sd_c = self.coarse.resolve_sd(sd_coarse)
        # prescale interface replicas by 1/multiplicity
        if fsp._dense_ok(sd_f, axis_name):
            rfs = fsp.dense_ifc.scale_ifc(rf)
        else:
            inv = sd_f.slot_inv_mult.astype(rf.dtype)
            sf = sd_f.slot_flat
            flat = rf.reshape(-1)
            idx = jnp.minimum(sf, flat.shape[0] - 1)
            flat = flat.at[sf].set(flat[idx] * inv, mode="drop")
            rfs = flat.reshape(rf.shape)
        # mask out anything beyond the fine tet region (hygiene)
        rfs = rfs * jnp.asarray(
            micro.vertex_mask(fsp.level, dim)[None], dtype=rf.dtype
        )

        even = (slice(None),) + (slice(0, None, 2),) * dim
        rc = rfs[even]
        for parity, (e1, e2) in _parity_ends(dim).items():
            v = 0.5 * rfs[(slice(None),) + tuple(slice(p, None, 2) for p in parity)]
            for e in (e1, e2):
                dst_idx = (slice(None),) + tuple(
                    slice(int(o), int(o) + v.shape[1 + d]) for d, o in enumerate(e)
                )
                rc = rc.at[dst_idx].add(v)
        rc = rc * jnp.asarray(
            micro.vertex_mask(self.coarse.level, dim)[None], dtype=rf.dtype
        )
        return self.coarse.exchange_add(rc, sd_c, axis_name)

    def restrict_injection(self, rf: jnp.ndarray, sd_fine=None, axis_name=None):
        """Injection restriction (reference: P1toP1InjectionRestriction)."""
        even = (slice(None),) + (slice(0, None, 2),) * self.dim
        return rf[even]
