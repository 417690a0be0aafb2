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

On the flat 3D layout with a pitch shared between the levels (see
indexing/flat.py), fine lane = 2 * coarse lane + (py*pitch + pz), so all
transfers are stride-2 sublane/lane slicing — no relayouts anywhere.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from ..functions.p1 import P1Space
from ..indexing import flat, micro

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


class P1Transfer:
    """Prolongation/restriction between two levels on the same storage.

    The stride-2 transfer core needs both levels on one lane pitch (GMG
    stacks share pitch = N_max; see solvers/templates.py). Spaces built
    with mismatched pitches still work — the coarse array is repitched at
    the boundary (a materialized relayout, fine on cold paths)."""

    def __init__(self, coarse: P1Space, fine: P1Space):
        assert fine.level == coarse.level + 1
        assert fine.storage is coarse.storage
        self.coarse = coarse
        self.fine = fine
        self.dim = coarse.dim
        self._repitch = coarse.dim == 3 and coarse.pitch != fine.pitch

    def _c_in(self, uc):
        """Coarse array in the fine pitch (transfer-core layout)."""
        if not self._repitch:
            return uc
        return flat.repitch(uc, self.coarse.N, self.coarse.pitch,
                            self.fine.pitch)

    def _c_out(self, rc):
        if not self._repitch:
            return rc
        return flat.repitch(rc, self.coarse.N, self.fine.pitch,
                            self.coarse.pitch)

    @property
    def _cvm(self) -> np.ndarray:
        """Coarse vertex mask in the transfer-core (fine) pitch.

        Lane arithmetic aliases coarse bases whose fine target is invalid
        (padding lanes, or z_f = 2 z_c + p_z beyond the grid) onto valid
        fine lanes of other parity classes, so every contribution is masked
        to bases with a *valid fine target* and accumulated with ``add`` —
        aliased writes then contribute exactly 0.
        """
        if self.dim == 2:
            return micro.vertex_mask(self.coarse.level, 2)
        return micro.vertex_mask_flat(self.coarse.level, 3, self.fine.pitch)

    @functools.lru_cache(maxsize=None)
    def _parity_mask(self, parity) -> np.ndarray:
        """(Nc, Lc) mask of coarse bases whose fine target (2b + parity) is
        a valid fine vertex (inside the tet, real z)."""
        Nc = self.coarse.N
        nf = self.fine.N - 1
        if self.dim == 2:
            i, k = np.meshgrid(np.arange(Nc), np.arange(Nc), indexing="ij")
            xf = 2 * i + int(parity[0])
            zf = 2 * k + int(parity[1])
            return ((xf + zf <= nf) & (xf <= nf) & (zf <= nf)).astype(
                np.float64)
        P = self.fine.pitch
        l = np.arange(Nc * P)
        yc, zc = l // P, l % P
        i = np.arange(Nc)[:, None]
        xf = 2 * i + int(parity[0])
        yf = 2 * yc[None] + int(parity[1])
        zf = 2 * zc[None] + int(parity[2])
        ok = (zc[None] < Nc) & (zf <= nf) & (yf <= nf) & (xf <= nf)
        return (ok & (xf + yf + zf <= nf)).astype(np.float64)

    # -- static geometry of the stride-2 lane map ----------------------------

    def _lane_shift(self, off) -> int:
        if self.dim == 2:
            return int(off[1])
        return int(off[1]) * self.fine.pitch + int(off[2])

    @property
    def _Lc_use(self) -> int:
        """Coarse lanes whose doubled index stays inside the fine block
        (everything beyond is z-padding / invalid y rows)."""
        if self.dim == 2:
            return self.coarse.N
        P = self.fine.pitch
        return (self.coarse.N - 1) * P + self.coarse.N

    def _parity_extents(self, parity) -> tuple[int, int]:
        """(#sublane, #lane) coarse slots used by one fine parity class."""
        Nc, Nf = self.coarse.N, self.fine.N
        px = int(parity[0])
        nx = Nc - px
        pl = self._lane_shift(parity)
        Lf = self.fine.lanes
        nl = min(self._Lc_use, (Lf - 1 - pl) // 2 + 1)
        return nx, nl

    # -- prolongation ---------------------------------------------------------

    def prolongate_local(self, uc: jnp.ndarray) -> jnp.ndarray:
        """(C, Nc, Lc) -> (C, Nf, Lf) linear interpolation, per-cell."""
        dim = self.dim
        csp, fsp = self.coarse, self.fine
        Nc = csp.N
        uc = self._c_in(uc)
        cvm = jnp.asarray(self._cvm[None], dtype=uc.dtype)
        ucm = uc * cvm
        out = jnp.zeros((uc.shape[0], fsp.N, fsp.lanes), dtype=uc.dtype)
        Lu = self._Lc_use
        out = out.at[:, : 2 * Nc - 1 : 2, : 2 * Lu - 1 : 2].add(ucm[:, :, :Lu])
        for parity, (e1, e2) in _parity_ends(dim).items():
            pm = jnp.asarray(self._parity_mask(parity)[None], dtype=uc.dtype)
            v = 0.5 * (
                flat.shift_read(ucm, e1, fsp.pitch, dim)
                + flat.shift_read(ucm, e2, fsp.pitch, dim)
            ) * pm
            px = int(parity[0])
            pl = self._lane_shift(parity)
            nx, nl = self._parity_extents(parity)
            out = out.at[
                :, px : px + 2 * nx - 1 : 2, pl : pl + 2 * nl - 1 : 2
            ].add(v[:, :nx, :nl])
        fine_mask = jnp.asarray(fsp.vertex_mask[None], dtype=uc.dtype)
        return out * fine_mask

    def prolongate(self, uc, sd_fine=None, axis_name=None):
        return self.prolongate_local(uc)

    def prolongate_and_add(self, uc, uf, sd_fine=None, axis_name=None):
        return uf + self.prolongate_local(uc)

    # -- restriction ----------------------------------------------------------

    def restrict(self, rf: jnp.ndarray, sd_fine=None, sd_coarse=None,
                 axis_name=None) -> jnp.ndarray:
        """(C, Nf, Lf) -> (C, Nc, Lc), exact transpose of prolongate.

        Fine interface replicas are pre-scaled by 1/mult so each fine DoF
        contributes once globally; the coarse result is exchanged additively.
        """
        dim = self.dim
        csp, fsp = self.coarse, self.fine
        Nc = csp.N
        Lc = Nc * fsp.pitch if dim == 3 else csp.lanes
        sd_f = fsp.resolve_sd(sd_fine)
        sd_c = csp.resolve_sd(sd_coarse)
        # prescale interface replicas by 1/multiplicity
        if fsp._dense_ok(sd_f, axis_name):
            rfs = fsp.dense_ifc.scale_ifc(rf)
        else:
            inv = sd_f.slot_inv_mult.astype(rf.dtype)
            sf = sd_f.slot_flat
            fl = rf.reshape(-1)
            idx = jnp.minimum(sf, fl.shape[0] - 1)
            fl = fl.at[sf].set(fl[idx] * inv, mode="drop")
            rfs = fl.reshape(rf.shape)
        # mask out anything beyond the fine tet region (hygiene)
        rfs = rfs * jnp.asarray(fsp.vertex_mask[None], dtype=rf.dtype)

        cvm = jnp.asarray(self._cvm[None], dtype=rf.dtype)
        Lu = self._Lc_use
        rc = rfs[:, : 2 * Nc - 1 : 2, : 2 * Lu - 1 : 2]
        if Lu < Lc:
            rc = jnp.pad(rc, [(0, 0), (0, 0), (0, Lc - Lu)])
        rc = rc * cvm
        for parity, (e1, e2) in _parity_ends(dim).items():
            px = int(parity[0])
            pl = self._lane_shift(parity)
            nx, nl = self._parity_extents(parity)
            # mask to bases with valid fine targets: lane aliasing (see
            # _cvm) would otherwise inject other parities' fine values
            pm = jnp.asarray(self._parity_mask(parity)[None], dtype=rf.dtype)
            v = 0.5 * rfs[:, px : px + 2 * nx - 1 : 2, pl : pl + 2 * nl - 1 : 2]
            v = v * pm[:, :nx, :nl]
            for e in (e1, e2):
                ex = int(e[0])
                le = self._lane_shift(e)
                vx = min(nx, Nc - ex)
                vl = min(nl, Lc - le)
                rc = rc.at[:, ex : ex + vx, le : le + vl].add(v[:, :vx, :vl])
        rc = self._c_out(rc)
        rc = rc * jnp.asarray(csp.vertex_mask[None], dtype=rf.dtype)
        return csp.exchange_add(rc, sd_c, axis_name)

    def restrict_injection(self, rf: jnp.ndarray, sd_fine=None, axis_name=None):
        """Injection restriction (reference: P1toP1InjectionRestriction)."""
        Nc = self.coarse.N
        Lc = Nc * self.fine.pitch if self.dim == 3 else self.coarse.lanes
        Lu = self._Lc_use
        rc = rf[:, : 2 * Nc - 1 : 2, : 2 * Lu - 1 : 2]
        if Lu < Lc:
            rc = jnp.pad(rc, [(0, 0), (0, 0), (0, Lc - Lu)])
        rc = rc * jnp.asarray(self._cvm[None], dtype=rf.dtype)
        return self._c_out(rc)
