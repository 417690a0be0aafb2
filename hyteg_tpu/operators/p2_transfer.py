"""P2 -> P2 quadratic grid transfers on dense node grids.

Reference: src/hyteg/gridtransferoperators/P2toP2QuadraticProlongation.hpp /
P2toP2QuadraticRestriction.hpp. A coarse micro-element (class t, base b on
the level-L element grid) covers the 35 fine nodes at level-(L+2) coords
``4 b + G`` (G in {0..4}^dim, sum <= 4); prolongation evaluates the coarse
P2 basis at G/4:

    out[4 b + G] = sum_A  phi_A(G / 4) * u[2 b + O_t(g_A)]

with weights tabulated numerically from the nodal basis (no hand-derived
stencils). Writes of neighboring elements overlap only where the values
agree (FE continuity), so masked strided ``set``s are exact. Restriction is
the true transpose: prescale by 1/(cross-cell replica count) and by the
static within-cell element multiplicity, per-element strided scatter-add,
then additive interface exchange.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from ..functions.p2 import P2Space
from ..indexing import flat, micro
from . import quadrature as q
from .p2_elementwise import (_base_masks, _read_strided,
                             _scatter_strided_add, p2_node_offsets)


@functools.lru_cache(maxsize=None)
def _fine_offsets_and_weights(dim: int):
    """Per class t: fine-node offsets G_t = sum_i m_i off_i (m multi-index,
    |m| = 4 — the quarter-point lattice of *that class's shape*) and the P2
    basis weights phi_A(m[1:] / 4) in the element's barycentric frame.

    Returns (gs (T, nG, dim) int, W (T, nG, nA) float)."""
    import itertools

    offs = micro.offsets(dim)  # (T, nv, dim)
    T, nv = offs.shape[0], offs.shape[1]
    multi = [
        m
        for m in itertools.product(range(5), repeat=nv)
        if sum(m) == 4
    ]
    nG = len(multi)
    nA = q.p2_offsets(dim).shape[0]
    gs = np.zeros((T, nG, dim), dtype=np.int64)
    W = np.zeros((T, nG, nA))
    for t in range(T):
        for k, m in enumerate(multi):
            gs[t, k] = sum(m[i] * offs[t, i] for i in range(nv))
            x = np.array(m[1:], dtype=np.float64) / 4.0
            W[t, k] = q.p2_basis_at(dim, x[None, :])[:, 0]
    return gs, W


def _class_fine_valid(dim: int, level: int, pitch: int):
    """For class t: which fine offsets G stay inside the fine node grid for
    every valid base (all of them — G/4 within the element => inside the
    macro-simplex). Returns the flat element base masks cropped to [0, n)."""
    return _base_masks(level, dim, pitch)


@functools.lru_cache(maxsize=None)
def _elem_mult(dim: int, level: int, pitch: int) -> np.ndarray:
    """Static fine-node-grid field: number of (class, base) coarse elements
    containing each fine node (within one macro cell). Duplicate (class,
    base, G) hits on the same node (distinct multi-indices mapping to the
    same G cannot happen for non-degenerate classes) are counted once per
    element via a per-element visited set."""
    n = 1 << level
    Mf = (1 << (level + 2)) + 1
    gs, _ = _fine_offsets_and_weights(dim)
    offs_count = np.zeros((Mf,) * dim)
    for t in range(micro.num_classes(dim)):
        bases = np.argwhere(micro.elem_base_mask(level, t, dim)[(slice(0, n),) * dim])
        uniq = np.unique(gs[t], axis=0)
        for G in uniq:
            pos = bases * 4 + G
            idx = tuple(pos[:, d] for d in range(dim))
            offs_count[idx] += 1.0
    offs_count[offs_count == 0] = 1.0
    if dim == 3:
        ones = flat.flatten_field(np.ones_like(offs_count), pitch)
        offs_count = flat.flatten_field(offs_count, pitch)
        offs_count[ones == 0] = 1.0  # padding lanes: neutral divisor
    return offs_count


def _read2(u, off, n, pitch, dim):
    """R[b] = u[2b + off] over the flat base grid (coarse node grid)."""
    return _read_strided(u, off, n, pitch, dim)


def _stride4_parts(off, pitch, dim, n, L):
    if dim == 2:
        ox, ls = int(off[0]), int(off[1])
    else:
        ox, ls = int(off[0]), int(off[1]) * pitch + int(off[2])
    BL = n * pitch if dim == 3 else n
    nl = min(BL, (L - 1 - ls) // 4 + 1)
    return ox, ls, BL, nl


def _write4_set(out, v, off, n, pitch, dim):
    ox, ls, BL, nl = _stride4_parts(off, pitch, dim, n, out.shape[-1])
    return out.at[:, ox : ox + 4 * n : 4, ls : ls + 4 * nl : 4].set(v[:, :, :nl])


def _read4(u, off, n, pitch, dim):
    ox, ls, BL, nl = _stride4_parts(off, pitch, dim, n, u.shape[-1])
    r = u[:, ox : ox + 4 * n : 4, ls : ls + 4 * nl : 4]
    if nl < BL:
        r = jnp.pad(r, [(0, 0), (0, 0), (0, BL - nl)])
    return r


def _write2_add(out, v, off, n, pitch, dim):
    return _scatter_strided_add(out, v, off, n, pitch, dim)


class P2Transfer:
    """Quadratic prolongation/restriction between P2 levels L and L+1."""

    def __init__(self, coarse: P2Space, fine: P2Space):
        assert fine.level == coarse.level + 1
        assert fine.storage is coarse.storage
        self.coarse = coarse
        self.fine = fine
        self.dim = coarse.dim
        self._repitch = coarse.dim == 3 and coarse.pitch != fine.pitch

    def _c_in(self, uc):
        if not self._repitch:
            return uc
        return flat.repitch(uc, self.coarse.M, self.coarse.pitch,
                            self.fine.pitch)

    def _c_out(self, rc):
        if not self._repitch:
            return rc
        return flat.repitch(rc, self.coarse.M, self.fine.pitch,
                            self.coarse.pitch)

    def prolongate_local(self, uc: jnp.ndarray) -> jnp.ndarray:
        dim = self.dim
        L = self.coarse.level
        n = 1 << L
        uc = self._c_in(uc)
        node_offs = p2_node_offsets(dim)  # (T, nA, dim)
        gs_all, W = _fine_offsets_and_weights(dim)
        pitch = self.fine.pitch
        masks = _class_fine_valid(dim, L, pitch)
        out = jnp.zeros(
            (uc.shape[0], self.fine.M, self.fine.node_space.lanes),
            dtype=uc.dtype)
        for t in range(W.shape[0]):
            mask = jnp.asarray(masks[t], dtype=uc.dtype)
            reads = {}
            for A in range(node_offs.shape[1]):
                o = tuple(int(x) for x in node_offs[t, A])
                if o not in reads:
                    reads[o] = _read2(uc, o, n, pitch, dim)
            seen = set()
            for k in range(gs_all.shape[1]):
                G = tuple(int(x) for x in gs_all[t, k])
                if G in seen:
                    continue
                seen.add(G)
                acc = None
                for A in range(node_offs.shape[1]):
                    w = float(W[t, k, A])
                    if abs(w) < 1e-14:
                        continue
                    r = reads[tuple(int(x) for x in node_offs[t, A])]
                    acc = w * r if acc is None else acc + w * r
                # write only where this class's base is valid; out positions
                # of invalid bases keep their previous value
                cur = _read4(out, G, n, pitch, dim)
                val = jnp.where(mask > 0, acc, cur)
                out = _write4_set(out, val, G, n, pitch, dim)
        vm = jnp.asarray(self.fine.vertex_mask[None], dtype=uc.dtype)
        return out * vm

    def prolongate(self, uc, sd_fine=None, axis_name=None):
        return self.prolongate_local(uc)

    def prolongate_and_add(self, uc, uf, sd_fine=None, axis_name=None):
        return uf + self.prolongate_local(uc)

    def restrict(self, rf, sd_fine=None, sd_coarse=None, axis_name=None):
        dim = self.dim
        L = self.coarse.level
        n = 1 << L
        fsp, csp = self.fine.node_space, self.coarse.node_space
        sd_f = fsp.resolve_sd(sd_fine)
        sd_c = csp.resolve_sd(sd_coarse)
        # cross-cell replica prescale
        if fsp._dense_ok(sd_f, axis_name):
            rfs = fsp.dense_ifc.scale_ifc(rf)
        else:
            inv = sd_f.slot_inv_mult.astype(rf.dtype)
            sf = sd_f.slot_flat
            flat = rf.reshape(-1)
            idx = jnp.minimum(sf, flat.shape[0] - 1)
            flat = flat.at[sf].set(flat[idx] * inv, mode="drop")
            rfs = flat.reshape(rf.shape)
        rfs = rfs * jnp.asarray(self.fine.vertex_mask[None], dtype=rf.dtype)
        pitch = self.fine.pitch
        # within-cell element-multiplicity prescale
        rfs = rfs / jnp.asarray(_elem_mult(dim, L, pitch), dtype=rf.dtype)[None]

        node_offs = p2_node_offsets(dim)
        gs_all, W = _fine_offsets_and_weights(dim)
        masks = _class_fine_valid(dim, L, pitch)
        rc = jnp.zeros(
            (rf.shape[0], self.coarse.M, self.coarse.M * pitch if dim == 3
             else self.coarse.M),
            dtype=rf.dtype)
        for t in range(W.shape[0]):
            mask = jnp.asarray(masks[t], dtype=rf.dtype)
            seen = set()
            reads = {}
            for k in range(gs_all.shape[1]):
                G = tuple(int(x) for x in gs_all[t, k])
                if G not in reads:
                    reads[G] = _read4(rfs, G, n, pitch, dim)
            for A in range(node_offs.shape[1]):
                acc = None
                seen = set()
                for k in range(gs_all.shape[1]):
                    G = tuple(int(x) for x in gs_all[t, k])
                    if G in seen:
                        continue
                    seen.add(G)
                    w = float(W[t, k, A])
                    if abs(w) < 1e-14:
                        continue
                    acc = (w * reads[G] if acc is None else acc + w * reads[G])
                if acc is None:
                    continue
                rc = _write2_add(
                    rc, acc * mask, tuple(int(x) for x in node_offs[t, A]), n,
                    pitch, dim
                )
        rc = self._c_out(rc)
        rc = rc * jnp.asarray(self.coarse.vertex_mask[None], dtype=rf.dtype)
        return csp.exchange_add(rc, sd_c, axis_name)
