"""Mixed P2 (velocity) <-> P1 (pressure) operators for Taylor-Hood Stokes.

Reference: src/hyteg/mixedoperators/ (P2ToP1 divergence, P1ToP2 gradient),
src/mixed_operator/P2P1TaylorHoodStokesOperator.hpp. Element matrices come
from the quadrature engine:

    B[i, A, d]  = - int  psi_i  d(phi_A)/dx_d      (divergence, P2 -> P1)
    Bt          =   transpose                       (gradient,  P1 -> P2)

applied as strided shifted multiply-adds: the P1 pressure lives on the
element-level-L vertex grid, the P2 velocity on the level-(L+1) node grid;
class t with base b couples pressure node ``b + off_i`` with velocity node
``2 b + O_t(g_A)``.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from ..functions.p1 import P1Space
from ..functions.p2 import P2Space
from ..indexing import micro
from . import quadrature as q
from .p2_elementwise import _base_masks, _read_strided, _scatter_strided_add, p2_node_offsets


def _shift_read_p1(u, off, n, pitch, dim):
    """R[b] = u[b + off] over the flat base grid (n, n*pitch) [3D] /
    (n, n) [2D] on the element-level vertex grid."""
    if dim == 2:
        return u[:, int(off[0]) : int(off[0]) + n,
                 int(off[1]) : int(off[1]) + n]
    ox, ls = int(off[0]), int(off[1]) * pitch + int(off[2])
    BL = n * pitch
    L = u.shape[-1]
    nl = min(BL, L - ls)
    r = u[:, ox : ox + n, ls : ls + nl]
    if nl < BL:
        r = jnp.pad(r, [(0, 0), (0, 0), (0, BL - nl)])
    return r


def _shift_write_p1_add(dst, v, off, n, pitch, dim):
    if dim == 2:
        return dst.at[:, int(off[0]) : int(off[0]) + n,
                      int(off[1]) : int(off[1]) + n].add(v)
    ox, ls = int(off[0]), int(off[1]) * pitch + int(off[2])
    BL = n * pitch
    L = dst.shape[-1]
    nl = min(BL, L - ls)
    return dst.at[:, ox : ox + n, ls : ls + nl].add(v[:, :, :nl])


def compute_divergence_elmats(p2: P2Space, cell_vertices=None) -> jnp.ndarray:
    """(C, T, nv_p1, n_p2, dim): B[i, A, d] = -int psi_i dphi_A/dx_d."""
    dim = p2.dim
    cv = jnp.asarray(p2.cell_vertices(0)) if cell_vertices is None else cell_vertices
    verts = cv[..., :dim] if dim == 2 else cv
    v0 = verts[:, :1, :]
    J = verts[:, 1:, :] - v0
    offs = jnp.asarray(micro.offsets(dim), dtype=verts.dtype) / p2.n
    mv = v0[:, None] + jnp.einsum("tvd,cde->ctve", offs, J)  # (C,T,nv,dim)

    pts, w = q.simplex_rule(dim, 2)
    p1_vals = q.p1_basis_at(dim, pts)  # (nv, Q)
    p2_grads = q.p2_grads_at(dim, pts)  # (nA, Q, dim)

    Je = jnp.swapaxes(mv[..., 1:, :] - mv[..., :1, :], -1, -2)  # (C,T,dim,dim)
    Jinv = jnp.linalg.inv(Je)
    detJ = jnp.abs(jnp.linalg.det(Je))
    g = jnp.einsum("aqd,ctde->ctaqe", jnp.asarray(p2_grads), Jinv)
    B = -jnp.einsum("q,iq,ctaqe->ctiae", jnp.asarray(w), jnp.asarray(p1_vals), g)
    return (detJ[..., None, None, None] * B).astype(p2.dtype)


class P2ToP1DivOperator:
    """One component of div: (P2 scalar velocity component, direction d) ->
    P1 pressure grid. Use apply_component for each of the dim components."""

    def __init__(self, p2: P2Space, p1: P1Space, shard: int = 0, elmats=None):
        assert p1.level == p2.level
        if p2.dim == 3 and p1.pitch != p2.pitch:
            raise ValueError(
                f"P2ToP1DivOperator needs a shared lane pitch (P1 {p1.pitch}"
                f" != P2 {p2.pitch})")
        self.p2, self.p1 = p2, p1
        self.shard = shard
        self.elmats = (
            compute_divergence_elmats(p2) if elmats is None else elmats
        )  # (C, T, nv, nA, dim)

    def apply_component_local(self, vel_d: jnp.ndarray, d: int) -> jnp.ndarray:
        """Partial (per-cell) divergence contribution of component d."""
        p2, p1 = self.p2, self.p1
        dim, n = p2.dim, p2.n
        node_offs = p2_node_offsets(dim)
        voffs = micro.offsets(dim)
        T, nA = node_offs.shape[0], node_offs.shape[1]
        pitch = p2.pitch
        masks = _base_masks(p2.level, dim, pitch)
        dst = jnp.zeros(p1.block_shape, dtype=vel_d.dtype)
        for t in range(T):
            mask = jnp.asarray(masks[t], dtype=vel_d.dtype)
            reads = {}
            for A in range(nA):
                o = tuple(int(x) for x in node_offs[t, A])
                if o not in reads:
                    reads[o] = _read_strided(vel_d, o, n, pitch, dim)
            for i in range(voffs.shape[1]):
                acc = None
                for A in range(nA):
                    wA = self.elmats[:, t, i, A, d]
                    r = reads[tuple(int(x) for x in node_offs[t, A])]
                    term = wA.reshape(-1, 1, 1) * r
                    acc = term if acc is None else acc + term
                dst = _shift_write_p1_add(
                    dst, acc * mask, tuple(int(x) for x in voffs[t, i]), n,
                    pitch, dim
                )
        return dst

    def apply_div_local(self, vel_components) -> jnp.ndarray:
        out = None
        for d, v in enumerate(vel_components):
            c = self.apply_component_local(v, d)
            out = c if out is None else out + c
        return out

    def apply_gradient_component_local(self, p: jnp.ndarray, d: int) -> jnp.ndarray:
        """Partial B^T (gradient): pressure -> P2 component d."""
        p2 = self.p2
        dim, n = p2.dim, p2.n
        node_offs = p2_node_offsets(dim)
        voffs = micro.offsets(dim)
        T, nA = node_offs.shape[0], node_offs.shape[1]
        pitch = p2.pitch
        masks = _base_masks(p2.level, dim, pitch)
        dst = jnp.zeros(p2.block_shape, dtype=p.dtype)
        for t in range(T):
            mask = jnp.asarray(masks[t], dtype=p.dtype)
            reads = {}
            for i in range(voffs.shape[1]):
                o = tuple(int(x) for x in voffs[t, i])
                reads[o] = _shift_read_p1(p, o, n, pitch, dim)
            for A in range(nA):
                acc = None
                for i in range(voffs.shape[1]):
                    wA = self.elmats[:, t, i, A, d]
                    r = reads[tuple(int(x) for x in voffs[t, i])]
                    term = wA.reshape(-1, 1, 1) * r
                    acc = term if acc is None else acc + term
                dst = _scatter_strided_add(
                    dst, acc * mask, tuple(int(x) for x in node_offs[t, A]), n,
                    pitch, dim
                )
        return dst
