"""Point evaluation of P1/P2 fields at arbitrary physical points.

TPU-native redesign of the reference's point evaluation
(reference: src/hyteg/p1functionspace/VertexDoFFunction.hpp `evaluate` /
`evaluateGradient`, src/hyteg/geometry/ closest-point search): instead of a
host-side octree / neighbor walk, the containing macro-cell is found by
computing barycentric coordinates of every query point w.r.t. *every*
macro-cell in one batched matmul (MXU-friendly, O(Q*C) but fully on-device,
no data-dependent control flow), and the containing micro-element class is
picked the same way among the per-cube congruence-class candidates
(reference: src/hyteg/volumedofspace/CellDoFIndexing.hpp:38-55).

Points outside the domain are clamped to the barycentrically-closest cell
and evaluated at the clamped location (the analog of the reference's
clamping of departure points in MMOCTransport backtracking).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..indexing import micro
from ..primitives.storage import CellStorage


def _class_tables(dim: int):
    """Per-class (base offset O0, inverse edge matrix Minv) for membership
    tests + barycentric weights inside one refinement cube."""
    offs = micro.offsets(dim)  # (T, nv, dim)
    T = offs.shape[0]
    O0 = offs[:, 0, :].astype(np.float64)  # (T, dim)
    Minv = np.zeros((T, dim, dim))
    for t in range(T):
        M = (offs[t, 1:] - offs[t, :1]).astype(np.float64)  # rows = edges
        Minv[t] = np.linalg.inv(M.T)
    return offs, O0, Minv


def _p2_pair_table(dim: int):
    from ..operators.quadrature import _p2_node_pairs

    return _p2_node_pairs(dim)


class FieldEvaluator:
    """Evaluate a P1 (degree=1) or P2 (degree=2) DoF block at points.

    ``u`` blocks are the space's dense per-cell node grids; all cells of the
    storage must be present (single shard, or globally gathered blocks when
    running SPMD — the caller all-gathers before a semi-Lagrangian step,
    which is the collective analog of the reference's particle migration).
    """

    def __init__(self, storage: CellStorage, level: int, degree: int = 1,
                 dtype=jnp.float32, pitch: int | None = None,
                 use_buckets: bool = True):
        self.storage = storage
        self.level = level
        self.degree = degree
        self.dim = dim = storage.dim
        self.n = n = 1 << level
        # node grid: P1 -> level grid; P2 -> doubled (level+1) grid
        self.N = (2 * n + 1) if degree == 2 else (n + 1)
        # lane pitch of the flat 3D block layout (see indexing/flat.py)
        self.pitch = self.N if (pitch is None or dim == 2) else int(pitch)
        self.dtype = dtype

        verts = np.asarray(storage.cell_vertices, dtype=np.float64)[..., :dim]
        valid = np.asarray(storage.cell_valid, dtype=bool)
        v0 = verts[:, 0, :]
        J = verts[:, 1:, :] - verts[:, :1, :]  # (C, dim, dim) rows = edges
        JTinv = np.zeros_like(J)
        for c in range(J.shape[0]):
            if valid[c]:
                JTinv[c] = np.linalg.inv(J[c].T)
        self._v0 = jnp.asarray(v0, dtype=dtype)
        self._JTinv = jnp.asarray(JTinv, dtype=dtype)
        self._invalid = jnp.asarray(~valid)

        offs, O0, Minv = _class_tables(dim)
        self._offs = offs  # np (T, nv, dim)
        self._O0 = jnp.asarray(O0, dtype=dtype)
        self._Minv = jnp.asarray(Minv, dtype=dtype)
        if degree == 2:
            self._pairs = _p2_pair_table(dim)

        # uniform-grid bucket accelerator: per bucket, the cells whose
        # AABB overlaps it — the dense O(Q*C) scan becomes O(Q*K)
        # (reference analog: the octree/neighbor-walk of the host-side
        # point search, compiled to a static gather table)
        self._buckets = None
        if use_buckets and valid.sum() > 8:
            self._buckets = self._build_buckets(verts, valid)

    def _build_buckets(self, verts, valid):
        dim = self.dim
        C = verts.shape[0]
        lo = verts[valid].reshape(-1, dim).min(0)
        hi = verts[valid].reshape(-1, dim).max(0)
        G = max(2, int(round((2.0 * valid.sum()) ** (1.0 / dim))))
        scale = G / np.maximum(hi - lo, 1e-300)
        cand: dict[tuple, list] = {}
        for c in range(C):
            if not valid[c]:
                continue
            cl = np.clip(np.floor((verts[c].min(0) - lo) * scale
                                  - 1e-9).astype(int), 0, G - 1)
            ch = np.clip(np.floor((verts[c].max(0) - lo) * scale
                                  + 1e-9).astype(int), 0, G - 1)
            rng = [range(cl[d], ch[d] + 1) for d in range(dim)]
            import itertools

            for key in itertools.product(*rng):
                cand.setdefault(key, []).append(c)
        K = max(len(v) for v in cand.values())
        shape = (G,) * dim + (K,)
        # empty buckets (e.g. inside an annulus hole) take the candidate
        # list of the NEAREST non-empty bucket, so out-of-domain queries
        # clamp to a geometrically close boundary cell — matching the
        # dense scan's max-min-barycentric clamping semantics instead of
        # an arbitrary cell-0 fallback
        table = np.zeros(shape, dtype=np.int32)
        filled = np.zeros((G,) * dim, dtype=bool)
        for key, cells in cand.items():
            row = np.asarray(cells + [cells[-1]] * (K - len(cells)))
            table[key] = row
            filled[key] = True
        if not filled.all():
            import itertools

            keys = np.argwhere(filled)
            for key in np.argwhere(~filled):
                d2 = ((keys - key[None]) ** 2).sum(1)
                table[tuple(key)] = table[tuple(keys[int(d2.argmin())])]
        return (jnp.asarray(table), jnp.asarray(lo, self.dtype),
                jnp.asarray(scale, self.dtype), G)

    # -- stage 1: macro-cell location ----------------------------------------

    def locate_cells(self, pts: jnp.ndarray):
        """pts (Q, dim) -> (cell index (Q,), barycentric tail lam (Q, dim))."""
        if self._buckets is not None:
            table, lo, scale, G = self._buckets
            ib = jnp.clip(jnp.floor((pts - lo) * scale).astype(jnp.int32),
                          0, G - 1)
            cand = table[tuple(ib[:, d] for d in range(self.dim))]  # (Q, K)
            v0c = self._v0[cand]                       # (Q, K, dim)
            JTc = self._JTinv[cand]
            d = pts[:, None, :] - v0c
            lam = jnp.einsum("qkde,qke->qkd", JTc, d)
            lam0 = 1.0 - lam.sum(-1)
            minl = jnp.minimum(lam.min(-1), lam0)
            minl = jnp.where(self._invalid[cand], -jnp.inf, minl)
            k = jnp.argmax(minl, axis=1)
            c = jnp.take_along_axis(cand, k[:, None], axis=1)[:, 0]
            lam_c = jnp.take_along_axis(lam, k[:, None, None], axis=1)[:, 0]
            return c, lam_c
        d = pts[:, None, :] - self._v0[None]            # (Q, C, dim)
        lam = jnp.einsum("cde,qce->qcd", self._JTinv, d)  # (Q, C, dim)
        lam0 = 1.0 - lam.sum(-1)
        minl = jnp.minimum(lam.min(-1), lam0)
        minl = jnp.where(self._invalid[None], -jnp.inf, minl)
        c = jnp.argmax(minl, axis=1)
        lam_c = jnp.take_along_axis(lam, c[:, None, None], axis=1)[:, 0]
        return c, lam_c

    # -- stage 2: micro-element location within the macro-cell ----------------

    def locate_micro(self, lam: jnp.ndarray):
        """lam (Q, dim) in [0,1] simplex coords -> (base (Q,dim) int,
        class t (Q,), local barycentric mu (Q, nv))."""
        n, dim = self.n, self.dim
        r = jnp.clip(lam * n, 0.0, float(n))
        base = jnp.clip(jnp.floor(r).astype(jnp.int32), 0, n - 1)
        # keep the base corner inside the macro simplex: sum(base) <= n-1
        for _ in range(dim - 1):
            over = base.sum(-1) > (n - 1)
            frac = r - base
            # decrement the coordinate with the smallest fractional part
            j = jnp.argmin(jnp.where(base > 0, frac, jnp.inf), axis=-1)
            dec = jax.nn.one_hot(j, dim, dtype=base.dtype) * over[:, None]
            base = base - dec
        frac = r - base
        # congruence-class membership: barycentric w.r.t. each candidate tet
        mu_t = jnp.einsum("tde,qte->qtd", self._Minv,
                          frac[:, None, :] - self._O0[None])  # (Q, T, dim)
        mu0 = 1.0 - mu_t.sum(-1)
        minmu = jnp.minimum(mu_t.min(-1), mu0)
        t = jnp.argmax(minmu, axis=1)
        mu_tail = jnp.take_along_axis(mu_t, t[:, None, None], axis=1)[:, 0]
        mu = jnp.concatenate([1.0 - mu_tail.sum(-1, keepdims=True), mu_tail],
                             axis=-1)  # (Q, nv)
        return base, t, mu

    # -- stage 3: basis evaluation + gather -----------------------------------

    def _gather(self, u: jnp.ndarray, c: jnp.ndarray, node_idx: jnp.ndarray):
        """u (..., C, N, lanes) flat blocks, node_idx (Q, nn, dim) int ->
        (..., Q, nn)."""
        N, P = self.N, self.pitch
        if self.dim == 2:
            lanes = N
            flat = node_idx[..., 0] * N + node_idx[..., 1]
        else:
            lanes = N * P
            flat = (node_idx[..., 0] * lanes + node_idx[..., 1] * P
                    + node_idx[..., 2])
        nf = N * lanes
        gidx = c[:, None] * nf + flat                  # (Q, nn)
        u2 = u.reshape(u.shape[:-3] + (-1,))
        return jnp.take(u2, gidx.reshape(-1), axis=-1).reshape(
            u.shape[:-3] + gidx.shape
        )

    def evaluate(self, u: jnp.ndarray, points: jnp.ndarray) -> jnp.ndarray:
        """u: (C, N...) or (B, C, N...); points: (Q, >=dim) -> (Q,) / (B, Q)."""
        pts = jnp.asarray(points, dtype=self.dtype)[..., : self.dim]
        c, lam = self.locate_cells(pts)
        base, t, mu = self.locate_micro(lam)
        offs = jnp.asarray(self._offs)                 # (T, nv, dim)
        if self.degree == 1:
            node_idx = base[:, None, :] + offs[t]      # (Q, nv, dim)
            w = mu                                     # (Q, nv)
        else:
            nv = offs.shape[1]
            pairs = self._pairs
            cols = []
            wts = []
            ot = offs[t]                               # (Q, nv, dim)
            for (i, j) in pairs:
                cols.append(2 * base + ot[:, i] + ot[:, j])
                if i == j:
                    wts.append(mu[:, i] * (2.0 * mu[:, i] - 1.0))
                else:
                    wts.append(4.0 * mu[:, i] * mu[:, j])
            node_idx = jnp.stack(cols, axis=1)         # (Q, nn, dim)
            w = jnp.stack(wts, axis=1)                 # (Q, nn)
        vals = self._gather(jnp.asarray(u, dtype=self.dtype), c, node_idx)
        return jnp.einsum("...qn,qn->...q", vals, w)

    def evaluate_gradient(self, u: jnp.ndarray, points: jnp.ndarray):
        """Gradient of a P1 field at points (reference: evaluateGradient).
        Piecewise-constant per micro-element: (Q, dim) (P1 only)."""
        assert self.degree == 1, "gradient evaluation implemented for P1"
        pts = jnp.asarray(points, dtype=self.dtype)[..., : self.dim]
        c, lam = self.locate_cells(pts)
        base, t, mu = self.locate_micro(lam)
        offs = jnp.asarray(self._offs)
        node_idx = base[:, None, :] + offs[t]
        vals = self._gather(jnp.asarray(u, dtype=self.dtype), c, node_idx)
        # d(mu)/dx: mu_tail = Minv (n*lam - base - O0), lam = JTinv (x - v0)
        # => d(mu_tail)/dx = n * Minv @ JTinv_c ; d(mu0)/dx = -sum rows
        G = self.n * jnp.einsum("qde,qef->qdf", self._Minv[t], self._JTinv[c])
        g_tail = jnp.einsum("...qn,qnf->...qf", vals[..., 1:], G)
        g0 = jnp.einsum("...q,qf->...qf", vals[..., 0], -G.sum(-2))
        return g_tail + g0
