"""Constant-stencil P1 apply: the 15-point-stencil fast path.

TPU-native analog of the reference's constant-stencil operators
(reference: src/hyteg/constant_stencil_operator/P1ConstantOperator.cpp:239-667
and the generated kernels, e.g. apply_3D_macrocell_vertexdof_to_vertexdof_
replace.cpp:14-60 — a 15-point stencil swept over the macro-cell).

Derivation. With per-cell-constant element matrices, the elementwise apply

    dst[p] += sum_t sum_{a,b} [p - off_a in base_t] elm[t,a,b] src[p - off_a + off_b]

collapses into a stencil: for each direction s = off_b - off_a,

    dst[p] = sum_s c_s(p) * src[p + s].

The weight c_s(p) is position dependent only near the four macro-tet faces:

  * interior: c_s = W_s = sum over all (t,a,b) with direction s;
  * the two diagonal shells S(p) = x+y+z in {n, n-1} lose the terms with
    j(t,a) = margin_t - S(off_a) > n - S(p)  (shell correction, as in the
    reference's stencil assembly);
  * the coordinate faces p_i = 0 lose the terms with off_a_i = 1 (the
    element's base would need p_i - 1 = -1).  With *strictly zero-filled*
    shifted reads, dropped terms whose read target also leaves the block
    contribute zero by themselves, so only terms with i in
    supp(off_a) & supp(off_b) need explicit correction; multi-face overlap
    (edges/corner) is handled by inclusion-exclusion over face subsets G
    with sign (-1)^(|G|+1).

All tables are static; the apply is 15 zero-filled shifted reads and
~60 fused multiply-accumulate passes over the block (vs. the 96 masked
accumulation passes + per-(class,vertex) rolls of the general elementwise
path). Verified against the general path / dense assembly in
tests/test_const_stencil.py (CPU + Pallas interpret mode).
"""

from __future__ import annotations

import functools
import itertools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..indexing import flat, micro
from .p1_stencil import _compiler_params, _roll_helpers, _yz_prefetch


@functools.lru_cache(maxsize=None)
def stencil_tables(dim: int):
    """Static (t,a,b) -> (s, j) scatter tables.

    Returns (dirs (n_s, dim) int, tab (T*nv*nv, 2) int with columns
    (s_index, j), n_j)."""
    offs = micro.offsets(dim)  # (T, nv, dim)
    margins = micro.base_margin(dim)
    T, nv = offs.shape[0], offs.shape[1]
    dirs = micro.stencil_directions(dim)  # (n_s, dim), includes 0
    key = {tuple(int(x) for x in d): i for i, d in enumerate(dirs)}
    rows = []
    for t in range(T):
        for a in range(nv):
            j = int(margins[t]) - int(offs[t, a].sum())
            assert j >= 0
            for b in range(nv):
                s = tuple(int(x) for x in (offs[t, b] - offs[t, a]))
                rows.append((key[s], j))
    tab = np.asarray(rows, dtype=np.int64)
    return dirs, tab, int(tab[:, 1].max()) + 1


def stencil_weights(elmats: jnp.ndarray, dim: int) -> jnp.ndarray:
    """(C, T, nv, nv) element matrices -> (C, n_s, n_j) shell-resolved
    stencil weights A (traceable; pure scatter-add over static tables)."""
    dirs, tab, n_j = stencil_tables(dim)
    C = elmats.shape[0]
    flatm = elmats.reshape(C, -1)  # (C, T*nv*nv) in (t, a, b) order
    A = jnp.zeros((C, dirs.shape[0], n_j), dtype=elmats.dtype)
    return A.at[:, tab[:, 0], tab[:, 1]].add(flatm)


@functools.lru_cache(maxsize=None)
def _structural_nonzero(dim: int):
    """Which (s, j) slots receive any element-matrix entry (static)."""
    dirs, tab, n_j = stencil_tables(dim)
    nz = np.zeros((dirs.shape[0], n_j), dtype=bool)
    nz[tab[:, 0], tab[:, 1]] = True
    return nz


# ---------------------------------------------------------------------------
# coordinate-face corrections (inclusion-exclusion over face subsets)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def face_tables(dim: int):
    """Signed scatter tables for the coordinate-face corrections.

    Under strict zero-fill reads, the invalid contributions at p_i = 0 that
    survive are those with i in supp(off_a) & supp(off_b).  For every
    nonempty G subset coords, j and direction s:

        E[g, j, s] = (-1)^{|G|+1} * sum of elm[t,a,b] over
                     {(t,a,b): dir = s, j(t,a) = j, G <= supp(a) & supp(b)}

    Returns (groups: tuple of G-tuples, tab (rows, 2) int columns
    (flat gjs index, sign embedded in duplication) ...) — concretely a
    scatter map from the flat (t,a,b) element-matrix entries into the
    (n_G, n_j, n_s) correction tensor with per-row signs.
    """
    offs = micro.offsets(dim)
    margins = micro.base_margin(dim)
    T, nv = offs.shape[0], offs.shape[1]
    dirs, _, n_j = stencil_tables(dim)
    key = {tuple(int(x) for x in d): i for i, d in enumerate(dirs)}
    groups = []
    for r in range(1, dim + 1):
        groups.extend(itertools.combinations(range(dim), r))
    gidx = {G: i for i, G in enumerate(groups)}
    rows, cols, signs = [], [], []
    for t in range(T):
        for a in range(nv):
            j = int(margins[t]) - int(offs[t, a].sum())
            for b in range(nv):
                supp = tuple(
                    i for i in range(dim)
                    if offs[t, a, i] == 1 and offs[t, b, i] == 1
                )
                if not supp:
                    continue
                s = key[tuple(int(x) for x in offs[t, b] - offs[t, a])]
                src_row = (t * nv + a) * nv + b
                for r in range(1, len(supp) + 1):
                    for G in itertools.combinations(supp, r):
                        rows.append(src_row)
                        cols.append((gidx[G] * n_j + j) * len(dirs) + s)
                        signs.append(1.0 if (r % 2 == 1) else -1.0)
    return (
        tuple(groups),
        np.asarray(rows, dtype=np.int64),
        np.asarray(cols, dtype=np.int64),
        np.asarray(signs, dtype=np.float64),
        n_j,
    )


def face_weights(elmats: jnp.ndarray, dim: int) -> jnp.ndarray:
    """(C, n_G, n_j, n_s) signed face-correction weights (traceable)."""
    groups, rows, cols, signs, n_j = face_tables(dim)
    dirs, _, _ = stencil_tables(dim)
    C = elmats.shape[0]
    flatm = elmats.reshape(C, -1)
    vals = flatm[:, rows] * jnp.asarray(signs, dtype=elmats.dtype)
    E = jnp.zeros((C, len(groups) * n_j * dirs.shape[0]), dtype=elmats.dtype)
    E = E.at[:, cols].add(vals)
    return E.reshape(C, len(groups), n_j, dirs.shape[0])


@functools.lru_cache(maxsize=None)
def _face_nonzero(dim: int):
    """(n_G, n_j, n_s) bool: which correction slots are structurally
    nonzero."""
    groups, rows, cols, signs, n_j = face_tables(dim)
    dirs, _, _ = stencil_tables(dim)
    nz = np.zeros(len(groups) * n_j * dirs.shape[0], dtype=bool)
    nz[cols] = True
    return nz.reshape(len(groups), n_j, dirs.shape[0])


@functools.lru_cache(maxsize=None)
def _lane_valid_masks(level: int, dim: int, pitch: int):
    """Per-direction strict read-validity lane masks.

    mask[s] is a (lanes,) float32 0/1 vector — 1 where the flat lane shift
    for direction s stays inside the (y, z) box [0,N)^2 (3D) / z box (2D).
    The sublane (x) component is handled separately by a row mask."""
    dirs, _, _ = stencil_tables(dim)
    N = (1 << level) + 1
    if dim == 2:
        z = np.arange(N)
        out = []
        for s in dirs:
            sz = int(s[1])
            out.append(((z + sz >= 0) & (z + sz < N)).astype(np.float32))
        return tuple(out)
    y, z = flat.yz_maps(N, pitch)
    out = []
    for s in dirs:
        sy, sz = int(s[1]), int(s[2])
        ok = (
            (y + sy >= 0) & (y + sy < N) & (z + sz >= 0) & (z + sz < N)
            & (z < N)
        )
        out.append(ok.astype(np.float32))
    return tuple(out)


def _strict_reads(src, level: int, dim: int, pitch: int, lane_masks=None):
    """List of strictly zero-filled shifted reads r_s (XLA path)."""
    dirs, _, _ = stencil_tables(dim)
    if lane_masks is None:
        lane_masks = _lane_valid_masks(level, dim, pitch)
    reads = []
    for i in range(dirs.shape[0]):
        r = flat.shift_read(src, tuple(int(x) for x in dirs[i]), pitch, dim)
        m = jnp.asarray(lane_masks[i], dtype=src.dtype)
        reads.append(r * m[None, None, :] if dim == 3 else r * m[None, None, :])
    return reads


@functools.lru_cache(maxsize=None)
def _mask_arrays(level: int, dim: int, pitch: int):
    """Static (N, lanes) masks: K0 (inside tet), shells S = n - m, and the
    coordinate-face indicators p_i = 0 (numpy float32)."""
    n = 1 << level
    N = n + 1
    if dim == 3:
        ysum = flat.yz_sum(N, pitch)
        y, z = flat.yz_maps(N, pitch)
        ssum = ysum[None, :] + np.arange(N)[:, None]
        coord = [
            np.broadcast_to(np.arange(N)[:, None], (N, N * pitch)),
            np.broadcast_to(y[None, :], (N, N * pitch)),
            np.broadcast_to(z[None, :], (N, N * pitch)),
        ]
    else:
        ssum = np.add.outer(np.arange(N), np.arange(N))
        coord = [
            np.broadcast_to(np.arange(N)[:, None], (N, N)),
            np.broadcast_to(np.arange(N)[None, :], (N, N)),
        ]
    K0 = (ssum <= n).astype(np.float32)
    _, _, n_j = stencil_tables(dim)
    shells = tuple(
        (ssum == n - m).astype(np.float32) for m in range(n_j - 1)
    )
    faces = tuple((c == 0).astype(np.float32) * K0 for c in coord)
    return K0, shells, faces


def _combine(reads, main_w, main_tail, face_w, dim, masks):
    """Shared accumulation logic for the XLA path and the Pallas kernel.

    reads: list of n_s shifted-read arrays (strictly zero-filled).
    main_w(s): total interior weight W_s (broadcastable against reads[s]).
    main_tail(s, m): sum_{j > m} A[s, j] or None (shell-correction tail).
    face_w(g, j, s): signed face-correction weight E or None.
    masks: (K0, shells, faces) arrays broadcastable against reads.
    """
    dirs, _, n_j = stencil_tables(dim)
    groups, *_ = face_tables(dim)
    K0, shells, faces = masks
    n_s = dirs.shape[0]

    # main: K0 * sum_s W_s r_s - sum_m shell_m * (sum_s A_{>m,s} r_s)
    acc_w = None
    acc_shell = [None] * (n_j - 1)
    for s in range(n_s):
        term = main_w(s) * reads[s]
        acc_w = term if acc_w is None else acc_w + term
        for m in range(n_j - 1):
            corr = main_tail(s, m)
            if corr is None:
                continue
            t2 = corr * reads[s]
            acc_shell[m] = t2 if acc_shell[m] is None else acc_shell[m] + t2
    dst = K0 * acc_w
    for m in range(n_j - 1):
        if acc_shell[m] is not None:
            dst = dst - shells[m] * acc_shell[m]

    # face corrections: - sum_G sigma_G * sum_j [S <= n-j] sum_s E r_s.
    # sigma_G already includes K0; [S <= n-j] restricted there equals
    # (1 - sum_{m<j} [S = n-m]).
    for g, G in enumerate(groups):
        sigma = faces[G[0]]
        for i in G[1:]:
            sigma = sigma * faces[i]
        acc_g = [None] * n_j
        for j in range(n_j):
            for s in range(n_s):
                w = face_w(g, j, s)
                if w is None:
                    continue
                t2 = w * reads[s]
                acc_g[j] = t2 if acc_g[j] is None else acc_g[j] + t2
        total = None
        for j in range(n_j):
            if acc_g[j] is None:
                continue
            term = acc_g[j]
            for m in range(j):
                term = term - shells[m] * acc_g[j]
            total = term if total is None else total + term
        if total is not None:
            dst = dst - sigma * total
    return dst


def _xla_accessors(A, E, dim, dtype):
    """Weight accessors for the XLA path ((C, 1, 1)-shaped factors)."""
    _, _, n_j = stencil_tables(dim)
    nzs = _structural_nonzero(dim)
    nzf = _face_nonzero(dim)

    def wk(arr):
        return arr.reshape(-1, 1, 1).astype(dtype)

    def main_w(s):
        return wk(A[:, s, :].sum(-1))

    def main_tail(s, m):
        js = [j for j in range(m + 1, n_j) if nzs[s, j]]
        if not js:
            return None
        corr = A[:, s, js[0]]
        for j in js[1:]:
            corr = corr + A[:, s, j]
        return wk(corr)

    def face_w(g, j, s):
        if not nzf[g, j, s]:
            return None
        return wk(E[:, g, j, s])

    return main_w, main_tail, face_w


def p1_const_apply_xla(src2d, A, level: int, dim: int, pitch: int, E=None):
    """Pure-XLA constant-stencil apply (CPU fallback; exact same math as
    the Pallas kernel — partial sums on interface rows)."""
    if E is None:
        raise ValueError("pass E = face_weights(elmats, dim)")
    reads = _strict_reads(src2d, level, dim, pitch)
    K0, shells, faces = _mask_arrays(level, dim, pitch)
    masks = (
        jnp.asarray(K0, dtype=src2d.dtype),
        tuple(jnp.asarray(s, dtype=src2d.dtype) for s in shells),
        tuple(jnp.asarray(f, dtype=src2d.dtype) for f in faces),
    )
    accessors = _xla_accessors(A, E, dim, src2d.dtype)
    return _combine(reads, *accessors, dim, masks)


# ---------------------------------------------------------------------------
# Pallas kernel
# ---------------------------------------------------------------------------


def _make_const_kernel(level: int, dim: int, pitch: int, n_g: int, n_j: int):
    n = 1 << level
    N = n + 1
    L = N * pitch if dim == 3 else N
    dirs, _, _ = stencil_tables(dim)
    n_s = dirs.shape[0]
    roll_read, _ = _roll_helpers(N, L, pitch, dim)

    nzs = _structural_nonzero(dim)
    nzf = _face_nonzero(dim)

    def kernel(w_ref, e_ref, yz_ref, src_ref, dst_ref):
        # yz_ref: (2, L) int32 rows [y_of_lane, z_of_lane] (2D: [z, z])
        c = pl.program_id(0)
        dt = dst_ref.dtype
        xs = jax.lax.broadcasted_iota(jnp.int32, (N, L), 0)
        ly = yz_ref[0, :][None, :]
        lz = yz_ref[1, :][None, :]
        in_z = lz < N  # excludes 3D padding lanes
        s_sum = xs + ly + lz if dim == 3 else xs + lz
        K0 = ((s_sum <= n) & in_z).astype(dt)
        shells = tuple(
            ((s_sum == n - m) & in_z).astype(dt) for m in range(n_j - 1)
        )
        coord = (xs, ly, lz) if dim == 3 else (xs, lz)
        faces = tuple((c_ == 0).astype(dt) * K0 for c_ in coord)
        masks = (K0, shells, faces)
        reads = []
        for s in range(n_s):
            off = tuple(int(x) for x in dirs[s])
            r = roll_read(src_ref[0], off)
            # strict zero fill: mask wrapped lanes / rows
            if dim == 3:
                sy, sz = off[1], off[2]
                ok = (ly + sy >= 0) & (ly + sy < N) & (lz + sz >= 0) \
                    & (lz + sz < N) & in_z
            else:
                sz = off[1]
                ok = (lz + sz >= 0) & (lz + sz < N)
            sx = off[0]
            if sx != 0:
                ok = ok & (xs + sx >= 0) & (xs + sx < N)
            reads.append(r * ok.astype(dt))

        def main_w(s):
            w = w_ref[c, s * n_j]
            for j in range(1, n_j):
                w = w + w_ref[c, s * n_j + j]
            return w

        def main_tail(s, m):
            js = [j for j in range(m + 1, n_j) if nzs[s, j]]
            if not js:
                return None
            w = w_ref[c, s * n_j + js[0]]
            for j in js[1:]:
                w = w + w_ref[c, s * n_j + j]
            return w

        def face_w(g, j, s):
            if not nzf[g, j, s]:
                return None
            return e_ref[c, (g * n_j + j) * n_s + s]

        dst_ref[0] = _combine(reads, main_w, main_tail, face_w, dim, masks)

    return kernel, N, L, n_s


@functools.partial(jax.jit,
                   static_argnames=("level", "dim", "pitch", "interpret"))
def p1_const_apply_pallas(src2d, A, E, level: int, dim: int, pitch: int,
                          interpret: bool = False):
    """Per-cell constant-stencil apply (partial sums on interface rows).

    src2d: (C, N, L); A: (C, n_s, n_j) from stencil_weights;
    E: (C, n_G, n_j, n_s) from face_weights."""
    C = src2d.shape[0]
    dirs, _, n_j = stencil_tables(dim)
    groups, *_ = face_tables(dim)
    n_g, n_s = len(groups), dirs.shape[0]
    kernel, N, L, n_s = _make_const_kernel(level, dim, pitch, n_g, n_j)
    w_flat = A.reshape(C, n_s * n_j).astype(src2d.dtype)
    e_flat = E.reshape(C, n_g * n_j * n_s).astype(src2d.dtype)
    if dim == 3:
        y, z = flat.yz_maps(N, pitch)
        yz = np.stack([y, z]).astype(np.int32)  # (2, L)
    else:
        z = np.arange(N, dtype=np.int32)
        yz = np.stack([z, z])

    blk = (1, N, L)
    idx = lambda c, *_: (c, 0, 0)
    data_spec = pl.BlockSpec(blk, idx, memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2, grid=(C,),
        in_specs=[
            pl.BlockSpec((2, L), lambda c, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            data_spec,
        ],
        out_specs=data_spec,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(src2d.shape, src2d.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * 4 * n_s * C * N * L,
            bytes_accessed=C * 4 * N * L * 2,
            transcendentals=0,
        ),
        compiler_params=_compiler_params(blk, n_arrays=24),
        interpret=interpret,
    )(w_flat, e_flat, yz, src2d)
