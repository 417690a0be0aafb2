"""Static plan for the paired-tet apply: pairing, masks, weight tables.

Weight algebra. The pointwise-exact constant-stencil weight of direction d
at position p inside a macro-tet (kernels/p1_const_stencil.py derivation,
n_j = 2 in 3D) is

    w_d(p) = (A0_d + A1_d) - [s(p) = n] * A1_d
             - sum_{G: p on all faces in G} (E[G,0,d] + E[G,1,d] [s<=n-1])

with s = x + y + z, A = stencil_weights, E = face_weights_full. Using
[s <= n-1] = 1 - [s = n] (inside the tet), and splitting face groups into
lane-only (G subset {y, z}) and x-containing (row 0), this collapses to

    w_d(p) = V_d[l] - [s = n] * T_d[l]          (x in 1..n-1)
    w_d(0, l) = V0_d[l] - [s = n] * T0_d[l]     (row 0)

where V/T/V0/T0 are per-lane vectors, each a 4-term combination of the
static lane masks (1, [y=0], [z=0], [y=0][z=0]) with per-cell scalar
coefficients. The kernel builds the vectors with one tiny MXU matmul
(coeff-matrix @ mask-stack) per cell and then runs a box-style dx-grouped
sweep (kernels/box_stencil.py) — per-lane weights make every boundary
correction free of full-tile mask passes except the single diagonal shell.

Tet B is point-reflected: stored[x,y,z] = u_B[n-x, n-y, n-z]. Since the
15-direction set is symmetric, the stored-space apply for B uses B's
tables at the negated direction and mirrored lane masks ([y=n], [z=n]);
its x-face fix sits on row n and its diagonal shell on s = 2n.
"""

from __future__ import annotations

import dataclasses
import functools

import jax.numpy as jnp
import numpy as np

from ..indexing import flat
from ..kernels.p1_const_stencil import (face_tables_full, face_weights_full,
                                        stencil_tables, stencil_weights,
                                        _structural_nonzero)

#: row layout of the per-cell coefficient matrix W (n_vec rows):
#: kind-major [VA, TA, V0A, T0A, VB, TB, V0B, T0B], 15 directions each.
KINDS = ("VA", "TA", "V0A", "T0A", "VB", "TB", "V0B", "T0B")
N_DIRS = 15
N_VEC = len(KINDS) * N_DIRS  # 120
N_MASKCOL = 7  # [1, yA, zA, yzA, yB, zB, yzB]


@functools.lru_cache(maxsize=None)
def dir_tables():
    """(dirs (15, 3), neg (15,), tail_a, tail_b).

    ``neg[s]`` is the index of -dirs[s]. ``tail_a`` are the stored
    directions with a structurally nonzero shell tail for the A half;
    ``tail_b`` is the same set for the reflected B half, whose stored
    direction e carries the own-coords tables of -e (so its tail pattern
    is the neg-mapped one)."""
    dirs, _, n_j = stencil_tables(3)
    assert n_j == 2, "plan assumes the 3D two-shell structure"
    key = {tuple(int(v) for v in d): i for i, d in enumerate(dirs)}
    neg = np.array([key[tuple(-int(v) for v in d)] for d in dirs],
                   dtype=np.int64)
    nzs = _structural_nonzero(3)
    tail_a = tuple(s for s in range(dirs.shape[0]) if nzs[s, 1])
    tail_b = tuple(s for s in range(dirs.shape[0]) if nzs[neg[s], 1])
    return dirs, neg, tail_a, tail_b


@functools.lru_cache(maxsize=None)
def _group_index():
    groups, *_ = face_tables_full(3)
    return {G: i for i, G in enumerate(groups)}


def _half_tables(A: np.ndarray, E: np.ndarray) -> np.ndarray:
    """(C, 4 kinds, 15, 4 cols) per-half coefficient tables in OWN coords.

    cols = coefficients against [1, my, mz, my*mz]; kinds = V, T, V0, T0.
    A: (C, 15, 2); E: (C, 7, 2, 15)."""
    g = _group_index()
    g0, gy, gz = g[(0,)], g[(1,)], g[(2,)]
    gxy, gxz, gyz, gxyz = g[(0, 1)], g[(0, 2)], g[(1, 2)], g[(0, 1, 2)]
    C = A.shape[0]
    out = np.zeros((C, 4, N_DIRS, 4), dtype=np.float64)
    Et = lambda gi: E[:, gi, 0, :] + E[:, gi, 1, :]  # (C, 15) total
    E1 = lambda gi: E[:, gi, 1, :]
    # V
    out[:, 0, :, 0] = A[:, :, 0] + A[:, :, 1]
    out[:, 0, :, 1] = -Et(gy)
    out[:, 0, :, 2] = -Et(gz)
    out[:, 0, :, 3] = -Et(gyz)
    # T
    out[:, 1, :, 0] = A[:, :, 1]
    out[:, 1, :, 1] = -E1(gy)
    out[:, 1, :, 2] = -E1(gz)
    out[:, 1, :, 3] = -E1(gyz)
    # V0 = V - x-face groups
    out[:, 2] = out[:, 0]
    out[:, 2, :, 0] -= Et(g0)
    out[:, 2, :, 1] -= Et(gxy)
    out[:, 2, :, 2] -= Et(gxz)
    out[:, 2, :, 3] -= Et(gxyz)
    # T0 = T - x-face groups (j = 1 parts)
    out[:, 3] = out[:, 1]
    out[:, 3, :, 0] -= E1(g0)
    out[:, 3, :, 1] -= E1(gxy)
    out[:, 3, :, 2] -= E1(gxz)
    out[:, 3, :, 3] -= E1(gxyz)
    return out


def weight_matrix(elmats: np.ndarray) -> np.ndarray:
    """(Cp, N_VEC, N_MASKCOL) kernel coefficient matrices from per-cell
    element matrices (C, T, nv, nv), C even, pairs (2i, 2i+1)."""
    C = elmats.shape[0]
    assert C % 2 == 0, "tetpair requires an even macro-cell count"
    A = np.asarray(stencil_weights(jnp.asarray(elmats), 3))
    E = np.asarray(face_weights_full(jnp.asarray(elmats), 3))
    tabs = _half_tables(A, E)  # (C, 4, 15, 4) own-coords
    _, neg, _, _ = dir_tables()
    Cp = C // 2
    W = np.zeros((Cp, N_VEC, N_MASKCOL), dtype=np.float64)
    tA = tabs[0::2]  # (Cp, 4, 15, 4)
    tB = tabs[1::2][:, :, neg, :]  # stored direction e uses B table at -e
    for k in range(4):  # VA, TA, V0A, T0A
        W[:, k * N_DIRS:(k + 1) * N_DIRS, 0] = tA[:, k, :, 0]
        W[:, k * N_DIRS:(k + 1) * N_DIRS, 1:4] = tA[:, k, :, 1:4]
    for k in range(4):  # VB, TB, V0B, T0B
        r0 = (4 + k) * N_DIRS
        W[:, r0:r0 + N_DIRS, 0] = tB[:, k, :, 0]
        W[:, r0:r0 + N_DIRS, 4:7] = tB[:, k, :, 1:4]
    return W.astype(np.float32)


@functools.lru_cache(maxsize=None)
def mask_stack(N: int, pitch: int) -> np.ndarray:
    """(N_MASKCOL, L) static lane-mask stack [1, yA, zA, yzA, yB, zB, yzB].

    A masks: [ly = 0], [lz = 0]; B masks (stored coords): [ly = n], [lz = n].
    Padding lanes (lz > n) carry zeros everywhere except the constant row,
    which is harmless: positions there are outside both tets and masked by
    KA/KB in the kernel."""
    n = N - 1
    ly, lz = flat.yz_maps(N, pitch)
    m = np.zeros((N_MASKCOL, N * pitch), dtype=np.float32)
    m[0] = 1.0
    m[1] = ly == 0
    m[2] = lz == 0
    m[3] = m[1] * m[2]
    m[4] = ly == n
    m[5] = lz == n
    m[6] = m[4] * m[5]
    return m


@functools.lru_cache(maxsize=None)
def onehot_z(N: int, pitch: int, zval: int) -> np.ndarray:
    """(N, L) one-hot: OH[y, l] = 1 iff l = y * pitch + zval (z-face map)."""
    L = N * pitch
    oh = np.zeros((N, L), dtype=np.float32)
    y = np.arange(N)
    oh[y, y * pitch + zval] = 1.0
    return oh


@dataclasses.dataclass(frozen=True)
class PairPlan:
    """Static geometry of the paired layout for one (level, pitch)."""

    N: int
    pitch: int

    @property
    def n(self) -> int:
        return self.N - 1

    @property
    def L(self) -> int:
        return self.N * self.pitch

    @functools.cached_property
    def yz(self) -> np.ndarray:
        """(2, L) int32 [ly, lz] per lane."""
        y, z = flat.yz_maps(self.N, self.pitch)
        return np.stack([y, z]).astype(np.int32)

    @functools.cached_property
    def masks(self) -> np.ndarray:
        return mask_stack(self.N, self.pitch)

    @functools.cached_property
    def ohz_a(self) -> np.ndarray:
        return onehot_z(self.N, self.pitch, 0)

    @functools.cached_property
    def ohz_b(self) -> np.ndarray:
        return onehot_z(self.N, self.pitch, self.n)

    @functools.cached_property
    def lane_classes(self):
        dirs, _, _, _ = dir_tables()
        return tuple(sorted({int(d[1]) * self.pitch + int(d[2])
                             for d in dirs}))

    # numpy masks for host-side reference / packing --------------------------

    @functools.cached_property
    def s_sum(self) -> np.ndarray:
        """(N, L) x+ly+lz with a sentinel on padding lanes."""
        ly, lz = self.yz
        s = np.arange(self.N)[:, None] + ly[None] + lz[None]
        s[:, lz >= self.N] = 1 << 22
        return s

    @functools.cached_property
    def in_a(self) -> np.ndarray:
        return self.s_sum <= self.n

    @functools.cached_property
    def in_b(self) -> np.ndarray:
        ly, lz = self.yz
        return ((self.s_sum >= 2 * self.n)
                & (self.s_sum < (1 << 22))
                & (lz[None] <= self.n))


def pack_blocks(u: jnp.ndarray, N: int, pitch: int) -> jnp.ndarray:
    """(C, N, L) per-tet blocks -> (C/2, N, L) paired blocks.

    Even cells become the A half (copied through); odd cells are
    point-reflected ((x,y,z) -> (n-x, n-y, n-z)) into the upper corner.
    Values outside each tet are don't-care; the pack simply adds the
    reflected block (outside-tet entries of either half may overlap only
    on don't-care positions, which the masks ignore)."""
    C = u.shape[0]
    a = u[0::2]
    b = u[1::2]
    g = b.reshape(-1, N, N, pitch)
    g = g[:, ::-1, ::-1, :]                      # flip x, y
    gz = g[..., N - 1::-1]                       # flip z within the tet range
    g = jnp.concatenate([gz, g[..., N:]], axis=-1) if pitch > N else gz
    b_ref = g.reshape(-1, N, N * pitch)
    plan = PairPlan(N, pitch)
    ma = jnp.asarray(plan.in_a, dtype=u.dtype)
    mb = jnp.asarray(plan.in_b, dtype=u.dtype)
    return a * ma[None] + b_ref * mb[None]


def unpack_blocks(up: jnp.ndarray, N: int, pitch: int) -> jnp.ndarray:
    """(C/2, N, L) paired blocks -> (C, N, L) per-tet blocks (masked)."""
    plan = PairPlan(N, pitch)
    ma = jnp.asarray(plan.in_a, dtype=up.dtype)
    mb = jnp.asarray(plan.in_b, dtype=up.dtype)
    a = up * ma[None]
    bstored = up * mb[None]
    g = bstored.reshape(-1, N, N, pitch)
    g = g[:, ::-1, ::-1, :]
    gz = g[..., N - 1::-1]
    g = jnp.concatenate([gz, g[..., N:]], axis=-1) if pitch > N else gz
    b = g.reshape(-1, N, N * pitch)
    C2 = up.shape[0]
    out = jnp.zeros((2 * C2,) + up.shape[1:], dtype=up.dtype)
    out = out.at[0::2].set(a)
    out = out.at[1::2].set(b)
    return out
