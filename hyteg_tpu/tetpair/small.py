"""Small-space halo exchange for the paired-tet path.

Operates entirely on compact face arrays (O(C * N^2) data, a few MB) —
the canonical-frame face pairing, edge and vertex accumulation of the
reference's dimension-ordered halo protocol
(reference: src/hyteg/communication/BufferedCommunication.hpp:119 and the
additive PackInfos), with the metadata and triangle-symmetry transforms
reused from functions/ifc_dense.py.

Data flow per apply:

    kernel face outputs (stored-coords layouts)
      -> per-cell own-coords planes (C, 4, N, N)     [B halves flipped]
      -> canon faces, pair-sum over macro faces
      -> edge lines from face borders, flip-canon, segment-sum
      -> vertex corners, segment-sum
      -> reassembled per-cell planes (borders overwritten with edge/vert
         sums, so every plane is fully consistent)
      -> kernel face input layouts
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..functions.ifc_dense import DenseIfc, _apply_seq, _transform_sequences

def _canon_grouped(ifc: DenseIfc, rows: jnp.ndarray,
                   inverse: bool) -> jnp.ndarray:
    """Map (R, N, N) face rows to (or from) their macro-face canonical
    frame. Unlike DenseIfc._canon_faces this never materializes all six
    symmetry variants — rows are statically grouped by their permutation
    id and each group gets exactly its own transform (static takes, one
    transform per group). With sorted-vertex storages every permutation is
    the identity and this is a no-op (primitives/topology.py)."""
    ident = ifc.perms.index((0, 1, 2))
    if bool(np.all(ifc.face_perm_id == ident)):
        return rows
    order = []
    parts_idx = []
    for pid in range(6):
        ridx = np.where(ifc.face_perm_id == pid)[0]
        if ridx.size:
            parts_idx.append((pid, ridx))
            order.append(ridx)
    order = np.concatenate(order)
    inv = np.empty_like(order)
    inv[order] = np.arange(order.shape[0])
    W = ifc.shear_W
    seqs = _transform_sequences(ifc.N)
    parts = []
    for pid, ridx in parts_idx:
        perm = ifc.perms[pid]
        seq, iseq = seqs[perm]
        use = iseq if inverse else seq
        parts.append(_apply_seq(rows[jnp.asarray(ridx)], use, W))
    out = jnp.concatenate(parts, axis=0)
    return jnp.take(out, jnp.asarray(inv), axis=0)


# face lf border -> local edge index (edges ordered as _LOCAL_EDGES_3D)
_P0_EDGE = (4, 2, 2, 1)   # border p = 0, line parametrized by q
_Q0_EDGE = (3, 1, 0, 0)   # border q = 0, line parametrized by p
_DG_EDGE = (5, 5, 4, 3)   # border p + q = n, line parametrized by q
_LOCAL_FACES = ((1, 2, 3), (0, 2, 3), (0, 1, 3), (0, 1, 2))
# corner (vertex weight-1 point) -> (p, q) position in face params


def faces_to_planes(xfo, yfo, zfo, dfo, N: int, P: int) -> jnp.ndarray:
    """Kernel face layouts -> (C, 4, N, N) own-coords planes.

    C = 2 * Cp with cells interleaved (even = A half, odd = B half);
    planes follow the DenseIfc convention: face[p, q] <-> barycentric
    weights (n-p-q, p, q) over the face's ordered local vertex triple."""
    Cp = xfo.shape[0]

    def grid(a):  # (Cp, L) -> (Cp, N, N)
        return a.reshape(Cp, N, P)[:, :, :N]

    fa = jnp.stack(
        [grid(dfo[:, 0]), grid(xfo[:, 0]), yfo[:, 0, :, :N], zfo[:, 0]],
        axis=1)
    flip = lambda a: a[:, ::-1, ::-1]
    fb = jnp.stack(
        [flip(grid(dfo[:, 1])), flip(grid(xfo[:, 1])),
         flip(yfo[:, 1, :, :N]), flip(zfo[:, 1])],
        axis=1)
    return jnp.stack([fa, fb], axis=1).reshape(2 * Cp, 4, N, N)


def planes_to_faces(planes, N: int, P: int):
    """(C, 4, N, N) own-coords planes -> kernel face layouts."""
    C = planes.shape[0]
    Cp = C // 2
    L = N * P

    def lanes(a):  # (Cp, N, N) -> (Cp, L)
        pad = jnp.zeros((Cp, N, P - N), dtype=a.dtype)
        g = jnp.concatenate([a, pad], axis=-1) if P > N else a
        return g.reshape(Cp, L)

    pa = planes[0::2]
    pb_own = planes[1::2]
    flip = lambda a: a[:, ::-1, ::-1]
    pb = jnp.stack([flip(pb_own[:, k]) for k in range(4)], axis=1)

    xf = jnp.stack([lanes(pa[:, 1]), lanes(pb[:, 1])], axis=1)
    df = jnp.stack([lanes(pa[:, 0]), lanes(pb[:, 0])], axis=1)

    def ypad(a):  # (Cp, N, N) -> (Cp, N, P)
        if P == N:
            return a
        return jnp.concatenate(
            [a, jnp.zeros((Cp, N, P - N), dtype=a.dtype)], axis=-1)

    yf = jnp.stack([ypad(pa[:, 2]), ypad(pb[:, 2])], axis=1)
    zf = jnp.stack([pa[:, 3], pb[:, 3]], axis=1)
    return xf, yf, zf, df


def _diag_mask(N: int) -> np.ndarray:
    p, q = np.meshgrid(np.arange(N), np.arange(N), indexing="ij")
    return (p + q == N - 1).astype(np.float32)


def _edges_from_planes(planes, N: int) -> jnp.ndarray:
    """(C, 6, N) edge lines (param = weight of the edge's second vertex)."""
    f0, f1, f2, f3 = (planes[:, k] for k in range(4))
    dm = jnp.asarray(_diag_mask(N), dtype=planes.dtype)
    # dg(f)[t] = f[n-t, t]: mask-and-reduce (no gathers)
    dg = lambda f: jnp.sum(f * dm[None], axis=1)
    e01 = f2[:, :, 0]
    e02 = f1[:, :, 0]
    e03 = f1[:, 0, :]
    e12 = dg(f3)
    e13 = dg(f2)
    e23 = dg(f1)
    return jnp.stack([e01, e02, e03, e12, e13, e23], axis=1)


def _verts_from_planes(planes, N: int) -> jnp.ndarray:
    n = N - 1
    f1, f2, f3 = planes[:, 1], planes[:, 2], planes[:, 3]
    return jnp.stack(
        [f1[:, 0, 0], f2[:, n, 0], f3[:, 0, n], f1[:, 0, n]], axis=1)


def exchange_planes(ifc: DenseIfc, planes: jnp.ndarray) -> jnp.ndarray:
    """Additive exchange on per-cell face planes: returns planes where
    every position holds the full sum over all sharing cells."""
    N = ifc.N
    n = N - 1
    C = planes.shape[0]

    # faces: canon -> pair sum -> back
    canon = _canon_grouped(ifc, planes.reshape(C * 4, N, N), inverse=False)
    mA = jnp.asarray(np.maximum(ifc.face_members[:, 0], 0))
    mB = jnp.asarray(np.maximum(ifc.face_members[:, 1], 0))
    hasB = jnp.asarray((ifc.face_members[:, 1] >= 0).astype(np.float32))
    summed = (jnp.take(canon, mA, axis=0)
              + jnp.take(canon, mB, axis=0) * hasB[:, None, None])
    back = jnp.take(summed, jnp.asarray(ifc.face_macro), axis=0)
    fsum = _canon_grouped(ifc, back, inverse=True).reshape(C, 4, N, N)

    # edges: flip-canon -> segment sum -> back (flips vanish on
    # sorted-vertex storages)
    edges = _edges_from_planes(planes, N).reshape(C * 6, N)
    any_flip = bool(ifc.edge_flip.any())
    flip = jnp.asarray(ifc.edge_flip)[:, None]
    canon_e = jnp.where(flip, edges[:, ::-1], edges) if any_flip else edges
    esum = jax.ops.segment_sum(canon_e, jnp.asarray(ifc.edge_macro),
                               num_segments=ifc.num_macro_edges)
    eback = jnp.take(esum, jnp.asarray(ifc.edge_macro), axis=0)
    if any_flip:
        eback = jnp.where(flip, eback[:, ::-1], eback)
    eback = eback.reshape(C, 6, N)

    # vertices
    verts = _verts_from_planes(planes, N).reshape(-1)
    vsum = jax.ops.segment_sum(verts, jnp.asarray(ifc.vert_macro),
                               num_segments=ifc.num_macro_verts)
    vback = jnp.take(vsum, jnp.asarray(ifc.vert_macro)).reshape(C, 4)

    # reassemble: overwrite borders with edge sums, corners with vert sums
    # (pure where/concat overlays — no scatter materialization)
    dm = jnp.asarray(_diag_mask(N), dtype=planes.dtype) > 0
    c00 = np.zeros((N, N), dtype=bool)
    c00[0, 0] = True
    cn0 = np.zeros((N, N), dtype=bool)
    cn0[n, 0] = True
    c0n = np.zeros((N, N), dtype=bool)
    c0n[0, n] = True
    c00, cn0, c0n = (jnp.asarray(m) for m in (c00, cn0, c0n))
    out_planes = []
    for lf in range(4):
        pl_ = fsum[:, lf]
        pl_ = jnp.concatenate(
            [eback[:, _P0_EDGE[lf]][:, None, :], pl_[:, 1:, :]], axis=1)
        pl_ = jnp.concatenate(
            [eback[:, _Q0_EDGE[lf]][:, :, None], pl_[:, :, 1:]], axis=2)
        pl_ = jnp.where(dm[None], eback[:, _DG_EDGE[lf]][:, None, :], pl_)
        tri = _LOCAL_FACES[lf]
        pl_ = jnp.where(c00[None], vback[:, tri[0], None, None], pl_)
        pl_ = jnp.where(cn0[None], vback[:, tri[1], None, None], pl_)
        pl_ = jnp.where(c0n[None], vback[:, tri[2], None, None], pl_)
        out_planes.append(pl_)
    return jnp.stack(out_planes, axis=1)
