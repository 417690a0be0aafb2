"""Sparse assembly of matrix-free operators + direct coarse solves.

Analog of the reference's SparseMatrixProxy / PETSc bridge
(reference: src/hyteg/sparseassembly/SparseMatrixProxy.hpp:34-61,
src/hyteg/petsc/PETScLUSolver.hpp): any elementwise operator is assembled
into a scipy CSR matrix from its per-class element matrices and the global
DoF numbering, entirely on host. The factorized coarse solve is exposed to
jitted solvers via ``jax.pure_callback`` (the agglomerated-coarse-grid
analog: the coarse problem is small, the host does a sparse LU once).
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sps
import scipy.sparse.linalg as spla

import jax
import jax.numpy as jnp

from ..indexing import micro


def assemble_p1_csr(op, bc=None) -> sps.csr_matrix:
    """Assemble a P1ElementwiseOperator into CSR (global DoF numbering)."""
    space = op.space
    storage = space.storage
    dim, n = space.dim, space.n
    offs = micro.offsets(dim)
    elmats = np.asarray(op.elmats, dtype=np.float64)  # (C, T, nv, nv)
    ndof = space.num_global_dofs()
    rows, cols, vals = [], [], []
    for shard in range(storage.num_shards):
        gids = space.global_ids_grid(shard)
        lo = shard * storage.cells_per_shard
        for c in range(storage.cells_per_shard):
            if not storage.cell_valid[lo + c]:
                continue
            for t in range(offs.shape[0]):
                bases = np.argwhere(micro.elem_base_mask(space.level, t, dim))
                if bases.size == 0:
                    continue
                ids = np.stack(
                    [
                        gids[(c,) + tuple((bases + offs[t, a]).T)]
                        for a in range(dim + 1)
                    ],
                    axis=1,
                )  # (nb, nv)
                el = elmats[c, t]  # (nv, nv)
                nb = ids.shape[0]
                rows.append(np.repeat(ids, dim + 1, axis=1).ravel())
                cols.append(np.tile(ids, (1, dim + 1)).ravel())
                vals.append(np.tile(el.ravel(), nb))
    A = sps.coo_matrix(
        (np.concatenate(vals), (np.concatenate(rows), np.concatenate(cols))),
        shape=(ndof, ndof),
    )
    return A.tocsr()


def assemble_p2_csr(op) -> sps.csr_matrix:
    """Assemble a P2ElementwiseOperator into CSR."""
    from ..operators.p2_elementwise import p2_node_offsets

    space = op.space
    storage = space.storage
    dim, n = space.dim, space.n
    node_offs = p2_node_offsets(dim)
    offs_cnt = node_offs.shape[1]
    elmats = np.asarray(op.elmats, dtype=np.float64)
    ndof = space.num_global_dofs()
    rows, cols, vals = [], [], []
    for shard in range(storage.num_shards):
        gids = space.global_ids_grid(shard)
        lo = shard * storage.cells_per_shard
        for c in range(storage.cells_per_shard):
            if not storage.cell_valid[lo + c]:
                continue
            for t in range(node_offs.shape[0]):
                bases = np.argwhere(
                    micro.elem_base_mask(space.level, t, dim)[
                        (slice(0, n),) * dim
                    ]
                )
                if bases.size == 0:
                    continue
                ids = np.stack(
                    [
                        gids[(c,) + tuple((2 * bases + node_offs[t, A]).T)]
                        for A in range(offs_cnt)
                    ],
                    axis=1,
                )
                el = elmats[c, t]
                nb = ids.shape[0]
                rows.append(np.repeat(ids, offs_cnt, axis=1).ravel())
                cols.append(np.tile(ids, (1, offs_cnt)).ravel())
                vals.append(np.tile(el.ravel(), nb))
    A = sps.coo_matrix(
        (np.concatenate(vals), (np.concatenate(rows), np.concatenate(cols))),
        shape=(ndof, ndof),
    )
    return A.tocsr()


def dirichlet_reduced(A: sps.csr_matrix, inner_mask: np.ndarray):
    """A restricted to inner x inner (Dirichlet elimination helper)."""
    idx = np.nonzero(inner_mask)[0]
    return A[np.ix_(idx, idx)], idx


class DirectCoarseSolver:
    """Sparse-LU coarse solve callable from inside jit via pure_callback
    (reference: PETScLUSolver used as the GMG coarse solver)."""

    def __init__(self, op, bc=None, kind: str = "p1"):
        space = op.space
        A = assemble_p1_csr(op) if kind == "p1" else assemble_p2_csr(op)
        m = space.maps if kind == "p1" else space.node_space.maps
        ndof = space.num_global_dofs()
        inner = np.ones(ndof, dtype=bool)
        # interface DoFs with nonzero mesh flag are Dirichlet under the
        # default all-Dirichlet BC; refine later for custom BCs
        from ..core.types import BoundaryCondition, DoFType

        bc = bc or BoundaryCondition.all_dirichlet()
        for g in range(m.num_ifc):
            dt = bc.doftype_of(int(m.ifc_meshflag[g]))
            if dt == DoFType.DIRICHLET:
                inner[g] = False
        Ared, self.idx = dirichlet_reduced(A, inner)
        self.lu = spla.splu(Ared.tocsc())
        self.space = space
        self.kind = kind
        self.ndof = ndof
        self._gids = (
            space.global_ids(0) if kind == "p1" else space.global_ids(0)
        )

    def _to_vec(self, blocks: np.ndarray) -> np.ndarray:
        out = np.zeros(self.ndof, dtype=np.float64)
        sel = self._gids >= 0
        out[self._gids[sel]] = blocks[sel]
        return out

    def _to_blocks(self, vec: np.ndarray) -> np.ndarray:
        out = np.zeros(self._gids.shape, dtype=np.float32)
        sel = self._gids >= 0
        out[sel] = vec[self._gids[sel]]
        return out

    def _solve_host(self, b_blocks) -> np.ndarray:
        bv = self._to_vec(np.asarray(b_blocks, dtype=np.float64))
        x = np.zeros(self.ndof)
        x[self.idx] = self.lu.solve(bv[self.idx])
        return self._to_blocks(x)

    def __call__(self, b, x0=None):
        """Solve A x = b (inner rows; Dirichlet rows of the result are 0 —
        add the BC values from x0 afterwards if needed)."""
        shape = jax.ShapeDtypeStruct(b.shape, jnp.float32)
        x = jax.pure_callback(self._solve_host, shape, b)
        if x0 is not None:
            # keep x0's Dirichlet rows
            from ..core.types import FLAG_INNER

            sp = self.space if self.kind == "p1" else self.space
            x = sp.restore_rows(x, x0, FLAG_INNER, None)
        return x
