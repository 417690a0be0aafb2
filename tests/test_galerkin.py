"""Galerkin-product verification: R A_f P == A_c for nested P1 spaces.

Reference: SparseMatrixProxy::createFromMatrixProduct
(src/hyteg/sparseassembly/SparseMatrixProxy.hpp:34-61) is used to verify
P/R consistency by comparing the triple product R*A*P against the directly
assembled coarse operator; for linear P1 prolongation on nested simplicial
grids the variational coarse operator equals the assembled one exactly.
"""

import numpy as np

import jax.numpy as jnp

from hyteg_tpu.core.types import BoundaryCondition
from hyteg_tpu.functions.p1 import P1Space
from hyteg_tpu.io.sparse import assemble_p1_csr
from hyteg_tpu.mesh import meshinfo as mi
from hyteg_tpu.operators import forms
from hyteg_tpu.operators.p1_elementwise import P1ElementwiseOperator
from hyteg_tpu.operators.transfer import P1Transfer
from hyteg_tpu.primitives.storage import CellStorage


def _transfer_matrices(coarse: P1Space, fine: P1Space):
    """Dense P (prolongation) and R (restriction) matrices by acting on
    basis vectors through the matrix-free transfer."""
    tr = P1Transfer(coarse, fine)
    nc, nf = coarse.num_global_dofs(), fine.num_global_dofs()
    gid_c, gid_f = coarse.global_ids(0), fine.global_ids(0)
    sel_c, sel_f = gid_c >= 0, gid_f >= 0

    def to_blocks(space, gids, sel, vec):
        out = np.zeros(space.block_shape, dtype=np.float32)
        out[sel] = vec[gids[sel]]
        return jnp.asarray(out)

    def from_blocks(n, gids, sel, blocks):
        vec = np.zeros(n)
        vec[gids[sel]] = np.asarray(blocks)[sel]
        return vec

    P = np.zeros((nf, nc))
    for j in range(nc):
        e = np.zeros(nc)
        e[j] = 1.0
        uc = to_blocks(coarse, gid_c, sel_c, e)
        P[:, j] = from_blocks(nf, gid_f, sel_f, tr.prolongate(uc))
    R = np.zeros((nc, nf))
    sd_f = fine.resolve_sd(BoundaryCondition.all_dirichlet())
    sd_c = coarse.resolve_sd(BoundaryCondition.all_dirichlet())
    for j in range(nf):
        e = np.zeros(nf)
        e[j] = 1.0
        uf = to_blocks(fine, gid_f, sel_f, e)
        R[:, j] = from_blocks(nc, gid_c, sel_c, tr.restrict(uf, sd_f, sd_c))
    return P, R


def test_galerkin_product_matches_coarse_assembly():
    storage = CellStorage(mi.mesh_unit_cube(1), num_shards=1)
    lc, lf = 1, 2
    pitch = (1 << lf) + 1
    coarse = P1Space(storage, lc, pitch=pitch)
    fine = P1Space(storage, lf, pitch=pitch)
    P, R = _transfer_matrices(coarse, fine)

    # R is the transpose of P (variational restriction)
    assert np.allclose(R, P.T, atol=1e-6)

    Af = assemble_p1_csr(P1ElementwiseOperator(fine, forms.laplace_form))
    Ac = assemble_p1_csr(P1ElementwiseOperator(coarse, forms.laplace_form))
    Ag = R @ (Af.toarray() @ P)
    assert np.allclose(Ag, Ac.toarray(), rtol=1e-4, atol=1e-5)


def test_galerkin_product_2d():
    storage = CellStorage(mi.mesh_rectangle((0, 0), (1, 1), 1, 1),
                          num_shards=1)
    lc, lf = 1, 2
    coarse = P1Space(storage, lc)
    fine = P1Space(storage, lf)
    P, R = _transfer_matrices(coarse, fine)
    assert np.allclose(R, P.T, atol=1e-6)
    Af = assemble_p1_csr(P1ElementwiseOperator(fine, forms.laplace_form))
    Ac = assemble_p1_csr(P1ElementwiseOperator(coarse, forms.laplace_form))
    Ag = R @ (Af.toarray() @ P)
    assert np.allclose(Ag, Ac.toarray(), rtol=1e-4, atol=1e-5)
