"""Per-macro-cell error indicators + Dörfler marking.

Reference: src/hyteg/adaptiverefinement/error_estimator.hpp:40. The
reference estimates per-macro error from hierarchical residuals; here the
default indicator is the scaled gradient-energy per macro cell

    eta_c^2 = h_c * sum_{K in c} |grad u|_K|^2 |K|

which concentrates refinement where the solution varies fastest.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..indexing import micro


def macro_gradient_indicator(p1_space, u, sd=None) -> np.ndarray:
    """(C_valid_order,) indicator per macro cell (padding cells get 0)."""
    sp = p1_space
    sd = sp.resolve_sd(sd)
    dim, n = sp.dim, sp.n
    verts = np.asarray(sd.cell_vertices)[..., :dim]
    J = verts[:, 1:, :] - verts[:, :1, :]
    det = np.abs(np.linalg.det(J))
    valid = np.asarray(sd.cell_valid, dtype=bool)
    JTinv = np.zeros_like(J)
    JTinv[valid] = np.linalg.inv(np.transpose(J[valid], (0, 2, 1)))
    offs = micro.offsets(dim)
    T = offs.shape[0]
    vol = det / (2.0 if dim == 2 else 6.0) / (n ** dim)
    h = det ** (1.0 / dim)

    u = np.asarray(u)
    if dim == 3:  # flat (C, N, lanes) -> grid (C, N, N, N) for host slicing
        from ..indexing import flat

        u = flat.unflatten_field(u, sp.N, sp.pitch)
    eta2 = np.zeros(u.shape[0])
    for t in range(T):
        # element-local vertex reads (strided views of the node grid)
        reads = []
        for k in range(offs.shape[1]):
            o = offs[t, k]
            sl = (slice(None),) + tuple(slice(int(o[d]), int(o[d]) + n)
                                        for d in range(dim))
            reads.append(u[sl])
        du = np.stack([reads[k + 1] - reads[0] for k in range(dim)], axis=-1)
        # u = u0 + sum_k du_k mu_k,  mu = Minv (n lam - base - O0),
        # lam = JTinv (x - v0)  =>  d mu_k / dx_f = n Minv[k,d] JTinv[d,f]
        M = (offs[t, 1:] - offs[t, :1]).astype(np.float64)
        Minv = np.linalg.inv(M.T)
        G = n * np.einsum("kd,cdf->ckf", Minv, JTinv)  # (C, k, f)
        g = np.einsum("c...k,ckf->c...f", du, G)
        mask = micro.elem_base_mask(sp.level, t, dim)[
            tuple(slice(0, n) for _ in range(dim))]
        eta2 += ((g ** 2).sum(-1) * mask).reshape(u.shape[0], -1).sum(-1) * vol
    eta2 *= h
    eta2[~valid] = 0.0
    return np.sqrt(eta2)


def mark_dorfler(eta: np.ndarray, frac: float = 0.5) -> np.ndarray:
    """Smallest element set carrying ``frac`` of the total indicator mass
    (Dörfler/bulk marking). Returns sorted element indices."""
    order = np.argsort(eta)[::-1]
    csum = np.cumsum(eta[order] ** 2)
    total = csum[-1]
    if total <= 0:
        return np.array([], dtype=np.int64)
    k = int(np.searchsorted(csum, frac * total)) + 1
    return np.sort(order[:k])
