"""P1 elementwise operators on blended (curved) geometry.

Reference: the blending operator families (p1_diffusion_blending_q3 etc.,
src/hyteg/forms/form_hyteg_generated/) and P2P1ElementwiseBlendingStokes.
Here, blending is isoparametric-P1: the geometry map snaps every
micro-vertex onto the curved domain, and element matrices are computed
per micro-element from the *blended vertex coordinate field* — an exact
matrix-free variable-geometry apply (no stencil tables), evaluated with
the same shifted-dense-op machinery as the affine path. The LSQP surrogate
path (reference: P1SurrogateOperator) approximates this for speed.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..core.types import DoFType, FLAG_INNER
from ..functions.p1 import P1Space
from ..geometry.maps import GeometryMap
from ..indexing import micro
from .p1_elementwise import _class_masks, _shift_read, _shift_write


def blended_coords(space: P1Space, gmap: GeometryMap, shard: int = 0):
    """(C, N..., 3) micro-vertex coordinates on the blended geometry."""
    affine = space.coords(shard)
    ref = jnp.asarray(space._ref_coords, dtype=space.dtype)
    verts = jnp.asarray(space.cell_vertices(shard), dtype=space.dtype)
    return gmap.apply(affine, ref, verts)


def p1_apply_local_vargeom(src, coords, level: int, dim: int, form,
                           pitch: int | None = None):
    """Per-cell apply with per-micro-element geometry.

    coords: (C, N, lanes, 3) blended vertex field; form: (..., nv, dim) ->
    (..., nv, nv) evaluated pointwise over all base positions.
    """
    N = (1 << level) + 1
    pitch = N if (pitch is None or dim == 2) else pitch
    offs = micro.offsets(dim)
    T, nv = offs.shape[0], offs.shape[1]
    masks = _class_masks(level, dim, pitch, str(src.dtype))
    co = coords[..., :dim] if dim == 2 else coords
    dst = jnp.zeros_like(src)
    for t in range(T):
        verts = jnp.stack(
            [_shift_read(co, offs[t, b], pitch, dim, ncomp=1)
             for b in range(nv)],
            axis=-2,
        )  # (C, N, lanes, nv, dim)
        el = form(verts)  # (C, N, lanes, nv, nv)
        reads = [_shift_read(src, offs[t, b], pitch, dim) for b in range(nv)]
        base_mask = jnp.asarray(masks[t]) > 0
        for a in range(nv):
            acc = el[..., a, 0] * reads[0]
            for b in range(1, nv):
                acc = acc + el[..., a, b] * reads[b]
            # where (not *): el is NaN on padding elements (degenerate
            # zero-coordinate reads) and NaN * 0 would poison the result
            acc = jnp.where(base_mask, acc, 0.0)
            dst = dst + _shift_write(acc, offs[t, a], pitch, dim)
    return dst


def p1_diagonal_local_vargeom(coords, level: int, dim: int, form, block_shape,
                              pitch: int | None = None):
    N = (1 << level) + 1
    pitch = N if (pitch is None or dim == 2) else pitch
    offs = micro.offsets(dim)
    T, nv = offs.shape[0], offs.shape[1]
    masks = _class_masks(level, dim, pitch, "float32")
    co = coords[..., :dim] if dim == 2 else coords
    dst = jnp.zeros(block_shape, dtype=coords.dtype)
    for t in range(T):
        verts = jnp.stack(
            [_shift_read(co, offs[t, b], pitch, dim, ncomp=1)
             for b in range(nv)],
            axis=-2,
        )
        el = form(verts)
        base_mask = jnp.asarray(masks[t]) > 0
        for a in range(nv):
            v = jnp.where(base_mask, el[..., a, a], 0.0)
            dst = dst + _shift_write(v, offs[t, a], pitch, dim)
    return dst


class P1BlendedOperator:
    """Variable-geometry P1 operator (exact, matrix-free)."""

    def __init__(self, space: P1Space, form, gmap: GeometryMap, shard: int = 0):
        self.space = space
        self.form = form
        self.gmap = gmap
        self.shard = shard

    @property
    def coords(self):
        """Blended micro-vertex field, recomputed per trace: materializing
        it eagerly would bake an O(C * N * lanes * 3) constant into every
        jitted program using this operator (34 MB at shell level 3 — large
        enough to kill remote TPU compiles); in-trace it derives from the
        tiny cell-vertex array plus the small reference grid."""
        return blended_coords(self.space, self.gmap, self.shard)

    def apply_raw(self, x, sd=None, axis_name=None):
        sp = self.space
        sd = sp.resolve_sd(sd, self.shard)
        y = p1_apply_local_vargeom(x, self.coords, sp.level, sp.dim,
                                   self.form, sp.pitch)
        return sp.exchange_add(y, sd, axis_name)

    def apply_inner(self, x, sd_or_bc=None, flag: DoFType = FLAG_INNER,
                    axis_name=None):
        sd = self.space.resolve_sd(sd_or_bc, self.shard)
        y = self.apply_raw(x, sd, axis_name)
        return self.space.restore_rows(y, jnp.zeros_like(y), flag, sd)

    def diagonal_raw(self, sd=None, axis_name=None):
        sp = self.space
        sd = sp.resolve_sd(sd, self.shard)
        d = p1_diagonal_local_vargeom(self.coords, sp.level, sp.dim, self.form,
                                      sp.block_shape, sp.pitch)
        return sp.exchange_add(d, sd, axis_name)

    def inverse_diagonal(self, sd=None, axis_name=None):
        d = self.diagonal_raw(sd, axis_name)
        mask = jnp.asarray(self.space.vertex_mask[None], dtype=bool)
        return jnp.where(mask & (d != 0), 1.0 / jnp.where(d == 0, 1.0, d), 0.0)


# ---------------------------------------------------------------------------
# LSQP surrogate operator (reference: src/hyteg/polynomial/LSQPInterpolator,
# P1SurrogateOperator.hpp:36-118): approximate each of the 15 stencil-weight
# fields of the blended operator by a low-degree polynomial in the reference
# coordinates, least-squares fitted — evaluation is pure VPU work.
# ---------------------------------------------------------------------------


def _monomials(dim: int, degree: int) -> list[tuple[int, ...]]:
    import itertools

    return [
        p
        for p in itertools.product(range(degree + 1), repeat=dim)
        if sum(p) <= degree
    ]


class P1SurrogateOperator:
    """Polynomial surrogate of a blended operator's stencil weights.

    The exact per-(class, a, b) weight fields w(x) are sampled on the base
    grid and fitted with total-degree-``degree`` polynomials per cell; apply
    evaluates the polynomials on the fly (Horner-free monomial basis) and
    runs the standard shifted accumulation. computeSurrogateError compares
    against the exact blended apply.
    """

    def __init__(self, space: P1Space, form, gmap: GeometryMap,
                 degree: int = 2, shard: int = 0):
        self.space = space
        self.degree = degree
        self.shard = shard
        dim = space.dim
        self.monos = _monomials(dim, degree)
        coords = blended_coords(space, gmap, shard)
        offs = micro.offsets(dim)
        T, nv = offs.shape[0], offs.shape[1]
        ref = np.asarray(space._ref_coords)  # (N, lanes, dim)
        self._coeffs = []  # per class: (C, n_mono, nv, nv)
        co = coords[..., :dim] if dim == 2 else coords
        for t in range(T):
            verts = jnp.stack(
                [_shift_read(co, offs[t, b], space.pitch, dim, ncomp=1)
                 for b in range(nv)],
                axis=-2,
            )
            el = np.asarray(form(verts))  # (C, N, lanes, nv, nv)
            mask = np.asarray(
                micro.elem_base_mask_flat(space.level, t, dim, space.pitch)
                if dim == 3 else micro.elem_base_mask(space.level, t, dim))
            sel = mask.reshape(-1)
            X = ref.reshape(-1, dim)[sel]  # (nb, dim)
            V = np.stack(
                [np.prod(X ** np.array(m), axis=1) for m in self.monos], axis=1
            )  # (nb, n_mono)
            Y = el.reshape(el.shape[0], -1, nv * nv)[:, sel, :]  # (C, nb, 16)
            pinv = np.linalg.pinv(V)  # (n_mono, nb) least-squares fit
            coefs = np.einsum("mk,ckf->cmf", pinv, Y)  # (C, n_mono, 16)
            self._coeffs.append(
                jnp.asarray(coefs.reshape(coefs.shape[0], len(self.monos), nv, nv),
                            dtype=space.dtype)
            )
        self._mono_fields = jnp.asarray(
            np.stack(
                [np.prod(ref ** np.array(m), axis=-1) for m in self.monos],
                axis=0,
            ),
            dtype=space.dtype,
        )  # (n_mono, N...)

    def apply_raw(self, x, sd=None, axis_name=None):
        sp = self.space
        sd = sp.resolve_sd(sd, self.shard)
        dim = sp.dim
        offs = micro.offsets(dim)
        T, nv = offs.shape[0], offs.shape[1]
        masks = _class_masks(sp.level, dim, sp.pitch, str(x.dtype))
        dst = jnp.zeros_like(x)
        mono = self._mono_fields  # (n_mono, N, lanes)
        for t in range(T):
            # w_ab(x) = sum_m coef[c, m, a, b] * mono[m](x)
            el = jnp.einsum("cmab,m...->c...ab", self._coeffs[t], mono)
            reads = [_shift_read(x, offs[t, b], sp.pitch, dim)
                     for b in range(nv)]
            base_mask = jnp.asarray(masks[t]) > 0
            for a in range(nv):
                acc = el[..., a, 0] * reads[0]
                for b in range(1, nv):
                    acc = acc + el[..., a, b] * reads[b]
                dst = dst + _shift_write(jnp.where(base_mask, acc, 0.0),
                                         offs[t, a], sp.pitch, dim)
        return sp.exchange_add(dst, sd, axis_name)

    def compute_surrogate_error(self, exact_op: P1BlendedOperator, x) -> float:
        """Relative L2 apply error vs the exact blended operator
        (reference: P1SurrogateOperator::computeSurrogateError)."""
        ye = exact_op.apply_raw(x)
        ys = self.apply_raw(x)
        sp = self.space
        num = sp.dot(ye - ys, ye - ys)
        den = sp.dot(ye, ye)
        return jnp.sqrt(num / jnp.maximum(den, 1e-30))
