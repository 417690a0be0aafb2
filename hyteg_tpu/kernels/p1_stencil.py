"""Pallas TPU kernels for the P1 elementwise operator apply/diagonal.

Replaces the reference's generated stencil kernels
(reference: src/constant_stencil_operator/P1generatedKernels/
apply_3D_macrocell_vertexdof_to_vertexdof_replace.cpp:14-60) with a single
VMEM-resident kernel per macro-cell block on the canonical *flat* layout
(C, N, N*pitch) (see indexing/flat.py):

  * one grid step per macro-cell; the src block is DMA'd to VMEM once and
    dst written once -> HBM-bandwidth bound at ~2 x 4 B per grid point
    regardless of the 6 x 16 accumulation passes.
  * micro-element vertex offsets lie in {0,1}^3; a (ox, oy, oz) shift is a
    sublane roll by ox plus a lane roll by oy*pitch + oz. Values aliased by
    the rolls (lane wrap, z crossing a y-row) are always killed by the
    per-class base-region masks: base + offset stays inside the macro-tet,
    where the lane arithmetic is exact.
  * base masks come from x + y + z <= n - margin with the per-lane y+z sum
    prefetched (a huge sentinel on padding lanes z >= N excludes them).
  * read and write rolls are shared across all (class, vertex) pairs — at
    most 8 + 8 rolls total — grouped by write offset.

Falls back to the pure-XLA formulation (operators/p1_elementwise.py) off-TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..indexing import flat, micro


def _phys_bytes(shape, itemsize: int = 4) -> int:
    """Physical VMEM footprint of an array: (8, 128)-tiled f32 layout."""
    sub = -(-shape[-2] // 8) * 8 if len(shape) >= 2 else 8
    lane = -(-shape[-1] // 128) * 128
    lead = int(np.prod(shape[:-2])) if len(shape) > 2 else 1
    return lead * sub * lane * itemsize


def _compiler_params(block_shape, n_arrays: int = 40, grid_rank: int = 1):
    """Raise the Mosaic VMEM budget above the 16 MB default scoped limit.

    The apply kernels keep multiple block-sized arrays live (shared rolls +
    masks + accumulators); budget n_arrays blocks within [16, 100] MB
    (v5e VMEM is 128 MB — leave headroom for pipeline buffers).
    """
    per = _phys_bytes(block_shape)
    budget = min(100 * 1024 * 1024, max(16 * 1024 * 1024, n_arrays * per))
    return pltpu.CompilerParams(
        dimension_semantics=("arbitrary",) * grid_rank,
        vmem_limit_bytes=budget,
    )


def _roll_helpers(N: int, L: int, pitch: int, dim: int):
    def lane_shift(off):
        return int(off[-1]) if dim == 2 else int(off[1]) * pitch + int(off[2])

    def roll_read(v, off):
        """out[p] = v[p + off] (wrap garbage masked by the caller)."""
        ls = lane_shift(off)
        if ls:
            v = pltpu.roll(v, L - ls, axis=1)
        if off[0]:
            v = pltpu.roll(v, N - int(off[0]), axis=0)
        return v

    def roll_write(v, off):
        """out[p + off] = v[p]."""
        ls = lane_shift(off)
        if ls:
            v = pltpu.roll(v, ls, axis=1)
        if off[0]:
            v = pltpu.roll(v, int(off[0]), axis=0)
        return v

    return roll_read, roll_write


def _coeff_combine(creads, mode: str):
    """In-kernel coefficient averaging (see operators/averaging.py)."""
    nv = len(creads)
    if mode == "arithmetic":
        sc = None
        for r in creads:
            sc = r if sc is None else sc + r
        return sc / nv
    if mode == "harmonic":
        sc = None
        for r in creads:
            t = 1.0 / jnp.maximum(r, 1e-30)
            sc = t if sc is None else sc + t
        return nv / sc
    if mode == "geometric":
        sc = None
        for r in creads:
            t = jnp.log(jnp.maximum(r, 1e-30))
            sc = t if sc is None else sc + t
        return jnp.exp(sc / nv)
    raise ValueError(mode)


def _make_kernel_flat(level: int, dim: int, pitch: int, with_coeff: bool,
                      share_rolls: bool, coeff_avg: str = "arithmetic"):
    """Write-offset-grouped flat kernel: <= 8 read-rolls + 8 write-rolls
    (shared across classes) instead of per-(class, vertex) rolls."""
    n = 1 << level
    N = n + 1
    L = N * pitch if dim == 3 else N
    offs = micro.offsets(dim)
    margins = micro.base_margin(dim)
    T, nv = offs.shape[0], offs.shape[1]
    all_offsets = sorted(
        {tuple(int(x) for x in offs[t, b]) for t in range(T) for b in range(nv)}
    )
    roll_read, roll_write = _roll_helpers(N, L, pitch, dim)

    # group (t, a) by write offset
    by_write = {o: [] for o in all_offsets}
    for t in range(T):
        for a in range(nv):
            by_write[tuple(int(x) for x in offs[t, a])].append((t, a))

    def kernel(*refs):
        if with_coeff:
            elm_ref, yz_ref, src_ref, coeff_ref, dst_ref = refs
        else:
            elm_ref, yz_ref, src_ref, dst_ref = refs
        c = pl.program_id(0)
        xs = jax.lax.broadcasted_iota(jnp.int32, (N, L), 0)
        s = xs + yz_ref[0, :][None, :]  # x + y + z (sentinel on padding)
        if share_rolls:
            masks = [
                (s <= n - int(margins[t])).astype(dst_ref.dtype)
                for t in range(T)
            ]
            getmask = lambda t: masks[t]
            rolls = {o: roll_read(src_ref[0], o) for o in all_offsets}
            get = lambda o: rolls[o]
        else:
            getmask = lambda t: (s <= n - int(margins[t])).astype(dst_ref.dtype)
            get = lambda o: roll_read(src_ref[0], o)
        if with_coeff:
            if share_rolls:
                crolls = {o: roll_read(coeff_ref[0], o) for o in all_offsets}
                cget = lambda o: crolls[o]
            else:
                cget = lambda o: roll_read(coeff_ref[0], o)
        dst = jnp.zeros((N, L), dtype=dst_ref.dtype)
        for o_w, members in by_write.items():
            acc = None
            for (t, a) in members:
                inner = None
                for b in range(nv):
                    term = elm_ref[c, t * nv * nv + a * nv + b] * get(
                        tuple(int(x) for x in offs[t, b])
                    )
                    inner = term if inner is None else inner + term
                m = getmask(t)
                if with_coeff:
                    creads = [cget(tuple(int(x) for x in offs[t, b]))
                              for b in range(nv)]
                    m = m * _coeff_combine(creads, coeff_avg)
                contrib = m * inner
                acc = contrib if acc is None else acc + contrib
            dst = dst + roll_write(acc, o_w)
        dst_ref[0] = dst

    return kernel, N, L, T, nv


def _yz_prefetch(N: int, pitch: int, dim: int) -> np.ndarray:
    if dim == 2:
        # 2D: lane axis is z itself; the iota sum x + z is formed in-kernel
        # via the prefetched per-lane value
        return np.arange(N, dtype=np.int32).reshape(1, N)
    return flat.yz_sum(N, pitch).reshape(1, N * pitch)


@functools.partial(jax.jit,
                   static_argnames=("level", "dim", "pitch", "coeff_avg"))
def p1_apply_local_pallas_flat(src2d, elmats, level: int, dim: int,
                               pitch: int, coeff=None,
                               coeff_avg: str = "arithmetic"):
    """Flat-lane per-cell apply: src2d (C, N, N*pitch) [3D] or (C, N, N) [2D].

    Equivalent to operators.p1_elementwise.p1_apply_local (partial sums on
    interface rows; the caller runs the additive exchange).
    """
    C = src2d.shape[0]
    n = 1 << level
    N = n + 1
    L = N * pitch if dim == 3 else N
    # share rolls when ~26 live arrays (8 read + 8 write rolls, 6 masks,
    # src/dst/acc) fit in the raised VMEM budget (see _compiler_params)
    share = _phys_bytes((N, L)) * 26 < 90 * 1024 * 1024
    kernel, N, L, T, nv = _make_kernel_flat(level, dim, pitch, coeff is not None,
                                            share, coeff_avg)
    elm_flat = elmats.reshape(C, T * nv * nv).astype(src2d.dtype)
    yzsum = _yz_prefetch(N, pitch, dim)

    blk = (1, N, L)
    idx = lambda c, *_: (c, 0, 0)
    data_spec = pl.BlockSpec(blk, idx, memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((1, L), lambda c, *_: (0, 0), memory_space=pltpu.VMEM),
        data_spec,
    ]
    args = [yzsum, src2d]
    if coeff is not None:
        in_specs.append(data_spec)
        args.append(coeff.astype(src2d.dtype))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(C,), in_specs=in_specs, out_specs=data_spec
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(src2d.shape, src2d.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * T * nv * nv * C * N * L,
            bytes_accessed=C * 4 * N * L * (3 if coeff is not None else 2),
            transcendentals=0,
        ),
        compiler_params=_compiler_params(blk),
    )(elm_flat, *args)


def _make_diag_kernel_flat(level: int, dim: int, pitch: int, lumped: bool,
                           with_coeff: bool, coeff_avg: str = "arithmetic"):
    n = 1 << level
    N = n + 1
    L = N * pitch if dim == 3 else N
    offs = micro.offsets(dim)
    margins = micro.base_margin(dim)
    T, nv = offs.shape[0], offs.shape[1]
    all_offsets = sorted(
        {tuple(int(x) for x in offs[t, b]) for t in range(T) for b in range(nv)}
    )
    roll_read, roll_write = _roll_helpers(N, L, pitch, dim)

    def kernel(*refs):
        if with_coeff:
            elm_ref, yz_ref, coeff_ref, dst_ref = refs
        else:
            elm_ref, yz_ref, dst_ref = refs
        c = pl.program_id(0)
        xs = jax.lax.broadcasted_iota(jnp.int32, (N, L), 0)
        s = xs + yz_ref[0, :][None, :]
        if with_coeff:
            crolls = {o: roll_read(coeff_ref[0], o) for o in all_offsets}
        dst = jnp.zeros((N, L), dtype=dst_ref.dtype)
        for t in range(T):
            mask = (s <= n - int(margins[t])).astype(dst.dtype)
            if with_coeff:
                creads = [crolls[tuple(int(x) for x in offs[t, b])]
                          for b in range(nv)]
                mask = mask * _coeff_combine(creads, coeff_avg)
            for a in range(nv):
                if lumped:
                    w = elm_ref[c, t * nv * nv + a * nv]
                    for b in range(1, nv):
                        w = w + elm_ref[c, t * nv * nv + a * nv + b]
                else:
                    w = elm_ref[c, t * nv * nv + a * nv + a]
                dst = dst + roll_write(w * mask, tuple(offs[t, a]))
        dst_ref[0] = dst

    return kernel, N, L, T, nv


@functools.partial(jax.jit, static_argnames=("level", "dim", "pitch",
                                             "lumped", "coeff_avg"))
def p1_diagonal_local_pallas_flat(elmats, level: int, dim: int, pitch: int,
                                  lumped: bool = False, coeff=None,
                                  coeff_avg: str = "arithmetic"):
    """Per-cell partial (lumped) diagonal on the flat layout."""
    C = elmats.shape[0]
    kernel, N, L, T, nv = _make_diag_kernel_flat(level, dim, pitch, lumped,
                                                 coeff is not None, coeff_avg)
    elm_flat = elmats.reshape(C, T * nv * nv)
    yzsum = _yz_prefetch(N, pitch, dim)

    blk = (1, N, L)
    idx = lambda c, *_: (c, 0, 0)
    data_spec = pl.BlockSpec(blk, idx, memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((1, L), lambda c, *_: (0, 0), memory_space=pltpu.VMEM),
    ]
    args = [yzsum]
    if coeff is not None:
        in_specs.append(data_spec)
        args.append(coeff.astype(elmats.dtype))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(C,), in_specs=in_specs, out_specs=data_spec
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((C, N, L), elmats.dtype),
        compiler_params=_compiler_params(blk),
    )(elm_flat, *args)


@functools.lru_cache(maxsize=1)
def pallas_available() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False
