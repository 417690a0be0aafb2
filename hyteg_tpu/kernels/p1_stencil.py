"""Pallas TPU kernel for the P1 elementwise operator apply.

Replaces the reference's generated stencil kernels
(reference: src/constant_stencil_operator/P1generatedKernels/
apply_3D_macrocell_vertexdof_to_vertexdof_replace.cpp:14-60) with a single
VMEM-resident kernel per macro-cell block:

  * one grid step per macro-cell; src block (N, N, N) is DMA'd to VMEM once
    and dst written once -> the kernel is HBM-bandwidth bound at ~2 x 4 B
    per (dense) grid point regardless of the 6 x 16 accumulation passes.
  * every micro-element vertex offset lies in {0,1}^3, so the 8 shifted
    views are shared across all 6 congruence classes via pltpu.roll; values
    wrapped around by the roll are always killed by the per-class base-region
    masks (base + offset stays inside the macro-tet by construction).
  * base-region masks are computed in-kernel from broadcasted_iota — no mask
    arrays move through HBM.

Falls back to the pure-XLA formulation (operators/p1_elementwise.py) off-TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..indexing import micro


def _phys_bytes(shape, itemsize: int = 4) -> int:
    """Physical VMEM footprint of an array: (8, 128)-tiled f32 layout."""
    sub = -(-shape[-2] // 8) * 8 if len(shape) >= 2 else 8
    lane = -(-shape[-1] // 128) * 128
    lead = int(np.prod(shape[:-2])) if len(shape) > 2 else 1
    return lead * sub * lane * itemsize


def _compiler_params(block_shape, n_arrays: int = 40):
    """Raise the Mosaic VMEM budget above the 16 MB default scoped limit.

    The apply kernels keep up to ~25 block-sized arrays live (shared rolls +
    masks + accumulators); v5e/v5p cores have 128 MB of VMEM, so the default
    16 MB scoped limit is far too conservative and fails at level >= 6
    (N = 65: ~1.2 MB per array). Budget n_arrays blocks, capped at 100 MB.
    """
    per = _phys_bytes(block_shape)
    budget = min(100 * 1024 * 1024, max(32 * 1024 * 1024, n_arrays * per))
    return pltpu.CompilerParams(
        dimension_semantics=("arbitrary",), vmem_limit_bytes=budget
    )


def _roll3(v, off):
    """v shifted so that out[p] = v[p + off] (off in {0,1}^3), wrap garbage
    left in place (masked by the caller). pltpu.roll needs non-negative
    shifts, so roll by (size - off) cyclically."""
    for ax, o in enumerate(off):
        if o:
            v = pltpu.roll(v, v.shape[ax] - o, axis=ax)
    return v


def _unroll3(v, off):
    """out[p + off] = v[p]."""
    for ax, o in enumerate(off):
        if o:
            v = pltpu.roll(v, o, axis=ax)
    return v


def _iota_sum(N: int, dim: int):
    acc = None
    for ax in range(dim):
        i = jax.lax.broadcasted_iota(jnp.int32, (N,) * dim, ax)
        acc = i if acc is None else acc + i
    return acc


def _make_kernel(level: int, dim: int, with_coeff: bool):
    n = 1 << level
    N = n + 1
    offs = micro.offsets(dim)  # (T, nv, dim)
    margins = micro.base_margin(dim)
    T, nv = offs.shape[0], offs.shape[1]
    all_offsets = sorted({tuple(int(x) for x in offs[t, b]) for t in range(T) for b in range(nv)})

    # VMEM pressure: compute the shifted views per congruence class (<= nv
    # live at a time) and accumulate straight into the output ref — keeping
    # all 8 shifted copies live for the whole kernel OOMs scoped vmem at
    # N >= 33.
    def kernel(*refs):
        if with_coeff:
            elm_ref, src_ref, coeff_ref, dst_ref = refs
        else:
            elm_ref, src_ref, dst_ref = refs
        c = pl.program_id(0)
        s = _iota_sum(N, dim)
        dst_ref[0] = jnp.zeros((N,) * dim, dtype=dst_ref.dtype)
        for t in range(T):
            mask = (s <= n - int(margins[t])).astype(dst_ref.dtype)
            if with_coeff:
                scale = _roll3(coeff_ref[0], tuple(offs[t, 0]))
                for b in range(1, nv):
                    scale = scale + _roll3(coeff_ref[0], tuple(offs[t, b]))
                mask = mask * (scale / nv)
            for a in range(nv):
                acc = elm_ref[c, t * nv * nv + a * nv] * _roll3(
                    src_ref[0], tuple(offs[t, 0])
                )
                for b in range(1, nv):
                    acc = acc + elm_ref[c, t * nv * nv + a * nv + b] * _roll3(
                        src_ref[0], tuple(offs[t, b])
                    )
                dst_ref[0] = dst_ref[0] + _unroll3(acc * mask, tuple(offs[t, a]))

    return kernel, N, T, nv


@functools.partial(jax.jit, static_argnames=("level", "dim"))
def p1_apply_local_pallas(src, elmats, level: int, dim: int, coeff=None):
    """Per-cell partial operator apply — Pallas TPU path.

    src: (C, N,...); elmats: (C, T, nv, nv); coeff: optional (C, N,...).
    Equivalent to operators.p1_elementwise.p1_apply_local.
    """
    C = src.shape[0]
    kernel, N, T, nv = _make_kernel(level, dim, coeff is not None)
    elm_flat = elmats.reshape(C, T * nv * nv).astype(src.dtype)

    blk = (1,) + (N,) * dim
    idx = lambda c, e: (c,) + (0,) * dim
    data_spec = pl.BlockSpec(blk, idx, memory_space=pltpu.VMEM)
    in_specs = [data_spec]
    args = [src]
    if coeff is not None:
        in_specs.append(data_spec)
        args.append(coeff.astype(src.dtype))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(C,),
        in_specs=in_specs,
        out_specs=data_spec,
    )
    bytes_per = 4 * N**dim
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(src.shape, src.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * T * nv * nv * C * N**dim,
            bytes_accessed=C * bytes_per * (3 if coeff is not None else 2),
            transcendentals=0,
        ),
        compiler_params=_compiler_params(blk),
    )(elm_flat, *args)


def _make_diag_kernel(level: int, dim: int, lumped: bool, with_coeff: bool):
    n = 1 << level
    N = n + 1
    offs = micro.offsets(dim)
    margins = micro.base_margin(dim)
    T, nv = offs.shape[0], offs.shape[1]
    all_offsets = sorted(
        {tuple(int(x) for x in offs[t, b]) for t in range(T) for b in range(nv)}
    )

    def kernel(*refs):
        if with_coeff:
            elm_ref, coeff_ref, dst_ref = refs
        else:
            elm_ref, dst_ref = refs
        c = pl.program_id(0)
        if with_coeff:
            co = coeff_ref[0]
            crolls = {o: _roll3(co, o) for o in all_offsets}
        s = _iota_sum(N, dim)
        dst = jnp.zeros((N,) * dim, dtype=dst_ref.dtype)
        for t in range(T):
            mask = (s <= n - int(margins[t])).astype(dst.dtype)
            if with_coeff:
                scale = crolls[tuple(offs[t, 0])]
                for b in range(1, nv):
                    scale = scale + crolls[tuple(offs[t, b])]
                mask = mask * (scale / nv)
            for a in range(nv):
                if lumped:
                    w = elm_ref[c, t * nv * nv + a * nv]
                    for b in range(1, nv):
                        w = w + elm_ref[c, t * nv * nv + a * nv + b]
                else:
                    w = elm_ref[c, t * nv * nv + a * nv + a]
                dst = dst + _unroll3(w * mask, tuple(offs[t, a]))
        dst_ref[0] = dst

    return kernel, N, T, nv


@functools.partial(jax.jit, static_argnames=("level", "dim", "lumped"))
def p1_diagonal_local_pallas(elmats, level: int, dim: int, lumped: bool = False,
                             coeff=None):
    """Per-cell partial (lumped) diagonal — Pallas TPU path."""
    C = elmats.shape[0]
    kernel, N, T, nv = _make_diag_kernel(level, dim, lumped, coeff is not None)
    elm_flat = elmats.reshape(C, T * nv * nv)

    blk = (1,) + (N,) * dim
    idx = lambda c, e: (c,) + (0,) * dim
    data_spec = pl.BlockSpec(blk, idx, memory_space=pltpu.VMEM)
    in_specs = []
    args = []
    if coeff is not None:
        in_specs.append(data_spec)
        args.append(coeff.astype(elmats.dtype))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(C,), in_specs=in_specs, out_specs=data_spec
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((C,) + (N,) * dim, elmats.dtype),
        compiler_params=_compiler_params(blk),
    )(elm_flat, *args)


# ---------------------------------------------------------------------------
# flat-lane variant: blocks (C, N, N*N) — last dim nearly fully packs the
# 128-lane tiles (the (N, N, N) layout pads N -> 128 lanes, wasting ~4x
# bandwidth and VPU width at N=33). Shifts become lane rolls by oz + oy*N;
# roll wrap-around garbage is masked by the class base-region masks exactly
# as in the 3D variant (base + offset leaves the tet region -> masked).
# ---------------------------------------------------------------------------


def _make_kernel_flat(level: int, dim: int, with_coeff: bool):
    n = 1 << level
    N = n + 1
    NN = N * N if dim == 3 else N
    offs = micro.offsets(dim)
    margins = micro.base_margin(dim)
    T, nv = offs.shape[0], offs.shape[1]

    def lane_shift(off):
        return int(off[-1]) if dim == 2 else int(off[1]) * N + int(off[2])

    def roll_read(v, off):
        ls = lane_shift(off)
        if ls:
            v = pltpu.roll(v, NN - ls, axis=1)
        if off[0]:
            v = pltpu.roll(v, N - int(off[0]), axis=0)
        return v

    def roll_write(v, off):
        ls = lane_shift(off)
        if ls:
            v = pltpu.roll(v, ls, axis=1)
        if off[0]:
            v = pltpu.roll(v, int(off[0]), axis=0)
        return v

    def kernel(*refs):
        if with_coeff:
            elm_ref, yz_ref, src_ref, coeff_ref, dst_ref = refs
        else:
            elm_ref, yz_ref, src_ref, dst_ref = refs
        c = pl.program_id(0)
        # S(x, flat) = x + y + z
        xs = jax.lax.broadcasted_iota(jnp.int32, (N, NN), 0)
        if dim == 3:
            s = xs + yz_ref[0, :][None, :]
        else:
            s = xs + jax.lax.broadcasted_iota(jnp.int32, (N, NN), 1)
        dst_ref[0] = jnp.zeros((N, NN), dtype=dst_ref.dtype)
        for t in range(T):
            mask = (s <= n - int(margins[t])).astype(dst_ref.dtype)
            if with_coeff:
                scale = roll_read(coeff_ref[0], offs[t, 0])
                for b in range(1, nv):
                    scale = scale + roll_read(coeff_ref[0], offs[t, b])
                mask = mask * (scale / nv)
            for a in range(nv):
                acc = elm_ref[c, t * nv * nv + a * nv] * roll_read(
                    src_ref[0], offs[t, 0]
                )
                for b in range(1, nv):
                    acc = acc + elm_ref[c, t * nv * nv + a * nv + b] * roll_read(
                        src_ref[0], offs[t, b]
                    )
                dst_ref[0] = dst_ref[0] + roll_write(acc * mask, offs[t, a])

    return kernel, N, NN, T, nv


@functools.partial(jax.jit, static_argnames=("level", "dim"))
def p1_apply_local_pallas_flat(src2d, elmats, level: int, dim: int, coeff=None):
    """Flat-lane per-cell apply: src2d (C, N, N*N) [3D] or (C, N, N) [2D]."""
    C = src2d.shape[0]
    kernel, N, NN, T, nv = _make_kernel_flat(level, dim, coeff is not None)
    elm_flat = elmats.reshape(C, T * nv * nv).astype(src2d.dtype)
    yzsum = (
        np.add.outer(np.arange(N), np.arange(N)).reshape(-1).astype(np.int32)
        if dim == 3
        else np.zeros(NN, np.int32)
    )

    blk = (1, N, NN)
    idx = lambda c, *_: (c, 0, 0)
    data_spec = pl.BlockSpec(blk, idx, memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((1, NN), lambda c, *_: (0, 0), memory_space=pltpu.VMEM),
        data_spec,
    ]
    args = [yzsum.reshape(1, NN), src2d]
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
            flops=2 * T * nv * nv * C * N * NN,
            bytes_accessed=C * 4 * N * NN * (3 if coeff is not None else 2),
            transcendentals=0,
        ),
        compiler_params=_compiler_params(blk),
    )(elm_flat, *args)


def _make_kernel_flat_v2(level: int, dim: int, with_coeff: bool, share_rolls: bool):
    """Write-offset-grouped flat kernel: 7 read-rolls + 7 write-rolls total
    (shared across classes) instead of per-(class, vertex) rolls."""
    n = 1 << level
    N = n + 1
    NN = N * N if dim == 3 else N
    offs = micro.offsets(dim)
    margins = micro.base_margin(dim)
    T, nv = offs.shape[0], offs.shape[1]
    all_offsets = sorted(
        {tuple(int(x) for x in offs[t, b]) for t in range(T) for b in range(nv)}
    )

    def lane_shift(off):
        return int(off[-1]) if dim == 2 else int(off[1]) * N + int(off[2])

    def roll_read(v, off):
        ls = lane_shift(off)
        if ls:
            v = pltpu.roll(v, NN - ls, axis=1)
        if off[0]:
            v = pltpu.roll(v, N - int(off[0]), axis=0)
        return v

    def roll_write(v, off):
        ls = lane_shift(off)
        if ls:
            v = pltpu.roll(v, ls, axis=1)
        if off[0]:
            v = pltpu.roll(v, int(off[0]), axis=0)
        return v

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
        xs = jax.lax.broadcasted_iota(jnp.int32, (N, NN), 0)
        if dim == 3:
            s = xs + yz_ref[0, :][None, :]
        else:
            s = xs + jax.lax.broadcasted_iota(jnp.int32, (N, NN), 1)
        if share_rolls:
            masks = [
                (s <= n - int(margins[t])).astype(dst_ref.dtype)
                for t in range(T)
            ]
            getmask = lambda t: masks[t]
        else:
            getmask = lambda t: (s <= n - int(margins[t])).astype(dst_ref.dtype)
        if share_rolls:
            rolls = {o: roll_read(src_ref[0], o) for o in all_offsets}
            get = lambda o: rolls[o]
        else:
            get = lambda o: roll_read(src_ref[0], o)
        if with_coeff:
            if share_rolls:
                crolls = {o: roll_read(coeff_ref[0], o) for o in all_offsets}
                cget = lambda o: crolls[o]
            else:
                cget = lambda o: roll_read(coeff_ref[0], o)
        dst = jnp.zeros((N, NN), dtype=dst_ref.dtype)
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
                    sc = None
                    for b in range(nv):
                        r = cget(tuple(int(x) for x in offs[t, b]))
                        sc = r if sc is None else sc + r
                    m = m * (sc / nv)
                contrib = m * inner
                acc = contrib if acc is None else acc + contrib
            dst = dst + roll_write(acc, o_w)
        dst_ref[0] = dst

    return kernel, N, NN, T, nv


@functools.partial(jax.jit, static_argnames=("level", "dim"))
def p1_apply_local_pallas_flat_v2(src2d, elmats, level: int, dim: int, coeff=None):
    C = src2d.shape[0]
    n = 1 << level
    N = n + 1
    NN = N * N if dim == 3 else N
    # share rolls when ~26 live arrays (8 read + 8 write rolls, 6 masks,
    # src/dst/acc) fit in the raised VMEM budget (see _compiler_params)
    phys = _phys_bytes((N, NN))
    share = phys * 26 < 90 * 1024 * 1024
    kernel, N, NN, T, nv = _make_kernel_flat_v2(level, dim, coeff is not None, share)
    elm_flat = elmats.reshape(C, T * nv * nv).astype(src2d.dtype)
    yzsum = (
        np.add.outer(np.arange(N), np.arange(N)).reshape(-1).astype(np.int32)
        if dim == 3
        else np.zeros(NN, np.int32)
    )
    blk = (1, N, NN)
    idx = lambda c, *_: (c, 0, 0)
    data_spec = pl.BlockSpec(blk, idx, memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((1, NN), lambda c, *_: (0, 0), memory_space=pltpu.VMEM),
        data_spec,
    ]
    args = [yzsum.reshape(1, NN), src2d]
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
            flops=2 * T * nv * nv * C * N * NN,
            bytes_accessed=C * 4 * N * NN * (3 if coeff is not None else 2),
            transcendentals=0,
        ),
        compiler_params=_compiler_params(blk),
    )(elm_flat, *args)


@functools.lru_cache(maxsize=1)
def pallas_available() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False
