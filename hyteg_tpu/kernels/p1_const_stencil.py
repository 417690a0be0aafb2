"""Constant-stencil P1 apply: the 15-point-stencil fast path.

TPU-native analog of the reference's constant-stencil operators
(reference: src/constant_stencil_operator/P1ConstantOperator.cpp:239-667
and the generated kernels, e.g. apply_3D_macrocell_vertexdof_to_vertexdof_
replace.cpp:14-60 — a 15-point stencil swept over the macro-cell).

Derivation. With per-cell-constant element matrices, the elementwise apply

    dst[p] += sum_t sum_{a,b} [p - off_a in base_t] elm[t,a,b] src[p - off_a + off_b]

collapses into a stencil: for each direction s = off_b - off_a,

    dst[p] = sum_s c_s(p) * src[p + s],
    c_s(p) = sum_{(t,a,b): off_b-off_a=s} elm[t,a,b] * [S(p) <= n - j(t,a)]

where S(p) = x+y+z and j(t,a) = margin_t - S(off_a) in {0,1,2}. The
position dependence is therefore *only through the shell index* S(p):

    c_s(p) = w_s                      for S(p) <= n-2   (interior)
           = w_s - A2_s               for S(p) == n-1
           = w_s - A2_s - A1_s        for S(p) == n     (diagonal face)

with w_s = sum_j A_js, so the apply is 15 shifted reads, 15 + |nz| fused
multiply-adds and three shell masks — the VPU op-count floor for a
15-point stencil — instead of the 96 masked accumulation passes of the
general elementwise path. Structural zeros of A1/A2 are skipped at trace
time (the (t,a,b) -> (s,j) map is static).
"""

from __future__ import annotations

import functools

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


def _make_const_kernel(level: int, dim: int, pitch: int):
    n = 1 << level
    N = n + 1
    L = N * pitch if dim == 3 else N
    dirs, _, n_j = stencil_tables(dim)
    nz = _structural_nonzero(dim)
    n_s = dirs.shape[0]
    roll_read, _ = _roll_helpers(N, L, pitch, dim)

    def kernel(w_ref, yz_ref, src_ref, dst_ref):
        # w_ref: (C, n_s * n_j) prefetched per-cell shell weights
        c = pl.program_id(0)
        xs = jax.lax.broadcasted_iota(jnp.int32, (N, L), 0)
        s_sum = xs + yz_ref[0, :][None, :]
        K0 = (s_sum <= n).astype(dst_ref.dtype)
        # shell m: S(p) = n - m loses the A[s, j > m] contributions
        shells = [
            (s_sum == n - m).astype(dst_ref.dtype) for m in range(n_j - 1)
        ]
        acc_w = None
        acc_shell = [None] * (n_j - 1)
        for s in range(n_s):
            r = roll_read(src_ref[0], tuple(int(x) for x in dirs[s]))
            # total interior weight w_s = sum_j A[s, j]
            w = w_ref[c, s * n_j]
            for j in range(1, n_j):
                w = w + w_ref[c, s * n_j + j]
            term = w * r
            acc_w = term if acc_w is None else acc_w + term
            # shell S(p) = n - m loses all A[s, j] with j > m
            for m in range(0, n_j - 1):
                corr = None
                for j in range(m + 1, n_j):
                    if not nz[s, j]:
                        continue
                    cj = w_ref[c, s * n_j + j]
                    corr = cj if corr is None else corr + cj
                if corr is None:
                    continue
                t2 = corr * r
                acc_shell[m] = t2 if acc_shell[m] is None else acc_shell[m] + t2
        dst = K0 * acc_w
        for m in range(0, n_j - 1):
            if acc_shell[m] is not None:
                dst = dst - shells[m] * acc_shell[m]
        dst_ref[0] = dst

    return kernel, N, L, n_s, n_j


@functools.partial(jax.jit, static_argnames=("level", "dim", "pitch"))
def p1_const_apply_pallas(src2d, A, level: int, dim: int, pitch: int):
    """Per-cell constant-stencil apply (partial sums on interface rows).

    src2d: (C, N, L); A: (C, n_s, n_j) from stencil_weights."""
    C = src2d.shape[0]
    kernel, N, L, n_s, n_j = _make_const_kernel(level, dim, pitch)
    w_flat = A.reshape(C, n_s * n_j).astype(src2d.dtype)
    yzsum = _yz_prefetch(N, pitch, dim)

    blk = (1, N, L)
    idx = lambda c, *_: (c, 0, 0)
    data_spec = pl.BlockSpec(blk, idx, memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((1, L), lambda c, *_: (0, 0), memory_space=pltpu.VMEM),
        data_spec,
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(C,), in_specs=in_specs,
        out_specs=data_spec,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(src2d.shape, src2d.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_s * C * N * L,
            bytes_accessed=C * 4 * N * L * 2,
            transcendentals=0,
        ),
        compiler_params=_compiler_params(blk, n_arrays=24),
    )(w_flat, yzsum, src2d)


def p1_const_apply_xla(src2d, A, level: int, dim: int, pitch: int):
    """Pure-XLA constant-stencil apply (CPU fallback; same math)."""
    n = 1 << level
    N = n + 1
    dirs, _, n_j = stencil_tables(dim)
    nz = _structural_nonzero(dim)
    if dim == 3:
        ssum = flat.yz_sum(N, pitch)[None, :] + np.arange(N)[:, None]
    else:
        ssum = np.add.outer(np.arange(N), np.arange(N))
    K0 = jnp.asarray((ssum <= n), dtype=src2d.dtype)[None]
    shells = [
        jnp.asarray((ssum == n - m), dtype=src2d.dtype)[None]
        for m in range(n_j - 1)
    ]
    acc_w = None
    acc_shell = [None] * (n_j - 1)
    for s in range(dirs.shape[0]):
        r = flat.shift_read(src2d, tuple(int(x) for x in dirs[s]), pitch, dim)
        w = A[:, s, :].sum(-1).reshape(-1, 1, 1)
        term = w * r
        acc_w = term if acc_w is None else acc_w + term
        for m in range(0, n_j - 1):
            js = [j for j in range(m + 1, n_j) if nz[s, j]]
            if not js:
                continue
            corr = sum(A[:, s, j] for j in js).reshape(-1, 1, 1)
            t2 = corr * r
            acc_shell[m] = t2 if acc_shell[m] is None else acc_shell[m] + t2
    dst = K0 * acc_w
    for m in range(0, n_j - 1):
        if acc_shell[m] is not None:
            dst = dst - shells[m] * acc_shell[m]
    return dst
