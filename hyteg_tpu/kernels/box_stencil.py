"""Pallas TPU kernel for the BoxDomain 15-point stencil apply.

The box layout makes this the minimal stencil kernel (contrast with the
per-tet kernel in p1_const_stencil.py): no diagonal shells, no face
inclusion-exclusion in-kernel — boundary handling lives entirely in the
precomputed per-lane weight vectors (structured/kuhn.py) plus two
single-row fixes.  Per row-tile:

  * 6 shared lane rolls (one per distinct (dy, dz) class, wrap targets
    carry exactly-zero weights),
  * one sublane concatenate per dx != 0 direction, splicing the 1-row
    halo (delivered as tiny (1, L) side inputs — the main stream is read
    exactly once),
  * 15 lane-broadcast FMAs for the bulk,
  * 15 + 15 narrow (1, L) FMAs re-evaluating global rows 0 and X-1 with
    their own weight vectors.

Reference analog: src/constant_stencil_operator/P1generatedKernels/
apply_3D_macrocell_vertexdof_to_vertexdof_replace.cpp:14-60 (the 15-point
sweep); the aggregation over whole micro-cubes removes its per-primitive
boundary loops.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..indexing import flat  # noqa: F401  (kept for parity with p1 kernels)
from .p1_stencil import _compiler_params
from ..structured import kuhn


def _pick_tx(X: int, L: int, n_live: int = 16) -> int:
    budget = 80 * 1024 * 1024
    lanes = -(-L // 128) * 128
    tx = 8
    for cand in (8, 16, 32, 64, 128):
        if cand > -(-X // 8) * 8:
            break
        if n_live * cand * lanes * 4 <= budget:
            tx = cand
    return tx


def _make_kernel(X: int, Y: int, Z: int, n_s: int, TX: int, NT: int):
    L = Y * Z
    dirs = kuhn.stencil_dirs()
    lane_classes = sorted({int(d[1]) * Z + int(d[2]) for d in dirs})
    rl = (X - 1) - (NT - 1) * TX  # static local row of global row X-1

    def kernel(w_ref, hal_ref, cur_ref, dst_ref):
        i = pl.program_id(0)
        rows = jax.lax.broadcasted_iota(jnp.int32, (TX, L), 0)
        # zero out padding rows of the last tile and invalid halo rows
        # (unspecified values would leak NaNs through zero weights)
        cur = jnp.where(rows + i * TX < X, cur_ref[...], 0.0)
        hp = jnp.where(i * TX - 1 >= 0, hal_ref[0:1, :], 0.0)
        hn = jnp.where((i + 1) * TX <= X - 1, hal_ref[1:2, :], 0.0)

        def lroll(v, ls):
            return v if ls == 0 else pltpu.roll(
                v, v.shape[1] - ls if ls > 0 else -ls, axis=1)

        # bulk: one lane class fully consumed at a time
        acc = None
        for ls in lane_classes:
            b = lroll(cur, ls)
            hpb = lroll(hp, ls)
            hnb = lroll(hn, ls)
            for s in range(n_s):
                dx, dy, dz = (int(v) for v in dirs[s])
                if dy * Z + dz != ls:
                    continue
                v = b
                if dx == 1:
                    v = jnp.concatenate([v[1:TX], hnb], axis=0)
                elif dx == -1:
                    v = jnp.concatenate([hpb, v[: TX - 1]], axis=0)
                t = w_ref[s : s + 1, :] * v
                acc = t if acc is None else acc + t
        dst_ref[...] = acc

        # boundary rows 0 / X-1: re-evaluated with their own weight
        # vectors on (1, L) slices, only in the first / last tile
        def row_fix(wo, rm1, r0, r1):
            fix = None
            for s in range(n_s):
                dx, dy, dz = (int(v) for v in dirs[s])
                v = (rm1, r0, r1)[dx + 1]
                t = w_ref[wo + s : wo + s + 1, :] * lroll(v, dy * Z + dz)
                fix = t if fix is None else fix + t
            return fix

        @pl.when(i == 0)
        def _():
            # dx = -1 weights are exactly zero at global row 0; the
            # zero-selected hp is a safe placeholder read
            dst_ref[0:1, :] = row_fix(n_s, hp, cur[0:1, :], cur[1:2, :])

        @pl.when(i == NT - 1)
        def _():
            # dx = +1 weights are exactly zero at global row X-1; the
            # zero-selected hn is a safe placeholder read
            dn = cur[rl - 1 : rl, :] if rl >= 1 else hp
            up = cur[rl + 1 : rl + 2, :] if rl + 1 < TX else hn
            dst_ref[rl : rl + 1, :] = row_fix(
                2 * n_s, dn, cur[rl : rl + 1, :], up)

    return kernel


@functools.partial(jax.jit, static_argnames=("dims", "interpret"))
def box_apply_pallas(u: jnp.ndarray, w_vecs: jnp.ndarray, dims,
                     interpret: bool = False) -> jnp.ndarray:
    """u: (X, L); w_vecs: (3, n_s, L) from kuhn.lane_weights."""
    X, Y, Z = dims
    L = Y * Z
    n_s = w_vecs.shape[1]
    TX = _pick_tx(X, L)
    NT = -(-X // TX)
    kernel = _make_kernel(X, Y, Z, n_s, TX, NT)
    w = w_vecs.reshape(3 * n_s, L).astype(u.dtype)

    # per-tile 1-row halos packed in one 8-row stream: hal[8i] =
    # u[i*TX - 1], hal[8i + 1] = u[(i+1)*TX] (clamped)
    idx_p = np.clip(np.arange(NT) * TX - 1, 0, X - 1)
    idx_n = np.clip((np.arange(NT) + 1) * TX, 0, X - 1)
    idx = np.zeros((NT, 8), dtype=np.int64)
    idx[:, 0] = idx_p
    idx[:, 1] = idx_n
    hal = u[jnp.asarray(idx.reshape(-1))]

    grid_spec = pl.GridSpec(
        grid=(NT,),
        in_specs=[
            pl.BlockSpec((3 * n_s, L), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, L), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TX, L), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TX, L), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(u.shape, u.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_s * X * L,
            bytes_accessed=4 * X * L * 2,
            transcendentals=0,
        ),
        compiler_params=_compiler_params((TX, L), n_arrays=17, grid_rank=1),
        interpret=interpret,
    )(w, hal, u)
