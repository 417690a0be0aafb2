"""Empirical perf probes for the P1 const-stencil kernel on TPU.

Variants (level 6, 48 macro-cells, flat (C, N, N*pitch) f32 blocks):
  A  current tiled kernel (TX=8, prev/cur/nxt splice)
  B  pure-XLA const path
  C  STRIPPED whole-cell kernel: 15-pt stencil, shared lane rolls, K0 only
     (wrong at shells/faces -- perf ceiling probe)
  D  copy kernel (pure DMA roofline probe, grid=(C,))
"""
import functools
import jax, jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hyteg_tpu.core.benchtime import auto_time
from hyteg_tpu.mesh import meshinfo as mi
from hyteg_tpu.operators import forms
from hyteg_tpu.operators.p1_elementwise import P1ElementwiseOperator
from hyteg_tpu.primitives.storage import CellStorage
from hyteg_tpu.functions.p1 import P1Space
from hyteg_tpu.indexing import flat, micro
from hyteg_tpu.kernels.p1_const_stencil import (
    stencil_tables, p1_const_apply_pallas, p1_const_apply_xla)
from hyteg_tpu.kernels.p1_stencil import _compiler_params

level = 6
storage = CellStorage(mi.mesh_unit_cube(2), num_shards=1)
space = P1Space(storage, level)
op = P1ElementwiseOperator(space, forms.laplace_form)
sd = space.resolve_sd(None)
C, N, L = space.block_shape
pitch = space.pitch
n = N - 1
gb = 2 * 4 * space.block_size / 1e9

key = jax.random.PRNGKey(0)
x = jax.random.normal(key, space.block_shape, dtype=space.dtype)
x = x * jnp.asarray(space.vertex_mask[None], dtype=space.dtype)

A = op.stencil           # (C, n_s, n_j)
E = op.stencil_face


def report(name, fn, *args):
    t = auto_time(fn, args[0])
    print(f"{name:34s} {t*1e3:8.3f} ms   {gb/t:7.1f} GB/s")
    return t


# ---- variant C: stripped whole-cell 15-pt kernel, shared lane rolls -------
def make_stripped():
    dirs, _, n_j = stencil_tables(3)
    n_s = dirs.shape[0]
    # weights: interior W_s = sum_j A[:, s, :]
    W = A.sum(-1).astype(x.dtype)  # (C, n_s)

    # group dirs by (dy, dz)
    lane_of = {}
    for i in range(n_s):
        dx, dy, dz = (int(v) for v in dirs[i])
        lane_of[i] = (dy, dz)
    lanes = sorted(set(lane_of.values()))

    y, z = flat.yz_maps(N, pitch)
    yz = np.stack([y, z]).astype(np.int32)

    def kernel(w_ref, yz_ref, src_ref, dst_ref):
        c = pl.program_id(0)
        dt = dst_ref.dtype
        src = src_ref[0]
        xs = jax.lax.broadcasted_iota(jnp.int32, (N, L), 0)
        ly = yz_ref[0, :][None, :]
        lz = yz_ref[1, :][None, :]
        K0 = ((xs + ly + lz <= n) & (lz < N)).astype(dt)
        base = {}
        for (dy, dz) in lanes:
            ls = dy * pitch + dz
            base[(dy, dz)] = src if ls == 0 else pltpu.roll(
                src, L - ls if ls > 0 else -ls, axis=1)
        acc = None
        for s in range(n_s):
            dx = int(dirs[s][0])
            v = base[lane_of[s]]
            if dx:
                v = pltpu.roll(v, N - dx if dx > 0 else -dx, axis=0)
            term = w_ref[c, s] * v
            acc = term if acc is None else acc + term
        dst_ref[0] = K0 * acc

    blk = (1, N, L)
    data = pl.BlockSpec(blk, lambda c, *_: (c, 0, 0), memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(C,),
        in_specs=[pl.BlockSpec((2, L), lambda c, *_: (0, 0),
                               memory_space=pltpu.VMEM), data],
        out_specs=data)

    @jax.jit
    def run(v):
        return pl.pallas_call(
            kernel, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct(v.shape, v.dtype),
            compiler_params=_compiler_params(blk, n_arrays=30, grid_rank=1),
        )(W, yz, v)
    return run


# ---- variant D: copy kernel --------------------------------------------
def make_copy():
    def kernel(src_ref, dst_ref):
        dst_ref[0] = src_ref[0] * 2.0
    blk = (1, N, L)
    data = pl.BlockSpec(blk, lambda c: (c, 0, 0), memory_space=pltpu.VMEM)

    @jax.jit
    def run(v):
        return pl.pallas_call(
            kernel, grid=(C,), in_specs=[data], out_specs=data,
            out_shape=jax.ShapeDtypeStruct(v.shape, v.dtype),
            compiler_params=_compiler_params(blk, n_arrays=6, grid_rank=1),
        )(v)
    return run


print(f"block (C,N,L)=({C},{N},{L}) pitch={pitch} {4*space.block_size/1e6:.1f} MB")
report("A  tiled const kernel (TX=8)",
       lambda v: p1_const_apply_pallas(v, A, E, level, 3, pitch), x)
report("B  XLA const path",
       lambda v: p1_const_apply_xla(v, A, level, 3, pitch, E=E), x)
report("C  stripped whole-cell 15pt", make_stripped(), x)
report("D  copy kernel", make_copy(), x)
