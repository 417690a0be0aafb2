"""Round-5 profiling, part 2: dissect the tet const-stencil kernel.

Variants on the tet block shape (C=48, N=65, L=4225):
  a. pure copy, grid (C,), whole-cell blocks
  b. pure copy, 2 cells per program
  c. 15 lane-rolled FMAs w/ per-cell scalar weights (no masks/shells)
  d. c + mask build (iota + K0/shell compares) and K0 multiply
  e. the real const-stencil kernel (reference point)
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hyteg_tpu.core.benchtime import auto_time
from hyteg_tpu.indexing import flat, micro
from hyteg_tpu.kernels.p1_const_stencil import stencil_tables


def report(name, dt, nbytes):
    print(f"{name:46s} {dt*1e3:9.3f} ms  {nbytes/dt/1e9:8.1f} GB/s",
          flush=True)


C, LEVEL = 48, 6
N = (1 << LEVEL) + 1
P = N
L = N * P
NB = C * N * L * 4  # one-direction bytes


def bench_copy_cells(cells_per=1):
    G = C // cells_per

    def kernel(cur_ref, dst_ref):
        dst_ref[...] = cur_ref[...] * 2.0

    spec = pl.BlockSpec((cells_per, N, L), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)

    @jax.jit
    def run(u):
        return pl.pallas_call(
            kernel,
            grid_spec=pl.GridSpec(grid=(G,), in_specs=[spec], out_specs=spec),
            out_shape=jax.ShapeDtypeStruct(u.shape, u.dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(u)

    u = jax.random.normal(jax.random.PRNGKey(0), (C, N, L), jnp.float32)
    dt = auto_time(run, u)
    report(f"copy tet-blocks ({cells_per} cells/prog)", dt, NB * 2)


def bench_fma(with_masks: bool, n_dirs: int = 15):
    dirs, _, n_j = stencil_tables(3)
    n = N - 1

    def lane_shift(off):
        return int(off[1]) * P + int(off[2])

    lane_classes = sorted({lane_shift(dirs[s]) for s in range(dirs.shape[0])})

    def kernel(w_ref, yz_ref, cur_ref, dst_ref):
        c = pl.program_id(0)
        cur = cur_ref[0]
        base = {}
        for ls in lane_classes:
            base[ls] = cur if ls == 0 else pltpu.roll(
                cur, L - ls if ls > 0 else -ls, axis=1)
        acc = None
        k = 0
        for s in range(dirs.shape[0]):
            if k >= n_dirs:
                break
            off = tuple(int(x) for x in dirs[s])
            v = base[lane_shift(off)]
            if off[0]:
                v = pltpu.roll(v, N - off[0] if off[0] > 0 else -off[0],
                               axis=0)
            t = w_ref[c, s] * v
            acc = t if acc is None else acc + t
            k += 1
        if with_masks:
            xs = jax.lax.broadcasted_iota(jnp.int32, (N, L), 0)
            ly = yz_ref[0, :][None, :]
            lz = yz_ref[1, :][None, :]
            in_z = lz < N
            s_sum = xs + ly + lz
            K0 = ((s_sum <= n) & in_z).astype(jnp.float32)
            sh = [((s_sum == n - m) & in_z).astype(jnp.float32)
                  for m in range(n_j - 1)]
            acc = acc * K0
            for m in range(n_j - 1):
                acc = acc - sh[m] * acc
        dst_ref[0] = acc

    y, z = flat.yz_maps(N, P)
    yz = np.stack([y, z]).astype(np.int32)
    spec = pl.BlockSpec((1, N, L), lambda c, *_: (c, 0, 0),
                        memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(C,),
        in_specs=[
            pl.BlockSpec((2, L), lambda c, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            spec,
        ],
        out_specs=spec,
    )

    @jax.jit
    def run(u):
        w = jnp.ones((C, dirs.shape[0]), dtype=jnp.float32)
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct(u.shape, u.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=100 * 1024 * 1024),
        )(w, yz, u)

    u = jax.random.normal(jax.random.PRNGKey(0), (C, N, L), jnp.float32)
    dt = auto_time(run, u)
    tag = "fma+masks" if with_masks else "fma"
    report(f"tet {tag} ({n_dirs} dirs, scalar w)", dt, NB * 2)


if __name__ == "__main__":
    print(jax.devices(), flush=True)
    bench_copy_cells(1)
    bench_copy_cells(2)
    bench_copy_cells(4)
    bench_fma(False, 15)
    bench_fma(False, 6)
    bench_fma(True, 15)
