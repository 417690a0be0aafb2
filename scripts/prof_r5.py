"""Round-5 profiling: what are the box / tet apply kernels actually bound by?

Measures, on the real chip:
  1. pure-copy Pallas bandwidth at the box shape (HBM ceiling as achievable
     by this layout),
  2. the box stencil kernel as-is,
  3. the box kernel with lane rolls removed (same reads/FMAs, no permutes)
     -> isolates the cross-lane roll cost,
  4. the box kernel with rolls but only 3 FMAs -> isolates FMA cost,
  5. tet const-stencil kernel alone vs exchange_add alone vs full apply.

Run: python scripts/prof_r5.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hyteg_tpu.core.benchtime import auto_time


def report(name, dt, nbytes=None, ndofs=None):
    line = f"{name:42s} {dt*1e3:9.3f} ms"
    if nbytes:
        line += f"  {nbytes/dt/1e9:8.1f} GB/s"
    if ndofs:
        line += f"  {ndofs/dt/1e9:8.2f} GDoF/s"
    print(line, flush=True)


def bench_copy(X, L, TX=32):
    NT = -(-X // TX)

    def kernel(cur_ref, dst_ref):
        dst_ref[...] = cur_ref[...] * 2.0

    @jax.jit
    def run(u):
        return pl.pallas_call(
            kernel,
            grid_spec=pl.GridSpec(
                grid=(NT,),
                in_specs=[pl.BlockSpec((TX, L), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((TX, L), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
            ),
            out_shape=jax.ShapeDtypeStruct(u.shape, u.dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(u)

    u = jax.random.normal(jax.random.PRNGKey(0), (X, L), dtype=jnp.float32)
    dt = auto_time(run, u)
    report(f"copy ({X},{L}) TX={TX}", dt, nbytes=X * L * 8)
    return dt


def bench_box_variants(level=7):
    from hyteg_tpu.structured import BoxDomain, BoxStencilOperator
    from hyteg_tpu.structured import kuhn

    dom = BoxDomain((2, 2, 2), level=level)
    op = BoxStencilOperator(dom)
    u = jax.random.normal(jax.random.PRNGKey(0), dom.block_shape,
                          dtype=jnp.float32)
    ndofs = dom.num_dofs()
    dt = auto_time(lambda v: op.apply_raw(v), u)
    report("box apply (current)", dt, nbytes=ndofs * 8, ndofs=ndofs)

    # variant kernels on the same shape
    X, L = u.shape
    dims = dom.dims if hasattr(dom, "dims") else None
    dirs = kuhn.stencil_dirs()
    n_s = len(dirs)
    Z = int(round(L ** 0.5))
    lane_classes = sorted({int(d[1]) * Z + int(d[2]) for d in dirs})

    def make(rolls: bool, nfma: int, TX=32):
        NT = -(-X // TX)

        def kernel(w_ref, cur_ref, dst_ref):
            cur = cur_ref[...]
            acc = None
            k = 0
            for ls in lane_classes:
                if rolls and ls != 0:
                    b = pltpu.roll(cur, L - ls if ls > 0 else -ls, axis=1)
                else:
                    b = cur
                for s in range(n_s):
                    if int(dirs[s][1]) * Z + int(dirs[s][2]) != ls:
                        continue
                    if k >= nfma:
                        continue
                    t = w_ref[s:s + 1, :] * b
                    acc = t if acc is None else acc + t
                    k += 1
            dst_ref[...] = acc

        @jax.jit
        def run(v):
            w = jnp.ones((n_s, L), dtype=jnp.float32)
            return pl.pallas_call(
                kernel,
                grid_spec=pl.GridSpec(
                    grid=(NT,),
                    in_specs=[
                        pl.BlockSpec((n_s, L), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((TX, L), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM),
                    ],
                    out_specs=pl.BlockSpec((TX, L), lambda i: (i, 0),
                                          memory_space=pltpu.VMEM),
                ),
                out_shape=jax.ShapeDtypeStruct(v.shape, v.dtype),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024),
            )(w, v)

        return run

    for rolls, nfma, tag in [(True, 15, "rolls+15fma"),
                             (False, 15, "no-rolls+15fma"),
                             (True, 6, "rolls+6fma"),
                             (False, 1, "no-rolls+1fma")]:
        dt = auto_time(make(rolls, nfma), u)
        report(f"box variant {tag}", dt, nbytes=ndofs * 8, ndofs=ndofs)


def bench_tet(level=6):
    from hyteg_tpu.functions.p1 import P1Space
    from hyteg_tpu.mesh import meshinfo as mi
    from hyteg_tpu.operators import forms
    from hyteg_tpu.operators.p1_elementwise import P1ElementwiseOperator
    from hyteg_tpu.primitives.storage import CellStorage

    storage = CellStorage(mi.mesh_unit_cube(2), num_shards=1)
    space = P1Space(storage, level)
    op = P1ElementwiseOperator(space, forms.laplace_form)
    sd = space.resolve_sd(None)
    x = jax.random.normal(jax.random.PRNGKey(0), space.block_shape,
                          dtype=space.dtype)
    x = x * jnp.asarray(space.vertex_mask[None], dtype=space.dtype)
    ndofs = space.num_global_dofs()
    nstore = int(np.prod(space.block_shape))
    print(f"tet level {level}: block {space.block_shape}, "
          f"{ndofs/1e6:.2f}M dofs, {nstore/1e6:.2f}M stored "
          f"(x{nstore/ndofs:.2f})", flush=True)

    dt = auto_time(lambda v: op._apply_local(v, None), x)
    report("tet kernel only", dt, nbytes=nstore * 8, ndofs=ndofs)
    dt = auto_time(lambda v: space.exchange_add(v, sd), x)
    report("tet exchange_add only", dt, ndofs=ndofs)
    dt = auto_time(lambda v: op.apply_raw(v, sd=sd), x)
    report("tet full apply", dt, nbytes=nstore * 8, ndofs=ndofs)


if __name__ == "__main__":
    print(jax.devices(), flush=True)
    bench_copy(257, 257 * 257)
    bench_copy(257, 257 * 257, TX=64)
    bench_box_variants()
    bench_tet()
