import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from hyteg_tpu.core.benchtime import auto_time
from hyteg_tpu.functions.p1 import P1Space
from hyteg_tpu.mesh import meshinfo as mi
from hyteg_tpu.operators import forms
from hyteg_tpu.operators.p1_elementwise import P1ElementwiseOperator
from hyteg_tpu.primitives.storage import CellStorage
from hyteg_tpu.tetpair import TetPairEngine
from hyteg_tpu.tetpair import kernel as tk

level = int(sys.argv[1]) if len(sys.argv) > 1 else 6
storage = CellStorage(mi.mesh_unit_cube(2), num_shards=1)
space = P1Space(storage, level)
op = P1ElementwiseOperator(space, forms.laplace_form)
sd = space.resolve_sd(None)
x = jax.random.normal(jax.random.PRNGKey(0), space.block_shape,
                      dtype=space.dtype)
x = x * jnp.asarray(space.vertex_mask[None], dtype=space.dtype)
x = space.exchange_rep(x, sd)
eng = TetPairEngine(space, op.elmats)
mask = jnp.asarray(space.vertex_mask[None], dtype=space.dtype)

# gate on device
ref = op.apply_raw(x, sd=sd)
got = eng.apply_full(x)
err = float(jnp.max(jnp.abs((got - ref) * mask)))
scale = float(jnp.max(jnp.abs(ref)))
print(f"gate rel err: {err/scale:.3e}", flush=True)
assert err / scale < 1e-5

ndofs = space.num_global_dofs()
st = eng.lift(x)

# timed pieces
dt = auto_time(lambda s: eng.apply_ex(s), st)
print(f"apply_ex: {dt*1e3:.3f} ms  {ndofs/dt/1e9:.2f} GDoF/s", flush=True)

from hyteg_tpu.tetpair.engine import PairState


def _kernel_only(s):
    out = tk.pair_apply(s.u, eng.W, s.xf, s.yf, s.zf, s.df, eng.N, eng.P)
    return PairState(out[0], s.xf, s.yf, s.zf, s.df)


dt2 = auto_time(_kernel_only, st)
print(f"kernel only: {dt2*1e3:.3f} ms  {ndofs/dt2/1e9:.2f} GDoF/s",
      flush=True)

# old path for comparison
dt3 = auto_time(lambda v: op.apply_raw(v, sd=sd), x)
print(f"old full apply: {dt3*1e3:.3f} ms  {ndofs/dt3/1e9:.2f} GDoF/s",
      flush=True)
