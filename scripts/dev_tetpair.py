import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax
import jax.numpy as jnp
import numpy as np

from hyteg_tpu.functions.p1 import P1Space
from hyteg_tpu.mesh import meshinfo as mi
from hyteg_tpu.operators import forms
from hyteg_tpu.operators.p1_elementwise import P1ElementwiseOperator
from hyteg_tpu.primitives.storage import CellStorage
from hyteg_tpu.tetpair import TetPairEngine

level = int(sys.argv[1]) if len(sys.argv) > 1 else 3
storage = CellStorage(mi.mesh_unit_cube(1), num_shards=1)
space = P1Space(storage, level)
op = P1ElementwiseOperator(space, forms.laplace_form)
sd = space.resolve_sd(None)

key = jax.random.PRNGKey(0)
x = jax.random.normal(key, space.block_shape, dtype=space.dtype)
x = x * jnp.asarray(space.vertex_mask[None], dtype=space.dtype)
x = space.exchange_rep(x, sd)  # make replicas consistent

eng = TetPairEngine(space, op.elmats, interpret=True)

# roundtrip: lower(lift(x)) == x on tet positions
rt = eng.lower(eng.lift(x))
mask = jnp.asarray(space.vertex_mask[None], dtype=space.dtype)
err_rt = float(jnp.max(jnp.abs((rt - x) * mask)))
print("roundtrip err:", err_rt)

ref = op.apply_raw(x, sd=sd)
got = eng.apply_full(x)
err = float(jnp.max(jnp.abs((got - ref) * mask)))
scale = float(jnp.max(jnp.abs(ref)))
print("apply err:", err, "scale:", scale, "rel:", err / scale)
