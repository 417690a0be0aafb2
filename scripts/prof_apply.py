"""Decompose bench time: const-stencil kernel vs exchange vs raw copy."""
import jax, jax.numpy as jnp
from hyteg_tpu.core.benchtime import marginal_time
from hyteg_tpu.mesh import meshinfo as mi
from hyteg_tpu.operators import forms
from hyteg_tpu.operators.p1_elementwise import P1ElementwiseOperator
from hyteg_tpu.primitives.storage import CellStorage
from hyteg_tpu.functions.p1 import P1Space

level = 6
storage = CellStorage(mi.mesh_unit_cube(2), num_shards=1)
space = P1Space(storage, level)
op = P1ElementwiseOperator(space, forms.laplace_form)
sd = space.resolve_sd(None)

key = jax.random.PRNGKey(0)
x = jax.random.normal(key, space.block_shape, dtype=space.dtype)
x = x * jnp.asarray(space.vertex_mask[None], dtype=space.dtype)
print("block_shape", space.block_shape, "pitch", space.pitch,
      "bytes", 4 * space.block_size / 1e6, "MB")

gb = 2 * 4 * space.block_size / 1e9

t = marginal_time(lambda v: op.apply_raw(v, sd=sd), x, 2, 12, repeats=3)
print(f"apply_raw        {t*1e3:8.3f} ms   {gb/t:7.1f} GB/s")

t = marginal_time(lambda v: op._apply_local(v, None), x, 2, 12, repeats=3)
print(f"kernel only      {t*1e3:8.3f} ms   {gb/t:7.1f} GB/s")

t = marginal_time(lambda v: space.exchange_add(v, sd, None), x, 2, 12, repeats=3)
print(f"exchange only    {t*1e3:8.3f} ms   {gb/t:7.1f} GB/s")

t = marginal_time(lambda v: v * 2.0 + 1.0, x, 2, 12, repeats=3)
print(f"axpy (copy cal)  {t*1e3:8.3f} ms   {gb/t:7.1f} GB/s")
