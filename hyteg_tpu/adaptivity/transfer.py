"""DoF transfer between storages built on different macro meshes.

The reference migrates FunctionMemory alongside primitives when the mesh is
re-partitioned/refined (reference: PrimitiveStorage::migratePrimitives,
adaptiverefinement MigrationInfo). With batched point location the transfer
is a single device computation: evaluate the old field at every node of the
new storage's grid.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..functions.evaluate import FieldEvaluator


def interpolate_between_storages(old_storage, old_level: int, degree: int,
                                 u_old, new_storage, new_level: int | None = None,
                                 dtype=jnp.float32):
    """Return the DoF block of the same-degree space on ``new_storage``."""
    new_level = old_level if new_level is None else new_level
    if degree == 2:
        from ..functions.p2 import P2Space

        new_sp = P2Space(new_storage, new_level, dtype)
        node_sp = new_sp.node_space
    else:
        from ..functions.p1 import P1Space

        new_sp = P1Space(new_storage, new_level, dtype)
        node_sp = new_sp
    ev = FieldEvaluator(old_storage, old_level, degree, dtype)
    pts = node_sp.coords().reshape(-1, 3)[:, : node_sp.dim]
    vals = ev.evaluate(u_old, pts).reshape(node_sp.block_shape)
    vals = vals * jnp.asarray(node_sp.vertex_mask[None], dtype=vals.dtype)
    if new_storage.num_shards == 1:
        vals = node_sp.exchange_rep(vals, node_sp.resolve_sd(None))
    return vals
