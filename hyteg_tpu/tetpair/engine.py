"""TetPairEngine: the paired-tet fast path bound to a (space, operator).

Usage (the bench / solver hot loop):

    eng = TetPairEngine(space, elmats)
    st = eng.lift(u)                  # pack + extract (chain start)
    st = eng.apply_ex(st)             # fused exchanged apply (hot)
    u2 = eng.lower(st)                # install + unpack (chain end)

``lower(lift(u)) == u`` on tet positions, and ``lower(apply_ex(lift(u)))``
equals the classic ``P1ElementwiseOperator.apply_raw`` (gated in
tests/test_tetpair.py and in bench.py before timing).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..functions.ifc_dense import build_dense_ifc
from ..functions.p1 import P1Space
from . import kernel as tk
from . import plan as tp
from . import small as ts


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class PairState:
    """Paired blocks + authoritative boundary values (compact faces)."""

    u: jnp.ndarray   # (Cp, N, L)
    xf: jnp.ndarray  # (Cp, 2, L)
    yf: jnp.ndarray  # (Cp, 2, N, P)
    zf: jnp.ndarray  # (Cp, 2, N, N)
    df: jnp.ndarray  # (Cp, 2, L)

    def tree_flatten(self):
        return (self.u, self.xf, self.yf, self.zf, self.df), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


class TetPairEngine:
    """Fast constant-stencil apply for a single-shard 3D P1 space."""

    def __init__(self, space: P1Space, elmats, interpret: bool = False):
        assert space.dim == 3, "tetpair is the 3D fast path"
        assert space.storage.num_shards == 1
        assert bool(np.all(space.storage.cell_valid)), \
            "tetpair requires a padding-free storage"
        C = space.C_loc
        assert C % 2 == 0, "tetpair requires an even macro-cell count"
        self.space = space
        self.N = space.N
        self.P = space.pitch
        self.Cp = C // 2
        self.interpret = interpret
        self.W = jnp.asarray(tp.weight_matrix(np.asarray(elmats)))
        self.ifc = build_dense_ifc(space.storage, space.level, space.pitch)

    # -- state conversions ---------------------------------------------------

    def pack(self, u: jnp.ndarray) -> jnp.ndarray:
        return tp.pack_blocks(u, self.N, self.P)

    def unpack(self, up: jnp.ndarray) -> jnp.ndarray:
        return tp.unpack_blocks(up, self.N, self.P)

    def lift(self, u: jnp.ndarray) -> PairState:
        """Consistent per-tet blocks (C, N, L) -> PairState."""
        up = self.pack(u)
        xf, yf, zf, df = tk.pair_extract(up, self.N, self.P,
                                         interpret=self.interpret)
        return PairState(up, xf, yf, zf, df)

    def lower(self, st: PairState) -> jnp.ndarray:
        """PairState -> consistent per-tet blocks (C, N, L)."""
        up = tk.pair_install(st.u, st.xf, st.yf, st.zf, st.df,
                             self.N, self.P, interpret=self.interpret)
        return self.unpack(up)

    def install(self, st: PairState) -> jnp.ndarray:
        """Materialized consistent paired blocks."""
        return tk.pair_install(st.u, st.xf, st.yf, st.zf, st.df,
                               self.N, self.P, interpret=self.interpret)

    # -- the hot apply -------------------------------------------------------

    def exchange_faces(self, xfo, yfo, zfo, dfo):
        planes = ts.faces_to_planes(xfo, yfo, zfo, dfo, self.N, self.P)
        summed = ts.exchange_planes(self.ifc, planes)
        return ts.planes_to_faces(summed, self.N, self.P)

    def apply_ex(self, st: PairState) -> PairState:
        """One exchanged operator apply: one block stream + small faces."""
        dst, xfo, yfo, zfo, dfo = tk.pair_apply(
            st.u, self.W, st.xf, st.yf, st.zf, st.df, self.N, self.P,
            interpret=self.interpret)
        xf, yf, zf, df = self.exchange_faces(xfo, yfo, zfo, dfo)
        return PairState(dst, xf, yf, zf, df)

    def apply_full(self, u: jnp.ndarray) -> jnp.ndarray:
        """Gate path: classic blocks in, exchanged apply, classic out."""
        return self.lower(self.apply_ex(self.lift(u)))
