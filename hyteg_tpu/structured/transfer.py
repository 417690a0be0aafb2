"""Grid transfers between nested BoxDomain levels.

FE-correct P1 transfers on the Kuhn-subdivided box grid (reference:
src/hyteg/gridtransferoperators/P1toP1LinearProlongation.hpp /
P1toP1LinearRestriction.hpp): a fine node of parity d in {0,1}^3 \\ {0}
is the midpoint of the coarse Kuhn-mesh EDGE in direction d (monotone
diagonals only — NOT trilinear interpolation), so

    P:  u_f[2c + d] = (u_c[c] + u_c[c + d]) / 2
    R = P^T:  r_c[c] = r_f[2c] + 1/2 sum_{14 dirs d} r_f[2c + d]

Both are scatter-free: P is a parity-stack + reshape, R reads strided
slices of shifted fine arrays.
"""

from __future__ import annotations

import itertools

import jax.numpy as jnp

from .box import BoxDomain

_PARITIES = [p for p in itertools.product((0, 1), repeat=3)]
_DIRS14 = [d for d in itertools.product((-1, 0, 1), repeat=3)
           if d != (0, 0, 0) and (all(v >= 0 for v in d)
                                  or all(v <= 0 for v in d))]


def _to3(u, dims):
    X, Y, Z = dims
    return u.reshape(X, Y, Z)


def _to2(u3):
    X, Y, Z = u3.shape
    return u3.reshape(X, Y * Z)


def _shift3(u3, d):
    """out[p] = u3[p + d], zero-filled (3D)."""
    for ax, dv in enumerate(d):
        if dv == 0:
            continue
        pad_shape = list(u3.shape)
        pad_shape[ax] = abs(dv)
        z = jnp.zeros(pad_shape, u3.dtype)
        sl = [slice(None)] * 3
        if dv > 0:
            sl[ax] = slice(dv, None)
            u3 = jnp.concatenate([u3[tuple(sl)], z], axis=ax)
        else:
            sl[ax] = slice(0, dv)
            u3 = jnp.concatenate([z, u3[tuple(sl)]], axis=ax)
    return u3


def prolongate(u_c: jnp.ndarray, coarse: BoxDomain, fine: BoxDomain):
    """Linear P1 prolongation, (X_c, L_c) -> (X_f, L_f)."""
    u3 = _to3(u_c, coarse.dims)
    vals = []
    for p in _PARITIES:
        if p == (0, 0, 0):
            vals.append(u3)
        else:
            vals.append(0.5 * (u3 + _shift3(u3, p)))
    # stack to (Xc, 2, Yc, 2, Zc, 2) then interleave
    st = jnp.stack(vals, axis=0).reshape(2, 2, 2, *u3.shape)
    st = jnp.transpose(st, (3, 0, 4, 1, 5, 2))
    Xc, Yc, Zc = u3.shape
    full = st.reshape(2 * Xc, 2 * Yc, 2 * Zc)
    Xf, Yf, Zf = fine.dims
    return _to2(full[:Xf, :Yf, :Zf])


def restrict(r_f: jnp.ndarray, fine: BoxDomain, coarse: BoxDomain):
    """P^T residual restriction, (X_f, L_f) -> (X_c, L_c)."""
    r3 = _to3(r_f, fine.dims)
    acc = r3[::2, ::2, ::2]
    for d in _DIRS14:
        acc = acc + 0.5 * _shift3(r3, d)[::2, ::2, ::2]
    return _to2(acc)
