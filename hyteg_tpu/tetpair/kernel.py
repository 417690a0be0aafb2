"""Fused paired-tet constant-stencil kernel (whole-cell blocks).

One grid step per pair-block (two macro-tets). The kernel

  1. installs the summed interface values (faces in compact per-face
     layouts) into the block's boundary positions (VMEM-only work — the
     halo write-back of the reference's communicateAdditively,
     src/hyteg/p1functionspace/VertexDoFAdditivePackInfo.hpp, costs no
     extra HBM pass),
  2. builds the per-lane weight vectors with one tiny MXU matmul
     (coeffs @ static mask stack; see tetpair/plan.py),
  3. runs the dx-grouped 15-direction sweep with 6 shared lane rolls
     (the box-kernel structure, kernels/box_stencil.py) plus the single
     diagonal-shell correction per half and (1, L) row fixes for the two
     x-face rows,
  4. extracts the partial boundary sums of the result into the compact
     face layouts (the pack step of the next halo exchange).

HBM traffic per apply = one block read + one block write + O(N^2) faces.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..kernels.p1_stencil import _compiler_params
from . import plan as tp

F32 = jnp.float32


def _lane_roll(v, ls):
    L = v.shape[-1]
    return v if ls == 0 else pltpu.roll(v, L - ls if ls > 0 else -ls, axis=1)


def _masks(N, P, yz_ref):
    n = N - 1
    L = N * P
    xs = jax.lax.broadcasted_iota(jnp.int32, (N, L), 0)
    ly = yz_ref[0, :][None, :]
    lz = yz_ref[1, :][None, :]
    s = xs + ly + lz
    okz = lz <= n
    in_a = s <= n
    in_b = (s >= 2 * n) & okz
    sh_a = s == n
    sh_b = (s == 2 * n) & okz
    return s, ly, lz, in_a, in_b, sh_a, sh_b


def _install(u0, N, P, s, ly, lz, in_a, in_b, sh_a, sh_b,
             xf, yf, zf, df, ohza_ref, ohzb_ref, skip=()):
    """Overwrite boundary positions of the block from compact face data.

    xf: (2, L) x-face planes (A row 0, B row n) flattened (y, z);
    yf: (2, N, P) y-face planes (A lanes [0,P), B lanes [nP, nP+P));
    zf: (2, N, N) z-face planes, params (x, y);
    df: (2, L) diagonal planes flattened (y, z)."""
    n = N - 1
    L = N * P
    if "diag" not in skip:
        u0 = jnp.where(sh_a, df[0:1, :], u0)
        u0 = jnp.where(sh_b, df[1:2, :], u0)
    if "z" not in skip:
        zea = jnp.dot(zf[0], ohza_ref[...], preferred_element_type=F32)
        u0 = jnp.where((lz == 0) & in_a, zea, u0)
        zeb = jnp.dot(zf[1], ohzb_ref[...], preferred_element_type=F32)
        u0 = jnp.where((lz == n) & in_b, zeb, u0)
    ypa = jax.lax.pad(yf[0], jnp.asarray(0.0, u0.dtype),
                      [(0, 0, 0), (0, L - P, 0)])
    u0 = jnp.where((ly == 0) & in_a, ypa, u0)
    ypb = jax.lax.pad(yf[1], jnp.asarray(0.0, u0.dtype),
                      [(0, 0, 0), (n * P, L - n * P - P, 0)])
    u0 = jnp.where((ly == n) & in_b, ypb, u0)
    row0 = jnp.where(s[0:1] <= n, xf[0:1, :], u0[0:1])
    rown = jnp.where(s[N - 1:N] >= 2 * n, xf[1:2, :], u0[N - 1:N])
    return jnp.concatenate([row0, u0[1:N - 1], rown], axis=0)


def _extract(dstv, N, P, s, ly, lz, in_a, in_b, sh_a, sh_b,
             ohza_ref, ohzb_ref, skip=()):
    """Compact face layouts of the block's boundary values."""
    n = N - 1
    dt = dstv.dtype
    xfa = jnp.where(s[0:1] <= n, dstv[0:1], 0.0)
    xfb = jnp.where(s[N - 1:N] >= 2 * n, dstv[N - 1:N], 0.0)
    if "diag" in skip:
        dfa = dfb = jnp.zeros((1, N * P), dt)
    else:
        dfa = jnp.sum(jnp.where(sh_a, dstv, 0.0), axis=0, keepdims=True)
        dfb = jnp.sum(jnp.where(sh_b, dstv, 0.0), axis=0, keepdims=True)
    if "z" in skip:
        zfa = zfb = jnp.zeros((N, N), dt)
    else:
        za = jnp.where((lz == 0) & in_a, dstv, 0.0)
        zfa = jax.lax.dot_general(za, ohza_ref[...],
                                  dimension_numbers=(((1,), (1,)), ((), ())),
                                  preferred_element_type=F32).astype(dt)
        zb = jnp.where((lz == n) & in_b, dstv, 0.0)
        zfb = jax.lax.dot_general(zb, ohzb_ref[...],
                                  dimension_numbers=(((1,), (1,)), ((), ())),
                                  preferred_element_type=F32).astype(dt)
    yfa = jnp.where(in_a[:, 0:P], dstv[:, 0:P], 0.0)
    yfb = jnp.where(in_b[:, n * P:n * P + P], dstv[:, n * P:n * P + P], 0.0)
    return xfa, xfb, yfa, yfb, zfa, zfb, dfa, dfb


def _make_kernel(N: int, P: int, skip: tuple = ()):
    n = N - 1
    L = N * P
    dirs, _, tail_a, tail_b = tp.dir_tables()
    n_s = dirs.shape[0]
    lane_classes = tuple(sorted({int(d[1]) * P + int(d[2]) for d in dirs}))
    kV_A, kT_A, kV0_A, kT0_A = 0, 1, 2, 3
    kV_B, kT_B, kV0_B, kT0_B = 4, 5, 6, 7

    def row(kind, s):
        return kind * tp.N_DIRS + s

    def kernel(yz_ref, m_ref, ohza_ref, ohzb_ref, w_ref, u_ref,
               xf_ref, yf_ref, zf_ref, df_ref,
               dst_ref, xfo_ref, yfo_ref, zfo_ref, dfo_ref):
        s, ly, lz, in_a, in_b, sh_a, sh_b = _masks(N, P, yz_ref)
        if "install" in skip:
            u1 = u_ref[0]
        else:
            u1 = _install(u_ref[0], N, P, s, ly, lz, in_a, in_b, sh_a,
                          sh_b, xf_ref[0], yf_ref[0], zf_ref[0], df_ref[0],
                          ohza_ref, ohzb_ref, skip)

        vecs = jnp.dot(w_ref[0], m_ref[...], preferred_element_type=F32)

        bases = {ls: _lane_roll(u1, ls) for ls in lane_classes}

        def wv(kind, si):
            return vecs[row(kind, si):row(kind, si) + 1, :]

        accs = {}  # (kind, dx) -> (N, L)

        def acc(kind, si, b, dx):
            t = wv(kind, si) * b
            key = (kind, dx)
            accs[key] = t if key not in accs else accs[key] + t

        for si in range(n_s):
            dx, dy, dz = (int(v) for v in dirs[si])
            b = bases[dy * P + dz]
            acc(kV_A, si, b, dx)
            acc(kV_B, si, b, dx)
            if si in tail_a and "tails" not in skip:
                acc(kT_A, si, b, dx)
            if si in tail_b and "tails" not in skip:
                acc(kT_B, si, b, dx)

        zrow = jnp.zeros((1, L), dtype=u1.dtype)

        def splice(kind):
            g0 = accs.get((kind, 0))
            gp = accs.get((kind, 1))
            gm = accs.get((kind, -1))
            out = g0 if g0 is not None else jnp.zeros((N, L), u1.dtype)
            if gp is not None:
                # dst[x] += gp[x+1]; top row garbage is weight-killed
                out = out + jnp.concatenate([gp[1:], gp[N - 1:N]], axis=0)
            if gm is not None:
                out = out + jnp.concatenate([gm[0:1], gm[:N - 1]], axis=0)
            return out

        sh_af = sh_a.astype(u1.dtype)
        sh_bf = sh_b.astype(u1.dtype)
        main_a = splice(kV_A) - sh_af * splice(kT_A)
        main_b = splice(kV_B) - sh_bf * splice(kT_B)
        dmid = (in_a.astype(u1.dtype) * main_a
                + in_b.astype(u1.dtype) * main_b)

        def rowfix(kV0, kT0, tails, base_row, shell_row):
            tot = None
            tl = None
            for si in range(n_s):
                dx, dy, dz = (int(v) for v in dirs[si])
                b = bases[dy * P + dz]
                r = b[base_row(dx):base_row(dx) + 1, :]
                t = wv(kV0, si) * r
                tot = t if tot is None else tot + t
                if si in tails:
                    t2 = wv(kT0, si) * r
                    tl = t2 if tl is None else tl + t2
            if tl is not None:
                tot = tot - shell_row * tl
            return tot

        if "fix" in skip:
            dstv = dmid
        else:
            fix_a = rowfix(kV0_A, kT0_A, tail_a, lambda dx: max(dx, 0),
                           sh_af[0:1])
            fix_b = rowfix(kV0_B, kT0_B, tail_b, lambda dx: n + min(dx, 0),
                           sh_bf[N - 1:N])
            row0 = jnp.where(in_a[0:1], fix_a, dmid[0:1])
            rown = jnp.where(in_b[N - 1:N], fix_b, dmid[N - 1:N])
            dstv = jnp.concatenate([row0, dmid[1:N - 1], rown], axis=0)
        dst_ref[0] = dstv

        if "extract" in skip:
            xfa = xfb = dfa = dfb = jnp.zeros((1, L), dstv.dtype)
            yfa = yfb = jnp.zeros((N, P), dstv.dtype)
            zfa = zfb = jnp.zeros((N, N), dstv.dtype)
        else:
            xfa, xfb, yfa, yfb, zfa, zfb, dfa, dfb = _extract(
                dstv, N, P, s, ly, lz, in_a, in_b, sh_a, sh_b,
                ohza_ref, ohzb_ref, skip)
        xfo_ref[0, 0:1, :] = xfa
        xfo_ref[0, 1:2, :] = xfb
        yfo_ref[0, 0] = yfa
        yfo_ref[0, 1] = yfb
        zfo_ref[0, 0] = zfa
        zfo_ref[0, 1] = zfb
        dfo_ref[0, 0:1, :] = dfa
        dfo_ref[0, 1:2, :] = dfb

    return kernel


def _face_shapes(Cp: int, N: int, P: int):
    L = N * P
    return (
        jax.ShapeDtypeStruct((Cp, 2, L), jnp.float32),
        jax.ShapeDtypeStruct((Cp, 2, N, P), jnp.float32),
        jax.ShapeDtypeStruct((Cp, 2, N, N), jnp.float32),
        jax.ShapeDtypeStruct((Cp, 2, L), jnp.float32),
    )


def _face_specs(N: int, P: int):
    L = N * P
    return (
        pl.BlockSpec((1, 2, L), lambda c: (c, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 2, N, P), lambda c: (c, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 2, N, N), lambda c: (c, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 2, L), lambda c: (c, 0, 0),
                     memory_space=pltpu.VMEM),
    )


def _static_inputs(pp: tp.PairPlan):
    return (
        jnp.asarray(pp.yz),
        jnp.asarray(pp.masks),
        jnp.asarray(pp.ohz_a),
        jnp.asarray(pp.ohz_b),
    )


def _static_specs(N: int, P: int):
    L = N * P
    const = lambda shape: pl.BlockSpec(shape, lambda c: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    return (const((2, L)), const((tp.N_MASKCOL, L)),
            const((N, L)), const((N, L)))


@functools.partial(jax.jit,
                   static_argnames=("N", "P", "interpret", "skip"))
def pair_apply(u, W, xf, yf, zf, df, N: int, P: int,
               interpret: bool = False, skip: tuple = ()):
    """Fused exchanged apply on paired blocks.

    u: (Cp, N, L) consistent except boundary (authoritative boundary in
    the face arrays); W: (Cp, N_VEC, N_MASKCOL) from plan.weight_matrix.
    Returns (dst, xfo, yfo, zfo, dfo) with dst holding per-cell partial
    sums on boundaries and the faces holding the extracted partials."""
    Cp = u.shape[0]
    L = N * P
    pp = tp.PairPlan(N, P)
    kernel = _make_kernel(N, P, skip)
    data = pl.BlockSpec((1, N, L), lambda c: (c, 0, 0),
                        memory_space=pltpu.VMEM)
    wspec = pl.BlockSpec((1, tp.N_VEC, tp.N_MASKCOL), lambda c: (c, 0, 0),
                         memory_space=pltpu.VMEM)
    grid_spec = pl.GridSpec(
        grid=(Cp,),
        in_specs=[*_static_specs(N, P), wspec, data, *_face_specs(N, P)],
        out_specs=[data, *_face_specs(N, P)],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct(u.shape, u.dtype),
                   *_face_shapes(Cp, N, P)),
        cost_estimate=pl.CostEstimate(
            flops=2 * 30 * Cp * N * L,
            bytes_accessed=Cp * 4 * N * L * 2,
            transcendentals=0,
        ),
        compiler_params=_compiler_params((1, N, L), n_arrays=40,
                                         grid_rank=1),
        interpret=interpret,
    )(*_static_inputs(pp), W, u, xf, yf, zf, df)


def _make_install_kernel(N: int, P: int):
    def kernel(yz_ref, m_ref, ohza_ref, ohzb_ref, u_ref,
               xf_ref, yf_ref, zf_ref, df_ref, dst_ref):
        s, ly, lz, in_a, in_b, sh_a, sh_b = _masks(N, P, yz_ref)
        dst_ref[0] = _install(u_ref[0], N, P, s, ly, lz, in_a, in_b,
                              sh_a, sh_b, xf_ref[0], yf_ref[0], zf_ref[0],
                              df_ref[0], ohza_ref, ohzb_ref)

    return kernel


@functools.partial(jax.jit, static_argnames=("N", "P", "interpret"))
def pair_install(u, xf, yf, zf, df, N: int, P: int, interpret: bool = False):
    """Materialize consistent blocks: write the face values back into the
    block boundaries (the finalize step of a chain)."""
    Cp = u.shape[0]
    L = N * P
    pp = tp.PairPlan(N, P)
    kernel = _make_install_kernel(N, P)
    data = pl.BlockSpec((1, N, L), lambda c: (c, 0, 0),
                        memory_space=pltpu.VMEM)
    grid_spec = pl.GridSpec(
        grid=(Cp,),
        in_specs=[*_static_specs(N, P), data, *_face_specs(N, P)],
        out_specs=data,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(u.shape, u.dtype),
        compiler_params=_compiler_params((1, N, L), n_arrays=16,
                                         grid_rank=1),
        interpret=interpret,
    )(*_static_inputs(pp), u, xf, yf, zf, df)


def _make_extract_kernel(N: int, P: int):
    def kernel(yz_ref, m_ref, ohza_ref, ohzb_ref, u_ref,
               xfo_ref, yfo_ref, zfo_ref, dfo_ref):
        s, ly, lz, in_a, in_b, sh_a, sh_b = _masks(N, P, yz_ref)
        xfa, xfb, yfa, yfb, zfa, zfb, dfa, dfb = _extract(
            u_ref[0], N, P, s, ly, lz, in_a, in_b, sh_a, sh_b,
            ohza_ref, ohzb_ref)
        xfo_ref[0, 0:1, :] = xfa
        xfo_ref[0, 1:2, :] = xfb
        yfo_ref[0, 0] = yfa
        yfo_ref[0, 1] = yfb
        zfo_ref[0, 0] = zfa
        zfo_ref[0, 1] = zfb
        dfo_ref[0, 0:1, :] = dfa
        dfo_ref[0, 1:2, :] = dfb

    return kernel


@functools.partial(jax.jit, static_argnames=("N", "P", "interpret"))
def pair_extract(u, N: int, P: int, interpret: bool = False):
    """Extract the boundary values of consistent blocks into face arrays
    (the chain-start step)."""
    Cp = u.shape[0]
    L = N * P
    pp = tp.PairPlan(N, P)
    kernel = _make_extract_kernel(N, P)
    data = pl.BlockSpec((1, N, L), lambda c: (c, 0, 0),
                        memory_space=pltpu.VMEM)
    grid_spec = pl.GridSpec(
        grid=(Cp,),
        in_specs=[*_static_specs(N, P), data],
        out_specs=list(_face_specs(N, P)),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=_face_shapes(Cp, N, P),
        compiler_params=_compiler_params((1, N, L), n_arrays=16,
                                         grid_rank=1),
        interpret=interpret,
    )(*_static_inputs(pp), u)
