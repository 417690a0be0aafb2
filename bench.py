"""Headline benchmark: matrix-free P1 Laplace operator apply throughput.

Mirrors the reference's ApplyBenchmark
(reference: apps/benchmarks/ApplyBenchmark/ApplyBenchmark.cpp:104 —
GDoF/s = global DoF updates per second of repeated operator apply).

Three paths are measured (one JSON line each; the first is the headline):

  1. box fast path — the unit cube meshed as 2x2x2 Kuhn-subdivided boxes
     at level 7: a 257^3 node grid, 17.0M DoFs, aggregated into one dense
     block (hyteg_tpu/structured/),
  2. general macro-tet const-stencil path — the path annulus/shell/
     TerraNeo meshes ride (kernels/p1_const_stencil.py; reference:
     src/constant_stencil_operator/P1ConstantOperator.cpp:239-667),
  3. blended (icosahedral-shell) exact vargeom apply
     (operators/p1_blended.py).

Every timed kernel first passes an on-device correctness gate at the
exact benchmarked shapes (core/benchgate.py): the Pallas path must match
the independent XLA reference path, else the bench refuses to print.

Timing methodology: the device sits behind an async tunnel where
per-dispatch wall-clock measures RPC latency (~20 ms), so the apply is
chained L times inside one jitted program with a result-dependent scalar
fetched at the end, at two lengths; the marginal time per apply removes
fetch latency and loop-invariant prologue (hyteg_tpu/core/benchtime.py).

``vs_baseline`` is the measured fraction of the single-chip HBM-bandwidth
roofline for this kernel — one src read + one dst write (8 B/DoF, f32) at
nominal chip bandwidth; the reference's target is >= 70% of its roofline
(BASELINE.md).
"""

import json

import jax
import jax.numpy as jnp


def _hbm_bandwidth_gb_s() -> float:
    dev = jax.devices()[0]
    kind = getattr(dev, "device_kind", "").lower()
    if "v5 lite" in kind or "v5e" in kind:
        return 819.0
    if "v5p" in kind or "v5" in kind:
        return 2765.0
    if "v4" in kind:
        return 1228.0
    if "v6" in kind:
        return 1638.0
    return 819.0  # conservative default


def bench_box(level: int = 7):
    from hyteg_tpu.core.benchgate import gate_box_apply
    from hyteg_tpu.core.benchtime import auto_time
    from hyteg_tpu.structured import BoxDomain, BoxStencilOperator

    dom = BoxDomain((2, 2, 2), level=level)
    op = BoxStencilOperator(dom)

    key = jax.random.PRNGKey(0)
    u = jax.random.normal(key, dom.block_shape, dtype=jnp.float32)

    gate_box_apply(op, u)

    dt = auto_time(lambda v: op.apply_raw(v), u, repeats=3)
    gdofs_per_s = dom.num_dofs() / 1e9 / dt
    vs = gdofs_per_s / (_hbm_bandwidth_gb_s() / 8.0)
    return {
        "metric": "p1_laplace_apply_gdofs_per_s",
        "value": round(gdofs_per_s, 4),
        "unit": "GDoF/s",
        "vs_baseline": round(vs, 4),
    }


def bench_tet(level: int = 6):
    """General macro-tet const-stencil apply on the unit-cube tet mesh
    (reference: ApplyBenchmark's P1 const Laplace)."""
    from hyteg_tpu.core.benchgate import gate_close
    from hyteg_tpu.core.benchtime import auto_time
    from hyteg_tpu.functions.p1 import P1Space
    from hyteg_tpu.mesh import meshinfo as mi
    from hyteg_tpu.operators import forms
    from hyteg_tpu.operators.p1_elementwise import (P1ElementwiseOperator,
                                                    p1_apply_local)
    from hyteg_tpu.primitives.storage import CellStorage

    storage = CellStorage(mi.mesh_unit_cube(2), num_shards=1)
    space = P1Space(storage, level)
    op = P1ElementwiseOperator(space, forms.laplace_form)
    sd = space.resolve_sd(None)

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, space.block_shape, dtype=space.dtype)
    x = x * jnp.asarray(space.vertex_mask[None], dtype=space.dtype)

    # gate: const-stencil Pallas kernel vs the independent generic
    # masked-accumulation path, on device at the benched shapes
    gate_close(
        op._apply_local(x, None),
        p1_apply_local(x, op.elmats, space.level, space.dim, space.pitch),
        f"tet const-stencil vs generic elementwise at {space.block_shape}",
    )

    dt = auto_time(lambda v: op.apply_raw(v, sd=sd), x, repeats=3)
    gdofs_per_s = space.num_global_dofs() / 1e9 / dt
    vs = gdofs_per_s / (_hbm_bandwidth_gb_s() / 8.0)
    return {
        "metric": "p1_tet_const_apply_gdofs_per_s",
        "value": round(gdofs_per_s, 4),
        "unit": "GDoF/s",
        "vs_baseline": round(vs, 4),
    }


def bench_shell(level: int = 3):
    """Blended icosahedral-shell apply, exact vargeom + LSQP surrogate
    (the TerraNeo geometry; reference: p1_diffusion_blending_q3 operator
    family and P1SurrogateOperator)."""
    from hyteg_tpu.core.benchtime import auto_time
    from hyteg_tpu.functions.p1 import P1Space
    from hyteg_tpu.geometry.maps import IcosahedralShellMap
    from hyteg_tpu.mesh import meshinfo as mi
    from hyteg_tpu.operators import forms
    from hyteg_tpu.operators.p1_blended import (P1BlendedOperator,
                                                P1SurrogateOperator)
    from hyteg_tpu.primitives.storage import CellStorage

    storage = CellStorage(mi.mesh_spherical_shell(2, 2, 0.55, 1.0),
                          num_shards=1)
    space = P1Space(storage, level)
    gmap = IcosahedralShellMap()
    op = P1BlendedOperator(space, forms.laplace_form, gmap)
    sd = space.resolve_sd(None)

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, space.block_shape, dtype=space.dtype)
    x = x * jnp.asarray(space.vertex_mask[None], dtype=space.dtype)

    dt = auto_time(lambda v: op.apply_raw(v, sd=sd), x, repeats=3)
    gdofs_per_s = space.num_global_dofs() / 1e9 / dt
    out = {
        "metric": "p1_shell_blended_apply_gdofs_per_s",
        "value": round(gdofs_per_s, 4),
        "unit": "GDoF/s",
        "vs_baseline": 0.0,
    }
    try:
        sur = P1SurrogateOperator(space, forms.laplace_form, gmap, degree=2)
        dt2 = auto_time(lambda v: sur.apply_raw(v, sd=sd), x, repeats=3)
        out["surrogate_gdofs_per_s"] = round(
            space.num_global_dofs() / 1e9 / dt2, 4)
    except Exception as e:
        out["surrogate_error"] = str(e)[:120]
    return out


def main():
    print(json.dumps(bench_box()), flush=True)
    for fn in (bench_tet, bench_shell):
        try:
            print(json.dumps(fn()), flush=True)
        except Exception as e:  # secondary lines must not kill the headline
            print(json.dumps({"metric": fn.__name__, "error": str(e)[:200]}),
                  flush=True)


if __name__ == "__main__":
    main()
