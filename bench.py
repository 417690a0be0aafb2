"""Headline benchmark: matrix-free P1 Laplace operator apply throughput.

Mirrors the reference's ApplyBenchmark
(reference: apps/benchmarks/ApplyBenchmark/ApplyBenchmark.cpp:104 —
GDoF/s = global DoF updates per second of repeated operator apply), run
on the TPU-native structured box fast path: the unit cube meshed as
2x2x2 Kuhn-subdivided boxes at level 7 — a 257^3 node grid, 17.0M DoFs,
the same P1 FE discretization the reference's macro-tet path produces on
meshCuboid, aggregated into one dense block (hyteg_tpu/structured/).

Timing methodology: the device sits behind an async tunnel where
per-dispatch wall-clock measures RPC latency (~20 ms), so the apply is
chained L times inside one jitted program with a result-dependent scalar
fetched at the end, at two lengths; the marginal time per apply removes
fetch latency and loop-invariant prologue (hyteg_tpu/core/benchtime.py).

Prints ONE JSON line.  ``vs_baseline`` is the measured fraction of the
single-chip HBM-bandwidth roofline for this kernel — one src read + one
dst write (8 B/DoF, f32) at nominal chip bandwidth; the reference's
target is >= 70% of its roofline (BASELINE.md).
"""

import json

import jax
import jax.numpy as jnp


def main():
    from hyteg_tpu.core.benchtime import _best_time, _chain
    from hyteg_tpu.structured import BoxDomain, BoxStencilOperator

    dom = BoxDomain((2, 2, 2), level=7)
    op = BoxStencilOperator(dom)

    key = jax.random.PRNGKey(0)
    u = jax.random.normal(key, dom.block_shape, dtype=jnp.float32)

    l1, l2 = 4, 16
    t1 = _best_time(_chain(lambda v: op.apply_raw(v), l1), u, 3)
    t2 = _best_time(_chain(lambda v: op.apply_raw(v), l2), u, 3)
    dt = max((t2 - t1) / (l2 - l1), 1e-12)

    gdofs = dom.num_dofs() / 1e9
    gdofs_per_s = gdofs / dt

    # single-chip bandwidth roofline: src read + dst write, f32
    roofline_gdofs_s = _hbm_bandwidth_gb_s() / 8.0
    vs = gdofs_per_s / roofline_gdofs_s

    print(
        json.dumps(
            {
                "metric": "p1_laplace_apply_gdofs_per_s",
                "value": round(gdofs_per_s, 4),
                "unit": "GDoF/s",
                "vs_baseline": round(vs, 4),
            }
        )
    )


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


if __name__ == "__main__":
    main()
