"""Headline benchmark: matrix-free P1 Laplace operator apply throughput.

Mirrors the reference's ApplyBenchmark
(reference: apps/benchmarks/ApplyBenchmark/ApplyBenchmark.cpp:104 —
GDoF/s = global inner DoF updates per second of repeated operator apply).

Timing methodology: the device is reached through an async tunnel where
per-dispatch wall-clock measures RPC latency (~20 ms) rather than kernel
time, so the apply is chained L times inside one jitted program with a
result-dependent scalar fetched to the host, at two lengths; the marginal
time per apply (t(L2) - t(L1)) / (L2 - L1) removes fetch latency and any
loop-invariant prologue (see hyteg_tpu/core/benchtime.py).

Prints ONE JSON line. ``vs_baseline`` is the measured fraction of the
single-chip HBM-bandwidth roofline for this kernel — src read + dst write
of the dense flat blocks at nominal chip bandwidth (the reference targets
>= 70% of its roofline; see BASELINE.md).
"""

import json

import jax
import jax.numpy as jnp


def main():
    from hyteg_tpu.core.benchtime import auto_time
    from hyteg_tpu.mesh import meshinfo as mi
    from hyteg_tpu.operators import forms
    from hyteg_tpu.operators.p1_elementwise import P1ElementwiseOperator
    from hyteg_tpu.primitives.storage import CellStorage
    from hyteg_tpu.functions.p1 import P1Space

    level = 6
    storage = CellStorage(mi.mesh_unit_cube(2), num_shards=1)  # 48 macros
    space = P1Space(storage, level)
    op = P1ElementwiseOperator(space, forms.laplace_form)
    sd = space.resolve_sd(None)

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, space.block_shape, dtype=space.dtype)
    x = x * jnp.asarray(space.vertex_mask[None], dtype=space.dtype)

    dt = auto_time(lambda v: op.apply_raw(v, sd=sd), x)

    gdofs = space.num_global_dofs() / 1e9
    gdofs_per_s = gdofs / dt

    # single-chip bandwidth roofline for this kernel: src read + dst write
    # of the dense (C, N, N*pitch) blocks, f32 (weight traffic negligible)
    hbm_gb_s = _hbm_bandwidth_gb_s()
    bytes_per_apply = 2 * 4 * space.block_size
    roofline_gdofs_s = hbm_gb_s * 1e9 / bytes_per_apply * gdofs
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
