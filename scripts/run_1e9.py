"""The 1e9-DoF sharded box GMG run (virtual 8-device CPU mesh).

(8, 8, 8) boxes at level 7 = a 1025^3 node grid, 1.077e9 DoFs, row-slab
sharded over 8 devices — the correctness-scale analog of the reference's
extreme-scale GMG runs (reference: apps/2020-scaling-workshop/
Helpers.cpp:103-532; SISC 2022 TME paper).  Writes BILLION_DOF.json with
per-cycle residuals and wall times; the single-chip-extrapolated v5e
cycle time is derived from the measured level-7 single-chip apply
bandwidth (BENCH_r04 headline) and the V-cycle's per-cycle touched
bytes.

Usage:  python scripts/run_1e9.py [cycles]
"""

import json
import sys
import time

import jax

jax.config.update("jax_platforms", "cpu")

import os

if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8")

import jax.numpy as jnp
import numpy as np


def main():
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from hyteg_tpu.structured import BoxDomain
    from hyteg_tpu.structured import spmd

    cycles = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    mesh = spmd.device_mesh(jax.devices())
    dom = BoxDomain((8, 8, 8), level=7)
    print(f"devices={len(jax.devices())} dofs={dom.num_dofs():,}", flush=True)

    t0 = time.time()
    levels = spmd.build_spmd_hierarchy(dom, mesh, min_level=3, eig_iters=12)
    t_setup = time.time() - t0
    print(f"hierarchy built in {t_setup:.1f}s; eigs="
          f"{[round(l.eig_max, 4) for l in levels]}", flush=True)

    f = dom.interpolate(lambda x, y, z: jnp.sin(jnp.pi * x / 8)
                        * jnp.sin(jnp.pi * y / 8) * jnp.sin(jnp.pi * z / 8))

    cycle = jax.jit(lambda x, b: spmd.spmd_vcycle(levels, x, b,
                                                  coarse_iters=25))
    inner = levels[0].inner
    b = inner * f
    x = jnp.zeros_like(b)

    rns = [float(spmd._norm(inner * (b - levels[0].apply_global(x))))]
    walls = []
    for c in range(cycles):
        t0 = time.time()
        x = cycle(x, b)
        jax.block_until_ready(x)
        walls.append(time.time() - t0)
        rn = float(jax.jit(
            lambda x: spmd._norm(inner * (b - levels[0].apply_global(x))))(x))
        rns.append(rn)
        print(f"cycle {c + 1}: residual {rn:.4e} rate {rn / rns[-2]:.3f} "
              f"wall {walls[-1]:.1f}s", flush=True)

    # v5e extrapolation: the V(2,2) cycle touches ~(4 smoother applies +
    # 1 residual apply + transfers) ~ 14 full fine-grid passes across the
    # level sum (geometric factor 8/7); the measured single-chip apply
    # runs at ~30 GDoF/s (BENCH_r04), i.e. ~0.57 ms per 17M-DoF apply.
    per_apply_s_per_dof = 1.0 / 30.0e9
    est_v5e_cycle_s = 7 * per_apply_s_per_dof * dom.num_dofs() * (8 / 7)

    rec = {
        "metric": "box_gmg_1e9_dofs",
        "dofs": dom.num_dofs(),
        "devices": len(jax.devices()),
        "cycles": cycles,
        "residuals": [f"{r:.4e}" for r in rns],
        "rates": [round(rns[i + 1] / rns[i], 4) for i in range(len(rns) - 1)],
        "wall_s_per_cycle_cpu": [round(w, 1) for w in walls],
        "est_v5e_single_chip_cycle_s": round(est_v5e_cycle_s, 3),
        "note": "correctness-scale run on the 8-device virtual CPU mesh; "
                "v5e estimate from the measured 30 GDoF/s apply and ~7 "
                "fine-apply-equivalents per V(2,2) cycle",
    }
    with open("BILLION_DOF.json", "w") as fh:
        json.dump(rec, fh, indent=1)
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
