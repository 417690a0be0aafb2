"""Bisect the committed level-6 box-GMG divergence: dtype x eig x level."""
import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp

from hyteg_tpu.operators import forms
from hyteg_tpu.structured.box import BoxDomain
from hyteg_tpu.structured.operator import BoxStencilOperator
from hyteg_tpu.structured import gmg


def solve(level, dtype, per_level_eig, cycles=8, min_level=2):
    dom = BoxDomain((2, 2, 2), level, dtype=dtype)
    if per_level_eig:
        levels = []
        d = dom
        while True:
            op = BoxStencilOperator(d)
            levels.append(gmg.BoxLevel(d, op, gmg.estimate_eig_max(op)))
            if d.level <= min_level:
                break
            d = d.coarse()
    else:
        levels = gmg.build_hierarchy(dom, min_level=min_level)
    exact = lambda x, y, z: (jnp.sin(jnp.pi * x) * jnp.sin(jnp.pi * y)
                             * jnp.sin(jnp.pi * z))
    f = dom.interpolate(lambda x, y, z: 3 * jnp.pi**2 * exact(x, y, z))
    b = BoxStencilOperator(dom, forms.mass_form).apply_raw(f)
    u, rns = jax.jit(lambda b: gmg.solve_poisson(levels, b, cycles=cycles))(b)
    rns = [float(r) for r in rns]
    eigs = [l.eig_max for l in levels]
    return rns, eigs


for level in (4, 5, 6):
    for dtype in ("float32", "float64"):
        for ple in (False, True):
            rns, eigs = solve(level, dtype, ple)
            rates = [rns[i] / rns[i - 1] for i in range(1, len(rns))]
            print(f"L{level} {dtype:8s} per_level_eig={ple!s:5s} "
                  f"eig0={eigs[0]:.4f} rates="
                  f"{['%.3f' % r for r in rates]}")
