"""Spectral bounds by power iteration.

Reference: src/hyteg/solvers/numerictools/SpectrumEstimation.hpp:56
(estimateSpectralRadiusWithPowerIteration). Generic over an apply callable;
the Chebyshev glue in solvers/smoothers.py uses the same scheme specialized
to D^-1 A.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def estimate_spectral_radius_op(apply_fn: Callable, dot_fn: Callable,
                                x0, iters: int = 20):
    """Power iteration for the dominant eigenvalue of apply_fn."""

    def body(_, state):
        x, lam = state
        y = apply_fn(x)
        lam = dot_fn(x, y) / jnp.maximum(dot_fn(x, x), 1e-300)
        nrm = jnp.sqrt(dot_fn(y, y))
        return y / jnp.maximum(nrm, 1e-300), lam

    _, lam = jax.lax.fori_loop(0, iters, body,
                               (x0, jnp.asarray(0.0, dtype=jnp.float32)))
    return lam
