"""Robust on-device timing for benchmarks.

Through a remote-tunneled device (or any async dispatch path) per-call
wall-clock timing measures RPC latency, not kernel time: a host->device
round-trip costs ~20 ms while the kernel may take 20 us. The only robust
methodology is the reference's (repeated apply inside the timed region,
reference: apps/benchmarks/ApplyBenchmark/ApplyBenchmark.cpp:95-104) done
the XLA way:

  * run the op chained L times inside ONE jitted ``lax.scan``/``fori_loop``,
  * force completion by fetching a result-dependent scalar to the host,
  * measure at two lengths L1 < L2 and report the MARGINAL time per
    iteration (L2 - L1 differencing removes fetch latency, dispatch cost
    and any loop-invariant prologue).
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp


def _chain(step: Callable, length: int, unroll: bool = True):
    """jit(x -> scalar) running ``step`` ``length`` times, chained.

    Unrolled by default: scan-wrapped Pallas kernels have shown pathological
    compile behavior through remote-compile backends, and an unrolled chain
    re-uses the same compiled kernel anyway."""

    def run(x):
        y = x
        if unroll:
            for _ in range(length):
                y = step(y)
        else:
            y, _ = jax.lax.scan(lambda c, _: (step(c), None), y, None,
                                length=length)
        leaves = jax.tree_util.tree_leaves(y)
        return sum(jnp.sum(l) for l in leaves)

    return jax.jit(run)

def _best_time(fn, x, repeats: int) -> float:
    float(fn(x))  # warm / compile
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(fn(x))  # scalar fetch = true completion barrier
        best = min(best, time.perf_counter() - t0)
    return best


def marginal_time(step: Callable, x, l1: int = 8, l2: int = 32,
                  repeats: int = 3) -> float:
    """Marginal seconds per application of ``step`` (pytree -> pytree of the
    same structure), measured as (t(l2) - t(l1)) / (l2 - l1)."""
    t1 = _best_time(_chain(step, l1), x, repeats)
    t2 = _best_time(_chain(step, l2), x, repeats)
    return max((t2 - t1) / (l2 - l1), 1e-12)


def auto_time(step: Callable, x, repeats: int = 5,
              min_window_s: float = 0.06, max_len: int = 192) -> float:
    """Marginal time with the chain length chosen so the timed window is
    long enough (>= min_window_s) to swamp RPC/dispatch jitter (~ms through
    the tunnel).  l2 is estimated from t(l1) in one step (each chain length
    costs a fresh compile of the unrolled chain — keep that to two)."""
    l1 = 4
    t1 = _best_time(_chain(step, l1), x, repeats)
    lm = 32
    tm = _best_time(_chain(step, lm), x, repeats)
    marg = max((tm - t1) / (lm - l1), 1e-7)  # first marginal estimate
    if (lm - l1) * marg >= min_window_s:
        return marg
    l2 = min(max_len, l1 + int(min_window_s / marg) + 1)
    if l2 <= lm:
        return marg
    t2 = _best_time(_chain(step, l2), x, repeats)
    return max((t2 - t1) / (l2 - l1), 1e-12)
