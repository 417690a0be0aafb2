"""Native setup-core tests: the C++ library must agree exactly with the
numpy fallbacks (reference parity: the reference's entire setup path is
native C++)."""

import numpy as np
import pytest

from hyteg_tpu import native
from hyteg_tpu.primitives.loadbalancing import partition_greedy


def test_native_builds_and_loads():
    assert native.available(), "g++ is in the image; the build must succeed"


def test_morton_matches_numpy():
    rng = np.random.default_rng(0)
    for dim in (2, 3):
        pts = rng.uniform(-2, 5, size=(257, dim))
        nat = native.morton_codes(pts, bits=16)
        # numpy reference
        lo, hi = pts.min(axis=0), pts.max(axis=0)
        q = ((pts - lo) / np.where(hi - lo == 0, 1.0, hi - lo)
             * ((1 << 16) - 1)).astype(np.uint64)
        ref = np.zeros(len(pts), dtype=np.uint64)
        for b in range(16):
            for d in range(dim):
                ref |= (((q[:, d] >> np.uint64(b)) & np.uint64(1))
                        << np.uint64(b * dim + d))
        np.testing.assert_array_equal(nat, ref)


def test_argsort_and_rows():
    rng = np.random.default_rng(1)
    keys = rng.integers(0, 2**63, size=500).astype(np.uint64)
    np.testing.assert_array_equal(native.argsort_u64(keys),
                                  np.argsort(keys, kind="stable"))
    rows = rng.integers(0, 1000, size=(100, 4)).astype(np.int64)
    np.testing.assert_array_equal(native.sort_rows_i64(rows),
                                  np.sort(rows, axis=1))


def test_greedy_matches_python():
    rng = np.random.default_rng(2)
    w = rng.uniform(0.1, 3.0, size=97)
    nat = native.greedy_partition(w, 5)
    ref = partition_greedy(5, w)
    np.testing.assert_array_equal(nat, ref)
