"""FEFunctionRegistry / BlockFunction (reference: functions/ dir)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hyteg_tpu.functions.registry import BlockFunction, FEFunctionRegistry


def test_registry_roundtrip():
    reg = FEFunctionRegistry()
    reg.add("u", "P1", jnp.ones(3))
    reg.add("T", "P1", jnp.zeros(3))
    reg.add("p", "P0", jnp.ones(2))
    assert set(reg.names("P1")) == {"u", "T"}
    assert reg.names("P0") == ["p"]
    assert reg.kind("p") == "P0"
    assert "u" in reg and len(reg) == 3
    with pytest.raises(ValueError):
        reg.add("u", "P2", jnp.ones(1))
    reg.remove("u")
    assert "u" not in reg
    assert [n for n, _ in reg.items("P1")] == ["T"]


def test_block_function_arithmetic_and_dot():
    a = BlockFunction((jnp.asarray([1.0, 2.0]), jnp.asarray([[3.0]])))
    b = BlockFunction((jnp.asarray([0.5, 0.5]), jnp.asarray([[2.0]])))
    c = 2.0 * (a + b) - a
    np.testing.assert_allclose(np.asarray(c[0]), [2.0, 3.0])
    np.testing.assert_allclose(np.asarray(c[1]), [[7.0]])
    assert float(a.dot(b)) == pytest.approx(0.5 + 1.0 + 6.0)
    z = a.zeros_like()
    assert float(z.norm()) == 0.0
    # jit-compatible as a pytree
    f = jax.jit(lambda x, y: (x + y).dot(x))
    assert np.isfinite(float(f(a, b)))


def test_block_function_custom_dots():
    w = BlockFunction(
        (jnp.ones(2), jnp.ones(3)),
        dots=(lambda x, y: 2.0 * jnp.sum(x * y), lambda x, y: jnp.sum(x * y)))
    assert float(w.dot(w)) == pytest.approx(2.0 * 2 + 3.0)
