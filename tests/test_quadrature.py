"""Quadrature/basis engine checks (reference: tests/hyteg/forms/)."""

import itertools

import numpy as np
import pytest

from hyteg_tpu.operators import forms, quadrature as q


@pytest.mark.parametrize("dim", [2, 3])
@pytest.mark.parametrize("degree", [1, 2, 3, 4, 5])
def test_rule_exactness(dim, degree):
    pts, w = q.simplex_rule(dim, degree)
    rng = np.random.default_rng(degree)
    for _ in range(5):
        powers = tuple(int(p) for p in rng.integers(0, degree + 1, dim))
        if sum(powers) > degree:
            continue
        got = float(np.sum(w * np.prod(pts ** np.array(powers), axis=1)))
        assert np.isclose(got, q.monomial_integral(powers), atol=1e-12)


@pytest.mark.parametrize("dim", [2, 3])
def test_p1_quadrature_matches_closed_form(dim):
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    verts = jnp.asarray(rng.standard_normal((5, dim + 1, dim)))
    pts, w = q.simplex_rule(dim, 2)
    grads = q.p1_grads_at(dim, pts)
    vals = q.p1_basis_at(dim, pts)
    K = np.asarray(q.stiffness_elmat(verts, grads, w))
    K_ref = np.asarray(forms.laplace_form(verts))
    assert np.allclose(K, K_ref, atol=1e-10)
    import jax

    M = np.stack([np.asarray(q.mass_elmat(verts[i], vals, w)) for i in range(5)])
    M_ref = np.asarray(forms.mass_form(verts))
    assert np.allclose(M, M_ref, atol=1e-10)


@pytest.mark.parametrize("dim", [2, 3])
def test_p2_basis_nodal_property(dim):
    offs = q.p2_offsets(dim)
    nodes = offs / 2.0  # reference coordinates of the nodes
    vals = q.p2_basis_at(dim, nodes)
    assert np.allclose(vals, np.eye(offs.shape[0]), atol=1e-12)
    # partition of unity at random points
    rng = np.random.default_rng(1)
    pts = rng.dirichlet(np.ones(dim + 1), size=20)[:, 1:]
    assert np.allclose(q.p2_basis_at(dim, pts).sum(axis=0), 1.0, atol=1e-12)
    # gradients: finite-difference check
    eps = 1e-6
    for ax in range(dim):
        dp = pts.copy()
        dp[:, ax] += eps
        fd = (q.p2_basis_at(dim, dp) - q.p2_basis_at(dim, pts)) / eps
        an = q.p2_grads_at(dim, pts)[:, :, ax]
        assert np.allclose(fd, an, atol=1e-4)


def test_p2_stiffness_exact_on_quadratics():
    """P2 interpolates quadratics exactly: K u_quad reproduces integrals of
    grad(u).grad(phi). Check row sums vanish (constants in the kernel)."""
    dim = 3
    rng = np.random.default_rng(2)
    import jax.numpy as jnp

    base = np.array([[0.0, 0, 0], [1.0, 0, 0], [0, 1.0, 0], [0, 0, 1.0]])
    verts = jnp.asarray(base + 0.1 * rng.standard_normal((dim + 1, dim)))
    pts, w = q.simplex_rule(dim, 2)
    K = np.asarray(q.stiffness_elmat(verts, q.p2_grads_at(dim, pts), w))
    scale = np.abs(K).max()
    assert np.allclose(K.sum(axis=1), 0.0, atol=1e-5 * scale)  # f32 path
    assert np.allclose(K, K.T, atol=1e-5 * scale)


def test_p2_mass_total():
    dim = 3
    import jax.numpy as jnp

    verts = jnp.asarray(
        [[0.0, 0, 0], [1.0, 0, 0], [0, 1.0, 0], [0, 0, 1.0]]
    )
    pts, w = q.simplex_rule(dim, 4)
    M = np.asarray(q.mass_elmat(verts, q.p2_basis_at(dim, pts), w))
    # sum of all entries = volume of the simplex
    assert np.isclose(M.sum(), 1.0 / 6.0, atol=1e-12)
