"""Spherical harmonics + plate-velocity tests
(reference: tests/terraneo/ sphericalharmonics and plates tests)."""

import numpy as np
import pytest

import jax.numpy as jnp

from hyteg_tpu.terraneo.plates import (
    PlateStage,
    PlateVelocityProvider,
    synthetic_stage,
)
from hyteg_tpu.terraneo.sphericalharmonics import (
    num_coeffs,
    sh_basis,
    sh_index,
    sh_synthesis,
    temperature_perturbation,
)


def _sphere_quadrature(n_theta=48, n_phi=96):
    """Gauss-Legendre x uniform-phi quadrature: nodes (N, 3), weights (N,)
    summing to 4 pi."""
    xg, wg = np.polynomial.legendre.leggauss(n_theta)  # cos(theta) in [-1,1]
    phi = (np.arange(n_phi) + 0.5) * 2 * np.pi / n_phi
    ct, ph = np.meshgrid(xg, phi, indexing="ij")
    st = np.sqrt(1 - ct**2)
    xyz = np.stack([st * np.cos(ph), st * np.sin(ph), ct], axis=-1)
    w = np.broadcast_to(wg[:, None] * (2 * np.pi / n_phi), ct.shape)
    return xyz.reshape(-1, 3), w.reshape(-1)


def test_sh_orthonormal():
    lmax = 5
    xyz, w = _sphere_quadrature()
    Y = np.asarray(sh_basis(lmax, jnp.asarray(xyz)), dtype=np.float64)
    G = (Y * w[:, None]).T @ Y
    np.testing.assert_allclose(G, np.eye(num_coeffs(lmax)), atol=2e-3)


def test_sh_known_values():
    xyz = jnp.asarray([[0.0, 0.0, 1.0], [1.0, 0.0, 0.0]])
    Y = np.asarray(sh_basis(2, xyz))
    assert np.allclose(Y[:, sh_index(0, 0)], 1 / np.sqrt(4 * np.pi),
                       atol=1e-6)
    # Y_10 = sqrt(3/4pi) z
    assert np.isclose(Y[0, sh_index(1, 0)], np.sqrt(3 / (4 * np.pi)),
                      atol=1e-6)
    assert np.isclose(Y[1, sh_index(1, 0)], 0.0, atol=1e-6)


def test_sh_synthesis_roundtrip():
    lmax = 3
    rng = np.random.default_rng(1)
    c = rng.normal(size=num_coeffs(lmax))
    xyz, w = _sphere_quadrature()
    f = np.asarray(sh_synthesis(jnp.asarray(c), lmax, jnp.asarray(xyz)))
    Y = np.asarray(sh_basis(lmax, jnp.asarray(xyz)))
    c_rec = (Y * (w * f)[:, None]).sum(axis=0)
    np.testing.assert_allclose(c_rec, c, atol=5e-3)


def test_temperature_perturbation_bounds():
    lmax = 2
    c = np.zeros(num_coeffs(lmax))
    c[sh_index(2, 1)] = 1.0
    ic = temperature_perturbation(lmax, c, rmin=0.5, rmax=1.0)
    rng = np.random.default_rng(2)
    x = rng.normal(size=(500, 3))
    x = x / np.linalg.norm(x, axis=-1, keepdims=True)
    for r, exp in ((0.5, 1.0), (1.0, 0.0)):
        vals = np.asarray(ic(jnp.asarray(r * x)))
        np.testing.assert_allclose(vals, exp, atol=1e-5)  # damped at edges


def test_plate_velocity_tangential_and_rigid():
    st = synthetic_stage(num_plates=5, seed=3, max_rate=2.0)
    prov = PlateVelocityProvider([st], smoothing=0.02)
    rng = np.random.default_rng(4)
    x = rng.normal(size=(300, 3))
    x = 1.2 * x / np.linalg.norm(x, axis=-1, keepdims=True)
    v = np.asarray(prov.velocity(jnp.asarray(x)))
    # tangential: v . x = 0 (each omega x x is orthogonal to x)
    dots = np.abs(np.einsum("nd,nd->n", v, x))
    assert dots.max() < 1e-5 * (np.linalg.norm(v, axis=-1).max() + 1)
    # deep inside a plate, velocity == rigid rotation of that plate
    seed0 = st.seeds[0]
    xs = jnp.asarray(seed0[None] * 1.2)
    v0 = np.asarray(prov.velocity(xs))[0]
    np.testing.assert_allclose(v0, np.cross(st.omegas[0], 1.2 * seed0),
                               atol=1e-4)


def test_plate_stages_piecewise_in_time():
    s0 = synthetic_stage(num_plates=4, seed=5, age=0.0)
    s1 = synthetic_stage(num_plates=4, seed=6, age=10.0)
    prov = PlateVelocityProvider([s0, s1], smoothing=0.05)
    x = jnp.asarray([[0.0, 0.0, 1.0]])
    v_young = np.asarray(prov.velocity(x, age=5.0))
    v_old = np.asarray(prov.velocity(x, age=15.0))
    assert not np.allclose(v_young, v_old)
