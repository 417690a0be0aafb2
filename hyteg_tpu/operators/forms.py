"""Element-matrix forms for affine simplices.

Analog of the reference's form layer (reference: src/hyteg/forms/P1Form.hpp:
28-46 and the HOG-generated form files): a form maps physical element-vertex
coordinates to the local element matrix. Here forms are plain vectorized JAX
functions evaluated *inside* the operator setup (constant/affine path) or
apply (variable path) — replacing generated C++ with jnp einsums that XLA
fuses.

All forms take ``verts`` of shape (..., nv, dim) (nv = dim + 1 vertices,
physical coordinates) and return (..., nv, nv).
"""

from __future__ import annotations

import jax.numpy as jnp


def _jacobian(verts: jnp.ndarray) -> jnp.ndarray:
    """(..., dim, dim): columns are edge vectors v_i - v_0."""
    return jnp.swapaxes(verts[..., 1:, :] - verts[..., :1, :], -1, -2)


def simplex_volume(verts: jnp.ndarray) -> jnp.ndarray:
    """Unsigned volume (area in 2D) of the simplices."""
    J = _jacobian(verts)
    dim = verts.shape[-1]
    factor = 6.0 if dim == 3 else 2.0
    return jnp.abs(jnp.linalg.det(J)) / factor


def p1_gradients(verts: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Physical gradients of the P1 basis: (..., nv, dim), and volumes.

    Reference gradients: hat_0 = -1 vector, hat_i = e_i; physical
    g = J^{-T} ghat.
    """
    J = _jacobian(verts)
    dim = verts.shape[-1]
    ghat = jnp.concatenate(
        [-jnp.ones((1, dim)), jnp.eye(dim)], axis=0
    )  # (nv, dim)
    Jinv = jnp.linalg.inv(J)
    g = jnp.einsum("ad,...de->...ae", ghat, Jinv)  # ghat @ J^{-1}
    vol = simplex_volume(verts)
    return g, vol


def laplace_form(verts: jnp.ndarray) -> jnp.ndarray:
    """Stiffness matrix of -div(grad u): vol * g g^T
    (reference form family: p1_diffusion)."""
    g, vol = p1_gradients(verts)
    return vol[..., None, None] * jnp.einsum("...ad,...bd->...ab", g, g)


def mass_form(verts: jnp.ndarray) -> jnp.ndarray:
    """Consistent P1 mass matrix: vol (1 + I) / 20 (3D) or / 12 (2D)
    (reference form family: p1_mass)."""
    dim = verts.shape[-1]
    nv = dim + 1
    denom = 20.0 if dim == 3 else 12.0
    base = (jnp.ones((nv, nv)) + jnp.eye(nv)) / denom
    vol = simplex_volume(verts)
    return vol[..., None, None] * base


def diffusion_plus_mass_form(kappa: float = 1.0, sigma: float = 1.0):
    """-kappa * Laplace + sigma * mass — the implicit-diffusion operator of
    reference UnsteadyDiffusion (src/hyteg/composites/UnsteadyDiffusion.hpp)."""

    def form(verts):
        return kappa * laplace_form(verts) + sigma * mass_form(verts)

    return form


def div_k_grad_form_factory():
    """Element matrix of -div(k grad u) with element-averaged coefficient:
    since P1 gradients are constant per element, elMat = (mean k) * laplace.
    The averaging happens in the variable-coefficient operator; this factory
    returns the geometric part."""
    return laplace_form
