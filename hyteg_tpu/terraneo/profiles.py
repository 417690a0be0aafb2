"""Radial profiles: binned radial averages of fields and radial viscosity
laws (reference: src/terraneo/helpers/RadialProfiles.hpp,
src/terraneo/helpers/Viscosity.hpp)."""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np


def viscosity_profile_arrhenius(E: float):
    """eta(T) = exp(E * (0.5 - T)): Frank-Kamenetskii / Arrhenius-lite law
    (temperature-dependent viscosity; E = 0 gives constant eta = 1)."""

    def eta(T):
        return jnp.exp(E * (0.5 - T))

    return eta


@dataclasses.dataclass
class RadialProfile:
    """Mean / min / max of a nodal field per radial shell bin
    (reference: terraneo RadialProfiles computed via MPI reductions —
    here one-shot segment reductions on device)."""

    radii: np.ndarray
    mean: np.ndarray
    vmin: np.ndarray
    vmax: np.ndarray


def radial_profile(space, u, rmin: float, rmax: float, nbins: int,
                   sd=None) -> RadialProfile:
    """space: P1Space-like (with coords/unique_weight); u: its DoF block."""
    node_sp = getattr(space, "node_space", space)
    sd = node_sp.resolve_sd(sd)
    xyz = node_sp.coords_from(sd.cell_vertices)
    r = jnp.sqrt(jnp.sum(xyz[..., : node_sp.dim] ** 2, axis=-1))
    w = node_sp.unique_weight(sd)
    bins = jnp.clip(
        ((r - rmin) / (rmax - rmin) * nbins).astype(jnp.int32), 0, nbins - 1
    )
    bflat, wflat, uflat = bins.reshape(-1), w.reshape(-1), u.reshape(-1)
    import jax

    wsum = jax.ops.segment_sum(wflat, bflat, num_segments=nbins)
    usum = jax.ops.segment_sum(wflat * uflat, bflat, num_segments=nbins)
    mean = usum / jnp.maximum(wsum, 1e-30)
    big = jnp.asarray(jnp.inf, u.dtype)
    umin = jax.ops.segment_min(jnp.where(wflat > 0, uflat, big), bflat,
                               num_segments=nbins)
    umax = jax.ops.segment_max(jnp.where(wflat > 0, uflat, -big), bflat,
                               num_segments=nbins)
    centers = rmin + (np.arange(nbins) + 0.5) / nbins * (rmax - rmin)
    return RadialProfile(
        radii=centers,
        mean=np.asarray(mean),
        vmin=np.asarray(umin),
        vmax=np.asarray(umax),
    )
