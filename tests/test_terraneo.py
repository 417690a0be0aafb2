"""TerraNeo-style convection simulation (coupled Stokes + energy) on the
annulus — the reference's apps/TerraNeo smoke path (tests/terraneo/)."""

import numpy as np
import jax.numpy as jnp
import pytest

from hyteg_tpu.core.types import DoFType
from hyteg_tpu.terraneo import ConvectionParameters, ConvectionSimulation
from hyteg_tpu.terraneo.profiles import viscosity_profile_arrhenius


@pytest.fixture(scope="module")
def sim():
    params = ConvectionParameters(
        dim=2, ntan=6, nrad=1, level=2, rayleigh=1e4,
        stokes_iters=80, stokes_rtol=1e-6, energy_cg_iters=120,
        max_dt=5e-4, profile_bins=6,
    )
    return ConvectionSimulation(params)


def test_initial_state(sim):
    T = np.asarray(sim.T)
    assert np.isfinite(T).all()
    assert T.min() >= -1e-5 and T.max() <= 1 + 1e-5
    prof = sim.temperature_profile()
    # conductive-ish: hot inner, cold outer, monotone trend
    assert prof.mean[0] > 0.7 and prof.mean[-1] < 0.3
    assert prof.mean[0] > prof.mean[-1]


def test_stokes_buoyancy_drives_flow(sim):
    iters = sim.solve_stokes()
    assert iters >= 1
    vmax = max(float(sim.T_space.dof_max(jnp.abs(v), DoFType.ALL))
               for v in sim.x.vel)
    assert np.isfinite(vmax) and vmax > 1.0  # Ra=1e4 drives visible flow
    # incompressibility: div u small relative to velocity scale
    div = sim.stokes.B.apply_div_local(sim.x.vel)
    div = sim.stokes.pre_space.exchange_add(div, sim.stokes._pre_sd)
    dnorm = float(sim.stokes.pre_space.dot(div, div, DoFType.ALL,
                                           sim.stokes._pre_sd))
    assert np.sqrt(dnorm) < 0.05 * vmax


def test_coupled_steps(sim):
    for _ in range(2):
        dt = sim.step()
        assert dt > 0
    T = np.asarray(sim.T)
    assert np.isfinite(T).all()
    # approximate maximum principle for advection-diffusion of T in [0,1]
    assert T.min() >= -0.05 and T.max() <= 1.05
    assert sim.time > 0 and sim.step_count >= 2


def test_checkpoint_roundtrip(sim, tmp_path):
    sim.p.checkpoint_dir = str(tmp_path)
    sim.store_checkpoint()
    import glob

    path = glob.glob(str(tmp_path / "*.npz"))[0]
    T_before = np.asarray(sim.T).copy()
    t_before = sim.time
    sim.T = jnp.zeros_like(sim.T)
    sim.restore_checkpoint(path)
    np.testing.assert_allclose(np.asarray(sim.T), T_before, atol=0)
    assert sim.time == t_before


def test_viscosity_law():
    eta = viscosity_profile_arrhenius(2.0)
    assert float(eta(jnp.asarray(0.5))) == pytest.approx(1.0)
    assert float(eta(jnp.asarray(1.0))) < 1.0 < float(eta(jnp.asarray(0.0)))


def test_eta_T_coupling_runs_and_varies():
    """visc_activation > 0 switches K to the epsilon operator with
    eta(T) = exp(E(0.5 - T)) (reference: terraneo viscosity laws)."""
    from hyteg_tpu.terraneo.params import ConvectionParameters
    from hyteg_tpu.terraneo.simulation import ConvectionSimulation
    import numpy as np

    p = ConvectionParameters(dim=2, ntan=6, nrad=1, level=2,
                             visc_activation=2.0, stokes_iters=40,
                             max_dt=1e-3)
    sim = ConvectionSimulation(p)
    assert sim.stokes.use_epsilon
    mu = np.asarray(sim.viscosity_field())
    mask = np.broadcast_to(
        np.asarray(sim.T_space.vertex_mask[None], dtype=bool), mu.shape)
    assert mu[mask].max() / mu[mask].min() > 2.0  # really varies with T
    sim.step()
    v2 = sum(float(np.abs(np.asarray(v)).max()) for v in sim.x.vel)
    assert np.isfinite(v2) and v2 > 0.0


def test_heating_terms_step():
    """Shear + adiabatic heating wired into the convection step."""
    import jax.numpy as jnp
    from hyteg_tpu.terraneo.params import ConvectionParameters
    from hyteg_tpu.terraneo.simulation import ConvectionSimulation

    p = ConvectionParameters(dim=2, level=2, ntan=6, nrad=1,
                             rayleigh=1e3, shear_heating=True,
                             adiabatic_heating=0.1, visc_activation=1.0,
                             stokes_iters=15)
    sim = ConvectionSimulation(p)
    sim.solve_stokes()
    T_before = sim.T
    sim.solve_energy(1e-3)
    assert bool(jnp.isfinite(sim.T).all())
    assert float(jnp.abs(sim.T - T_before).max()) > 0
