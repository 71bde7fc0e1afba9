"""Accuracy benchmark against PUBLISHED closed-form physics.

The reference validates against published results rather than unit
oracles (SURVEY.md section 4: Malik et al. 2017 reproductions).  The
RT-core analogue here is the classic gray radiative-equilibrium (Milne)
atmosphere -- the analytic solution every two-stream paper quotes (e.g.
Malik et al. 2017 section 2; Andrews, "Introduction to Atmospheric
Physics" eq. 3.23): for a non-scattering gray atmosphere with internal
flux F_int = sigma*T_int^4 and no irradiation, the converged profile is

    sigma * T^4(tau) = (F_int / 2) * (1 + tau / eps)

with eps the first Eddington coefficient (1/diffusivity).  Two
closure-independent anchors follow: the skin temperature
T(0)^4 = T_int^4 / 2 and the linear-in-tau deep profile with slope
F_int / (2 eps sigma).

This is an INDEPENDENT accuracy target -- no framework oracle is
involved, only the converged solver output vs the published formula.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from helios_tpu import constants as pc
from helios_tpu.config import HeliosConfig
from helios_tpu import pipeline
from helios_tpu.io.opacity import OpacityTable, gauss_legendre_ypoints


def gray_table(kappa0: float, nbin: int = 4, ny: int = 1) -> OpacityTable:
    """A perfectly gray, non-scattering opacity table."""
    edges = np.geomspace(0.3e-4, 300e-4, nbin + 1)
    centers = 0.5 * (edges[1:] + edges[:-1])
    temps = np.linspace(50.0, 6000.0, 8)
    press = np.logspace(0.0, 10.0, 8)
    y, _ = gauss_legendre_ypoints(ny)
    kpoints = np.full((len(temps), len(press), nbin, ny), kappa0)
    return OpacityTable(
        kpoints=kpoints, wave_centers=centers, wave_edges=edges,
        delta_wave=np.diff(edges), temperatures=temps, pressures=press,
        gauss_y=y, scat_cross=np.zeros((len(temps), len(press), nbin)),
        meanmolmass=np.full((len(temps), len(press)), 2.3 * pc.AMU))


def test_gray_milne_radiative_equilibrium(tmp_path):
    """Layer sizing: the analytic continuum solution only binds where
    the grid resolves the gradient, so tau_max ~ 6 over 100 layers keeps
    the bottom layer at delta_tau ~ 0.5 (non-isothermal linear-in-tau
    source handles that accurately)."""
    T_int = 500.0
    kappa0 = 6e-3                   # cm^2 / g -> tau_max = 6
    cfg = HeliosConfig(
        name="milne", output_dir=str(tmp_path) + "/",
        planet="manual", g=1000.0, a=1.0, R_planet=1.0, R_star=1.0,
        T_star=0.0, T_intern=T_int,
        scattering="no", direct_beam="no", convection="no",
        run_type="iterative", iso_input="no", nlayer=100,
        p_boa=1e6, p_toa=1e2, rad_convergence_limit=1e-6).finalize()
    out = pipeline.run(cfg, table=gray_table(kappa0), write_output=False)
    assert bool(jnp.all(out.rad.abort)), "did not converge"

    r = out.result
    T = r.T_lay[:cfg.nlayer]
    # gray optical depth at layer centers, measured from TOA
    dtau = kappa0 * r.delta_colmass
    tau = np.cumsum(dtau[::-1])[::-1] - 0.5 * dtau

    eps = out.phys.epsi                       # 1/diffusivity = 0.5
    F_int = pc.SIGMA_SB * T_int ** 4
    T_analytic = (F_int / (2.0 * pc.SIGMA_SB) * (1.0 + tau / eps)) ** 0.25

    # full-profile match to the published closed form
    np.testing.assert_allclose(T, T_analytic, rtol=0.01)

    # closure-independent anchors
    i_top = cfg.nlayer - 1                    # layers are BOA->TOA
    assert tau[i_top] < 1e-3
    T_skin = (T_int ** 4 / 2.0) ** 0.25
    assert T[i_top] == pytest.approx(T_skin, rel=0.01)

    # deep slope: d(T^4)/d(tau) = F_int / (2 eps sigma)
    deep = tau > 2.0
    assert deep.sum() >= 5
    slope = np.polyfit(tau[deep], T[deep] ** 4.0, 1)[0]
    assert slope == pytest.approx(F_int / (2 * eps * pc.SIGMA_SB),
                                  rel=0.02)
