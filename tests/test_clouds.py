"""Cloud preprocessing tests: rebinning, size-distribution weighting,
deck construction, and the radiative effect of a scattering deck."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from helios_tpu import clouds as clouds_mod
from helios_tpu import grid as grid_mod
from helios_tpu import tools


# --------------------------------------------------------------------------- #
# spectrum rebinning
# --------------------------------------------------------------------------- #

def test_convert_spectrum_conserves_energy():
    """Rebinning a spectrum onto coarser bins conserves the integral."""
    rng = np.random.default_rng(0)
    old_lam = np.linspace(1e-4, 1e-3, 4001)
    old_flux = 1.0 + 0.5 * np.sin(old_lam * 5e4) + rng.uniform(0, 0.1, 4001)

    edges = np.linspace(1e-4, 1e-3, 41)
    centers = 0.5 * (edges[1:] + edges[:-1])
    new_flux = tools.convert_spectrum(old_lam, old_flux, centers,
                                      int_lambda=edges, type="linear")

    E_old = np.trapezoid(old_flux, old_lam)
    E_new = np.sum(new_flux * np.diff(edges))
    np.testing.assert_allclose(E_new, E_old, rtol=1e-6)


def test_convert_spectrum_constant_is_identity():
    old_lam = np.geomspace(1e-5, 1e-2, 1000)
    for typ in ("linear", "log"):
        got = tools.convert_spectrum(old_lam, np.full(1000, 3.7),
                                     np.geomspace(2e-5, 5e-3, 20), type=typ)
        np.testing.assert_allclose(got, 3.7, rtol=1e-12)


def test_convert_spectrum_out_of_range_uses_bb():
    old_lam = np.geomspace(1e-4, 2e-4, 100)
    flux = np.full(100, 5.0)
    centers = np.geomspace(5e-5, 4e-4, 12)
    got0 = tools.convert_spectrum(old_lam, flux, centers, type="linear")
    assert got0[0] == 0.0 and got0[-1] == 0.0        # zero fill
    gotT = tools.convert_spectrum(old_lam, flux, centers, type="linear",
                                  extrapolate_with_BB_T=1000.0)
    edges = tools._edges_from_centers(centers)
    want = np.pi * tools.calc_analyt_planck_in_interval(
        1000.0, edges[0], edges[1])
    np.testing.assert_allclose(gotT[0], want, rtol=1e-10)


def test_planck_interval_matches_device_planck():
    """Host analytic Planck bin integral == device planck module."""
    from helios_tpu import planck as planck_mod
    edges = np.array([1e-4, 1.5e-4])
    T = 1300.0
    host = tools.calc_analyt_planck_in_interval(T, edges[0], edges[1])
    dev = float(planck_mod.integrated_planck_over_bins(
        jnp.asarray(edges), jnp.asarray(np.diff(edges)), jnp.asarray(T))[0])
    np.testing.assert_allclose(host, dev, rtol=1e-12)


# --------------------------------------------------------------------------- #
# Mie preprocessing
# --------------------------------------------------------------------------- #

@pytest.fixture(scope="module")
def mie_dir(tmp_path_factory):
    """Synthetic LX-Mie directory: cross-sections with a known size and
    wavelength dependence (sigma ~ r^2, Rayleigh-like fall-off)."""
    d = tmp_path_factory.mktemp("mie")
    lam_um = np.geomspace(0.3, 30.0, 50)
    for r in clouds_mod.R_VALUES_MICRON:
        x = 2 * np.pi * r / lam_um
        scat = 1e-8 * r ** 2 * np.minimum(x ** 4, 2.0)
        absx = 1e-8 * r ** 2 * np.minimum(x, 1.0)
        g0 = np.clip(0.9 * np.minimum(x, 1.0), 0, 1)
        with open(os.path.join(str(d), "r{:.6f}.dat".format(r)), "w") as f:
            f.write("# lam c2 c3 scat abs c5 g0\n")
            for i in range(len(lam_um)):
                f.write(f"{lam_um[i]:.6e} 0 0 {scat[i]:.6e} {absx[i]:.6e} "
                        f"0 {g0[i]:.6e}\n")
    return str(d)


def test_lognorm_pdf_normalized():
    r = np.geomspace(1e-4, 1e5, 20000)
    pdf = clouds_mod.lognorm_pdf(r, 1.0, 2.0)
    np.testing.assert_allclose(np.trapezoid(pdf, r), 1.0, rtol=1e-6)


def test_size_weighted_cross_sections(mie_dir):
    edges = np.geomspace(0.4e-4, 20e-4, 17)
    centers = 0.5 * (edges[1:] + edges[:-1])
    absx, scat, g0 = clouds_mod.size_weighted_cross_sections(
        mie_dir, 1.0, 1.5, centers, edges)
    assert absx.shape == (16,) and np.all(absx > 0)
    assert np.all(scat > 0)
    assert np.all((g0 >= 0) & (g0 <= 1.0))   # dimensionless asymmetry


def test_manual_cloud_deck_profile():
    g = grid_mod.build_grid(p_boa=1e9, p_toa=1e2, nlayer=30, g=2288.0)
    f_lay, f_int = clouds_mod.manual_cloud_deck(
        g.p_lay, g.p_int, p_cloud_bot=1e6, f_cloud_bot=1e-4,
        cloud_to_gas_scale_height=0.5, iso=0)
    i_bot = np.argmax(f_lay > 0)
    assert f_lay[i_bot] == 1e-4
    assert np.all(f_lay[:i_bot] == 0)
    # decays upward with (p/p_bot)^(1/H - 1); H=0.5 -> exponent 1
    above = np.arange(i_bot + 1, 30)
    np.testing.assert_allclose(
        f_lay[above], 1e-4 * (g.p_lay[above] / g.p_lay[i_bot]),
        rtol=1e-12)


def test_cloud_deck_affects_spectrum(mie_dir):
    """End-to-end: a thick scattering cloud deck must change the emission
    spectrum and raise the planetary albedo (more reflected stellar
    light when scattering on)."""
    from helios_tpu.config import HeliosConfig
    from helios_tpu import pipeline
    from helios_tpu.io.opacity import synthetic_premixed_table

    table = synthetic_premixed_table(nbin=16, ny=4, ntemp=10, npress=8,
                                     seed=4, lambda_min=0.5e-4,
                                     lambda_max=15e-4)

    def run(n_decks):
        cfg = HeliosConfig(
            name=f"cl{n_decks}", output_dir="/tmp/helios_cloud_test/",
            planet="manual", g=2288.0, a=0.0153, R_planet=1.0,
            R_star=1.0, T_star=4000.0, T_intern=100.0,
            scattering="yes", direct_beam="no", convection="no",
            run_type="iterative", iso_input="yes", nlayer=12,
            p_boa=1e8, p_toa=1e3, rad_convergence_limit=1e-5,
            nr_cloud_decks=n_decks, mie_dirs=[mie_dir],
            cloud_radius_mode=[1.0], cloud_radius_geo_std=[1.5],
            cloud_mixing_ratio_source="manual",
            cloud_bottom_pressure=[1e6],
            cloud_bottom_mixing_ratio=[1e-6],
            cloud_to_gas_scale_height=[0.8])
        return pipeline.run(cfg, table=table, write_output=False)

    clear = run(0)
    cloudy = run(1)
    assert clear.phys.clouds == 0 and cloudy.phys.clouds == 1
    s_clear = clear.result.F_up_band[12]
    s_cloudy = cloudy.result.F_up_band[12]
    assert np.all(np.isfinite(s_cloudy))
    assert not np.allclose(s_clear, s_cloudy, rtol=1e-3), (
        "cloud deck had no effect on the emission spectrum")
