"""End-to-end run from REAL committed inputs: ktable -> star -> spectrum.

The one validation artifact the reference ships besides the Fig-4
chemistry compendium is built from real data products; this test drives
the analogous full chain of this framework from real, committed,
non-synthetic inputs with NO network access:

  real physics (John 1988 H- continuum, He- continuum, H2/He Rayleigh)
      -> ktable stage 1 (high-res sampling + k-distribution binning)
      -> ktable stage 2 (combine -> reference-format mixed HDF5)
  real star (measured Gueymard 2003 solar spectrum, committed at
      tests/data/sun_gueymard_2003.txt)
      -> star tool (ascii -> opacity-grid star HDF5)
      -> pipeline.run from the FILES (opacity_path/stellar_path loaders)
      -> radiative-equilibrium TP profile + emission spectrum

and checks it against EXTERNAL truths, not framework oracles:

  * the spectral integral of the converted star reproduces the published
    solar constant (1366.1 W/m^2, the Gueymard file's own header);
  * the incident TOA flux in the pipeline matches that solar constant
    propagated to the orbit by pure geometry;
  * the mixed table preserves the published John (1988) H- bound-free
    cross-section through sampling, binning, and (T, P) interpolation;

plus a committed drift pin of the resulting emission spectrum.
"""

import os

import numpy as np
import pytest

from helios_tpu import constants as pc
from helios_tpu import realdata
from helios_tpu.config import HeliosConfig
from helios_tpu import pipeline

SUN_TXT = os.path.join(os.path.dirname(__file__), "data",
                       "sun_gueymard_2003.txt")

SOLAR_CONSTANT_CGS = 1366.1 * 1e3        # erg s^-1 cm^-2 at 1 AU
R_SUN = 6.957e10
AU = 1.495978707e13


@pytest.fixture(scope="module")
def miniature(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("realdata"))
    mixed, star, dataset = realdata.build_miniature(d, SUN_TXT)
    return d, mixed, star, dataset


def _read(path, *keys):
    import h5py
    with h5py.File(path) as f:
        return [np.asarray(f[k]) for k in keys]


def test_star_integral_reproduces_solar_constant(miniature):
    """Converted stellar surface flux, integrated over the opacity grid,
    equals the published solar constant at 1 AU.  Out-of-grid solar
    flux (< 0.245 um + > 30 um) is ~0.15%."""
    _, mixed, star, dataset = miniature
    (dlam,) = _read(mixed, "wavelength width of bins")
    (flux,) = _read(star, dataset)
    at_1au = float(np.sum(flux * dlam)) * (R_SUN / AU) ** 2
    assert at_1au == pytest.approx(SOLAR_CONSTANT_CGS, rel=5e-3)


def test_hminus_bf_survives_ktable_chain(miniature):
    """The published John (1988) bound-free cross-section at 0.85 um
    (3.9935e-17 cm^2 per ion, hardcoded from the paper's fit) survives
    high-res sampling -> k-distribution -> combine -> final-grid
    interpolation, VMR-weighted per the miniature's composition."""
    _, mixed, _, _ = miniature
    lam, temps, press, ypts, kpoints, mu = _read(
        mixed, "center wavelengths", "temperatures", "pressures",
        "ypoints", "kpoints", "meanmolmass")
    k = kpoints.reshape(len(temps), len(press), len(lam), len(ypts))
    mu = mu.reshape(len(temps), len(press))

    x = int(np.argmin(np.abs(lam - 0.85e-4)))
    t, p = 29, 0          # T = 1500 K, P = 1 bar: ff/He- negligible
    sigma_john = 3.9935e-17
    expected = (sigma_john / (realdata.M_HMINUS * pc.AMU)
                * float(realdata.VMR_HMINUS) * realdata.M_HMINUS
                / mu[t, p])
    # mid-y-point of the k-distribution of a smooth continuum ~ its value
    got = k[t, p, x, len(ypts) // 2]
    assert got == pytest.approx(expected, rel=0.02)


@pytest.fixture(scope="module")
def run_out(miniature, tmp_path_factory):
    d, mixed, star, dataset = miniature
    out_dir = str(tmp_path_factory.mktemp("realdata_run")) + "/"
    cfg = HeliosConfig(
        name="mini", output_dir=out_dir,
        planet="manual", g=1000.0, a=0.02, R_planet=1.2,
        R_star=1.0, T_star=5772.0, T_intern=100.0,
        scattering="yes", direct_beam="no", convection="no",
        run_type="iterative", iso_input="yes", nlayer=25,
        p_boa=1e8, p_toa=1e2, rad_convergence_limit=1e-5,
        opacity_path=mixed, stellar_model="file",
        stellar_path=star, stellar_dataset=dataset)
    return cfg, pipeline.run(cfg), out_dir


def test_pipeline_converges_from_real_files(run_out):
    cfg, out, out_dir = run_out
    assert bool(np.all(np.asarray(out.rad.abort))), "did not converge"
    files = sorted(os.listdir(os.path.join(out_dir, "mini")))
    for want in ("mini_TOA_flux_eclipse.dat", "mini_spec_upflux.dat",
                 "mini_tp.dat", "mini_transmission.dat"):
        assert want in files


def test_incident_flux_matches_solar_constant_geometry(run_out):
    """TOA downward flux == f * (R_star/a)^2 * (solar constant scaled
    from 1 AU to the stellar surface): pure published numbers + geometry.
    The stellar energy correction (~0.2% here) is part of the chain."""
    cfg, out, _ = run_out
    F_dn_toa = float(np.asarray(out.result.F_down_tot)[-1])
    surface_flux = SOLAR_CONSTANT_CGS * (AU / R_SUN) ** 2
    expected = 0.5 * (R_SUN / (0.02 * AU)) ** 2 * surface_flux
    assert F_dn_toa == pytest.approx(expected, rel=0.01)


def test_realdata_emission_spectrum_drift_pin(run_out):
    """Committed pin of the TOA emission spectrum and the equilibrium
    BOA temperature from the 2026-08 build; fails if any physics in the
    ktable -> star -> pipeline chain drifts."""
    cfg, out, _ = run_out
    T_boa = float(np.asarray(out.rad.T_lay)[0])
    assert T_boa == pytest.approx(1728.769, rel=1e-4)

    fup_toa = np.asarray(out.result.F_up_band)[-1]
    pins = {5: 392944038556.3241, 20: 7021063481499.33,
            40: 2180712600879.6511, 60: 403286289435.7345,
            80: 17430515010.32885, 95: 1189551862.6760116}
    for i, want in pins.items():
        assert fup_toa[i] == pytest.approx(want, rel=1e-4), f"bin {i}"


def test_realdata_spectrum_is_physical(run_out):
    """Brightness-temperature sanity of the emission spectrum: the
    planet emits between roughly T_intern and the irradiation
    temperature across the thermal-IR bins."""
    cfg, out, _ = run_out
    lam, = _read(cfg.opacity_path, "center wavelengths")
    fup = np.asarray(out.result.F_up_band)[-1]
    ir = (lam > 2e-4) & (lam < 25e-4)

    # invert pi*B_lam(T) = F_lam for the brightness temperature
    C1 = 2.0 * np.pi * pc.H * pc.C ** 2
    C2 = pc.H * pc.C / pc.K_B
    with np.errstate(divide="ignore"):
        Tb = C2 / (lam * np.log1p(C1 / (np.maximum(fup, 1e-30)
                                        * lam ** 5)))
    assert np.all(Tb[ir] > 500.0)
    assert np.all(Tb[ir] < 3500.0)
