"""Config-5 feature tests: rocky planets, non-gray surface albedo,
no-atmosphere mode, Koll f-approximation, physical timestep, additional
heating, and coupling mode."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from helios_tpu import host_physics as hp
from helios_tpu import pipeline
from helios_tpu.config import HeliosConfig
from helios_tpu.io.opacity import synthetic_premixed_table


@pytest.fixture(scope="module")
def table():
    return synthetic_premixed_table(nbin=12, ny=4, ntemp=10, npress=8,
                                    seed=6)


def base_cfg(tmp_path, **over):
    kw = dict(name="surf", output_dir=str(tmp_path) + "/",
              planet="manual", g=981.0, a=0.05, R_planet=0.09,
              R_star=0.5, T_star=3500.0, T_intern=30.0,
              scattering="no", direct_beam="no", convection="no",
              run_type="iterative", iso_input="yes", nlayer=10,
              p_boa=1e6, p_toa=1e2, rad_convergence_limit=1e-5)
    kw.update(over)
    return HeliosConfig(**kw)


def test_koll_f_approximation_formula():
    # tau_lw -> 0 recovers f = 2/3 (dayside-ish), large tau -> 2/3 - 5/12
    f0 = hp.approx_f_from_formula(tau_lw=0.0, p_boa=1e6, R_star=3.5e10,
                                  a=7.5e11, T_star=3500.0)
    assert f0 == pytest.approx(2.0 / 3.0)
    finf = hp.approx_f_from_formula(tau_lw=1e9, p_boa=1e6, R_star=3.5e10,
                                    a=7.5e11, T_star=3500.0)
    assert finf == pytest.approx(2.0 / 3.0 - 5.0 / 12.0, rel=1e-3)


def test_rocky_approx_f_run_writes_tau_file(tmp_path, table):
    cfg = base_cfg(tmp_path, planet_type="rocky", approx_f="yes",
                   surf_albedo=0.3)
    out = pipeline.run(cfg, table=table)
    # f_factor was modified by the Koll formula (default tau_lw = 1)
    assert out.phys.f_factor != 0.5
    assert 0.25 < out.phys.f_factor < 2.0 / 3.0
    tau_file = os.path.join(str(tmp_path), "surf",
                            "surf_tau_lw_tau_sw_f_factor.dat")
    assert os.path.exists(tau_file)
    with open(tau_file) as f:
        vals = f.read().splitlines()[2].split()
    tau_lw, tau_sw, f_fac = map(float, vals)
    assert tau_lw > 0 and np.isfinite(tau_sw)
    assert f_fac == pytest.approx(out.phys.f_factor)
    # second run picks up tau_lw from the file
    tau2 = hp.read_tau_lw_from_file(cfg.output_dir, "surf")
    assert tau2 == pytest.approx(tau_lw)


def test_albedo_file(tmp_path, table):
    # wavelength-dependent surface albedo from file
    path = str(tmp_path / "albedo.dat")
    lam_um = np.geomspace(0.3, 400.0, 30)
    alb = 0.2 + 0.5 * np.exp(-((np.log10(lam_um) - 0.5) / 0.3) ** 2)
    with open(path, "w") as f:
        f.write("# header\n# header2\n")
        f.write("Wavelength Feldspathic\n")
        for l, a in zip(lam_um, alb):
            f.write(f"{l:.6e} {a:.6e}\n")
    cfg = base_cfg(tmp_path, planet_type="rocky", surf_albedo="file",
                   albedo_file=path, albedo_file_header_lines=2)
    cfg2 = cfg.finalize()
    got = hp.load_surf_albedo(cfg2, table.wave_centers)
    assert got.shape == (table.nbin,)
    assert got.min() > 0.15 and got.max() < 0.75
    # monotone interp sanity at one point
    want = np.interp(table.wave_centers[3], lam_um * 1e-4, alb)
    assert got[3] == pytest.approx(want)


def test_no_atmosphere_mode(tmp_path, table):
    """Bare rock: 2 layers, opacity nullified, surface driven by stellar
    absorption -> equilibrium surface temperature ~ (1-A)^(1/4) T_irr."""
    cfg = base_cfg(tmp_path, name="rock", planet_type="no_atmosphere",
                   surf_albedo=0.1, T_intern=0.0, f_factor=0.6667,
                   rad_convergence_limit=1e-6)
    out = pipeline.run(cfg, table=table, write_output=False)
    assert out.phys.no_atmo == 1 and out.phys.nlayer == 2
    T = out.result.T_lay
    assert np.allclose(T[:2], 1.001)          # no atmosphere above
    # analytic equilibrium: (1-A) F_down = (1-A) pi B  =>  the gray albedo
    # cancels and sigma T^4 = f (R*/a)^2 sigma T*^4
    T_eq = 0.6667 ** 0.25 * (out.phys.R_star / out.phys.a) ** 0.5 * 3500.0
    assert T[2] == pytest.approx(T_eq, rel=0.005), (T[2], T_eq)


def test_physical_timestep_mode(tmp_path, table):
    """Physical timestep: fixed number of steps set by runtime limit."""
    cfg = base_cfg(tmp_path, name="tstep", convection="yes",
                   iso_input="automatic", run_type="iterative",
                   physical_tstep=1000.0, runtime_limit=20000.0,
                   T_intern=100.0)
    cfg_f = cfg.finalize()
    assert cfg_f.physical_tstep == 1000.0
    out = pipeline.run(cfg_f, table=table, write_output=False)
    # runs exactly runtime_limit / tstep steps (computation.py:941-943)
    assert int(out.rad.it) == 20
    assert bool(jnp.all(jnp.isfinite(out.rad.T_lay)))


def test_additional_heating(tmp_path, table):
    """A strong heating term must warm the heated layers."""
    path = str(tmp_path / "heat.dat")
    p = np.geomspace(1e2, 1e6, 20)
    heat = np.where((p > 1e3) & (p < 1e5), 2e-2, 0.0)
    with open(path, "w") as f:
        f.write("# header\n# header2\n")
        f.write("Pressure heating\n")
        for pi, hi in zip(p, heat):
            f.write(f"{pi:.6e} {hi:.6e}\n")

    cfg0 = base_cfg(tmp_path, name="noheat")
    out0 = pipeline.run(cfg0, table=table, write_output=False)
    cfg1 = base_cfg(tmp_path, name="heat", add_heating="yes",
                    add_heating_path=path,
                    add_heating_file_header_lines=2)
    out1 = pipeline.run(cfg1, table=table, write_output=False)

    heated = (out1.result.p_lay > 1e3) & (out1.result.p_lay < 1e5)
    dT = out1.result.T_lay[:-1] - out0.result.T_lay[:-1]
    assert dT[heated].max() > 5.0, dT


def test_coupling_round_trip(tmp_path, table):
    """Coupling mode writes TP files and averages consecutive iterations;
    identical runs converge at iteration 1."""
    donor = table
    import helios_tpu.chem as chem
    specs = [chem.SpeciesSpec("H2O", True, False, "1e-3"),
             chem.SpeciesSpec("H2", False, False, "0.9")]

    def make_sset():
        return chem.build_species_set(
            specs, ktemps=donor.temperatures, kpress=donor.pressures,
            nbin=donor.nbin, ny=donor.ny, nlayer=10,
            opacity_tables={"H2O": donor.kpoints})

    def run_iter(n):
        cfg = base_cfg(tmp_path, name="cpl", coupling="yes",
                       opacity_mixing="on-the-fly",
                       coupling_iter_nr=n, T_intern=100.0)
        return pipeline.run(cfg, table=donor, sset=make_sset())

    out0 = run_iter(0)
    f0 = os.path.join(str(tmp_path), "cpl", "cpl_tp_coupling_0.dat")
    assert os.path.exists(f0)

    out1 = run_iter(1)
    f1 = os.path.join(str(tmp_path), "cpl", "cpl_tp_coupling_1.dat")
    conv_file = os.path.join(str(tmp_path), "cpl",
                             "cpl_coupling_convergence.dat")
    assert os.path.exists(f1) and os.path.exists(conv_file)
    assert open(conv_file).read().strip() == "1"   # identical physics
