"""Thermodynamics table mode: loader, interpolation, pipeline wiring.

Covers the reference's kappa_value = "file"/"water_atmo" modes
(source/read.py:1105-1193, kernels.cu:703-919, computation.py:252-292).
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from helios_tpu import thermo as thermo_mod
from helios_tpu.config import HeliosConfig
from helios_tpu import pipeline
from helios_tpu.io.opacity import synthetic_premixed_table
from helios_tpu.ops import interp as interp_ops
from helios_tpu.rce.radiative import (kappa_cp_lay, kappa_int,
                                      make_table_thermo)

import reference_impl as ref


NT, NP = 6, 5
TEMPS = np.linspace(100.0, 3000.0, NT)
PRESS = np.geomspace(1e2, 1e9, NP)


def _grids(rng):
    kappa = 0.2 + 0.1 * rng.random((NT, NP))
    cp = 1e7 * (1.0 + rng.random((NT, NP)))
    logS = 8.0 + rng.random((NT, NP))
    phase = rng.integers(0, 4, (NT, NP)).astype(float)
    return kappa, cp, logS, phase


def write_standard_table(path, kappa, cp, logS, shuffle=None,
                         with_entropy=True):
    """Standard format: 2 header lines, T P kappa c_p [log10 S]."""
    rows = []
    for it in range(NT):
        for ip in range(NP):
            r = f"{TEMPS[it]:.10g} {PRESS[ip]:.10g} {kappa[it, ip]:.8g} " \
                f"{cp[it, ip]:.8g}"
            if with_entropy:
                r += f" {logS[it, ip]:.12g}"
            rows.append(r)
    if shuffle is not None:
        shuffle.shuffle(rows)
    with open(path, "w") as f:
        f.write("header line 1\nheader line 2\n")
        f.write("\n".join(rows) + "\n")


def write_water_table(path, kappa, cp, logS, phase):
    """water_atmo format: 5 header lines, phase number in column 7."""
    with open(path, "w") as f:
        f.write("h\n" * 5)
        for it in range(NT):
            for ip in range(NP):
                f.write(f"{TEMPS[it]:.10g} {PRESS[ip]:.10g} {kappa[it, ip]:.8g} "
                        f"{cp[it, ip]:.8g} {logS[it, ip]:.12g} 0 0 "
                        f"{phase[it, ip]:g}\n")


def test_loader_standard_format(tmp_path, rng):
    kappa, cp, logS, _ = _grids(rng)
    path = str(tmp_path / "delad.dat")
    write_standard_table(path, kappa, cp, logS)
    tbl = thermo_mod.load_entropy_table(path, "file")
    np.testing.assert_allclose(tbl.temps, TEMPS)
    np.testing.assert_allclose(tbl.press, PRESS)
    np.testing.assert_allclose(tbl.kappa, kappa, rtol=1e-7)
    np.testing.assert_allclose(tbl.cp, cp, rtol=1e-7)
    np.testing.assert_allclose(tbl.entropy, 10.0 ** logS, rtol=1e-7)
    assert tbl.phase is None


def test_loader_row_order_independent(tmp_path, rng):
    """The reference trusts file row order; our loader places rows by
    their (T, P) values, so a shuffled file round-trips identically."""
    kappa, cp, logS, _ = _grids(rng)
    p1, p2 = str(tmp_path / "a.dat"), str(tmp_path / "b.dat")
    write_standard_table(p1, kappa, cp, logS)
    write_standard_table(p2, kappa, cp, logS,
                         shuffle=np.random.default_rng(7))
    a = thermo_mod.load_entropy_table(p1, "file")
    b = thermo_mod.load_entropy_table(p2, "file")
    np.testing.assert_array_equal(a.kappa, b.kappa)
    np.testing.assert_array_equal(a.entropy, b.entropy)


def test_loader_missing_entropy_column(tmp_path, rng):
    kappa, cp, logS, _ = _grids(rng)
    path = str(tmp_path / "noent.dat")
    write_standard_table(path, kappa, cp, logS, with_entropy=False)
    tbl = thermo_mod.load_entropy_table(path, "file")
    assert np.all(tbl.entropy == 0.0)


def test_loader_water_atmo(tmp_path, rng):
    kappa, cp, logS, phase = _grids(rng)
    path = str(tmp_path / "water.dat")
    write_water_table(path, kappa, cp, logS, phase)
    tbl = thermo_mod.load_entropy_table(path, "water_atmo")
    np.testing.assert_allclose(tbl.entropy, 10.0 ** logS, rtol=1e-7)
    np.testing.assert_array_equal(tbl.phase, phase)


def test_loader_incomplete_grid_raises(tmp_path, rng):
    kappa, cp, logS, _ = _grids(rng)
    path = str(tmp_path / "bad.dat")
    write_standard_table(path, kappa, cp, logS)
    with open(path) as f:
        lines = f.read().splitlines()
    with open(path, "w") as f:
        f.write("\n".join(lines[:-1]) + "\n")   # drop one row
    with pytest.raises(ValueError, match="do not fill"):
        thermo_mod.load_entropy_table(path, "file")


def test_table_thermo_interpolation_oracle(tmp_path, rng):
    """kappa (lin-T), c_p and entropy (log-T), phase (lin-T) interpolation
    through ThermoProps matches the reference bilinear oracle
    (kernels.cu:703-919)."""
    kappa, cp, logS, phase = _grids(rng)
    path = str(tmp_path / "water.dat")
    write_water_table(path, kappa, cp, logS, phase)
    tbl = thermo_mod.load_entropy_table(path, "water_atmo")
    th = make_table_thermo(tbl)

    T_q = np.asarray([150.0, 500.0, 1234.5, 2999.0, 50.0, 4000.0])
    p_q = np.geomspace(5e1, 5e9, 6)

    kap_got, cp_got = kappa_cp_lay(th, jnp.asarray(T_q), jnp.asarray(p_q))
    kint_got = kappa_int(th, jnp.asarray(T_q), jnp.asarray(p_q))
    s_got = interp_ops.interpolate_entropy(th.entropy_table, th.temps,
                                           th.press, jnp.asarray(T_q),
                                           jnp.asarray(p_q))
    ph_got = interp_ops.interpolate_phase_number(th.phase_table, th.temps,
                                                 th.press, jnp.asarray(T_q),
                                                 jnp.asarray(p_q))
    for i in range(len(T_q)):
        assert float(kap_got[i]) == pytest.approx(
            ref.bilinear_interpol(tbl.kappa, TEMPS, PRESS, T_q[i], p_q[i]),
            rel=1e-10)
        assert float(kint_got[i]) == float(kap_got[i])
        assert float(cp_got[i]) == pytest.approx(
            ref.bilinear_interpol(tbl.cp, TEMPS, PRESS, T_q[i], p_q[i],
                                  log_temp=True), rel=1e-10)
        assert float(s_got[i]) == pytest.approx(
            ref.bilinear_interpol(tbl.entropy, TEMPS, PRESS, T_q[i],
                                  p_q[i], log_temp=True), rel=1e-10)
        assert float(ph_got[i]) == pytest.approx(
            ref.bilinear_interpol(tbl.phase, TEMPS, PRESS, T_q[i], p_q[i]),
            rel=1e-10)


@pytest.fixture(scope="module")
def table():
    return synthetic_premixed_table(nbin=16, ny=4, ntemp=12, npress=10,
                                    seed=3)


def _cfg(tmp_path, **over):
    kw = dict(name="wat", output_dir=str(tmp_path) + "/",
              planet="manual", g=2288.0, a=0.0153, R_planet=1.0,
              R_star=1.0, T_star=4000.0, T_intern=200.0,
              scattering="no", direct_beam="no", convection="no",
              run_type="iterative", iso_input="yes", nlayer=10,
              p_boa=1e8, p_toa=1e3, rad_convergence_limit=1e-6)
    kw.update(over)
    return HeliosConfig(**kw)


def test_pipeline_water_atmo_outputs(tmp_path, rng, table):
    """End-to-end: kappa_value="water_atmo" produces real entropy values
    in _colmass_mu_cp_kappa_entropy.dat and a _state.dat phase file
    (write.py:177-232)."""
    kappa, cp, logS, phase = _grids(rng)
    tbl_path = str(tmp_path / "water.dat")
    write_water_table(tbl_path, kappa, cp, logS, phase)

    cfg = _cfg(tmp_path, kappa_value="water_atmo",
               kappa_file_path=tbl_path)
    out = pipeline.run(cfg, table=table)

    # entropy/phase interpolated at the final TP, not zero
    assert out.result.entropy_lay.shape == (cfg.nlayer,)
    assert np.all(out.result.entropy_lay > 0.0)
    assert out.result.phase_number_lay is not None

    d = os.path.join(str(tmp_path), "wat")
    with open(os.path.join(d, "wat_colmass_mu_cp_kappa_entropy.dat")) as f:
        rows = [r.split() for r in f.read().splitlines()[2:]]
    ent_col = np.array([float(r[6]) for r in rows])
    assert np.all(ent_col > 0.0)
    # kappa column interpolated from the table (within table range)
    kap_col = np.array([float(r[5]) for r in rows])
    assert np.all((kap_col >= kappa.min()) & (kap_col <= kappa.max()))

    with open(os.path.join(d, "wat_state.dat")) as f:
        lines = f.read().splitlines()
    vals = [float(r.split()[3]) for r in lines[2:] if r.strip()]
    assert len(vals) == cfg.nlayer
    assert all(phase.min() <= v <= phase.max() for v in vals)


def test_pipeline_standard_file_no_phase(tmp_path, rng, table):
    kappa, cp, logS, _ = _grids(rng)
    tbl_path = str(tmp_path / "delad.dat")
    write_standard_table(tbl_path, kappa, cp, logS)
    cfg = _cfg(tmp_path, name="std", kappa_value="file",
               kappa_file_path=tbl_path)
    out = pipeline.run(cfg, table=table)
    assert np.all(out.result.entropy_lay > 0.0)
    assert out.result.phase_number_lay is None
    d = os.path.join(str(tmp_path), "std")
    assert not os.path.exists(os.path.join(d, "std_state.dat"))
