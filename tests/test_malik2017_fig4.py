"""Reproduce Fig. 4 of Malik et al. (2017) from real committed inputs.

The reference ships, as its accuracy-validation artifact, a compendium
reproducing the chemistry benchmark of its method paper: analytical
C-H-O equilibrium (Heng & Lyons 2016) vs the independent thermochemical
code TEA (Blecic et al. 2016), at T = 800 K and 3000 K, P = 1 bar,
C/O swept from 0.1 to 10 (supplementary/reproducing_Fig4_of_Malik2017/
TEA_compendium/readme.txt:1-5).

tests/data/malik2017_fig4/ carries the compendium's REAL files verbatim:
  CtoO_T800.atm        -- the elemental-abundance input sweep (TEA format)
  CtoO_T800.tea        -- TEA's computed abundances at 800 K (oracle)
  CtoO_T3000.tea       -- TEA's computed abundances at 3000 K (oracle)
  CtoO_analytical.npz  -- the published script's analytical output

These tests drive helios_tpu.chem_analytic from the committed .atm
inputs and check it against BOTH committed oracles -- none of the
numbers below come from this repo's own code, so they fail if the
chemistry physics drifts.
"""

import os

import numpy as np
import pytest

from helios_tpu import chem_analytic as ca

DATA = os.path.join(os.path.dirname(__file__), "data", "malik2017_fig4")

# analytical-species -> TEA column (JANAF-converted names)
TEA_COL = {"CH4": "CH4_g", "H2O": "H2O_g", "CO": "CO_g", "CO2": "CO2_g",
           "C2H2": "C2H2_g"}


def load_atm_inputs():
    """Elemental H / O / C abundance rows of the committed .atm sweep."""
    rows = []
    with open(os.path.join(DATA, "CtoO_T800.atm")) as f:
        lines = f.readlines()
    start = next(i for i, l in enumerate(lines)
                 if l.startswith("#Pressure")) + 1
    for line in lines[start:]:
        if line.strip():
            rows.append([float(x) for x in line.split()])
    rows = np.array(rows)
    pbar, temp = rows[:, 0], rows[:, 1]
    n_h, n_o, n_c = rows[:, 2], rows[:, 3], rows[:, 4]
    # abundances normalized to H2: n_H2 = n_H / 2 with n_H == 1
    return pbar, temp, 2.0 * n_o / n_h, 2.0 * n_c / n_h


def load_tea(fname):
    """Parse a TEA final output file into column -> array."""
    with open(os.path.join(DATA, fname)) as f:
        lines = f.readlines()
    i = next(i for i, l in enumerate(lines) if l.startswith("#TEADATA"))
    cols = lines[i + 1].lstrip("#").split()
    rows = np.array([[float(x) for x in l.split()]
                     for l in lines[i + 2:] if l.strip()])
    return {c: rows[:, j] for j, c in enumerate(cols)}


@pytest.fixture(scope="module")
def atm():
    return load_atm_inputs()


def test_atm_inputs_are_the_published_sweep(atm):
    pbar, temp, n_o, n_c = atm
    assert len(n_c) == 100
    np.testing.assert_allclose(pbar, 1.0)
    np.testing.assert_allclose(temp, 800.0)
    np.testing.assert_allclose(n_o, 1.0e-3)          # 2 * 5e-4 per H2
    ctoo = n_c / n_o
    np.testing.assert_allclose(ctoo[0], 0.1, rtol=1e-10)
    np.testing.assert_allclose(ctoo[-1], 10.0, rtol=1e-6)


def test_analytical_chemistry_matches_published_script_output(atm):
    """chem_analytic == the committed CtoO_analytical.npz to ~1e-8."""
    _, _, n_o, n_c = atm
    d = np.load(os.path.join(DATA, "CtoO_analytical.npz"),
                allow_pickle=True, encoding="latin1")
    n_mix = d["n_mix"][0]
    np.testing.assert_allclose(d["CtoO"], n_c / 2.0, rtol=1e-9)
    for T in (800, 3000):
        nd = ca.solve_cho(n_o / 2.0, n_c / 2.0, float(T),
                          float(d["pbar"]))
        for sp in ("CH4", "H2O", "CO", "CO2", "C2H2"):
            np.testing.assert_allclose(
                nd[sp], n_mix[T][sp], rtol=1e-8,
                err_msg=f"{sp} at {T} K")


# Per-species agreement Fig. 4 demonstrates, with ~30% slack on the
# measured max deviation (units: dex).  CH4/C2H2 at 3000 K sit at the
# model's validity edge (<~1e-9 abundance), hence the wider band.
FIG4_TOL_DEX = {
    800: {"CH4": 0.02, "H2O": 0.02, "CO": 0.06, "CO2": 0.07,
          "C2H2": 0.06},
    3000: {"CH4": 0.18, "H2O": 0.05, "CO": 0.05, "CO2": 0.10,
           "C2H2": 0.18},
}


@pytest.mark.parametrize("T,tea_file", [(800, "CtoO_T800.tea"),
                                        (3000, "CtoO_T3000.tea")])
def test_analytical_chemistry_tracks_tea(atm, T, tea_file):
    """The Fig. 4 statement: the analytical model tracks the full
    equilibrium solver TEA across C/O = 0.1..10 for all five species."""
    _, _, n_o2, n_c2 = atm
    tea = load_tea(tea_file)
    x_h2 = tea["H2_ref"]
    nd = ca.solve_cho(n_o2 / 2.0, n_c2 / 2.0, float(T), 1.0)
    for sp, col in TEA_COL.items():
        tea_rel = tea[col] / x_h2           # mole fraction -> per-H2
        dex = np.abs(np.log10(nd[sp]) - np.log10(tea_rel))
        assert dex.max() <= FIG4_TOL_DEX[T][sp], (
            f"{sp} at {T} K deviates {dex.max():.3f} dex from TEA "
            f"(tol {FIG4_TOL_DEX[T][sp]})")


def test_water_methane_crossover_at_unity_ctoo(atm):
    """The headline feature of Fig. 4: at 3000 K water collapses and
    CH4/C2H2 surge as C/O crosses 1.  Check the H2O-CO crossover C/O
    against TEA's."""
    _, _, n_o2, n_c2 = atm
    ctoo = n_c2 / n_o2
    tea = load_tea("CtoO_T3000.tea")
    nd = ca.solve_cho(n_o2 / 2.0, n_c2 / 2.0, 3000.0, 1.0)

    def crossover(h2o, ch4):
        s = np.sign(np.log10(h2o) - np.log10(ch4))
        i = np.where(np.diff(s) != 0)[0][0]
        return 0.5 * (ctoo[i] + ctoo[i + 1])

    mine = crossover(nd["H2O"], nd["CH4"])
    theirs = crossover(tea["H2O_g"], tea["CH4_g"])
    assert abs(mine - theirs) < 0.15, (mine, theirs)
    assert 0.9 < mine < 1.2


def test_mole_fraction_normalization_matches_tea_h2():
    """mole_fractions' H2 fraction agrees with TEA's H2_ref at solar-ish
    composition (H2-dominated gas, no He in the TEA run)."""
    tea = load_tea("CtoO_T800.tea")
    _, _, n_o2, n_c2 = load_atm_inputs()
    nd = ca.solve_cho(n_o2 / 2.0, n_c2 / 2.0, 800.0, 1.0)
    frac = ca.mole_fractions(nd, n_he=0.0)
    np.testing.assert_allclose(frac["H2"], tea["H2_ref"], rtol=2e-3)


def test_as_fastchem_table_feeds_species_set():
    """The analytic table plugs into the on-the-fly chemistry path in
    place of a chem.dat file (FastChem interface parity)."""
    from helios_tpu import chem

    temps = np.linspace(600.0, 2900.0, 12)
    pbars = np.logspace(-4, 2, 7)
    fc = ca.as_fastchem_table(temps, pbars)
    data, fc_temps, fc_press = fc
    assert set(data) >= {"C1H4", "H2O1", "C1O1", "C1O2", "C2H2", "H2",
                         "He"}
    assert all(v.shape == (12 * 7,) for v in data.values())

    specs = [chem.SpeciesSpec("H2O", True, False, "FastChem"),
             chem.SpeciesSpec("CO", True, False, "FastChem")]
    ktemps = np.linspace(700.0, 2800.0, 5)
    kpress = np.logspace(0, 7, 6)      # cgs
    sset = chem.build_species_set(
        specs, ktemps=ktemps, kpress=kpress, nbin=3, ny=2, nlayer=4,
        opacity_tables={"H2O": np.ones((5, 6, 3, 2)),
                        "CO": np.ones((5, 6, 3, 2))},
        fastchem_data=fc)
    vmr = np.asarray(sset.data[0].vmr_pretab)
    assert vmr.shape == (5, 6)
    assert np.all(vmr > 0) and np.all(vmr < 1e-2)
    # water VMR at 800 K ~ n_H2O/total ~ 4.6e-4 (Fig. 4 left side)
    assert 1e-4 < vmr[0, 0] < 1e-3
