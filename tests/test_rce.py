"""Tests of the device-side RCE machinery against the numpy oracle of the
reference host logic, plus end-to-end convergence tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from helios_tpu import constants as pc
from helios_tpu import grid as grid_mod
from helios_tpu.rce import convect
from helios_tpu.rce import radiative as rad_mod

import reference_convect as refc


def make_profile(rng, L=24, unstable=True):
    g = grid_mod.build_grid(p_boa=1e9, p_toa=1e2, nlayer=L, g=2288.0)
    T = 1500.0 * (g.p_lay / g.p_lay[0]) ** (0.35 if unstable else 0.05)
    T = T * (1.0 + 0.05 * rng.standard_normal(L))
    T_surf = T[0] * (1.1 if unstable else 1.0)
    T_lay = np.concatenate([T, [T_surf]])
    kappa_lay = np.full(L, 2.0 / 7.0)
    kappa_int = np.full(L + 1, 2.0 / 7.0)
    c_p = np.full(L, pc.R_UNIV / (2.0 / 7.0))
    mmm = np.full(L, 2.3 * pc.AMU)
    return g, T_lay, kappa_lay, kappa_int, c_p, mmm


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_conv_check_matches_oracle(seed):
    rng = np.random.default_rng(seed)
    g, T_lay, kl, ki, _, _ = make_profile(rng)
    got = np.asarray(convect.conv_check(
        jnp.asarray(T_lay), jnp.asarray(g.p_lay), jnp.asarray(g.p_int),
        jnp.asarray(kl), jnp.asarray(ki)))
    want = refc.conv_check(T_lay, g.p_lay, g.p_int, kl, ki)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("iter_value", [100, 6000])
def test_mark_layers_matches_oracle(seed, iter_value):
    rng = np.random.default_rng(seed)
    g, T_lay, kl, ki, _, _ = make_profile(rng)
    got = np.asarray(convect.mark_convective_layers(
        jnp.asarray(T_lay), jnp.asarray(g.p_lay), jnp.asarray(g.p_int),
        jnp.asarray(kl), jnp.asarray(ki), stitching=1,
        iter_value=jnp.asarray(iter_value)))
    want = refc.mark_convective_layers(
        T_lay, g.p_lay, g.p_int, kl, ki,
        np.zeros(len(T_lay), bool), 1, iter_value).astype(bool)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("seed", range(8))
def test_stitching_matches_oracle(seed):
    rng = np.random.default_rng(seed)
    L = 20
    g = grid_mod.build_grid(p_boa=1e9, p_toa=1e2, nlayer=L, g=2288.0)
    conv = np.zeros(L + 1, bool)
    conv[rng.choice(L, size=8, replace=False)] = True
    if seed % 2:
        conv[L] = True
        conv[0] = bool(seed % 4 == 1)
    got = np.asarray(convect.stitch_zone_holes(
        jnp.asarray(conv), jnp.asarray(g.p_lay), jnp.asarray(g.p_int)))
    want = refc.stitching_holes(conv, g.p_lay, g.p_int).astype(bool)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("seed", range(6))
def test_conv_correct_matches_oracle(seed):
    rng = np.random.default_rng(seed)
    g, T_lay, kl, ki, cp, mmm = make_profile(rng)
    L = len(T_lay) - 1
    unstable = refc.conv_check(T_lay, g.p_lay, g.p_int, kl, ki)
    conv_layer = refc.mark_convective_layers(
        T_lay, g.p_lay, g.p_int, kl, ki, np.zeros(L + 1, bool), 0, 0)
    if not (unstable | conv_layer).any():
        pytest.skip("profile stable for this seed")
    got = np.asarray(convect.conv_correct(
        jnp.asarray(T_lay), jnp.asarray(g.p_lay), jnp.asarray(g.p_int),
        jnp.asarray(kl), jnp.asarray(ki), jnp.asarray(cp), jnp.asarray(mmm),
        jnp.asarray(unstable | conv_layer.astype(bool))))
    want = refc.conv_correct(T_lay, g.p_lay, g.p_int, kl, ki, cp, mmm,
                             unstable, conv_layer.astype(bool), 0)
    np.testing.assert_allclose(got, want, rtol=1e-12)


@pytest.mark.parametrize("seed", range(4))
def test_full_adjustment_matches_oracle_and_is_stable(seed):
    rng = np.random.default_rng(seed)
    g, T_lay, kl, ki, cp, mmm = make_profile(rng)
    L = len(T_lay) - 1
    fudge_kw = dict(T_star=5000.0, input_dampara="automatic",
                    F_intern=100.0,
                    F_add_heat_sum=np.zeros(L),
                    F_smooth_sum=np.zeros(L),
                    F_down_tot=np.full(L + 1, 1e5),
                    F_up_tot=np.full(L + 1, 1.02e5))
    want_T, want_conv = refc.convective_adjustment(
        T_lay, g.p_lay, g.p_int, kl, ki, cp, mmm, 100, **fudge_kw)

    got_T, got_conv = convect.convective_adjustment(
        jnp.asarray(T_lay), jnp.asarray(g.p_lay), jnp.asarray(g.p_int),
        jnp.asarray(kl), jnp.asarray(ki), jnp.asarray(cp), jnp.asarray(mmm),
        iter_value=jnp.asarray(100), T_star=5000.0,
        input_dampara="automatic", F_intern=100.0,
        F_add_heat_sum=jnp.zeros(L), F_smooth_sum=jnp.zeros(L),
        F_down_tot=jnp.full(L + 1, 1e5), F_up_tot=jnp.full(L + 1, 1.02e5))

    np.testing.assert_allclose(np.asarray(got_T), want_T, rtol=1e-10)
    np.testing.assert_array_equal(np.asarray(got_conv),
                                  want_conv.astype(bool))
    # and the adjusted profile must be convectively stable
    assert not refc.conv_check(np.asarray(got_T), g.p_lay, g.p_int,
                               kl, ki).any()


def test_adjustment_conserves_enthalpy():
    """Without fudging, conv_correct conserves sum c_p/mmm * T * dp over
    each zone (host_functions.py:369 'conserving the total enthalpy')."""
    rng = np.random.default_rng(7)
    g, T_lay, kl, ki, cp, mmm = make_profile(rng)
    L = len(T_lay) - 1
    unstable = refc.conv_check(T_lay, g.p_lay, g.p_int, kl, ki)
    if not unstable.any():
        pytest.skip("stable")
    T_new = np.asarray(convect.conv_correct(
        jnp.asarray(T_lay), jnp.asarray(g.p_lay), jnp.asarray(g.p_int),
        jnp.asarray(kl), jnp.asarray(ki), jnp.asarray(cp), jnp.asarray(mmm),
        jnp.asarray(unstable)))
    w = cp / mmm * (g.p_int[:-1] - g.p_int[1:])
    corrected = unstable[:L]
    before = np.sum(w[corrected] * T_lay[:L][corrected])
    after = np.sum(w[corrected] * T_new[:L][corrected])
    np.testing.assert_allclose(after, before, rtol=1e-10)


# --------------------------------------------------------------------------- #
# radiative temperature step vs oracle
# --------------------------------------------------------------------------- #

def _phys_stub(L, **over):
    from helios_tpu.config import HeliosConfig
    from helios_tpu.forward import Phys
    from helios_tpu.io.opacity import synthetic_premixed_table
    cfg = HeliosConfig(planet="manual", g=2288.0, a=0.0153, R_planet=1.0,
                       R_star=1.0, T_star=5000.0, T_intern=100.0,
                       scattering="no", direct_beam="no", convection="no",
                       nlayer=L, smooth=over.pop("smooth", "no"))
    cfg = cfg.finalize()
    for k, v in over.items():
        object.__setattr__(cfg, k, v) if False else setattr(cfg, k, v)
    return Phys.from_config(cfg, nbin=5, ny=2)


@pytest.mark.parametrize("smooth", [0, 1])
@pytest.mark.parametrize("itervalue", [0, 19, 20, 39])
def test_rad_temp_step_matches_oracle(smooth, itervalue):
    rng = np.random.default_rng(11)
    L = 16
    phys = _phys_stub(L, smooth="yes" if smooth else "no")
    assert phys.smooth == smooth

    g = grid_mod.build_grid(p_boa=1e9, p_toa=1e2, nlayer=L, g=2288.0)
    T_lay = rng.uniform(300.0, 2500.0, L + 1)
    T_store = rng.uniform(300.0, 2500.0, L + 1)
    prefactor = rng.uniform(0.5, 2.0, L + 1)
    F_net = rng.uniform(-1e5, 1e5, L + 1)
    F_down_tot = rng.uniform(1e5, 2e5, L + 1)

    from helios_tpu.ops.integrate import FluxTotals
    totals = FluxTotals(
        F_down_band=None, F_up_band=None, F_dir_band=None,
        F_down_tot=jnp.asarray(F_down_tot),
        F_up_tot=jnp.asarray(F_down_tot + F_net),
        F_net=jnp.asarray(F_net))

    class M:
        p_lay = jnp.asarray(g.p_lay)
        p_int = jnp.asarray(g.p_int)

    res = rad_mod.rad_temp_step(
        phys, M, totals, jnp.asarray(T_lay), jnp.asarray(T_store),
        jnp.asarray(prefactor), jnp.asarray(itervalue),
        jnp.asarray(phys.rad_convergence_limit))

    want = refc.rad_temp_iter(
        F_down_tot, F_net, T_lay, g.p_lay, g.p_int, T_store, prefactor,
        np.zeros(L), np.zeros(L), itervalue, foreplay=phys.foreplay,
        local_limit=phys.rad_convergence_limit,
        adapt_interval=phys.adapt_interval, smooth=smooth,
        dim=phys.plancktable_dim, step=phys.plancktable_step,
        F_intern=phys.F_intern)
    w_T, w_Ts, w_pref, w_fss, w_abort = want

    np.testing.assert_allclose(np.asarray(res.T_lay), w_T, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(res.T_store), w_Ts, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(res.prefactor), w_pref, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(res.F_smooth_sum), w_fss,
                               rtol=1e-12, atol=1e-300)
    np.testing.assert_array_equal(np.asarray(res.abort), w_abort)


# --------------------------------------------------------------------------- #
# end-to-end: radiative equilibrium on a small gray problem
# --------------------------------------------------------------------------- #

def test_radiation_loop_reaches_equilibrium():
    """Small gray-opacity RCE run: the loop must converge (all abort flags)
    and end in radiative equilibrium: F_net ~ F_intern at every interface."""
    from helios_tpu.config import HeliosConfig
    from helios_tpu.forward import build_model
    from helios_tpu.io.opacity import synthetic_premixed_table

    table = synthetic_premixed_table(nbin=16, ny=4, ntemp=12, npress=10,
                                     seed=3)
    cfg = HeliosConfig(planet="manual", g=2288.0, a=0.0153, R_planet=1.0,
                       R_star=1.0, T_star=4000.0, T_intern=200.0,
                       scattering="no", direct_beam="no", convection="no",
                       run_type="iterative", iso_input="yes", nlayer=12,
                       p_boa=1e8, p_toa=1e3,
                       rad_convergence_limit=1e-6)
    cfg = cfg.finalize()
    phys, arrays = build_model(cfg, table)

    T0 = jnp.full(phys.nlayer + 1, 1000.0)
    loop = jax.jit(lambda t: rad_mod.radiation_loop(phys, arrays, None, t))
    final = loop(T0)

    assert bool(jnp.all(final.abort)), (
        f"not converged after {int(final.it)} iters; "
        f"abort={np.asarray(final.abort)}")
    assert not bool(final.aborted)
    # radiative equilibrium: net flux == F_intern through the atmosphere
    F_net = np.asarray(final.totals.F_net)
    denom = float(final.totals.F_down_tot[phys.nlayer]) + phys.F_intern
    resid = np.abs(F_net - phys.F_intern) / denom
    assert resid.max() < 1e-5, resid


def test_convection_loop_end_to_end():
    """Non-isothermal RCE with convective adjustment: strongly-heated
    interior drives a deep convective zone; the loop must terminate with a
    convectively stable profile and radiative equilibrium in the
    radiative layers."""
    from helios_tpu.config import HeliosConfig
    from helios_tpu.forward import build_model
    from helios_tpu.io.opacity import synthetic_premixed_table
    from helios_tpu.rce.loop import convection_loop
    from helios_tpu.rce.radiative import make_const_thermo, radiation_loop

    table = synthetic_premixed_table(nbin=12, ny=3, ntemp=12, npress=10,
                                     seed=5)
    table.kpoints *= 10.0      # optically thick -> steep radiative gradient
    cfg = HeliosConfig(planet="manual", g=2288.0, a=0.0153, R_planet=1.0,
                       R_star=1.0, T_star=30.0, T_intern=700.0,
                       scattering="no", direct_beam="no", convection="yes",
                       kappa_value=0.1,  # shallow adiabat -> deep convection
                       run_type="iterative", nlayer=14,
                       p_boa=1e9, p_toa=1e3,
                       rad_convergence_limit=1e-5, adapt_interval=6)
    cfg = cfg.finalize()
    assert cfg.iso == 0
    phys, arrays = build_model(cfg, table)
    thermo = make_const_thermo(cfg.kappa_value)

    T0 = jnp.full(phys.nlayer + 1, 900.0)
    rad = jax.jit(lambda t: radiation_loop(phys, arrays, thermo, t))(T0)
    final = jax.jit(
        lambda r: convection_loop(phys, arrays, thermo, r,
                                  max_steps=6000))(rad)

    assert not bool(final.keep_running), "convection loop did not converge"
    assert int(final.it) >= 400        # min-400-iteration rule held
    T = np.asarray(final.T_lay)
    L = phys.nlayer
    conv_layer = np.asarray(final.conv_layer)
    # the scenario is built to convect: most of the atmosphere adjusted
    assert conv_layer.sum() >= L // 2
    # stability: no convectively unstable layers remain
    import reference_convect as refc2
    kl = np.full(L, float(cfg.kappa_value))
    ki = np.full(L + 1, float(cfg.kappa_value))
    g = grid_mod.build_grid(cfg.p_boa, cfg.p_toa, L, cfg.g)
    assert not refc2.conv_check(T, g.p_lay, g.p_int, kl, ki).any()
    # convective zone lies on one adiabat: T[i+1]/T[i] follows p^kappa
    zone = np.where(conv_layer[:L])[0]
    inner = zone[(zone + 1 < L)]
    inner = inner[conv_layer[inner + 1]]
    ratio = T[inner + 1] / T[inner]
    adiabat = ((g.p_lay[inner + 1] / g.p_int[inner + 1]) ** ki[inner + 1]
               * (g.p_int[inner + 1] / g.p_lay[inner]) ** kl[inner])
    np.testing.assert_allclose(ratio, adiabat, rtol=1e-6)
    # radiative-equilibrium criterion holds on radiative layers (if any)
    F_net = np.asarray(final.totals.F_net)
    denom = float(final.totals.F_down_tot[L]) + phys.F_intern
    rad_layers = np.where(~conv_layer[:L])[0]
    if len(rad_layers):
        resid = np.abs(phys.F_intern - F_net[rad_layers + 1]) / denom
        assert resid.max() < float(final.local_limit) * 1.01
