"""Parity tests of the flux solvers against the numpy oracle, and
cross-consistency between the iterative and matrix methods."""

import numpy as np
import pytest

import jax.numpy as jnp

from helios_tpu.ops import sweep as sweep_ops
from helios_tpu.ops import thomas as thomas_ops
from helios_tpu.ops.twostream import CellQuantities, E_maybe
from helios_tpu.ops import twostream as ts

import reference_impl as ref


def make_cells(rng, L, B, Y, *, w0_max=0.8, scat_corr=0, i2s=0.1):
    """Random but physically-consistent cell quantities."""
    w0 = rng.uniform(0.0, w0_max, (L, B, Y))
    g0 = rng.uniform(0.0, 0.5, (L, B))
    dtau = 10 ** rng.uniform(-3, 0.5, (L, B, Y))
    epsi = 0.5
    g0b = g0[:, :, None]
    trans = np.asarray(ts.trans_func(epsi, jnp.asarray(dtau),
                                     jnp.asarray(w0), jnp.asarray(g0b),
                                     scat_corr, i2s))
    zm = np.asarray(ts.zeta_minus(jnp.asarray(w0), jnp.asarray(g0b),
                                  scat_corr, i2s))
    zp = np.asarray(ts.zeta_plus(jnp.asarray(w0), jnp.asarray(g0b),
                                 scat_corr, i2s))
    M = zm * zm * trans * trans - zp * zp
    N = zp * zm * (1 - trans * trans)
    P = (zm * zm - zp * zp) * trans
    mu_star = -0.6
    epsi2 = 0.5
    Gp = np.asarray(ts.G_plus(jnp.asarray(w0), jnp.asarray(g0b), epsi, epsi2,
                              mu_star, scat_corr, i2s))
    Gm = np.asarray(ts.G_minus(jnp.asarray(w0), jnp.asarray(g0b), epsi,
                               epsi2, mu_star, scat_corr, i2s))
    cells = CellQuantities(
        w0=jnp.asarray(w0), delta_tau=jnp.asarray(dtau),
        delta_tau_clouds=jnp.zeros((L, B)), trans=jnp.asarray(trans),
        M=jnp.asarray(M), N=jnp.asarray(N), P=jnp.asarray(P),
        G_pl=jnp.asarray(Gp), G_min=jnp.asarray(Gm), g0=jnp.asarray(g0))
    arrays = dict(w0=w0, M=M, N=N, P=P, Gp=Gp, Gm=Gm, g0=g0, trans=trans,
                  dtau=dtau)
    return cells, arrays, dict(epsi=epsi, epsi2=epsi2, mu_star=mu_star,
                               scat_corr=scat_corr, i2s=i2s)


@pytest.mark.parametrize("scat_corr", [0, 1])
@pytest.mark.parametrize("n_passes", [1, 4])
def test_fband_iso_matches_oracle(rng, scat_corr, n_passes):
    L, B, Y = 7, 4, 3
    cells, arr, par = make_cells(rng, L, B, Y, scat_corr=scat_corr)
    nint = L + 1

    planckband_lay = rng.uniform(1e2, 1e4, (L + 2, B))
    F_dir = -rng.uniform(0.0, 1e3, (nint, B, Y))   # direct flux is negative
    surf_albedo = rng.uniform(0.0, 0.5, B)
    F_up0 = rng.uniform(0, 1e3, (nint, B, Y))

    kw = dict(dir_beam=0, f_factor=0.5, R_star=7e10, a=1.5e12)

    got_down, got_up = sweep_ops.fband_iso(
        cells, jnp.asarray(planckband_lay), jnp.asarray(F_dir),
        jnp.asarray(surf_albedo), jnp.asarray(F_up0),
        n_passes=n_passes, scat_corr=scat_corr, i2s_transition=par["i2s"],
        epsi=par["epsi"], mu_star=par["mu_star"], **kw)

    want_down, want_up = ref.fband_iso_sweep(
        np.zeros((nint, B, Y)), F_up0.copy(), F_dir,
        planckband_lay[:L], planckband_lay[L], planckband_lay[L + 1],
        arr["w0"], arr["M"], arr["N"], arr["P"], arr["Gp"], arr["Gm"],
        arr["g0"], surf_albedo, scat_corr=scat_corr, i2s=par["i2s"],
        epsi=par["epsi"], mu_star=par["mu_star"], n_passes=n_passes, **kw)

    np.testing.assert_allclose(np.asarray(got_down), want_down, rtol=1e-10)
    np.testing.assert_allclose(np.asarray(got_up), want_up, rtol=1e-10)


def test_matrix_iso_agrees_with_converged_sweep(rng):
    """The Thomas solve is the exact solution of the coupled system the
    iterative sweeps converge to (kernels.cu:1803 vs :1366)."""
    L, B, Y = 9, 3, 2
    cells, arr, par = make_cells(rng, L, B, Y, w0_max=0.6, scat_corr=0)
    nint = L + 1

    planckband_lay = rng.uniform(1e2, 1e4, (L + 2, B))
    F_dir = np.zeros((nint, B, Y))
    surf_albedo = rng.uniform(0.0, 0.3, B)
    F_up0 = jnp.zeros((nint, B, Y))
    scat_trigger = jnp.ones((B, Y), bool)

    kw = dict(scat_corr=0, i2s_transition=par["i2s"], epsi=par["epsi"],
              mu_star=par["mu_star"], dir_beam=0, f_factor=0.5,
              R_star=7e10, a=1.5e12)

    mat_down, mat_up = thomas_ops.fband_matrix_iso(
        cells, jnp.asarray(planckband_lay), jnp.asarray(F_dir),
        jnp.asarray(surf_albedo), scat_trigger, **kw)

    it_down, it_up = sweep_ops.fband_iso(
        cells, jnp.asarray(planckband_lay), jnp.asarray(F_dir),
        jnp.asarray(surf_albedo), F_up0, n_passes=400, **kw)

    np.testing.assert_allclose(np.asarray(mat_down), np.asarray(it_down),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(mat_up), np.asarray(it_up),
                               rtol=1e-6)


def test_matrix_iso_pure_absorption_branch(rng):
    """Columns without scattering trigger use the absorption recurrence
    (kernels.cu:1969-2022)."""
    L, B, Y = 6, 3, 2
    cells, arr, par = make_cells(rng, L, B, Y, w0_max=1e-6)
    nint = L + 1
    planckband_lay = rng.uniform(1e2, 1e4, (L + 2, B))
    F_dir = np.zeros((nint, B, Y))
    surf_albedo = rng.uniform(0.0, 0.3, B)
    scat_trigger = jnp.zeros((B, Y), bool)

    kw = dict(scat_corr=0, i2s_transition=par["i2s"], epsi=par["epsi"],
              mu_star=par["mu_star"], dir_beam=0, f_factor=0.5,
              R_star=7e10, a=1.5e12)
    got_down, got_up = thomas_ops.fband_matrix_iso(
        cells, jnp.asarray(planckband_lay), jnp.asarray(F_dir),
        jnp.asarray(surf_albedo), scat_trigger, **kw)

    # manual absorption recurrence
    t = arr["trans"]
    PI = np.pi
    toa = 0.5 * (7e10 / 1.5e12) ** 2 * PI * planckband_lay[L]
    want_down = np.zeros((nint, B, Y))
    want_down[nint - 1] = toa[:, None]
    for i in range(nint - 2, -1, -1):
        want_down[i] = (t[i] * want_down[i + 1]
                        + 2 * PI * par["epsi"] * (1 - t[i])
                        * planckband_lay[i][:, None])
    want_up = np.zeros((nint, B, Y))
    want_up[0] = (surf_albedo[:, None] * (F_dir[0] + want_down[0])
                  + (1 - surf_albedo)[:, None] * PI
                  * planckband_lay[L + 1][:, None])
    for i in range(1, nint):
        want_up[i] = (t[i - 1] * want_up[i - 1]
                      + 2 * PI * par["epsi"] * (1 - t[i - 1])
                      * planckband_lay[i - 1][:, None])

    np.testing.assert_allclose(np.asarray(got_down), want_down, rtol=1e-10)
    np.testing.assert_allclose(np.asarray(got_up), want_up, rtol=1e-10)


def test_noniso_consistency_with_iso_for_uniform_profile(rng):
    """With identical upper/lower half-layers and equal layer/interface
    Planck values, the non-isothermal solver must reproduce the isothermal
    fluxes at the interfaces."""
    L, B, Y = 6, 3, 2
    nint = L + 1
    # build iso cells with dtau split evenly
    cells, arr, par = make_cells(rng, L, B, Y, w0_max=0.5)

    halfc, _, _ = make_cells(rng, L, B, Y)  # placeholder, will rebuild below
    # construct half-layer cells with half the optical depth
    dtau_half = arr["dtau"] / 2
    g0b = arr["g0"][:, :, None]
    trans_h = np.asarray(ts.trans_func(par["epsi"], jnp.asarray(dtau_half),
                                       jnp.asarray(arr["w0"]),
                                       jnp.asarray(g0b), 0, par["i2s"]))
    zm = np.asarray(ts.zeta_minus(jnp.asarray(arr["w0"]), jnp.asarray(g0b),
                                  0, par["i2s"]))
    zp = np.asarray(ts.zeta_plus(jnp.asarray(arr["w0"]), jnp.asarray(g0b),
                                 0, par["i2s"]))
    M = zm * zm * trans_h * trans_h - zp * zp
    N = zp * zm * (1 - trans_h * trans_h)
    P = (zm * zm - zp * zp) * trans_h
    half = CellQuantities(
        w0=jnp.asarray(arr["w0"]), delta_tau=jnp.asarray(dtau_half),
        delta_tau_clouds=jnp.zeros((L, B)), trans=jnp.asarray(trans_h),
        M=jnp.asarray(M), N=jnp.asarray(N), P=jnp.asarray(P),
        G_pl=cells.G_pl, G_min=cells.G_min, g0=cells.g0)

    planckband_lay = rng.uniform(1e2, 1e4, (L + 2, B))
    # isothermal within each layer: interface Planck = adjacent layer Planck
    # is only consistent if all layers share one temperature; use constant B
    planckband_lay[:L] = planckband_lay[0]
    planckband_int = np.broadcast_to(planckband_lay[0], (nint, B)).copy()

    F_dir = np.zeros((nint, B, Y))
    Fc_dir = np.zeros((L, B, Y))
    surf_albedo = np.full(B, 1e-8)

    kw = dict(scat_corr=0, i2s_transition=par["i2s"], epsi=par["epsi"],
              mu_star=par["mu_star"], dir_beam=0, f_factor=0.5,
              R_star=7e10, a=1.5e12)

    iso_down, iso_up = sweep_ops.fband_iso(
        cells, jnp.asarray(planckband_lay), jnp.asarray(F_dir),
        jnp.asarray(surf_albedo), jnp.zeros((nint, B, Y)),
        n_passes=300, **kw)

    no_down, no_up, _, _ = sweep_ops.fband_noniso(
        half, half, jnp.asarray(planckband_lay), jnp.asarray(planckband_int),
        jnp.asarray(F_dir), jnp.asarray(Fc_dir), jnp.asarray(surf_albedo),
        jnp.zeros((nint, B, Y)), jnp.zeros((L, B, Y)),
        n_passes=300, delta_tau_limit=1e-4, **kw)

    np.testing.assert_allclose(np.asarray(no_down), np.asarray(iso_down),
                               rtol=2e-4)
    np.testing.assert_allclose(np.asarray(no_up), np.asarray(iso_up),
                               rtol=2e-4)


def test_matrix_noniso_agrees_with_converged_sweep(rng):
    L, B, Y = 7, 3, 2
    upper, _, par = make_cells(rng, L, B, Y, w0_max=0.5)
    lower, _, _ = make_cells(rng, L, B, Y, w0_max=0.5)
    nint = L + 1

    planckband_lay = rng.uniform(1e2, 1e4, (L + 2, B))
    planckband_int = rng.uniform(1e2, 1e4, (nint, B))
    F_dir = np.zeros((nint, B, Y))
    Fc_dir = np.zeros((L, B, Y))
    surf_albedo = rng.uniform(0.0, 0.3, B)
    scat_trigger = jnp.ones((B, Y), bool)

    kw = dict(scat_corr=0, i2s_transition=par["i2s"], epsi=par["epsi"],
              mu_star=par["mu_star"], dir_beam=0, f_factor=0.5,
              R_star=7e10, a=1.5e12, delta_tau_limit=1e-4)

    m = thomas_ops.fband_matrix_noniso(
        upper, lower, jnp.asarray(planckband_lay),
        jnp.asarray(planckband_int), jnp.asarray(F_dir), jnp.asarray(Fc_dir),
        jnp.asarray(surf_albedo), scat_trigger, **kw)

    it = sweep_ops.fband_noniso(
        upper, lower, jnp.asarray(planckband_lay),
        jnp.asarray(planckband_int), jnp.asarray(F_dir), jnp.asarray(Fc_dir),
        jnp.asarray(surf_albedo), jnp.zeros((nint, B, Y)),
        jnp.zeros((L, B, Y)), n_passes=500, **kw)

    for got, want in zip(m, it):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5)
