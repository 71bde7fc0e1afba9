"""Pallas fused-sweep kernel parity (interpreter mode on CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from helios_tpu.ops import sweep as sweep_ops
from helios_tpu.kernels.sweep_pallas import fband_iso_pallas

from test_sweep import make_cells


@pytest.mark.parametrize("n_passes", [1, 4])
@pytest.mark.parametrize("scat_corr", [0, 1])
def test_pallas_iso_sweep_matches_scan(rng, n_passes, scat_corr):
    L, B, Y = 9, 5, 3
    cells, arr, par = make_cells(rng, L, B, Y, scat_corr=scat_corr)
    nint = L + 1
    planckband_lay = rng.uniform(1e2, 1e4, (L + 2, B))
    F_dir = -rng.uniform(0.0, 1e3, (nint, B, Y))
    surf_albedo = rng.uniform(0.0, 0.5, B)
    F_up0 = rng.uniform(0, 1e3, (nint, B, Y))
    kw = dict(n_passes=n_passes, scat_corr=scat_corr,
              i2s_transition=par["i2s"], epsi=par["epsi"],
              mu_star=par["mu_star"], dir_beam=0, f_factor=0.5,
              R_star=7e10, a=1.5e12)

    want = sweep_ops.fband_iso(
        cells, jnp.asarray(planckband_lay), jnp.asarray(F_dir),
        jnp.asarray(surf_albedo), jnp.asarray(F_up0), **kw)
    got = fband_iso_pallas(
        cells, jnp.asarray(planckband_lay), jnp.asarray(F_dir),
        jnp.asarray(surf_albedo), jnp.asarray(F_up0), **kw)

    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), rtol=1e-12)


def test_pallas_padding_path(rng):
    """Spectral size not a lane multiple exercises the padding logic."""
    L, B, Y = 6, 7, 5   # S = 35, forces padding to 128
    cells, arr, par = make_cells(rng, L, B, Y)
    nint = L + 1
    planckband_lay = rng.uniform(1e2, 1e4, (L + 2, B))
    F_dir = np.zeros((nint, B, Y))
    surf_albedo = rng.uniform(0.0, 0.3, B)
    F_up0 = np.zeros((nint, B, Y))
    kw = dict(n_passes=2, scat_corr=0, i2s_transition=par["i2s"],
              epsi=par["epsi"], mu_star=par["mu_star"], dir_beam=0,
              f_factor=0.5, R_star=7e10, a=1.5e12)
    want = sweep_ops.fband_iso(
        cells, jnp.asarray(planckband_lay), jnp.asarray(F_dir),
        jnp.asarray(surf_albedo), jnp.asarray(F_up0), **kw)
    got = fband_iso_pallas(
        cells, jnp.asarray(planckband_lay), jnp.asarray(F_dir),
        jnp.asarray(surf_albedo), jnp.asarray(F_up0), **kw)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), rtol=1e-12)
