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


@pytest.mark.parametrize("ny", [4, 20])
def test_pallas_random_overlap_matches_xla(rng, ny):
    """ro_pallas (in-VMEM bitonic sort + df64 rebin) reproduces the
    exact XLA random_overlap_mix; interpreter mode on CPU."""
    from helios_tpu.kernels.ro_pallas import random_overlap_mix_pallas
    from helios_tpu.ops import mixing as mix_ops

    L, B = 3, 5
    a = np.sort(np.exp(rng.normal(0, 4, (L, B, ny))), axis=-1)
    b = np.sort(np.exp(rng.normal(0, 4, (L, B, ny))), axis=-1)
    gy_, gw_ = np.polynomial.legendre.leggauss(ny)
    gy = jnp.asarray((gy_ + 1) / 2)
    gw = jnp.asarray(gw_)

    want = np.asarray(mix_ops.random_overlap_mix(
        jnp.asarray(a), jnp.asarray(b), gw, gy))
    got = np.asarray(random_overlap_mix_pallas(
        jnp.asarray(a), jnp.asarray(b), gw, gy, tile_c=128))
    np.testing.assert_allclose(got, want, rtol=1e-10)


def test_pallas_thomas_matches_scan(rng):
    """thomas_pallas (df64 in-VMEM elimination) reproduces the fp64
    lax.scan Thomas solver on a diagonally-dominant system."""
    from helios_tpu.ops.thomas import thomas_solve

    n, S = 22, 40
    c = jnp.asarray(rng.uniform(-0.4, 0.4, (n, S)))
    c = c.at[-1].set(0.0)
    b = jnp.asarray(rng.uniform(1.0, 2.0, (n, S)))
    d = jnp.asarray(rng.uniform(-1e3, 1e3, (n, S)))

    want = np.asarray(thomas_solve(b, c, d))
    got = np.asarray(thomas_solve(b, c, d, use_pallas=True))
    np.testing.assert_allclose(got, want, rtol=1e-10)
