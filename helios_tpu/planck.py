"""Planck function utilities: band-integrated Planck table and lookups.

TPU-native redesign of the reference's Planck machinery
(source/kernels.cu:55-105 planck_func/analyt_planck, :362-416 plancktable,
:923-1010 planck_interpol_layer/interface):

* the table is built in one vectorized pass -- the 200-term analytic series
  is evaluated per *bin edge* and differenced across edges (mathematically
  identical to the reference's per-bin evaluation, at half the flops),
* lookups are vectorized gathers with the same clamped linear interpolation
  index math as the reference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from helios_tpu import constants as pc

_N_SERIES = 200  # reference kernels.cu:410: n = 1..199


def planck_lambda(lamda, T):
    """Spectral radiance B_lambda(T) [erg s^-1 cm^-2 cm^-1 sr^-1].

    Reference kernels.cu:55-61.
    """
    num = 2.0 * pc.H * pc.C * pc.C
    denom = lamda ** 5 * (jnp.exp(pc.H * pc.C / (lamda * pc.K_B * T)) - 1.0)
    return num / denom


def dB_dT(lamda, T):
    """Temperature derivative of the Planck function (kernels.cu:294-308)."""
    D = 2.0 * pc.H * pc.C ** 3 * pc.H / (lamda ** 6 * pc.K_B * T * T)
    e = jnp.exp(pc.H * pc.C / (lamda * pc.K_B * T))
    return D * e / ((e - 1.0) * (e - 1.0))


def _series_antiderivative(y, n_terms=_N_SERIES):
    """S(y) = sum_{n=1}^{n_terms-1} exp(-n y)(y^3/n + 3y^2/n^2 + 6y/n^3 + 6/n^4).

    The reference evaluates, per bin, sum_n [E_n(y_top) - E_n(y_bot)]
    (kernels.cu:95-105, :410-412); we evaluate the summed antiderivative per
    bin *edge* and difference across edges -- identical math, shared work.
    """
    def body(n, acc):
        dn = n.astype(y.dtype)
        e = jnp.exp(-dn * y)
        return acc + e * (y ** 3 / dn + 3.0 * y ** 2 / dn ** 2
                          + 6.0 * y / dn ** 3 + 6.0 / dn ** 4)

    acc0 = jnp.zeros_like(y)
    return jax.lax.fori_loop(1, n_terms, body, acc0)


def integrated_planck_over_bins(lambda_edge, delta_lambda, T):
    """Band-mean Planck function over wavelength bins for temperatures T.

    Args:
      lambda_edge: [nbin+1] bin edge wavelengths [cm] (increasing).
      delta_lambda: [nbin] bin widths [cm].
      T: [...,] temperatures [K].

    Returns:
      [..., nbin] band-integrated B divided by bin width (like the
      reference's planck_grid, kernels.cu:395-414).
    """
    T = jnp.asarray(T)
    Tb = T[..., None]                              # [..., 1]
    y_edge = pc.H * pc.C / (lambda_edge * pc.K_B * Tb)   # [..., nbin+1]
    # y decreases with lambda: y_bot = y at lambda_edge[x], y_top at [x+1]
    S = _series_antiderivative(y_edge)
    D = (2.0 * (pc.K_B / pc.H) ** 3 * pc.K_B * Tb ** 4) / (pc.C * pc.C)
    # integral over bin = D * (E(y_top) - E(y_bot)) summed over n
    band = D * (S[..., 1:] - S[..., :-1])
    band = jnp.where(Tb > 0.01, band, 0.0)
    return band / delta_lambda


def build_planck_table(lambda_edge, delta_lambda, T_star,
                       dim: int = 8000, step: int = 2,
                       dtype=jnp.float64):
    """Pre-tabulated band-integrated Planck grid.

    Temperature grid: T_t = t*step + 1 for t = 0..dim-1, plus one extra row
    at T_star (reference kernels.cu:384-393).  Returns [dim+1, nbin].
    """
    t_idx = jnp.arange(dim, dtype=dtype)
    T_grid = t_idx * step + 1.0
    T_all = jnp.concatenate([T_grid, jnp.asarray([T_star], dtype=dtype)])
    lambda_edge = jnp.asarray(lambda_edge, dtype)
    delta_lambda = jnp.asarray(delta_lambda, dtype)
    return integrated_planck_over_bins(lambda_edge, delta_lambda, T_all)


def split_planck_grid(planck_grid):
    """fp64 Planck grid -> stacked (hi, lo) float32 pairs [2, dim+1, B].

    Stored once in ModelArrays so every lookup gathers float32 rows: on
    TPU, XLA lowers an fp64 row gather to an emulated-fp64 one-hot
    dot_general ~25x slower than fp32 -- at 0.33 ms per lookup it was the
    single largest per-iteration cost of the RCE loop.  The pair gather +
    df64 interpolation reproduces the fp64 lookup to ~1e-14.
    """
    hi = planck_grid.astype(jnp.float32)
    lo = (planck_grid - hi.astype(planck_grid.dtype)).astype(jnp.float32)
    return jnp.stack([hi, lo])


def interpolate_planck(planck_grid, T, dim: int, step: int, pairs=None):
    """Linear lookup of band Planck values at temperatures T.

    Index math follows reference kernels.cu:952-974: t = (T-1)/step clamped
    to [0.001, dim-1.001].  Returns [..., nbin].

    ``pairs``: optional split_planck_grid output; the gather and the
    linear interpolation then run in double-float32 (fast on TPU).
    """
    t = (T - 1.0) / step
    t = jnp.clip(t, 0.001, dim - 1.001)
    tdown = jnp.floor(t).astype(jnp.int32)
    w = (t - tdown)[..., None]

    if pairs is not None and planck_grid.dtype == jnp.float64:
        from helios_tpu.ops import df64
        lo_rows = jnp.take(pairs, tdown, axis=1)       # [2, ..., B] f32
        hi_rows = jnp.take(pairs, tdown + 1, axis=1)
        wp = df64.split(w)
        one_m = df64.sub(df64.const(1.0, wp.hi), wp)
        val = df64.add(df64.mul(df64.DF(lo_rows[0], lo_rows[1]), one_m),
                       df64.mul(df64.DF(hi_rows[0], hi_rows[1]), wp))
        return df64.combine(val, planck_grid.dtype)

    lo = planck_grid[tdown]
    hi = planck_grid[tdown + 1]
    return lo * (1.0 - w) + hi * w


def planckband_layers(planck_grid, T_lay, starflux, *, real_star: int,
                      dim: int, step: int, pairs=None):
    """Planck band values for layers + stellar row + surface row.

    Returns [nlayer+2, nbin]: rows 0..nlayer-1 from layer temperatures,
    row nlayer = stellar flux / pi (or the tabulated B(T_star) row),
    row nlayer+1 = surface/BOA blackbody at T_lay[nlayer]
    (reference kernels.cu:923-977; layout note SURVEY.md section 2.3).

    T_lay: [nlayer+1] including surface ghost layer at index nlayer.
    """
    nlayer = T_lay.shape[0] - 1
    lay_rows = interpolate_planck(planck_grid, T_lay[:nlayer], dim, step,
                                  pairs)
    surf_row = interpolate_planck(planck_grid, T_lay[nlayer], dim, step,
                                  pairs)
    if real_star:
        star_row = starflux / jnp.pi
    else:
        star_row = planck_grid[dim]
    return jnp.concatenate(
        [lay_rows, star_row[None, :], surf_row[None, :]], axis=0)


def planckband_interfaces(planck_grid, T_int, *, dim: int, step: int,
                          pairs=None):
    """Planck band values at interface temperatures: [ninterface, nbin]."""
    return interpolate_planck(planck_grid, T_int, dim, step, pairs)


def _interpolate_planck_df(pairs, T, dim: int, step: int):
    """df64-pairs Planck lookup: returns an ops.df64.DF [..., nbin]."""
    from helios_tpu.ops import df64
    t = (T - 1.0) / step
    t = jnp.clip(t, 0.001, dim - 1.001)
    tdown = jnp.floor(t).astype(jnp.int32)
    w = (t - tdown)[..., None]
    lo_rows = jnp.take(pairs, tdown, axis=1)
    hi_rows = jnp.take(pairs, tdown + 1, axis=1)
    wp = df64.split(w)
    one_m = df64.sub(df64.const(1.0, wp.hi), wp)
    return df64.add(df64.mul(df64.DF(lo_rows[0], lo_rows[1]), one_m),
                    df64.mul(df64.DF(hi_rows[0], hi_rows[1]), wp))


def planckband_layers_df(pairs, T_lay, starflux, *, real_star: int,
                         dim: int, step: int):
    """planckband_layers entirely in df64 pairs (the pairs-native
    per-iteration path): returns an ops.df64.DF [nlayer+2, nbin]."""
    from helios_tpu.ops import df64
    nlayer = T_lay.shape[0] - 1
    lay = _interpolate_planck_df(pairs, T_lay[:nlayer], dim, step)
    surf = _interpolate_planck_df(pairs, T_lay[nlayer:nlayer + 1], dim,
                                  step)
    if real_star:
        star = df64.split(starflux / jnp.pi)
    else:
        star = df64.DF(pairs[0, dim], pairs[1, dim])
    return df64.DF(
        jnp.concatenate([lay.hi, star.hi[None, :], surf.hi], axis=0),
        jnp.concatenate([lay.lo, star.lo[None, :], surf.lo], axis=0))


def planckband_interfaces_df(pairs, T_int, *, dim: int, step: int):
    """planckband_interfaces in df64 pairs: DF [ninterface, nbin]."""
    return _interpolate_planck_df(pairs, T_int, dim, step)


def correct_incident_energy(planck_grid, starflux, delta_lambda, *,
                            real_star: int, T_star: float, dim: int):
    """Rescale stellar spectrum / BB row so the integral equals sigma*T_star^4.

    Reference kernels.cu:420-468.  Returns (planck_grid, starflux,
    corr_factor).
    """
    if real_star:
        num_flux = jnp.sum(delta_lambda * starflux)
    else:
        num_flux = jnp.sum(delta_lambda * jnp.pi * planck_grid[dim])
    theo_flux = pc.SIGMA_SB * T_star ** 4.0
    corr = theo_flux / num_flux
    if real_star:
        starflux = starflux * corr
    else:
        planck_grid = planck_grid.at[dim].multiply(corr)
    return planck_grid, starflux, corr
