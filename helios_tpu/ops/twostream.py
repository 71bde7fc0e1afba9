"""Two-stream cell quantities: w0, optical depth, transmission, coupling terms.

Physics parity with the reference device helpers (source/kernels.cu:109-331)
and the calc_trans_iso / calc_trans_noniso kernels (kernels.cu:1015-1243),
recast as vectorized ops over dense [layer, bin, y] arrays.

Shapes:
  * per-cell spectral arrays: [L, B, Y] (layer, wavelength bin, Gauss point)
  * per-band arrays: [L, B]
  * per-layer arrays: [L]
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp


def E_parameter(w0, g0, i2s_transition):
    """Improved two-stream correction E(w0, g0), Heng/Malik/Kitzmann 2018.

    Reference kernels.cu:109-124.
    """
    E_fit = jnp.maximum(
        1.0,
        1.225 - 0.1582 * g0 - 0.1777 * w0 - 0.07465 * g0 ** 2
        + 0.2351 * w0 * g0 - 0.05582 * w0 ** 2)
    return jnp.where((w0 > i2s_transition) & (g0 >= 0), E_fit, 1.0)


def E_maybe(w0, g0, scat_corr: int, i2s_transition):
    if scat_corr:
        return E_parameter(w0, g0, i2s_transition)
    return jnp.ones_like(w0)


def single_scat_albedo(scat_cross, abs_cross, w_0_limit):
    """w0 = min(sigma_s/(sigma_s+sigma_a), limit) (kernels.cu:249-256)."""
    return jnp.minimum(scat_cross / (scat_cross + abs_cross), w_0_limit)


def trans_func(epsi, delta_tau, w0, g0, scat_corr: int, i2s_transition):
    """T = exp(-(1/eps)*sqrt(E(1-w0 g0)(E-w0))*dtau) (kernels.cu:128-145)."""
    E = E_maybe(w0, g0, scat_corr, i2s_transition)
    return jnp.exp(-1.0 / epsi * jnp.sqrt(E * (1.0 - w0 * g0) * (E - w0))
                   * delta_tau)


def zeta_minus(w0, g0, scat_corr: int, i2s_transition):
    E = E_maybe(w0, g0, scat_corr, i2s_transition)
    return 0.5 * (1.0 - jnp.sqrt((E - w0) / (E * (1.0 - w0 * g0))))


def zeta_plus(w0, g0, scat_corr: int, i2s_transition):
    E = E_maybe(w0, g0, scat_corr, i2s_transition)
    return 0.5 * (1.0 + jnp.sqrt((E - w0) / (E * (1.0 - w0 * g0))))


def _G_pm(w0, g0, epsi, epsi2, mu_star, scat_corr: int, i2s_transition,
          sign: float):
    """G+ (sign=+1) / G- (sign=-1) coupling coefficients
    (kernels.cu:149-213)."""
    E = E_maybe(w0, g0, scat_corr, i2s_transition)
    num = w0 * (E * (1.0 - w0 * g0) + g0 * epsi / epsi2)
    denom = E * epsi ** -2.0 * (E - w0) * (1.0 - w0 * g0) - mu_star ** -2.0
    # the direct-beam resonance denominator can round to exactly zero
    # (guaranteed in fp32 for w0 -> 0 with the default mu* = -0.5); the
    # reference relies on G_limiter for the blow-up -- a sign-preserving
    # floor keeps 0/0 out and hands large values to the limiter
    denom = jnp.where(denom == 0.0, 1e-30, denom)
    second = 1.0 / epsi + sign * 1.0 / (mu_star * E * (1.0 - w0 * g0))
    third = epsi * w0 * g0 * mu_star / (epsi2 * E * (1.0 - w0 * g0))
    return 0.5 * (num / denom * second + sign * third)


def G_limiter(G):
    """Clamp |G| <= 1e8 (kernels.cu:218-231)."""
    return jnp.where(jnp.abs(G) < 1e8, G, 1e8 * jnp.sign(G))


def G_plus(w0, g0, epsi, epsi2, mu_star, scat_corr: int, i2s_transition):
    return G_limiter(_G_pm(w0, g0, epsi, epsi2, mu_star, scat_corr,
                           i2s_transition, +1.0))


def G_minus(w0, g0, epsi, epsi2, mu_star, scat_corr: int, i2s_transition):
    return G_limiter(_G_pm(w0, g0, epsi, epsi2, mu_star, scat_corr,
                           i2s_transition, -1.0))


class CellQuantities(NamedTuple):
    """Per-half-layer (or per-layer, iso) two-stream quantities [L, B, Y]."""
    w0: jnp.ndarray
    delta_tau: jnp.ndarray          # gas contribution only [L, B, Y]
    delta_tau_clouds: jnp.ndarray   # cloud contribution [L, B]
    trans: jnp.ndarray
    M: jnp.ndarray
    N: jnp.ndarray
    P: jnp.ndarray
    G_pl: jnp.ndarray
    G_min: jnp.ndarray
    g0: jnp.ndarray                 # effective asymmetry used [L, B]

    @property
    def delta_tau_total(self):
        return self.delta_tau + self.delta_tau_clouds[:, :, None]


def _cell_quantities(opac, meanmolmass, ray_scat_cross, cloud_abs_cross,
                     cloud_scat_cross, delta_colmass, g0_eff, *,
                     epsi, epsi2, mu_star, w_0_limit, scat_corr,
                     i2s_transition):
    """Shared math of calc_trans_iso/noniso for one set of half-layer
    averaged inputs.  opac: [L, B, Y]; per-band inputs [L, B]; column mass
    [L]; g0_eff [L, B]."""
    mmm = meanmolmass[:, None]          # [L, 1]
    dcm = delta_colmass[:, None]        # [L, 1]

    scat_tot = (ray_scat_cross + cloud_scat_cross)[:, :, None]
    abs_tot = opac * mmm[..., None] + cloud_abs_cross[:, :, None]
    w0 = single_scat_albedo(scat_tot, abs_tot, w_0_limit)

    delta_tau = dcm[..., None] * (opac + (ray_scat_cross / mmm)[:, :, None])
    delta_tau_clouds = dcm * (cloud_abs_cross + cloud_scat_cross) / mmm
    del_tau = delta_tau + delta_tau_clouds[:, :, None]

    g0b = g0_eff[:, :, None]
    trans = trans_func(epsi, del_tau, w0, g0b, scat_corr, i2s_transition)

    zm = zeta_minus(w0, g0b, scat_corr, i2s_transition)
    zp = zeta_plus(w0, g0b, scat_corr, i2s_transition)

    M = zm * zm * trans * trans - zp * zp
    N = zp * zm * (1.0 - trans * trans)
    P = (zm * zm - zp * zp) * trans

    G_pl = G_plus(w0, g0b, epsi, epsi2, mu_star, scat_corr, i2s_transition)
    G_min = G_minus(w0, g0b, epsi, epsi2, mu_star, scat_corr, i2s_transition)

    return CellQuantities(w0=w0, delta_tau=delta_tau,
                          delta_tau_clouds=delta_tau_clouds, trans=trans,
                          M=M, N=N, P=P, G_pl=G_pl, G_min=G_min, g0=g0_eff)


def g0_total(scat_cross, g_0_clouds, scat_cross_clouds, g_0: float):
    """Scattering-weighted mean asymmetry of gas + clouds
    (calc_total_g_0_of_gas_and_clouds, kernels.cu:472-492).  [L_or_I, B]."""
    num = g_0 * scat_cross + g_0_clouds * scat_cross_clouds
    denom = scat_cross + scat_cross_clouds
    return num / denom


def calc_trans_iso(opac_lay, meanmolmass_lay, scat_cross_lay,
                   cloud_abs_cross_lay, cloud_scat_cross_lay,
                   delta_colmass, g_0_tot_lay, *,
                   g_0: float, epsi: float, epsi2: float, mu_star: float,
                   w_0_limit: float, w_0_scat_limit: float,
                   scat: int, clouds: int, scat_corr: int,
                   i2s_transition: float):
    """Isothermal per-layer cell quantities (kernels.cu:1015-1104).

    Returns (CellQuantities, scat_trigger [B, Y] bool).
    """
    L, B = opac_lay.shape[0], opac_lay.shape[1]
    if not scat:
        ray = jnp.zeros_like(scat_cross_lay)
        cld_scat = jnp.zeros_like(cloud_scat_cross_lay)
    else:
        ray = scat_cross_lay
        cld_scat = cloud_scat_cross_lay
    g0_eff = g_0_tot_lay if clouds else jnp.full((L, B), g_0,
                                                 dtype=opac_lay.dtype)
    cells = _cell_quantities(
        opac_lay, meanmolmass_lay, ray, cloud_abs_cross_lay, cld_scat,
        delta_colmass, g0_eff, epsi=epsi, epsi2=epsi2, mu_star=mu_star,
        w_0_limit=w_0_limit, scat_corr=scat_corr,
        i2s_transition=i2s_transition)
    scat_trigger = jnp.any(cells.w0 > w_0_scat_limit, axis=0)  # [B, Y]
    return cells, scat_trigger


def calc_trans_noniso(opac_lay, opac_int, meanmolmass_lay, meanmolmass_int,
                      scat_cross_lay, scat_cross_int,
                      cloud_abs_cross_lay, cloud_abs_cross_int,
                      cloud_scat_cross_lay, cloud_scat_cross_int,
                      delta_col_upper, delta_col_lower,
                      g_0_tot_lay, g_0_tot_int, *,
                      g_0: float, epsi: float, epsi2: float, mu_star: float,
                      w_0_limit: float, w_0_scat_limit: float,
                      scat: int, clouds: int, scat_corr: int,
                      i2s_transition: float):
    """Non-isothermal upper/lower half-layer cell quantities
    (kernels.cu:1107-1243).

    Layer i's upper half spans layer-center i to interface i+1; the lower
    half spans interface i to layer-center i.  Quantities are arithmetic
    means of the adjacent center/interface values (kernels.cu:1171-1196).

    Returns (upper: CellQuantities, lower: CellQuantities,
             scat_trigger [B, Y]).
    """
    L, B = opac_lay.shape[0], opac_lay.shape[1]
    dtype = opac_lay.dtype

    def up_mean(lay, int_arr):
        return 0.5 * (lay + int_arr[1:])

    def low_mean(lay, int_arr):
        return 0.5 * (int_arr[:-1] + lay)

    opac_up = up_mean(opac_lay, opac_int)
    opac_low = low_mean(opac_lay, opac_int)
    mmm_up = up_mean(meanmolmass_lay, meanmolmass_int)
    mmm_low = low_mean(meanmolmass_lay, meanmolmass_int)

    if scat:
        ray_up = up_mean(scat_cross_lay, scat_cross_int)
        ray_low = low_mean(scat_cross_lay, scat_cross_int)
        cld_scat_up = up_mean(cloud_scat_cross_lay, cloud_scat_cross_int)
        cld_scat_low = low_mean(cloud_scat_cross_lay, cloud_scat_cross_int)
    else:
        ray_up = ray_low = jnp.zeros((L, B), dtype)
        cld_scat_up = cld_scat_low = jnp.zeros((L, B), dtype)

    cld_abs_up = up_mean(cloud_abs_cross_lay, cloud_abs_cross_int)
    cld_abs_low = low_mean(cloud_abs_cross_lay, cloud_abs_cross_int)

    if clouds:
        g0_up = up_mean(g_0_tot_lay, g_0_tot_int)
        g0_low = low_mean(g_0_tot_lay, g_0_tot_int)
    else:
        g0_up = g0_low = jnp.full((L, B), g_0, dtype)

    kw = dict(epsi=epsi, epsi2=epsi2, mu_star=mu_star, w_0_limit=w_0_limit,
              scat_corr=scat_corr, i2s_transition=i2s_transition)
    upper = _cell_quantities(opac_up, mmm_up, ray_up, cld_abs_up, cld_scat_up,
                             delta_col_upper, g0_up, **kw)
    lower = _cell_quantities(opac_low, mmm_low, ray_low, cld_abs_low,
                             cld_scat_low, delta_col_lower, g0_low, **kw)
    scat_trigger = (jnp.any(upper.w0 > w_0_scat_limit, axis=0)
                    | jnp.any(lower.w0 > w_0_scat_limit, axis=0))
    return upper, lower, scat_trigger
