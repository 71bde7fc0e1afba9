"""The end-to-end run pipeline: config -> loops -> outputs.

Equivalent of the reference's run_helios (helios.py:35-137): read config,
build the model, run the radiative and convective loops (each a single
jitted device program), then one device->host transfer and the output
writers.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from helios_tpu import constants as pc
from helios_tpu import grid as grid_mod
from helios_tpu import planck as planck_mod
from helios_tpu.config import HeliosConfig
from helios_tpu.forward import (ModelArrays, Phys, build_model,
                                compute_cells, forward_fluxes)
from helios_tpu.io import writers
from helios_tpu.io.opacity import OpacityTable, load_opacity_file
from helios_tpu.ops import integrate as int_ops
from helios_tpu.ops import interp as interp_ops
from helios_tpu.rce import convect
from helios_tpu.rce.loop import ConvLoopState, convection_loop
from helios_tpu.rce.radiative import (RadLoopState, ThermoProps,
                                      kappa_cp_lay, make_const_thermo,
                                      radiation_loop)


def initial_temperatures(cfg: HeliosConfig, phys: Phys,
                         m: ModelArrays) -> np.ndarray:
    """Initial TP profile: isothermal at T_eff (host_functions.py:164-184)
    or restart from a previous tp file (read.py:1274-1322)."""
    if cfg.singlewalk or cfg.force_start_tp_from_file:
        return load_tp_file(cfg.temp_path, cfg.temp_format, phys.nlayer,
                            np.asarray(m.p_lay), np.asarray(m.p_int))
    return grid_mod.initial_temperature(
        phys.nlayer, f_factor=phys.f_factor, dir_beam=phys.dir_beam,
        mu_star=phys.mu_star, R_star=phys.R_star, a=phys.a,
        T_star=phys.T_star)


def load_tp_file(path: str, fmt: str, nlayer: int, p_lay: np.ndarray,
                 p_int: np.ndarray) -> np.ndarray:
    """Read a TP restart file (read.py:1274-1322).

    "helios" format: the reference's *_tp.dat layout (BOA row then layers,
    temperature in column 1).  "TP"/"PT": two-column ASCII with pressure in
    [10^-6 bar], interpolated in log-P onto the model grid (clamped at the
    file's pressure range).

    Returns [nlayer+1] with the surface/BOA ghost at index nlayer.
    """
    if fmt == "helios":
        T = []
        with open(path) as f:
            lines = [ln.split() for ln in f if ln.strip()]
        # row 2 = BOA (surface), rows 3.. = layers (write.py:128-145)
        T_surf = float(lines[2][1])
        for ln in lines[3:]:
            T.append(float(ln[1]))
        T = np.asarray(T)
        if len(T) != nlayer:
            raise ValueError(
                f"restart file has {len(T)} layers, expected {nlayer}")
        return np.concatenate([T, [T_surf]])

    cols = np.loadtxt(path)
    if fmt == "PT":
        press, temp = cols[:, 0], cols[:, 1]
    elif fmt == "TP":
        temp, press = cols[:, 0], cols[:, 1]
    else:
        raise ValueError(f"unknown TP format {fmt!r}")
    order = np.argsort(press)
    logp, temp = np.log10(press[order]), temp[order]
    T_lay = np.interp(np.log10(p_lay), logp, temp)
    T_surf = np.interp(np.log10(p_int[0]), logp, temp)
    return np.concatenate([T_lay, [T_surf]])


@dataclass
class RunOutput:
    phys: Phys
    arrays: ModelArrays
    rad: RadLoopState
    conv: Optional[ConvLoopState]
    result: writers.RunResult
    wall_seconds: float


def post_process(phys: Phys, m: ModelArrays, T_lay, flux_state,
                 F_smooth_sum, conv_layer=None, thermo=None):
    """Final-state diagnostics (computation.py:1176-1296): band-integrated
    optical depth/transmission, contribution function, mean opacities,
    beam flux.  One jitted call."""
    T_int = interp_ops.interface_temperatures(T_lay)
    cache = compute_cells(phys, m, T_lay, T_int)
    totals = int_ops.integrate_flux(flux_state.F_down, flux_state.F_up,
                                    cache.F_dir, m.gauss_weight,
                                    m.delta_lambda)
    if phys.iso:
        cells = cache.cells_or_upper
        trans_full = cells.trans
        dtau_band, trans_band = int_ops.integrate_optdepth_transmission_iso(
            cells.delta_tau_total, cells.trans, m.gauss_weight)
    else:
        up, low = cache.cells_or_upper, cache.lower
        trans_full = up.trans * low.trans
        dtau_band, trans_band = (
            int_ops.integrate_optdepth_transmission_noniso(
                up.delta_tau_total, low.delta_tau_total, up.trans, low.trans,
                m.gauss_weight))

    planckband_lay = planck_mod.planckband_layers(
        m.planck_grid, T_lay, m.starflux, real_star=phys.real_star,
        dim=phys.plancktable_dim, step=phys.plancktable_step)
    trans_weight_band, contr_band = int_ops.contribution_function(
        trans_full, planckband_lay, m.gauss_weight, phys.epsi)

    means = int_ops.mean_opacities(
        cache.opac_lay, m.cloud_abs_cross_lay, cache.meanmolmass_lay,
        planckband_lay, m.lambda_edges, m.delta_lambda, T_lay,
        m.gauss_weight, m.gauss_y, phys.T_star)

    return dict(cache=cache, totals=totals, dtau_band=dtau_band,
                trans_band=trans_band, trans_weight_band=trans_weight_band,
                contr_band=contr_band, means=means,
                planckband_lay=planckband_lay)


def collect_result(cfg: HeliosConfig, phys: Phys, m: ModelArrays,
                   final_T, flux_state, post, *, conv_unstable=None,
                   conv_layer=None, F_smooth_sum=None, F_net_diff=None,
                   kappa_lay=None, c_p_lay=None, relaxed=0,
                   final_limit=None, singlewalk=None,
                   star_corr_factor=1.0,
                   cloud_result=None) -> writers.RunResult:
    """Assemble the host-side RunResult snapshot (one device->host pull)."""
    L = phys.nlayer
    cache = post["cache"]
    totals = post["totals"]

    delta_z, z_lay = None, None
    from helios_tpu.forward import altitude_z
    delta_z, z_lay = altitude_z(phys, m, final_T, cache.meanmolmass_lay)

    F_smooth_sum = (np.zeros(L) if F_smooth_sum is None
                    else np.asarray(F_smooth_sum))
    conv_layer_np = (np.zeros(L + 1, int) if conv_layer is None
                     else np.asarray(conv_layer).astype(int))
    F_net = np.asarray(totals.F_net)

    r = writers.RunResult(
        name=cfg.name, output_dir=cfg.output_dir, nlayer=L, nbin=phys.nbin,
        iso=phys.iso, convection=phys.convection,
        singlewalk=phys.singlewalk if singlewalk is None else singlewalk,
        T_star=phys.T_star, R_planet=phys.R_planet, R_star=phys.R_star,
        F_intern=phys.F_intern, star_corr_factor=star_corr_factor,
        input_kappa_value=cfg.kappa_value,
        input_surf_albedo=cfg.surf_albedo,
        albedo_file_surface_name=cfg.albedo_surface_name,
        p_lay=np.asarray(m.p_lay), p_int=np.asarray(m.p_int),
        delta_colmass=np.asarray(m.delta_colmass),
        T_lay=np.asarray(final_T),
        z_lay=np.asarray(z_lay), delta_z_lay=np.asarray(delta_z),
        meanmolmass_lay=np.asarray(cache.meanmolmass_lay),
        c_p_lay=(np.asarray(c_p_lay) if c_p_lay is not None
                 else np.zeros(L)),
        kappa_lay=(np.asarray(kappa_lay) if kappa_lay is not None
                   else np.zeros(L)),
        entropy_lay=np.zeros(L),
        conv_unstable=(np.asarray(conv_unstable).astype(int)
                       if conv_unstable is not None
                       else np.zeros(L + 1, int)),
        conv_layer=conv_layer_np,
        opac_wave=np.asarray(m.lambda_centers),
        opac_interwave=np.asarray(m.lambda_edges),
        opac_deltawave=np.asarray(m.delta_lambda),
        F_down_tot=np.asarray(totals.F_down_tot),
        F_up_tot=np.asarray(totals.F_up_tot),
        F_net=F_net,
        F_dir_tot=np.asarray(int_ops.integrate_beamflux(
            totals.F_dir_band, m.delta_lambda)),
        F_net_diff=(np.asarray(F_net_diff) if F_net_diff is not None
                    else F_net[:L] - F_net[1:]),
        F_add_heat_lay=np.asarray(m.F_add_heat_lay),
        F_add_heat_sum=np.asarray(m.F_add_heat_sum),
        F_smooth_sum=F_smooth_sum,
        F_down_band=np.asarray(totals.F_down_band),
        F_up_band=np.asarray(totals.F_up_band),
        F_dir_band=np.asarray(totals.F_dir_band),
        planckband_lay=np.asarray(post["planckband_lay"]),
        planckband_int=(np.asarray(planck_mod.planckband_interfaces(
            m.planck_grid, interp_ops.interface_temperatures(final_T),
            dim=phys.plancktable_dim, step=phys.plancktable_step))
            if phys.iso == 0 else None),
        opac_band_lay=np.asarray(post["means"]["opac_band_lay"]),
        scat_cross_lay=np.asarray(cache.scat_cross_lay),
        g_0_tot_lay=np.asarray(
            cache.cells_or_upper.g0 if phys.clouds
            else np.full((L, phys.nbin), phys.g_0)),
        trans_band=np.asarray(post["trans_band"]),
        delta_tau_band=np.asarray(post["dtau_band"]),
        contr_func_band=np.asarray(post["contr_band"]),
        trans_weight_band=np.asarray(post["trans_weight_band"]),
        planck_opac_T_pl=np.asarray(post["means"]["planck_opac_T_pl"]),
        ross_opac_T_pl=np.asarray(post["means"]["ross_opac_T_pl"]),
        planck_opac_T_star=np.asarray(post["means"]["planck_opac_T_star"]),
        ross_opac_T_star=np.asarray(post["means"]["ross_opac_T_star"]),
        surf_albedo=np.asarray(m.surf_albedo),
        relaxed_criterion_trigger=relaxed,
        rad_convergence_limit=(float(final_limit) if final_limit is not None
                               else phys.rad_convergence_limit),
    )
    if cloud_result is not None:
        r.f_all_clouds_lay = cloud_result.f_lay
        r.abs_cross_all_clouds_lay = cloud_result.abs_cross_lay
        r.scat_cross_all_clouds_lay = cloud_result.scat_cross_lay
        dcm = np.asarray(m.delta_colmass)[:, None]
        mmm = np.asarray(cache.meanmolmass_lay)[:, None]
        r.delta_tau_all_clouds = (dcm * (cloud_result.abs_cross_lay
                                         + cloud_result.scat_cross_lay)
                                  / mmm)
    r.F_net_conv = writers.calculate_conv_flux(r)
    return r


def run(cfg: HeliosConfig, table: Optional[OpacityTable] = None,
        write_output: bool = True) -> RunOutput:
    """Full pipeline run (the run_helios equivalent)."""
    t0 = time.time()
    if not cfg._finalized:
        cfg = cfg.finalize()
    if table is None:
        table = load_opacity_file(cfg.opacity_path)

    cloud_result = None
    if cfg.clouds:
        from helios_tpu import clouds as clouds_mod
        from helios_tpu import grid as _grid
        g = _grid.build_grid(cfg.p_boa, cfg.p_toa, cfg.nlayer, cfg.g)
        cloud_result = clouds_mod.cloud_pre_processing(
            cfg, table.wave_centers, table.wave_edges, g.p_lay, g.p_int,
            cfg.iso)

    phys, arrays = build_model(cfg, table, cloud_result=cloud_result)
    if cfg.convection and not isinstance(cfg.kappa_value, str):
        thermo = make_const_thermo(float(cfg.kappa_value))
    else:
        thermo = make_const_thermo(2.0 / 7.0) if cfg.convection else None

    T0 = jnp.asarray(initial_temperatures(cfg, phys, arrays))

    rad = jax.jit(lambda t: radiation_loop(phys, arrays, thermo, t))(T0)

    conv = None
    if phys.convection and not phys.singlewalk and not phys.iso:
        conv = jax.jit(
            lambda r: convection_loop(phys, arrays, thermo, r))(rad)
        final_T = conv.T_lay
        flux_state = conv.flux
        F_smooth_sum = conv.F_smooth_sum
        conv_layer = conv.conv_layer
        final_limit = conv.local_limit
    else:
        final_T = rad.T_lay
        flux_state = rad.flux
        F_smooth_sum = rad.F_smooth_sum
        conv_layer = None
        final_limit = rad.local_limit

    if thermo is not None:
        kappa_lay, c_p_lay = kappa_cp_lay(thermo, final_T, arrays.p_lay)
        T_int = interp_ops.interface_temperatures(final_T)
        from helios_tpu.rce.radiative import kappa_int as kint_fn
        kap_int = kint_fn(thermo, T_int, arrays.p_int)
        conv_unstable = convect.conv_check(final_T, arrays.p_lay,
                                           arrays.p_int, kappa_lay, kap_int)
    else:
        kappa_lay = c_p_lay = conv_unstable = None

    post = post_process(phys, arrays, final_T, flux_state, F_smooth_sum)

    relaxed = int(float(final_limit) > phys.rad_convergence_limit * 1.5)
    result = collect_result(
        cfg, phys, arrays, final_T, flux_state, post,
        conv_unstable=conv_unstable, conv_layer=conv_layer,
        F_smooth_sum=F_smooth_sum, kappa_lay=kappa_lay, c_p_lay=c_p_lay,
        relaxed=relaxed, final_limit=final_limit,
        cloud_result=cloud_result)

    if write_output:
        writers.write_all(result)
        if (rad.aborted if conv is None else conv.aborted):
            writers.write_abort_file(result)

    return RunOutput(phys=phys, arrays=arrays, rad=rad, conv=conv,
                     result=result, wall_seconds=time.time() - t0)
