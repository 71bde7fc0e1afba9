"""Planet-ensemble data parallelism: one command, N atmospheres.

The reference is strictly single-GPU/single-planet -- multi-planet studies
run as N separate processes (SURVEY.md section 2.4).  On TPU the planet
ensemble is the natural DCN-friendly data-parallel axis: N independent
columns share one compiled RCE program, batched with `vmap` and sharded
over the mesh's "planet" axis with zero cross-planet communication.

Ensemble members must share the compile-time physics (`Phys`): same grid
shapes and scalar parameters.  Everything that lives in `ModelArrays` may
vary per planet -- stellar spectrum, surface albedo, cloud decks,
additional heating, opacity table -- as may the initial TP profile.
That covers the production ensemble cases: population studies over
stellar types/albedos, coupling-chemistry grids, retrieval priors.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from helios_tpu.forward import ModelArrays, Phys
from helios_tpu.rce.radiative import RadLoopState


def stack_models(models: Sequence[ModelArrays]) -> ModelArrays:
    """Stack N ModelArrays along a new leading planet axis."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *models)


def _check_same_phys(physes: Sequence[Phys]) -> Phys:
    p0 = physes[0]
    for i, p in enumerate(physes[1:], 1):
        if p != p0:
            diff = [f for f in p0.__dataclass_fields__
                    if getattr(p, f) != getattr(p0, f)]
            raise ValueError(
                "ensemble members must share the compile-time physics; "
                f"config {i} differs from config 0 in {diff}. Per-planet "
                "variation goes through ModelArrays (star, albedo, "
                "clouds, heating, opacity) and the initial TP profile.")
    return p0


def run_ensemble_loops(phys: Phys, models: Sequence[ModelArrays],
                       thermo, T0s, mesh=None, max_steps=None,
                       conv_max_steps=None):
    """Run the radiation (and, when enabled, convection) loops for N
    planets as one batched device program.

    Args:
      models: one ModelArrays per planet (same shapes).
      T0s: [N, L+1] initial profiles.
      mesh: optional ("planet", "spectral") Mesh; the batch is then
        sharded over the planet axis (and spectral arrays over the
        spectral axis) via shard_map -- pure data parallelism, no
        cross-planet collectives.

    Returns (rad_states, conv_states_or_None), both with a leading
    planet axis.
    """
    from helios_tpu.rce.loop import convection_loop
    from helios_tpu.rce.radiative import radiation_loop

    m_stacked = stack_models(models)
    T0s = jnp.asarray(T0s)
    n = T0s.shape[0]
    want_conv = (phys.convection and not phys.singlewalk and not phys.iso)

    if mesh is None:
        rad_fn = jax.jit(jax.vmap(
            lambda m, t: radiation_loop(phys, m, thermo, t,
                                        max_steps=max_steps)))
        rad = rad_fn(m_stacked, T0s)
        conv = None
        if want_conv:
            conv_fn = jax.jit(jax.vmap(
                lambda m, r: convection_loop(phys, m, thermo, r,
                                             max_steps=conv_max_steps)))
            conv = conv_fn(m_stacked, rad)
        return rad, conv

    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from helios_tpu.parallel import sharding as shd

    assert n % mesh.shape["planet"] == 0, (
        f"{n} planets not divisible by planet axis "
        f"{mesh.shape['planet']}")
    phys_l = shd._phys_local(phys, mesh)

    # every stacked leaf: planet axis first, then its spectral spec
    m_specs = ModelArrays(**{
        k: P("planet", *v) for k, v in shd._MODEL_SPECS.items()})
    t_spec = P("planet", None)
    rad_specs = shd._rad_state_specs(phys, planet=True)

    m_placed = jax.device_put(
        m_stacked, jax.tree.map(
            lambda s: jax.sharding.NamedSharding(mesh, s), m_specs))

    def rad_body(m, t):
        return jax.vmap(lambda mi, ti: radiation_loop(
            phys_l, mi, thermo, ti, max_steps=max_steps,
            axis_name=shd.AXIS))(m, t)

    rad = jax.jit(shard_map(rad_body, mesh=mesh,
                            in_specs=(m_specs, t_spec),
                            out_specs=rad_specs,
                            check_vma=False))(m_placed, T0s)
    conv = None
    if want_conv:
        conv_specs = shd._conv_state_specs(phys, planet=True)

        def conv_body(m, r):
            return jax.vmap(lambda mi, ri: convection_loop(
                phys_l, mi, thermo, ri, max_steps=conv_max_steps,
                axis_name=shd.AXIS))(m, r)

        conv = jax.jit(shard_map(conv_body, mesh=mesh,
                                 in_specs=(m_specs, rad_specs),
                                 out_specs=conv_specs,
                                 check_vma=False))(m_placed, rad)
    return rad, conv


def run_ensemble(cfgs: Sequence, tables: Optional[Sequence] = None,
                 write_output: bool = True):
    """pipeline.run for N planets in ONE batched device program.

    Each config gets its own output directory / writers; the RCE loops
    run vmapped (and mesh-sharded when cfg.n_planet_batch > 1 and enough
    devices are visible).  Returns a list of RunOutput.
    """
    import time

    from helios_tpu import pipeline as pl
    from helios_tpu.forward import build_model
    from helios_tpu.io.opacity import load_opacity_file
    from helios_tpu.ops import interp as interp_ops
    from helios_tpu.rce import convect
    from helios_tpu.rce.radiative import (kappa_cp_lay, kappa_int,
                                          make_const_thermo)

    t0 = time.time()
    cfgs = [c if c._finalized else c.finalize() for c in cfgs]
    if tables is None:
        tables = [load_opacity_file(c.opacity_path) for c in cfgs]

    physes, models, T0s = [], [], []
    for cfg, table in zip(cfgs, tables):
        starflux = pl.load_starflux(cfg, table.nbin)
        from helios_tpu import host_physics as hp
        surf_albedo = hp.load_surf_albedo(cfg, table.wave_centers)
        phys, arrays = build_model(cfg, table, starflux=starflux,
                                   surf_albedo=surf_albedo)
        physes.append(phys)
        models.append(arrays)
        T0s.append(pl.initial_temperatures(cfg, phys, arrays))
    phys = _check_same_phys(physes)

    thermo = (make_const_thermo(float(cfgs[0].kappa_value))
              if phys.convection else None)

    mesh = None
    n_pl = int(cfgs[0].n_planet_batch)
    if n_pl > 1:
        from helios_tpu.parallel import sharding as shd
        n_spec = max(int(cfgs[0].n_spectral_shards), 1)
        need = n_pl * n_spec
        devs = jax.devices()
        if len(devs) >= need:
            mesh = shd.make_mesh(n_planet=n_pl, n_spectral=n_spec,
                                 devices=devs[:need])

    rads, convs = run_ensemble_loops(phys, models, thermo,
                                     np.stack(T0s), mesh=mesh)

    outs = []
    for i, (cfg, arrays) in enumerate(zip(cfgs, models)):
        rad_i = jax.tree.map(lambda x: x[i], rads)
        conv_i = (jax.tree.map(lambda x: x[i], convs)
                  if convs is not None else None)
        if conv_i is not None:
            final_T, flux, F_smooth_sum = (conv_i.T_lay, conv_i.flux,
                                           conv_i.F_smooth_sum)
            conv_layer, final_limit = conv_i.conv_layer, conv_i.local_limit
        else:
            final_T, flux, F_smooth_sum = (rad_i.T_lay, rad_i.flux,
                                           rad_i.F_smooth_sum)
            conv_layer, final_limit = None, rad_i.local_limit

        if thermo is not None:
            kappa_lay, c_p_lay = kappa_cp_lay(thermo, final_T,
                                              arrays.p_lay)
            T_int = interp_ops.interface_temperatures(final_T)
            kap_int = kappa_int(thermo, T_int, arrays.p_int)
            conv_unstable = convect.conv_check(
                final_T, arrays.p_lay, arrays.p_int, kappa_lay, kap_int)
        else:
            kappa_lay = c_p_lay = conv_unstable = None

        post = pl.post_process(phys, arrays, final_T, flux, F_smooth_sum)
        result = pl.collect_result(
            cfg, phys, arrays, final_T, flux, post,
            conv_unstable=conv_unstable, conv_layer=conv_layer,
            F_smooth_sum=F_smooth_sum, kappa_lay=kappa_lay,
            c_p_lay=c_p_lay, final_limit=final_limit)
        if write_output:
            from helios_tpu.io import writers
            writers.write_all(result)
        outs.append(pl.RunOutput(phys=phys, arrays=arrays, rad=rad_i,
                                 conv=conv_i, result=result,
                                 wall_seconds=time.time() - t0))
    return outs
