"""Multi-chip sharding: planet-ensemble data parallelism x spectral sharding.

The reference is strictly single-GPU (SURVEY.md section 2.4); this module is
the from-scratch TPU scaling design:

* **spectral axis (ICI)**: the wavelength-bin axis of every [.., bin, y]
  array is sharded across chips.  All per-cell physics (opacity interp,
  transmission, the layer-sequential sweeps) is embarrassingly parallel
  across bins, so the only communication is the band->total flux reduction
  in `integrate_flux` (a `psum` XLA inserts from the sharding annotations)
  and the scalar convergence predicates.
* **planet axis (DCN-friendly)**: independent atmospheres batched with
  `vmap`; no communication at all.

Everything uses `jax.sharding.NamedSharding` + `jit` (GSPMD auto
partitioning): we annotate inputs, XLA inserts the collectives -- the
scaling-book recipe.  The layer recursion (a `lax.scan` with [bin, y]
carries) partitions trivially because bins are independent.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from helios_tpu.forward import (FluxState, ModelArrays, Phys, forward_fluxes,
                                init_flux_state)
from helios_tpu.rce.radiative import ThermoProps


def make_mesh(n_planet: int = 1, n_spectral: Optional[int] = None,
              devices=None) -> Mesh:
    """Device mesh with ("planet", "spectral") axes.

    The spectral axis should map to ICI neighbors (inner axis), the planet
    axis across hosts/DCN (outer axis) -- `create_device_mesh` orders them
    that way.
    """
    devices = devices if devices is not None else jax.devices()
    if n_spectral is None:
        n_spectral = len(devices) // n_planet
    assert n_planet * n_spectral == len(devices), (
        f"{n_planet} x {n_spectral} != {len(devices)} devices")
    dev_array = mesh_utils.create_device_mesh((n_planet, n_spectral),
                                              devices=devices)
    return Mesh(dev_array, ("planet", "spectral"))


# PartitionSpecs for ModelArrays fields: shard every wavelength-bin axis
# over "spectral", replicate the rest.
_MODEL_SPECS = dict(
    p_lay=P(), p_int=P(), delta_colmass=P(), delta_col_upper=P(),
    delta_col_lower=P(),
    # ktable is [ntemp, npress, S] with S = nbin*ny bin-major, so sharding
    # S over "spectral" is contiguous-wavelength-band sharding
    ktable=P(None, None, "spectral"),
    scat_cross_table=P(None, None, "spectral"),
    meanmolmass_table=P(), ktemps=P(), kpress=P(),
    lambda_centers=P("spectral"), lambda_edges=P(),
    delta_lambda=P("spectral"),
    gauss_y=P(), gauss_weight=P(),
    planck_grid=P(None, "spectral"),
    starflux=P("spectral"), surf_albedo=P("spectral"),
    cloud_abs_cross_lay=P(None, "spectral"),
    cloud_scat_cross_lay=P(None, "spectral"),
    g_0_cloud_lay=P(None, "spectral"),
    cloud_abs_cross_int=P(None, "spectral"),
    cloud_scat_cross_int=P(None, "spectral"),
    g_0_cloud_int=P(None, "spectral"),
    add_heat_dens=P(),
)


def model_shardings(mesh: Mesh) -> ModelArrays:
    """NamedShardings (as a ModelArrays-shaped pytree) for the inputs."""
    return ModelArrays(**{k: NamedSharding(mesh, v)
                          for k, v in _MODEL_SPECS.items()})


def flux_shardings(mesh: Mesh, batched: bool = False) -> FluxState:
    lead = ("planet",) if batched else ()
    s = NamedSharding(mesh, P(*lead, None, "spectral", None))
    return FluxState(F_down=s, F_up=s, Fc_down=s, Fc_up=s)


def place_model(m: ModelArrays, mesh: Mesh) -> ModelArrays:
    """device_put every model array with its spectral sharding."""
    sh = model_shardings(mesh)
    return ModelArrays(*(jax.device_put(a, s) for a, s in zip(m, sh)))


def sharded_forward(phys: Phys, mesh: Mesh):
    """jit-compiled sharded forward step: T_lay [L+1] -> FluxTotals.

    Totals come out replicated (XLA all-reduces the band integrals over the
    spectral axis).
    """
    t_sh = NamedSharding(mesh, P())

    @partial(jax.jit,
             in_shardings=(model_shardings(mesh), t_sh),
             out_shardings=None)
    def fwd(m, T_lay):
        _flux, totals, _cache = forward_fluxes(phys, m, T_lay)
        return totals

    return fwd


def batched_rce_step(phys: Phys, mesh: Mesh, thermo: Optional[ThermoProps]):
    """The full per-iteration RCE "training step", batched over a planet
    ensemble and sharded over the spectral axis.

    Step = flux solve + integration + radiative temperature update
    (the body of the radiation loop).  Input/output state is a
    RadLoopState pytree with a leading planet-batch axis.
    """
    from helios_tpu.rce.radiative import (RadLoopState,
                                          _one_radiation_iteration,
                                          init_rad_state)

    def one_planet(m, state):
        return _one_radiation_iteration(phys, m, thermo, state)

    m_sh = model_shardings(mesh)
    planet_sh = NamedSharding(mesh, P("planet"))

    @partial(jax.jit, out_shardings=planet_sh)
    def step(m, state_batch):
        return jax.vmap(lambda s: one_planet(m, s))(state_batch)

    @partial(jax.jit, in_shardings=(m_sh, planet_sh),
             out_shardings=planet_sh)
    def init(m, T0_batch):
        return jax.vmap(lambda t: init_rad_state(phys, m, t))(T0_batch)

    return init, step
