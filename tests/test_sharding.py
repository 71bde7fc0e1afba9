"""Multi-chip sharding tests on the virtual 8-device CPU mesh: sharded
results must match the single-device results exactly (same reduction
order), the SURVEY.md section 4d stratum."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from helios_tpu.config import HeliosConfig
from helios_tpu.forward import build_model, forward_fluxes
from helios_tpu.io.opacity import synthetic_premixed_table
from helios_tpu.parallel import sharding as shd
from helios_tpu.rce.radiative import init_rad_state, radiation_loop


pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices")


def _setup(nbin=16, ny=4, nlayer=10):
    table = synthetic_premixed_table(nbin=nbin, ny=ny, ntemp=10, npress=8,
                                     seed=2)
    cfg = HeliosConfig(planet="manual", g=2288.0, a=0.0153, R_planet=1.0,
                       R_star=1.0, T_star=4000.0, T_intern=100.0,
                       scattering="yes", direct_beam="no", convection="no",
                       run_type="iterative", iso_input="yes", nlayer=nlayer,
                       p_boa=1e8, p_toa=1e3).finalize()
    phys, arrays = build_model(cfg, table)
    return phys, arrays


def test_sharded_forward_matches_single_device():
    phys, arrays = _setup()
    T_lay = jnp.linspace(1500.0, 800.0, phys.nlayer + 1)

    _, want, _ = forward_fluxes(phys, arrays, T_lay)

    mesh = shd.make_mesh(n_planet=2, n_spectral=4)
    m_sharded = shd.place_model(arrays, mesh)
    fwd = shd.sharded_forward(phys, mesh)
    got = fwd(m_sharded, T_lay)

    np.testing.assert_allclose(np.asarray(got.F_net),
                               np.asarray(want.F_net), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(got.F_up_band),
                               np.asarray(want.F_up_band), rtol=1e-12)


def test_batched_rce_step_matches_per_planet_loop():
    phys, arrays = _setup()
    n_planet = 2
    mesh = shd.make_mesh(n_planet=n_planet, n_spectral=4)
    m_sharded = shd.place_model(arrays, mesh)

    T0s = jnp.stack([jnp.full(phys.nlayer + 1, 900.0),
                     jnp.full(phys.nlayer + 1, 1400.0)])

    init, step = shd.batched_rce_step(phys, mesh, None)
    state = init(m_sharded, T0s)
    for _ in range(3):
        state = step(m_sharded, state)

    # reference: unsharded loop, 3 iterations per planet
    for p in range(n_planet):
        want = radiation_loop(phys, arrays, None, T0s[p], max_steps=3)
        np.testing.assert_allclose(np.asarray(state.T_lay[p]),
                                   np.asarray(want.T_lay), rtol=1e-11)
        # band->total reduction order differs across shards: not bitwise,
        # but deterministic for a fixed topology
        np.testing.assert_allclose(np.asarray(state.totals.F_net[p]),
                                   np.asarray(want.totals.F_net), rtol=1e-8)
        assert int(state.it[p]) == int(want.it) == 3


def test_sharded_radiation_loop_matches_single_device():
    """Full while_loop under shard_map == unsharded loop, per planet."""
    from helios_tpu.rce.radiative import radiation_loop

    phys, arrays = _setup()
    n_planet = 2
    mesh = shd.make_mesh(n_planet=n_planet, n_spectral=4)
    m_sharded = shd.place_model(arrays, mesh)

    T0s = jnp.stack([jnp.full(phys.nlayer + 1, 900.0 + 150.0 * p)
                     for p in range(n_planet)])
    run = shd.sharded_radiation_loop(phys, mesh, None, max_steps=120)
    state = run(m_sharded, T0s)

    for p in range(n_planet):
        want = jax.jit(lambda t: radiation_loop(
            phys, arrays, None, t, max_steps=120))(T0s[p])
        assert int(state.it[p]) == int(want.it)
        np.testing.assert_allclose(
            np.asarray(state.T_lay[p]), np.asarray(want.T_lay),
            rtol=1e-12, atol=0)
        np.testing.assert_allclose(
            np.asarray(state.totals.F_net[p]), np.asarray(want.totals.F_net),
            rtol=1e-9)
