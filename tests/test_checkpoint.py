"""Checkpoint / resume of the radiation loop.

The key property: a run chunked through on-disk checkpoints (including a
simulated preemption + restore in a fresh call) lands on exactly the
same state as one uninterrupted while_loop run.
"""

import numpy as np

import jax
import jax.numpy as jnp

from helios_tpu import checkpoint as ck
from helios_tpu.config import HeliosConfig
from helios_tpu.forward import build_model
from helios_tpu.io.opacity import synthetic_premixed_table
from helios_tpu.rce import radiative as rad_mod


def _small_model():
    table = synthetic_premixed_table(nbin=16, ny=4, ntemp=12, npress=10,
                                     seed=3)
    cfg = HeliosConfig(planet="manual", g=2288.0, a=0.0153, R_planet=1.0,
                       R_star=1.0, T_star=4000.0, T_intern=200.0,
                       scattering="no", direct_beam="no", convection="no",
                       run_type="iterative", iso_input="yes", nlayer=12,
                       p_boa=1e8, p_toa=1e3,
                       rad_convergence_limit=1e-6).finalize()
    phys, arrays = build_model(cfg, table)
    return phys, arrays


def test_save_load_roundtrip(tmp_path):
    phys, arrays = _small_model()
    T0 = jnp.full(phys.nlayer + 1, 1000.0)
    state = jax.jit(lambda t: rad_mod.radiation_loop(
        phys, arrays, None, t, max_steps=25))(T0)

    path = str(tmp_path / "a.ckpt.npz")
    ck.save_rad_checkpoint(path, state)
    ckpt = ck.load_rad_checkpoint(path)
    restored = ck.restore_rad_state(phys, arrays, ckpt)

    assert int(restored.it) == int(state.it) == 25
    np.testing.assert_array_equal(np.asarray(restored.T_lay),
                                  np.asarray(state.T_lay))
    np.testing.assert_array_equal(np.asarray(restored.prefactor),
                                  np.asarray(state.prefactor))
    np.testing.assert_array_equal(np.asarray(restored.flux.F_up),
                                  np.asarray(state.flux.F_up))


def test_load_missing_returns_none(tmp_path):
    assert ck.load_rad_checkpoint(str(tmp_path / "nope.npz")) is None


def test_chunked_resume_matches_straight_run(tmp_path):
    phys, arrays = _small_model()
    T0 = jnp.full(phys.nlayer + 1, 1000.0)

    straight = jax.jit(lambda t: rad_mod.radiation_loop(
        phys, arrays, None, t, max_steps=60))(T0)

    # run 40 steps checkpointed in chunks of 20, "preempt", then resume
    # from disk for 20 more via a fresh checkpointed call
    path = str(tmp_path / "resume.ckpt.npz")
    step = jax.jit(lambda s: rad_mod.radiation_loop(
        phys, arrays, None, s.T_lay, max_steps=20, state0=s))
    state = rad_mod.init_rad_state(phys, arrays, T0)
    for _ in range(2):
        state = step(state)
        ck.save_rad_checkpoint(path, state)
    del state   # preemption

    ckpt = ck.load_rad_checkpoint(path)
    resumed = ck.restore_rad_state(phys, arrays, ckpt)
    assert int(resumed.it) == 40
    final = step(resumed)

    assert int(final.it) == int(straight.it) == 60
    # exact continuation: cache recompute on restore happens at it=40,
    # a multiple of the 10-step refresh cadence, so trajectories are
    # bitwise identical
    np.testing.assert_array_equal(np.asarray(final.T_lay),
                                  np.asarray(straight.T_lay))
    np.testing.assert_array_equal(np.asarray(final.prefactor),
                                  np.asarray(straight.prefactor))


def test_run_radiation_checkpointed_to_convergence(tmp_path):
    phys, arrays = _small_model()
    T0 = jnp.full(phys.nlayer + 1, 1000.0)
    path = str(tmp_path / "conv.ckpt.npz")
    state = ck.run_radiation_checkpointed(
        phys, arrays, None, T0, path=path, every=200)
    assert bool(jnp.all(state.abort))
    assert not bool(state.keep_running)
    # checkpoint exists and reflects the final state
    ckpt = ck.load_rad_checkpoint(path)
    assert int(ckpt["it"]) == int(state.it)


def _conv_model():
    table = synthetic_premixed_table(nbin=12, ny=3, ntemp=12, npress=10,
                                     seed=5)
    table.kpoints *= 10.0
    cfg = HeliosConfig(planet="manual", g=2288.0, a=0.0153, R_planet=1.0,
                       R_star=1.0, T_star=30.0, T_intern=700.0,
                       scattering="no", direct_beam="no", convection="yes",
                       kappa_value=0.1, run_type="iterative", nlayer=14,
                       p_boa=1e9, p_toa=1e3, rad_convergence_limit=1e-5,
                       adapt_interval=6).finalize()
    phys, arrays = build_model(cfg, table)
    from helios_tpu.rce.radiative import make_const_thermo
    return phys, arrays, make_const_thermo(cfg.kappa_value)


def test_conv_checkpoint_resume_matches_straight(tmp_path):
    """Convection phase: save at it=300, restore in a fresh state, run to
    600 -- bitwise equal to an uninterrupted 600-step run (300 and the
    chunk size are multiples of the 10-step cache refresh)."""
    from helios_tpu.rce.loop import convection_loop
    from helios_tpu.rce.radiative import radiation_loop

    phys, arrays, thermo = _conv_model()
    T0 = jnp.full(phys.nlayer + 1, 900.0)
    rad = jax.jit(lambda t: radiation_loop(phys, arrays, thermo, t))(T0)

    straight = jax.jit(lambda r: convection_loop(
        phys, arrays, thermo, r, max_steps=600))(rad)

    half = jax.jit(lambda r: convection_loop(
        phys, arrays, thermo, r, max_steps=300))(rad)
    path = str(tmp_path / "c.ckpt.npz")
    ck.save_conv_checkpoint(path, half)
    del half

    ckpt = ck.load_conv_checkpoint(path)
    assert ck.checkpoint_phase(ckpt) == "convection"
    resumed = ck.restore_conv_state(phys, arrays, ckpt)
    assert int(resumed.it) == 300
    final = jax.jit(lambda s: convection_loop(
        phys, arrays, thermo, rad, max_steps=300, state0=s))(resumed)

    # this scenario converges at it=400 (the min-400-iteration rule);
    # resumed and straight must land on the same iteration bitwise
    assert int(final.it) == int(straight.it)
    assert bool(final.keep_running) == bool(straight.keep_running)
    np.testing.assert_array_equal(np.asarray(final.T_lay),
                                  np.asarray(straight.T_lay))
    np.testing.assert_array_equal(np.asarray(final.conv_layer),
                                  np.asarray(straight.conv_layer))


def test_rad_checkpoint_phase_default():
    import numpy as _np
    assert ck.checkpoint_phase({"it": _np.int32(3)}) == "radiation"


def test_fingerprint_mismatch_raises(tmp_path):
    """A checkpoint from a differently-configured run fails loudly."""
    import dataclasses

    import pytest

    phys, arrays = _small_model()
    T0 = jnp.full(phys.nlayer + 1, 1000.0)
    state = jax.jit(lambda t: rad_mod.radiation_loop(
        phys, arrays, None, t, max_steps=20))(T0)
    path = str(tmp_path / "fp.ckpt.npz")
    ck.save_rad_checkpoint(path, state, phys)

    other = dataclasses.replace(phys, T_star=9999.0)
    ckpt = ck.load_rad_checkpoint(path)
    with pytest.raises(ValueError, match="configuration"):
        ck.restore_rad_state(other, arrays, ckpt)
    # matching config restores fine
    ck.restore_rad_state(phys, arrays, ck.load_rad_checkpoint(path))


def test_phase_mismatch_refused(tmp_path):
    """A convection payload cannot be restored as radiation state and
    vice versa (the preemption-resume misrouting scenario)."""
    import pytest

    phys, arrays = _small_model()
    T0 = jnp.full(phys.nlayer + 1, 1000.0)
    state = jax.jit(lambda t: rad_mod.radiation_loop(
        phys, arrays, None, t, max_steps=20))(T0)
    path = str(tmp_path / "ph.ckpt.npz")
    ck.save_rad_checkpoint(path, state, phys)
    with pytest.raises(ValueError, match="radiation-phase"):
        ck.restore_conv_state(phys, arrays, ck.load_rad_checkpoint(path))

    cphys, carrays, thermo = _conv_model()
    from helios_tpu.rce.loop import convection_loop
    from helios_tpu.rce.radiative import radiation_loop
    rad = jax.jit(lambda t: radiation_loop(
        cphys, carrays, thermo, t, max_steps=30))(
            jnp.full(cphys.nlayer + 1, 900.0))
    conv = jax.jit(lambda r: convection_loop(
        cphys, carrays, thermo, r, max_steps=30))(rad)
    cpath = str(tmp_path / "ph_conv.ckpt.npz")
    ck.save_conv_checkpoint(cpath, conv, cphys)
    with pytest.raises(ValueError, match="convection-phase"):
        ck.restore_rad_state(cphys, carrays,
                             ck.load_conv_checkpoint(cpath))


def test_conv_ckpt_path_never_collides():
    """The pipeline's conv-checkpoint path derivation yields a distinct
    file for ANY user-supplied path (ADVICE round 1, medium)."""
    import os

    def derive(p):
        base, ext = os.path.splitext(p)
        if base.endswith(".ckpt"):
            base, ext = base[:-5], ".ckpt" + ext
        return base + "_conv" + ext

    for p in ("/x/restart.ckpt.npz", "/x/ck.npz", "/x/ck", "/x/a.b.c"):
        assert derive(p) != p
