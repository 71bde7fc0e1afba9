"""Chunked monitored radiation loop: trajectory parity + callbacks."""

import json

import numpy as np

import jax
import jax.numpy as jnp

from helios_tpu import monitor as mon
from helios_tpu.config import HeliosConfig
from helios_tpu.forward import build_model
from helios_tpu.io.opacity import synthetic_premixed_table
from helios_tpu.rce import radiative as rad_mod


def _small_model(**over):
    table = synthetic_premixed_table(nbin=16, ny=4, ntemp=12, npress=10,
                                     seed=3)
    kw = dict(planet="manual", g=2288.0, a=0.0153, R_planet=1.0,
              R_star=1.0, T_star=4000.0, T_intern=200.0,
              scattering="no", direct_beam="no", convection="no",
              run_type="iterative", iso_input="yes", nlayer=12,
              p_boa=1e8, p_toa=1e3, rad_convergence_limit=1e-6)
    kw.update(over)
    cfg = HeliosConfig(**kw).finalize()
    phys, arrays = build_model(cfg, table)
    return cfg, phys, arrays


def test_chunked_trajectory_matches_single_while_loop():
    _, phys, arrays = _small_model()
    T0 = jnp.full(phys.nlayer + 1, 1000.0)

    straight = jax.jit(lambda t: rad_mod.radiation_loop(
        phys, arrays, None, t))(T0)
    chunked = mon.run_radiation_chunked(phys, arrays, None, T0,
                                        chunk_iters=37)

    assert int(chunked.it) == int(straight.it)
    np.testing.assert_array_equal(np.asarray(chunked.T_lay),
                                  np.asarray(straight.T_lay))


def test_callbacks_see_monotonic_progress(tmp_path):
    _, phys, arrays = _small_model()
    T0 = jnp.full(phys.nlayer + 1, 1000.0)

    seen = []
    metrics = mon.MetricsWriter(str(tmp_path / "m.jsonl"))
    progress = mon.ProgressPrinter(phys.nlayer, stream=open(
        str(tmp_path / "progress.txt"), "w"))
    state = mon.run_radiation_chunked(
        phys, arrays, None, T0, chunk_iters=50,
        callbacks=[lambda i: seen.append(int(i.state.it)), metrics,
                   progress])

    assert seen == sorted(seen) and seen[-1] == int(state.it)
    assert all(b - a <= 50 for a, b in zip(seen, seen[1:]))

    recs = [json.loads(l) for l in
            open(str(tmp_path / "m.jsonl")).read().splitlines()]
    assert recs[0].get("event") == "run_start"   # append-mode marker
    recs = [r for r in recs if "event" not in r]
    assert len(recs) == len(seen)
    assert recs[0]["includes_compile"] and not recs[-1]["includes_compile"]
    assert recs[-1]["iteration"] == int(state.it)
    assert recs[-1]["converged_layers"] == phys.nlayer + 1
    assert recs[0]["it_per_s"] > 0

    lines = open(str(tmp_path / "progress.txt")).read().splitlines()
    assert len(lines) == len(seen) and "converged layers" in lines[0]


def test_pipeline_run_with_monitoring(tmp_path):
    """pipeline.run wires progress/metrics/checkpoint callbacks."""
    from helios_tpu import pipeline

    table = synthetic_premixed_table(nbin=16, ny=4, ntemp=12, npress=10,
                                     seed=3)
    cfg, phys, arrays = _small_model(
        name="mon", output_dir=str(tmp_path),
        metrics_file=str(tmp_path / "metrics.jsonl"),
        checkpoint_every=100, progress="yes")
    out = pipeline.run(cfg, table=table, write_output=False)
    assert bool(jnp.all(out.rad.abort))
    assert (tmp_path / "metrics.jsonl").exists()
    assert (tmp_path / "mon" / "restart.ckpt.npz").exists()


def test_convection_chunked_matches_straight(tmp_path):
    """Chunked convection loop == single while_loop run, incl. callbacks."""
    from helios_tpu import monitor as mon2
    from helios_tpu.io.opacity import synthetic_premixed_table
    from helios_tpu.rce.loop import convection_loop
    from helios_tpu.rce.radiative import make_const_thermo, radiation_loop

    table = synthetic_premixed_table(nbin=12, ny=3, ntemp=12, npress=10,
                                     seed=5)
    table.kpoints *= 10.0
    cfg = HeliosConfig(planet="manual", g=2288.0, a=0.0153, R_planet=1.0,
                       R_star=1.0, T_star=30.0, T_intern=700.0,
                       scattering="no", direct_beam="no", convection="yes",
                       kappa_value=0.1, run_type="iterative", nlayer=14,
                       p_boa=1e9, p_toa=1e3,
                       rad_convergence_limit=1e-5,
                       adapt_interval=6).finalize()
    phys, arrays = build_model(cfg, table)
    thermo = make_const_thermo(cfg.kappa_value)

    T0 = jnp.full(phys.nlayer + 1, 900.0)
    rad = jax.jit(lambda t: radiation_loop(phys, arrays, thermo, t))(T0)
    straight = jax.jit(lambda r: convection_loop(
        phys, arrays, thermo, r, max_steps=600))(rad)

    seen = []
    chunked = mon2.run_convection_chunked(
        phys, arrays, thermo, rad, chunk_iters=150,
        callbacks=[lambda i: seen.append((i.phase, int(i.state.it)))])
    # straight run capped at 600; compare at the same iteration count
    if int(chunked.it) > 600:
        chunked600 = None
        # re-run chunked with a cap matching the straight run
        state = jax.jit(lambda r: convection_loop(
            phys, arrays, thermo, r, max_steps=0))(rad)
        for _ in range(4):
            state = jax.jit(lambda s: convection_loop(
                phys, arrays, thermo, rad, max_steps=150,
                state0=s))(state)
        chunked600 = state
    else:
        chunked600 = chunked
    assert int(chunked600.it) == int(straight.it)
    np.testing.assert_array_equal(np.asarray(chunked600.T_lay),
                                  np.asarray(straight.T_lay))
    assert all(ph == "convection" for ph, _ in seen)
    assert [it for _, it in seen] == sorted(it for _, it in seen)


def test_debug_checker_flags_nonfinite_and_negative(capsys):
    """DebugChecker: negative-flux warnings + finiteness errors (the
    debug=yes analogue of kernels.cu:1456-1459)."""
    import numpy as np
    import jax.numpy as jnp
    import pytest as _pytest
    from helios_tpu import monitor

    class FakeFlux:
        F_down = jnp.asarray([[1.0, -2.0], [3.0, 4.0]])
        F_up = jnp.asarray([[1.0, 2.0], [3.0, 4.0]])

    class FakeState:
        it = jnp.asarray(7)
        T_lay = jnp.asarray([100.0, 200.0])
        flux = FakeFlux()

    info = monitor.ChunkInfo(state=FakeState(), its_done=1, wall_s=0.1,
                             phase="radiation")
    cb = monitor.DebugChecker()
    cb(info)
    outp = capsys.readouterr().out
    assert "negative F_down" in outp and "1 " in outp

    FakeState.T_lay = jnp.asarray([100.0, float("nan")])
    with _pytest.raises(FloatingPointError):
        cb(info)


def test_pipeline_mid_run_coupling_tp_writes(tmp_path):
    """coupl_tp_write_interval: the coupling TP file appears DURING the
    run, not only at the end (computation.py:967-971)."""
    import os
    import numpy as np
    from helios_tpu import pipeline
    from helios_tpu.config import HeliosConfig
    from helios_tpu.io.opacity import synthetic_premixed_table

    from helios_tpu import chem

    # coupling requires on-the-fly mixing (read.py constraint)
    B, ny, L = 8, 4, 10
    table = synthetic_premixed_table(nbin=B, ny=ny, ntemp=8, npress=6,
                                     seed=3)
    specs = [chem.SpeciesSpec("H2O", True, False, "1e-3"),
             chem.SpeciesSpec("H2", False, False, "0.9"),
             chem.SpeciesSpec("He", False, False, "0.1")]
    sset = chem.build_species_set(
        specs, ktemps=table.temperatures, kpress=table.pressures,
        nbin=B, ny=ny, nlayer=L, opacity_tables={"H2O": table.kpoints})
    cfg = HeliosConfig(
        name="cpl", output_dir=str(tmp_path) + "/",
        planet="manual", g=2288.0, a=0.0153, R_planet=1.0,
        R_star=1.0, T_star=4000.0, T_intern=200.0,
        scattering="no", direct_beam="no", convection="no",
        run_type="iterative", iso_input="yes", nlayer=L,
        p_boa=1e8, p_toa=1e3, rad_convergence_limit=1e-6,
        opacity_mixing="on-the-fly",
        coupling="yes", coupl_tp_write_interval=30, chunk_iters=30)

    seen = {}
    from helios_tpu.monitor import CouplingTPWriter
    orig = CouplingTPWriter.__call__

    def spy(self, info):
        orig(self, info)
        if os.path.exists(self.path):
            seen.setdefault("first_it", int(info.state.it))

    CouplingTPWriter.__call__ = spy
    try:
        out = pipeline.run(cfg, table=table, sset=sset)
    finally:
        CouplingTPWriter.__call__ = orig

    # written mid-run: first snapshot appeared well before convergence
    assert seen and seen["first_it"] < int(out.rad.it)
    path = os.path.join(str(tmp_path), "cpl", "cpl_tp_coupling_0.dat")
    assert os.path.exists(path)
    rows = open(path).read().splitlines()
    assert rows[0].startswith("press.")
    assert len(rows) == cfg.nlayer + 2
    # final write matches the converged profile (BOA row first)
    T = np.asarray(out.result.T_lay)
    assert abs(float(rows[1].split()[1]) - T[cfg.nlayer]) / T[cfg.nlayer] < 1e-5
