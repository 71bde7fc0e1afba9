"""Benchmarks: throughput of the hot paths on the reference workload.

Prints one JSON line per metric.  Ordered by importance x cost so a
driver timeout truncates the LEAST important tail, never the headline:

  1. fluxpass_gridcells_per_s_per_chip -- full forward flux pipeline
     (opacity interp -> transmission -> beam -> sweep -> integration)
     per pass at 105 layers x 385 bins x 20 Gauss points, fp64.
  2. roofline set -- measured chip ceilings (fp32/df64 fma streaming,
     HBM bandwidth) validated against physical sanity bounds, sweep
     utilizations, RO stage decomposition (sort/cumsum/rebin shares).
  3. ro_mix_ms -- one on-the-fly Random Overlap mixing pass.
  4. rce_iterations_per_s -- production radiative-equilibrium iteration.
  5. fluxpass_noniso_gridcells_per_s -- non-isothermal forward pass.
  6. flagship run -- FULL RCE to convergence (noniso + convection,
     premixed, 105x385x20): flagship_run_seconds /
     flagship_run_iterations, plus the per-phase iteration rates
     rce_iterations_per_s_noniso and conv_iterations_per_s
     (computation.py:986-990 prints exactly this end-user total).
  7. ensemble_planets_per_hour -- batch of 4 flagship-sized planets as
     one device program (the capability the reference lacks).
  8. rce_iterations_per_s_on_the_fly -- with RO refresh every 10th it.
  9. fluxpass_matrix_gridcells_per_s -- exact Thomas/tridiagonal solve.
 10. beam_zenith_ms -- zenith-geometry-corrected direct beam.
 11. sharding_equality_max_rel -- 8-virtual-device CPU-mesh sanity
     (sharded RCE == single device); runs CONCURRENTLY in a CPU
     subprocess from the start, collected last.

A global wall budget (BENCH_BUDGET_S, default 1650 s) guards every
section: when the remaining time cannot cover a section's estimated
cost it is emitted as {"metric": ..., "skipped": "time_budget"} instead
of being silently truncated by the driver's timeout.

TIMING METHODOLOGY (the round-4 postmortem).  Through the device
tunnel, ``block_until_ready()`` is NOT a synchronization point: it
returns at dispatch, so a timed region closed by it measures enqueue
latency (~30 us) no matter how much device work was submitted --
round 4 published 73 TB/s "HBM bandwidth" on a ~0.8 TB/s chip this
way.  Every timed region here therefore (a) chains its repetitions
INSIDE one jitted program via a TRACED trip count (no unrolling, one
compile, one dispatch), (b) ends with a scalar device->host VALUE
FETCH, the only operation that provably waits for execution, and
(c) is auto-calibrated to >= ~1.5 s so the measured ~30 ms fetch
round-trip (subtracted anyway) stays in the noise.  Residual
distrust is handled by physical sanity bounds on the roofline
ceilings (re-measure on violation, flag roofline_unreliable instead
of publishing garbage percentages).

``vs_baseline`` of the headline is measured against the first-build fp64
single-chip figure recorded below (the reference publishes no
performance numbers; BASELINE.md).
"""

import json
import os
import subprocess
import sys
import time

# first measured figure (fp64, single chip, unfused jnp pipeline) -- the
# self-baseline all later rounds improve against
BASELINE_CELLS_PER_S = 15.5e6

_T0 = time.time()
_DEADLINE = _T0 + float(os.environ.get("BENCH_BUDGET_S", "1650"))
_RTT = 0.03           # measured at startup by _measure_rtt
_TARGET_S = 1.5       # minimum timed-region length


def _remaining() -> float:
    return _DEADLINE - time.time()


def _enable_cache():
    import jax
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass


def _emit(metric, value, unit, vs_baseline=None):
    rec = {"metric": metric, "value": round(float(value), 4),
           "unit": unit}
    if vs_baseline is not None:
        rec["vs_baseline"] = round(float(vs_baseline), 3)
    rec["t"] = round(time.time() - _T0, 1)
    print(json.dumps(rec), flush=True)


def _skip(metric, why="time_budget"):
    print(json.dumps({"metric": metric, "skipped": why,
                      "t": round(time.time() - _T0, 1)}), flush=True)


def _fail(metric, e):
    print(json.dumps({"metric": metric, "error": str(e)[:200],
                      "t": round(time.time() - _T0, 1)}), flush=True)


def _rng():
    """Per-run OS-entropy generator: benchmark inputs are never reused
    across runs (or calls), so no (executable, input) request pair ever
    repeats -- the other half of the anti-caching methodology.  Inputs
    that end up float32 are generated IN float32 (an additive 1e-9 salt
    on a value later cast to float32 rounds away to a bitwise no-op)."""
    import numpy as np
    return np.random.default_rng()


def _salted(a, scale=1e-9):
    """Random relative perturbation of an fp64 input (see _rng)."""
    return a * (1.0 + scale * _rng().uniform(-1.0, 1.0, __import__(
        "numpy").shape(a)))


def _measure_rtt():
    """Median scalar-fetch round-trip through the device tunnel."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    global _RTT
    z = jnp.ones((8, 128), jnp.float32)
    g = jax.jit(lambda x: (x * np.float32(1.000001)).sum())
    float(g(z))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(g(z))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    _RTT = ts[2]
    return _RTT


def _timed_call(f, *args) -> float:
    """Time one dispatch of ``f`` closed by a scalar fetch; returns
    seconds with the fetch round-trip subtracted (never below 50%)."""
    t0 = time.perf_counter()
    out = f(*args)
    float(out)                     # D2H scalar fetch: the real sync
    dt = time.perf_counter() - t0
    return max(dt - _RTT, 0.5 * dt)


def _calibrated(f, k0: int, est_each: float, reps: int = 3):
    """Median of ``reps`` timed calls of ``f(k)``, with k grown until
    one call spans >= _TARGET_S.  ``f`` must accept a TRACED trip count
    (same compile for every k) and return a scalar-indexable output.
    Returns (seconds_per_unit, k)."""
    k = max(k0, int(_TARGET_S / max(est_each, 1e-9)))
    while True:
        dt = _timed_call(f, k)
        if dt >= _TARGET_S * 0.7 or k >= (1 << 20):
            break
        # grow toward the target from the measured per-unit cost
        k = max(k + 1, min(int(k * _TARGET_S / max(dt, 1e-3) * 1.2),
                           k * 8))
    ts = [dt]
    for _ in range(reps - 1):
        ts.append(_timed_call(f, k))
    ts.sort()
    return ts[len(ts) // 2] / k, k


# --------------------------------------------------------------------------- #
# forward flux pass
# --------------------------------------------------------------------------- #

def _workload(iso=True, **over):
    from helios_tpu.config import HeliosConfig
    from helios_tpu.forward import build_model
    from helios_tpu.io.opacity import synthetic_premixed_table

    table = synthetic_premixed_table(nbin=385, ny=20)
    kw = dict(
        planet="manual", g=2140.0, a=0.03142, R_planet=1.138,
        R_star=0.805, T_star=5040.0, T_intern=100.0,
        scattering="yes", direct_beam="no", convection="no",
        run_type="iterative", iso_input="yes" if iso else "no")
    kw.update(over)
    cfg = HeliosConfig(**kw).finalize()
    return build_model(cfg, table)


def bench_fluxpass(iso=True, **over):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from helios_tpu.forward import forward_fluxes

    phys, arrays = _workload(iso=iso, **over)
    T_lay = jnp.asarray(_salted(np.linspace(1800.0, 600.0, phys.nlayer + 1)))

    @jax.jit
    def fwd(T, k):
        def body(_, T):
            _flux, totals, _cache = forward_fluxes(phys, arrays, T)
            return T + 1e-12 * totals.F_net   # data-dependent chaining
        return jax.lax.fori_loop(0, k, body, T)[0]

    float(fwd(T_lay, 2))           # compile + warm
    per_pass, _k = _calibrated(lambda k: fwd(T_lay, k), 50, 2e-3)
    return phys.nlayer * phys.nbin * phys.ny / per_pass


def bench_beam_zenith():
    """Zenith-geometry-corrected direct beam (the terminator/rocky-planet
    path, kernels.cu:1265-1362): one [I, L] x [L, S] triangular
    contraction in mul+sum form."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from helios_tpu import fastpath as fp

    L, B, Y = 105, 385, 20
    S = B * Y
    rng = _rng()
    dtau = jnp.asarray(np.exp(rng.normal(-2.0, 1.0, (L, S))))
    z_lay = jnp.asarray(np.sort(rng.uniform(0.0, 5e8, L)))
    planck_star = jnp.asarray(rng.uniform(1e3, 1e5, S))

    from helios_tpu.ops.beam import _mu_star_matrix
    mu_mat = _mu_star_matrix(z_lay, -0.2, 7e9, 1, L + 1, dtau.dtype)
    mask = (jnp.arange(L)[None, :] >= jnp.arange(L + 1)[:, None])
    W = jnp.where(mask, 1.0 / mu_mat, 0.0)

    @jax.jit
    def beam(dt, k):
        def body(_, dt):
            F = fp.fdir_iso_flat(planck_star, dt, W, mu_star=-0.2,
                                 R_star=7e10, a=1.5e12, dir_beam=1)
            # multiplicative drift well above fp64 eps so every chained
            # step is input-unique (an additive 1e-30 is a no-op)
            return dt * (1.0 + 1e-12 * jnp.tanh(F[0]))
        return jax.lax.fori_loop(0, k, body, dt)[0, 0]

    float(beam(dtau, 2))
    per_call, _k = _calibrated(lambda k: beam(dtau, k), 20, 2e-3)
    return per_call * 1e3


# --------------------------------------------------------------------------- #
# chunked RCE loop runners
# --------------------------------------------------------------------------- #
#
# All iteration-rate and whole-run metrics share ONE pair of compiled
# programs per workload: a jitted state init and a jitted
# fixed-chunk-size while_loop continuation (radiation_loop /
# convection_loop with state0).  The chunk program is compiled once and
# reused for the rate measurement AND the full convergence run, instead
# of compiling a separate whole-loop program per metric (the round-4
# bench compiled ~9 distinct loop programs and timed out on compiles).
# Each chunk ends with an int(s.it) fetch -- the required sync (see the
# module timing note) that the production chunked monitoring does
# anyway.

_CHUNK = 400


class _Runner:
    def __init__(self, phys, arrays, thermo=None, sset=None,
                 chunk=_CHUNK):
        import jax

        from helios_tpu.rce.loop import convection_loop
        from helios_tpu.rce.radiative import init_rad_state, radiation_loop

        self.chunk = chunk
        self.init = jax.jit(
            lambda t: init_rad_state(phys, arrays, t, sset))
        self.rad_chunk = jax.jit(
            lambda s: radiation_loop(phys, arrays, thermo, None,
                                     max_steps=chunk, sset=sset,
                                     state0=s))
        self.conv_entry = jax.jit(
            lambda r: convection_loop(phys, arrays, thermo, r,
                                      max_steps=chunk, sset=sset))
        self.conv_chunk = jax.jit(
            lambda s: convection_loop(phys, arrays, thermo, None,
                                      max_steps=chunk, sset=sset,
                                      state0=s))


def _timed_chunk(step, s):
    """One timed chunk; returns (iterations/s or 0, new state).  The
    int(s.it) fetch closes the region (see module timing note)."""
    it0 = int(s.it)
    t0 = time.perf_counter()
    s = step(s)
    d = int(s.it) - it0
    dt = time.perf_counter() - t0
    dt = max(dt - _RTT, 0.5 * dt)
    return (d / dt if d else 0.0), s


def bench_rce_iterations(iso=True, sset_workload=False):
    """Production RCE iteration rate: the radiation while_loop body
    (sweep every step, cell-cache refresh every 10th, temperature
    update + convergence predicates).  With ``sset_workload`` the cache
    refresh runs on-the-fly Random Overlap opacity mixing instead of the
    premixed table (the reference's unmixed-opacity hot path)."""
    import jax.numpy as jnp
    import numpy as np

    if sset_workload:
        phys, arrays, sset = _onthefly_workload()
    else:
        phys, arrays = _workload(iso=iso)
        sset = None
    r = _Runner(phys, arrays, sset=sset)
    T0 = jnp.asarray(_salted(np.linspace(1800.0, 600.0, phys.nlayer + 1)))

    s = r.init(T0)
    _rate, s = _timed_chunk(r.rad_chunk, s)     # compile + warm
    best = 0.0
    for _ in range(2):
        rate, s = _timed_chunk(r.rad_chunk, s)
        best = max(best, rate)
    assert best > 0, "radiation loop exited before the timed chunks"
    return best


def _onthefly_workload():
    from helios_tpu import chem
    from helios_tpu.config import HeliosConfig
    from helios_tpu.forward import build_model
    from helios_tpu.io.opacity import synthetic_premixed_table

    B, ny = 385, 20
    donor = synthetic_premixed_table(nbin=B, ny=ny, ntemp=8, npress=6,
                                     seed=1)
    cfg = HeliosConfig(
        planet="manual", g=2140.0, a=0.03142, R_planet=1.138,
        R_star=0.805, T_star=5040.0, T_intern=100.0,
        scattering="yes", direct_beam="no", convection="no",
        run_type="iterative", iso_input="yes",
        opacity_mixing="on-the-fly").finalize()
    phys, arrays = build_model(cfg, donor)
    specs = [chem.SpeciesSpec("H2O", True, False, "1e-3"),
             chem.SpeciesSpec("CO2", True, False, "1e-4"),
             chem.SpeciesSpec("H2", False, True, "0.9"),
             chem.SpeciesSpec("He", False, False, "0.1")]
    sset = chem.build_species_set(
        specs, ktemps=donor.temperatures, kpress=donor.pressures,
        nbin=B, ny=ny, nlayer=phys.nlayer,
        opacity_tables={"H2O": donor.kpoints, "CO2": donor.kpoints * 3.0},
        scat_tables={"H2": 8.49e-45 / donor.wave_centers ** 4})
    return phys, arrays, sset


def bench_ro_mix():
    """One on-the-fly Random Overlap mixing pass (2 absorbers, 105
    layers x 385 bins x 20 y)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from helios_tpu import chem
    from helios_tpu.io.opacity import synthetic_premixed_table

    B, ny, L = 385, 20, 105
    donor = synthetic_premixed_table(nbin=B, ny=ny, ntemp=8, npress=6,
                                     seed=1)
    specs = [chem.SpeciesSpec("H2O", True, False, "1e-3"),
             chem.SpeciesSpec("CO2", True, False, "1e-4"),
             chem.SpeciesSpec("H2", False, False, "0.9"),
             chem.SpeciesSpec("He", False, False, "0.1")]
    sset = chem.build_species_set(
        specs, ktemps=donor.temperatures, kpress=donor.pressures,
        nbin=B, ny=ny, nlayer=L,
        opacity_tables={"H2O": donor.kpoints, "CO2": donor.kpoints * 3.0})
    _, gw = __import__("helios_tpu.io.opacity", fromlist=["x"]
                       ).gauss_legendre_ypoints(ny)

    T = jnp.asarray(_salted(np.linspace(1800.0, 600.0, L)))
    p = jnp.asarray(np.geomspace(1e9, 1e-1, L))
    wave = jnp.asarray(donor.wave_centers)
    gy = jnp.asarray(donor.gauss_y)
    gw = jnp.asarray(gw)

    use_pallas = jax.default_backend() == "tpu"

    @jax.jit
    def mix(T, k):
        def body(_, T):
            opac, _scat, _mmm = chem.mixed_opacities(
                sset, T, p, wave, gw, gy, ro_method=1, scat=0,
                use_pallas=use_pallas)
            # bounded ~1e-12 relative drift: every chained step is
            # input-unique (1e-30*opac is a no-op against fp64 eps)
            return T * (1.0 + 1e-12 * jnp.tanh(opac[0, 0, 0]))
        return jax.lax.fori_loop(0, k, body, T)[0]

    float(mix(T, 2))
    per_pass, _k = _calibrated(lambda k: mix(T, k), 10, 15e-3)
    return per_pass * 1e3


# --------------------------------------------------------------------------- #
# flagship whole-run metric (noniso + convection, to convergence)
# --------------------------------------------------------------------------- #

_RAD_CAP = 4000
_CONV_CAP = 4000


def _flagship_workload():
    """The production-default configuration at the flagship shape
    (105 layers x 385 bins x 20 y): non-isothermal (the reference's
    iterative run_type sets iso=0, read.py:888-895), convection
    enabled, an irradiated hot-Jupiter with a thick interior
    (10x opacity, T_intern = 500 K, kappa = 0.25) so the run exercises
    BOTH phases: the radiative loop hands over via goto_convection and
    the convective interplay converges (measured: ~200 rad + ~500 conv
    iterations, final profile ~850-4350 K)."""
    from helios_tpu.config import HeliosConfig
    from helios_tpu.forward import build_model
    from helios_tpu.io.opacity import synthetic_premixed_table
    from helios_tpu.rce.radiative import make_const_thermo

    table = synthetic_premixed_table(nbin=385, ny=20)
    table.kpoints *= 10.0           # optically thick -> convective
    cfg = HeliosConfig(
        planet="manual", g=2140.0, a=0.03142, R_planet=1.138,
        R_star=0.805, T_star=5040.0, T_intern=500.0,
        scattering="yes", direct_beam="no", convection="yes",
        kappa_value=0.25, run_type="iterative", iso_input="no",
        adapt_interval=6).finalize()
    phys, arrays = build_model(cfg, table)
    return phys, arrays, make_const_thermo(0.25)


def bench_flagship():
    """Full RCE run to convergence (rad phase + convective phase) on the
    flagship 105x385x20 workload.  Returns a dict of metrics; the run is
    executed twice -- the first call compiles the four chunk programs,
    the second (warm) provides every number, so flagship_run_seconds is
    runtime, not compile time.  Per-phase chunk rates double as
    rce_iterations_per_s_noniso and conv_iterations_per_s."""
    import jax.numpy as jnp
    import numpy as np

    phys, arrays, thermo = _flagship_workload()
    r = _Runner(phys, arrays, thermo=thermo)

    # start from a SUPER-adiabatic deep profile (slope 0.30 > kappa
    # 0.25 wherever the 900 K floor is not binding): engagement of the
    # convective phase is trajectory-dependent in this marginally
    # convective atmosphere (a 1e-9 T0 salt flipped runs between
    # ~600-it radiative-only convergence and rad->conv handover), and
    # the steep start pins the trajectory on the convective branch so
    # conv_iterations_per_s is measured every run.
    p = np.asarray(arrays.p_lay)
    T0_base = np.clip(4300.0 * (p / p[0]) ** 0.30, 900.0, None)
    # index nlayer is the surface/BOA ghost layer (radiative.py:135)
    T0_base = np.append(T0_base, T0_base[0])

    def one_run():
        T0 = jnp.asarray(_salted(T0_base))
        t_start = time.perf_counter()
        s = r.init(T0)
        rad_rate = 0.0
        while True:
            rate, s = _timed_chunk(r.rad_chunk, s)
            rad_rate = max(rad_rate, rate)
            if not bool(s.keep_running) or int(s.it) >= _RAD_CAP:
                break
        rad_its = int(s.it)
        c = r.conv_entry(s)
        conv_rate = 0.0
        while bool(c.keep_running) and int(c.it) < _CONV_CAP:
            rate, c = _timed_chunk(r.conv_chunk, c)
            conv_rate = max(conv_rate, rate)
        conv_its = int(c.it)
        wall = time.perf_counter() - t_start
        converged = (rad_its < _RAD_CAP and conv_its < _CONV_CAP
                     and not bool(c.keep_running))
        # conv_iterations_per_s and conv_iterations_per_s_noniso are ONE
        # measurement emitted under both historical names: convection
        # only runs in non-isothermal mode (phys.iso gates the loop, as
        # in the reference computation.py:996-1009), so the round-4
        # artifact's two convective metrics were the same workload twice.
        return dict(flagship_run_seconds=wall,
                    flagship_run_iterations=rad_its + conv_its,
                    flagship_run_converged=int(converged),
                    rce_iterations_per_s_noniso=rad_rate,
                    conv_iterations_per_s=conv_rate,
                    conv_iterations_per_s_noniso=conv_rate)

    one_run()           # cold: compiles init/rad/conv-entry/conv-chunk
    return one_run()    # warm: the reported numbers


def bench_ensemble():
    """Batched-planet throughput: 8 flagship-sized members (noniso +
    convection) as ONE device program via run_ensemble_loops -- the
    data-parallel capability the reference fundamentally lacks (one
    process per GPU per planet).  Cold call compiles, warm call is the
    measurement; planets/hour follows from the warm whole-batch wall
    (closed by value fetches of every member's it counter)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from helios_tpu.parallel.ensemble import stack_models
    from helios_tpu.rce.loop import convection_loop
    from helios_tpu.rce.radiative import radiation_loop

    phys, arrays, thermo = _flagship_workload()
    # n = 4: a batch of 8 noniso flagship members reproducibly CRASHED
    # the TPU worker (HBM pressure: 8x the ~0.5 GB noniso cell cache
    # plus the while-loop's carried copies); 4 is the measured stable
    # single-chip envelope, and the planet axis scales across chips for
    # larger fleets (parallel/sharding.py planet mesh).
    n = int(os.environ.get("BENCH_ENSEMBLE_N", "4"))
    rng = _rng()
    models = []
    for i in range(n):
        # per-member variation through ModelArrays (same compile-time
        # physics): scale the stellar irradiation slightly
        f = 1.0 + 0.02 * i
        models.append(arrays._replace(starflux=arrays.starflux * f))
    m_stacked = stack_models(models)
    T0s = jnp.asarray(
        np.linspace(4300.0, 900.0, phys.nlayer + 1)[None, :]
        * (1.0 + 0.01 * rng.uniform(size=(n, 1))))

    # the batched device programs of run_ensemble_loops
    # (parallel/ensemble.py:74-85), jitted ONCE so the warm timed run
    # contains no re-tracing
    rad_fn = jax.jit(jax.vmap(
        lambda m, t: radiation_loop(phys, m, thermo, t,
                                    max_steps=_RAD_CAP)))
    conv_fn = jax.jit(jax.vmap(
        lambda m, r: convection_loop(phys, m, thermo, r,
                                     max_steps=_CONV_CAP)))

    def one_run(T0s):
        t0 = time.perf_counter()
        rad = rad_fn(m_stacked, T0s)
        conv = conv_fn(m_stacked, rad)
        its = int(np.sum(np.asarray(rad.it)))       # value fetch = sync
        its += int(np.sum(np.asarray(conv.it)))
        wall = time.perf_counter() - t0
        return wall, its

    one_run(T0s)                  # cold (compile)
    wall, its = one_run(jnp.asarray(_salted(np.asarray(T0s))))
    return dict(ensemble_planets_per_hour=n * 3600.0 / wall,
                ensemble_batched_iterations_per_s=its / wall)


# --------------------------------------------------------------------------- #
# roofline: measured hardware ceilings + kernel utilizations
# --------------------------------------------------------------------------- #
#
# The self-baseline (BASELINE_CELLS_PER_S) says how much faster the build
# got; these metrics say how close the hot kernels sit to what the chip
# can do AT ALL.  Ceilings are MEASURED on the same chip (no spec-sheet
# constants), then VALIDATED against physical sanity bounds before being
# used as utilization denominators:
#
#   * fp32 fma VMEM-streaming rate: one fma per element per VMEM
#     round-trip, the access pattern of a streaming elementwise kernel.
#     (~220 Gel/s x 8 B/element == ~1.76 TB/s of VMEM traffic, i.e. this
#     chain is VMEM-limited, NOT the raw ALU issue rate.  A true
#     register-resident issue-rate measurement is not reachable through
#     this stack: any register-carried fma chain with loop-constant
#     coefficients is an iterated affine map and gets collapsed by the
#     compiler.)
#   * df64 fma VMEM-streaming rate -- the EXACT primitive AND access
#     pattern of the sweep kernels (ops.df64.fma on hi/lo pairs staged
#     through VMEM), so sweep utilization = (exact df64 fma count) /
#     time / ceiling with no instruction-count modeling;
#   * HBM streaming bandwidth (chained full-array passes with a traced
#     trip count so the passes cannot be fused away).
#
# All three follow the module timing methodology (traced-count in-jit
# chains, scalar-fetch close, >= 1.5 s regions).  The in-kernel body is
# made non-collapsible (a quadratic term joins the fma) and inputs come
# from fresh per-run float32 entropy.  Residual pathology is caught by
# the physical envelopes: a ceiling outside its envelope is re-measured,
# and if it stays impossible the run emits roofline_unreliable=1 and
# withholds the utilization percentages rather than publishing garbage
# (round-4 postmortem: 73 TB/s "HBM" on a ~0.8 TB/s chip drove
# utilizations to a meaningless 0.4 %).
#
# Physical envelopes (v5e single chip): HBM stream <= ~0.82 TB/s spec,
# bound at 1.05 TB/s; fp32 VMEM-stream fma bounded well below the raw
# VPU issue rate (~3.9 Tel/s at 940 MHz x 4 x (8,128)); df64 fma is ~25
# fp32 lane-ops so its streaming ceiling must sit ~an order below the
# fp32 one.
#
# The RO kernel is heterogeneous (int32 bitonic stages + df64 cumsum/
# rebin) and its hot loop is sublane rotations + selects, a pattern with
# no honest single-number ceiling; instead of a modeled utilization
# percentage the bench MEASURES each pipeline stage's share directly
# with the kernel's stage-skipping hook (ro_sort_ms / ro_cumsum_ms /
# ro_rebin_ms below) -- the floor analysis for SURVEY §7.2's <=8 ms
# target.  _ro_model_instr (per-element instruction model, df64 op costs
# from ops/df64.py) is kept for the modeled aggregate instruction
# throughput ro_mix_modeled_gops, quoted with the model's ~2x
# uncertainty.

_BOUNDS = {
    "vpu_fma_stream_measured": (30.0, 1300.0),     # Gel/s
    "vpu_df64_fma_stream_measured": (2.0, 160.0),  # Gop/s
    "hbm_bw_measured": (80.0, 1050.0),             # GB/s
}


def _vpu_peak():
    """Measured fp32 fma VMEM-streaming rate [elements/s]: x = a*x + b
    (plus a tiny quadratic term so the chain is not an iterated affine
    map the compiler can collapse) over a VMEM-resident [512, 1024]
    array -- the sustained rate of a streaming elementwise kernel."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    reps, shape = 2000, (512, 1024)

    def kernel(x_ref, o_ref):
        a = np.float32(0.9999999)
        b = np.float32(1e-7)
        c = np.float32(1e-9)
        o_ref[:, :] = jax.lax.fori_loop(
            np.int32(0), np.int32(reps),
            lambda i, x: a * x + (b + c * x * x), x_ref[:, :])

    x = jnp.asarray(_rng().uniform(0.4, 0.6, shape).astype(np.float32))
    with jax.enable_x64(False):
        pc = lambda v: pl.pallas_call(   # noqa: E731
            kernel,
            out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(v)
        f = jax.jit(lambda v, k: jax.lax.fori_loop(
            0, k, lambda i, y: pc(y), v)[0, 0])
    float(f(x, 2))
    per_call, _k = _calibrated(lambda k: f(x, k), 64, 5e-3)
    return shape[0] * shape[1] * reps / per_call


def _vpu_df64_fma_peak():
    """Measured df64-fma VMEM-streaming rate [df64 fma/s]: the EXACT
    primitive of the sweep kernels (ops.df64.fma on hi/lo fp32 pairs)
    in their exact access pattern (hi/lo arrays staged through VMEM).
    Sweep utilization measured against this same-pattern ceiling needs
    no instruction-count model at all."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from helios_tpu.ops import df64

    reps, shape = 600, (128, 1024)   # 128 vreg chains; fits scoped VMEM

    def kernel(xh_ref, xl_ref, oh_ref, ol_ref):
        a = df64.DF(jnp.full(shape, np.float32(0.9999999)),
                    jnp.full(shape, np.float32(1e-9)))
        b = df64.DF(jnp.full(shape, np.float32(1e-7)),
                    jnp.full(shape, np.float32(1e-15)))

        def body(i, x):
            rr = df64.fma(a, df64.DF(x[0], x[1]), b)
            return (rr.hi, rr.lo)

        h, l = jax.lax.fori_loop(np.int32(0), np.int32(reps), body,
                                 (xh_ref[:, :], xl_ref[:, :]))
        oh_ref[:, :] = h
        ol_ref[:, :] = l

    xh = jnp.asarray(_rng().uniform(0.4, 0.6, shape).astype(np.float32))
    xl = jnp.zeros(shape, jnp.float32)
    with jax.enable_x64(False):
        pc = lambda h, l: pl.pallas_call(   # noqa: E731
            kernel,
            out_shape=(jax.ShapeDtypeStruct(shape, jnp.float32),) * 2,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),) * 2,
        )(h, l)
        f = jax.jit(lambda h, l, k: jax.lax.fori_loop(
            0, k, lambda i, y: pc(y[0], y[1]), (h, l))[0][0, 0])
    float(f(xh, xl, 2))
    per_call, _k = _calibrated(lambda k: f(xh, xl, k), 64, 5e-3)
    return shape[0] * shape[1] * reps / per_call


def _hbm_bw():
    """Measured HBM streaming bandwidth [B/s]: chained elementwise
    passes over 128 MB; the trip count is a traced argument so the
    per-iteration full read + write cannot be unrolled and fused, and
    the region is closed by a scalar fetch."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    n = 32 * 1024 * 1024
    x = jnp.asarray(_rng().uniform(0.4, 0.6, n).astype(np.float32))
    f = jax.jit(lambda x, r: jax.lax.fori_loop(
        0, r,
        lambda i, y: y * np.float32(1.0000001) + np.float32(1e-6),
        x)[0])
    float(f(x, 2))
    per_pass, _k = _calibrated(lambda k: f(x, k), 8, 0.15)
    return 2 * n * 4 / per_pass


def _measure_bounded(fn, name, scale):
    """Run a ceiling micro-benchmark, validating against _BOUNDS: on a
    physically impossible value, re-measure with fresh inputs (up to 3
    attempts).  Returns (value_or_None, ok)."""
    lo, hi = _BOUNDS[name]
    vals = []
    for _ in range(3):
        try:
            v = fn() / scale
        except Exception as e:
            _fail(name, e)
            return None, False
        vals.append(v)
        if lo <= v <= hi:
            return v, True
    # all attempts outside the physical envelope: report the median but
    # flag it unusable as a utilization denominator
    vals.sort()
    return vals[1], False


_DF_MUL, _DF_ADD = 19, 11     # fp32 ALU ops per df64 op (ops/df64.py)


def _bench_sweep_kernel(iso: bool):
    """Isolated fused df64 sweep solve on the production shape; returns
    (seconds per solve, exact df64-fma count per solve)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from helios_tpu.kernels.sweep_pallas import (
        fused_iso_sweep_df64_pairs, fused_noniso_sweep_df64_pairs)
    from helios_tpu.ops import df64

    L, S, P = 105, 385 * 20, 4
    rng = _rng()   # per-run entropy (see the roofline section comment)

    def df(shape, lo_, hi_):
        return df64.split(jnp.asarray(rng.uniform(lo_, hi_, shape)))

    a = df((L, S), 0.3, 0.8)
    b = df((L, S), 0.0, 0.1)
    sd = df((L, S), 0.0, 1e3)
    su = df((L, S), 0.0, 1e3)
    toa = df((S,), 0.0, 1e3)
    refl = df((S,), 0.0, 0.3)
    emis = df((S,), 0.0, 1e4)
    fdir0 = df((S,), 0.0, 1e3)
    fup0 = df((L + 1, S), 0.0, 1e4)

    if iso:
        @jax.jit
        def run(fup, k):
            def body(_, fup):
                fd, fu = fused_iso_sweep_df64_pairs(
                    a, b, sd, su, toa, refl, emis, fdir0, fup,
                    n_passes=P)
                return fu
            out = jax.lax.fori_loop(0, k, body, fup)
            return out.hi[0, 0]
        float(run(fup0, 2))
        dt, _k = _calibrated(lambda k: run(fup0, k), 30, 1e-3)
        # per pass per cell: 2x (vectorized source fma + sequential fma)
        instr = L * S * P * 4
    else:
        al = df((L, S), 0.3, 0.8)
        bl = df((L, S), 0.0, 0.1)
        sld = df((L, S), 0.0, 1e3)
        slu = df((L, S), 0.0, 1e3)
        fcup0 = df((L, S), 0.0, 1e4)

        @jax.jit
        def run(carry, k):
            def body(_, carry):
                fup, fcup = carry
                fd, fu, fcd, fcu = fused_noniso_sweep_df64_pairs(
                    a, b, sd, su, al, bl, sld, slu, toa, refl, emis,
                    fdir0, fup, fcup, n_passes=P)
                return fu, fcu
            out = jax.lax.fori_loop(0, k, body, (fup0, fcup0))
            return out[0].hi[0, 0]
        float(run((fup0, fcup0), 2))
        dt, _k = _calibrated(lambda k: run((fup0, fcup0), k), 30, 2e-3)
        # per pass per cell: down s1+s2+flatten+seq+recover fmas = 5,
        # up the same = 10 fma; plus the one-time aa pair product
        instr = L * S * (P * 10 + 1)
    return dt, instr


def _ro_model_instr():
    """Modeled VPU instructions of one Random Overlap mixing pass
    (kernels/ro_pallas.py) at the production shape."""
    L, B, ny = 105, 385, 20
    cells = L * B
    n_pad, stages_skipped = 512, 10
    n_stages = 45 - stages_skipped
    gen = n_pad * (_DF_ADD + 8)           # pair sums + key packing
    # per stage per element: 2 rolls + 1 direction select x 2 arrays
    # + lex compare 5 + direction mask 3 + take-combine 3 + 2 selects
    sort = n_stages * n_pad * 19
    cumsum = 9 * n_pad * (_DF_ADD + 2)
    # weight reconstruction (2 onehot lookups x ny rows) + rebin
    # (ny nodes x (df64 lt + masked sums)) + interpolation
    recon = 2 * ny * n_pad * 2 + n_pad * (2 + _DF_MUL)
    rebin = ny * n_pad * (4 + 6) + 2 * ny * (ny * 4 + n_pad * 2)
    interp = ny * (3 * _DF_MUL + 2 * _DF_ADD + 40)
    return cells * (gen + sort + cumsum + recon + rebin + interp)


class _ROStageTimer:
    """Times the raw RO Pallas kernel at the production cell shape
    (105 x 385 x 20) with pipeline stages optionally elided via the
    kernel's ``skip`` hook.  ONE input pair is generated per run and
    shared by every variant (independent inputs per variant made the
    subtraction t_full - t_skip noisy enough to go negative); each
    variant is timed with the module's calibrated-median machinery."""

    def __init__(self):
        import jax.numpy as jnp
        import numpy as np

        from helios_tpu.io.opacity import gauss_legendre_ypoints

        ny, L, B = 20, 105, 385
        gy, gw = gauss_legendre_ypoints(ny)
        rng = _rng()
        self.m = jnp.asarray(
            np.sort(10.0 ** rng.uniform(-8, 2, (L, B, ny)), axis=-1))
        self.n = jnp.asarray(
            np.sort(10.0 ** rng.uniform(-8, 2, (L, B, ny)), axis=-1))
        self.gy = jnp.asarray(gy)
        self.gw = jnp.asarray(gw)

    def time_ms(self, skip: str) -> float:
        import jax
        import jax.numpy as jnp

        from helios_tpu.kernels.ro_pallas import random_overlap_mix_pallas

        @jax.jit
        def run(mm, k):
            def body(_, mm):
                out = random_overlap_mix_pallas(mm, self.n, self.gw,
                                                self.gy, skip=skip)
                # bounded ~1e-12 relative drift: each chained step is
                # input-unique (1e-30*out is a no-op against fp64 eps)
                o = out[0, 0, 0]
                return mm * (1.0 + 1e-12 * o / (1.0 + jnp.abs(o)))
            return jax.lax.fori_loop(0, k, body, mm)[0, 0, 0]

        float(run(self.m, 2))
        per_pass, _k = _calibrated(lambda k: run(self.m, k), 10, 15e-3)
        return per_pass * 1e3


def bench_roofline():
    """Measured ceilings + per-kernel utilization; returns a list of
    (metric, value, unit) tuples."""
    import jax

    if jax.default_backend() != "tpu":
        return [("roofline_skipped_no_tpu", 1, "flag")]

    out = []
    unreliable = False

    v, ok = _measure_bounded(_vpu_peak, "vpu_fma_stream_measured", 1e9)
    if v is not None:
        out.append(("vpu_fma_stream_measured", round(v, 1), "Gel/s"))
    unreliable |= not ok

    df64_peak, ok = _measure_bounded(_vpu_df64_fma_peak,
                                     "vpu_df64_fma_stream_measured", 1e9)
    if df64_peak is not None:
        out.append(("vpu_df64_fma_stream_measured", round(df64_peak, 2),
                    "Gop/s"))
    df64_ok = ok and df64_peak
    unreliable |= not ok

    v, ok = _measure_bounded(_hbm_bw, "hbm_bw_measured", 1e9)
    if v is not None:
        out.append(("hbm_bw_measured", round(v, 1), "GB/s"))
    unreliable |= not ok

    # sweeps: exact df64-fma counts vs the measured df64-fma ceiling --
    # workload and ceiling in the same unit, no instruction model
    # needed.  Utilization is only published against a SANE ceiling.
    for iso, label in ((True, "iso"), (False, "noniso")):
        try:
            dt, fmas = _bench_sweep_kernel(iso=iso)
        except Exception as e:
            _fail(f"sweep_{label}_solve_ms", e)
            continue
        out.append((f"sweep_{label}_solve_ms", round(dt * 1e3, 3), "ms"))
        out.append((f"sweep_{label}_df64_gfma_s",
                    round(fmas / dt / 1e9, 1), "Gfma/s"))
        if df64_ok:
            out.append((f"sweep_{label}_df64_pct",
                        round(100.0 * fmas / dt / (df64_peak * 1e9), 1),
                        "%"))

    # (the RO stage decomposition -- no honest single-number ceiling
    # exists for its rotate+select hot loop -- runs as its own guarded
    # child section, bench_ro_stages)

    if unreliable:
        out.append(("roofline_unreliable", 1, "flag"))
    return out


# --------------------------------------------------------------------------- #
# sharding equality (CPU subprocess, launched concurrently)
# --------------------------------------------------------------------------- #

_SHARDING_CODE = r"""
import os, json
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS","")
                           + " --xla_force_host_platform_device_count=8")
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np, jax.numpy as jnp
from helios_tpu.config import HeliosConfig
from helios_tpu.forward import build_model
from helios_tpu.io.opacity import synthetic_premixed_table
from helios_tpu.parallel import sharding as shd
from helios_tpu.rce.radiative import radiation_loop

table = synthetic_premixed_table(nbin=64, ny=4, ntemp=10, npress=8, seed=2)
cfg = HeliosConfig(planet="manual", g=2288.0, a=0.0153, R_planet=1.0,
                   R_star=1.0, T_star=4000.0, T_intern=100.0,
                   scattering="yes", direct_beam="no", convection="no",
                   run_type="iterative", iso_input="yes", nlayer=12,
                   p_boa=1e8, p_toa=1e3).finalize()
phys, arrays = build_model(cfg, table)
mesh = shd.make_mesh(n_planet=1, n_spectral=8)
m_sh = shd.place_model(arrays, mesh)
T0 = jnp.linspace(1500.0, 700.0, phys.nlayer + 1)
rad_init, rad_run, _, _ = shd.production_runners(phys, mesh, None, None,
                                                 chunk_iters=60)
st = rad_run(m_sh, (), rad_init(m_sh, (), T0))
want = jax.jit(lambda t: radiation_loop(phys, arrays, None, t,
                                        max_steps=60))(T0)
rel = float(np.max(np.abs(np.asarray(st.T_lay) - np.asarray(want.T_lay))
                   / np.asarray(want.T_lay)))
print(json.dumps({"sharded_T_max_rel": rel, "its": int(st.it)}))
"""


def launch_sharding_subprocess():
    """Start the 8-virtual-CPU-device mesh equality check in a separate
    process (the CPU platform flag cannot coexist with the TPU backend
    in-process); it runs concurrently with the TPU benches."""
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["PYTHONPATH"] = os.path.dirname(os.path.abspath(__file__)) + (
        ":" + env["PYTHONPATH"] if "PYTHONPATH" in env else "")
    try:
        return subprocess.Popen([sys.executable, "-c", _SHARDING_CODE],
                                env=env, stdout=subprocess.PIPE,
                                stderr=subprocess.DEVNULL, text=True)
    except Exception:
        return None


def collect_sharding(proc) -> float:
    out, _ = proc.communicate(timeout=max(30.0, _remaining()))
    rec = json.loads(out.strip().splitlines()[-1])
    return rec["sharded_T_max_rel"]


# --------------------------------------------------------------------------- #
# section runner: heavy sections run as CHILD bench.py processes with a
# hard wall timeout, so one cold 10-25 min loop compile can never drag
# the whole bench past the driver's kill timeout (the round-4 rc=124
# failure): on child overrun the parent kills that exact child, emits a
# skip marker, and continues.  Children share the persistent compile
# cache; the tunnel interleaves requests between the idle parent and
# the active child.
# --------------------------------------------------------------------------- #

_UNITS = {"ro_kernel_ms": "ms", "ro_sort_ms": "ms", "ro_sort_pct": "%",
          "ro_cumsum_ms": "ms", "ro_rebin_ms": "ms",
          "ro_mix_modeled_gops": "Gop/s",
          "flagship_run_seconds": "s",
          "flagship_run_iterations": "it",
          "flagship_run_converged": "flag",
          "rce_iterations_per_s_noniso": "it/s",
          "conv_iterations_per_s": "it/s",
          "conv_iterations_per_s_noniso": "it/s",
          "ensemble_planets_per_hour": "planets/h",
          "ensemble_batched_iterations_per_s": "it/s"}


def _emit_result(name, res, unit):
    if isinstance(res, dict):
        for k, v in res.items():
            _emit(k, v, _UNITS.get(k, ""))
    else:
        _emit(name, res, unit)


def _section_registry():
    return {
        "ro_stages": (bench_ro_stages, None),
        "ro_mix_ms": (bench_ro_mix, "ms"),
        "rce_iterations_per_s": (lambda: bench_rce_iterations(iso=True),
                                 "it/s"),
        "fluxpass_noniso_gridcells_per_s":
            (lambda: bench_fluxpass(iso=False), "cells/s"),
        "flagship": (bench_flagship, None),
        "rce_iterations_per_s_on_the_fly":
            (lambda: bench_rce_iterations(sset_workload=True), "it/s"),
        "fluxpass_matrix_gridcells_per_s":
            (lambda: bench_fluxpass(iso=True, flux_calc_method="matrix"),
             "cells/s"),
        "beam_zenith_ms": (bench_beam_zenith, "ms"),
        "ensemble": (bench_ensemble, None),
    }


def bench_ro_stages():
    """RO stage decomposition (see bench_roofline's RO note): measured
    stage shares via the kernel's skip hook + the modeled aggregate
    instruction throughput."""
    rot = _ROStageTimer()
    full = rot.time_ms("")
    sort_ms = max(0.0, full - rot.time_ms("sort"))
    cumsum_ms = max(0.0, full - rot.time_ms("cumsum"))
    rebin_ms = max(0.0, full - rot.time_ms("rebin"))
    gops = _ro_model_instr() / (full * 1e-3) / 1e9
    return {"ro_kernel_ms": round(full, 2),
            "ro_sort_ms": round(sort_ms, 2),
            "ro_sort_pct": round(min(100.0, 100.0 * sort_ms / full), 1),
            "ro_cumsum_ms": round(cumsum_ms, 2),
            "ro_rebin_ms": round(rebin_ms, 2),
            "ro_mix_modeled_gops": round(gops, 0)}


def _run_section_child(names):
    """Child-process entry: run one or more (comma-separated) sections
    in one process -- grouping amortizes the ~30-60 s jax init +
    compile-cache load -- printing each section's JSON lines as it
    completes."""
    _enable_cache()
    reg = _section_registry()
    _measure_rtt()
    for name in names.split(","):
        fn, unit = reg[name]
        try:
            _emit_result(name, fn(), unit)
        except Exception as e:
            _fail(name, e)


def _spawn_section(name, est_cold, _retry=True):
    """Run a section group in a child bench.py with a hard timeout.
    On timeout the exact child is killed and its partial output
    salvaged; a child that errored (transient tunnel failures like
    'response body closed' or a worker restart) is retried once."""
    if _remaining() < 90:
        _skip(name)
        return
    timeout = max(120.0, min(_remaining() - 45.0, est_cold))
    env = dict(os.environ)
    env["PYTHONPATH"] = (os.path.dirname(os.path.abspath(__file__))
                         + ((":" + env["PYTHONPATH"])
                            if "PYTHONPATH" in env else ""))
    proc = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--section", name],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
        text=True)
    timed_out = False
    try:
        out, _ = proc.communicate(timeout=timeout)
    except subprocess.TimeoutExpired:
        proc.kill()          # the exact child PID, nothing else
        out, _ = proc.communicate()
        timed_out = True
    lines = [ln.strip() for ln in (out or "").splitlines()
             if ln.strip().startswith("{")]
    errored = proc.returncode != 0 or any('"error"' in ln
                                          for ln in lines)
    if errored and _retry and not timed_out and _remaining() > 180:
        _spawn_section(name, est_cold, _retry=False)
        return
    for ln in lines:
        print(ln, flush=True)
    if timed_out:
        _skip(name, "section_timeout")


def main():
    _enable_cache()
    import jax  # noqa: F401  (initialize backend after cache config)

    shard_proc = launch_sharding_subprocess()
    try:
        _measure_rtt()
    except Exception as e:
        _fail("rtt", e)

    # 1. headline (in-process; everything downstream assumes its
    # compiles are warm)
    try:
        cells = bench_fluxpass(iso=True)
        _emit("fluxpass_gridcells_per_s_per_chip", round(cells, 1),
              "cells/s", cells / BASELINE_CELLS_PER_S)
    except Exception as e:
        _fail("fluxpass_gridcells_per_s_per_chip", e)

    # 2. roofline ceilings + sweep utilizations (fast compiles,
    # in-process); the RO stage decomposition follows as a guarded
    # child section (its 4 kernel variants can cost ~15 min cold)
    if _remaining() > 180:
        try:
            for name, value, unit in bench_roofline():
                _emit(name, value, unit)
        except Exception as e:
            _fail("roofline", e)
    else:
        _skip("roofline")

    # 3..8: guarded child section groups (grouping amortizes per-child
    # init; a group's sections share one process and one timeout),
    # (comma-joined names, worst-case-cold seconds)
    for name, est_cold in [
            ("ro_stages,ro_mix_ms", 1100),
            ("rce_iterations_per_s,fluxpass_noniso_gridcells_per_s",
             1100),
            ("flagship", 1200),
            ("ensemble", 1200),
            ("rce_iterations_per_s_on_the_fly,"
             "fluxpass_matrix_gridcells_per_s,beam_zenith_ms", 1500)]:
        _spawn_section(name, est_cold)

    # 12. collect the concurrent CPU sharding check
    if shard_proc is not None:
        try:
            _emit("sharding_equality_max_rel",
                  collect_sharding(shard_proc), "rel")
        except Exception as e:
            try:
                shard_proc.kill()
            except Exception:
                pass
            _fail("sharding_equality_max_rel", e)


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--section":
        _run_section_child(sys.argv[2])
    else:
        main()
