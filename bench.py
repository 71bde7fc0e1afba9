"""Benchmarks: throughput of the hot paths on the reference workload.

Prints one JSON line per metric, HEADLINE FIRST:
  1. fluxpass_gridcells_per_s_per_chip -- full forward flux pipeline
     (opacity interp -> transmission -> beam -> sweep -> integration)
     per pass at 105 layers x 385 bins x 20 Gauss points, fp64.
  2. rce_iterations_per_s -- the production radiative-equilibrium
     iteration (flux solve every step, cell-cache refresh every 10th).
  3. fluxpass_noniso_gridcells_per_s -- non-isothermal forward pass.
  4. ro_mix_ms -- one on-the-fly Random Overlap opacity-mixing pass
     (Pallas in-VMEM kernel on TPU).
  5. rce_iterations_per_s_on_the_fly -- RCE iteration rate WITH
     on-the-fly opacity mixing (RO refresh every 10th iteration).
  6. fluxpass_matrix_gridcells_per_s -- exact Thomas/tridiagonal flux
     solve (flux_calc_method=matrix).
  7. beam_zenith_ms -- zenith-geometry-corrected direct beam pass.
  8. sharding_equality_max_rel -- 8-virtual-device CPU-mesh sanity
     (sharded RCE == single device), run in a subprocess.

``vs_baseline`` of the headline is measured against the first-build fp64
single-chip figure recorded below (the reference publishes no performance
numbers; BASELINE.md).
"""

import json
import os
import subprocess
import sys
import time

# first measured figure (fp64, single chip, unfused jnp pipeline) -- the
# self-baseline all later rounds improve against
BASELINE_CELLS_PER_S = 15.5e6


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
    print(json.dumps(rec), flush=True)


def _salted(a, scale=1e-9):
    """Per-run random relative perturbation (OS entropy, no fixed seed)
    of a benchmark input.  Requests through the device tunnel are
    request-level cached by (executable, input); a bench re-run that
    replays a previous run's exact request pairs measures the cache,
    not the chip (observed: two concurrent runs of identical
    micro-benchmarks reported 24 Tel/s fp32 and 120 TB/s "HBM", 100x
    the honest solo numbers).  A ~1e-9 relative salt on one input makes
    every request of every run unique without perturbing the physics
    or the timing."""
    import numpy as np
    return a * (1.0 + scale * np.random.default_rng().uniform(
        -1.0, 1.0, np.shape(a)))


def _workload(iso=True):
    from helios_tpu.config import HeliosConfig
    from helios_tpu.forward import build_model
    from helios_tpu.io.opacity import synthetic_premixed_table

    table = synthetic_premixed_table(nbin=385, ny=20)
    cfg = HeliosConfig(
        planet="manual", g=2140.0, a=0.03142, R_planet=1.138,
        R_star=0.805, T_star=5040.0, T_intern=100.0,
        scattering="yes", direct_beam="no", convection="no",
        run_type="iterative", iso_input="yes" if iso else "no").finalize()
    return build_model(cfg, table)


def bench_fluxpass(iso=True):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from helios_tpu.forward import forward_fluxes

    phys, arrays = _workload(iso=iso)
    T_lay = jnp.asarray(_salted(np.linspace(1800.0, 600.0, phys.nlayer + 1)))
    K = 50

    @jax.jit
    def fwd(T):
        def body(_, T):
            _flux, totals, _cache = forward_fluxes(phys, arrays, T)
            return T + 1e-12 * totals.F_net   # data-dependent chaining
        return jax.lax.fori_loop(0, K, body, T)

    fwd(T_lay).block_until_ready()
    n_rep = 5
    t0 = time.perf_counter()
    out = T_lay
    for _ in range(n_rep):
        out = fwd(out)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / (n_rep * K)
    return phys.nlayer * phys.nbin * phys.ny / dt


def bench_rce_iterations():
    """Production RCE iteration rate: the radiation while_loop body
    (sweep every step, cell-cache refresh every 10th, temperature
    update + convergence predicates)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from helios_tpu.rce.radiative import radiation_loop

    phys, arrays = _workload(iso=True)
    T0 = jnp.asarray(_salted(np.linspace(1800.0, 600.0, phys.nlayer + 1)))
    K = 150

    run = jax.jit(lambda t: radiation_loop(phys, arrays, None, t,
                                           max_steps=K))
    state = run(T0)
    jax.block_until_ready(state.T_lay)
    assert int(state.it) == K
    t0 = time.perf_counter()
    state = run(T0)
    jax.block_until_ready(state.T_lay)
    dt = time.perf_counter() - t0
    return K / dt


def bench_rce_iterations_noniso():
    """Production-DEFAULT RCE iteration rate: the reference's iterative
    run_type sets iso=0 (read.py:888-895), i.e. the non-isothermal
    half-layer scheme is what a standard HELIOS run executes every
    iteration.  Same loop as rce_iterations_per_s but with the noniso
    sweep kernels."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from helios_tpu.rce.radiative import radiation_loop

    phys, arrays = _workload(iso=False)
    T0 = jnp.asarray(_salted(np.linspace(1800.0, 600.0, phys.nlayer + 1)))
    K = 150

    run = jax.jit(lambda t: radiation_loop(phys, arrays, None, t,
                                           max_steps=K))
    state = run(T0)
    jax.block_until_ready(state.T_lay)
    assert int(state.it) == K
    t0 = time.perf_counter()
    state = run(T0)
    jax.block_until_ready(state.T_lay)
    return K / (time.perf_counter() - t0)


def bench_conv_iterations_noniso():
    """Convective-phase iteration rate in the production-default
    non-isothermal mode (flux solve + convective adjustment +
    conv_temp step, computation.py:992-1174 with iso=0)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from helios_tpu.config import HeliosConfig
    from helios_tpu.forward import build_model
    from helios_tpu.io.opacity import synthetic_premixed_table
    from helios_tpu.rce.loop import convection_loop
    from helios_tpu.rce.radiative import make_const_thermo, radiation_loop

    table = synthetic_premixed_table(nbin=385, ny=20)
    table.kpoints *= 10.0           # optically thick -> convective
    cfg = HeliosConfig(
        planet="manual", g=2288.0, a=0.0153, R_planet=1.0,
        R_star=30.0, T_star=30.0, T_intern=700.0,
        scattering="yes", direct_beam="no", convection="yes",
        kappa_value=0.1, run_type="iterative", iso_input="no",
        p_boa=1e9, p_toa=1e3, adapt_interval=6).finalize()
    phys, arrays = build_model(cfg, table)
    thermo = make_const_thermo(0.1)
    T0 = jnp.asarray(_salted(np.linspace(1500.0, 500.0, phys.nlayer + 1)))

    rad = jax.jit(lambda t: radiation_loop(phys, arrays, thermo, t,
                                           max_steps=60))(T0)
    K = 100
    run = jax.jit(lambda r: convection_loop(phys, arrays, thermo, r,
                                            max_steps=K))
    state = run(rad)
    jax.block_until_ready(state.T_lay)
    assert int(state.it) == K, f"convection exited early at {int(state.it)}"
    t0 = time.perf_counter()
    state = run(rad)
    jax.block_until_ready(state.T_lay)
    return K / (time.perf_counter() - t0)


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
    K = 10

    use_pallas = jax.default_backend() == "tpu"

    @jax.jit
    def mix(T):
        def body(_, T):
            opac, _scat, _mmm = chem.mixed_opacities(
                sset, T, p, wave, gw, gy, ro_method=1, scat=0,
                use_pallas=use_pallas)
            return T + 1e-30 * opac[0, 0, 0]
        return jax.lax.fori_loop(0, K, body, T)

    mix(T).block_until_ready()
    t0 = time.perf_counter()
    mix(T).block_until_ready()
    return (time.perf_counter() - t0) / K * 1e3


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


def bench_rce_iterations_on_the_fly():
    """RCE iteration rate with on-the-fly opacity mixing: the Random
    Overlap refresh runs every 10th iteration inside the while_loop (the
    reference's hot path for unmixed opacities)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from helios_tpu.rce.radiative import radiation_loop

    phys, arrays, sset = _onthefly_workload()
    T0 = jnp.asarray(_salted(np.linspace(1800.0, 600.0, phys.nlayer + 1)))
    K = 100

    run = jax.jit(lambda t: radiation_loop(phys, arrays, None, t,
                                           max_steps=K, sset=sset))
    state = run(T0)
    jax.block_until_ready(state.T_lay)
    assert int(state.it) == K
    t0 = time.perf_counter()
    state = run(T0)
    jax.block_until_ready(state.T_lay)
    return K / (time.perf_counter() - t0)


def bench_conv_iterations():
    """Convective-phase iteration rate: flux solve + device-side
    convective adjustment + conv_temp step (the loop the reference
    round-trips to the host every iteration, computation.py:992-1174)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from helios_tpu.config import HeliosConfig
    from helios_tpu.forward import build_model
    from helios_tpu.io.opacity import synthetic_premixed_table
    from helios_tpu.rce.loop import convection_loop
    from helios_tpu.rce.radiative import make_const_thermo, radiation_loop

    table = synthetic_premixed_table(nbin=385, ny=20)
    table.kpoints *= 10.0           # optically thick -> convective
    cfg = HeliosConfig(
        planet="manual", g=2288.0, a=0.0153, R_planet=1.0,
        R_star=30.0, T_star=30.0, T_intern=700.0,
        scattering="yes", direct_beam="no", convection="yes",
        kappa_value=0.1, run_type="iterative",
        p_boa=1e9, p_toa=1e3, adapt_interval=6).finalize()
    phys, arrays = build_model(cfg, table)
    thermo = make_const_thermo(0.1)
    T0 = jnp.asarray(_salted(np.linspace(1500.0, 500.0, phys.nlayer + 1)))

    rad = jax.jit(lambda t: radiation_loop(phys, arrays, thermo, t,
                                           max_steps=60))(T0)
    K = 100
    run = jax.jit(lambda r: convection_loop(phys, arrays, thermo, r,
                                            max_steps=K))
    state = run(rad)
    jax.block_until_ready(state.T_lay)
    assert int(state.it) == K, f"convection exited early at {int(state.it)}"
    t0 = time.perf_counter()
    state = run(rad)
    jax.block_until_ready(state.T_lay)
    return K / (time.perf_counter() - t0)


def bench_matrix_fluxpass():
    """Exact tridiagonal (Thomas) flux solve throughput
    (flux_calc_method=matrix, the reference's recommended exact
    scattering path, kernels.cu:1803-2426)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from helios_tpu.config import HeliosConfig
    from helios_tpu.forward import build_model, forward_fluxes
    from helios_tpu.io.opacity import synthetic_premixed_table

    table = synthetic_premixed_table(nbin=385, ny=20)
    cfg = HeliosConfig(
        planet="manual", g=2140.0, a=0.03142, R_planet=1.138,
        R_star=0.805, T_star=5040.0, T_intern=100.0,
        scattering="yes", direct_beam="no", convection="no",
        run_type="iterative", iso_input="yes",
        flux_calc_method="matrix").finalize()
    phys, arrays = build_model(cfg, table)
    T_lay = jnp.asarray(_salted(np.linspace(1800.0, 600.0, phys.nlayer + 1)))
    K = 20

    @jax.jit
    def fwd(T):
        def body(_, T):
            _flux, totals, _cache = forward_fluxes(phys, arrays, T)
            return T + 1e-12 * totals.F_net
        return jax.lax.fori_loop(0, K, body, T)

    fwd(T_lay).block_until_ready()
    n_rep = 3
    t0 = time.perf_counter()
    out = T_lay
    for _ in range(n_rep):
        out = fwd(out)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / (n_rep * K)
    return phys.nlayer * phys.nbin * phys.ny / dt


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
    rng = np.random.default_rng(0)
    dtau = jnp.asarray(_salted(np.exp(rng.normal(-2.0, 1.0, (L, S)))))
    z_lay = jnp.asarray(np.sort(rng.uniform(0.0, 5e8, L)))
    planck_star = jnp.asarray(rng.uniform(1e3, 1e5, S))

    from helios_tpu.ops.beam import _mu_star_matrix
    mu_mat = _mu_star_matrix(z_lay, -0.2, 7e9, 1, L + 1, dtau.dtype)
    mask = (jnp.arange(L)[None, :] >= jnp.arange(L + 1)[:, None])
    W = jnp.where(mask, 1.0 / mu_mat, 0.0)

    K = 20

    @jax.jit
    def beam(dt):
        def body(_, dt):
            F = fp.fdir_iso_flat(planck_star, dt, W, mu_star=-0.2,
                                 R_star=7e10, a=1.5e12, dir_beam=1)
            return dt + 1e-30 * F[0]
        return jax.lax.fori_loop(0, K, body, dt)

    beam(dtau).block_until_ready()
    t0 = time.perf_counter()
    beam(dtau).block_until_ready()
    return (time.perf_counter() - t0) / K * 1e3


# --------------------------------------------------------------------------- #
# roofline: measured hardware ceilings + analytic kernel cost models
# --------------------------------------------------------------------------- #
#
# The self-baseline (BASELINE_CELLS_PER_S) says how much faster the build
# got; these metrics say how close the hot kernels sit to what the chip
# can do AT ALL.  Ceilings are MEASURED on the same chip (no spec-sheet
# constants):
#
#   * fp32 fma VMEM-streaming rate: one fma per element per VMEM
#     round-trip, the access pattern of a streaming elementwise kernel.
#     (219.7 Gel/s x 8 B/element == 1.76 TB/s of VMEM traffic, i.e. this
#     chain is VMEM-limited, NOT the raw ALU issue rate.  A true
#     register-resident issue-rate measurement is not reachable through
#     this stack: any register-carried fma chain with loop-constant
#     coefficients is an iterated affine map and gets collapsed by the
#     compiler -- measured "rates" come out 10-100x above any plausible
#     ALU width with call times flat at the ~27 us dispatch floor.)
#   * df64 fma VMEM-streaming rate -- the EXACT primitive AND access
#     pattern of the sweep kernels (ops.df64.fma on hi/lo pairs staged
#     through VMEM), so sweep utilization = (exact df64 fma count) /
#     time / ceiling with no instruction-count modeling;
#   * HBM streaming bandwidth (20 chained full-array passes).
#
# The RO kernel is heterogeneous (int32 bitonic stages + df64 cumsum/
# rebin) and its hot loop is sublane rotations + selects, a pattern with
# no honest single-number ceiling; instead of a modeled utilization
# percentage the bench MEASURES the sort's share directly with the
# kernel's stage-skipping hook (ro_sort_ms / ro_sort_pct below).
# _ro_model_instr (the per-element instruction model, df64 op costs from
# ops/df64.py) is kept for the modeled aggregate instruction throughput
# ro_mix_modeled_gops -- a sanity figure, ~2 modeled vector-lane ops per
# cycle-equivalent, quoted with the model's ~2x uncertainty.
#
# Arithmetic intensity of the sweep kernels (16 df64 fma / 56 B per cell
# iso, 41 / 112 noniso) puts both far above the machine balance
# (measured df64-fma/s / HBM B/s ~ 0.1 fma/B), i.e. they are
# compute-bound: HBM is not the binding wall.

# Methodology note: every micro-benchmark below CHAINS its calls (each
# call's output is the next call's input).  Unchained identical calls
# get collapsed somewhere in the stack (request-level caching through
# the device tunnel) and report physically impossible rates (e.g.
# 74 TB/s "HBM bandwidth").  The XLA-level HBM benchmark additionally
# passes its trip count as a traced argument so the per-iteration
# full-array passes cannot be unrolled and fused into one.

def _vpu_peak():
    """Measured fp32 fma VMEM-streaming rate [elements/s]: x = a*x + b
    over a VMEM-resident [512, 1024] array, one fma per element per
    VMEM round-trip -- the sustained rate of a streaming elementwise
    kernel (VMEM-limited; see the section comment for why a raw ALU
    issue rate is not measurable through this stack)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    reps, shape = 2000, (512, 1024)

    def kernel(x_ref, o_ref):
        a = np.float32(0.9999999)
        b = np.float32(1e-7)
        o_ref[:, :] = jax.lax.fori_loop(
            np.int32(0), np.int32(reps), lambda i, x: a * x + b,
            x_ref[:, :])

    x = jnp.asarray(_salted(np.full(shape, 0.5)).astype(np.float32))
    with jax.enable_x64(False):
        f = jax.jit(lambda x: pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x))
    x = f(x)
    x.block_until_ready()
    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        x = f(x)
    x.block_until_ready()
    dt = (time.perf_counter() - t0) / iters
    return shape[0] * shape[1] * reps / dt


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

    xh = jnp.asarray(_salted(np.full(shape, 0.5)).astype(np.float32))
    xl = jnp.zeros(shape, jnp.float32)
    with jax.enable_x64(False):
        f = jax.jit(lambda xh, xl: pl.pallas_call(
            kernel,
            out_shape=(jax.ShapeDtypeStruct(shape, jnp.float32),) * 2,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),) * 2,
        )(xh, xl))
    xh, xl = f(xh, xl)
    jax.block_until_ready((xh, xl))
    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        xh, xl = f(xh, xl)
    jax.block_until_ready((xh, xl))
    dt = (time.perf_counter() - t0) / iters
    return shape[0] * shape[1] * reps / dt


def _hbm_bw():
    """Measured HBM streaming bandwidth [B/s]: chained elementwise
    passes over 128 MB; the trip count is a traced argument so the
    while-loop body (one full read + write per iteration) cannot be
    unrolled and fused."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    n = 32 * 1024 * 1024
    reps = 20
    x = jnp.asarray(_salted(np.ones(n)).astype(np.float32))
    f = jax.jit(lambda x, r: jax.lax.fori_loop(
        0, r,
        lambda i, y: y * np.float32(1.0000001) + np.float32(1e-6), x))
    x = f(x, reps)
    x.block_until_ready()
    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        x = f(x, reps)
    x.block_until_ready()
    dt = (time.perf_counter() - t0) / iters
    return 2 * n * 4 * reps / dt


_DF_MUL, _DF_ADD = 19, 11     # fp32 ALU ops per df64 op (ops/df64.py)


def _time_chained(f, x0, K, n_rep=5):
    import jax
    out = f(x0)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n_rep):
        out = f(out)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / (n_rep * K)


def _bench_sweep_kernel(iso: bool):
    """Isolated fused df64 sweep solve on the production shape; returns
    (seconds per solve, modeled VPU instructions per solve)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from helios_tpu.kernels.sweep_pallas import (
        fused_iso_sweep_df64_pairs, fused_noniso_sweep_df64_pairs)
    from helios_tpu.ops import df64

    L, S, P = 105, 385 * 20, 4
    rng = np.random.default_rng()   # per-run entropy (see _salted)

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
    K = 30

    if iso:
        @jax.jit
        def run(fup):
            def body(_, fup):
                fd, fu = fused_iso_sweep_df64_pairs(
                    a, b, sd, su, toa, refl, emis, fdir0, fup,
                    n_passes=P)
                return fu
            return jax.lax.fori_loop(0, K, body, fup)
        dt = _time_chained(run, fup0, K)
        # per pass per cell: 2x (vectorized source fma + sequential fma)
        instr = L * S * P * 4
    else:
        al = df((L, S), 0.3, 0.8)
        bl = df((L, S), 0.0, 0.1)
        sld = df((L, S), 0.0, 1e3)
        slu = df((L, S), 0.0, 1e3)
        fcup0 = df((L, S), 0.0, 1e4)

        @jax.jit
        def run(carry):
            def body(_, carry):
                fup, fcup = carry
                fd, fu, fcd, fcu = fused_noniso_sweep_df64_pairs(
                    a, b, sd, su, al, bl, sld, slu, toa, refl, emis,
                    fdir0, fup, fcup, n_passes=P)
                return fu, fcu
            return jax.lax.fori_loop(0, K, body, carry)
        dt = _time_chained(run, (fup0, fcup0), K)
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


def _ro_kernel_ms(skip: str) -> float:
    """Time the raw RO Pallas kernel at the production cell shape
    (105 x 385 x 20), optionally with a pipeline stage skipped via the
    kernel's `skip` hook ("" = full kernel, "sort" = bitonic network
    elided).  Chained calls (output feeds the next input's mantissa
    perturbation) defeat request-level caching."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from helios_tpu.io.opacity import gauss_legendre_ypoints
    from helios_tpu.kernels.ro_pallas import random_overlap_mix_pallas

    ny, L, B = 20, 105, 385
    gy, gw = gauss_legendre_ypoints(ny)
    rng = np.random.default_rng()   # per-run entropy (see _salted)
    m = jnp.asarray(np.sort(10.0 ** rng.uniform(-8, 2, (L, B, ny)),
                            axis=-1))
    n = jnp.asarray(np.sort(10.0 ** rng.uniform(-8, 2, (L, B, ny)),
                            axis=-1))
    gyj, gwj = jnp.asarray(gy), jnp.asarray(gw)
    K = 10

    @jax.jit
    def run(mm):
        def body(_, mm):
            out = random_overlap_mix_pallas(mm, n, gwj, gyj, skip=skip)
            return mm * (1.0 + 1e-30 * out[0, 0, 0])
        return jax.lax.fori_loop(0, K, body, mm)

    run(m).block_until_ready()
    t0 = time.perf_counter()
    run(m).block_until_ready()
    return (time.perf_counter() - t0) / K * 1e3


def bench_roofline():
    """Measured ceilings + per-kernel utilization; returns a list of
    (metric, value, unit) tuples."""
    import jax

    if jax.default_backend() != "tpu":
        return [("roofline_skipped_no_tpu", 1, "flag")]

    out = []

    def attempt(fn, *names):
        try:
            vals = fn()
        except Exception as e:
            print(json.dumps({"metric": names[0][0],
                              "error": str(e)[:200]}), flush=True)
            return [None] * len(names)
        vals = vals if isinstance(vals, tuple) else (vals,)
        for (name, unit), v in zip(names, vals):
            if v is not None:
                out.append((name, v, unit))
        return list(vals)

    attempt(lambda: round(_vpu_peak() / 1e9, 1),
            ("vpu_fma_stream_measured", "Gel/s"))
    (df64_peak,) = attempt(lambda: round(_vpu_df64_fma_peak() / 1e9, 2),
                           ("vpu_df64_fma_stream_measured", "Gop/s"))
    attempt(lambda: round(_hbm_bw() / 1e9, 1), ("hbm_bw_measured", "GB/s"))

    # sweeps: exact df64-fma counts vs the measured df64-fma ceiling --
    # workload and ceiling in the same unit, no instruction model needed
    for iso, label in ((True, "iso"), (False, "noniso")):
        def sweep(iso=iso):
            dt, fmas = _bench_sweep_kernel(iso=iso)
            pct = (round(100.0 * fmas / dt / (df64_peak * 1e9), 1)
                   if df64_peak else None)
            return round(dt * 1e3, 3), pct
        attempt(sweep, (f"sweep_{label}_solve_ms", "ms"),
                (f"sweep_{label}_df64_pct", "%"))

    # RO: no honest single-number ceiling exists for its rotate+select
    # hot loop, so measure the bitonic sort's share directly with the
    # kernel's stage-skipping hook, and report the modeled aggregate
    # instruction throughput as a sanity figure (~2x model uncertainty).
    def ro_sort_share():
        full = _ro_kernel_ms("")
        no_sort = _ro_kernel_ms("sort")
        sort_ms = full - no_sort
        gops = _ro_model_instr() / (full * 1e-3) / 1e9
        return (round(sort_ms, 2), round(100.0 * sort_ms / full, 1),
                round(gops, 0))
    attempt(ro_sort_share, ("ro_sort_ms", "ms"), ("ro_sort_pct", "%"),
            ("ro_mix_modeled_gops", "Gop/s"))
    return out


def bench_sharding_subprocess():
    """8-virtual-CPU-device mesh sanity: sharded production RCE == single
    device (run in a subprocess so the CPU platform flag doesn't clash
    with the TPU main process)."""
    code = r"""
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
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["PYTHONPATH"] = os.path.dirname(os.path.abspath(__file__)) + (
        ":" + env["PYTHONPATH"] if "PYTHONPATH" in env else "")
    try:
        out = subprocess.run([sys.executable, "-c", code], env=env,
                             capture_output=True, text=True, timeout=420)
        rec = json.loads(out.stdout.strip().splitlines()[-1])
        return rec["sharded_T_max_rel"]
    except Exception:
        return None


def main():
    _enable_cache()
    import jax  # noqa: F401  (initialize backend after cache config)

    cells = bench_fluxpass(iso=True)
    _emit("fluxpass_gridcells_per_s_per_chip", round(cells, 1), "cells/s",
          cells / BASELINE_CELLS_PER_S)

    try:
        _emit("rce_iterations_per_s", bench_rce_iterations(), "it/s")
    except Exception as e:
        print(json.dumps({"metric": "rce_iterations_per_s",
                          "error": str(e)[:200]}), flush=True)

    try:
        cells_n = bench_fluxpass(iso=False)
        _emit("fluxpass_noniso_gridcells_per_s", round(cells_n, 1),
              "cells/s")
    except Exception as e:
        print(json.dumps({"metric": "fluxpass_noniso_gridcells_per_s",
                          "error": str(e)[:200]}), flush=True)

    for name, fn, unit in [
            ("rce_iterations_per_s_noniso", bench_rce_iterations_noniso,
             "it/s"),
            ("conv_iterations_per_s_noniso", bench_conv_iterations_noniso,
             "it/s"),
            ("ro_mix_ms", bench_ro_mix, "ms"),
            ("rce_iterations_per_s_on_the_fly",
             bench_rce_iterations_on_the_fly, "it/s"),
            ("conv_iterations_per_s", bench_conv_iterations, "it/s"),
            ("fluxpass_matrix_gridcells_per_s", bench_matrix_fluxpass,
             "cells/s"),
            ("beam_zenith_ms", bench_beam_zenith, "ms")]:
        try:
            _emit(name, fn(), unit)
        except Exception as e:
            print(json.dumps({"metric": name, "error": str(e)[:200]}),
                  flush=True)

    try:
        for name, value, unit in bench_roofline():
            _emit(name, value, unit)
    except Exception as e:
        print(json.dumps({"metric": "roofline", "error": str(e)[:200]}),
              flush=True)

    rel = bench_sharding_subprocess()
    if rel is not None:
        _emit("sharding_equality_max_rel", rel, "rel")


if __name__ == "__main__":
    main()
