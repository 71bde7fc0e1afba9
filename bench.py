"""Headline benchmark: spectral-grid throughput of the flux pipeline.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Workload matches the reference default (BASELINE.md): 105 layers x 385
bins x 20 Gauss points, premixed table, full forward flux pipeline
(opacity interpolation -> transmission -> direct beam -> two-stream sweep
-> spectral integration) per pass.  ``vs_baseline`` is measured against
the first-build fp64 single-chip figure recorded below (the reference
publishes no performance numbers; BASELINE.md).
"""

import json
import os
import sys
import time

# first measured figure (fp64, single chip, unfused jnp pipeline) -- the
# self-baseline all later rounds improve against
BASELINE_CELLS_PER_S = 15.5e6


def main():
    import jax
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

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
        run_type="iterative", iso_input="yes").finalize()
    phys, arrays = build_model(cfg, table)

    T_lay = jnp.asarray(np.linspace(1800.0, 600.0, phys.nlayer + 1))

    # K passes chained inside one jit, exactly like the production RCE
    # loop (a device-side lax.while_loop): measures device throughput,
    # not host dispatch latency
    K = 50

    @jax.jit
    def fwd(T):
        def body(_, T):
            _flux, totals, _cache = forward_fluxes(phys, arrays, T)
            return T + 1e-12 * totals.F_net   # data-dependent chaining
        return jax.lax.fori_loop(0, K, body, T)

    # warmup/compile
    fwd(T_lay).block_until_ready()

    n_rep = 5
    t0 = time.perf_counter()
    out = T_lay
    for _ in range(n_rep):
        out = fwd(out)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / (n_rep * K)

    cells = phys.nlayer * phys.nbin * phys.ny
    value = cells / dt
    print(json.dumps({
        "metric": "fluxpass_gridcells_per_s_per_chip",
        "value": round(value, 1),
        "unit": "cells/s",
        "vs_baseline": round(value / BASELINE_CELLS_PER_S, 3),
    }))


if __name__ == "__main__":
    main()
