"""Compiled-Mosaic regression tests: the fused Pallas kernels vs their
XLA oracles ON REAL TPU HARDWARE (VERDICT r2 item 8; round-1 task 9).

These are skipped on CPU -- the interpret-mode tests in test_pallas.py /
test_df64.py cover tracing semantics, but only these exercise the
compiled Mosaic path.  Run on a TPU-visible session with:
    PYTHONPATH=. pytest tests/test_pallas_tpu.py -m tpu --no-header -q
(conftest.py pins the test suite to CPU, so the TPU run must bypass it:
 JAX_PLATFORMS= python -m pytest ... after removing the pin, or simply
 `python tests/test_pallas_tpu.py` which self-configures.)
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

tpu_only = pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="compiled Mosaic kernels need a real TPU chip")


@pytest.mark.tpu
@tpu_only
def test_compiled_iso_sweep_df64():
    import sys
    sys.path.insert(0, __file__.rsplit("/", 1)[0])
    from test_sweep import make_cells

    from helios_tpu.kernels.sweep_pallas import fband_iso_pallas
    from helios_tpu.ops import sweep as sweep_ops

    rng = np.random.default_rng(7)
    # production-like tile shapes: Mosaic's layout inference CHECK-fails
    # on tiny sub-lane-width spectral extents (layout.h:320)
    L, B, Y = 40, 128, 4
    cells, arr, par = make_cells(rng, L, B, Y, scat_corr=1)
    nint = L + 1
    planckband_lay = rng.uniform(1e2, 1e4, (L + 2, B))
    F_dir = -rng.uniform(0.0, 1e3, (nint, B, Y))
    surf_albedo = rng.uniform(0.0, 0.5, B)
    F_up0 = rng.uniform(0, 1e3, (nint, B, Y))
    kw = dict(n_passes=4, scat_corr=1, i2s_transition=par["i2s"],
              epsi=par["epsi"], mu_star=par["mu_star"], dir_beam=0,
              f_factor=0.5, R_star=7e10, a=1.5e12)

    want = sweep_ops.fband_iso(
        cells, jnp.asarray(planckband_lay), jnp.asarray(F_dir),
        jnp.asarray(surf_albedo), jnp.asarray(F_up0), **kw)
    got = fband_iso_pallas(
        cells, jnp.asarray(planckband_lay), jnp.asarray(F_dir),
        jnp.asarray(surf_albedo), jnp.asarray(F_up0), **kw)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=5e-11)


@pytest.mark.tpu
@tpu_only
def test_compiled_random_overlap():
    from helios_tpu.kernels.ro_pallas import random_overlap_mix_pallas
    from helios_tpu.ops import mixing as mix_ops

    rng = np.random.default_rng(3)
    ny, L, B = 20, 8, 16
    a = np.sort(np.exp(rng.normal(0, 4, (L, B, ny))), axis=-1)
    b = np.sort(np.exp(rng.normal(0, 4, (L, B, ny))), axis=-1)
    gy_, gw_ = np.polynomial.legendre.leggauss(ny)
    gy = jnp.asarray((gy_ + 1) / 2)
    gw = jnp.asarray(gw_)
    want = np.asarray(mix_ops.random_overlap_mix(
        jnp.asarray(a), jnp.asarray(b), gw, gy))
    got = np.asarray(random_overlap_mix_pallas(
        jnp.asarray(a), jnp.asarray(b), gw, gy))
    np.testing.assert_allclose(got, want, rtol=1e-9)


def _random_noniso_coeffs(rng, L, S, dtype):
    """Contraction-stable random FlatNonIsoCoeffs (|a|,|b| < 0.5 keeps the
    4-pass iteration bounded); parity target is the lax.scan path."""
    from helios_tpu.fastpath import FlatNonIsoCoeffs

    u = lambda lo, hi, shape: jnp.asarray(
        rng.uniform(lo, hi, shape).astype(dtype))
    return FlatNonIsoCoeffs(
        a_up=u(0.1, 0.45, (L, S)), b_up=u(0.0, 0.4, (L, S)),
        src_up_down=u(-1e2, 1e3, (L, S)), src_up_up=u(-1e2, 1e3, (L, S)),
        a_low=u(0.1, 0.45, (L, S)), b_low=u(0.0, 0.4, (L, S)),
        src_low_down=u(-1e2, 1e3, (L, S)), src_low_up=u(-1e2, 1e3, (L, S)),
        boa_refl=u(0.0, 0.5, (S,)), boa_emis=u(0.0, 1e3, (S,)),
        toa=u(0.0, 1e3, (S,)))


@pytest.mark.tpu
@tpu_only
@pytest.mark.parametrize("dtype,S,rtol,atol", [
    (np.float64, 512, 5e-11, 1e-8),   # df64 kernel, aligned tiles
    (np.float64, 500, 5e-11, 1e-8),   # padded tile (S=500 -> s_pad=512)
    # fp32 kernel, padded tile.  rtol 3e-4 with a SCALE-AWARE atol: the
    # 105-layer recurrence accumulates ~1e3 rounding steps at f32 eps
    # on fluxes of order 1e3, so near-zero cells carry absolute noise
    # ~1e-5 that makes any pure-rtol check a coin flip (observed single-
    # element flakes: rel 2.0e-4 on a ~40 flux, then rel 1.8e-3 on a
    # 4e-3 flux with abs diff 7.6e-6).  Not a logic difference -- the
    # df64 production path holds 5e-11 on the same shapes.
    (np.float32, 2048 + 384, 3e-4, 0.05),
])
def test_compiled_noniso_sweep(dtype, S, rtol, atol):
    """The production-default (non-isothermal) fused kernels on compiled
    Mosaic, incl. padded-tile shapes (VERDICT r3 item 5)."""
    from helios_tpu import fastpath as fp

    rng = np.random.default_rng(11)
    L = 105
    C = _random_noniso_coeffs(rng, L, S, dtype)
    F_dir0 = jnp.asarray(-rng.uniform(0, 1e3, S).astype(dtype))
    F_up_prev = jnp.asarray(rng.uniform(0, 1e3, (L + 1, S)).astype(dtype))
    Fc_up_prev = jnp.asarray(rng.uniform(0, 1e3, (L, S)).astype(dtype))

    want = fp.fband_noniso_flat(C, F_dir0, F_up_prev, Fc_up_prev,
                                n_passes=4, use_pallas=False)
    got = fp.fband_noniso_flat(C, F_dir0, F_up_prev, Fc_up_prev,
                               n_passes=4, use_pallas=True)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=rtol, atol=atol)


@pytest.mark.tpu
@tpu_only
def test_compiled_iso_sweep_padded_tile():
    """Padded-tile iso df64 case: S=7700 (the flagship 385x20 grid) is not
    a multiple of the 512-lane tile; pad boundaries must not leak."""
    from helios_tpu.kernels.sweep_pallas import (fused_iso_sweep_df64,
                                                 fused_iso_sweep)

    rng = np.random.default_rng(13)
    L, S = 105, 7700
    mk = lambda lo, hi, shape: jnp.asarray(rng.uniform(lo, hi, shape))
    a = mk(0.1, 0.45, (L, S))
    b = mk(0.0, 0.4, (L, S))
    sd = mk(-1e2, 1e3, (L, S))
    su = mk(-1e2, 1e3, (L, S))
    toa = mk(0, 1e3, (S,))
    refl = mk(0, 0.5, (S,))
    emis = mk(0, 1e3, (S,))
    fdir0 = -mk(0, 1e3, (S,))
    fup0 = mk(0, 1e3, (L + 1, S))

    got = fused_iso_sweep_df64(a, b, sd, su, toa, refl, emis, fdir0,
                               fup0, n_passes=4)
    # oracle: the same solve on an aligned lane-width slice of the data
    want = fused_iso_sweep_df64(a[:, :512], b[:, :512], sd[:, :512],
                                su[:, :512], toa[:512], refl[:512],
                                emis[:512], fdir0[:512], fup0[:, :512],
                                n_passes=4)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g)[:, :512], np.asarray(w),
                                   rtol=1e-12)


@pytest.mark.tpu
@tpu_only
def test_compiled_thomas_solve():
    from helios_tpu.ops.thomas import thomas_solve

    rng = np.random.default_rng(5)
    n, S = 212, 500
    c = jnp.asarray(rng.uniform(-0.4, 0.4, (n, S)))
    c = c.at[-1].set(0.0)
    b = jnp.asarray(rng.uniform(1.0, 2.0, (n, S)))
    d = jnp.asarray(rng.uniform(-1e3, 1e3, (n, S)))
    want = np.asarray(thomas_solve(b, c, d))
    got = np.asarray(thomas_solve(b, c, d, use_pallas=True))
    np.testing.assert_allclose(got, want, rtol=1e-9)


if __name__ == "__main__":
    # standalone TPU runner (bypasses conftest's CPU pin); persistent
    # compilation cache (same setup as bench.py) -- a cold run spends
    # >10 min in Mosaic compiles otherwise
    import os
    _cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    jax.config.update("jax_enable_x64", True)
    test_compiled_iso_sweep_df64()
    test_compiled_random_overlap()
    test_compiled_thomas_solve()
    test_compiled_noniso_sweep(np.float64, 512, 5e-11, 1e-8)
    test_compiled_noniso_sweep(np.float64, 500, 5e-11, 1e-8)
    test_compiled_noniso_sweep(np.float32, 2048 + 384, 3e-4, 0.05)
    test_compiled_iso_sweep_padded_tile()
    print("compiled-Mosaic parity OK on", jax.devices())
