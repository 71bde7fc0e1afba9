#!/usr/bin/env python3
"""Micro-benchmark for the Random-Overlap Pallas kernel (dev tool).

Times one random_overlap_mix_pallas pass on the flagship 105x385x20 cell
shape on whatever backend is available.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

cache_dir = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
jax.config.update("jax_enable_x64", True)


def main():
    from helios_tpu.kernels.ro_pallas import random_overlap_mix_pallas
    from helios_tpu.io.opacity import gauss_legendre_ypoints
    from helios_tpu.ops import mixing as mix_ops

    ny, L, B = 20, 105, 385
    gy, gw = gauss_legendre_ypoints(ny)
    rng = np.random.default_rng(0)
    m = jnp.asarray(np.sort(10.0 ** rng.uniform(-8, 2, (L, B, ny)), axis=-1))
    n = jnp.asarray(np.sort(10.0 ** rng.uniform(-8, 2, (L, B, ny)), axis=-1))
    gy = jnp.asarray(gy)
    gw = jnp.asarray(gw)

    tile_c = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    skips = sys.argv[2].split("+") if len(sys.argv) > 2 else [""]

    for skip in skips:
        f = jax.jit(lambda a, b: random_overlap_mix_pallas(
            a, b, gw, gy, tile_c=tile_c, skip=skip))
        t0 = time.time()
        out = jax.block_until_ready(f(m, n))
        print(f"[skip={skip!r}] compile+first: {time.time() - t0:.1f}s "
              f"tile_c={tile_c}", flush=True)

        if not skip:
            want = mix_ops.random_overlap_mix(m[:4], n[:4], gw, gy)
            rel = (np.abs(np.asarray(out[:4]) - np.asarray(want))
                   / np.asarray(want))
            print(f"max rel err vs fp64 oracle (4 layers): {rel.max():.3e}")

        reps = 20
        t0 = time.time()
        for _ in range(reps):
            out = f(m, n)
        jax.block_until_ready(out)
        dt = (time.time() - t0) / reps * 1e3
        print(f"[skip={skip!r}] ro pass: {dt:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
