"""Double-float32 ("df64") arithmetic: fp64-class accuracy from fp32 pairs.

TPU VPUs have no fp64 datapath; XLA emulates fp64 elementwise ops ~5-15x
slower than fp32, and Mosaic (Pallas) does not lower fp64 at all.  A value
represented as an unevaluated sum hi + lo of two float32 carries ~49
mantissa bits (vs 53 for fp64), and every operation below runs on native
fp32 vectors.  This is the TPU-native replacement for the fp64 arithmetic
of the reference's CUDA kernels (source/kernels.cu:24-42 `utype`): the
flux sweep in df64 matches the fp64 oracle to ~1e-13 relative (see
tests/test_pallas.py) while running at near-fp32 speed.

All functions work on plain jnp arrays and are safe inside Pallas kernels
(no captured tracers/constants; Python-float literals only).

Classic error-free transformations: Dekker (1971) two_prod with a 2^12+1
Veltkamp split (fp32 has a 24-bit mantissa), Knuth two_sum.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp

# Veltkamp splitter for binary32: 2^ceil(24/2) + 1
_SPLIT = 4097.0


class DF(NamedTuple):
    """A double-float value hi + lo, both float32, |lo| <= ulp(hi)/2."""
    hi: jnp.ndarray
    lo: jnp.ndarray


def two_sum(a, b) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Knuth: s + e == a + b exactly (no ordering requirement)."""
    s = a + b
    v = s - a
    e = (a - (s - v)) + (b - v)
    return s, e


def quick_two_sum(a, b) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Dekker: s + e == a + b exactly, REQUIRES |a| >= |b|."""
    s = a + b
    e = b - (s - a)
    return s, e


def two_prod(a, b) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """p + e == a * b exactly (Dekker/Veltkamp split form).

    The split form survives XLA/Mosaic because the sequence
    (a*SPLIT) - ((a*SPLIT) - a) only contains same-input subtractions the
    compiler cannot legally reassociate under default (non-fast-math)
    semantics.
    """
    p = a * b
    ah = (a * _SPLIT) - ((a * _SPLIT) - a)
    al = a - ah
    bh = (b * _SPLIT) - ((b * _SPLIT) - b)
    bl = b - bh
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


def add(a: DF, b: DF) -> DF:
    """df64 addition (sloppy variant: ~1e-12 worst case relative, 7 flops
    cheaper than the accurate one; ample for flux accumulation)."""
    sh, se = two_sum(a.hi, b.hi)
    return DF(*quick_two_sum(sh, se + a.lo + b.lo))


def mul(a: DF, b: DF) -> DF:
    p, e = two_prod(a.hi, b.hi)
    return DF(*quick_two_sum(p, e + (a.hi * b.lo + a.lo * b.hi)))


def fma(a: DF, x: DF, b: DF) -> DF:
    """a*x + b in df64 (the flux-recurrence step)."""
    return add(mul(a, x), b)


def scale(a: DF, s) -> DF:
    """Multiply by an exactly-representable fp32 scalar/array s."""
    p, e = two_prod(a.hi, s)
    return DF(*quick_two_sum(p, e + a.lo * s))


def split(x) -> DF:
    """fp64 array -> df64 pair (keeps ~49 of 53 mantissa bits)."""
    hi = x.astype(jnp.float32)
    lo = (x - hi.astype(x.dtype)).astype(jnp.float32)
    return DF(hi, lo)


def combine(a: DF, dtype=jnp.float64):
    """df64 pair -> fp64 array."""
    return a.hi.astype(dtype) + a.lo.astype(dtype)


def const(x, like) -> DF:
    """Python float -> df64 with zero lo, shaped/broadcast like `like`."""
    return DF(jnp.full_like(like, x), jnp.zeros_like(like))
