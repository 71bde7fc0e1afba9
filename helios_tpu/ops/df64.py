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


def neg(a: DF) -> DF:
    return DF(-a.hi, -a.lo)


def sub(a: DF, b: DF) -> DF:
    return add(a, neg(b))


def div(a: DF, b: DF) -> DF:
    """df64 division: one fp32 quotient estimate + one df64 residual
    refinement (relative error ~2^-45)."""
    q0 = a.hi / b.hi
    # r = a - q0*b in df64 (q0 is exact fp32)
    p, e = two_prod(q0, b.hi)
    s, se = two_sum(a.hi, -p)
    r = s + (se + a.lo - e - q0 * b.lo)
    q1 = r / b.hi
    return DF(*quick_two_sum(q0, q1))


def sqrt(a: DF) -> DF:
    """df64 square root: fp32 estimate + one df64 Newton step
    (24 -> ~48 correct bits).  a must be >= 0; returns 0 for hi <= 0."""
    hi = jnp.maximum(a.hi, 0.0)
    s0 = jnp.sqrt(hi)
    safe = jnp.where(s0 > 0.0, s0, 1.0)
    d = div(DF(hi, jnp.where(s0 > 0.0, a.lo, 0.0)), DF(safe, 0.0))
    s, e = two_sum(safe, d.hi)
    half = DF(0.5 * s, 0.5 * (e + d.lo))
    zero = s0 <= 0.0
    return DF(jnp.where(zero, 0.0, half.hi), jnp.where(zero, 0.0, half.lo))


# ln(2) as a two-float32 pair (hi rounds f64 ln2 to f32; lo the remainder)
_LN2 = 0.6931471805599453094172321
_LN2_HI = 0.6931471824645996     # float32(ln2)
_LN2_LO = _LN2 - _LN2_HI         # ~ -1.9e-9
_INV_LN2 = 1.4426950408889634
# 1/n! for the exp(r) Taylor series, |r| <= ln2/2, split into f32 pairs
_EXP_COEFFS = []
_f = 1.0
for _n in range(13, 0, -1):
    _f = 1.0
    for _i in range(2, _n + 1):
        _f *= _i
    c = 1.0 / _f
    import numpy as _np
    c_hi = float(_np.float32(c))
    _EXP_COEFFS.append((c_hi, c - c_hi))
del _f, _n, _i, c, c_hi


def exp(a: DF) -> DF:
    """df64 exponential via range reduction exp(a) = 2^k * exp(r),
    r = a - k*ln2 with |r| <= ln2/2, Taylor series in df64.

    The result is flushed to 0 where exp(a) underflows float32
    (a < ~-87) and clamped where it would overflow (a > ~88) -- the
    double-float representation cannot hold values outside the fp32
    exponent range (same flush the hi/lo split applies to any fp64
    input).  Relative accuracy ~1e-13 for results inside [2^-102, 2^102]
    (|a| <~ 70); below that the lo limb goes float32-subnormal and
    accuracy degrades gracefully to fp32's ~6e-8 -- physically irrelevant
    for the transmission use (such layers are opaque to 31 decades).
    Safe inside Pallas kernels.
    """
    k = jnp.round(a.hi * jnp.float32(_INV_LN2))
    # r = a - k*ln2 in df64; k is an exact small float32
    kl2 = scale(DF(jnp.float32(_LN2_HI) * jnp.ones_like(a.hi),
                   jnp.float32(_LN2_LO) * jnp.ones_like(a.hi)), k)
    r = sub(a, kl2)

    # Horner over 1/13! .. 1/1!, then +1
    acc = DF(jnp.full_like(a.hi, _EXP_COEFFS[0][0]),
             jnp.full_like(a.hi, _EXP_COEFFS[0][1]))
    for c_hi, c_lo in _EXP_COEFFS[1:]:
        acc = fma(acc, r, DF(jnp.full_like(a.hi, c_hi),
                             jnp.full_like(a.hi, c_lo)))
    acc = fma(acc, r, const(1.0, a.hi))

    # 2^k by exponent-bit construction (exact scaling)
    import jax as _jax
    ki = jnp.clip(k, -126.0, 127.0).astype(jnp.int32)
    two_k = _jax.lax.bitcast_convert_type(
        ((ki + jnp.int32(127)) << jnp.int32(23)), jnp.float32)
    out = DF(acc.hi * two_k, acc.lo * two_k)

    lo_flush = a.hi < -87.3
    hi_clamp = a.hi > 88.0
    big = 3.0e38
    out_hi = jnp.where(lo_flush, 0.0, jnp.where(hi_clamp, big, out.hi))
    out_lo = jnp.where(lo_flush | hi_clamp, 0.0, out.lo)
    return DF(out_hi, out_lo)


def lt(a: DF, b: DF):
    """a < b, lexicographic on the normalized (hi, lo) pair."""
    return (a.hi < b.hi) | ((a.hi == b.hi) & (a.lo < b.lo))


def where(cond, a: DF, b: DF) -> DF:
    return DF(jnp.where(cond, a.hi, b.hi), jnp.where(cond, a.lo, b.lo))


def minimum(a: DF, b: DF) -> DF:
    return where(lt(a, b), a, b)


def maximum(a: DF, b: DF) -> DF:
    return where(lt(a, b), b, a)
