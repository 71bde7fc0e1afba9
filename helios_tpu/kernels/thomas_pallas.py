"""Pallas df64 tridiagonal (Thomas) solver.

The matrix flux method (reference fband_matrix_iso/noniso,
source/kernels.cu:1803-2426) solves one tridiagonal system per spectral
column, sequential in the 2(L+1) (iso) or 4(L+1)-2 (noniso) matrix rows
and embarrassingly parallel across the flattened spectral axis.  The
XLA `lax.scan` formulation in fp64 launches 2n tiny emulated-fp64 ops
whose latency dominates; this kernel keeps the whole forward
elimination + back substitution resident in VMEM per spectral tile, in
df64 (two-float32) arithmetic -- the same recipe as the fused sweep
kernels (kernels/sweep_pallas.py).

System convention (ops/thomas.py:34-41): diagonal b, super-diagonal c,
sub-diagonal a_i = c_{i-1}, rhs d.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from helios_tpu.ops import df64
from helios_tpu.ops.df64 import DF


def _thomas_kernel_df64(bh_ref, bl_ref, ch_ref, cl_ref, dh_ref, dl_ref,
                        xh_ref, xl_ref, cph_ref, cpl_ref, dph_ref,
                        dpl_ref, *, n: int):
    """One spectral tile: forward sweep then back substitution.

    b/c/d: [n, T] df64 pairs; x out: [n, T]; cp/dp: VMEM scratch.
    """
    zero = DF(jnp.zeros_like(bh_ref[0, :]), jnp.zeros_like(bh_ref[0, :]))

    def fwd(i, carry):
        cp_prev, dp_prev = carry
        b_i = DF(bh_ref[i, :], bl_ref[i, :])
        c_i = DF(ch_ref[i, :], cl_ref[i, :])
        d_i = DF(dh_ref[i, :], dl_ref[i, :])
        # sub-diagonal a_i = c_{i-1}
        cm1 = DF(jnp.where(i > 0, ch_ref[jnp.maximum(i - 1, 0), :], 0.0),
                 jnp.where(i > 0, cl_ref[jnp.maximum(i - 1, 0), :], 0.0))
        denom = df64.sub(b_i, df64.mul(cm1, cp_prev))
        cp = df64.div(c_i, denom)
        dp = df64.div(df64.sub(d_i, df64.mul(cm1, dp_prev)), denom)
        cph_ref[i, :] = cp.hi
        cpl_ref[i, :] = cp.lo
        dph_ref[i, :] = dp.hi
        dpl_ref[i, :] = dp.lo
        return cp, dp

    jax.lax.fori_loop(np.int32(0), np.int32(n), fwd, (zero, zero))

    def bwd(k, x_next):
        i = jnp.int32(n - 1) - k
        cp = DF(cph_ref[i, :], cpl_ref[i, :])
        dp = DF(dph_ref[i, :], dpl_ref[i, :])
        x = df64.sub(dp, df64.mul(cp, x_next))
        xh_ref[i, :] = x.hi
        xl_ref[i, :] = x.lo
        return x

    jax.lax.fori_loop(np.int32(0), np.int32(n), bwd, zero)


def _use_interpret() -> bool:
    return jax.default_backend() == "cpu"


def _pad_to(x, s_pad):
    pad = s_pad - x.shape[-1]
    if pad == 0:
        return x
    return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])


@partial(jax.jit, static_argnames=("tile_s",))
def thomas_solve_pallas(b, c, d, *, tile_s: int = 512):
    # tile_s 512 keeps the block VMEM (6 double-buffered inputs + 2
    # outputs + 4 scratch at [n, tile]) under the 16 MB scoped budget
    # for the production n = 2*(L+1) = 212
    """df64 Thomas solve of [n, S] fp64 arrays (see module docstring).

    Pads S to the lane tile; padded columns get the identity system
    (b=1, c=0, d=0) so the divisions stay finite.
    """
    n, S = b.shape
    dtype = b.dtype
    tile_s = min(tile_s, max(128, 128 * ((S + 127) // 128)))
    s_pad = tile_s * ((S + tile_s - 1) // tile_s)
    n_tiles = s_pad // tile_s

    ones = jnp.ones((n, s_pad - S), dtype) if s_pad > S else None
    b_p = (jnp.concatenate([b, ones], axis=-1) if ones is not None else b)
    c_p = _pad_to(c, s_pad)
    d_p = _pad_to(d, s_pad)

    bh, bl = df64.split(b_p)
    ch, cl = df64.split(c_p)
    dh, dl = df64.split(d_p)

    spec = pl.BlockSpec((n, tile_s), lambda t: (0, t),
                        memory_space=pltpu.VMEM)
    f32 = jnp.float32

    with jax.enable_x64(False):
        xh, xl = pl.pallas_call(
            partial(_thomas_kernel_df64, n=n),
            grid=(n_tiles,),
            in_specs=[spec] * 6,
            out_specs=(spec, spec),
            out_shape=(jax.ShapeDtypeStruct((n, s_pad), f32),) * 2,
            scratch_shapes=[pltpu.VMEM((n, tile_s), f32)] * 4,
            interpret=_use_interpret(),
        )(bh, bl, ch, cl, dh, dl)

    return df64.combine(DF(xh[:, :S], xl[:, :S]), dtype)
