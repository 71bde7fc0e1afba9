"""Pallas Random-Overlap opacity-mixing kernel.

Random Overlap (reference add_to_mixed_opac, source/kernels.cu:3311-3397)
re-sorts the 400 pairwise sums of two 20-point k-distributions and rebins
the sorted k-function onto the Gauss nodes, per (layer, bin) cell.  The
pure-XLA formulation (ops.mixing.random_overlap_mix) is exact but
HBM-bound: the 45-stage bitonic network inside `lax.sort`, the cumsum and
the selection each make full-array HBM passes (~36 ms per mixing pass at
105x385x20 fp64 on v5e).

This kernel runs the ENTIRE pipeline -- pairwise sums, bitonic sort,
weight cumsum, rebin-index recurrence, interval selection, interpolation
-- inside VMEM, one tile of cells per program, in df64 (two-float32)
arithmetic.  Layout: the sort axis lives on the SUBLANE-major (leading)
dimension and cells on lanes, so every compare-exchange stage is a static
leading-axis reshape + elementwise select (no lane shuffles, no gathers).

Accuracy: keys are df64 pairwise sums (~1e-13 relative of the exact fp64
values), weight cumsum is compensated df64, selection is exact (masked
single-term sums).  Matches the fp64 XLA path to ~1e-10 relative; ties in
the key values may resolve in a different (non-stable) order, which only
perturbs interval boundaries at the weight-rounding level.
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

_SENTINEL = np.float32(3.0e38)   # sorts padded entries to the end


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


def _lex_gt(ah, al, bh, bl):
    """(ah, al) > (bh, bl) for canonical df64 pairs (lexicographic)."""
    return (ah > bh) | ((ah == bh) & (al > bl))


def _bitonic_sort_refs(kh_ref, kl_ref, wh_ref, wl_ref, n_pad: int,
                       skip: str = ""):
    """Ascending bitonic sort of df64 keys along the leading axis,
    permuting the df64 payload along, IN PLACE on VMEM scratch refs.

    Every stage is a static reshape [n_pad, T] -> [blocks, 2, j, T] plus
    elementwise select -- the partner of element i at stage distance j is
    i ^ j, which the reshape exposes as the axis-1 halves; the ascending/
    descending direction ((i & k) == 0) is constant within a block.

    Writing every stage back into the same four scratch buffers keeps
    Mosaic's scoped-VMEM stack allocation bounded: a value-based
    formulation of the 45 unrolled stages accumulates ~70 live
    [n_pad, T] temporaries and overflows the 16 MB scoped-vmem budget.
    """
    T = kh_ref.shape[-1]
    k = 2
    while k <= n_pad:
        j = k // 2
        while j >= 1:
            if ("smallj" in skip and j < 8) or ("bigj" in skip and j >= 8):
                j //= 2
                continue
            blocks = n_pad // (2 * j)
            # ascending where (block_start & k) == 0; built from an iota
            # (Pallas kernels cannot capture host array constants)
            blk = jax.lax.broadcasted_iota(jnp.int32, (blocks, 1, 1), 0)
            asc_i = (((blk * (2 * j)) & k) == 0).astype(jnp.int32)

            def split2(ref):
                x4 = ref[:, :].reshape(blocks, 2, j, T)
                return x4[:, 0], x4[:, 1]

            akh, bkh = split2(kh_ref)
            akl, bkl = split2(kl_ref)

            gt_i = _lex_gt(akh, akl, bkh, bkl).astype(jnp.int32)
            # where(asc, gt, ~gt) == (asc XNOR gt), in i32 to keep Mosaic
            # off i1-vector selects
            swap = (asc_i + gt_i) != 1

            def cx(a, b, ref):
                na = jnp.where(swap, b, a)
                nb = jnp.where(swap, a, b)
                ref[:, :] = jnp.stack([na, nb], axis=1).reshape(n_pad, T)

            cx(akh, bkh, kh_ref)
            cx(akl, bkl, kl_ref)
            awh, bwh = split2(wh_ref)
            cx(awh, bwh, wh_ref)
            awl, bwl = split2(wl_ref)
            cx(awl, bwl, wl_ref)
            j //= 2
        k *= 2


def _cumsum_refs(ch_ref, cl_ref, n_pad: int):
    """In-place inclusive df64 cumsum along the leading axis (log2
    shifted adds; XLA's native cumsum is O(n) passes on TPU)."""
    T = ch_ref.shape[-1]
    s = 1
    while s < n_pad:
        zh = jnp.zeros((s, T), jnp.float32)
        sh = DF(jnp.concatenate([zh, ch_ref[:-s, :]], axis=0),
                jnp.concatenate([zh, cl_ref[:-s, :]], axis=0))
        c = df64.add(DF(ch_ref[:, :], cl_ref[:, :]), sh)
        ch_ref[:, :] = c.hi
        cl_ref[:, :] = c.lo
        s *= 2


def _ro_kernel(mh_ref, ml_ref, nh_ref, nl_ref, w2h_ref, w2l_ref,
               gyh_ref, gyl_ref, oh_ref, ol_ref,
               kh_ref, kl_ref, wh_ref, wl_ref, ch_ref, cl_ref, *,
               ny: int, n2: int, n_pad: int, skip: str = ""):
    """One cell tile: mixed/new [ny, T] df64 pairs -> rebinned [ny, T].

    w2h/w2l: [n_pad, 1] pairwise quadrature weights (zero-padded);
    gyh/gyl: [ny, T] Gauss nodes as df64 pairs (pre-broadcast).
    kh/kl/wh/wl/ch/cl: [n_pad, T] VMEM scratch (sorted keys, sorted
    weights, cumulative y positions).
    """
    T = mh_ref.shape[1]

    m = DF(mh_ref[:, :], ml_ref[:, :])
    n = DF(nh_ref[:, :], nl_ref[:, :])
    s = df64.add(DF(m.hi[:, None, :], m.lo[:, None, :]),
                 DF(n.hi[None, :, :], n.lo[None, :, :]))  # [ny, ny, T]
    kh_ref[:n2, :] = s.hi.reshape(n2, T)
    kl_ref[:n2, :] = s.lo.reshape(n2, T)
    if n_pad > n2:
        kh_ref[n2:, :] = jnp.full((n_pad - n2, T), _SENTINEL, jnp.float32)
        kl_ref[n2:, :] = jnp.zeros((n_pad - n2, T), jnp.float32)

    wh_ref[:, :] = jnp.broadcast_to(w2h_ref[:, :], (n_pad, T))
    wl_ref[:, :] = jnp.broadcast_to(w2l_ref[:, :], (n_pad, T))

    if "sort" not in skip:
        _bitonic_sort_refs(kh_ref, kl_ref, wh_ref, wl_ref, n_pad,
                           skip=skip)

    # ch/cl := yg = cumsum(w) - w/2
    ch_ref[:, :] = wh_ref[:, :]
    cl_ref[:, :] = wl_ref[:, :]
    if "cumsum" not in skip:
        _cumsum_refs(ch_ref, cl_ref, n_pad)
    if "rebin" in skip:
        oh_ref[:, :] = kh_ref[:ny, :]
        ol_ref[:, :] = kl_ref[:ny, :]
        return
    w_half = df64.scale(DF(wh_ref[:, :], wl_ref[:, :]), np.float32(0.5))
    yg_v = df64.sub(DF(ch_ref[:, :], cl_ref[:, :]), w_half)
    ch_ref[:, :] = yg_v.hi
    cl_ref[:, :] = yg_v.lo
    kh = kh_ref[:, :]
    kl = kl_ref[:, :]
    yg = DF(ch_ref[:, :], cl_ref[:, :])

    # rebin indices (ops.mixing._rebin_indices math): first_y counted on
    # the REAL n2 entries (pads carry zero weight and sentinel keys, so
    # their yg is the total weight ~1 > every Gauss node anyway).
    # Everything stays 2-D ([1, T] rows) -- Mosaic's vector lowering
    # rejects several ops on 1-D shapes.
    # gy arrives pre-broadcast as a real [ny, T] array: slicing an
    # in-kernel jnp.broadcast_to gets folded by Mosaic into a
    # [1, 1] -> [1, T] -> [n2, T] double broadcast, which it cannot
    # lower ("Broadcast in both sublanes and lanes")
    gyh = gyh_ref[:, :]
    gyl = gyl_ref[:, :]
    ygh_r, ygl_r = yg.hi[:n2], yg.lo[:n2]
    w_idx = []
    prev = None
    for y in range(ny):
        g = DF(gyh[y:y + 1, :], gyl[y:y + 1, :])   # [1, T]
        # first = #(yg <= g) = n2 - #(yg > g); avoids i1-vector NOT,
        # which Mosaic cannot lower
        gt = df64.lt(g, DF(ygh_r, ygl_r)).astype(jnp.int32)
        first = n2 - jnp.sum(gt, axis=0, keepdims=True)   # [1, T]
        w = first if prev is None else jnp.maximum(first, prev + 1)
        w = jnp.clip(w, 1, n2 - 1)
        w_idx.append(w)
        prev = w

    iota = jax.lax.broadcasted_iota(jnp.int32, (n_pad, T), 0)

    def sel(arr_h, arr_l, mask):
        """Exact masked selection: exactly one True per column."""
        return DF(jnp.sum(jnp.where(mask, arr_h, 0.0), axis=0,
                          keepdims=True),
                  jnp.sum(jnp.where(mask, arr_l, 0.0), axis=0,
                          keepdims=True))

    for y in range(ny):
        w = w_idx[y]                               # [1, T]
        m_hi = iota == w
        m_lo = iota == (w - 1)
        yg_hi = sel(yg.hi, yg.lo, m_hi)
        yg_lo = sel(yg.hi, yg.lo, m_lo)
        k_hi = sel(kh, kl, m_hi)
        k_lo = sel(kh, kl, m_lo)
        g = DF(gyh[y:y + 1, :], gyl[y:y + 1, :])
        num = df64.add(df64.mul(k_lo, df64.sub(yg_hi, g)),
                       df64.mul(k_hi, df64.sub(g, yg_lo)))
        r = df64.div(num, df64.sub(yg_hi, yg_lo))
        oh_ref[y:y + 1, :] = r.hi
        ol_ref[y:y + 1, :] = r.lo


def _use_interpret() -> bool:
    return jax.default_backend() == "cpu"


@partial(jax.jit, static_argnames=("tile_c", "skip"))
def random_overlap_mix_pallas(mixed_opac, new_opac, gauss_weight,
                              gauss_y, *, tile_c: int = 256,
                              skip: str = ""):
    """Drop-in fused replacement for ops.mixing.random_overlap_mix.

    mixed_opac, new_opac: [..., ny] fp64 (ascending in y).
    Returns the re-binned mixed k-coefficients [..., ny] fp64.
    """
    ny = mixed_opac.shape[-1]
    n2 = ny * ny
    n_pad = _next_pow2(n2)
    lead = mixed_opac.shape[:-1]
    C = int(np.prod(lead)) if lead else 1
    c_pad = tile_c * ((C + tile_c - 1) // tile_c)
    n_tiles = c_pad // tile_c

    def prep(x):
        xt = x.reshape(C, ny).T                      # [ny, C]
        if c_pad > C:
            xt = jnp.pad(xt, [(0, 0), (0, c_pad - C)])
        return df64.split(xt)

    mh, ml = prep(mixed_opac)
    nh, nl = prep(new_opac)

    w2 = ((0.5 * gauss_weight[:, None])
          * (0.5 * gauss_weight[None, :])).reshape(n2)
    w2 = jnp.pad(w2, (0, n_pad - n2))
    w2h, w2l = df64.split(w2[:, None])
    gy_pair = df64.split(gauss_y[:, None])
    gyh = jnp.broadcast_to(gy_pair.hi, (ny, c_pad))
    gyl = jnp.broadcast_to(gy_pair.lo, (ny, c_pad))

    cell_spec = pl.BlockSpec((ny, tile_c), lambda t: (0, t),
                             memory_space=pltpu.VMEM)
    w2_spec = pl.BlockSpec((n_pad, 1), lambda t: (0, 0),
                           memory_space=pltpu.VMEM)
    gy_spec = pl.BlockSpec((ny, tile_c), lambda t: (0, t),
                           memory_space=pltpu.VMEM)

    with jax.enable_x64(False):
        oh, ol = pl.pallas_call(
            partial(_ro_kernel, ny=ny, n2=n2, n_pad=n_pad, skip=skip),
            grid=(n_tiles,),
            in_specs=[cell_spec, cell_spec, cell_spec, cell_spec,
                      w2_spec, w2_spec, gy_spec, gy_spec],
            out_specs=(cell_spec, cell_spec),
            out_shape=(jax.ShapeDtypeStruct((ny, c_pad), jnp.float32),
                       jax.ShapeDtypeStruct((ny, c_pad), jnp.float32)),
            scratch_shapes=[pltpu.VMEM((n_pad, tile_c),
                                       jnp.float32)] * 6,
            interpret=_use_interpret(),
        )(mh, ml, nh, nl, w2h, w2l, gyh, gyl)

    out = df64.combine(DF(oh, ol), mixed_opac.dtype)
    return out[:, :C].T.reshape(lead + (ny,))
