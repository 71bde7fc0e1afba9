"""Pallas Random-Overlap opacity-mixing kernel.

Random Overlap (reference add_to_mixed_opac, source/kernels.cu:3311-3397)
re-sorts the ny*ny pairwise sums of two ny-point k-distributions and
rebins the sorted k-function onto the Gauss nodes, per (layer, bin) cell.
The pure-XLA formulation (ops.mixing.random_overlap_mix) is exact but
HBM-bound: the bitonic network inside `lax.sort`, the cumsum and the
selection each make full-array HBM passes (~36 ms per mixing pass at
105x385x20 fp64 on v5e).

This kernel runs the ENTIRE pipeline -- pairwise sums, bitonic sort,
weight cumsum, rebin-index recurrence, interval selection, interpolation
-- inside VMEM, one tile of cells per program.  Layout: the sort axis
lives on the SUBLANE-major (leading) dimension and cells on lanes, so a
compare-exchange stage is two static sublane rotations plus selects (no
lane shuffles, no gathers).

Two algorithmic choices push it past both the reference's per-thread
insertion sort (kernels.cu:3352) and a naive df64 bitonic payload sort:

1. **Compressed integer keys, no payload.**  Each element is encoded as
   TWO int32 sort keys: ``k1`` = the order-isomorphic integer of the
   fp32 hi part (IEEE sortable-int transform) and ``k2`` = the sortable
   int of the fp32 lo part with its low ``2*jbits`` bits replaced by the
   packed source index ``(i << jbits) | j``.  The index makes every key
   pair globally unique (ties impossible -> one comparison per stage)
   and lets the quadrature weight and the exact df64 value be
   RECONSTRUCTED after the sort, so the 45-stage network moves 2 int32
   arrays instead of 4 fp32 payload arrays.  Ordering agrees with the
   true df64 order except for pairs closer than ~2^-38 relative (the
   sacrificed lo bits), far below the rebin's sensitivity.

2. **Pre-sorted block generation.**  The pairwise sums m[i]+n[j] arrive
   as 2*ny already-sorted runs (m and n each ascend).  Generation lays
   the array out so every aligned P-block (P = largest power of two
   <= ny) is already sorted with the alternating ascending/descending
   direction a bitonic sort would have produced at level P -- runs
   supply ny + L full blocks directly (descending ones via host-side
   reversed copies), and the L*L corner is mini-sorted on a [P, T]
   sliver.  The network then starts at k = 2P, skipping the first
   log2(P)*(log2(P)+1)/2 stages (10 of 45 for ny=20).  This exploits
   the pre-sorted-run structure the reference's insertion sort ignores.

Accuracy: keys order by df64 pairwise sums to ~2^-38 relative; weights
and interpolation values are reconstructed exactly in df64 from the
carried index; the weight cumsum is compensated df64.  Matches the fp64
XLA path to ~1e-10 relative.
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

# Sorts above the bitcast of every finite float AND +inf (0x7F800000).
_SENT_KEY = np.int32(0x7FE00000)


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


def _floor_pow2(n: int) -> int:
    p = 1
    while 2 * p <= n:
        p *= 2
    return p


def _sortable_i32(x):
    """Order-isomorphic signed int32 of an fp32 array (flip the
    non-sign bits of negatives so the int order equals float order)."""
    b = pltpu.bitcast(x, jnp.int32)
    return b ^ ((b >> 31) & np.int32(0x7FFFFFFF))


def _cx_take(x1, x2, p1, p2, ud):
    """Compare-exchange select mask: take the partner iff (x > p) XOR
    upper XOR descending, with ud = upper_i32 + desc_i32.  Keys are
    globally unique, so the upper side of a pair is exactly NOT the
    lower side's comparison -- one lexicographic compare per stage.
    All in i32: Mosaic rejects several i1-vector ops."""
    gt = ((x1 > p1) | ((x1 == p1) & (x2 > p2))).astype(jnp.int32)
    return ((gt + ud) & 1) == 1


def _partner(x, j, n):
    """x[i ^ j] via two static sublane rotations and a select.

    (A single block-swap permutation -- reshape [n/2j, 2, j, T], swap
    the half-blocks, reshape back -- is algebraically one data movement
    instead of three, but Mosaic's compile time on that pattern explodes
    superlinearly with the 35-stage unrolled network: >25 min vs ~4 min
    for the rotation form, with no cache through the axon tunnel.  The
    rotations are the pragmatic choice.)"""
    up = pltpu.roll(x, n - j, axis=0)       # up[i] = x[i + j]
    dn = pltpu.roll(x, j, axis=0)           # dn[i] = x[i - j]
    return up, dn


def _sort_refs(k1_ref, k2_ref, n_pad: int, k_start: int):
    """Bitonic sort of the (k1, k2) int keys on VMEM scratch, ascending,
    starting at stage level ``k_start`` (the generation already
    established sorted (k_start/2)-blocks with alternating direction).

    The key arrays are CARRIED AS VALUES through the whole unrolled
    network and written back once (measured round 5: identical runtime
    to stage-by-stage ref write-back -- Mosaic already forwards the
    stores -- kept for the simpler dataflow).

    MEASURED FLOOR (round 5, honest fetch-forced timing): the 35-stage
    network costs 5.4 ms of the kernel's 10.2 ms at 105x385x20.  The
    sort-free alternative (per-Gauss-node binary search on the int key
    space with rank-counting masked sums, SURVEY 7.2's candidate) loses
    at ny = 20: 2*ny = 40 quantile endpoints x 32 bit-planes x ~6 ops
    per [n_pad, T] pass = ~7680 row-passes vs the network's
    35 stages x 19 ops = 665 -- an order of magnitude MORE issue
    traffic, because the nodes cannot share rank-count passes (each has
    its own pivot).  A merge-tree formulation also loses: padding the
    2*ny sorted runs to power-of-two length grows n_pad 512 -> 640 and
    30 stages x 640 rows > 35 x 512.  The remaining levers are per-op,
    not algorithmic."""
    T = k1_ref.shape[-1]
    row = jax.lax.broadcasted_iota(jnp.int32, (n_pad, T), 0)
    x1 = k1_ref[:, :]
    x2 = k2_ref[:, :]
    k = k_start
    while k <= n_pad:
        j = k // 2
        while j >= 1:
            au = (row & j) != 0             # i has bit j -> partner below
            ud = (au.astype(jnp.int32)
                  + ((row & k) != 0).astype(jnp.int32))
            up1, dn1 = _partner(x1, j, n_pad)
            p1 = jnp.where(au, dn1, up1)
            up2, dn2 = _partner(x2, j, n_pad)
            p2 = jnp.where(au, dn2, up2)
            take = _cx_take(x1, x2, p1, p2, ud)
            x1 = jnp.where(take, p1, x1)
            x2 = jnp.where(take, p2, x2)
            j //= 2
        k *= 2
    k1_ref[:, :] = x1
    k2_ref[:, :] = x2


def _sort_values(k1, k2, n: int):
    """Full ascending bitonic sort of small [n, T] int key VALUES
    (used for the L*L corner block only)."""
    T = k1.shape[-1]
    row = jax.lax.broadcasted_iota(jnp.int32, (n, T), 0)
    k = 2
    while k <= n:
        j = k // 2
        while j >= 1:
            au = (row & j) != 0
            ud = (au.astype(jnp.int32)
                  + ((row & k) != 0).astype(jnp.int32))
            up1, dn1 = _partner(k1, j, n)
            p1 = jnp.where(au, dn1, up1)
            up2, dn2 = _partner(k2, j, n)
            p2 = jnp.where(au, dn2, up2)
            take = _cx_take(k1, k2, p1, p2, ud)
            k1 = jnp.where(take, p1, k1)
            k2 = jnp.where(take, p2, k2)
            j //= 2
        k *= 2
    return k1, k2


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


def _keys_from_val(v: DF, idx, keep_mask: np.int32):
    k1 = _sortable_i32(v.hi)
    k2 = (_sortable_i32(v.lo) & keep_mask) | idx
    return k1, k2


def _onehot_lookup(sel, ref, ny: int):
    """table[sel] for a [R, T] int index array, table = rows of a
    [ny, T] VMEM ref.  ny selects against [1, T] row slices -- the
    gather the sort avoided, done only on tiny reconstruction slivers."""
    acc = jnp.zeros(sel.shape, jnp.float32)
    for t in range(ny):
        acc = jnp.where(sel == t, ref[t:t + 1, :], acc)
    return acc


def _onehot_lookup_pair(sel, hi_ref, lo_ref, ny: int) -> DF:
    """Paired hi/lo lookup sharing one compare mask per table row
    (halves the compare cost of two independent lookups)."""
    acch = jnp.zeros(sel.shape, jnp.float32)
    accl = jnp.zeros(sel.shape, jnp.float32)
    for t in range(ny):
        m = sel == t
        acch = jnp.where(m, hi_ref[t:t + 1, :], acch)
        accl = jnp.where(m, lo_ref[t:t + 1, :], accl)
    return DF(acch, accl)


def _ro_kernel(mh_ref, ml_ref, nh_ref, nl_ref, mrh_ref, mrl_ref,
               nrh_ref, nrl_ref, gwh_ref, gwl_ref, gyh_ref, gyl_ref,
               oh_ref, ol_ref,
               k1_ref, k2_ref, wh_ref, wl_ref, ch_ref, cl_ref, *,
               ny: int, n2: int, n_pad: int, P: int, L: int,
               jbits: int, presort: bool, skip: str = ""):
    """One cell tile: mixed/new [ny, T] df64 pairs -> rebinned [ny, T].

    mr*/nr*: host-side axis-0-reversed copies of m/n (descending block
    generation); gw*: [ny, T] pre-broadcast df64 Gauss weights; gy*:
    [ny, T] pre-broadcast df64 Gauss nodes.  k1/k2 (int32) and
    wh/wl/ch/cl (fp32): [n_pad, T] VMEM scratch.
    """
    T = mh_ref.shape[1]
    jmask = np.int32((1 << jbits) - 1)
    imask = np.int32((1 << (2 * jbits)) - 1)
    keep = np.int32(~int(imask))

    # ---- generation: keys straight into sorted-block layout ----
    if presort and "presort" not in skip:
        # A: ny main blocks -- run i, columns j in [0, P), direction by
        # block parity (odd -> reversed j via the host-reversed copy;
        # n_rev[L + t] == n[P - 1 - t]).
        iA = jax.lax.broadcasted_iota(jnp.int32, (ny, P, T), 0)
        tA = jax.lax.broadcasted_iota(jnp.int32, (ny, P, T), 1)
        descA = (iA & 1) == 1
        jA = jnp.where(descA, P - 1 - tA, tA)
        mA = DF(jnp.broadcast_to(mh_ref[:, :][:, None, :], (ny, P, T)),
                jnp.broadcast_to(ml_ref[:, :][:, None, :], (ny, P, T)))
        nf = DF(jnp.broadcast_to(nh_ref[0:P, :][None, :, :], (ny, P, T)),
                jnp.broadcast_to(nl_ref[0:P, :][None, :, :], (ny, P, T)))
        nr = DF(jnp.broadcast_to(nrh_ref[L:L + P, :][None, :, :],
                                 (ny, P, T)),
                jnp.broadcast_to(nrl_ref[L:L + P, :][None, :, :],
                                 (ny, P, T)))
        vA = df64.add(mA, df64.where(descA, nr, nf))
        k1A, k2A = _keys_from_val(vA, (iA << jbits) | jA, keep)
        k1_ref[0:ny * P, :] = k1A.reshape(ny * P, T)
        k2_ref[0:ny * P, :] = k2A.reshape(ny * P, T)
        base = ny * P

        if L:
            # B: one block per leftover column j in [P, ny), rows i in
            # [0, P), direction by global block parity (ny + c).
            cB = jax.lax.broadcasted_iota(jnp.int32, (L, P, T), 0)
            tB = jax.lax.broadcasted_iota(jnp.int32, (L, P, T), 1)
            descB = ((cB + ny) & 1) == 1
            iB = jnp.where(descB, P - 1 - tB, tB)
            nB = DF(jnp.broadcast_to(nh_ref[P:ny, :][:, None, :],
                                     (L, P, T)),
                    jnp.broadcast_to(nl_ref[P:ny, :][:, None, :],
                                     (L, P, T)))
            mf = DF(jnp.broadcast_to(mh_ref[0:P, :][None, :, :],
                                     (L, P, T)),
                    jnp.broadcast_to(ml_ref[0:P, :][None, :, :],
                                     (L, P, T)))
            mr = DF(jnp.broadcast_to(mrh_ref[L:L + P, :][None, :, :],
                                     (L, P, T)),
                    jnp.broadcast_to(mrl_ref[L:L + P, :][None, :, :],
                                     (L, P, T)))
            vB = df64.add(df64.where(descB, mr, mf), nB)
            k1B, k2B = _keys_from_val(vB, (iB << jbits) | (P + cB), keep)
            k1_ref[base:base + L * P, :] = k1B.reshape(L * P, T)
            k2_ref[base:base + L * P, :] = k2B.reshape(L * P, T)
            base += L * P

            # C: the L*L corner (both i, j >= P), one mini-sorted block.
            # Its block index 2*ny - P is always even -> ascending.
            iC = jax.lax.broadcasted_iota(jnp.int32, (L, L, T), 0) + P
            jC = jax.lax.broadcasted_iota(jnp.int32, (L, L, T), 1) + P
            vC = df64.add(
                DF(jnp.broadcast_to(mh_ref[P:ny, :][:, None, :],
                                    (L, L, T)),
                   jnp.broadcast_to(ml_ref[P:ny, :][:, None, :],
                                    (L, L, T))),
                DF(jnp.broadcast_to(nh_ref[P:ny, :][None, :, :],
                                    (L, L, T)),
                   jnp.broadcast_to(nl_ref[P:ny, :][None, :, :],
                                    (L, L, T))))
            k1C, k2C = _keys_from_val(vC, (iC << jbits) | jC, keep)
            k1C = k1C.reshape(L * L, T)
            k2C = k2C.reshape(L * L, T)
            if P > L * L:
                padC = P - L * L
                iotaP = jax.lax.broadcasted_iota(jnp.int32, (padC, T), 0)
                k1C = jnp.concatenate(
                    [k1C, jnp.full((padC, T), _SENT_KEY, jnp.int32)],
                    axis=0)
                k2C = jnp.concatenate([k2C, iotaP], axis=0)
            k1C, k2C = _sort_values(k1C, k2C, P)
            k1_ref[base:base + P, :] = k1C
            k2_ref[base:base + P, :] = k2C
            base += P

        if base < n_pad:
            # sentinel tail: per-block direction so the k = 2P resume
            # sees a valid post-P state; unique k2 (row or -row).
            nS = n_pad - base
            rS = (jax.lax.broadcasted_iota(jnp.int32, (nS, T), 0)
                  + np.int32(base))
            oddS = (rS & np.int32(P)) != 0
            k1_ref[base:, :] = jnp.full((nS, T), _SENT_KEY, jnp.int32)
            k2_ref[base:, :] = jnp.where(oddS, -rS, rS)
        k_start = 2 * P
    else:
        i0 = jax.lax.broadcasted_iota(jnp.int32, (ny, ny, T), 0)
        j0 = jax.lax.broadcasted_iota(jnp.int32, (ny, ny, T), 1)
        v = df64.add(
            DF(jnp.broadcast_to(mh_ref[:, :][:, None, :], (ny, ny, T)),
               jnp.broadcast_to(ml_ref[:, :][:, None, :], (ny, ny, T))),
            DF(jnp.broadcast_to(nh_ref[:, :][None, :, :], (ny, ny, T)),
               jnp.broadcast_to(nl_ref[:, :][None, :, :], (ny, ny, T))))
        k1V, k2V = _keys_from_val(v, (i0 << jbits) | j0, keep)
        k1_ref[0:n2, :] = k1V.reshape(n2, T)
        k2_ref[0:n2, :] = k2V.reshape(n2, T)
        if n_pad > n2:
            nS = n_pad - n2
            rS = jax.lax.broadcasted_iota(jnp.int32, (nS, T), 0)
            k1_ref[n2:, :] = jnp.full((nS, T), _SENT_KEY, jnp.int32)
            k2_ref[n2:, :] = rS
        k_start = 2

    if "sort" not in skip:
        _sort_refs(k1_ref, k2_ref, n_pad, k_start)

    # ---- reconstruction: weights from the carried index ----
    rowp = jax.lax.broadcasted_iota(jnp.int32, (n_pad, T), 0)
    valid = rowp < n2          # sentinels carry the largest keys
    idx = k2_ref[:, :] & imask
    ii = idx >> jbits
    jj = idx & jmask
    gi = _onehot_lookup_pair(ii, gwh_ref, gwl_ref, ny)
    gj = _onehot_lookup_pair(jj, gwh_ref, gwl_ref, ny)
    w = df64.scale(df64.mul(gi, gj), np.float32(0.25))
    wh_ref[:, :] = jnp.where(valid, w.hi, 0.0)
    wl_ref[:, :] = jnp.where(valid, w.lo, 0.0)

    # ch/cl := yg = cumsum(w) - w/2
    ch_ref[:, :] = wh_ref[:, :]
    cl_ref[:, :] = wl_ref[:, :]
    if "cumsum" not in skip:
        _cumsum_refs(ch_ref, cl_ref, n_pad)
    if "rebin" in skip:
        oh_ref[:, :] = ch_ref[:ny, :]
        ol_ref[:, :] = cl_ref[:ny, :]
        return
    w_half = df64.scale(DF(wh_ref[:, :], wl_ref[:, :]), np.float32(0.5))
    yg_v = df64.sub(DF(ch_ref[:, :], cl_ref[:, :]), w_half)
    ch_ref[:, :] = yg_v.hi
    cl_ref[:, :] = yg_v.lo
    yg = DF(ch_ref[:, :], cl_ref[:, :])

    # rebin indices (ops.mixing._rebin_indices math): first_y counted on
    # the REAL n2 entries.  Everything stays 2-D ([1, T] rows) --
    # Mosaic's vector lowering rejects several ops on 1-D shapes.
    # gy/gw arrive pre-broadcast as real [ny, T] arrays: slicing an
    # in-kernel jnp.broadcast_to gets folded by Mosaic into a
    # [1, 1] -> [1, T] -> [n2, T] double broadcast, which it cannot
    # lower ("Broadcast in both sublanes and lanes").
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

    def sel_f(arr_h, arr_l, mask):
        """Exact masked selection: exactly one True per column."""
        return DF(jnp.sum(jnp.where(mask, arr_h, 0.0), axis=0,
                          keepdims=True),
                  jnp.sum(jnp.where(mask, arr_l, 0.0), axis=0,
                          keepdims=True))

    # Select the interval endpoints' yg and INDEX per Gauss node, then
    # reconstruct the df64 k values for all 2*ny endpoints in one
    # [2*ny, T] batched lookup (exact df64.add(m_i, n_j), matching
    # generation bit-for-bit).
    yg_his, yg_los, idx_rows = [], [], []
    for y in range(ny):
        w = w_idx[y]                               # [1, T]
        m_hi = rowp == w
        m_lo = rowp == (w - 1)
        yg_his.append(sel_f(yg.hi, yg.lo, m_hi))
        yg_los.append(sel_f(yg.hi, yg.lo, m_lo))
        idx_rows.append(jnp.sum(jnp.where(m_lo, idx, 0), axis=0,
                                keepdims=True))
        idx_rows.append(jnp.sum(jnp.where(m_hi, idx, 0), axis=0,
                                keepdims=True))
    idx_cat = jnp.concatenate(idx_rows, axis=0)    # [2*ny, T]
    ii_s = idx_cat >> jbits
    jj_s = idx_cat & jmask
    k_cat = df64.add(_onehot_lookup_pair(ii_s, mh_ref, ml_ref, ny),
                     _onehot_lookup_pair(jj_s, nh_ref, nl_ref, ny))

    for y in range(ny):
        k_lo = DF(k_cat.hi[2 * y:2 * y + 1, :],
                  k_cat.lo[2 * y:2 * y + 1, :])
        k_hi = DF(k_cat.hi[2 * y + 1:2 * y + 2, :],
                  k_cat.lo[2 * y + 1:2 * y + 2, :])
        g = DF(gyh[y:y + 1, :], gyl[y:y + 1, :])
        yg_hi, yg_lo = yg_his[y], yg_los[y]
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
    P = _floor_pow2(ny)
    L = ny - P
    presort = (L == 0) or (L * L <= P)
    jbits = max((ny - 1).bit_length(), 1)
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
    mrh, mrl = jnp.flip(mh, axis=0), jnp.flip(ml, axis=0)
    nrh, nrl = jnp.flip(nh, axis=0), jnp.flip(nl, axis=0)

    gw_pair = df64.split(gauss_weight[:, None])
    gwh = jnp.broadcast_to(gw_pair.hi, (ny, c_pad))
    gwl = jnp.broadcast_to(gw_pair.lo, (ny, c_pad))
    gy_pair = df64.split(gauss_y[:, None])
    gyh = jnp.broadcast_to(gy_pair.hi, (ny, c_pad))
    gyl = jnp.broadcast_to(gy_pair.lo, (ny, c_pad))

    cell_spec = pl.BlockSpec((ny, tile_c), lambda t: (0, t),
                             memory_space=pltpu.VMEM)

    with jax.enable_x64(False):
        oh, ol = pl.pallas_call(
            partial(_ro_kernel, ny=ny, n2=n2, n_pad=n_pad, P=P, L=L,
                    jbits=jbits, presort=presort, skip=skip),
            grid=(n_tiles,),
            in_specs=[cell_spec] * 12,
            out_specs=(cell_spec, cell_spec),
            out_shape=(jax.ShapeDtypeStruct((ny, c_pad), jnp.float32),
                       jax.ShapeDtypeStruct((ny, c_pad), jnp.float32)),
            scratch_shapes=[pltpu.VMEM((n_pad, tile_c), jnp.int32)] * 2
            + [pltpu.VMEM((n_pad, tile_c), jnp.float32)] * 4,
            interpret=_use_interpret(),
        )(mh, ml, nh, nl, mrh, mrl, nrh, nrl, gwh, gwl, gyh, gyl)

    out = df64.combine(DF(oh, ol), mixed_opac.dtype)
    return out[:, :C].T.reshape(lead + (ny,))
