"""Pallas fused two-stream sweep kernel.

The iterative flux solve is the hot loop of the RCE iteration: per pass, a
downward then an upward first-order recurrence over ~105 layers, elementwise
across the spectral grid.  The `lax.scan` formulation launches
2 * n_passes * nlayer tiny XLA ops whose latency dominates; this kernel
keeps the whole recursion resident in VMEM -- one Pallas program per
spectral tile runs all passes and all layers with no HBM round-trips
(the TPU-native analogue of the per-thread loop in the reference's
fband_iso CUDA kernel, source/kernels.cu:1366-1515).

Layout: the spectral axes are flattened to S = nbin * ny and padded to the
lane tile so every per-layer step is a dense [1, S_tile] VPU op.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _iso_sweep_kernel(a_ref, b_ref, sd_ref, su_ref, toa_ref, refl_ref,
                      emis_ref, fdir0_ref, fup_prev_ref,
                      fdown_ref, fup_ref, *, nlayer: int, n_passes: int):
    """One spectral tile: run n_passes (down + up) sweeps over all layers.

    a, b, sd, su: [L, S]; toa/refl/emis/fdir0: [1, S];
    fup_prev: [L+1, S]; outputs fdown/fup: [L+1, S].
    """
    L = nlayer

    # first pass reads the previous solve's upward flux
    fup_ref[:] = fup_prev_ref[:]
    toa = toa_ref[0, :]
    fdown_ref[L, :] = toa

    def one_pass(p, _):
        # downward: F_down[i] = a[i] F_down[i+1] + b[i] F_up[i] + sd[i]
        def down_step(k, carry):
            i = jnp.int32(L - 1) - k
            f = (a_ref[i, :] * carry + b_ref[i, :] * fup_ref[i, :]
                 + sd_ref[i, :])
            fdown_ref[i, :] = f
            return f

        # int32 loop bounds keep every index i32 -- under jax_enable_x64
        # the default i64 loop variable sends Mosaic's convert lowering
        # into infinite recursion
        jax.lax.fori_loop(np.int32(0), np.int32(L), down_step, toa)

        # BOA boundary: reflection + emission
        boa = (refl_ref[0, :] * (fdir0_ref[0, :] + fdown_ref[0, :])
               + emis_ref[0, :])
        fup_ref[0, :] = boa

        # upward: F_up[i] = a[i-1] F_up[i-1] + b[i-1] F_down[i] + su[i-1]
        def up_step(i, carry):
            f = (a_ref[i, :] * carry + b_ref[i, :] * fdown_ref[i + 1, :]
                 + su_ref[i, :])
            fup_ref[i + 1, :] = f
            return f

        jax.lax.fori_loop(np.int32(0), np.int32(L), up_step, boa)
        return np.int32(0)

    jax.lax.fori_loop(np.int32(0), np.int32(n_passes), one_pass,
                      np.int32(0))


def _iso_sweep_kernel_df64(ah_ref, al_ref, bh_ref, bl_ref, sdh_ref, sdl_ref,
                           suh_ref, sul_ref, toah_ref, toal_ref, reflh_ref,
                           refll_ref, emish_ref, emisl_ref, fdir0h_ref,
                           fdir0l_ref, fuph_prev_ref, fupl_prev_ref,
                           fdownh_ref, fdownl_ref, fuph_ref, fupl_ref,
                           srch_ref, srcl_ref, *, nlayer: int,
                           n_passes: int):
    """df64 (double-float32) variant of _iso_sweep_kernel.

    Every logical fp64 array arrives as a (hi, lo) float32 pair; the
    recursion runs in error-free-transformation arithmetic (ops.df64) at
    native fp32 vector speed.  This is how the TPU build preserves the
    reference's fp64 flux accuracy (kernels.cu `utype`): matches the XLA
    fp64 oracle to ~1e-13 relative.

    Sublane-interleaved layout: every ref is [.., 8, C] -- the spectral
    tile viewed as 8 sublane rows x C lanes -- so each step of the
    latency-bound sequential layer chain is a df64 fma on a FULL
    (8, 128)-tiled vreg block.  The previous [L, S]-flat layout made the
    chain operate on [1, tile_s] slices occupying 1 of 8 sublanes: 8x
    the vector issues for the same work, and the chain dominated the
    solve (measured 0.58 ms vs ~0.11 ms for the vectorized stages at
    105 x 7700 x 4 passes).

    src scratch: per pass the vectorized [L, 8, C] source b*F + s is
    staged in VMEM scratch so the sequential loop is one df64 fma per
    layer.
    """
    from helios_tpu.ops import df64

    L = nlayer
    DF = df64.DF

    fuph_ref[:] = fuph_prev_ref[:]
    fupl_ref[:] = fupl_prev_ref[:]
    toa = DF(toah_ref[0], toal_ref[0])
    fdownh_ref[L] = toa.hi
    fdownl_ref[L] = toa.lo

    def one_pass(p, _):
        # vectorized source for the down sweep: b * F_up[0:L] + sd
        src = df64.fma(DF(bh_ref[:, :, :], bl_ref[:, :, :]),
                       DF(fuph_ref[:L, :, :], fupl_ref[:L, :, :]),
                       DF(sdh_ref[:, :, :], sdl_ref[:, :, :]))
        srch_ref[:] = src.hi
        srcl_ref[:] = src.lo

        def down_step(k, carry):
            i = jnp.int32(L - 1) - k
            f = df64.fma(DF(ah_ref[i], al_ref[i]), carry,
                         DF(srch_ref[i], srcl_ref[i]))
            fdownh_ref[i] = f.hi
            fdownl_ref[i] = f.lo
            return f

        jax.lax.fori_loop(np.int32(0), np.int32(L), down_step, toa)

        # BOA: refl * (F_dir0 + F_down[0]) + emis
        boa = df64.fma(
            DF(reflh_ref[0], refll_ref[0]),
            df64.add(DF(fdir0h_ref[0], fdir0l_ref[0]),
                     DF(fdownh_ref[0], fdownl_ref[0])),
            DF(emish_ref[0], emisl_ref[0]))
        fuph_ref[0] = boa.hi
        fupl_ref[0] = boa.lo

        # vectorized source for the up sweep: b * F_down[1:L+1] + su
        src_u = df64.fma(DF(bh_ref[:, :, :], bl_ref[:, :, :]),
                         DF(fdownh_ref[1:, :, :], fdownl_ref[1:, :, :]),
                         DF(suh_ref[:, :, :], sul_ref[:, :, :]))
        srch_ref[:] = src_u.hi
        srcl_ref[:] = src_u.lo

        def up_step(i, carry):
            f = df64.fma(DF(ah_ref[i], al_ref[i]), carry,
                         DF(srch_ref[i], srcl_ref[i]))
            fuph_ref[i + 1] = f.hi
            fupl_ref[i + 1] = f.lo
            return f

        jax.lax.fori_loop(np.int32(0), np.int32(L), up_step, boa)
        return np.int32(0)

    jax.lax.fori_loop(np.int32(0), np.int32(n_passes), one_pass,
                      np.int32(0))


def _noniso_sweep_kernel(au_ref, bu_ref, sud_ref, suu_ref,
                         al_ref, bl_ref, sld_ref, slu_ref,
                         toa_ref, refl_ref, emis_ref, fdir0_ref,
                         fup_prev_ref, fcup_prev_ref,
                         fdown_ref, fup_ref, fcdown_ref, fcup_ref,
                         aa_ref, s1_ref, ss_ref, *,
                         nlayer: int, n_passes: int):
    """fp32 fused non-isothermal flux solve (fband_noniso,
    kernels.cu:1521-1800): half-layer resolution.

    The two chained half-layer recurrences per layer
        Fc_down[i] = au[i] F_down[i+1] + (bu[i] Fc_up[i] + sud[i])
        F_down[i]  = al[i] Fc_down[i]  + (bl[i] F_up[i]  + sld[i])
    are algebraically flattened into ONE full-layer recurrence
        F_down[i] = (al au)[i] F_down[i+1] + (al[i] s1[i] + s2[i])
    so the latency-bound sequential chain costs exactly one fma per layer
    (same as the iso kernel); the half-layer fluxes are recovered with a
    vectorized fma afterwards (Fc_down = au * F_down[1:] + s1).  The up
    sweep flattens symmetrically.

    au/bu/sud/suu: upper-half recurrence coeffs + sources [L, S];
    al/bl/sld/slu: lower half; boundaries [1, S];
    fup_prev [L+1, S], fcup_prev [L, S].
    aa/s1/ss: [L, S] VMEM scratch (flattened coeff al*au, staged
    half-layer source, flattened source).
    """
    L = nlayer

    fup_ref[:] = fup_prev_ref[:]
    fcup_ref[:] = fcup_prev_ref[:]
    toa = toa_ref[0, :]
    fdown_ref[L, :] = toa
    aa_ref[:] = al_ref[:, :] * au_ref[:, :]

    def one_pass(p, _):
        # staged sources: s1 = upper-half, ss = flattened full-layer
        s1_ref[:] = bu_ref[:, :] * fcup_ref[:, :] + sud_ref[:, :]
        ss_ref[:] = (al_ref[:, :] * s1_ref[:, :]
                     + (bl_ref[:, :] * fup_ref[:L, :] + sld_ref[:, :]))

        def down_step(k, carry):
            i = jnp.int32(L - 1) - k
            f = aa_ref[i, :] * carry + ss_ref[i, :]
            fdown_ref[i, :] = f
            return f

        jax.lax.fori_loop(np.int32(0), np.int32(L), down_step, toa)
        fcdown_ref[:] = (au_ref[:, :] * fdown_ref[1:, :] + s1_ref[:, :])

        boa = (refl_ref[0, :] * (fdir0_ref[0, :] + fdown_ref[0, :])
               + emis_ref[0, :])
        fup_ref[0, :] = boa

        # upward: Fc_up[i] = al[i] F_up[i] + (bl[i] Fc_down[i] + slu[i])
        #         F_up[i+1] = au[i] Fc_up[i] + (bu[i] F_down[i+1] + suu[i])
        s1_ref[:] = bl_ref[:, :] * fcdown_ref[:, :] + slu_ref[:, :]
        ss_ref[:] = (au_ref[:, :] * s1_ref[:, :]
                     + (bu_ref[:, :] * fdown_ref[1:, :] + suu_ref[:, :]))

        def up_step(i, carry):
            f = aa_ref[i, :] * carry + ss_ref[i, :]
            fup_ref[i + 1, :] = f
            return f

        jax.lax.fori_loop(np.int32(0), np.int32(L), up_step, boa)
        fcup_ref[:] = al_ref[:, :] * fup_ref[:L, :] + s1_ref[:, :]
        return np.int32(0)

    jax.lax.fori_loop(np.int32(0), np.int32(n_passes), one_pass,
                      np.int32(0))


def _noniso_sweep_kernel_df64(auh_ref, aul_ref, buh_ref, bul_ref,
                              sudh_ref, sudl_ref, suuh_ref, suul_ref,
                              alh_ref, all_ref, blh_ref, bll_ref,
                              sldh_ref, sldl_ref, sluh_ref, slul_ref,
                              toah_ref, toal_ref, reflh_ref, refll_ref,
                              emish_ref, emisl_ref, fdir0h_ref, fdir0l_ref,
                              fuph_prev_ref, fupl_prev_ref,
                              fcuph_prev_ref, fcupl_prev_ref,
                              fdownh_ref, fdownl_ref, fuph_ref, fupl_ref,
                              fcdownh_ref, fcdownl_ref, fcuph_ref,
                              fcupl_ref, s1h_ref, s1l_ref, s2h_ref,
                              s2l_ref, aah_ref, aal_ref, *, nlayer: int,
                              n_passes: int):
    """df64 fused non-isothermal flux solve (fband_noniso,
    kernels.cu:1521-1800): half-layer resolution.

    The two chained half-layer df64 fmas per sequential step are
    algebraically flattened into ONE full-layer recurrence (see
    _noniso_sweep_kernel): the latency-bound chain costs one df64 fma
    per layer, the same as the iso kernel, and the half-layer fluxes are
    recovered with vectorized fmas after each sweep.  The flattening
    reassociates two rounding steps (~1 df64 ulp, ~1e-30 relative) --
    far below the 1e-13 parity bound vs the fp64 oracle.

    Scratch: s1 = staged half-layer source pair, s2 = flattened source
    pair, aa = al*au pair (constant across passes).
    """
    from helios_tpu.ops import df64

    L = nlayer
    DF = df64.DF

    fuph_ref[:] = fuph_prev_ref[:]
    fupl_ref[:] = fupl_prev_ref[:]
    fcuph_ref[:] = fcuph_prev_ref[:]
    fcupl_ref[:] = fcupl_prev_ref[:]
    toa = DF(toah_ref[0, :], toal_ref[0, :])
    fdownh_ref[L, :] = toa.hi
    fdownl_ref[L, :] = toa.lo

    aa = df64.mul(DF(alh_ref[:, :], all_ref[:, :]),
                  DF(auh_ref[:, :], aul_ref[:, :]))
    aah_ref[:] = aa.hi
    aal_ref[:] = aa.lo

    def one_pass(p, _):
        # down sweep: s1 = bu*Fc_up + sud (upper half),
        # flattened source ss = al*s1 + (bl*F_up + sld)
        s1 = df64.fma(DF(buh_ref[:, :], bul_ref[:, :]),
                      DF(fcuph_ref[:, :], fcupl_ref[:, :]),
                      DF(sudh_ref[:, :], sudl_ref[:, :]))
        s1h_ref[:] = s1.hi
        s1l_ref[:] = s1.lo
        s2 = df64.fma(DF(blh_ref[:, :], bll_ref[:, :]),
                      DF(fuph_ref[:L, :], fupl_ref[:L, :]),
                      DF(sldh_ref[:, :], sldl_ref[:, :]))
        ss = df64.fma(DF(alh_ref[:, :], all_ref[:, :]), s1, s2)
        s2h_ref[:] = ss.hi
        s2l_ref[:] = ss.lo

        def down_step(k, carry):
            i = jnp.int32(L - 1) - k
            f = df64.fma(DF(aah_ref[i, :], aal_ref[i, :]), carry,
                         DF(s2h_ref[i, :], s2l_ref[i, :]))
            fdownh_ref[i, :] = f.hi
            fdownl_ref[i, :] = f.lo
            return f

        jax.lax.fori_loop(np.int32(0), np.int32(L), down_step, toa)

        # vectorized half-layer recovery: Fc_down = au*F_down[1:] + s1
        fcd = df64.fma(DF(auh_ref[:, :], aul_ref[:, :]),
                       DF(fdownh_ref[1:, :], fdownl_ref[1:, :]),
                       DF(s1h_ref[:, :], s1l_ref[:, :]))
        fcdownh_ref[:] = fcd.hi
        fcdownl_ref[:] = fcd.lo

        boa = df64.fma(
            DF(reflh_ref[0, :], refll_ref[0, :]),
            df64.add(DF(fdir0h_ref[0, :], fdir0l_ref[0, :]),
                     DF(fdownh_ref[0, :], fdownl_ref[0, :])),
            DF(emish_ref[0, :], emisl_ref[0, :]))
        fuph_ref[0, :] = boa.hi
        fupl_ref[0, :] = boa.lo

        # up sweep: s1u = bl*Fc_down + slu (lower half),
        # flattened source ssu = au*s1u + (bu*F_down[1:] + suu)
        s1u = df64.fma(DF(blh_ref[:, :], bll_ref[:, :]),
                       DF(fcdownh_ref[:, :], fcdownl_ref[:, :]),
                       DF(sluh_ref[:, :], slul_ref[:, :]))
        s1h_ref[:] = s1u.hi
        s1l_ref[:] = s1u.lo
        s2u = df64.fma(DF(buh_ref[:, :], bul_ref[:, :]),
                       DF(fdownh_ref[1:, :], fdownl_ref[1:, :]),
                       DF(suuh_ref[:, :], suul_ref[:, :]))
        ssu = df64.fma(DF(auh_ref[:, :], aul_ref[:, :]), s1u, s2u)
        s2h_ref[:] = ssu.hi
        s2l_ref[:] = ssu.lo

        def up_step(i, carry):
            f = df64.fma(DF(aah_ref[i, :], aal_ref[i, :]), carry,
                         DF(s2h_ref[i, :], s2l_ref[i, :]))
            fuph_ref[i + 1, :] = f.hi
            fupl_ref[i + 1, :] = f.lo
            return f

        jax.lax.fori_loop(np.int32(0), np.int32(L), up_step, boa)

        # vectorized half-layer recovery: Fc_up = al*F_up[:L] + s1u
        fcu = df64.fma(DF(alh_ref[:, :], all_ref[:, :]),
                       DF(fuph_ref[:L, :], fupl_ref[:L, :]),
                       DF(s1h_ref[:, :], s1l_ref[:, :]))
        fcuph_ref[:] = fcu.hi
        fcupl_ref[:] = fcu.lo
        return np.int32(0)

    jax.lax.fori_loop(np.int32(0), np.int32(n_passes), one_pass,
                      np.int32(0))


def _pad_to(x, s_pad):
    pad = s_pad - x.shape[-1]
    if pad == 0:
        return x
    return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])


def _use_interpret() -> bool:
    """Pallas on the CPU backend only runs in interpreter mode (used by the
    test suite; the compiled path needs a real TPU)."""
    return jax.default_backend() == "cpu"


@partial(jax.jit, static_argnames=("n_passes", "tile_s"))
def fused_iso_sweep(a, b_nm, src_down, src_up, toa, boa_refl, boa_emis,
                    F_dir0, F_up_prev, *, n_passes: int, tile_s: int = 2048):
    """Pallas-fused iterative isothermal flux solve.

    Args (spectral-flattened, S = nbin * ny):
      a, b_nm, src_down, src_up: [L, S] recurrence coefficients (P/M, -N/M,
        sources / M -- see ops.sweep.iso_sweep_coeffs).
      toa: [S] TOA downward boundary; boa_refl: [S] surface albedo;
      boa_emis: [S] surface emission; F_dir0: [S] direct beam at BOA.
      F_up_prev: [L+1, S] upward flux of the previous solve.

    Returns (F_down, F_up): [L+1, S].
    """
    L, S = a.shape
    dtype = a.dtype
    tile_s = min(tile_s, max(128, 128 * ((S + 127) // 128)))
    s_pad = tile_s * ((S + tile_s - 1) // tile_s)
    n_tiles = s_pad // tile_s

    a_p = _pad_to(a, s_pad)
    b_p = _pad_to(b_nm, s_pad)
    sd_p = _pad_to(src_down, s_pad)
    su_p = _pad_to(src_up, s_pad)
    toa_p = _pad_to(toa[None, :], s_pad)
    refl_p = _pad_to(boa_refl[None, :], s_pad)
    emis_p = _pad_to(boa_emis[None, :], s_pad)
    fdir0_p = _pad_to(F_dir0[None, :], s_pad)
    fup_prev_p = _pad_to(F_up_prev, s_pad)

    lay_spec = pl.BlockSpec((L, tile_s), lambda t: (0, t),
                            memory_space=pltpu.VMEM)
    row_spec = pl.BlockSpec((1, tile_s), lambda t: (0, t),
                            memory_space=pltpu.VMEM)
    int_spec = pl.BlockSpec((L + 1, tile_s), lambda t: (0, t),
                            memory_space=pltpu.VMEM)

    # trace the kernel with x64 disabled: under jax_enable_x64 the
    # gridded pallas_call sprouts i64 scalars in the nested loop bodies
    # and Mosaic's i64 convert lowering recurses infinitely (TPU has no
    # i64 vectors); all kernel data is 32-bit anyway
    with jax.enable_x64(False):
        fdown, fup = pl.pallas_call(
            partial(_iso_sweep_kernel, nlayer=L, n_passes=n_passes),
            grid=(n_tiles,),
            in_specs=[lay_spec, lay_spec, lay_spec, lay_spec,
                      row_spec, row_spec, row_spec, row_spec, int_spec],
            out_specs=(int_spec, int_spec),
            out_shape=(jax.ShapeDtypeStruct((L + 1, s_pad), dtype),
                       jax.ShapeDtypeStruct((L + 1, s_pad), dtype)),
            interpret=_use_interpret(),
        )(a_p, b_p, sd_p, su_p, toa_p, refl_p, emis_p, fdir0_p,
          fup_prev_p)

    return fdown[:, :S], fup[:, :S]


@partial(jax.jit, static_argnames=("n_passes", "tile_s"))
def fused_iso_sweep_df64(a, b_nm, src_down, src_up, toa, boa_refl,
                         boa_emis, F_dir0, F_up_prev, *, n_passes: int,
                         tile_s: int = 1024):
    """fp64-accurate fused iso solve via double-float32 arithmetic.

    Same contract as fused_iso_sweep but with float64 inputs/outputs:
    each array is split into a (hi, lo) float32 pair outside the kernel,
    the recursion runs in df64 (ops.df64) on the VPU, and the pair is
    recombined to float64 on return.  Matches the fp64 lax.scan oracle to
    ~1e-13 relative at ~10x its speed (Mosaic cannot lower fp64 at all).
    """
    from helios_tpu.ops import df64

    out_dtype = a.dtype
    fd, fu = fused_iso_sweep_df64_pairs(
        df64.split(a), df64.split(b_nm), df64.split(src_down),
        df64.split(src_up), df64.split(toa), df64.split(boa_refl),
        df64.split(boa_emis), df64.split(F_dir0), df64.split(F_up_prev),
        n_passes=n_passes, tile_s=tile_s)
    return df64.combine(fd, out_dtype), df64.combine(fu, out_dtype)


_R = 8   # sublane rows per interleaved spectral tile (the f32 vreg height)


@partial(jax.jit, static_argnames=("n_passes", "tile_s"))
def fused_iso_sweep_df64_pairs(a, b_nm, src_down, src_up, toa, boa_refl,
                               boa_emis, F_dir0, F_up_prev, *,
                               n_passes: int, tile_s: int = 1024):
    """Pairs-native fused iso solve: every argument is an ops.df64.DF
    (hi, lo) float32 pair; returns (F_down, F_up) as DF pairs [L+1, S].

    This is the production entry point: the coefficient cache stores
    pairs, so the per-iteration path never touches XLA-emulated fp64
    (the split/combine casts alone cost ~0.1 ms/iteration at the
    reference workload).

    Layout: the padded spectral axis is VIEWED as [8, s_pad/8] (a free
    reshape, no data movement) and each kernel block is [.., 8, C] with
    C = tile_s/8 lanes, so the sequential layer chain runs on full
    (8, 128)-tiled vreg blocks -- see _iso_sweep_kernel_df64.  tile_s
    stays at 1024 spectral elements (C = 128) to keep the
    double-buffered pair pipeline under the ~16 MB/core VMEM budget.
    """
    from helios_tpu.ops import df64

    L, S = a.hi.shape
    tile_s = max(_R * 128, (tile_s // (_R * 128)) * (_R * 128))
    s_pad = tile_s * ((S + tile_s - 1) // tile_s)
    n_tiles = s_pad // tile_s
    C = tile_s // _R
    S8 = s_pad // _R

    def pad2(p, row=False):
        if row and p.hi.ndim == 1:
            return [_pad_to(p.hi[None, :], s_pad).reshape(1, _R, S8),
                    _pad_to(p.lo[None, :], s_pad).reshape(1, _R, S8)]
        n = p.hi.shape[0]
        return [_pad_to(p.hi, s_pad).reshape(n, _R, S8),
                _pad_to(p.lo, s_pad).reshape(n, _R, S8)]

    ins = []
    for arr in (a, b_nm, src_down, src_up):
        ins.extend(pad2(arr))
    for arr in (toa, boa_refl, boa_emis, F_dir0):
        ins.extend(pad2(arr, row=True))
    ins.extend(pad2(F_up_prev))

    lay_spec = pl.BlockSpec((L, _R, C), lambda t: (0, 0, t),
                            memory_space=pltpu.VMEM)
    row_spec = pl.BlockSpec((1, _R, C), lambda t: (0, 0, t),
                            memory_space=pltpu.VMEM)
    int_spec = pl.BlockSpec((L + 1, _R, C), lambda t: (0, 0, t),
                            memory_space=pltpu.VMEM)
    f32 = jnp.float32

    with jax.enable_x64(False):
        fdh, fdl, fuh, ful = pl.pallas_call(
            partial(_iso_sweep_kernel_df64, nlayer=L, n_passes=n_passes),
            grid=(n_tiles,),
            in_specs=[lay_spec] * 8 + [row_spec] * 8 + [int_spec] * 2,
            out_specs=(int_spec,) * 4,
            out_shape=tuple(jax.ShapeDtypeStruct((L + 1, _R, S8), f32)
                            for _ in range(4)),
            scratch_shapes=[pltpu.VMEM((L, _R, C), f32)] * 2,
            interpret=_use_interpret(),
        )(*ins)

    unview = lambda x: x.reshape(L + 1, s_pad)[:, :S]
    return (df64.DF(unview(fdh), unview(fdl)),
            df64.DF(unview(fuh), unview(ful)))


@partial(jax.jit, static_argnames=("n_passes", "tile_s"))
def fused_noniso_sweep(a_up, b_up, src_up_down, src_up_up, a_low, b_low,
                       src_low_down, src_low_up, toa, boa_refl, boa_emis,
                       F_dir0, F_up_prev, Fc_up_prev, *, n_passes: int,
                       tile_s: int = 1024):
    """Pallas-fused iterative non-isothermal flux solve, fp32.

    Mirrors fastpath.fband_noniso_flat: inputs are the FlatNonIsoCoeffs
    members ([L, S], [S] boundaries) plus the previous solve's upward
    fluxes; returns (F_down, F_up, Fc_down, Fc_up) [I/L, S].
    """
    L, S = a_up.shape
    dtype = a_up.dtype
    tile_s = min(tile_s, max(128, 128 * ((S + 127) // 128)))
    s_pad = tile_s * ((S + tile_s - 1) // tile_s)
    n_tiles = s_pad // tile_s

    ins = [_pad_to(x, s_pad) for x in
           (a_up, b_up, src_up_down, src_up_up,
            a_low, b_low, src_low_down, src_low_up)]
    ins += [_pad_to(x[None, :], s_pad) for x in
            (toa, boa_refl, boa_emis, F_dir0)]
    ins += [_pad_to(F_up_prev, s_pad), _pad_to(Fc_up_prev, s_pad)]

    lay_spec = pl.BlockSpec((L, tile_s), lambda t: (0, t),
                            memory_space=pltpu.VMEM)
    row_spec = pl.BlockSpec((1, tile_s), lambda t: (0, t),
                            memory_space=pltpu.VMEM)
    int_spec = pl.BlockSpec((L + 1, tile_s), lambda t: (0, t),
                            memory_space=pltpu.VMEM)

    with jax.enable_x64(False):
        fdown, fup, fcdown, fcup = pl.pallas_call(
            partial(_noniso_sweep_kernel, nlayer=L, n_passes=n_passes),
            grid=(n_tiles,),
            in_specs=([lay_spec] * 8 + [row_spec] * 4
                      + [int_spec, lay_spec]),
            out_specs=(int_spec, int_spec, lay_spec, lay_spec),
            out_shape=(jax.ShapeDtypeStruct((L + 1, s_pad), dtype),
                       jax.ShapeDtypeStruct((L + 1, s_pad), dtype),
                       jax.ShapeDtypeStruct((L, s_pad), dtype),
                       jax.ShapeDtypeStruct((L, s_pad), dtype)),
            scratch_shapes=[pltpu.VMEM((L, tile_s), dtype)] * 3,
            interpret=_use_interpret(),
        )(*ins)

    return (fdown[:, :S], fup[:, :S], fcdown[:, :S], fcup[:, :S])


@partial(jax.jit, static_argnames=("n_passes", "tile_s"))
def fused_noniso_sweep_df64(a_up, b_up, src_up_down, src_up_up, a_low,
                            b_low, src_low_down, src_low_up, toa,
                            boa_refl, boa_emis, F_dir0, F_up_prev,
                            Fc_up_prev, *, n_passes: int,
                            tile_s: int = 256):
    """fp64-accurate fused non-iso solve via df64 pairs.

    Mirrors fastpath.fband_noniso_flat: inputs are the FlatNonIsoCoeffs
    members ([L, S] fp64, [S] boundaries) plus the previous solve's
    upward fluxes; returns (F_down, F_up, Fc_down, Fc_up) fp64.
    """
    from helios_tpu.ops import df64

    out_dtype = a_up.dtype
    sp = df64.split
    out = fused_noniso_sweep_df64_pairs(
        sp(a_up), sp(b_up), sp(src_up_down), sp(src_up_up), sp(a_low),
        sp(b_low), sp(src_low_down), sp(src_low_up), sp(toa),
        sp(boa_refl), sp(boa_emis), sp(F_dir0), sp(F_up_prev),
        sp(Fc_up_prev), n_passes=n_passes, tile_s=tile_s)
    return tuple(df64.combine(p, out_dtype) for p in out)


@partial(jax.jit, static_argnames=("n_passes", "tile_s"))
def fused_noniso_sweep_df64_pairs(a_up, b_up, src_up_down, src_up_up,
                                  a_low, b_low, src_low_down, src_low_up,
                                  toa, boa_refl, boa_emis, F_dir0,
                                  F_up_prev, Fc_up_prev, *, n_passes: int,
                                  tile_s: int = 256):
    """Pairs-native fused non-iso solve: all arguments ops.df64.DF
    (hi, lo) float32 pairs; returns (F_down, F_up, Fc_down, Fc_up) pairs.

    tile_s = 256: the non-iso kernel holds 2x the iso kernel's arrays
    (two half-layer recurrences), and the double-buffered tile pipeline
    must stay inside the ~16 MB VMEM budget.

    Measured dead end (round 5): the iso kernel's sublane-interleaved
    [.., R, C] layout does NOT transfer here.  R = 8 tiles need ~19 MB
    of scoped VMEM (OOM at compile); R = 4 compiled but ran 2.5x SLOWER
    (3.10 ms vs 1.25 ms at 105 x 7700 x 4) -- with a 3-D ref Mosaic
    tiles only the last two dims, so every [L, R, C] vectorized stage
    (8 of the kernel's 10 df64 fmas per cell) degrades into L slab ops
    on one (R,128) vreg each, while the 2-D [L, S] layout fuses them
    into dense multi-vreg ops.  The iso kernel wins from the interleave
    because its runtime is chain-dominated (2 of 4 fmas sequential);
    this kernel is vectorized-stage-dominated, so it keeps the 2-D
    layout and pays 1-of-8 sublane occupancy only on the chain.
    """
    from helios_tpu.ops import df64

    L, S = a_up.hi.shape
    tile_s = min(tile_s, max(128, 128 * ((S + 127) // 128)))
    s_pad = tile_s * ((S + tile_s - 1) // tile_s)
    n_tiles = s_pad // tile_s

    def pad2(p, row=False):
        if row and p.hi.ndim == 1:
            return [_pad_to(p.hi[None, :], s_pad),
                    _pad_to(p.lo[None, :], s_pad)]
        return [_pad_to(p.hi, s_pad), _pad_to(p.lo, s_pad)]

    ins = []
    for arr in (a_up, b_up, src_up_down, src_up_up,
                a_low, b_low, src_low_down, src_low_up):
        ins.extend(pad2(arr))
    for arr in (toa, boa_refl, boa_emis, F_dir0):
        ins.extend(pad2(arr, row=True))
    ins.extend(pad2(F_up_prev))
    ins.extend(pad2(Fc_up_prev))

    lay_spec = pl.BlockSpec((L, tile_s), lambda t: (0, t),
                            memory_space=pltpu.VMEM)
    row_spec = pl.BlockSpec((1, tile_s), lambda t: (0, t),
                            memory_space=pltpu.VMEM)
    int_spec = pl.BlockSpec((L + 1, tile_s), lambda t: (0, t),
                            memory_space=pltpu.VMEM)
    f32 = jnp.float32

    with jax.enable_x64(False):
        out = pl.pallas_call(
            partial(_noniso_sweep_kernel_df64, nlayer=L,
                    n_passes=n_passes),
            grid=(n_tiles,),
            in_specs=([lay_spec] * 16 + [row_spec] * 8
                      + [int_spec] * 2 + [lay_spec] * 2),
            out_specs=(int_spec, int_spec, int_spec, int_spec,
                       lay_spec, lay_spec, lay_spec, lay_spec),
            out_shape=(
                (jax.ShapeDtypeStruct((L + 1, s_pad), f32),) * 4
                + (jax.ShapeDtypeStruct((L, s_pad), f32),) * 4),
            scratch_shapes=[pltpu.VMEM((L, tile_s), f32)] * 6,
            interpret=_use_interpret(),
        )(*ins)

    fdh, fdl, fuh, ful, fcdh, fcdl, fcuh, fcul = out
    pr = lambda h, l: df64.DF(h[:, :S], l[:, :S])
    return (pr(fdh, fdl), pr(fuh, ful), pr(fcdh, fcdl), pr(fcuh, fcul))


def fband_iso_pallas(cells, planckband_lay, F_dir, surf_albedo, F_up_prev,
                     *, n_passes: int, scat_corr: int, i2s_transition: float,
                     epsi: float, mu_star: float, dir_beam: int,
                     f_factor: float, R_star: float, a: float):
    """Drop-in replacement for ops.sweep.fband_iso using the fused kernel.

    Same signature/semantics; inputs [L, B, Y], outputs [L+1, B, Y].
    """
    from helios_tpu.ops import sweep as sweep_ops

    C = sweep_ops.iso_sweep_coeffs(
        cells, planckband_lay, F_dir, surf_albedo, scat_corr=scat_corr,
        i2s_transition=i2s_transition, epsi=epsi, mu_star=mu_star,
        dir_beam=dir_beam, f_factor=f_factor, R_star=R_star, a=a)

    L, B, Y = C.a.shape
    S = B * Y
    flat = lambda x: x.reshape(x.shape[:-2] + (S,))
    toa = jnp.broadcast_to(C.toa[:, None], (B, Y)).reshape(S)
    refl = jnp.broadcast_to(C.boa_refl[:, None], (B, Y)).reshape(S)
    emis = C.boa_emis.reshape(S)
    fdir0 = F_dir[0].reshape(S)

    # fp64 inputs go through the df64 kernel (Mosaic cannot lower fp64;
    # interpret mode tolerates it, the compiled path must not see it)
    solve = (fused_iso_sweep_df64 if C.a.dtype == jnp.float64
             else fused_iso_sweep)
    fdown, fup = solve(
        flat(C.a), flat(C.b_nm), flat(C.src_down), flat(C.src_up),
        toa.astype(C.a.dtype), refl.astype(C.a.dtype),
        emis.astype(C.a.dtype), fdir0.astype(C.a.dtype),
        flat(F_up_prev), n_passes=n_passes)

    return fdown.reshape(L + 1, B, Y), fup.reshape(L + 1, B, Y)
