"""On-the-fly opacity mixing: correlated-k addition and Random Overlap.

TPU-native redesign of add_to_mixed_opac (source/kernels.cu:3263-3399),
calc_h2o_scat (:3404-3440) and add_to_mixed_scat (:3444-3459).

The reference's Random Overlap runs, per (bin, layer) CUDA thread, an
insertion sort of the 400 pairwise opacity sums (with a fill-order trick to
pre-sort; the value multiset is identical).  Here the whole grid is mixed
at once: one batched `lax.sort` over a [layer, bin, ny*ny] tensor, the
cumulative y-positions as a cumsum, and the reference's sequential
rebinning loop (whose interval index advances at least one step per output
point -- an important quirk, see `_rebin_indices`) as a tiny 20-step scan.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from helios_tpu import constants as pc


def correlated_k_add(mixed_opac, new_opac):
    """Correlated-k mixing: plain addition (kernels.cu:3304-3310)."""
    return mixed_opac + new_opac


def _rebin_indices(yg, gauss_y):
    """Interval index w(y) used to rebin the sorted k-function onto each
    Gauss point (kernels.cu:3379-3396).

    The reference walks w upward and advances y when yg[w] first exceeds
    gauss_y[y]; because w keeps moving, the interval used for y is
    max(first crossing, w(y-1)+1) -- consecutive Gauss points never share
    an interval even when they fall inside the same one.

    yg: [..., n2]; gauss_y: [ny].  Returns w: [..., ny] int32 in [1, n2-1].
    """
    n2 = yg.shape[-1]

    def step(w_prev, g):
        first = jnp.sum(yg <= g, axis=-1).astype(jnp.int32)  # first yg > g
        w = jnp.maximum(first, w_prev + 1)
        w = jnp.clip(w, 1, n2 - 1)
        return w, w

    w0 = jnp.zeros(yg.shape[:-1], jnp.int32)
    _, ws = jax.lax.scan(step, w0, gauss_y)
    return jnp.moveaxis(ws, 0, -1)                 # [..., ny]


def random_overlap_mix(mixed_opac, new_opac, gauss_weight, gauss_y):
    """Random Overlap of two k-distributions (kernels.cu:3311-3397).

    Args:
      mixed_opac, new_opac: [..., ny] k-coefficients (ascending in y).
      gauss_weight, gauss_y: [ny] quadrature weights and shifted nodes.

    Returns the re-binned mixed k-coefficients [..., ny].
    """
    ny = gauss_y.shape[0]
    sums = mixed_opac[..., :, None] + new_opac[..., None, :]
    sums = sums.reshape(mixed_opac.shape[:-1] + (ny * ny,))
    w2 = (0.5 * gauss_weight[:, None]) * (0.5 * gauss_weight[None, :])
    w2 = jnp.broadcast_to(w2.reshape(ny * ny), sums.shape)

    sorted_k, sorted_w = jax.lax.sort((sums, w2), dimension=-1,
                                      num_keys=1)

    # cumulative y positions: yg[w] = sum_{v<w} wt[v] + 0.5*wt[w]
    csum = jnp.cumsum(sorted_w, axis=-1)
    yg = csum - 0.5 * sorted_w

    w = _rebin_indices(yg, gauss_y)                # [..., ny]
    yg_lo = jnp.take_along_axis(yg, w - 1, axis=-1)
    yg_hi = jnp.take_along_axis(yg, w, axis=-1)
    k_lo = jnp.take_along_axis(sorted_k, w - 1, axis=-1)
    k_hi = jnp.take_along_axis(sorted_k, w, axis=-1)
    g = gauss_y.reshape((1,) * (yg.ndim - 1) + (ny,))
    return (k_lo * (yg_hi - g) + k_hi * (g - yg_lo)) / (yg_hi - yg_lo)


def add_species_opacity(mixed_opac, opac_spec, vmr, mass_spec,
                        meanmolmass, gauss_weight, gauss_y, *,
                        species_index: int, ro_method: int):
    """Mix one species into the running opacity (add_to_mixed_opac,
    kernels.cu:3263-3399).

    Args:
      mixed_opac: [L, B, Y] running mixed opacity [cm^2/g].
      opac_spec: [L, B, Y] species opacity [cm^2/g of species].
      vmr: [L] volume mixing ratio; mass_spec: species mass [g];
      meanmolmass: [L] mean molecular mass [g].
      species_index: position in the mixing order (0 => correlated-k).
      ro_method: 1 for Random Overlap, 0 for correlated-k.

    Returns updated mixed opacity [L, B, Y].
    """
    ny = mixed_opac.shape[-1]
    new_opac = (vmr * mass_spec / meanmolmass)[:, None, None] * opac_spec

    if ro_method == 0 or species_index == 0 or ny == 1:
        return correlated_k_add(mixed_opac, new_opac)

    # per-cell negligible-overlap test (kernels.cu:3296-3302): if one
    # opacity's maximum is under 1% of the other's minimum, skip RO
    negligible = ((0.01 * mixed_opac[..., 0] > new_opac[..., ny - 1])
                  | (0.01 * new_opac[..., 0] > mixed_opac[..., ny - 1]))
    ck = correlated_k_add(mixed_opac, new_opac)
    ro = random_overlap_mix(mixed_opac, new_opac, gauss_weight, gauss_y)
    return jnp.where(negligible[..., None], ck, ro)


# --------------------------------------------------------------------------- #
# Rayleigh scattering accumulation
# --------------------------------------------------------------------------- #

def add_species_scat(mixed_scat, scat_cross_spec, vmr):
    """scat += vmr * sigma_species (add_to_mixed_scat, kernels.cu:3444-3459).

    mixed_scat: [L, B]; scat_cross_spec: [B] or [L, B]; vmr: [L].
    """
    return mixed_scat + vmr[:, None] * scat_cross_spec


def h2o_refractive_index(wave, press, temp, f_h2o, mass_h2o):
    """Density-dependent H2O refractive index (calc_index_h2o,
    kernels.cu:3174-3205; Schiebener et al. 1990 formulation).

    wave: [B]; press/temp/f_h2o: [L].  Returns [L, B].
    """
    dens = f_h2o * press * mass_h2o / (pc.K_B * temp)       # [L]
    lamda = (wave / 0.589e-4)[None, :]                      # [L?, B]
    delta = jnp.minimum(1.0, dens)[:, None]
    theta = (temp / 273.15)[:, None]

    lamda_UV, lamda_IR = 0.229202, 5.432937
    a0, a1, a2, a3 = 0.244257733, 0.974634476e-2, -0.373234996e-2, \
        0.268678472e-3
    a4, a5, a6, a7 = 0.158920570e-2, 0.245934259e-2, 0.900704920, \
        -0.166626219e-1

    A = delta * (a0 + a1 * delta + a2 * theta + a3 * lamda ** 2 * theta
                 + a4 * lamda ** -2
                 + a5 / (lamda ** 2 - lamda_UV ** 2)
                 + a6 / (lamda ** 2 - lamda_IR ** 2)
                 + a7 * delta ** 2)
    return jnp.sqrt((2.0 * A + 1.0) / (1.0 - A))


def h2o_scat_cross(wave, press, temp, vmr_h2o, mass_h2o):
    """On-the-fly H2O Rayleigh cross section (calc_h2o_scat,
    kernels.cu:3404-3440).  Returns [L, B]."""
    index = h2o_refractive_index(wave, press, temp, vmr_h2o, mass_h2o)
    n_ref = (vmr_h2o * press / (pc.K_B * temp))[:, None]    # [L, 1]
    King = (6.0 + 3.0 * 3e-4) / (6.0 - 7.0 * 3e-4)
    lamda_limit = 2.5e-4
    cross = (24.0 * pc.PI ** 3 / (n_ref ** 2 * wave[None, :] ** 4)
             * ((index ** 2 - 1.0) / (index ** 2 + 2.0)) ** 2 * King)
    return jnp.where(wave[None, :] < lamda_limit, cross, 0.0)
