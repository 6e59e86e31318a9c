"""RRTMGP correlated-k gas-optics numerics, vectorized for TPU.

Re-implements the four reference kernels
(rrtmgp/kernels/mo_gas_optics_rrtmgp_kernels.F90):

  - ``interpolation`` (:37-170)        -> :func:`interpolation`
  - ``compute_tau_absorption`` (:176-338, major :345-396, minor :402-501)
      -> :func:`tau_major` + :func:`tau_minor`
  - ``compute_tau_rayleigh`` (:506-565) -> :func:`tau_rayleigh`
  - ``compute_Planck_source`` (:568-710) -> :func:`planck_fraction` +
      :func:`planck_sources`

Design notes (TPU-first):
  * All index arithmetic is 0-based; table lookups become flat gathers on
    device-resident (HBM-replicated) tables. The 2x2x2 major interpolation
    is an 8-corner loop of (ncol, nlay, ngpt) gathers - bandwidth-bound,
    no scalar loops, no ragged control flow.
  * TPU tiled layouts pad the two minor-most dimensions (to 8x128 for f32),
    so every multi-dim array keeps its LARGE axes trailing: per-flavor
    interpolation state is (2[itemp], ..., nflav, ncol, nlay), never
    (..., nflav, 2) - a trailing 2 would inflate memory 64x.
  * The g-point -> flavor map is *static* data; per-cell flavor selection
    is a flat gather producing (ncol, nlay, ngpt) arrays (g-points on
    lanes).
  * Minor gases are a static Python loop (unrolled under jit) over
    absorbers, each touching only its (static) g-point window; the
    reference's per-column layer ranges become tropopause masks
    (equivalent for monotonic pressure profiles).

Array conventions (this module):
  col_gas            : (ngas+1, ncol, nlay), dry air at index 0
  jtemp, jpress      : (ncol, nlay) int32 (0-based lower indices)
  tropo              : (ncol, nlay) bool, True = lower atmosphere
  jeta, col_mix      : (2, nflav, ncol, nlay)        axis 0 = itemp
  fminor             : (2, 2, nflav, ncol, nlay)     [itemp, deta]
  fmajor             : (2, 2, 2, nflav, ncol, nlay)  [itemp, dpress, deta]
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "InterpCoeffs",
    "interpolation",
    "tau_major",
    "tau_minor",
    "tau_rayleigh",
    "planck_fraction",
    "planck_sources",
    "interp1d_table",
]


class InterpCoeffs(NamedTuple):
    jtemp: jax.Array      # (ncol, nlay) int32
    ftemp: jax.Array      # (ncol, nlay)
    jpress: jax.Array     # (ncol, nlay) int32
    fpress: jax.Array     # (ncol, nlay)
    tropo: jax.Array      # (ncol, nlay) bool
    jeta: jax.Array       # (2, nflav, ncol, nlay) int32
    col_mix: jax.Array    # (2, nflav, ncol, nlay)
    fminor: jax.Array     # (2, 2, nflav, ncol, nlay)
    fmajor: jax.Array     # (2, 2, 2, nflav, ncol, nlay)


def interpolation(play, tlay, col_gas, *,
                  flavor_gas1, flavor_gas2, neta: int,
                  press_ref_log, temp_ref,
                  press_ref_log_delta, temp_ref_min, temp_ref_delta,
                  press_ref_trop_log, vmr_ref) -> InterpCoeffs:
    """Temperature/pressure/eta interpolation coefficients (reference
    ``rrtmgp_interpolation``, kernels :37-170).

    play/tlay: (ncol, nlay); col_gas: (ngas+1, ncol, nlay) with dry air at
    index 0; flavor_gas1/2: (nflav,) static int arrays indexing col_gas
    axis 0; vmr_ref: (2, ngas+1, ntemp) reference VMRs.
    """
    dtype = play.dtype
    ntemp = temp_ref.shape[0]
    npres = press_ref_log.shape[0]

    # NOTE: each (index, fraction) pair below derives from ONE pinned value.
    # Without the optimization_barrier, XLA may duplicate the shared
    # subexpression into the index fusion and the fraction fusion; under
    # non-bit-deterministic arithmetic (e.g. this stack's emulated float64)
    # the two copies can round to opposite sides of a grid node, pairing an
    # index with the wrong fraction.

    # --- temperature index/fraction (reference :106-108) ---
    loctemp = jax.lax.optimization_barrier(
        (tlay - (temp_ref_min - temp_ref_delta)) / temp_ref_delta)
    jt_raw = jnp.floor(loctemp).astype(jnp.int32)               # 1-based raw
    jtemp1 = jnp.clip(jt_raw, 1, ntemp - 1)                     # 1-based clamped
    temp_ref_j = jnp.take(jnp.asarray(temp_ref, dtype),
                          jnp.clip(jt_raw - 1, 0, ntemp - 1))   # temp_ref(jtemp_)
    ftemp = (tlay - temp_ref_j) / temp_ref_delta
    jtemp = jtemp1 - 1                                          # 0-based

    # --- pressure index/fraction (reference :111-114) ---
    locpress = jax.lax.optimization_barrier(
        1.0 + (jnp.log(play) - press_ref_log[0]) / press_ref_log_delta)
    jpress_f = jnp.clip(jnp.trunc(locpress), 1.0, float(npres - 1))
    fpress = locpress - jpress_f
    jpress = jpress_f.astype(jnp.int32) - 1                     # 0-based

    tropo = play > jnp.exp(jnp.asarray(press_ref_trop_log, dtype))

    # --- eta per flavor and reference temperature (reference :121-168) ---
    # Precompute vmr ratio r[itropo, flav, jtemp] = vmr1/vmr2 (static)
    vmr_ref = np.asarray(vmr_ref)
    g1 = np.asarray(flavor_gas1)
    g2 = np.asarray(flavor_gas2)
    ratio = vmr_ref[:, g1, :] / vmr_ref[:, g2, :]               # (2, nflav, ntemp)
    ratio_t = jnp.asarray(ratio, dtype)

    tiny = jnp.finfo(dtype).tiny
    cg1 = col_gas[g1]                                           # (nflav, c, l)
    cg2 = col_gas[g2]

    cms, jes, fes = [], [], []
    for it in (0, 1):
        jt_i = jnp.clip(jtemp + it, 0, ntemp - 1)               # (c, l)
        r_lo = jnp.take(ratio_t[0], jt_i, axis=-1)              # (nflav, c, l)
        r_hi = jnp.take(ratio_t[1], jt_i, axis=-1)
        r = jnp.where(tropo[None], r_lo, r_hi)
        cm = cg1 + r * cg2                                      # (nflav, c, l)
        eta = jnp.where(cm > 2.0 * tiny,
                        cg1 / jnp.where(cm > 2.0 * tiny, cm, 1.0), 0.5)
        loceta = jax.lax.optimization_barrier(eta * (neta - 1))
        trunc_loceta = jax.lax.optimization_barrier(jnp.trunc(loceta))
        jeta1 = jnp.minimum(trunc_loceta.astype(jnp.int32) + 1, neta - 1)
        feta = loceta - trunc_loceta
        cms.append(cm)
        jes.append(jeta1 - 1)                                   # 0-based
        fes.append(feta)

    col_mix = jnp.stack(cms, axis=0)                            # (2, nflav, c, l)
    jeta = jnp.stack(jes, axis=0)
    feta = jnp.stack(fes, axis=0)

    # --- weight products (reference :156-164) ---
    ft = jnp.stack([1.0 - ftemp, ftemp], axis=0)[:, None]       # (2, 1, c, l)
    fminor = jnp.stack([(1.0 - feta) * ft, feta * ft], axis=1)  # (2, 2, nflav, c, l)
    fp = jnp.stack([1.0 - fpress, fpress], axis=0)              # (2, c, l)
    fmajor = fminor[:, None] * fp[None, :, None, None]          # (2, 2, 2, nflav, c, l)
    return InterpCoeffs(jtemp=jtemp, ftemp=ftemp, jpress=jpress, fpress=fpress,
                        tropo=tropo, jeta=jeta, col_mix=col_mix,
                        fminor=fminor, fmajor=fmajor)


def _band_flavor_state(coeffs: InterpCoeffs, it: int, flav_lo: int,
                       flav_hi: int, need_col_mix: bool):
    """Per-cell jeta (and col_mix) for one band at one reference
    temperature: the band's flavor is static per atmosphere, so this is a
    2-way select, not a gather."""
    if flav_lo == flav_hi:
        je = coeffs.jeta[it, flav_lo]
        cm = coeffs.col_mix[it, flav_lo] if need_col_mix else None
    else:
        je = jnp.where(coeffs.tropo, coeffs.jeta[it, flav_lo],
                       coeffs.jeta[it, flav_hi])
        cm = (jnp.where(coeffs.tropo, coeffs.col_mix[it, flav_lo],
                        coeffs.col_mix[it, flav_hi])
              if need_col_mix else None)
    return je, cm


def _band_weight(coeffs: InterpCoeffs, it: int, dp: int, de: int,
                 flav_lo: int, flav_hi: int):
    if flav_lo == flav_hi:
        return coeffs.fmajor[it, dp, de, flav_lo]
    return jnp.where(coeffs.tropo, coeffs.fmajor[it, dp, de, flav_lo],
                     coeffs.fmajor[it, dp, de, flav_hi])


def tau_major(coeffs: InterpCoeffs, kmajor, *, gpoint_flavor, band_lims_gpt,
              scale_by_col_mix: bool = True):
    """Major-gas optical depth (reference gas_optical_depths_major /
    interpolate3D_byflav, kernels :345-396, :765-803).

    kmajor: (ntemp, neta, npres+1, ngpt) device table.
    gpoint_flavor: static (2, ngpt) 0-based flavor per (itropo, gpt);
    band_lims_gpt: static (nbnd, 2) 1-based inclusive g-point limits.

    TPU structure: every g-point in a band shares the same flavor and
    therefore the same 8 interpolation corners, so the lookup is a *row*
    gather — per (col, lay) pull contiguous rows of gpts-per-band values
    from the band's table slice. This is ~(gpts per band)x fewer gather
    descriptors than an elementwise gather and keeps g-points on lanes.
    With ``scale_by_col_mix=False`` computes the unit-scaled interpolation
    (the Planck-fraction variant). Returns (ncol, nlay, ngpt).
    """
    ntemp, neta, npresp1, ngpt = kmajor.shape
    k2 = kmajor.reshape(-1, ngpt)  # row = (jt*neta + je)*npresp1 + jp
    gflav = np.asarray(gpoint_flavor)
    bands = np.asarray(band_lims_gpt)

    jp_base = coeffs.jpress + jnp.where(coeffs.tropo, 0, 1)     # (c, l)

    out = []
    for b in range(bands.shape[0]):
        g0, g1 = int(bands[b, 0]) - 1, int(bands[b, 1]) - 1
        flav_lo, flav_hi = int(gflav[0, g0]), int(gflav[1, g0])
        kb = k2[:, g0:g1 + 1]
        acc = None
        for it in range(2):
            jt = jnp.clip(coeffs.jtemp + it, 0, ntemp - 1)
            je, cm = _band_flavor_state(coeffs, it, flav_lo, flav_hi,
                                        scale_by_col_mix)
            for dp in range(2):
                jp = jp_base + dp
                for de in range(2):
                    wgt = _band_weight(coeffs, it, dp, de, flav_lo, flav_hi)
                    if cm is not None:
                        wgt = wgt * cm
                    rows = (jt * neta + jnp.clip(je + de, 0, neta - 1)
                            ) * npresp1 + jp
                    term = wgt[..., None] * jnp.take(kb, rows, axis=0)
                    acc = term if acc is None else acc + term
        out.append(acc)
    return jnp.concatenate(out, axis=-1)


def planck_fraction(coeffs: InterpCoeffs, pfracin, *, gpoint_flavor,
                    band_lims_gpt):
    """Planck fraction: same 3-D interpolation as tau_major with unit
    scaling (reference compute_Planck_source :619-634)."""
    return tau_major(coeffs, pfracin, gpoint_flavor=gpoint_flavor,
                     band_lims_gpt=band_lims_gpt, scale_by_col_mix=False)


def tau_minor(tau, coeffs: InterpCoeffs, kminor, *, lower: bool,
              minor_limits_gpt, kminor_start, idx_minor, idx_minor_scaling,
              minor_scales_with_density, scale_by_complement,
              gpt_flavor_atm, play, tlay, col_gas, idx_h2o: int):
    """Minor-gas optical depths for one atmosphere (reference
    gas_optical_depths_minor, kernels :402-501). All per-minor metadata is
    static; the loop unrolls under jit.

    kminor: (ntemp, neta, nminork) device table; col_gas (ngas+1, c, l).
    minor_limits_gpt: 0-based inclusive windows; gpt_flavor_atm: (ngpt,)
    static 0-based flavors for this atmosphere.
    """
    dtype = tau.dtype
    nm = len(kminor_start)
    if nm == 0:
        return tau
    ntemp, neta, nminork = kminor.shape
    k2 = kminor.reshape(-1, nminork)    # rows = jtemp*neta + jeta

    mask = coeffs.tropo if lower else jnp.logical_not(coeffs.tropo)
    maskf = mask.astype(dtype)

    inv_col_dry = 1.0 / col_gas[0]
    dry_fact = 1.0 / (1.0 + col_gas[idx_h2o] * inv_col_dry)

    for m in range(nm):
        g0, g1 = int(minor_limits_gpt[m][0]), int(minor_limits_gpt[m][1])
        w = g1 - g0 + 1
        start = int(kminor_start[m])
        flav = int(gpt_flavor_atm[g0])

        scaling = col_gas[int(idx_minor[m])]
        if minor_scales_with_density[m]:
            scaling = scaling * (0.01 * play / tlay)
            isc = int(idx_minor_scaling[m])
            if isc > 0:
                frac = col_gas[isc] * inv_col_dry * dry_fact
                if scale_by_complement[m]:
                    scaling = scaling * (1.0 - frac)
                else:
                    scaling = scaling * frac

        # 2x2 eta/temp interpolation over the static g-point window
        acc = None
        for it in range(2):
            jt = jnp.clip(coeffs.jtemp + it, 0, ntemp - 1)
            je_f = coeffs.jeta[it, flav]                       # (c, l)
            fm = coeffs.fminor[it, :, flav]                    # (2, c, l)
            for de in range(2):
                je = jnp.clip(je_f + de, 0, neta - 1)
                rows = jt * neta + je                          # (c, l)
                kk = jnp.take(k2[:, start:start + w], rows, axis=0)  # (c,l,w)
                term = fm[de][..., None] * kk
                acc = term if acc is None else acc + term
        contrib = (scaling * maskf)[..., None] * acc
        tau = tau.at[:, :, g0:g1 + 1].add(contrib)
    return tau


def tau_rayleigh(coeffs: InterpCoeffs, krayl, *, gpoint_flavor, band_lims_gpt,
                 col_gas, col_dry, idx_h2o: int):
    """Rayleigh scattering optical depth (reference compute_tau_rayleigh,
    kernels :506-565). krayl: (ntemp, neta, ngpt, 2) device table
    (last axis: lower/upper atmosphere); col_gas (ngas+1, c, l).
    Same per-band row-gather structure as :func:`tau_major`, with the
    atmosphere index folded into the row."""
    ntemp, neta, ngpt, _ = krayl.shape
    # rows = (itropo*ntemp + jt)*neta + je (constant relayout, folded by XLA)
    k2 = jnp.moveaxis(krayl, -1, 0).reshape(-1, ngpt)
    gflav = np.asarray(gpoint_flavor)
    bands = np.asarray(band_lims_gpt)

    itropo = jnp.where(coeffs.tropo, 0, 1)
    out = []
    for b in range(bands.shape[0]):
        g0, g1 = int(bands[b, 0]) - 1, int(bands[b, 1]) - 1
        flav_lo, flav_hi = int(gflav[0, g0]), int(gflav[1, g0])
        kb = k2[:, g0:g1 + 1]
        acc = None
        for it in range(2):
            jt = jnp.clip(coeffs.jtemp + it, 0, ntemp - 1)
            je, _ = _band_flavor_state(coeffs, it, flav_lo, flav_hi, False)
            for de in range(2):
                if flav_lo == flav_hi:
                    w = coeffs.fminor[it, de, flav_lo]
                else:
                    w = jnp.where(coeffs.tropo, coeffs.fminor[it, de, flav_lo],
                                  coeffs.fminor[it, de, flav_hi])
                rows = (itropo * ntemp + jt) * neta + jnp.clip(je + de, 0,
                                                               neta - 1)
                term = w[..., None] * jnp.take(kb, rows, axis=0)
                acc = term if acc is None else acc + term
        out.append(acc)
    k = jnp.concatenate(out, axis=-1)
    return k * (col_gas[idx_h2o] + col_dry)[..., None]


def interp1d_table(val, offset, delta, table):
    """Linear interpolation returning all values along the table's second
    axis (reference interpolate1D, kernels :715-737).
    val: (...); table: (ntab, nout). Returns (..., nout)."""
    ntab = table.shape[0]
    val0 = jax.lax.optimization_barrier((val - offset) / delta)
    frac = val0 - jnp.trunc(val0)
    idx = jnp.clip(val0.astype(jnp.int32), 0, ntab - 2)
    lo = jnp.take(table, idx, axis=0)
    hi = jnp.take(table, idx + 1, axis=0)
    return lo + frac[..., None] * (hi - lo)


def planck_sources(coeffs: InterpCoeffs, *, pfracin, totplnk, totplnk_delta,
                   temp_ref_min, gpoint_flavor, band_lims_gpt, gpt2band,
                   tlay, tlev, tsfc, top_at_1: bool):
    """Planck source functions (reference compute_Planck_source,
    kernels :568-710): pfrac interp, 1-D totplnk interp by temperature,
    band->gpt mapping, geometric-mean level sources, surface Jacobian by
    1 K finite difference.

    Returns (sfc_src, lay_src, lev_src, sfc_src_jac)."""
    pfrac = planck_fraction(coeffs, pfracin, gpoint_flavor=gpoint_flavor,
                            band_lims_gpt=band_lims_gpt)     # (c, l, g)
    band_of_gpt = jnp.asarray(np.asarray(gpt2band), jnp.int32)

    def planck_bands(t):
        return interp1d_table(t, temp_ref_min, totplnk_delta, totplnk)

    # surface (+1K Jacobian, reference delta_Tsurf=1)
    sfc_lay = -1 if top_at_1 else 0
    pf_sfc = pfrac[:, sfc_lay, :]                            # (c, g)
    pb_sfc = planck_bands(tsfc)                              # (c, nbnd)
    pb_sfc1 = planck_bands(tsfc + 1.0)
    sfc_src = pf_sfc * pb_sfc[:, band_of_gpt]
    sfc_src_jac = pf_sfc * (pb_sfc1 - pb_sfc)[:, band_of_gpt]

    # layers
    pb_lay = planck_bands(tlay)                              # (c, l, nbnd)
    lay_src = pfrac * pb_lay[..., band_of_gpt]

    # levels: geometric mean of adjacent layers' pfrac in the interior
    # (reference :695-706); end levels use the adjacent layer's pfrac
    pf_in = jnp.sqrt(pfrac[:, 1:, :] * pfrac[:, :-1, :])     # (c, l-1, g)
    pf_lev = jnp.concatenate([pfrac[:, :1, :], pf_in, pfrac[:, -1:, :]],
                             axis=1)                         # (c, l+1, g)
    pb_lev = planck_bands(tlev)
    lev_src = pf_lev * pb_lev[..., band_of_gpt]
    return sfc_src, lay_src, lev_src, sfc_src_jac
