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
  * The g-point -> flavor map is *static* data, so flavor selection is a
    compile-time gather of the per-flavor interpolation state.
  * Minor gases are a static Python loop (unrolled under jit) over absorbers,
    each touching only its (static) g-point window; the reference's
    per-column layer ranges become tropopause masks (equivalent for
    monotonic pressure profiles).
  * Everything is pure; the k-distribution tables ride in as arrays.

Index/weight array conventions (this module only):
  jtemp, fpress, ... : (ncol, nlay)
  jeta, col_mix      : (ncol, nlay, nflav, 2)        last axis = itemp
  fminor             : (ncol, nlay, nflav, 2, 2)     [itemp, deta]
  fmajor             : (ncol, nlay, nflav, 2, 2, 2)  [itemp, dpress, deta]
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
    jtemp: jax.Array      # (ncol, nlay) int32, 0-based lower temp index
    ftemp: jax.Array      # (ncol, nlay)
    jpress: jax.Array     # (ncol, nlay) int32, 0-based lower press index
    fpress: jax.Array     # (ncol, nlay)
    tropo: jax.Array      # (ncol, nlay) bool: True = lower atmosphere
    jeta: jax.Array       # (ncol, nlay, nflav, 2) int32 0-based
    col_mix: jax.Array    # (ncol, nlay, nflav, 2)
    fminor: jax.Array     # (ncol, nlay, nflav, 2, 2)
    fmajor: jax.Array     # (ncol, nlay, nflav, 2, 2, 2)


def interpolation(play, tlay, col_gas, *,
                  flavor_gas1, flavor_gas2, neta: int,
                  press_ref_log, temp_ref,
                  press_ref_log_delta, temp_ref_min, temp_ref_delta,
                  press_ref_trop_log, vmr_ref) -> InterpCoeffs:
    """Temperature/pressure/eta interpolation coefficients (reference
    ``rrtmgp_interpolation``, kernels :37-170).

    play/tlay: (ncol, nlay); col_gas: (ncol, nlay, ngas+1) with dry air at
    index 0; flavor_gas1/2: (nflav,) static int arrays indexing col_gas;
    vmr_ref: (2, ngas+1, ntemp) reference VMRs (dry air at index 0).
    """
    dtype = play.dtype
    ntemp = temp_ref.shape[0]
    npres = press_ref_log.shape[0]

    # NOTE: each (index, fraction) pair below derives from ONE pinned value.
    # Without the optimization_barrier, XLA may duplicate the shared
    # subexpression into the index fusion and the fraction fusion; under
    # non-bit-deterministic arithmetic (e.g. this stack's emulated float64)
    # the two copies can round to opposite sides of a grid node, pairing an
    # index with the wrong fraction (observed: jeta=4 with feta~=1).

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
    # Precompute vmr ratio r[itropo, flav, jtemp] = vmr1/vmr2 (static tables)
    vmr_ref = np.asarray(vmr_ref)
    g1 = np.asarray(flavor_gas1)
    g2 = np.asarray(flavor_gas2)
    ratio = vmr_ref[:, g1, :] / vmr_ref[:, g2, :]               # (2, nflav, ntemp)
    ratio_t = jnp.asarray(ratio, dtype)

    tiny = jnp.finfo(dtype).tiny
    # col_gas gathered per flavor: (ncol, nlay, nflav)
    cg1 = col_gas[..., g1]
    cg2 = col_gas[..., g2]

    jts = []
    for itemp in (0, 1):
        jt_i = jnp.clip(jtemp + itemp, 0, ntemp - 1)            # (ncol, nlay)
        # ratio at (itropo, flav, jt_i): gather temp axis then pick tropo
        r_lo = jnp.take(ratio_t[0], jt_i, axis=-1)              # (nflav, ncol, nlay)
        r_hi = jnp.take(ratio_t[1], jt_i, axis=-1)
        r = jnp.where(tropo[None], r_lo, r_hi)                  # (nflav, ncol, nlay)
        jts.append(jnp.moveaxis(r, 0, -1))                      # (ncol, nlay, nflav)
    ratio_eta_half = jnp.stack(jts, axis=-1)                    # (..., nflav, 2)

    col_mix = cg1[..., None] + ratio_eta_half * cg2[..., None]  # (..., nflav, 2)
    eta = jnp.where(col_mix > 2.0 * tiny, cg1[..., None] / jnp.where(
        col_mix > 2.0 * tiny, col_mix, 1.0), 0.5)

    # --- eta index/fraction and weight products (reference :152-164) ---
    loceta = jax.lax.optimization_barrier(eta * (neta - 1))
    trunc_loceta = jax.lax.optimization_barrier(jnp.trunc(loceta))
    jeta1 = jnp.minimum(trunc_loceta.astype(jnp.int32) + 1, neta - 1)  # 1-based
    feta = loceta - trunc_loceta
    jeta = jeta1 - 1                                             # 0-based

    # ftemp_term = 1-ftemp for itemp=0, ftemp for itemp=1
    ft = jnp.stack([1.0 - ftemp, ftemp], axis=-1)                # (..., 2)
    ft = ft[..., None, :]                                        # (..., 1, 2) flavor bcast
    # fminor[..., itemp, deta]
    fminor = jnp.stack([(1.0 - feta) * ft, feta * ft], axis=-1)  # (..., nflav? ...)
    # shapes: feta (ncol,nlay,nflav,2); ft (ncol,nlay,1,2)
    # fminor: (ncol,nlay,nflav,2,2) with last axes [itemp, deta]
    fp = jnp.stack([1.0 - fpress, fpress], axis=-1)              # (c, l, 2)
    fmajor = fminor[..., :, None, :] * fp[:, :, None, None, :, None]
    # fmajor: (ncol, nlay, nflav, 2, 2, 2) = [itemp, dpress, deta]
    return InterpCoeffs(jtemp=jtemp, ftemp=ftemp, jpress=jpress, fpress=fpress,
                        tropo=tropo, jeta=jeta, col_mix=col_mix,
                        fminor=fminor, fmajor=fmajor)


def _gather_table_3d(table_flat, rows, gpt_idx, ngpt_total):
    """table_flat: (nrows*ngpt,) flattened (ntemp, neta, npres+1, ngpt) table;
    rows/gpt_idx: (ncol, nlay, ngpt) int32. Returns table[rows, gpt]."""
    return jnp.take(table_flat, rows * ngpt_total + gpt_idx)


def _select_flavor(arr, flav_idx):
    """arr: (ncol, nlay, nflav, ...); flav_idx: (ncol, nlay, ngpt) int32.
    Returns (ncol, nlay, ngpt, ...)."""
    extra = arr.ndim - 3
    idx = flav_idx.reshape(flav_idx.shape + (1,) * extra)
    idx = jnp.broadcast_to(idx, flav_idx.shape + arr.shape[3:])
    return jnp.take_along_axis(arr, idx, axis=2)


def tau_major(coeffs: InterpCoeffs, kmajor, *, gpoint_flavor, ngpt: int):
    """Major-gas optical depth (reference gas_optical_depths_major /
    interpolate3D_byflav, kernels :345-396, :765-803).

    kmajor: (ntemp, neta, npres+1, ngpt) device table.
    gpoint_flavor: static (2, ngpt) 0-based flavor per (itropo, gpt).
    Returns tau (ncol, nlay, ngpt).
    """
    dtype = kmajor.dtype
    ntemp, neta, npresp1, _ = kmajor.shape
    k_flat = kmajor.reshape(-1)

    gflav = np.asarray(gpoint_flavor)                    # (2, ngpt) static
    flav_lo = jnp.asarray(gflav[0], jnp.int32)
    flav_hi = jnp.asarray(gflav[1], jnp.int32)
    # per-cell flavor per gpt
    flav = jnp.where(coeffs.tropo[..., None], flav_lo, flav_hi)  # (c,l,g)

    # press base row: jpress + (0 lower | 1 upper) (reference jpress+itropo)
    jp_base = coeffs.jpress + jnp.where(coeffs.tropo, 0, 1)      # (c,l)
    gpt_idx = jax.lax.broadcasted_iota(jnp.int32, flav.shape, 2)

    jeta_sel = _select_flavor(coeffs.jeta, flav)        # (c,l,g,2)
    cmix_sel = _select_flavor(coeffs.col_mix, flav)     # (c,l,g,2)
    fmaj_sel = _select_flavor(coeffs.fmajor, flav)      # (c,l,g,2,2,2)

    tau = jnp.zeros(flav.shape, dtype)
    for it in range(2):
        jt = jnp.clip(coeffs.jtemp + it, 0, ntemp - 1)[..., None]  # (c,l,1)
        je_base = jeta_sel[..., it]                                # (c,l,g)
        w_t = cmix_sel[..., it]
        for dp in range(2):
            jp = (jp_base + dp)[..., None]
            for de in range(2):
                je = jnp.clip(je_base + de, 0, neta - 1)
                rows = (jt * neta + je) * npresp1 + jp
                w = w_t * fmaj_sel[..., it, dp, de]
                tau = tau + w * _gather_table_3d(k_flat, rows, gpt_idx, ngpt)
    return tau


def planck_fraction(coeffs: InterpCoeffs, pfracin, *, gpoint_flavor, ngpt: int):
    """Planck fraction: same 3-D interpolation as tau_major with unit scaling
    (reference compute_Planck_source :619-634)."""
    dtype = pfracin.dtype
    ones = jnp.ones_like(coeffs.col_mix)
    c2 = coeffs._replace(col_mix=ones)
    return tau_major(c2, pfracin, gpoint_flavor=gpoint_flavor, ngpt=ngpt)


def tau_minor(tau, coeffs: InterpCoeffs, kminor, *, lower: bool,
              minor_limits_gpt, kminor_start, idx_minor, idx_minor_scaling,
              minor_scales_with_density, scale_by_complement,
              gpt_flavor_atm, play, tlay, col_gas, idx_h2o: int):
    """Minor-gas optical depths for one atmosphere (reference
    gas_optical_depths_minor, kernels :402-501). All per-minor metadata is
    static (numpy/python); the loop unrolls under jit.

    kminor: (ntemp, neta, nminork) device table.
    minor_limits_gpt: (nm, 2) 0-based inclusive g-point windows.
    gpt_flavor_atm: (ngpt,) static 0-based flavors for this atmosphere.
    """
    dtype = tau.dtype
    nm = len(kminor_start)
    if nm == 0:
        return tau
    ntemp, neta, nminork = kminor.shape
    k2 = kminor.reshape(-1, nminork)    # rows = jtemp*neta + jeta

    mask = coeffs.tropo if lower else jnp.logical_not(coeffs.tropo)
    maskf = mask.astype(dtype)

    inv_col_dry = 1.0 / col_gas[..., 0]
    dry_fact = 1.0 / (1.0 + col_gas[..., idx_h2o] * inv_col_dry)

    updates = []
    for m in range(nm):
        g0, g1 = int(minor_limits_gpt[m][0]), int(minor_limits_gpt[m][1])
        w = g1 - g0 + 1
        start = int(kminor_start[m])
        flav = int(gpt_flavor_atm[g0])

        scaling = col_gas[..., int(idx_minor[m])]
        if minor_scales_with_density[m]:
            scaling = scaling * (0.01 * play / tlay)
            isc = int(idx_minor_scaling[m])
            if isc > 0:
                frac = col_gas[..., isc] * inv_col_dry * dry_fact
                if scale_by_complement[m]:
                    scaling = scaling * (1.0 - frac)
                else:
                    scaling = scaling * frac

        # 2x2 eta/temp interpolation over the static g-point window
        je_f = coeffs.jeta[:, :, flav, :]      # (c,l,2)
        fmin_f = coeffs.fminor[:, :, flav]     # (c,l,2,2) [itemp, deta]
        acc = None
        for it in range(2):
            jt = jnp.clip(coeffs.jtemp + it, 0, ntemp - 1)
            for de in range(2):
                je = jnp.clip(je_f[..., it] + de, 0, neta - 1)
                rows = jt * neta + je                    # (c,l)
                kk = jnp.take(k2[:, start:start + w], rows, axis=0)  # (c,l,w)
                term = fmin_f[..., it, de][..., None] * kk
                acc = term if acc is None else acc + term
        contrib = (scaling * maskf)[..., None] * acc
        tau = tau.at[:, :, g0:g1 + 1].add(contrib)
    return tau


def tau_rayleigh(coeffs: InterpCoeffs, krayl, *, gpoint_flavor, ngpt: int,
                 col_gas, col_dry, idx_h2o: int):
    """Rayleigh scattering optical depth (reference compute_tau_rayleigh,
    kernels :506-565). krayl: (ntemp, neta, ngpt, 2) device table
    (last axis: lower/upper atmosphere)."""
    dtype = krayl.dtype
    ntemp, neta, _, _ = krayl.shape
    gflav = np.asarray(gpoint_flavor)
    flav = jnp.where(coeffs.tropo[..., None],
                     jnp.asarray(gflav[0], jnp.int32),
                     jnp.asarray(gflav[1], jnp.int32))            # (c,l,g)
    itropo = jnp.where(coeffs.tropo, 0, 1)[..., None]             # (c,l,1)
    gpt_idx = jax.lax.broadcasted_iota(jnp.int32, flav.shape, 2)

    jeta_sel = _select_flavor(coeffs.jeta, flav)                  # (c,l,g,2)
    fmin_sel = _select_flavor(coeffs.fminor, flav)                # (c,l,g,2,2)

    k_flat = krayl.reshape(-1)
    k = jnp.zeros(flav.shape, dtype)
    for it in range(2):
        jt = jnp.clip(coeffs.jtemp + it, 0, ntemp - 1)[..., None]
        for de in range(2):
            je = jnp.clip(jeta_sel[..., it] + de, 0, neta - 1)
            flat = ((jt * neta + je) * ngpt + gpt_idx) * 2 + itropo
            k = k + fmin_sel[..., it, de] * jnp.take(k_flat, flat)
    return k * (col_gas[..., idx_h2o] + col_dry)[..., None]


def interp1d_table(val, offset, delta, table):
    """Linear interpolation returning all values along the table's second
    axis (reference interpolate1D, kernels :715-737).
    val: (...); table: (ntab, nout). Returns (..., nout)."""
    ntab = table.shape[0]
    val0 = (val - offset) / delta
    frac = val0 - jnp.trunc(val0)
    idx = jnp.clip(val0.astype(jnp.int32), 0, ntab - 2)
    lo = jnp.take(table, idx, axis=0)
    hi = jnp.take(table, idx + 1, axis=0)
    return lo + frac[..., None] * (hi - lo)


def planck_sources(coeffs: InterpCoeffs, *, pfracin, totplnk, totplnk_delta,
                   temp_ref_min, gpoint_flavor, gpt2band, ngpt: int,
                   tlay, tlev, tsfc, top_at_1: bool):
    """Planck source functions (reference compute_Planck_source,
    kernels :568-710): pfrac interp, 1-D totplnk interp by temperature,
    band->gpt mapping, geometric-mean level sources, surface Jacobian by
    1 K finite difference.

    Returns (sfc_src, lay_src, lev_src, sfc_src_jac)."""
    dtype = pfracin.dtype
    pfrac = planck_fraction(coeffs, pfracin, gpoint_flavor=gpoint_flavor,
                            ngpt=ngpt)                       # (c,l,g)
    band_of_gpt = jnp.asarray(np.asarray(gpt2band), jnp.int32)

    def planck_bands(t):
        return interp1d_table(t, temp_ref_min, totplnk_delta, totplnk)

    # surface (+1K Jacobian, reference delta_Tsurf=1)
    sfc_lay = -1 if top_at_1 else 0
    pf_sfc = pfrac[:, sfc_lay, :]                            # (c,g)
    pb_sfc = planck_bands(tsfc)                              # (c,nbnd)
    pb_sfc1 = planck_bands(tsfc + 1.0)
    sfc_src = pf_sfc * pb_sfc[:, band_of_gpt]
    sfc_src_jac = pf_sfc * (pb_sfc1 - pb_sfc)[:, band_of_gpt]

    # layers
    pb_lay = planck_bands(tlay)                              # (c,l,nbnd)
    lay_src = pfrac * pb_lay[..., band_of_gpt]

    # levels: geometric mean of adjacent layers' pfrac in the interior
    # (reference :695-706); end levels use the adjacent layer's pfrac
    pf_in = jnp.sqrt(pfrac[:, 1:, :] * pfrac[:, :-1, :])     # (c,l-1,g)
    pf_lev = jnp.concatenate([pfrac[:, :1, :], pf_in, pfrac[:, -1:, :]],
                             axis=1)                         # (c,l+1,g)
    pb_lev = planck_bands(tlev)
    lev_src = pf_lev * pb_lev[..., band_of_gpt]
    return sfc_src, lay_src, lev_src, sfc_src_jac
