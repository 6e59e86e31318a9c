"""RRTMGP correlated-k gas-optics numerics, vectorized for TPU.

Re-implements the four reference kernels
(rrtmgp/kernels/mo_gas_optics_rrtmgp_kernels.F90):

  - ``interpolation`` (:37-170)        -> :func:`interpolation`
  - ``compute_tau_absorption`` (:176-338, major :345-396, minor :402-501)
      -> :func:`tau_major` + :func:`tau_minor`
  - ``compute_tau_rayleigh`` (:506-565) -> :func:`tau_rayleigh`
  - ``compute_Planck_source`` (:568-710) -> :func:`tau_major` (Planck
      fraction, fused with the major-tau gathers) + :func:`planck_sources`

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
    feta: jax.Array       # (2, nflav, ncol, nlay) raw eta fraction


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
    # ftemp anchors at the CLAMPED node (reference :106-108) so
    # above-table temperatures extrapolate from the same corner pair
    temp_ref_j = jnp.take(jnp.asarray(temp_ref, dtype), jtemp1 - 1)
    ftemp = (tlay - temp_ref_j) / temp_ref_delta
    jtemp = jtemp1 - 1                                          # 0-based

    # --- pressure index/fraction (reference :111-114) ---
    # float(...) keeps the constant weakly typed: a numpy float64 scalar
    # would promote the whole tau computation under jax_enable_x64
    locpress = jax.lax.optimization_barrier(
        1.0 + (jnp.log(play) - float(press_ref_log[0])) / press_ref_log_delta)
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
                        fminor=fminor, fmajor=fmajor, feta=feta)


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


def tau_major(coeffs: InterpCoeffs, kmajor_x, *, gpoint_flavor, band_lims_gpt):
    """Major-gas optical depth (reference gas_optical_depths_major /
    interpolate3D_byflav, kernels :345-396, :765-803) — and, for LW, the
    Planck fraction (reference compute_Planck_source :619-634) from the
    same gathers.

    kmajor_x: corner-expanded device table
    (ntemp, neta-1, npres, 4, ntab, ngpt): one row per (jt, je, jp) base
    index holds all four (dp, de) interpolation corners; ntab=2 packs
    planck_frac behind kmajor. gpoint_flavor: static (2, ngpt) 0-based
    flavor per (itropo, gpt); band_lims_gpt: static (nbnd, 2) 1-based.

    TPU structure: every g-point in a band shares the same flavor and
    therefore the same interpolation corners, so the lookup is a *row*
    gather per (col, lay, band, itemp). TPU gathers cost per row
    descriptor (~3-5 ns) independent of row width, so packing the 4
    press/eta corners (and the Planck table) into the row cuts the hot
    kernel's descriptor count 8x vs the naive 8-corner gather.

    Returns (tau, pfrac) with shapes (ncol, nlay, ngpt); pfrac is None
    when ntab == 1 (SW tables).
    """
    ntemp, netam1, npres, _, ntab, ngpt = kmajor_x.shape
    T = kmajor_x.reshape(ntemp * netam1 * npres, 4, ntab, ngpt)
    gflav = np.asarray(gpoint_flavor)
    bands = np.asarray(band_lims_gpt)

    jp_base = coeffs.jpress + jnp.where(coeffs.tropo, 0, 1)     # (c, l)

    tau_out, pl_out = [], []
    for b in range(bands.shape[0]):
        g0, g1 = int(bands[b, 0]) - 1, int(bands[b, 1]) - 1
        w = g1 - g0 + 1
        flav_lo, flav_hi = int(gflav[0, g0]), int(gflav[1, g0])
        # flatten (4, ntab, w) into the lane axis: gather outputs keep a
        # wide minor-most dimension (TPU tiled layouts pad the last two
        # dims to 8x128, so a trailing (4, ntab, w) would bloat the gather
        # write 8-32x; a trailing 4*ntab*w does not)
        Tb = T[:, :, :, g0:g1 + 1].reshape(T.shape[0], 4 * ntab * w)
        acc_t = acc_p = None
        for it in range(2):
            je, cm = _band_flavor_state(coeffs, it, flav_lo, flav_hi, True)
            rows = ((coeffs.jtemp + it) * netam1 + je) * npres + jp_base
            blk = jnp.take(Tb, rows, axis=0)        # (c, l, 4*ntab*w)
            for p, (dp, de) in enumerate(((0, 0), (0, 1), (1, 0), (1, 1))):
                wgt = _band_weight(coeffs, it, dp, de, flav_lo, flav_hi)
                off = p * ntab * w
                t_term = (wgt * cm)[..., None] * blk[:, :, off:off + w]
                acc_t = t_term if acc_t is None else acc_t + t_term
                if ntab == 2:
                    p_term = wgt[..., None] * blk[:, :, off + w:off + 2 * w]
                    acc_p = p_term if acc_p is None else acc_p + p_term
        tau_out.append(acc_t)
        if ntab == 2:
            pl_out.append(acc_p)
    tau = jnp.concatenate(tau_out, axis=-1)
    pfrac = jnp.concatenate(pl_out, axis=-1) if ntab == 2 else None
    return tau, pfrac


def tau_minor(tau, coeffs: InterpCoeffs, kminor_x, *, lower: bool,
              minor_limits_gpt, kminor_start, idx_minor, idx_minor_scaling,
              minor_scales_with_density, scale_by_complement,
              minor_flavor, play, tlay, col_gas, idx_h2o: int):
    """Minor-gas optical depths for one atmosphere (reference
    gas_optical_depths_minor, kernels :402-501). All per-minor metadata is
    static; the loop unrolls under jit.

    kminor_x: corner-expanded device table (ntemp, neta-1, 2, nminork);
    col_gas (ngas+1, c, l); minor_limits_gpt: 0-based inclusive windows;
    minor_flavor: static 0-based flavor per minor gas.

    TPU structure: minors sharing an eta flavor have identical gather rows,
    so their table windows are fetched in ONE gather per (flavor, itemp)
    (concatenated along the contributor axis at trace time); the per-gas
    scaling and the scatter-add into static g-point windows stay
    elementwise. Gather descriptors: 2 x nflavors-used instead of
    4 x nminor.
    """
    dtype = tau.dtype
    nm = len(kminor_start)
    if nm == 0:
        return tau
    ntemp, netam1, _, nminork = kminor_x.shape
    K = kminor_x.reshape(ntemp * netam1, 2, nminork)

    mask = coeffs.tropo if lower else jnp.logical_not(coeffs.tropo)
    maskf = mask.astype(dtype)

    inv_col_dry = 1.0 / col_gas[0]
    dry_fact = 1.0 / (1.0 + col_gas[idx_h2o] * inv_col_dry)

    groups = {}
    for m in range(nm):
        groups.setdefault(int(minor_flavor[m]), []).append(m)

    for flav, members in groups.items():
        widths = [int(minor_limits_gpt[m][1]) - int(minor_limits_gpt[m][0]) + 1
                  for m in members]
        gw = sum(widths)
        # flatten (2, gw) into the lane axis (see tau_major layout note)
        Kg = jnp.concatenate(
            [K[:, :, int(kminor_start[m]):int(kminor_start[m]) + w]
             for m, w in zip(members, widths)], axis=-1).reshape(K.shape[0],
                                                                 2 * gw)
        kk = None
        for it in range(2):
            rows = (coeffs.jtemp + it) * netam1 + coeffs.jeta[it, flav]
            blk = jnp.take(Kg, rows, axis=0)               # (c, l, 2*gw)
            fm = coeffs.fminor[it, :, flav]                # (2, c, l)
            term = (fm[0][..., None] * blk[:, :, :gw]
                    + fm[1][..., None] * blk[:, :, gw:])
            kk = term if kk is None else kk + term

        off = 0
        for m, w in zip(members, widths):
            g0 = int(minor_limits_gpt[m][0])
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
            contrib = (scaling * maskf)[..., None] * kk[:, :, off:off + w]
            tau = tau.at[:, :, g0:g0 + w].add(contrib)
            off += w
    return tau


def tau_rayleigh(coeffs: InterpCoeffs, krayl_x, *, gpoint_flavor,
                 band_lims_gpt, col_gas, col_dry, idx_h2o: int):
    """Rayleigh scattering optical depth (reference compute_tau_rayleigh,
    kernels :506-565). krayl_x: corner-expanded device table
    [jt, je, itropo, de, g] = (ntemp, neta-1, 2, 2, ngpt); col_gas
    (ngas+1, c, l). One gather per (band, itemp) with the atmosphere index
    folded into the row and both eta corners in the row payload."""
    ntemp, netam1, _, _, ngpt = krayl_x.shape
    K = krayl_x.reshape(ntemp * netam1 * 2, 2, ngpt)
    gflav = np.asarray(gpoint_flavor)
    bands = np.asarray(band_lims_gpt)

    itropo = jnp.where(coeffs.tropo, 0, 1)
    out = []
    for b in range(bands.shape[0]):
        g0, g1 = int(bands[b, 0]) - 1, int(bands[b, 1]) - 1
        w = g1 - g0 + 1
        flav_lo, flav_hi = int(gflav[0, g0]), int(gflav[1, g0])
        # flatten (2, w) into the lane axis (see tau_major layout note)
        Kb = K[:, :, g0:g1 + 1].reshape(K.shape[0], 2 * w)
        acc = None
        for it in range(2):
            je, _ = _band_flavor_state(coeffs, it, flav_lo, flav_hi, False)
            rows = ((coeffs.jtemp + it) * netam1 + je) * 2 + itropo
            blk = jnp.take(Kb, rows, axis=0)               # (c, l, 2*w)
            if flav_lo == flav_hi:
                fm = coeffs.fminor[it, :, flav_lo]         # (2, c, l)
            else:
                fm = jnp.where(coeffs.tropo[None],
                               coeffs.fminor[it, :, flav_lo],
                               coeffs.fminor[it, :, flav_hi])
            term = (fm[0][..., None] * blk[:, :, :w]
                    + fm[1][..., None] * blk[:, :, w:])
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


def planck_sources(pfrac, *, totplnk, totplnk_delta,
                   temp_ref_min, gpt2band,
                   tlay, tlev, tsfc, top_at_1: bool):
    """Planck source functions (reference compute_Planck_source,
    kernels :568-710): 1-D totplnk interp by temperature, band->gpt
    mapping, geometric-mean level sources, surface Jacobian by 1 K finite
    difference. ``pfrac`` (c, l, g) comes from :func:`tau_major` (the
    Planck-fraction interpolation shares the major-tau gathers).

    Returns (sfc_src, lay_src, lev_src, sfc_src_jac)."""
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
    # guard the sqrt input with the taken-branch value: at pfrac == 0 in
    # adjacent layers the geometric mean is 0 but d sqrt(0) = inf would
    # produce NaN gradients (0 * inf) through jax.grad
    _pp = pfrac[:, 1:, :] * pfrac[:, :-1, :]
    pf_in = jnp.where(_pp > 0.0,
                      jnp.sqrt(jnp.where(_pp > 0.0, _pp, 1.0)), 0.0)
    pf_lev = jnp.concatenate([pfrac[:, :1, :], pf_in, pfrac[:, -1:, :]],
                             axis=1)                         # (c, l+1, g)
    pb_lev = planck_bands(tlev)
    lev_src = pf_lev * pb_lev[..., band_of_gpt]
    return sfc_src, lay_src, lev_src, sfc_src_jac


def planck_bands_lanes(t, *, totplnk, totplnk_delta, temp_ref_min):
    """Band-integrated Planck function by temperature with the band axis
    leading: t (...) -> (nbnd, ...). Same numerics as interp1d_table
    (reference interpolate1D, kernels :715-737)."""
    tot_t = jnp.asarray(totplnk).T                           # (nbnd, nT)
    ntab = tot_t.shape[1]
    val0 = jax.lax.optimization_barrier((t - temp_ref_min) / totplnk_delta)
    frac = val0 - jnp.trunc(val0)
    idx = jnp.clip(val0.astype(jnp.int32), 0, ntab - 2)
    lo = jnp.take(tot_t, idx, axis=1)
    hi = jnp.take(tot_t, idx + 1, axis=1)
    return lo + frac[None] * (hi - lo)


def planck_sources_lanes(pfrac, *, totplnk, totplnk_delta,
                         temp_ref_min, gpt2band,
                         tlay, tlev, tsfc, top_at_1: bool):
    """Lane-layout :func:`planck_sources`: identical numerics on the
    gas-optics gathers' native layout — pfrac (ngpt, nlay, ncol), tlay
    (nlay, ncol), tlev (nlay+1, ncol), tsfc (ncol,).

    Returns (sfc_src (ngpt, ncol), lay_src (ngpt, nlay, ncol),
    lev_src (ngpt, nlay+1, ncol), sfc_src_jac (ngpt, ncol))."""
    band_of_gpt = jnp.asarray(np.asarray(gpt2band), jnp.int32)
    tot_t = jnp.asarray(totplnk).T                           # (nbnd, nT)
    ntab = tot_t.shape[1]

    def planck_gpt(t):
        # interp1d_table with the band axis leading, expanded to g-points
        val0 = jax.lax.optimization_barrier((t - temp_ref_min)
                                            / totplnk_delta)
        frac = val0 - jnp.trunc(val0)
        idx = jnp.clip(val0.astype(jnp.int32), 0, ntab - 2)
        lo = jnp.take(tot_t, idx, axis=1)                    # (nbnd, ...)
        hi = jnp.take(tot_t, idx + 1, axis=1)
        return (lo + frac[None] * (hi - lo))[band_of_gpt]    # (ngpt, ...)

    # surface (+1K Jacobian, reference delta_Tsurf=1)
    sfc_lay = -1 if top_at_1 else 0
    pf_sfc = pfrac[:, sfc_lay, :]                            # (g, c)
    pb_sfc = planck_gpt(tsfc)                                # (g, c)
    pb_sfc1 = planck_gpt(tsfc + 1.0)
    sfc_src = pf_sfc * pb_sfc
    sfc_src_jac = pf_sfc * (pb_sfc1 - pb_sfc)

    lay_src = pfrac * planck_gpt(tlay)                       # (g, l, c)

    # levels: geometric mean of adjacent layers' pfrac in the interior
    # (reference :695-706); end levels use the adjacent layer's pfrac
    _pp = pfrac[:, 1:, :] * pfrac[:, :-1, :]
    pf_in = jnp.where(_pp > 0.0,
                      jnp.sqrt(jnp.where(_pp > 0.0, _pp, 1.0)), 0.0)
    pf_lev = jnp.concatenate([pfrac[:, :1, :], pf_in, pfrac[:, -1:, :]],
                             axis=1)                         # (g, l+1, c)
    lev_src = pf_lev * planck_gpt(tlev)
    return sfc_src, lay_src, lev_src, sfc_src_jac
