"""Pallas-accelerated minor-gas and Rayleigh optical depths.

Same contracts as :func:`ops.gas_optics.tau_minor` /
:func:`tau_rayleigh`, dispatched to the VMEM-resident lane-gather kernels
in :mod:`ops.pallas.minor_gather` when the (jtemp, jeta) row domain fits
the 128-lane gather. Input preparation (interpolation rows, eta weights,
per-gas scaling with the atmosphere mask) happens in XLA; the kernels do
only the table fetch + weighting; outputs come back (ngpt, ncell) and are
transposed here.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .gas_optics import InterpCoeffs
from .pallas.minor_gather import (minor_contributions_lane, rayleigh_k_lane,
                                  supported)

__all__ = ["tau_minor_pallas", "tau_rayleigh_pallas", "lane_gather_ok"]


def lane_gather_ok(ntemp: int, netam1: int) -> bool:
    return supported(ntemp, netam1)


def _flavor_groups(flavors):
    groups = {}
    for m, f in enumerate(flavors):
        groups.setdefault(int(f), []).append(m)
    return groups


def _unflatten_cells(out_gpt_cell, ncol, nlay, cells_lm, raw=False):
    """(ngpt, ncell) -> (ncol, nlay, ngpt); or, with ``raw`` (requires
    cells_lm), the free bitcast to lane layout (ngpt, nlay, ncol)."""
    ngpt = out_gpt_cell.shape[0]
    if raw:
        assert cells_lm, "raw lane output requires layer-major cells"
        return out_gpt_cell.reshape(ngpt, nlay, ncol)
    if cells_lm:   # cells are layer-major (lay, col)
        return jnp.moveaxis(out_gpt_cell.reshape(ngpt, nlay, ncol), 0, -1
                            ).swapaxes(0, 1)
    return out_gpt_cell.T.reshape(ncol, nlay, ngpt)


def _idx_fm(coeffs: InterpCoeffs, netam1: int, flavs):
    """Interpolation rows and eta weights per (group flavor, itemp[, deta]),
    flattened over cells."""
    ncell = coeffs.jtemp.size
    idx_rows, fm_rows = [], []
    for f in flavs:
        for it in range(2):
            rows = (coeffs.jtemp + it) * netam1 + coeffs.jeta[it, f]
            idx_rows.append(rows.reshape(ncell))
            fm_rows.append(coeffs.fminor[it, 0, f].reshape(ncell))
            fm_rows.append(coeffs.fminor[it, 1, f].reshape(ncell))
    return (jnp.stack(idx_rows, 0).astype(jnp.int32),
            jnp.stack(fm_rows, 0))


def tau_minor_pallas(tau, coeffs: InterpCoeffs, table_lane, *, lower: bool,
                     ntemp: int, netam1: int, ncont: int,
                     minor_limits_gpt, kminor_start, idx_minor,
                     idx_minor_scaling, minor_scales_with_density,
                     scale_by_complement, minor_flavor,
                     play, tlay, col_gas, idx_h2o: int,
                     cells_lm: bool = False, raw: bool = False,
                     interpret: bool = False):
    """Minor-gas optical depths via the lane-gather kernel (reference
    gas_optical_depths_minor, kernels :402-501).

    With ``cells_lm`` the per-cell inputs (coeffs/play/tlay/col_gas) are
    (nlay, ncol) layer-major, so every flatten below is a free bitcast."""
    nm = len(kminor_start)
    if nm == 0:
        return tau
    dtype = tau.dtype
    if raw:
        ngpt, nlay, ncol = tau.shape
    else:
        ncol, nlay, ngpt = tau.shape
    ncell = ncol * nlay

    mask = coeffs.tropo if lower else jnp.logical_not(coeffs.tropo)
    maskf = mask.astype(dtype)
    inv_col_dry = 1.0 / col_gas[0]
    dry_fact = 1.0 / (1.0 + col_gas[idx_h2o] * inv_col_dry)

    # per-gas scaling (density / partner-gas continuum terms) + mask
    scal_rows = []
    for m in range(nm):
        scaling = col_gas[int(idx_minor[m])]
        if minor_scales_with_density[m]:
            scaling = scaling * (0.01 * play / tlay)
            isc = int(idx_minor_scaling[m])
            if isc > 0:
                frac = col_gas[isc] * inv_col_dry * dry_fact
                scaling = scaling * ((1.0 - frac) if scale_by_complement[m]
                                     else frac)
        scal_rows.append((scaling * maskf).reshape(ncell))
    scaling_all = jnp.stack(scal_rows, 0)

    fgroups = _flavor_groups(minor_flavor)
    flavs = sorted(fgroups)
    idx, fm = _idx_fm(coeffs, netam1, flavs)
    groups = tuple(
        (gi, tuple((m, int(kminor_start[m]), int(minor_limits_gpt[m][0]),
                    int(minor_limits_gpt[m][1]) - int(minor_limits_gpt[m][0])
                    + 1)
                   for m in fgroups[f]))
        for gi, f in enumerate(flavs))

    out_t, n = minor_contributions_lane(
        idx, fm, scaling_all, table_lane, groups=groups, ncont=ncont,
        ngpt=ngpt, interpret=interpret)
    contrib = _unflatten_cells(out_t[:, :n], ncol, nlay, cells_lm, raw)
    return tau + contrib


def tau_rayleigh_pallas(coeffs: InterpCoeffs, table_lane, *, ntemp: int,
                        netam1: int, gpoint_flavor, band_lims_gpt,
                        col_gas, col_dry, idx_h2o: int,
                        cells_lm: bool = False, raw: bool = False,
                        interpret: bool = False):
    """Rayleigh optical depth via the lane-gather kernel (reference
    compute_tau_rayleigh, kernels :506-565). Both-atmosphere payloads are
    fetched and selected by the tropopause mask in-kernel."""
    gflav = np.asarray(gpoint_flavor)
    bands = np.asarray(band_lims_gpt)
    nbnd = bands.shape[0]
    if cells_lm:
        nlay, ncol = coeffs.jtemp.shape
    else:
        ncol, nlay = coeffs.jtemp.shape
    ncell = ncol * nlay
    ngpt = int(bands[-1, 1])

    # Rayleigh's flavor can differ between atmospheres per band; the
    # in-kernel tropo select must then also pick the matching rows, so
    # group bands by the *pair* (flav_lower, flav_upper) and build
    # tropo-selected rows/weights per pair.
    pair_groups = {}
    for b in range(nbnd):
        g0 = int(bands[b, 0]) - 1
        pair = (int(gflav[0, g0]), int(gflav[1, g0]))
        pair_groups.setdefault(pair, []).append(
            (g0, int(bands[b, 1]) - int(bands[b, 0])))
    pairs = sorted(pair_groups)

    idx_rows, fm_rows = [], []
    for (flo, fhi) in pairs:
        for it in range(2):
            if flo == fhi:
                je = coeffs.jeta[it, flo]
                fm = coeffs.fminor[it, :, flo]
            else:
                je = jnp.where(coeffs.tropo, coeffs.jeta[it, flo],
                               coeffs.jeta[it, fhi])
                fm = jnp.where(coeffs.tropo[None],
                               coeffs.fminor[it, :, flo],
                               coeffs.fminor[it, :, fhi])
            idx_rows.append(((coeffs.jtemp + it) * netam1 + je).reshape(ncell))
            fm_rows.append(fm[0].reshape(ncell))
            fm_rows.append(fm[1].reshape(ncell))
    idx = jnp.stack(idx_rows, 0).astype(jnp.int32)
    fm = jnp.stack(fm_rows, 0)
    tropo = coeffs.tropo.astype(fm.dtype).reshape(1, ncell)
    band_groups = tuple(
        (gi, tuple((g0, w + 1) for (g0, w) in pair_groups[p]))
        for gi, p in enumerate(pairs))

    out_t, n = rayleigh_k_lane(idx, fm, tropo, table_lane,
                               band_groups=band_groups, ngpt=ngpt,
                               interpret=interpret)
    scale = (col_gas[idx_h2o] + col_dry).reshape(1, ncell)
    return _unflatten_cells(out_t[:, :n] * scale, ncol, nlay, cells_lm, raw)


# ---------------------------------------------------------------------------
# major gases (+ packed Planck fraction)
# ---------------------------------------------------------------------------

def pressure_window_ok(jp_base: np.ndarray, pspan: int) -> bool:
    """Eager check of the PSPAN assumption: max in-block pressure-index
    span over 128-cell layer-major blocks (see pallas/major_gather.py).
    ``jp_base`` is (ncol, nlay) user layout."""
    flat = np.asarray(jp_base).T.reshape(-1)
    pad = (-flat.size) % 128
    if pad:
        flat = np.concatenate([flat, np.repeat(flat[-1], pad)])
    blocks = flat.reshape(-1, 128)
    return int((blocks.max(1) - blocks.min(1)).max()) <= pspan - 2


def _jp_base_from_play(play, *, press_ref_log, press_ref_log_delta,
                       press_ref_trop_log):
    play = np.asarray(play, np.float64)
    npres = int(np.asarray(press_ref_log).shape[0])
    locpress = 1.0 + ((np.log(play) - float(np.asarray(press_ref_log)[0]))
                      / float(press_ref_log_delta))
    jpress = np.clip(np.trunc(locpress), 1.0, npres - 1).astype(np.int64) - 1
    tropo = play > np.exp(float(press_ref_trop_log))
    return jpress + np.where(tropo, 0, 1)


def pressure_window_ok_by_layer(play, *, press_ref_log,
                                press_ref_log_delta, press_ref_trop_log,
                                pspan: int) -> bool:
    """Eager PSPAN guard for the FUSED kernels, whose lane groups are 128
    columns within ONE layer (edge-padded): max per-(layer, group)
    pressure-index span must fit the window. play: (ncol, nlay)."""
    jb = _jp_base_from_play(
        play, press_ref_log=press_ref_log,
        press_ref_log_delta=press_ref_log_delta,
        press_ref_trop_log=press_ref_trop_log).T        # (nlay, ncol)
    pad = (-jb.shape[1]) % 128
    if pad:
        jb = np.pad(jb, ((0, 0), (0, pad)), mode="edge")
    grp = jb.reshape(jb.shape[0], -1, 128)
    return int((grp.max(2) - grp.min(2)).max()) <= pspan - 2


def pressure_window_violation(play, *, press_ref_log, press_ref_log_delta,
                              press_ref_trop_log, pspan: int,
                              by_layer: bool, dtype=None):
    """TRACED PSPAN guard: scalar bool, True when any 128-cell lane group
    spans a pressure-index window wider than the major kernel can resolve
    (the kernel would silently clamp to nearest-window interpolation).

    Used when ``play`` is a tracer (inside a user ``jax.jit``) where the
    eager guards above cannot run: callers NaN-poison their outputs on
    violation so the failure is loud, unless
    ``config.assume_pressure_window`` asserts the property. ``by_layer``
    selects the fused kernels' per-(layer, 128-column) grouping; False
    selects the staged kernel's flat layer-major 128-cell blocks."""
    import jax.numpy as jnp
    play = jnp.asarray(play)
    npres = int(np.asarray(press_ref_log).shape[0])
    locpress = 1.0 + ((jnp.log(play) - float(np.asarray(press_ref_log)[0]))
                      / float(press_ref_log_delta))
    jpress = jnp.clip(jnp.trunc(locpress), 1.0, npres - 1).astype(jnp.int32) - 1
    tropo = play > float(np.exp(float(press_ref_trop_log)))
    jb = (jpress + jnp.where(tropo, 0, 1)).T          # (nlay, ncol)
    if by_layer:
        pad = (-jb.shape[1]) % 128
        jb = jnp.pad(jb, ((0, 0), (0, pad)), mode="edge")
        grp = jb.reshape(jb.shape[0], -1, 128)
    else:
        flat = jb.reshape(-1)
        pad = (-flat.size) % 128
        flat = jnp.pad(flat, (0, pad), mode="edge")
        grp = flat.reshape(-1, 128)
    span = jnp.max(jnp.max(grp, -1) - jnp.min(grp, -1))
    return span > (pspan - 2)


def pressure_window_ok_from_play(play, *, press_ref_log,
                                 press_ref_log_delta, press_ref_trop_log,
                                 pspan: int) -> bool:
    """Eager PSPAN guard computed directly from concrete pressures, so the
    major-kernel layout decision can be made *before* interpolation runs.
    Mirrors the jpress/tropo computation in ops.gas_optics.interpolation
    (reference kernels :111-117); off-by-one disagreements with the traced
    computation only shift a cell into the clamped nearest-window path."""
    jb = _jp_base_from_play(
        play, press_ref_log=press_ref_log,
        press_ref_log_delta=press_ref_log_delta,
        press_ref_trop_log=press_ref_trop_log)
    return pressure_window_ok(jb, pspan)


def tau_major_pallas(coeffs: InterpCoeffs, table_lane, *, neta: int,
                     gpoint_flavor, band_lims_gpt, ntab: int,
                     cells_lm: bool = False, raw: bool = False,
                     interpret: bool = False):
    """Major-gas tau (+ Planck fraction when ntab=2) via the lane-gather
    kernel (reference gas_optical_depths_major / interpolate3D_byflav,
    kernels :345-396, :765-803). Returns (tau, pfrac_or_None), each
    (ncol, nlay, ngpt).

    The kernel requires LAYER-major cells; with ``cells_lm`` the coeffs
    are already (nlay, ncol) and every flatten is a free bitcast."""
    from .pallas.major_gather import major_interp_lane

    gflav = np.asarray(gpoint_flavor)
    bands = np.asarray(band_lims_gpt)
    nbnd = bands.shape[0]
    w = int(bands[0, 1]) - int(bands[0, 0]) + 1
    if cells_lm:
        nlay, ncol = coeffs.jtemp.shape
    else:
        ncol, nlay = coeffs.jtemp.shape
    ncell = ncol * nlay

    def lm(x):  # layer-major flatten
        return x.reshape(ncell) if cells_lm else x.T.reshape(ncell)

    te_rows, fe_rows, cm_rows = [], [], []
    for b in range(nbnd):
        g0 = int(bands[b, 0]) - 1
        flo, fhi = int(gflav[0, g0]), int(gflav[1, g0])
        for it in range(2):
            if flo == fhi:
                je = coeffs.jeta[it, flo]
                fe = coeffs.feta[it, flo]
                cmv = coeffs.col_mix[it, flo]
            else:
                je = jnp.where(coeffs.tropo, coeffs.jeta[it, flo],
                               coeffs.jeta[it, fhi])
                fe = jnp.where(coeffs.tropo, coeffs.feta[it, flo],
                               coeffs.feta[it, fhi])
                cmv = jnp.where(coeffs.tropo, coeffs.col_mix[it, flo],
                                coeffs.col_mix[it, fhi])
            te_rows.append(lm((coeffs.jtemp + it) * neta + je))
            fe_rows.append(lm(fe))
            cm_rows.append(lm(cmv))
    te = jnp.stack(te_rows, 0).astype(jnp.int32)
    fe = jnp.stack(fe_rows, 0)
    cm = jnp.stack(cm_rows, 0)
    ft = jnp.stack([lm(1.0 - coeffs.ftemp), lm(coeffs.ftemp)], 0)
    fp = lm(coeffs.fpress)[None]
    jp = lm(coeffs.jpress + jnp.where(coeffs.tropo, 0, 1)).astype(
        jnp.int32)[None]

    out, n = major_interp_lane(te, fe, cm, ft, fp, jp, table_lane,
                               nbnd=nbnd, ntab=ntab, w=w,
                               interpret=interpret)
    out = out[:, :n]                                      # (nbnd*ntab*w, n)
    per_band = out.reshape(nbnd, ntab, w, ncell)

    if raw:
        assert cells_lm, "raw lane output requires layer-major cells"

        def unflatten(rows):                              # (nbnd, w, ncell)
            return rows.reshape(nbnd * w, nlay, ncol)
    else:
        def unflatten(rows):                              # (nbnd, w, ncell)
            x = jnp.moveaxis(rows, -1, 0).reshape(nlay, ncol, nbnd * w)
            return jnp.swapaxes(x, 0, 1)

    tau = unflatten(per_band[:, 0])
    pfrac = unflatten(per_band[:, 1]) if ntab == 2 else None
    return tau, pfrac


# ---------------------------------------------------------------------------
# the grand fused LW path: descriptors for ops/pallas/fused_lw.py
# ---------------------------------------------------------------------------

def _minor_scaling_rows(coeffs, mset, *, lower, play, tlay, col_gas,
                        idx_h2o, dtype):
    """Per-minor-gas scaling rows with the atmosphere mask applied
    (reference gas_optical_depths_minor :461-480). Cell arrays 2-D."""
    mask = coeffs.tropo if lower else jnp.logical_not(coeffs.tropo)
    maskf = mask.astype(dtype)
    inv_col_dry = 1.0 / col_gas[0]
    dry_fact = 1.0 / (1.0 + col_gas[idx_h2o] * inv_col_dry)
    rows = []
    for m in range(len(mset.kminor_start)):
        scaling = col_gas[int(mset.idx_minor[m])]
        if mset.scales_with_density[m]:
            scaling = scaling * (0.01 * play / tlay)
            isc = int(mset.idx_minor_scaling[m])
            if isc > 0:
                frac = col_gas[isc] * inv_col_dry * dry_fact
                scaling = scaling * ((1.0 - frac)
                                     if mset.scale_by_complement[m] else frac)
        rows.append(scaling * maskf)
    return rows


def _minor_static(coeffs, kd, bands, w, play_c, tlay_c, col_gas_c,
                  idx_h2o, dtype):
    """Minor-gas scaling rows + per-band statically-clipped windows for
    the fused kernels, whose minors read eta rows straight from the
    per-flavor descriptor table. Members: (lower, flavor, mg_global,
    kminor_start, local_g0, width)."""
    nbnd = bands.shape[0]
    nlay, ncol = coeffs.jtemp.shape
    msc_rows, entries = [], []
    mg_base = 0
    for lower, mset in ((True, kd.minor_lower), (False, kd.minor_upper)):
        for m in range(len(mset.kminor_start)):
            entries.append((lower, int(mset.flavor[m]), mg_base + m,
                            int(mset.limits_gpt[m][0]),
                            int(mset.limits_gpt[m][1])
                            - int(mset.limits_gpt[m][0]) + 1,
                            int(mset.kminor_start[m])))
        msc_rows.extend(_minor_scaling_rows(
            coeffs, mset, lower=lower, play=play_c, tlay=tlay_c,
            col_gas=col_gas_c, idx_h2o=idx_h2o, dtype=dtype))
        mg_base += len(mset.kminor_start)
    zrow = jnp.zeros((nlay, ncol), dtype)
    msc = jnp.stack(msc_rows or [zrow], 0)
    band_minors = []
    for b in range(nbnd):
        b0 = int(bands[b, 0]) - 1
        b1 = b0 + w
        members = []
        for (lower, f, mg, g0m, wm, start) in entries:
            i0, i1 = max(g0m, b0), min(g0m + wm, b1)
            if i1 > i0:
                members.append((lower, f, mg, start + (i0 - g0m),
                                i0 - b0, i1 - i0))
        band_minors.append(tuple(members))
    return msc, tuple(band_minors)


def _minor_tables(kd, dtype):
    mtab_lo = kd.kminor_lower_lane
    mtab_up = kd.kminor_upper_lane
    if mtab_lo is None or mtab_lo.shape[0] == 0:
        mtab_lo = jnp.zeros((2, LANE_ROWS_MAX_F), dtype)
    if mtab_up is None or mtab_up.shape[0] == 0:
        mtab_up = jnp.zeros((2, LANE_ROWS_MAX_F), dtype)
    return mtab_lo, mtab_up


def lw_fused_lanes(coeffs, kd, *, play_c, tlay_c, col_gas_c, idx_h2o,
                   tlev_c, tsfc, emis, inc, ds, weight,
                   cloud_tau_abs=None, byband: bool = False,
                   kernel_vjp: bool = False, interpret: bool = False):
    """Build descriptors and run the grand fused LW gas-optics + solve
    kernel (ops/pallas/fused_lw.py). All cell inputs are layer-major
    (nlay, ncol); tlev_c (nlay+1, ncol); tsfc (ncol,) — the band Planck
    interpolation happens in-kernel from kd.totplnk; emis/inc (ngpt, ncol).

    ``kernel_vjp=True`` dispatches through the hand-derived adjoint
    kernel (ops/pallas/fused_lw_bwd.py): the kernel gets its own Pallas
    backward and this builder's descriptor prep stays ordinary
    differentiable JAX, so a gradient never re-traces the XLA gas
    optics. Requires per-(block, layer) uniform pressure windows
    (shared pressure grids) and broadband output — the CALLER asserts
    eligibility.

    Returns (flux_up, flux_dn) each (nlay+1, ncol), or None when the
    configuration is ineligible."""
    from .pallas.fused_lw import lw_fused_gas_optics_solve
    from .pallas.fused_lw_bwd import lw_fused_solve_kernel_vjp

    gflav = np.asarray(kd.gpoint_flavor)
    bands = np.asarray(kd.grid.band_lims_gpt_array)
    nbnd = bands.shape[0]
    widths = bands[:, 1] - bands[:, 0] + 1
    w = int(widths[0])
    if not (widths == w).all() or kd.kmajor_lane is None \
            or kd.kmajor_lane_ntab != 2 \
            or kd.kminor_lower_lane is None or kd.kminor_upper_lane is None:
        return None
    nlay, ncol = coeffs.jtemp.shape
    dtype = coeffs.ftemp.dtype
    neta = kd.neta

    # per-FLAVOR major descriptors, fetched once per column block; the
    # kernel resolves each band's flavor pair via the SMEM flav table:
    # rows [fp, jp, tropo, ft0, ft1, te(2*nflav), fe(2*nflav),
    # cm(2*nflav)]
    nflav = coeffs.jeta.shape[1]
    jp = (coeffs.jpress + jnp.where(coeffs.tropo, 0, 1)).astype(dtype)
    rows = [coeffs.fpress, jp, coeffs.tropo.astype(dtype),
            (1.0 - coeffs.ftemp), coeffs.ftemp]
    for f in range(nflav):
        for it in range(2):
            rows.append(((coeffs.jtemp + it) * neta
                         + coeffs.jeta[it, f]).astype(dtype))
    for f in range(nflav):
        for it in range(2):
            rows.append(coeffs.feta[it, f])
    for f in range(nflav):
        for it in range(2):
            rows.append(coeffs.col_mix[it, f])
    netam1 = neta - 1
    for f in range(nflav):
        for it in range(2):
            rows.append(((coeffs.jtemp + it) * netam1
                         + coeffs.jeta[it, f]).astype(dtype))
    desc = jnp.stack(rows, 0)
    flav_rows = []
    for b in range(nbnd):
        g0 = int(bands[b, 0]) - 1
        flav_rows.extend([int(gflav[0, g0]), int(gflav[1, g0])])
    flav = jnp.asarray(flav_rows, jnp.int32)

    msc, band_minors = _minor_static(coeffs, kd, bands, w, play_c, tlay_c,
                                     col_gas_c, idx_h2o, dtype)
    mtab_lo, mtab_up = _minor_tables(kd, dtype)

    kw = dict(ds=ds, weight=weight, tp_min=kd.temp_ref_min,
              tp_delta=kd.totplnk_delta, nbnd=nbnd, w=w, nlay=nlay,
              ncol=ncol, nflav=nflav, band_minors=tuple(band_minors),
              cloud_tau_abs=cloud_tau_abs, interpret=interpret)
    if kernel_vjp and not byband:
        return lw_fused_solve_kernel_vjp(
            flav, desc, msc, kd.kmajor_lane, mtab_lo, mtab_up,
            tlay_c, tlev_c, tsfc, kd.totplnk,
            emis.reshape(nbnd, w, ncol), inc.reshape(nbnd, w, ncol), **kw)
    return lw_fused_gas_optics_solve(
        flav, desc, msc, kd.kmajor_lane, mtab_lo, mtab_up,
        tlay_c, tlev_c, tsfc, kd.totplnk,
        emis.reshape(nbnd, w, ncol), inc.reshape(nbnd, w, ncol),
        byband=byband, **kw)


LANE_ROWS_MAX_F = 128


def sw_fused_lanes(coeffs, kd, *, play_c, tlay_c, col_gas_c, col_dry_c,
                   idx_h2o, cloud, mu0, sfc_alb_dir, sfc_alb_dif, inc,
                   incdif=None, byband: bool = False,
                   kernel_vjp: bool = False, interpret: bool = False):
    """Build descriptors and run the grand fused SW gas-optics + two-stream
    kernel (ops/pallas/fused_sw.py). Cell inputs layer-major (nlay, ncol);
    cloud = by-band delta-scaled (tau, ssa, g) or None; mu0 (nlay, ncol);
    boundary fields (ngpt, ncol). ``kernel_vjp=True`` dispatches through
    the hand-derived adjoint kernel (ops/pallas/fused_sw_bwd.py) — see
    lw_fused_lanes. Returns (flux_up, flux_dn, flux_dir) each
    (nlay+1, ncol), or None when ineligible."""
    from .pallas.fused_sw import sw_fused_gas_optics_solve
    from .pallas.fused_sw_bwd import sw_fused_solve_kernel_vjp

    gflav = np.asarray(kd.gpoint_flavor)
    bands = np.asarray(kd.grid.band_lims_gpt_array)
    nbnd = bands.shape[0]
    widths = bands[:, 1] - bands[:, 0] + 1
    w = int(widths[0])
    if not (widths == w).all() or kd.kmajor_lane is None \
            or kd.kmajor_lane_ntab != 1 \
            or kd.kminor_lower_lane is None or kd.kminor_upper_lane is None \
            or kd.krayl_lane is None:
        return None
    nlay, ncol = coeffs.jtemp.shape
    dtype = coeffs.ftemp.dtype
    neta = kd.neta
    netam1 = neta - 1
    ngpt = kd.ngpt
    nflav = coeffs.jeta.shape[1]

    jp = (coeffs.jpress + jnp.where(coeffs.tropo, 0, 1)).astype(dtype)
    rayscale = col_gas_c[idx_h2o] + col_dry_c
    rows = [coeffs.fpress, jp, coeffs.tropo.astype(dtype),
            (1.0 - coeffs.ftemp), coeffs.ftemp, rayscale]
    for f in range(nflav):
        for it in range(2):
            rows.append(((coeffs.jtemp + it) * neta
                         + coeffs.jeta[it, f]).astype(dtype))
    for f in range(nflav):
        for it in range(2):
            rows.append(coeffs.feta[it, f])
    for f in range(nflav):
        for it in range(2):
            rows.append(coeffs.col_mix[it, f])
    for f in range(nflav):
        for it in range(2):
            rows.append(((coeffs.jtemp + it) * netam1
                         + coeffs.jeta[it, f]).astype(dtype))
    desc = jnp.stack(rows, 0)
    flav_rows = []
    for b in range(nbnd):
        g0 = int(bands[b, 0]) - 1
        flav_rows.extend([int(gflav[0, g0]), int(gflav[1, g0])])
    flav = jnp.asarray(flav_rows, jnp.int32)

    msc, band_minors = _minor_static(coeffs, kd, bands, w, play_c, tlay_c,
                                     col_gas_c, idx_h2o, dtype)
    band_g0 = [int(bands[b, 0]) - 1 for b in range(nbnd)]
    mtab_lo, mtab_up = _minor_tables(kd, dtype)

    incdif_w = incdif if incdif is not None else jnp.zeros_like(inc)
    # band-major krayl: rows (nbnd, [atm, de, g-in-band], 128) so the
    # fused kernel's per-band block uses only static row slices
    nlanes = kd.krayl_lane.shape[-1]
    rayl_band = (kd.krayl_lane.reshape(2, 2, nbnd, w, nlanes)
                 .transpose(2, 0, 1, 3, 4).reshape(nbnd, 4 * w, nlanes))
    kw = dict(nbnd=nbnd, w=w, nlay=nlay, ncol=ncol, nflav=nflav,
              ngpt=ngpt, band_minors=tuple(band_minors),
              band_g0=tuple(band_g0), interpret=interpret)
    args = (flav, desc, msc, kd.kmajor_lane, mtab_lo, mtab_up,
            rayl_band, cloud, mu0,
            sfc_alb_dir.reshape(nbnd, w, ncol),
            sfc_alb_dif.reshape(nbnd, w, ncol),
            inc.reshape(nbnd, w, ncol), incdif_w.reshape(nbnd, w, ncol))
    if kernel_vjp and not byband:
        return sw_fused_solve_kernel_vjp(*args, **kw)
    return sw_fused_gas_optics_solve(*args, byband=byband, **kw)
