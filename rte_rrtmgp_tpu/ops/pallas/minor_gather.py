"""Pallas TPU kernels for 2-D (temperature x eta) table interpolation.

The minor-gas and Rayleigh lookups interpolate tables over a
(jtemp, jeta) grid whose row count ntemp*(neta-1) is at most 112 for the
production k-distributions — it fits the TPU's 128-lane cross-lane
gather. These kernels keep the tables resident in VMEM, put CELLS on the
lane axis, and fetch each cell's interpolation row with
``take_along_axis(table_slice, rows, axis=1)`` — one vector instruction
gathers a (sublane x 128-cell) tile, eliminating the HBM random-row
gathers that dominate the XLA path (~25 GB/s effective there).

Outputs are produced in (ngpt, ncell) layout (cells stay on lanes); the
caller transposes back. Cell counts are padded to the 128-lane block.

Reference numerics: gas_optical_depths_minor and compute_tau_rayleigh
(rrtmgp/kernels/mo_gas_optics_rrtmgp_kernels.F90:402-501, :506-565);
behavior matches ops/gas_optics.tau_minor / tau_rayleigh exactly.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["minor_contributions_lane", "rayleigh_k_lane", "LANE_ROWS_MAX",
           "pad_cells", "supported"]

LANE_ROWS_MAX = 128
_BC = 128   # cells per block (lane axis)


def supported(ntemp: int, netam1: int) -> bool:
    return ntemp * netam1 <= LANE_ROWS_MAX


def pad_cells(x, multiple: int = _BC):
    """Pad the last (cell) axis up to a multiple; returns (padded, n)."""
    n = x.shape[-1]
    pad = (-n) % multiple
    if pad == 0:
        return x, n
    widths = [(0, 0)] * (x.ndim - 1) + [(0, pad)]
    return jnp.pad(x, widths), n


def _gather_rows(tab_slice, rows):
    """out[s, j] = tab_slice[s, rows[j]] via the TPU cross-lane gather."""
    idx = jnp.broadcast_to(rows[None, :], tab_slice.shape)
    return jnp.take_along_axis(tab_slice, idx, axis=1)


# ---------------------------------------------------------------------------
# minor gases
# ---------------------------------------------------------------------------

def _minor_kernel(idx_ref, fm_ref, scal_ref, tab_ref, out_ref, *,
                  groups, ncont, ngpt):
    """groups: static tuple of (group_index, members) where members are
    (gas_index, kminor_start, g0, width); idx rows are per (group, itemp),
    fm weights per (group, itemp, deta), scaling per gas."""
    # accumulate straight into the output ref with static slices
    # (value-level scatter-add does not lower on Mosaic)
    out_ref[:, :] = jnp.zeros((ngpt, _BC), out_ref.dtype)
    for gi, members in groups:
        for it in range(2):
            rows = idx_ref[2 * gi + it, :]                        # (BC,)
            fm0 = fm_ref[4 * gi + 2 * it + 0, :]                  # (BC,)
            fm1 = fm_ref[4 * gi + 2 * it + 1, :]
            for (mg, start, g0, w) in members:
                lo = _gather_rows(tab_ref[start:start + w, :], rows)
                hi = _gather_rows(tab_ref[ncont + start:ncont + start + w, :],
                                  rows)
                kk = fm0[None, :] * lo + fm1[None, :] * hi        # (w, BC)
                contrib = scal_ref[mg, :][None, :] * kk
                out_ref[g0:g0 + w, :] += contrib


def minor_contributions_lane(idx, fm, scaling, table_lane, *, groups,
                             ncont: int, ngpt: int,
                             interpret: bool = False):
    """Summed minor-gas optical-depth contributions, (ngpt, ncell_padded).

    idx: (2*ngroups, ncell) int32 interpolation rows (jt+it)*(neta-1)+jeta.
    fm: (4*ngroups, ncell) eta weights [group, itemp, deta].
    scaling: (ngas, ncell) per-gas scaling (density/complement terms and
      the atmosphere mask already applied).
    table_lane: (2*ncont, 128) — kminor with eta corners leading and the
      (jtemp, jeta) row domain on lanes.
    groups: static ((group_index, ((gas, kminor_start, g0, w), ...)), ...).
    """
    (idx, n), (fm, _), (scaling, _) = (pad_cells(idx), pad_cells(fm),
                                       pad_cells(scaling))
    ncell_p = idx.shape[-1]
    grid = ncell_p // _BC
    kern = functools.partial(_minor_kernel, groups=groups, ncont=ncont,
                             ngpt=ngpt)
    out = pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((idx.shape[0], _BC), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((fm.shape[0], _BC), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((scaling.shape[0], _BC), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((table_lane.shape[0], LANE_ROWS_MAX),
                         lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ngpt, _BC), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ngpt, ncell_p), scaling.dtype),
        interpret=interpret,
    )(idx, fm, scaling, table_lane)
    return out, n


# ---------------------------------------------------------------------------
# rayleigh
# ---------------------------------------------------------------------------

def _rayleigh_kernel(idx_ref, fm_ref, tropo_ref, tab_ref, out_ref, *,
                     band_groups, ngpt):
    """band_groups: static ((group_index, ((g0, w), ...)), ...) — bands
    sharing a flavor; idx/fm are per (group, itemp[, deta]).
    tab rows: [itropo, de, g] payload; tropo_ref: (1, BC) 1.0 = lower."""
    out_ref[:, :] = jnp.zeros((ngpt, _BC), out_ref.dtype)
    tropo = tropo_ref[0, :][None, :]
    for gi, bands in band_groups:
        for it in range(2):
            rows = idx_ref[2 * gi + it, :]
            fm0 = fm_ref[4 * gi + 2 * it + 0, :][None, :]
            fm1 = fm_ref[4 * gi + 2 * it + 1, :][None, :]
            for (g0, w) in bands:
                def slab(atm, de):
                    base = (atm * 2 + de) * ngpt + g0
                    return _gather_rows(tab_ref[base:base + w, :], rows)
                k_lo = fm0 * slab(0, 0) + fm1 * slab(0, 1)
                k_up = fm0 * slab(1, 0) + fm1 * slab(1, 1)
                k = tropo * k_lo + (1.0 - tropo) * k_up
                out_ref[g0:g0 + w, :] += k


def rayleigh_k_lane(idx, fm, tropo, table_lane, *, band_groups, ngpt: int,
                    interpret: bool = False):
    """Interpolated Rayleigh k, (ngpt, ncell_padded); caller multiplies by
    (col_h2o + col_dry) and transposes.

    table_lane: (2*2*ngpt, 128) — krayl with [itropo, de, gpt] payload
    leading and the (jtemp, jeta) row domain on lanes.
    """
    (idx, n), (fm, _), (tropo, _) = (pad_cells(idx), pad_cells(fm),
                                     pad_cells(tropo))
    ncell_p = idx.shape[-1]
    grid = ncell_p // _BC
    kern = functools.partial(_rayleigh_kernel, band_groups=band_groups,
                             ngpt=ngpt)
    out = pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((idx.shape[0], _BC), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((fm.shape[0], _BC), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _BC), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((table_lane.shape[0], LANE_ROWS_MAX),
                         lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ngpt, _BC), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ngpt, ncell_p), fm.dtype),
        interpret=interpret,
    )(idx, fm, tropo, table_lane)
    return out, n


# ---------------------------------------------------------------------------
# cloud particle-size tables
# ---------------------------------------------------------------------------

def _cloud_kernel(idx_ref, fint_ref, wp_ref, liq_ref, ice_ref, out_ref, *,
                  nbnd):
    """Two-phase (liquid, ice) particle-size LUT interpolation (reference
    compute_cld_from_table): per phase, gather the (ext, ssa, asy) x
    (lo, hi corner) x band payload at the cell's size index, interpolate,
    and accumulate (tau, tau*ssa, tau*ssa*g) over phases.
    idx/fint/wp: (2, BC) with the phase mask folded into wp."""
    out_ref[:, :] = jnp.zeros((3 * nbnd, _BC), out_ref.dtype)
    for phase, tab in ((0, liq_ref), (1, ice_ref)):
        rows = idx_ref[phase, :]
        fint = fint_ref[phase, :][None, :]
        wp = wp_ref[phase, :][None, :]
        # payload layout: prop p, corner c, band b at ((p*2)+c)*nbnd + b
        def interp(p):
            lo = _gather_rows(tab[(p * 2 + 0) * nbnd:(p * 2 + 0) * nbnd + nbnd, :],
                              rows)
            hi = _gather_rows(tab[(p * 2 + 1) * nbnd:(p * 2 + 1) * nbnd + nbnd, :],
                              rows)
            return lo + fint * (hi - lo)

        t = wp * interp(0)
        ts = t * interp(1)
        tsg = ts * interp(2)
        out_ref[0 * nbnd:1 * nbnd, :] += t
        out_ref[1 * nbnd:2 * nbnd, :] += ts
        out_ref[2 * nbnd:3 * nbnd, :] += tsg


def cloud_props_lane(idx, fint, wp, liq_lane, ice_lane, *, nbnd: int,
                     interpret: bool = False):
    """Summed (tau, tau*ssa, tau*ssa*g) over phases, (3*nbnd, ncell_padded).

    idx/fint/wp: (2, ncell) per-phase size index (0-based lower corner),
    interpolation fraction, and water path (phase mask pre-applied to wp).
    liq_lane/ice_lane: (3*2*nbnd, 128) lane tables — payload
    (prop, corner, band) on sublanes, size-bin domain on lanes.
    """
    (idx, n), (fint, _), (wp, _) = (pad_cells(idx), pad_cells(fint),
                                    pad_cells(wp))
    ncell_p = idx.shape[-1]
    kern = functools.partial(_cloud_kernel, nbnd=nbnd)
    out = pl.pallas_call(
        kern,
        grid=(ncell_p // _BC,),
        in_specs=[
            pl.BlockSpec((2, _BC), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, _BC), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, _BC), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((liq_lane.shape[0], LANE_ROWS_MAX),
                         lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ice_lane.shape[0], LANE_ROWS_MAX),
                         lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((3 * nbnd, _BC), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3 * nbnd, ncell_p), wp.dtype),
        interpret=interpret,
    )(idx, fint, wp, liq_lane, ice_lane)
    return out, n
