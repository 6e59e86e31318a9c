"""Pallas TPU kernel for the 3-D major-gas (temperature x eta x pressure)
table interpolation — the hottest op in RRTMGP gas optics.

The (jtemp, jeta) part of the lookup fits the 128-lane cross-lane gather
(ntemp * neta = 126 for production k-distributions, with the eta corner
reachable as lane+1). The pressure axis does not — but cells are blocked
LAYER-MAJOR, so the 128 cells of a block live in one or two adjacent
layers and span only a few pressure indices: the kernel dynamic-slices a
small pressure window (PSPAN rows) around the block minimum out of the
VMEM-resident band table and resolves the per-cell pressure corners with
a one-hot select inside the window.

Assumption (checked eagerly when inputs are concrete; clamped otherwise):
within any 128-cell layer-major block the pressure index spans at most
PSPAN-1 values. This holds for physical atmospheres — columns at the
same layer differ by far less than one decade of pressure — and is
documented in config.use_pallas.

Payload per (band) table row: (pressure, table, gpt) with table in
{kmajor, planck_frac} for LW; outputs are (ntab*ngpt, ncell) with cells
on lanes (the caller transposes). Reference numerics:
gas_optical_depths_major / compute_Planck_source pfrac
(rrtmgp/kernels/mo_gas_optics_rrtmgp_kernels.F90:345-396, :619-634).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .minor_gather import _BC, LANE_ROWS_MAX, _gather_rows, pad_cells

__all__ = ["major_interp_lane", "PSPAN"]

PSPAN = 4   # pressure-window rows per block (max in-block span PSPAN-2)


def _major_kernel(te_ref, fe_ref, cm_ref, ft_ref, fp_ref, jp_ref, tab_ref,
                  out_ref, *, ntab, w, pspan):
    ntw = ntab * w
    b = pl.program_id(0)
    jp = jp_ref[0, :]
    jp0 = jnp.min(jp)
    # clamp keeps out-of-window cells finite (nearest-window interpolation)
    jpl = jnp.clip(jp - jp0, 0, pspan - 2)
    fp = fp_ref[0, :][None, :]
    slab = tab_ref[0, pl.ds(jp0 * ntw, pspan * ntw), :]      # (pspan*ntw, BC)

    acc = None
    for it in range(2):
        te = te_ref[2 * b + it, :]
        fe = fe_ref[2 * b + it, :][None, :]
        g0 = _gather_rows(slab, te)                          # (pspan*ntw, BC)
        g1 = _gather_rows(slab, te + 1)                      # eta corner
        kk = (1.0 - fe) * g0 + fe * g1
        # per-cell pressure corners: one-hot select inside the window
        sel0 = jnp.zeros((ntw, _BC), kk.dtype)
        sel1 = jnp.zeros((ntw, _BC), kk.dtype)
        for p in range(pspan - 1):
            m = (jpl == p).astype(kk.dtype)[None, :]
            sel0 = sel0 + m * kk[p * ntw:(p + 1) * ntw, :]
            sel1 = sel1 + m * kk[(p + 1) * ntw:(p + 2) * ntw, :]
        pres = (1.0 - fp) * sel0 + fp * sel1
        ftv = ft_ref[it, :][None, :]
        cmv = cm_ref[2 * b + it, :][None, :]
        if ntab == 2:
            term = jnp.concatenate(
                [(ftv * cmv) * pres[:w, :], ftv * pres[w:, :]], axis=0)
        else:
            term = (ftv * cmv) * pres
        acc = term if acc is None else acc + term
    out_ref[:, :] = acc


def major_interp_lane(te, fe, cm, ft, fp, jp, table_lane, *, nbnd: int,
                      ntab: int, w: int, interpret: bool = False):
    """Major-gas tau (and packed Planck fraction) interpolation.

    te/fe/cm: (nbnd*2, ncell) — per (band, itemp) lane index jt*neta+jeta,
      raw eta fraction, and col_mix (tau scaling).
    ft: (2, ncell) temperature weights (1-ftemp, ftemp).
    fp: (1, ncell) pressure fraction; jp: (1, ncell) int32 pressure index
      (tropopause offset applied). Cells must be ordered LAYER-major.
    table_lane: (nbnd, (npres+PSPAN)*ntab*w, 128) — per-band payload
      (pressure, table, gpt) on sublanes, (jtemp, jeta) domain on lanes.

    Returns ((ntab*ngpt, ncell_padded), ncell): for each band, rows
    [band*ntab*w : ...] hold [tau gpts, planck gpts].
    """
    (te, n), (fe, _), (cm, _) = pad_cells(te), pad_cells(fe), pad_cells(cm)
    (ft, _), (fp, _), (jp, _) = pad_cells(ft), pad_cells(fp), pad_cells(jp)
    ncell_p = te.shape[-1]
    kern = functools.partial(_major_kernel, ntab=ntab, w=w, pspan=PSPAN)
    out = pl.pallas_call(
        kern,
        grid=(nbnd, ncell_p // _BC),
        in_specs=[
            # full band-row blocks (Mosaic needs sublane dims divisible by
            # 8 or full); the kernel selects rows 2*band(+it) itself
            pl.BlockSpec((nbnd * 2, _BC), lambda b, i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nbnd * 2, _BC), lambda b, i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nbnd * 2, _BC), lambda b, i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, _BC), lambda b, i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _BC), lambda b, i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _BC), lambda b, i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, table_lane.shape[1], LANE_ROWS_MAX),
                         lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ntab * w, _BC), lambda b, i: (b, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nbnd * ntab * w, ncell_p), fe.dtype),
        interpret=interpret,
    )(te, fe, cm, ft, fp, jp, table_lane)
    return out, n
