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

__all__ = ["major_interp_lane", "PSPAN", "block_pressure_codes"]

PSPAN = 4   # pressure-window rows per block (max in-block span PSPAN-2)


def block_pressure_codes(desc_p, *, nlay, assume_uniform=False,
                         with_fp=True):
    """Per-(block, layer) SMEM tables for the fused kernels, from the
    PADDED descriptor stack (rows [fp, jp, tropo, ...], each
    (nlay, ncol_p) with ncol_p a multiple of 128).

    Returns (jpin, fpin): jpin (nblk, 3, nlay) int32 rows
    [pressure-window base jp0, uniform flag, tropopause code
    (1 = block all lower atm, 2 = all upper, 0 = mixed)]; fpin
    (nblk, 2, nlay) rows [fp scalar, fp-uniform flag] or None when
    ``with_fp=False``. ``assume_uniform=True`` pins the uniform flag to
    1 (the fused adjoint kernels' caller-asserted eligibility). This is
    the single definition of the block coding the forward AND adjoint
    fused kernels index — keep them reading the same tables.
    """
    nrm1 = desc_p.shape[-1] // _BC
    jp_all = desc_p[1].astype(jnp.int32)
    jp_blk = jp_all.reshape(nlay, nrm1, _BC)
    jp0 = jnp.min(jp_blk, axis=-1).T
    if assume_uniform:
        uniform = jnp.ones_like(jp0)
    else:
        uniform = (jnp.max(jp_blk, axis=-1).T == jp0).astype(jnp.int32)
    tr_blk = desc_p[2].reshape(nlay, nrm1, _BC)
    tr_min = jnp.min(tr_blk, axis=-1).T
    tr_max = jnp.max(tr_blk, axis=-1).T
    tcode = jnp.where(tr_min == tr_max,
                      jnp.where(tr_min > 0.5, 1, 2), 0).astype(jnp.int32)
    jpin = jnp.stack([jp0, uniform, tcode], 1)
    if not with_fp:
        return jpin, None
    fp_blk = desc_p[0].reshape(nlay, nrm1, _BC)
    fp0 = fp_blk[:, :, 0].T
    fpu = (jnp.min(fp_blk, -1) == jnp.max(fp_blk, -1)
           ).T.astype(desc_p.dtype)
    fpin = jnp.stack([fp0.astype(desc_p.dtype), fpu], 1)
    return jpin, fpin
_SUB = 8    # 128-cell lane groups per grid step (amortizes pipeline
            # overhead, the dominant cost at one group per step)


def _major_kernel(bd_ref, fp_ref, jp_ref, tab_ref,
                  out_ref, *, ntab, w, pspan):
    ntw = ntab * w
    # per-band descriptor pack: rows [te0, te1, fe0, fe1, cm0, cm1, ft0,
    # ft1] — 8 aligned sublanes per band so each grid step streams only
    # its own band's descriptors (not the full band-row matrix)
    bd_all = bd_ref[0]

    for s in range(_SUB):
        cs = slice(s * _BC, (s + 1) * _BC)
        jp = jp_ref[0, cs]
        jp0 = jnp.min(jp)
        # clamp keeps out-of-window cells finite (nearest-window interp)
        jpl = jnp.clip(jp - jp0, 0, pspan - 2)
        fp = fp_ref[0, cs][None, :]
        uniform = jnp.max(jp) == jp0
        bd = bd_all[:, cs]

        def combine(pres_of_it, bd=bd, cs=cs):
            acc = None
            for it in range(2):
                pres = pres_of_it(it)
                ftv = bd[6 + it, :][None, :]
                cmv = bd[4 + it, :][None, :]
                if ntab == 2:
                    term = jnp.concatenate(
                        [(ftv * cmv) * pres[:w, :], ftv * pres[w:, :]],
                        axis=0)
                else:
                    term = (ftv * cmv) * pres
                acc = term if acc is None else acc + term
            out_ref[:, cs] = acc

        # Fast path: the lane group shares one pressure index (physically
        # the common case — layer-major blocks of same-layer columns), so
        # only the two needed pressure rows are gathered.
        @pl.when(uniform)
        def _(bd=bd, fp=fp, jp0=jp0, combine=combine):
            slab = tab_ref[0, pl.ds(jp0 * ntw, 2 * ntw), :]  # (2*ntw, BC)

            def pres_of_it(it):
                te = bd[it, :].astype(jnp.int32)
                fe = bd[2 + it, :][None, :]
                g0 = _gather_rows(slab, te)
                g1 = _gather_rows(slab, te + 1)              # eta corner
                kk = (1.0 - fe) * g0 + fe * g1
                return (1.0 - fp) * kk[:ntw, :] + fp * kk[ntw:, :]

            combine(pres_of_it)

        @pl.when(jnp.logical_not(uniform))
        def _(bd=bd, fp=fp, jp0=jp0, jpl=jpl, combine=combine):
            slab = tab_ref[0, pl.ds(jp0 * ntw, pspan * ntw), :]

            def pres_of_it(it):
                te = bd[it, :].astype(jnp.int32)
                fe = bd[2 + it, :][None, :]
                g0 = _gather_rows(slab, te)                  # (pspan*ntw, BC)
                g1 = _gather_rows(slab, te + 1)              # eta corner
                kk = (1.0 - fe) * g0 + fe * g1
                # per-cell pressure corners: one-hot select in the window
                sel0 = jnp.zeros((ntw, _BC), kk.dtype)
                sel1 = jnp.zeros((ntw, _BC), kk.dtype)
                for p in range(pspan - 1):
                    m = (jpl == p).astype(kk.dtype)[None, :]
                    sel0 = sel0 + m * kk[p * ntw:(p + 1) * ntw, :]
                    sel1 = sel1 + m * kk[(p + 1) * ntw:(p + 2) * ntw, :]
                return (1.0 - fp) * sel0 + fp * sel1

            combine(pres_of_it)


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
    mult = _SUB * _BC
    (te, n), (fe, _), (cm, _) = (pad_cells(te, mult), pad_cells(fe, mult),
                                 pad_cells(cm, mult))
    (ft, _), (fp, _), (jp, _) = (pad_cells(ft, mult), pad_cells(fp, mult),
                                 pad_cells(jp, mult))
    ncell_p = te.shape[-1]
    # Pack the per-(band, itemp) descriptors band-major with 8 aligned
    # sublane rows [te0, te1, fe0, fe1, cm0, cm1, ft0, ft1] so each grid
    # step streams 8 rows instead of the full 3*(nbnd*2)+2 row matrix
    # (a 12x HBM-traffic cut at production band counts). te is exact in
    # f32 (lane indices < 2^11).
    dtype = fe.dtype
    te2 = te.astype(dtype).reshape(nbnd, 2, ncell_p)
    fe2 = fe.reshape(nbnd, 2, ncell_p)
    cm2 = cm.reshape(nbnd, 2, ncell_p)
    ft2 = jnp.broadcast_to(ft[None], (nbnd, 2, ncell_p))
    bd = jnp.concatenate([te2, fe2, cm2, ft2], axis=1)     # (nbnd, 8, ncell)
    kern = functools.partial(_major_kernel, ntab=ntab, w=w, pspan=PSPAN)
    bw = _SUB * _BC
    out = pl.pallas_call(
        kern,
        grid=(nbnd, ncell_p // bw),
        in_specs=[
            pl.BlockSpec((1, 8, bw), lambda b, i: (b, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bw), lambda b, i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bw), lambda b, i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, table_lane.shape[1], LANE_ROWS_MAX),
                         lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ntab * w, bw), lambda b, i: (b, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nbnd * ntab * w, ncell_p), fe.dtype),
        interpret=interpret,
    )(bd, fp, jp, table_lane)
    return out, n
