"""Experimental variants of the grand fused LW kernel (perf lab).

Each variant is a drop-in for lw_fused_gas_optics_solve; bench with
scripts/bench_fused_variants.py. Winners get promoted into
rte_rrtmgp_tpu/ops/pallas/fused_lw.py.

Round-2 lab: jp0/uniform SMEM hoisting (v_jpin) was promoted; the
current experiments are bf16 major-table payloads.
"""
import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rte_rrtmgp_tpu.ops.pallas.major_gather import PSPAN
from rte_rrtmgp_tpu.ops.pallas.minor_gather import (LANE_ROWS_MAX, _BC,
                                                    _gather_rows)
from rte_rrtmgp_tpu.ops.pallas.fused_lw import lw_fused_gas_optics_solve


def _kernel_bf(dsw_ref, flav_ref, jpin_ref, desc_ref, msc_ref,
               tab_ref, mtab_lo_ref, mtab_up_ref,
               pbl_ref, pbv_ref, pbs_ref, cld_ref, emis_ref, inc_ref,
               up_ref, dn_ref,
               tau_s, pf_s, sdn_s, sup_s, rdn_s, rup_s, *,
               nlay, w, pspan, band_minors, ncont_lo, nflav,
               with_cloud, bf_combine):
    """Production kernel with the major table in bf16.

    bf_combine: if True the eta/temp/press interpolation runs in bf16 and
    only the final (tau, pfrac) per itemp is cast to f32; else each
    gather result is cast to f32 immediately.
    """
    b = pl.program_id(1)
    dtype = tau_s.dtype
    eps = np.finfo(np.float32).eps
    tiny = jnp.asarray(np.finfo(np.float32).tiny, dtype)
    tau_thresh = jnp.asarray(np.sqrt(np.sqrt(eps)), dtype)
    ds = dsw_ref[0]
    piw = jnp.asarray(np.pi, dtype) * dsw_ref[1]
    ntw = 2 * w
    TE0, FE0, CM0 = 5, 5 + 2 * nflav, 5 + 4 * nflav
    TR0 = 5 + 6 * nflav
    flo = flav_ref[2 * b]
    fhi = flav_ref[2 * b + 1]

    def build_layer(l, _):
        fp = desc_ref[0, l, :][None, :]
        tropo = desc_ref[2, l, :]
        jp0 = jpin_ref[0, 0, l]
        uniform = jpin_ref[0, 1, l] != 0

        def fields(it):
            def sel(base):
                return jnp.where(tropo > 0.5,
                                 desc_ref[base + 2 * flo + it, l, :],
                                 desc_ref[base + 2 * fhi + it, l, :])
            return (sel(TE0).astype(jnp.int32), sel(FE0)[None, :],
                    sel(CM0)[None, :], desc_ref[3 + it, l, :][None, :])

        def combine(pres_of_it):
            acc = None
            for it in range(2):
                pres, cmv, ftv = pres_of_it(it)
                pres = pres.astype(dtype)
                term = jnp.concatenate(
                    [(ftv * cmv) * pres[:w, :], ftv * pres[w:, :]], axis=0)
                acc = term if acc is None else acc + term
            tau_s[:, l, :] = acc[:w, :]
            pf_s[:, l, :] = acc[w:, :]

        @pl.when(uniform)
        def _():
            slab = tab_ref[0, pl.ds(jp0 * ntw, 2 * ntw), :]

            def pres_of_it(it):
                te, fe, cmv, ftv = fields(it)
                g0 = _gather_rows(slab, te)
                g1 = _gather_rows(slab, te + 1)
                if bf_combine:
                    feb = fe.astype(jnp.bfloat16)
                    fpb = fp.astype(jnp.bfloat16)
                    kk = (1 - feb) * g0 + feb * g1
                    return ((1 - fpb) * kk[:ntw, :] + fpb * kk[ntw:, :],
                            cmv, ftv)
                g0 = g0.astype(dtype)
                g1 = g1.astype(dtype)
                kk = (1.0 - fe) * g0 + fe * g1
                return ((1.0 - fp) * kk[:ntw, :] + fp * kk[ntw:, :],
                        cmv, ftv)

            combine(pres_of_it)

        @pl.when(jnp.logical_not(uniform))
        def _():
            jp = desc_ref[1, l, :].astype(jnp.int32)
            jpl = jnp.clip(jp - jp0, 0, pspan - 2)
            slab = tab_ref[0, pl.ds(jp0 * ntw, pspan * ntw), :]

            def pres_of_it(it):
                te, fe, cmv, ftv = fields(it)
                g0 = _gather_rows(slab, te).astype(dtype)
                g1 = _gather_rows(slab, te + 1).astype(dtype)
                kk = (1.0 - fe) * g0 + fe * g1
                sel0 = jnp.zeros((ntw, _BC), kk.dtype)
                sel1 = jnp.zeros((ntw, _BC), kk.dtype)
                for p in range(pspan - 1):
                    m = (jpl == p).astype(kk.dtype)[None, :]
                    sel0 = sel0 + m * kk[p * ntw:(p + 1) * ntw, :]
                    sel1 = sel1 + m * kk[(p + 1) * ntw:(p + 2) * ntw, :]
                return ((1.0 - fp) * sel0 + fp * sel1, cmv, ftv)

            combine(pres_of_it)

        return 0

    jax.lax.fori_loop(0, nlay, build_layer, 0)

    for bi, members in enumerate(band_minors):
        if not members:
            continue

        @pl.when(b == bi)
        def _(members=members):
            def minor_layer(l, _):
                for (lower, f, mg, start, lg0, wm) in members:
                    ncont = (ncont_lo if lower
                             else mtab_up_ref.shape[0] // 2)
                    tref = mtab_lo_ref if lower else mtab_up_ref
                    scal = msc_ref[mg, l, :][None, :]
                    kk = jnp.zeros((wm, _BC), dtype)
                    for it in range(2):
                        rr = desc_ref[TR0 + 2 * f + it, l, :
                                      ].astype(jnp.int32)
                        fe = desc_ref[FE0 + 2 * f + it, l, :][None, :]
                        ftv = desc_ref[3 + it, l, :][None, :]
                        fm0 = (1.0 - fe) * ftv
                        fm1 = fe * ftv
                        lo = _gather_rows(tref[start:start + wm, :], rr)
                        hi = _gather_rows(
                            tref[ncont + start:ncont + start + wm, :], rr)
                        kk = kk + fm0 * lo + fm1 * hi
                    tau_s[lg0:lg0 + wm, l, :] += scal * kk
                return 0

            jax.lax.fori_loop(0, nlay, minor_layer, 0)

    tau = tau_s[:, :, :]
    if with_cloud:
        tau = tau + cld_ref[0, :, :][None, :, :]

    pf = pf_s[:, :, :]
    pb_lay = pbl_ref[0, :, :][None, :, :]
    pb_lev = pbv_ref[0, :, :][None, :, :]
    lay = pf * pb_lay
    pf_in = jnp.sqrt(pf[:, 1:, :] * pf[:, :-1, :])
    lev_top = jnp.concatenate([pf[:, :1, :], pf_in], axis=1) \
        * pb_lev[:, :-1, :]
    lev_bot = jnp.concatenate([pf_in, pf[:, -1:, :]], axis=1) \
        * pb_lev[:, 1:, :]

    tl = tau * ds
    trans = jnp.exp(-tl)
    tau_s[:, :, :] = trans
    fact_big = (1.0 - trans) / jnp.maximum(tl, tiny) - trans
    fact_small = tl * (0.5 + tl * (-1.0 / 3.0 + tl * 0.125))
    fact = jnp.where(tl > tau_thresh, fact_big, fact_small)
    sdn_s[:, :, :] = (1.0 - trans) * lev_bot + 2.0 * fact * (lay - lev_bot)
    sup_s[:, :, :] = (1.0 - trans) * lev_top + 2.0 * fact * (lay - lev_top)

    rdn_s[:, 0, :] = inc_ref[0, :, :] / piw

    def down(l, _):
        rdn_s[:, l + 1, :] = (tau_s[:, l, :] * rdn_s[:, l, :]
                              + sdn_s[:, l, :])
        return 0

    jax.lax.fori_loop(0, nlay, down, 0)

    emis = emis_ref[0, :, :]
    sfc_src = pf[:, nlay - 1, :] * pbs_ref[0, 0, :][None, :]
    rup_s[:, nlay, :] = (rdn_s[:, nlay, :] * (1.0 - emis) + emis * sfc_src)

    def up(i, _):
        v = nlay - 1 - i
        rup_s[:, v, :] = (tau_s[:, v, :] * rup_s[:, v + 1, :]
                          + sup_s[:, v, :])
        return 0

    jax.lax.fori_loop(0, nlay, up, 0)

    bb_up = piw * jnp.sum(rup_s[:, :, :], axis=0)
    bb_dn = piw * jnp.sum(rdn_s[:, :, :], axis=0)

    @pl.when(b == 0)
    def _():
        up_ref[:, :] = bb_up
        dn_ref[:, :] = bb_dn

    @pl.when(b != 0)
    def _():
        up_ref[:, :] += bb_up
        dn_ref[:, :] += bb_dn


def _solve_bf(flav, desc, msc, table_lane,
              mtab_lo, mtab_up, pb_lay, pb_lev, pb_sfc,
              emis, inc, *, ds, weight, nbnd, w, nlay, ncol,
              nflav, band_minors, cloud_tau_abs=None,
              interpret: bool = False, bf_combine=False):
    dtype = desc.dtype
    pc = (-ncol) % _BC
    padc = lambda x: jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pc)])
    padc_e = lambda x: (x if pc == 0 else jnp.pad(
        x, [(0, 0)] * (x.ndim - 1) + [(0, pc)], mode="edge"))
    ncol_p = ncol + pc
    nlev = nlay + 1
    with_cloud = cloud_tau_abs is not None
    cld = (cloud_tau_abs if with_cloud
           else jnp.zeros((1, nlay, ncol), dtype))
    dsw = jnp.stack([jnp.asarray(ds, dtype).reshape(()),
                     jnp.asarray(weight, dtype).reshape(())])

    table_bf = table_lane.astype(jnp.bfloat16)

    desc_p = padc_e(desc)
    jp_all = desc_p[1].astype(jnp.int32)
    jp_blk = jp_all.reshape(nlay, ncol_p // _BC, _BC)
    jp0 = jnp.min(jp_blk, axis=-1).T
    jpmax = jnp.max(jp_blk, axis=-1).T
    jpin = jnp.stack([jp0, (jpmax == jp0).astype(jnp.int32)], 1)

    kern = functools.partial(
        _kernel_bf, nlay=nlay, w=w, pspan=PSPAN,
        band_minors=band_minors, ncont_lo=mtab_lo.shape[0] // 2,
        nflav=nflav, with_cloud=with_cloud, bf_combine=bf_combine)

    cb_rows = lambda a: pl.BlockSpec(
        (a.shape[0], nlay, _BC), lambda c, b: (0, 0, c),
        memory_space=pltpu.VMEM)
    band3 = lambda nl: pl.BlockSpec((1, nl, _BC), lambda c, b: (b, 0, c),
                                    memory_space=pltpu.VMEM)
    resident = lambda a: pl.BlockSpec(a.shape, lambda c, b: (0,) * a.ndim,
                                      memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    obb = pl.BlockSpec((nlev, _BC), lambda c, b: (0, c),
                       memory_space=pltpu.VMEM)
    scr = lambda nl: pltpu.VMEM((w, nl, _BC), dtype)

    up, dn = pl.pallas_call(
        kern,
        grid=(ncol_p // _BC, nbnd),
        in_specs=[
            smem, smem,
            pl.BlockSpec((1, 2, nlay), lambda c, b: (c, 0, 0),
                         memory_space=pltpu.SMEM),
            cb_rows(desc), cb_rows(msc),
            pl.BlockSpec((1, table_bf.shape[1], LANE_ROWS_MAX),
                         lambda c, b: (b, 0, 0), memory_space=pltpu.VMEM),
            resident(mtab_lo), resident(mtab_up),
            band3(nlay), band3(nlev),
            pl.BlockSpec((1, 1, _BC), lambda c, b: (b, 0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nlay, _BC),
                         lambda c, b: ((b if with_cloud else 0), 0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, w, _BC), lambda c, b: (b, 0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, w, _BC), lambda c, b: (b, 0, c),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[obb, obb],
        out_shape=[jax.ShapeDtypeStruct((nlev, ncol_p), dtype)] * 2,
        scratch_shapes=[scr(nlay), scr(nlay), scr(nlay), scr(nlay),
                        scr(nlev), scr(nlev)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(dsw, flav, jpin, desc_p, padc(msc),
      table_bf, mtab_lo, mtab_up, padc(pb_lay), padc(pb_lev),
      padc(pb_sfc), padc(cld), padc(emis), padc(inc))
    return up[:, :ncol], dn[:, :ncol]


VARIANTS = {
    "v_bf16tab": functools.partial(_solve_bf, bf_combine=False),
    "v_bf16mix": functools.partial(_solve_bf, bf_combine=True),
    "nominors": lambda *a, **k: lw_fused_gas_optics_solve(
        *a, **{**k, "band_minors": ((),) * k["nbnd"]}),
    "nocloud": lambda *a, **k: lw_fused_gas_optics_solve(
        *a, **{**k, "cloud_tau_abs": None}),
}


# ---------------------------------------------------------------------------
# v_unroll2: production kernel with TWO layers per fori_loop iteration —
# probes how much of the ~590 cycles/layer is loop/branch overhead.
# ---------------------------------------------------------------------------
from rte_rrtmgp_tpu.ops.pallas import fused_lw as _prod


def _kernel_u2(dsw_ref, flav_ref, jpin_ref, desc_ref, msc_ref,
               tab_ref, mtab_lo_ref, mtab_up_ref,
               pbl_ref, pbv_ref, pbs_ref, cld_ref, emis_ref, inc_ref,
               up_ref, dn_ref,
               tau_s, pf_s, sdn_s, sup_s, rdn_s, rup_s, *,
               nlay, w, pspan, band_minors, ncont_lo, nflav, with_cloud):
    b = pl.program_id(1)
    dtype = tau_s.dtype
    eps = np.finfo(np.float32).eps
    tiny = jnp.asarray(np.finfo(np.float32).tiny, dtype)
    tau_thresh = jnp.asarray(np.sqrt(np.sqrt(eps)), dtype)
    ds = dsw_ref[0]
    piw = jnp.asarray(np.pi, dtype) * dsw_ref[1]
    ntw = 2 * w
    TE0, FE0, CM0 = 5, 5 + 2 * nflav, 5 + 4 * nflav
    TR0 = 5 + 6 * nflav
    flo = flav_ref[2 * b]
    fhi = flav_ref[2 * b + 1]

    def one_layer(l):
        fp = desc_ref[0, l, :][None, :]
        tropo = desc_ref[2, l, :]
        jp0 = jpin_ref[0, 0, l]
        uniform = jpin_ref[0, 1, l] != 0

        def fields(it):
            def sel(base):
                return jnp.where(tropo > 0.5,
                                 desc_ref[base + 2 * flo + it, l, :],
                                 desc_ref[base + 2 * fhi + it, l, :])
            return (sel(TE0).astype(jnp.int32), sel(FE0)[None, :],
                    sel(CM0)[None, :], desc_ref[3 + it, l, :][None, :])

        def combine(pres_of_it):
            acc = None
            for it in range(2):
                pres, cmv, ftv = pres_of_it(it)
                term = jnp.concatenate(
                    [(ftv * cmv) * pres[:w, :], ftv * pres[w:, :]], axis=0)
                acc = term if acc is None else acc + term
            tau_s[:, l, :] = acc[:w, :]
            pf_s[:, l, :] = acc[w:, :]

        @pl.when(uniform)
        def _():
            slab = tab_ref[b, pl.ds(jp0 * ntw, 2 * ntw), :]

            def pres_of_it(it):
                te, fe, cmv, ftv = fields(it)
                g0 = _gather_rows(slab, te)
                g1 = _gather_rows(slab, te + 1)
                kk = (1.0 - fe) * g0 + fe * g1
                return ((1.0 - fp) * kk[:ntw, :] + fp * kk[ntw:, :],
                        cmv, ftv)

            combine(pres_of_it)

        @pl.when(jnp.logical_not(uniform))
        def _():
            jp = desc_ref[1, l, :].astype(jnp.int32)
            jpl = jnp.clip(jp - jp0, 0, pspan - 2)
            slab = tab_ref[b, pl.ds(jp0 * ntw, pspan * ntw), :]

            def pres_of_it(it):
                te, fe, cmv, ftv = fields(it)
                g0 = _gather_rows(slab, te)
                g1 = _gather_rows(slab, te + 1)
                kk = (1.0 - fe) * g0 + fe * g1
                sel0 = jnp.zeros((ntw, _BC), kk.dtype)
                sel1 = jnp.zeros((ntw, _BC), kk.dtype)
                for p in range(pspan - 1):
                    m = (jpl == p).astype(kk.dtype)[None, :]
                    sel0 = sel0 + m * kk[p * ntw:(p + 1) * ntw, :]
                    sel1 = sel1 + m * kk[(p + 1) * ntw:(p + 2) * ntw, :]
                return ((1.0 - fp) * sel0 + fp * sel1, cmv, ftv)

            combine(pres_of_it)

    def build2(i, _):
        one_layer(2 * i)
        one_layer(2 * i + 1)
        return 0

    jax.lax.fori_loop(0, nlay // 2, build2, 0)

    for bi, members in enumerate(band_minors):
        if not members:
            continue

        @pl.when(b == bi)
        def _(members=members):
            def minor_layer(l, _):
                for (lower, f, mg, start, lg0, wm) in members:
                    ncont = (ncont_lo if lower
                             else mtab_up_ref.shape[0] // 2)
                    tref = mtab_lo_ref if lower else mtab_up_ref
                    scal = msc_ref[mg, l, :][None, :]
                    kk = jnp.zeros((wm, _BC), dtype)
                    for it in range(2):
                        rr = desc_ref[TR0 + 2 * f + it, l, :
                                      ].astype(jnp.int32)
                        fe = desc_ref[FE0 + 2 * f + it, l, :][None, :]
                        ftv = desc_ref[3 + it, l, :][None, :]
                        fm0 = (1.0 - fe) * ftv
                        fm1 = fe * ftv
                        lo = _gather_rows(tref[start:start + wm, :], rr)
                        hi = _gather_rows(
                            tref[ncont + start:ncont + start + wm, :], rr)
                        kk = kk + fm0 * lo + fm1 * hi
                    tau_s[lg0:lg0 + wm, l, :] += scal * kk
                return 0

            jax.lax.fori_loop(0, nlay, minor_layer, 0)

    tau = tau_s[:, :, :]
    if with_cloud:
        tau = tau + cld_ref[0, :, :][None, :, :]

    pf = pf_s[:, :, :]
    pb_lay = pbl_ref[0, :, :][None, :, :]
    pb_lev = pbv_ref[0, :, :][None, :, :]
    lay = pf * pb_lay
    pf_in = jnp.sqrt(pf[:, 1:, :] * pf[:, :-1, :])
    lev_top = jnp.concatenate([pf[:, :1, :], pf_in], axis=1) \
        * pb_lev[:, :-1, :]
    lev_bot = jnp.concatenate([pf_in, pf[:, -1:, :]], axis=1) \
        * pb_lev[:, 1:, :]

    tl = tau * ds
    trans = jnp.exp(-tl)
    tau_s[:, :, :] = trans
    fact_big = (1.0 - trans) / jnp.maximum(tl, tiny) - trans
    fact_small = tl * (0.5 + tl * (-1.0 / 3.0 + tl * 0.125))
    fact = jnp.where(tl > tau_thresh, fact_big, fact_small)
    sdn_s[:, :, :] = (1.0 - trans) * lev_bot + 2.0 * fact * (lay - lev_bot)
    sup_s[:, :, :] = (1.0 - trans) * lev_top + 2.0 * fact * (lay - lev_top)

    rdn_s[:, 0, :] = inc_ref[0, :, :] / piw

    def down(l, _):
        rdn_s[:, l + 1, :] = (tau_s[:, l, :] * rdn_s[:, l, :]
                              + sdn_s[:, l, :])
        return 0

    jax.lax.fori_loop(0, nlay, down, 0)

    emis = emis_ref[0, :, :]
    sfc_src = pf[:, nlay - 1, :] * pbs_ref[0, 0, :][None, :]
    rup_s[:, nlay, :] = (rdn_s[:, nlay, :] * (1.0 - emis) + emis * sfc_src)

    def up(i, _):
        v = nlay - 1 - i
        rup_s[:, v, :] = (tau_s[:, v, :] * rup_s[:, v + 1, :]
                          + sup_s[:, v, :])
        return 0

    jax.lax.fori_loop(0, nlay, up, 0)

    bb_up = piw * jnp.sum(rup_s[:, :, :], axis=0)
    bb_dn = piw * jnp.sum(rdn_s[:, :, :], axis=0)

    @pl.when(b == 0)
    def _():
        up_ref[:, :] = bb_up
        dn_ref[:, :] = bb_dn

    @pl.when(b != 0)
    def _():
        up_ref[:, :] += bb_up
        dn_ref[:, :] += bb_dn


def _solve_u2(flav, desc, msc, table_lane,
              mtab_lo, mtab_up, pb_lay, pb_lev, pb_sfc,
              emis, inc, *, ds, weight, nbnd, w, nlay, ncol,
              nflav, band_minors, cloud_tau_abs=None,
              interpret: bool = False):
    dtype = desc.dtype
    pc = (-ncol) % _BC
    padc = lambda x: jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pc)])
    padc_e = lambda x: (x if pc == 0 else jnp.pad(
        x, [(0, 0)] * (x.ndim - 1) + [(0, pc)], mode="edge"))
    ncol_p = ncol + pc
    nlev = nlay + 1
    with_cloud = cloud_tau_abs is not None
    cld = (cloud_tau_abs if with_cloud
           else jnp.zeros((1, nlay, ncol), dtype))
    dsw = jnp.stack([jnp.asarray(ds, dtype).reshape(()),
                     jnp.asarray(weight, dtype).reshape(())])

    desc_p = padc_e(desc)
    jp_all = desc_p[1].astype(jnp.int32)
    jp_blk = jp_all.reshape(nlay, ncol_p // _BC, _BC)
    jp0 = jnp.min(jp_blk, axis=-1).T
    jpmax = jnp.max(jp_blk, axis=-1).T
    jpin = jnp.stack([jp0, (jpmax == jp0).astype(jnp.int32)], 1)

    kern = functools.partial(
        _kernel_u2, nlay=nlay, w=w, pspan=PSPAN,
        band_minors=band_minors, ncont_lo=mtab_lo.shape[0] // 2,
        nflav=nflav, with_cloud=with_cloud)

    cb_rows = lambda a: pl.BlockSpec(
        (a.shape[0], nlay, _BC), lambda c, b: (0, 0, c),
        memory_space=pltpu.VMEM)
    band3 = lambda nl: pl.BlockSpec((1, nl, _BC), lambda c, b: (b, 0, c),
                                    memory_space=pltpu.VMEM)
    resident = lambda a: pl.BlockSpec(a.shape, lambda c, b: (0,) * a.ndim,
                                      memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    obb = pl.BlockSpec((nlev, _BC), lambda c, b: (0, c),
                       memory_space=pltpu.VMEM)
    scr = lambda nl: pltpu.VMEM((w, nl, _BC), dtype)

    up, dn = pl.pallas_call(
        kern,
        grid=(ncol_p // _BC, nbnd),
        in_specs=[
            smem, smem,
            pl.BlockSpec((1, 2, nlay), lambda c, b: (c, 0, 0),
                         memory_space=pltpu.SMEM),
            cb_rows(desc), cb_rows(msc),
            resident(table_lane),
            resident(mtab_lo), resident(mtab_up),
            band3(nlay), band3(nlev),
            pl.BlockSpec((1, 1, _BC), lambda c, b: (b, 0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nlay, _BC),
                         lambda c, b: ((b if with_cloud else 0), 0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, w, _BC), lambda c, b: (b, 0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, w, _BC), lambda c, b: (b, 0, c),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[obb, obb],
        out_shape=[jax.ShapeDtypeStruct((nlev, ncol_p), dtype)] * 2,
        scratch_shapes=[scr(nlay), scr(nlay), scr(nlay), scr(nlay),
                        scr(nlev), scr(nlev)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(dsw, flav, jpin, desc_p, padc(msc),
      table_lane, mtab_lo, mtab_up, padc(pb_lay), padc(pb_lev),
      padc(pb_sfc), padc(cld), padc(emis), padc(inc))
    return up[:, :ncol], dn[:, :ncol]


VARIANTS["v_unroll2"] = _solve_u2


# ---------------------------------------------------------------------------
# v_laymaj: layer-major scratches (nlay, w, _BC) so every per-layer access
# (build loop writes, transport reads/writes, minor +=) is a contiguous
# 2-VREG tile slice instead of w strided single-sublane accesses.
# ---------------------------------------------------------------------------

def _kernel_laymaj(dsw_ref, flav_ref, jpin_ref, desc_ref, msc_ref,
                   tab_ref, mtab_lo_ref, mtab_up_ref,
                   pbl_ref, pbv_ref, pbs_ref, cld_ref, emis_ref, inc_ref,
                   up_ref, dn_ref,
                   tau_s, pf_s, sdn_s, sup_s, rdn_s, rup_s, *,
                   nlay, w, pspan, band_minors, ncont_lo, nflav,
                   with_cloud, gather_fn=_gather_rows):
    b = pl.program_id(1)
    dtype = tau_s.dtype
    eps = np.finfo(np.float32).eps
    tiny = jnp.asarray(np.finfo(np.float32).tiny, dtype)
    tau_thresh = jnp.asarray(np.sqrt(np.sqrt(eps)), dtype)
    ds = dsw_ref[0]
    piw = jnp.asarray(np.pi, dtype) * dsw_ref[1]
    ntw = 2 * w
    TE0, FE0, CM0 = 5, 5 + 2 * nflav, 5 + 4 * nflav
    TR0 = 5 + 6 * nflav
    flo = flav_ref[2 * b]
    fhi = flav_ref[2 * b + 1]

    def build_layer(l, _):
        fp = desc_ref[0, l, :][None, :]
        tropo = desc_ref[2, l, :]
        jp0 = jpin_ref[0, 0, l]
        uniform = jpin_ref[0, 1, l] != 0

        def fields(it):
            def sel(base):
                return jnp.where(tropo > 0.5,
                                 desc_ref[base + 2 * flo + it, l, :],
                                 desc_ref[base + 2 * fhi + it, l, :])
            return (sel(TE0).astype(jnp.int32), sel(FE0)[None, :],
                    sel(CM0)[None, :], desc_ref[3 + it, l, :][None, :])

        def combine(pres_of_it):
            acc = None
            for it in range(2):
                pres, cmv, ftv = pres_of_it(it)
                term = jnp.concatenate(
                    [(ftv * cmv) * pres[:w, :], ftv * pres[w:, :]], axis=0)
                acc = term if acc is None else acc + term
            tau_s[l, :, :] = acc[:w, :]
            pf_s[l, :, :] = acc[w:, :]

        @pl.when(uniform)
        def _():
            slab = tab_ref[b, pl.ds(jp0 * ntw, 2 * ntw), :]

            def pres_of_it(it):
                te, fe, cmv, ftv = fields(it)
                g0 = gather_fn(slab, te)
                g1 = gather_fn(slab, te + 1)
                kk = (1.0 - fe) * g0 + fe * g1
                return ((1.0 - fp) * kk[:ntw, :] + fp * kk[ntw:, :],
                        cmv, ftv)

            combine(pres_of_it)

        @pl.when(jnp.logical_not(uniform))
        def _():
            jp = desc_ref[1, l, :].astype(jnp.int32)
            jpl = jnp.clip(jp - jp0, 0, pspan - 2)
            slab = tab_ref[b, pl.ds(jp0 * ntw, pspan * ntw), :]

            def pres_of_it(it):
                te, fe, cmv, ftv = fields(it)
                g0 = gather_fn(slab, te)
                g1 = gather_fn(slab, te + 1)
                kk = (1.0 - fe) * g0 + fe * g1
                sel0 = jnp.zeros((ntw, _BC), kk.dtype)
                sel1 = jnp.zeros((ntw, _BC), kk.dtype)
                for p in range(pspan - 1):
                    m = (jpl == p).astype(kk.dtype)[None, :]
                    sel0 = sel0 + m * kk[p * ntw:(p + 1) * ntw, :]
                    sel1 = sel1 + m * kk[(p + 1) * ntw:(p + 2) * ntw, :]
                return ((1.0 - fp) * sel0 + fp * sel1, cmv, ftv)

            combine(pres_of_it)

        return 0

    jax.lax.fori_loop(0, nlay, build_layer, 0)

    for bi, members in enumerate(band_minors):
        if not members:
            continue

        @pl.when(b == bi)
        def _(members=members):
            def minor_layer(l, _):
                for (lower, f, mg, start, lg0, wm) in members:
                    ncont = (ncont_lo if lower
                             else mtab_up_ref.shape[0] // 2)
                    tref = mtab_lo_ref if lower else mtab_up_ref
                    scal = msc_ref[mg, l, :][None, :]
                    kk = jnp.zeros((wm, _BC), dtype)
                    for it in range(2):
                        rr = desc_ref[TR0 + 2 * f + it, l, :
                                      ].astype(jnp.int32)
                        fe = desc_ref[FE0 + 2 * f + it, l, :][None, :]
                        ftv = desc_ref[3 + it, l, :][None, :]
                        fm0 = (1.0 - fe) * ftv
                        fm1 = fe * ftv
                        lo = gather_fn(tref[start:start + wm, :], rr)
                        hi = gather_fn(
                            tref[ncont + start:ncont + start + wm, :], rr)
                        kk = kk + fm0 * lo + fm1 * hi
                    tau_s[l, lg0:lg0 + wm, :] += scal * kk
                return 0

            jax.lax.fori_loop(0, nlay, minor_layer, 0)

    # bulk elementwise section, all (nlay, w, _BC)
    tau = tau_s[:, :, :]
    if with_cloud:
        tau = tau + cld_ref[0, :, :][:, None, :]

    pf = pf_s[:, :, :]
    pb_lay = pbl_ref[0, :, :][:, None, :]
    pb_lev = pbv_ref[0, :, :][:, None, :]
    lay = pf * pb_lay
    pf_in = jnp.sqrt(pf[1:, :, :] * pf[:-1, :, :])
    lev_top = jnp.concatenate([pf[:1, :, :], pf_in], axis=0) \
        * pb_lev[:-1, :, :]
    lev_bot = jnp.concatenate([pf_in, pf[-1:, :, :]], axis=0) \
        * pb_lev[1:, :, :]

    tl = tau * ds
    trans = jnp.exp(-tl)
    tau_s[:, :, :] = trans
    fact_big = (1.0 - trans) / jnp.maximum(tl, tiny) - trans
    fact_small = tl * (0.5 + tl * (-1.0 / 3.0 + tl * 0.125))
    fact = jnp.where(tl > tau_thresh, fact_big, fact_small)
    sdn_s[:nlay, :, :] = (1.0 - trans) * lev_bot + 2.0 * fact * (lay - lev_bot)
    sup_s[:nlay, :, :] = (1.0 - trans) * lev_top + 2.0 * fact * (lay - lev_top)

    rdn_s[0, :, :] = inc_ref[0, :, :] / piw

    def down(l, _):
        rdn_s[l + 1, :, :] = (tau_s[l, :, :] * rdn_s[l, :, :]
                              + sdn_s[l, :, :])
        return 0

    jax.lax.fori_loop(0, nlay, down, 0)

    emis = emis_ref[0, :, :]
    sfc_src = pf[nlay - 1, :, :] * pbs_ref[0, 0, :][None, :]
    rup_s[nlay, :, :] = (rdn_s[nlay, :, :] * (1.0 - emis) + emis * sfc_src)

    def up(i, _):
        v = nlay - 1 - i
        rup_s[v, :, :] = (tau_s[v, :, :] * rup_s[v + 1, :, :]
                          + sup_s[v, :, :])
        return 0

    jax.lax.fori_loop(0, nlay, up, 0)

    bb_up = piw * jnp.sum(rup_s[:, :, :], axis=1)
    bb_dn = piw * jnp.sum(rdn_s[:, :, :], axis=1)

    @pl.when(b == 0)
    def _():
        up_ref[:, :] = bb_up
        dn_ref[:, :] = bb_dn

    @pl.when(b != 0)
    def _():
        up_ref[:, :] += bb_up
        dn_ref[:, :] += bb_dn


def _solve_laymaj(flav, desc, msc, table_lane,
                  mtab_lo, mtab_up, pb_lay, pb_lev, pb_sfc,
                  emis, inc, *, ds, weight, nbnd, w, nlay, ncol,
                  nflav, band_minors, cloud_tau_abs=None,
                  interpret: bool = False, fake_gathers=False):
    dtype = desc.dtype
    pc = (-ncol) % _BC
    padc = lambda x: jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pc)])
    padc_e = lambda x: (x if pc == 0 else jnp.pad(
        x, [(0, 0)] * (x.ndim - 1) + [(0, pc)], mode="edge"))
    ncol_p = ncol + pc
    nlev = nlay + 1
    with_cloud = cloud_tau_abs is not None
    cld = (cloud_tau_abs if with_cloud
           else jnp.zeros((1, nlay, ncol), dtype))
    dsw = jnp.stack([jnp.asarray(ds, dtype).reshape(()),
                     jnp.asarray(weight, dtype).reshape(())])

    desc_p = padc_e(desc)
    jp_all = desc_p[1].astype(jnp.int32)
    jp_blk = jp_all.reshape(nlay, ncol_p // _BC, _BC)
    jp0 = jnp.min(jp_blk, axis=-1).T
    jpmax = jnp.max(jp_blk, axis=-1).T
    jpin = jnp.stack([jp0, (jpmax == jp0).astype(jnp.int32)], 1)

    def _fake_gather(tab_slice, rows):
        # diagnostic: same shapes, no cross-lane gather (row 0 broadcastish)
        return tab_slice

    kern = functools.partial(
        _kernel_laymaj, nlay=nlay, w=w, pspan=PSPAN,
        band_minors=band_minors, ncont_lo=mtab_lo.shape[0] // 2,
        nflav=nflav, with_cloud=with_cloud,
        gather_fn=_fake_gather if fake_gathers else _gather_rows)

    cb_rows = lambda a: pl.BlockSpec(
        (a.shape[0], nlay, _BC), lambda c, b: (0, 0, c),
        memory_space=pltpu.VMEM)
    band3 = lambda nl: pl.BlockSpec((1, nl, _BC), lambda c, b: (b, 0, c),
                                    memory_space=pltpu.VMEM)
    resident = lambda a: pl.BlockSpec(a.shape, lambda c, b: (0,) * a.ndim,
                                      memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    obb = pl.BlockSpec((nlev, _BC), lambda c, b: (0, c),
                       memory_space=pltpu.VMEM)
    scr = lambda nl: pltpu.VMEM((nl, w, _BC), dtype)

    up, dn = pl.pallas_call(
        kern,
        grid=(ncol_p // _BC, nbnd),
        in_specs=[
            smem, smem,
            pl.BlockSpec((1, 2, nlay), lambda c, b: (c, 0, 0),
                         memory_space=pltpu.SMEM),
            cb_rows(desc), cb_rows(msc),
            resident(table_lane),
            resident(mtab_lo), resident(mtab_up),
            band3(nlay), band3(nlev),
            pl.BlockSpec((1, 1, _BC), lambda c, b: (b, 0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nlay, _BC),
                         lambda c, b: ((b if with_cloud else 0), 0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, w, _BC), lambda c, b: (b, 0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, w, _BC), lambda c, b: (b, 0, c),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[obb, obb],
        out_shape=[jax.ShapeDtypeStruct((nlev, ncol_p), dtype)] * 2,
        scratch_shapes=[scr(nlay), scr(nlay), scr(nlay), scr(nlay),
                        scr(nlev), scr(nlev)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(dsw, flav, jpin, desc_p, padc(msc),
      table_lane, mtab_lo, mtab_up, padc(pb_lay), padc(pb_lev),
      padc(pb_sfc), padc(cld), padc(emis), padc(inc))
    return up[:, :ncol], dn[:, :ncol]


VARIANTS["v_laymaj"] = _solve_laymaj

VARIANTS["x_lm_noga"] = functools.partial(_solve_laymaj, fake_gathers=True)


# ---------------------------------------------------------------------------
# v_lm_fpu: layer-major + pressure-fraction-uniform fast path. When fpress
# is constant across the 128-column block at a layer (shared pressure
# grids — incl. the reference's own all-sky benchmark), pre-lerp the
# 2-pressure-level slab by the scalar fp BEFORE the eta/temp gathers:
# gathered rows halve (256 -> 128/layer) with bit-level-equivalent math
# (the trilinear interp is linear in the table values).
# ---------------------------------------------------------------------------

def _kernel_lm_fpu(dsw_ref, flav_ref, jpin_ref, fpin_ref, desc_ref, msc_ref,
                   tab_ref, mtab_lo_ref, mtab_up_ref,
                   pbl_ref, pbv_ref, pbs_ref, cld_ref, emis_ref, inc_ref,
                   up_ref, dn_ref,
                   tau_s, pf_s, sdn_s, sup_s, rdn_s, rup_s, *,
                   nlay, w, pspan, band_minors, ncont_lo, nflav,
                   with_cloud):
    b = pl.program_id(1)
    dtype = tau_s.dtype
    eps = np.finfo(np.float32).eps
    tiny = jnp.asarray(np.finfo(np.float32).tiny, dtype)
    tau_thresh = jnp.asarray(np.sqrt(np.sqrt(eps)), dtype)
    ds = dsw_ref[0]
    piw = jnp.asarray(np.pi, dtype) * dsw_ref[1]
    ntw = 2 * w
    TE0, FE0, CM0 = 5, 5 + 2 * nflav, 5 + 4 * nflav
    TR0 = 5 + 6 * nflav
    flo = flav_ref[2 * b]
    fhi = flav_ref[2 * b + 1]

    def build_layer(l, _):
        fp = desc_ref[0, l, :][None, :]
        tropo = desc_ref[2, l, :]
        jp0 = jpin_ref[0, 0, l]
        uniform = jpin_ref[0, 1, l] != 0
        fp0 = fpin_ref[0, 0, l]
        fpu = fpin_ref[0, 1, l] != 0.0

        def fields(it):
            def sel(base):
                return jnp.where(tropo > 0.5,
                                 desc_ref[base + 2 * flo + it, l, :],
                                 desc_ref[base + 2 * fhi + it, l, :])
            return (sel(TE0).astype(jnp.int32), sel(FE0)[None, :],
                    sel(CM0)[None, :], desc_ref[3 + it, l, :][None, :])

        def combine(pres_of_it):
            acc = None
            for it in range(2):
                pres, cmv, ftv = pres_of_it(it)
                term = jnp.concatenate(
                    [(ftv * cmv) * pres[:w, :], ftv * pres[w:, :]], axis=0)
                acc = term if acc is None else acc + term
            tau_s[l, :, :] = acc[:w, :]
            pf_s[l, :, :] = acc[w:, :]

        @pl.when(jnp.logical_and(uniform, fpu))
        def _():
            slab = tab_ref[b, pl.ds(jp0 * ntw, 2 * ntw), :]
            slab2 = (1.0 - fp0) * slab[:ntw, :] + fp0 * slab[ntw:, :]

            def pres_of_it(it):
                te, fe, cmv, ftv = fields(it)
                g0 = _gather_rows(slab2, te)
                g1 = _gather_rows(slab2, te + 1)
                return ((1.0 - fe) * g0 + fe * g1, cmv, ftv)

            combine(pres_of_it)

        @pl.when(jnp.logical_and(uniform, jnp.logical_not(fpu)))
        def _():
            slab = tab_ref[b, pl.ds(jp0 * ntw, 2 * ntw), :]

            def pres_of_it(it):
                te, fe, cmv, ftv = fields(it)
                g0 = _gather_rows(slab, te)
                g1 = _gather_rows(slab, te + 1)
                kk = (1.0 - fe) * g0 + fe * g1
                return ((1.0 - fp) * kk[:ntw, :] + fp * kk[ntw:, :],
                        cmv, ftv)

            combine(pres_of_it)

        @pl.when(jnp.logical_not(uniform))
        def _():
            jp = desc_ref[1, l, :].astype(jnp.int32)
            jpl = jnp.clip(jp - jp0, 0, pspan - 2)
            slab = tab_ref[b, pl.ds(jp0 * ntw, pspan * ntw), :]

            def pres_of_it(it):
                te, fe, cmv, ftv = fields(it)
                g0 = _gather_rows(slab, te)
                g1 = _gather_rows(slab, te + 1)
                kk = (1.0 - fe) * g0 + fe * g1
                sel0 = jnp.zeros((ntw, _BC), kk.dtype)
                sel1 = jnp.zeros((ntw, _BC), kk.dtype)
                for p in range(pspan - 1):
                    m = (jpl == p).astype(kk.dtype)[None, :]
                    sel0 = sel0 + m * kk[p * ntw:(p + 1) * ntw, :]
                    sel1 = sel1 + m * kk[(p + 1) * ntw:(p + 2) * ntw, :]
                return ((1.0 - fp) * sel0 + fp * sel1, cmv, ftv)

            combine(pres_of_it)

        return 0

    jax.lax.fori_loop(0, nlay, build_layer, 0)

    for bi, members in enumerate(band_minors):
        if not members:
            continue

        @pl.when(b == bi)
        def _(members=members):
            def minor_layer(l, _):
                for (lower, f, mg, start, lg0, wm) in members:
                    ncont = (ncont_lo if lower
                             else mtab_up_ref.shape[0] // 2)
                    tref = mtab_lo_ref if lower else mtab_up_ref
                    scal = msc_ref[mg, l, :][None, :]
                    kk = jnp.zeros((wm, _BC), dtype)
                    for it in range(2):
                        rr = desc_ref[TR0 + 2 * f + it, l, :
                                      ].astype(jnp.int32)
                        fe = desc_ref[FE0 + 2 * f + it, l, :][None, :]
                        ftv = desc_ref[3 + it, l, :][None, :]
                        fm0 = (1.0 - fe) * ftv
                        fm1 = fe * ftv
                        lo = _gather_rows(tref[start:start + wm, :], rr)
                        hi = _gather_rows(
                            tref[ncont + start:ncont + start + wm, :], rr)
                        kk = kk + fm0 * lo + fm1 * hi
                    tau_s[l, lg0:lg0 + wm, :] += scal * kk
                return 0

            jax.lax.fori_loop(0, nlay, minor_layer, 0)

    tau = tau_s[:, :, :]
    if with_cloud:
        tau = tau + cld_ref[0, :, :][:, None, :]

    pf = pf_s[:, :, :]
    pb_lay = pbl_ref[0, :, :][:, None, :]
    pb_lev = pbv_ref[0, :, :][:, None, :]
    lay = pf * pb_lay
    pf_in = jnp.sqrt(pf[1:, :, :] * pf[:-1, :, :])
    lev_top = jnp.concatenate([pf[:1, :, :], pf_in], axis=0) \
        * pb_lev[:-1, :, :]
    lev_bot = jnp.concatenate([pf_in, pf[-1:, :, :]], axis=0) \
        * pb_lev[1:, :, :]

    tl = tau * ds
    trans = jnp.exp(-tl)
    tau_s[:, :, :] = trans
    fact_big = (1.0 - trans) / jnp.maximum(tl, tiny) - trans
    fact_small = tl * (0.5 + tl * (-1.0 / 3.0 + tl * 0.125))
    fact = jnp.where(tl > tau_thresh, fact_big, fact_small)
    sdn_s[:nlay, :, :] = (1.0 - trans) * lev_bot + 2.0 * fact * (lay - lev_bot)
    sup_s[:nlay, :, :] = (1.0 - trans) * lev_top + 2.0 * fact * (lay - lev_top)

    rdn_s[0, :, :] = inc_ref[0, :, :] / piw

    def down(l, _):
        rdn_s[l + 1, :, :] = (tau_s[l, :, :] * rdn_s[l, :, :]
                              + sdn_s[l, :, :])
        return 0

    jax.lax.fori_loop(0, nlay, down, 0)

    emis = emis_ref[0, :, :]
    sfc_src = pf[nlay - 1, :, :] * pbs_ref[0, 0, :][None, :]
    rup_s[nlay, :, :] = (rdn_s[nlay, :, :] * (1.0 - emis) + emis * sfc_src)

    def up(i, _):
        v = nlay - 1 - i
        rup_s[v, :, :] = (tau_s[v, :, :] * rup_s[v + 1, :, :]
                          + sup_s[v, :, :])
        return 0

    jax.lax.fori_loop(0, nlay, up, 0)

    bb_up = piw * jnp.sum(rup_s[:, :, :], axis=1)
    bb_dn = piw * jnp.sum(rdn_s[:, :, :], axis=1)

    @pl.when(b == 0)
    def _():
        up_ref[:, :] = bb_up
        dn_ref[:, :] = bb_dn

    @pl.when(b != 0)
    def _():
        up_ref[:, :] += bb_up
        dn_ref[:, :] += bb_dn


def _solve_lm_fpu(flav, desc, msc, table_lane,
                  mtab_lo, mtab_up, pb_lay, pb_lev, pb_sfc,
                  emis, inc, *, ds, weight, nbnd, w, nlay, ncol,
                  nflav, band_minors, cloud_tau_abs=None,
                  interpret: bool = False):
    dtype = desc.dtype
    pc = (-ncol) % _BC
    padc = lambda x: jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pc)])
    padc_e = lambda x: (x if pc == 0 else jnp.pad(
        x, [(0, 0)] * (x.ndim - 1) + [(0, pc)], mode="edge"))
    ncol_p = ncol + pc
    nlev = nlay + 1
    with_cloud = cloud_tau_abs is not None
    cld = (cloud_tau_abs if with_cloud
           else jnp.zeros((1, nlay, ncol), dtype))
    dsw = jnp.stack([jnp.asarray(ds, dtype).reshape(()),
                     jnp.asarray(weight, dtype).reshape(())])

    desc_p = padc_e(desc)
    jp_all = desc_p[1].astype(jnp.int32)
    jp_blk = jp_all.reshape(nlay, ncol_p // _BC, _BC)
    jp0 = jnp.min(jp_blk, axis=-1).T
    jpmax = jnp.max(jp_blk, axis=-1).T
    jpin = jnp.stack([jp0, (jpmax == jp0).astype(jnp.int32)], 1)
    # per-(block, layer) fpress scalar + uniformity flag (f32 SMEM)
    fp_blk = desc_p[0].reshape(nlay, ncol_p // _BC, _BC)
    fp0 = fp_blk[:, :, 0].T
    fpu = (jnp.min(fp_blk, -1) == jnp.max(fp_blk, -1)).T.astype(desc_p.dtype)
    fpin = jnp.stack([fp0.astype(desc_p.dtype), fpu], 1)

    kern = functools.partial(
        _kernel_lm_fpu, nlay=nlay, w=w, pspan=PSPAN,
        band_minors=band_minors, ncont_lo=mtab_lo.shape[0] // 2,
        nflav=nflav, with_cloud=with_cloud)

    cb_rows = lambda a: pl.BlockSpec(
        (a.shape[0], nlay, _BC), lambda c, b: (0, 0, c),
        memory_space=pltpu.VMEM)
    band3 = lambda nl: pl.BlockSpec((1, nl, _BC), lambda c, b: (b, 0, c),
                                    memory_space=pltpu.VMEM)
    resident = lambda a: pl.BlockSpec(a.shape, lambda c, b: (0,) * a.ndim,
                                      memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    obb = pl.BlockSpec((nlev, _BC), lambda c, b: (0, c),
                       memory_space=pltpu.VMEM)
    scr = lambda nl: pltpu.VMEM((nl, w, _BC), dtype)

    up, dn = pl.pallas_call(
        kern,
        grid=(ncol_p // _BC, nbnd),
        in_specs=[
            smem, smem,
            pl.BlockSpec((1, 2, nlay), lambda c, b: (c, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 2, nlay), lambda c, b: (c, 0, 0),
                         memory_space=pltpu.SMEM),
            cb_rows(desc), cb_rows(msc),
            resident(table_lane),
            resident(mtab_lo), resident(mtab_up),
            band3(nlay), band3(nlev),
            pl.BlockSpec((1, 1, _BC), lambda c, b: (b, 0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nlay, _BC),
                         lambda c, b: ((b if with_cloud else 0), 0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, w, _BC), lambda c, b: (b, 0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, w, _BC), lambda c, b: (b, 0, c),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[obb, obb],
        out_shape=[jax.ShapeDtypeStruct((nlev, ncol_p), dtype)] * 2,
        scratch_shapes=[scr(nlay), scr(nlay), scr(nlay), scr(nlay),
                        scr(nlev), scr(nlev)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(dsw, flav, jpin, fpin, desc_p, padc(msc),
      table_lane, mtab_lo, mtab_up, padc(pb_lay), padc(pb_lev),
      padc(pb_sfc), padc(cld), padc(emis), padc(inc))
    return up[:, :ncol], dn[:, :ncol]


VARIANTS["v_lm_fpu"] = _solve_lm_fpu


# ---------------------------------------------------------------------------
# v_lerptab: globally-uniform pressure grid -> the ENTIRE pressure axis is
# pre-lerped in XLA into a per-(band, layer) table (nbnd, nlay*ntw, 128),
# VMEM-resident. The kernel's layer loop has a single branch-free path:
# static-ish slab slice + 4 eta/temp gathers. Removes the dynamic
# pressure-window slice, the in-kernel pressure lerp, and the jpin/fpin
# SMEM plumbing. Exact (trilinear interp is linear in table values).
# Eligible when (jp, fp) are column-uniform at EVERY layer — shared
# pressure grids, incl. the reference's own all-sky benchmark.
# ---------------------------------------------------------------------------

def _kernel_lerptab(dsw_ref, flav_ref, desc_ref, msc_ref,
                    tab2_ref, mtab_lo_ref, mtab_up_ref,
                    pbl_ref, pbv_ref, pbs_ref, cld_ref, emis_ref, inc_ref,
                    up_ref, dn_ref,
                    tau_s, pf_s, sdn_s, sup_s, rdn_s, rup_s, *,
                    nlay, w, band_minors, ncont_lo, nflav, with_cloud):
    b = pl.program_id(1)
    dtype = tau_s.dtype
    eps = np.finfo(np.float32).eps
    tiny = jnp.asarray(np.finfo(np.float32).tiny, dtype)
    tau_thresh = jnp.asarray(np.sqrt(np.sqrt(eps)), dtype)
    ds = dsw_ref[0]
    piw = jnp.asarray(np.pi, dtype) * dsw_ref[1]
    ntw = 2 * w
    TE0, FE0, CM0 = 5, 5 + 2 * nflav, 5 + 4 * nflav
    TR0 = 5 + 6 * nflav
    flo = flav_ref[2 * b]
    fhi = flav_ref[2 * b + 1]

    def build_layer(l, _):
        tropo = desc_ref[2, l, :]

        def fields(it):
            def sel(base):
                return jnp.where(tropo > 0.5,
                                 desc_ref[base + 2 * flo + it, l, :],
                                 desc_ref[base + 2 * fhi + it, l, :])
            return (sel(TE0).astype(jnp.int32), sel(FE0)[None, :],
                    sel(CM0)[None, :], desc_ref[3 + it, l, :][None, :])

        slab2 = tab2_ref[b, pl.ds(l * ntw, ntw), :]
        acc = None
        for it in range(2):
            te, fe, cmv, ftv = fields(it)
            g0 = _gather_rows(slab2, te)
            g1 = _gather_rows(slab2, te + 1)
            pres = (1.0 - fe) * g0 + fe * g1
            term = jnp.concatenate(
                [(ftv * cmv) * pres[:w, :], ftv * pres[w:, :]], axis=0)
            acc = term if acc is None else acc + term
        tau_s[l, :, :] = acc[:w, :]
        pf_s[l, :, :] = acc[w:, :]
        return 0

    jax.lax.fori_loop(0, nlay, build_layer, 0)

    for bi, members in enumerate(band_minors):
        if not members:
            continue

        @pl.when(b == bi)
        def _(members=members):
            def minor_layer(l, _):
                for (lower, f, mg, start, lg0, wm) in members:
                    ncont = (ncont_lo if lower
                             else mtab_up_ref.shape[0] // 2)
                    tref = mtab_lo_ref if lower else mtab_up_ref
                    scal = msc_ref[mg, l, :][None, :]
                    kk = jnp.zeros((wm, _BC), dtype)
                    for it in range(2):
                        rr = desc_ref[TR0 + 2 * f + it, l, :
                                      ].astype(jnp.int32)
                        fe = desc_ref[FE0 + 2 * f + it, l, :][None, :]
                        ftv = desc_ref[3 + it, l, :][None, :]
                        fm0 = (1.0 - fe) * ftv
                        fm1 = fe * ftv
                        lo = _gather_rows(tref[start:start + wm, :], rr)
                        hi = _gather_rows(
                            tref[ncont + start:ncont + start + wm, :], rr)
                        kk = kk + fm0 * lo + fm1 * hi
                    tau_s[l, lg0:lg0 + wm, :] += scal * kk
                return 0

            jax.lax.fori_loop(0, nlay, minor_layer, 0)

    tau = tau_s[:, :, :]
    if with_cloud:
        tau = tau + cld_ref[0, :, :][:, None, :]

    pf = pf_s[:, :, :]
    pb_lay = pbl_ref[0, :, :][:, None, :]
    pb_lev = pbv_ref[0, :, :][:, None, :]
    lay = pf * pb_lay
    pf_in = jnp.sqrt(pf[1:, :, :] * pf[:-1, :, :])
    lev_top = jnp.concatenate([pf[:1, :, :], pf_in], axis=0) \
        * pb_lev[:-1, :, :]
    lev_bot = jnp.concatenate([pf_in, pf[-1:, :, :]], axis=0) \
        * pb_lev[1:, :, :]

    tl = tau * ds
    trans = jnp.exp(-tl)
    tau_s[:, :, :] = trans
    fact_big = (1.0 - trans) / jnp.maximum(tl, tiny) - trans
    fact_small = tl * (0.5 + tl * (-1.0 / 3.0 + tl * 0.125))
    fact = jnp.where(tl > tau_thresh, fact_big, fact_small)
    sdn_s[:nlay, :, :] = (1.0 - trans) * lev_bot + 2.0 * fact * (lay - lev_bot)
    sup_s[:nlay, :, :] = (1.0 - trans) * lev_top + 2.0 * fact * (lay - lev_top)

    rdn_s[0, :, :] = inc_ref[0, :, :] / piw

    def down(l, _):
        rdn_s[l + 1, :, :] = (tau_s[l, :, :] * rdn_s[l, :, :]
                              + sdn_s[l, :, :])
        return 0

    jax.lax.fori_loop(0, nlay, down, 0)

    emis = emis_ref[0, :, :]
    sfc_src = pf[nlay - 1, :, :] * pbs_ref[0, 0, :][None, :]
    rup_s[nlay, :, :] = (rdn_s[nlay, :, :] * (1.0 - emis) + emis * sfc_src)

    def up(i, _):
        v = nlay - 1 - i
        rup_s[v, :, :] = (tau_s[v, :, :] * rup_s[v + 1, :, :]
                          + sup_s[v, :, :])
        return 0

    jax.lax.fori_loop(0, nlay, up, 0)

    bb_up = piw * jnp.sum(rup_s[:, :, :], axis=1)
    bb_dn = piw * jnp.sum(rdn_s[:, :, :], axis=1)

    @pl.when(b == 0)
    def _():
        up_ref[:, :] = bb_up
        dn_ref[:, :] = bb_dn

    @pl.when(b != 0)
    def _():
        up_ref[:, :] += bb_up
        dn_ref[:, :] += bb_dn


def _solve_lerptab(flav, desc, msc, table_lane,
                   mtab_lo, mtab_up, pb_lay, pb_lev, pb_sfc,
                   emis, inc, *, ds, weight, nbnd, w, nlay, ncol,
                   nflav, band_minors, cloud_tau_abs=None,
                   interpret: bool = False):
    dtype = desc.dtype
    pc = (-ncol) % _BC
    padc = lambda x: jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pc)])
    padc_e = lambda x: (x if pc == 0 else jnp.pad(
        x, [(0, 0)] * (x.ndim - 1) + [(0, pc)], mode="edge"))
    ncol_p = ncol + pc
    nlev = nlay + 1
    ntw = 2 * w
    with_cloud = cloud_tau_abs is not None
    cld = (cloud_tau_abs if with_cloud
           else jnp.zeros((1, nlay, ncol), dtype))
    dsw = jnp.stack([jnp.asarray(ds, dtype).reshape(()),
                     jnp.asarray(weight, dtype).reshape(())])

    desc_p = padc_e(desc)
    # XLA-side pressure pre-lerp: per (band, layer), take the two pressure
    # levels at jp_l and lerp by the (column-uniform) fp_l
    jp_l = desc_p[1, :, 0].astype(jnp.int32)            # (nlay,)
    fp_l = desc_p[0, :, 0]                              # (nlay,)
    rows0 = jp_l[:, None] * ntw + jnp.arange(ntw)[None, :]   # (nlay, ntw)
    t0 = jnp.take(table_lane, rows0.reshape(-1), axis=1)
    t1 = jnp.take(table_lane, (rows0 + ntw).reshape(-1), axis=1)
    fpw = jnp.repeat(fp_l, ntw)[None, :, None]
    tab2 = (1.0 - fpw) * t0 + fpw * t1                  # (nbnd, nlay*ntw, 128)

    kern = functools.partial(
        _kernel_lerptab, nlay=nlay, w=w,
        band_minors=band_minors, ncont_lo=mtab_lo.shape[0] // 2,
        nflav=nflav, with_cloud=with_cloud)

    cb_rows = lambda a: pl.BlockSpec(
        (a.shape[0], nlay, _BC), lambda c, b: (0, 0, c),
        memory_space=pltpu.VMEM)
    band3 = lambda nl: pl.BlockSpec((1, nl, _BC), lambda c, b: (b, 0, c),
                                    memory_space=pltpu.VMEM)
    resident = lambda a: pl.BlockSpec(a.shape, lambda c, b: (0,) * a.ndim,
                                      memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    obb = pl.BlockSpec((nlev, _BC), lambda c, b: (0, c),
                       memory_space=pltpu.VMEM)
    scr = lambda nl: pltpu.VMEM((nl, w, _BC), dtype)

    up, dn = pl.pallas_call(
        kern,
        grid=(ncol_p // _BC, nbnd),
        in_specs=[
            smem, smem,
            cb_rows(desc), cb_rows(msc),
            resident(tab2),
            resident(mtab_lo), resident(mtab_up),
            band3(nlay), band3(nlev),
            pl.BlockSpec((1, 1, _BC), lambda c, b: (b, 0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nlay, _BC),
                         lambda c, b: ((b if with_cloud else 0), 0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, w, _BC), lambda c, b: (b, 0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, w, _BC), lambda c, b: (b, 0, c),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[obb, obb],
        out_shape=[jax.ShapeDtypeStruct((nlev, ncol_p), dtype)] * 2,
        scratch_shapes=[scr(nlay), scr(nlay), scr(nlay), scr(nlay),
                        scr(nlev), scr(nlev)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(dsw, flav, desc_p, padc(msc),
      tab2, mtab_lo, mtab_up, padc(pb_lay), padc(pb_lev),
      padc(pb_sfc), padc(cld), padc(emis), padc(inc))
    return up[:, :ncol], dn[:, :ncol]


VARIANTS["v_lerptab"] = _solve_lerptab
