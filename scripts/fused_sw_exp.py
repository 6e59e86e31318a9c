"""Experimental variants of the grand fused SW kernel (perf lab).

SW counterpart of fused_lw_exp.py; bench with
scripts/bench_fused_sw_variants.py. Winners get promoted into
rte_rrtmgp_tpu/ops/pallas/fused_sw.py.
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

from rte_rrtmgp_tpu.ops.pallas.minor_gather import _BC, _gather_rows
from rte_rrtmgp_tpu.ops.pallas.solver_lanes import _sw_body_lm

VARIANTS = {}


# ---------------------------------------------------------------------------
# v_lerptab: globally-uniform pressure grid -> pressure axis pre-lerped in
# XLA into a per-(band, layer) resident table; single branch-free in-kernel
# path. See fused_lw_exp.v_lerptab.
# ---------------------------------------------------------------------------

def _kernel_lerptab(flav_ref, desc_ref, msc_ref,
                    tab2_ref, mtab_lo_ref, mtab_up_ref, rayl_ref,
                    ct_ref, cs_ref, cg_ref,
                    mu0_ref, albdir_ref, albdif_ref, inc_ref, incdif_ref,
                    up_ref, dn_ref, dir_ref,
                    tau_s, ray_s,
                    dirlev, sdn_s, sup_s, rdif_s, tdif_s,
                    alb_s, src_s, den_s, fup_s, fdn_s, tns_s, *,
                    nlay, w, band_minors, band_g0, ncont_lo, nflav,
                    ngpt, with_cloud):
    b = pl.program_id(1)
    dtype = tau_s.dtype
    tiny = jnp.asarray(np.finfo(np.float32).tiny, dtype)
    ntw = w
    TE0, FE0, CM0 = 6, 6 + 2 * nflav, 6 + 4 * nflav
    TR0 = 6 + 6 * nflav
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

        tropo2 = tropo[None, :]
        rayscale = desc_ref[5, l, :][None, :]
        k_atm = [jnp.zeros((w, _BC), dtype), jnp.zeros((w, _BC), dtype)]
        for it in range(2):
            tr = jnp.where(tropo > 0.5,
                           desc_ref[TR0 + 2 * flo + it, l, :],
                           desc_ref[TR0 + 2 * fhi + it, l, :]
                           ).astype(jnp.int32)
            fe = jnp.where(tropo > 0.5,
                           desc_ref[FE0 + 2 * flo + it, l, :],
                           desc_ref[FE0 + 2 * fhi + it, l, :])[None, :]
            ftv = desc_ref[3 + it, l, :][None, :]
            fm0 = (1.0 - fe) * ftv
            fm1 = fe * ftv
            for atm in range(2):
                lo = _gather_rows(
                    rayl_ref[b, atm * 2 * w:atm * 2 * w + w, :], tr)
                hi = _gather_rows(
                    rayl_ref[b, (atm * 2 + 1) * w:(atm * 2 + 2) * w, :], tr)
                k_atm[atm] = k_atm[atm] + fm0 * lo + fm1 * hi
        ray_s[l, :, :] = (tropo2 * k_atm[0]
                          + (1.0 - tropo2) * k_atm[1]) * rayscale

        slab2 = tab2_ref[b, pl.ds(l * ntw, ntw), :]
        acc = None
        for it in range(2):
            te, fe, cmv, ftv = fields(it)
            g0 = _gather_rows(slab2, te)
            g1 = _gather_rows(slab2, te + 1)
            pres = (1.0 - fe) * g0 + fe * g1
            term = (ftv * cmv) * pres
            acc = term if acc is None else acc + term
        tau_s[l, :, :] = acc
        return 0

    jax.lax.fori_loop(0, nlay, build_layer, 0)

    for bi in range(len(band_minors)):
        @pl.when(b == bi)
        def _(bi=bi):
            members = band_minors[bi]
            if members:
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
                                tref[ncont + start:ncont + start + wm, :],
                                rr)
                            kk = kk + fm0 * lo + fm1 * hi
                        tau_s[l, lg0:lg0 + wm, :] += scal * kk
                    return 0

                jax.lax.fori_loop(0, nlay, minor_layer, 0)

    ray = ray_s[:, :, :]
    t_gas = tau_s[:, :, :] + ray
    big = t_gas > 2.0 * tiny
    ssa_gas = jnp.where(big, ray / jnp.where(big, t_gas, 1.0), 0.0)
    if with_cloud:
        o_tau = ct_ref[0, :, :][:, None, :]
        o_ssa = cs_ref[0, :, :][:, None, :]
        o_g = cg_ref[0, :, :][:, None, :]
        t = t_gas + o_tau
        tauscat = t_gas * ssa_gas + o_tau * o_ssa
        g12 = (o_tau * o_ssa * o_g) / jnp.maximum(tauscat, tiny)
        ssa12 = tauscat / jnp.maximum(t, tiny)
        asym = jnp.where(tauscat > 2.0 * tiny, g12, 0.0)
        w0 = jnp.where(t > 2.0 * tiny, ssa12, ssa_gas)
    else:
        t, w0, asym = t_gas, ssa_gas, jnp.zeros_like(t_gas)

    _sw_body_lm(t, w0, asym, mu0_ref[:, :], albdir_ref[0, :, :],
                albdif_ref[0, :, :], inc_ref[0, :, :], incdif_ref[0, :, :],
                up_ref, dn_ref, dir_ref,
                dirlev, sdn_s, sup_s, rdif_s, tdif_s,
                alb_s, src_s, den_s, fup_s, fdn_s, tns_s, nlay=nlay)


def _solve_lerptab(flav, desc, msc, table_lane,
                   mtab_lo, mtab_up, rayl_lane, cloud,
                   mu0, sfc_alb_dir, sfc_alb_dif, inc, incdif, *,
                   nbnd, w, nlay, ncol, nflav, ngpt,
                   band_minors, band_g0, interpret: bool = False):
    dtype = desc.dtype
    pc = (-ncol) % _BC
    padc = lambda x: jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pc)])
    padc_e = lambda x: (x if pc == 0 else jnp.pad(
        x, [(0, 0)] * (x.ndim - 1) + [(0, pc)], mode="edge"))
    ncol_p = ncol + pc
    nlev = nlay + 1
    ntw = w
    with_cloud = cloud is not None
    if not with_cloud:
        z = jnp.zeros((1, nlay, ncol), dtype)
        cloud = (z, z, z)

    desc_p = padc_e(desc)
    # XLA-side pressure pre-lerp (see fused_lw_exp._solve_lerptab)
    jp_l = desc_p[1, :, 0].astype(jnp.int32)
    fp_l = desc_p[0, :, 0]
    rows0 = jp_l[:, None] * ntw + jnp.arange(ntw)[None, :]
    t0 = jnp.take(table_lane, rows0.reshape(-1), axis=1)
    t1 = jnp.take(table_lane, (rows0 + ntw).reshape(-1), axis=1)
    fpw = jnp.repeat(fp_l, ntw)[None, :, None]
    tab2 = (1.0 - fpw) * t0 + fpw * t1

    kern = functools.partial(
        _kernel_lerptab, nlay=nlay, w=w,
        band_minors=band_minors, band_g0=band_g0,
        ncont_lo=mtab_lo.shape[0] // 2, nflav=nflav, ngpt=ngpt,
        with_cloud=with_cloud)

    cb_rows = lambda a: pl.BlockSpec(
        (a.shape[0], nlay, _BC), lambda c, b: (0, 0, c),
        memory_space=pltpu.VMEM)
    band3 = lambda nl: pl.BlockSpec(
        (1, nl, _BC),
        lambda c, b: ((b if with_cloud else 0), 0, c),
        memory_space=pltpu.VMEM)
    bnd2 = pl.BlockSpec((1, w, _BC), lambda c, b: (b, 0, c),
                        memory_space=pltpu.VMEM)
    resident = lambda a: pl.BlockSpec(a.shape, lambda c, b: (0,) * a.ndim,
                                      memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    vmu = pl.BlockSpec((nlay, _BC), lambda c, b: (0, c),
                       memory_space=pltpu.VMEM)
    obb = pl.BlockSpec((nlev, _BC), lambda c, b: (0, c),
                       memory_space=pltpu.VMEM)
    scr = lambda nl: pltpu.VMEM((nl, w, _BC), dtype)

    up, dn, fdir = pl.pallas_call(
        kern,
        grid=(ncol_p // _BC, nbnd),
        in_specs=[
            smem,
            cb_rows(desc), cb_rows(msc),
            resident(tab2),
            resident(mtab_lo), resident(mtab_up),
            resident(rayl_lane),
            band3(nlay), band3(nlay), band3(nlay),
            vmu, bnd2, bnd2, bnd2, bnd2,
        ],
        out_specs=[obb, obb, obb],
        out_shape=[jax.ShapeDtypeStruct((nlev, ncol_p), dtype)] * 3,
        scratch_shapes=[scr(nlay), scr(nlay),
                        scr(nlev), scr(nlay), scr(nlay),
                        scr(nlay), scr(nlay),
                        scr(nlev), scr(nlev), scr(nlay),
                        scr(nlev), scr(nlev), scr(nlay)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(flav, desc_p, padc(msc),
      tab2, mtab_lo, mtab_up, rayl_lane,
      padc(cloud[0]), padc(cloud[1]), padc(cloud[2]),
      padc_e(mu0), padc(sfc_alb_dir), padc(sfc_alb_dif), padc(inc),
      padc(incdif))
    return up[:, :ncol], dn[:, :ncol], fdir[:, :ncol]


VARIANTS["v_lerptab"] = _solve_lerptab
