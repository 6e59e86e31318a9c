"""The grand fused SW kernel: RRTMGP gas optics AND the two-stream solve
in ONE Pallas TPU kernel — the SW counterpart of fused_lw.py.

Per (column-block, band) grid step, entirely in VMEM:
  - major-gas 3-D table interpolation per layer,
  - minor-gas contributions for the band's g-point windows,
  - Rayleigh k interpolation (both atmospheres, tropopause-selected)
    scaled by (col_h2o + col_dry),
  - combine_abs_and_rayleigh (tau, ssa),
  - the by-band delta-scaled cloud 2-stream increment,
  - the Meador-Weaver/PIFM two-stream + Shonk-Hogan adding solve,
  - the broadband reduction, accumulated across bands.

Reference numerics: gas_optical_depths_major/minor, compute_tau_rayleigh,
combine_abs_and_rayleigh, increment_2stream_by_2stream,
sw_solver_2stream (+ sw_dif_and_source + adding).

Performance structure mirrors fused_lw.py (docs/PERFORMANCE.md):
layer-major (nlay, w, 128) scratches, SMEM-hoisted pressure windows,
and the exact fp-uniform pre-lerp fast path.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_minors import minor_pass
from .major_gather import PSPAN, block_pressure_codes
from .minor_gather import _BC, _gather_rows
from .solver_lanes import _sw_body_lm

__all__ = ["sw_fused_gas_optics_solve"]


def _combine_gas_cloud(tau_s, ray_s, ct_ref, cs_ref, cg_ref, *, with_cloud):
    """combine_abs_and_rayleigh + the by-band delta-scaled cloud 2-stream
    increment (reference mo_gas_optics_rrtmgp.F90:1954-2036 +
    increment_2stream_by_2stream). Module-level so kernel variants
    (scripts/fused_sw_exp.py) can patch it. Returns (t, w0, asym), each
    (nlay, w, _BC)."""
    dtype = tau_s.dtype
    tiny = jnp.asarray(np.finfo(np.float32).tiny, dtype)
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
    return t, w0, asym


def _fused_sw_kernel(flav_ref, jpin_ref, fpin_ref, desc_ref, msc_ref,
                     tab_ref, mtab_lo_ref, mtab_up_ref, rayl_ref,
                     ct_ref, cs_ref, cg_ref,
                     mu0_ref, albdir_ref, albdif_ref, inc_ref, incdif_ref,
                     up_ref, dn_ref, dir_ref,
                     tau_s, ray_s,
                     dirlev, sdn_s, sup_s, rdif_s, tdif_s,
                     alb_s, src_s, den_s, fup_s, fdn_s, tns_s, *,
                     nlay, w, pspan, band_minors, band_g0, ncont_lo, nflav,
                     ngpt, with_cloud, byband=False):
    b = pl.program_id(1)
    dtype = tau_s.dtype
    ntw = w         # tau-only payload (no Planck table in SW kmajor)
    # desc rows: [fp, jp, tropo, ft0, ft1, rayscale, te(2*nflav),
    # fe(2*nflav), cm(2*nflav), tr(2*nflav)] where tr is the rayleigh/
    # minor-domain row index (jt+it)*(neta-1)+jeta
    TE0, FE0, CM0 = 6, 6 + 2 * nflav, 6 + 4 * nflav
    TR0 = 6 + 6 * nflav
    flo = flav_ref[2 * b]
    fhi = flav_ref[2 * b + 1]

    # ---- per-layer gas optics: major + rayleigh lookups ----
    def build_layer(l, _):
        fp = desc_ref[0, l, :][None, :]
        tropo = desc_ref[2, l, :]
        # precomputed per-(block, layer) pressure-window base + uniformity
        # and fpress scalar + uniformity (see fused_lw.py)
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
                term = (ftv * cmv) * pres
                acc = term if acc is None else acc + term
            tau_s[l, :, :] = acc

        # rayleigh in the same layer pass: the band-major krayl block
        # (rows [atm, de, g-in-band]) makes every slice static
        # (reference compute_tau_rayleigh, kernels :506-565)
        rayscale = desc_ref[5, l, :][None, :]
        # tcode (SMEM, precomputed): 1 = whole block below the tropopause
        # at this layer, 2 = whole block above, 0 = mixed. Shared pressure
        # grids make every layer uniform — gather ONE atmosphere's rows
        # (half the rayleigh gather traffic) and skip the lane selects.
        tcode = jpin_ref[0, 2, l]

        for code, fu, atm in ((1, flo, 0), (2, fhi, 1)):
            @pl.when(tcode == code)
            def _(fu=fu, atm=atm):
                k = jnp.zeros((w, _BC), dtype)
                for it in range(2):
                    tr = desc_ref[TR0 + 2 * fu + it, l, :
                                  ].astype(jnp.int32)
                    fe = desc_ref[FE0 + 2 * fu + it, l, :][None, :]
                    ftv = desc_ref[3 + it, l, :][None, :]
                    lo = _gather_rows(
                        rayl_ref[b, atm * 2 * w:atm * 2 * w + w, :], tr)
                    hi = _gather_rows(
                        rayl_ref[b, (atm * 2 + 1) * w:(atm * 2 + 2) * w,
                                 :], tr)
                    k = k + ((1.0 - fe) * ftv) * lo + (fe * ftv) * hi
                ray_s[l, :, :] = k * rayscale

        @pl.when(tcode == 0)
        def _():
            tropo2 = tropo[None, :]
            k_atm = [jnp.zeros((w, _BC), dtype),
                     jnp.zeros((w, _BC), dtype)]
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
                        rayl_ref[b, (atm * 2 + 1) * w:(atm * 2 + 2) * w,
                                 :], tr)
                    k_atm[atm] = k_atm[atm] + fm0 * lo + fm1 * hi
            ray_s[l, :, :] = (tropo2 * k_atm[0]
                              + (1.0 - tropo2) * k_atm[1]) * rayscale

        @pl.when(jnp.logical_and(uniform, fpu))
        def _():
            # fast path: pre-lerp the 2 pressure levels by the scalar fp
            # before the eta/temp gathers (half the gathered rows)
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

    # ---- minors: predicated per band (static g-point slices); the
    # accumulation structure lives in fused_minors.minor_pass (shared
    # with the LW kernel; mode-selectable — see its docstring) ----
    for bi in range(len(band_minors)):
        members = band_minors[bi]
        if not members:
            continue

        @pl.when(b == bi)
        def _(members=members):
            minor_pass(tau_s, desc_ref, msc_ref, mtab_lo_ref, mtab_up_ref,
                       jpin_ref, members, nlay=nlay, w=w,
                       ncont_lo=ncont_lo, TR0=TR0, FE0=FE0, dtype=dtype)

    # ---- combine_abs_and_rayleigh + cloud increment (as in the SW
    # mega-kernel) ---- all fields (nlay, w, _BC)
    t, w0, asym = _combine_gas_cloud(tau_s, ray_s, ct_ref, cs_ref, cg_ref,
                                     with_cloud=with_cloud)

    _sw_body_lm(t, w0, asym, mu0_ref[:, :], albdir_ref[0, :, :],
                albdif_ref[0, :, :], inc_ref[0, :, :], incdif_ref[0, :, :],
                up_ref, dn_ref, dir_ref,
                dirlev, sdn_s, sup_s, rdif_s, tdif_s,
                alb_s, src_s, den_s, fup_s, fdn_s, tns_s, nlay=nlay,
                byband=byband)


def sw_fused_gas_optics_solve(flav, desc, msc, table_lane,
                              mtab_lo, mtab_up, rayl_lane, cloud,
                              mu0, sfc_alb_dir, sfc_alb_dif, inc, incdif, *,
                              nbnd, w, nlay, ncol, nflav, ngpt,
                              band_minors, band_g0,
                              byband: bool = False,
                              interpret: bool = False):
    """Run the fused gas-optics + SW two-stream solve. desc rows:
    [fp, jp, tropo, ft0, ft1, rayscale, te(2*nflav), fe(2*nflav),
    cm(2*nflav)]. cloud: by-band delta-scaled (tau, ssa, g) or None.
    Returns (flux_up, flux_dn_total, flux_dir), each (nlay+1, ncol), or
    per-band (nbnd, nlay+1, ncol) with ``byband``."""
    dtype = desc.dtype
    pc = (-ncol) % _BC
    padc = lambda x: jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pc)])
    padc_e = lambda x: (x if pc == 0 else jnp.pad(
        x, [(0, 0)] * (x.ndim - 1) + [(0, pc)], mode="edge"))
    ncol_p = ncol + pc
    nlev = nlay + 1
    with_cloud = cloud is not None
    if not with_cloud:
        z = jnp.zeros((1, nlay, ncol), dtype)
        cloud = (z, z, z)

    desc_p = padc_e(desc)
    jpin, fpin = block_pressure_codes(desc_p, nlay=nlay)

    kern = functools.partial(
        _fused_sw_kernel, nlay=nlay, w=w, pspan=PSPAN,
        band_minors=band_minors, band_g0=band_g0,
        ncont_lo=mtab_lo.shape[0] // 2, nflav=nflav, ngpt=ngpt,
        with_cloud=with_cloud, byband=byband)

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
    smem_cl = lambda r: pl.BlockSpec((1, r, nlay), lambda c, b: (c, 0, 0),
                                     memory_space=pltpu.SMEM)
    vmu = pl.BlockSpec((nlay, _BC), lambda c, b: (0, c),
                       memory_space=pltpu.VMEM)
    if byband:
        obb = pl.BlockSpec((1, nlev, _BC), lambda c, b: (b, 0, c),
                           memory_space=pltpu.VMEM)
        oshape = jax.ShapeDtypeStruct((nbnd, nlev, ncol_p), dtype)
    else:
        obb = pl.BlockSpec((nlev, _BC), lambda c, b: (0, c),
                           memory_space=pltpu.VMEM)
        oshape = jax.ShapeDtypeStruct((nlev, ncol_p), dtype)
    # layer-major scratches: per-layer slices are contiguous tiles
    scr = lambda nl: pltpu.VMEM((nl, w, _BC), dtype)

    up, dn, fdir = pl.pallas_call(
        kern,
        grid=(ncol_p // _BC, nbnd),
        in_specs=[
            smem, smem_cl(3), smem_cl(2),
            cb_rows(desc), cb_rows(msc),
            # whole major + rayleigh tables VMEM-resident (fetched once
            # per launch; per-band blocks with band innermost re-fetch
            # on every grid step -- see fused_lw.py)
            resident(table_lane),
            resident(mtab_lo), resident(mtab_up),
            resident(rayl_lane),
            band3(nlay), band3(nlay), band3(nlay),
            vmu, bnd2, bnd2, bnd2, bnd2,
        ],
        out_specs=[obb, obb, obb],
        out_shape=[oshape] * 3,
        scratch_shapes=[scr(nlay), scr(nlay),
                        scr(nlev), scr(nlay), scr(nlay),
                        scr(nlay), scr(nlay),
                        scr(nlev), scr(nlev), scr(nlay),
                        scr(nlev), scr(nlev), scr(nlay)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(flav, jpin, fpin, desc_p, padc(msc),
      table_lane, mtab_lo, mtab_up, rayl_lane,
      padc(cloud[0]), padc(cloud[1]), padc(cloud[2]),
      padc_e(mu0), padc(sfc_alb_dir), padc(sfc_alb_dif), padc(inc),
      padc(incdif))
    if byband:
        return up[:, :, :ncol], dn[:, :, :ncol], fdir[:, :, :ncol]
    return up[:, :ncol], dn[:, :ncol], fdir[:, :ncol]
