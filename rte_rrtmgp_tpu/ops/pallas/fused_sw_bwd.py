"""Hand-derived adjoint Pallas kernel for the GRAND FUSED SW path:
gas optics (major + minors + Rayleigh), the cloud two-stream increment,
and the Meador-Weaver/PIFM two-stream + Shonk-Hogan adding solve,
backward, in one kernel — the SW counterpart of fused_lw_bwd.py.

Phase structure (cotangents of broadband up/dn_total/dir fluxes):

  P-R  gas-optics recompute from the VMEM-resident tables, saving the
       per-itemp lerp payloads (pres, d/d fe, d/d fp) for the major
       adjoint; Rayleigh recomputed on the general per-lane-tropopause
       path (numerically identical to the forward's tcode fast paths).
  P-0  forward solve recompute saving dirlev, tns, rdif, tdif, den,
       alb, src, fdn, sdn (the solver_sw_bwd.py residue set, in the
       fused layer-major (nlay, w, 128) layout).
  A-F/A-U/A-S/A-C  the transport + Meador-Weaver adjoint exactly as
       derived in solver_sw_bwd.py (same term-by-term transpose),
       yielding t_bar, w0_bar, asym_bar, mu0/albedo/inc cotangents.
  A-X  combine_abs_and_rayleigh + cloud increment transposed:
       cloud (tau, ssa, g) bars per band, tau_gas_bar, k_ray_bar and
       the rayscale (col_h2o + col_dry) bar.
  A-G  major adjoint from the stored payloads (cm/ft/fe/fp bars),
       Rayleigh adjoint (re-gather; fe/ft bars), minor adjoint
       (re-gather; scaling/fe/ft bars) — all scattered through the
       forward's tropopause selects with lane masks.

Eligibility: per-(block, layer) UNIFORM pressure-window base (shared
pressure grids), broadband output — caller-asserted, as for the LW
adjoint. Exactness pinned by float64 interpret-mode tests against XLA
autodiff (tests/test_fused_autodiff.py).

Reference numerics: rte/kernels/mo_rte_solver_kernels.F90:503-609,
:985-1127, :1135-1245; rrtmgp/kernels/mo_gas_optics_rrtmgp_kernels.F90.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import solver_lanes as _sl

from .fused_minors import minor_pass
from .major_gather import block_pressure_codes
from .minor_gather import _BC, _gather_rows

__all__ = ["sw_fused_solve_kernel_vjp"]


def _fused_sw_bwd_kernel(flav_ref, jpin_ref, desc_ref, msc_ref,
                         tab_ref, mtab_lo_ref, mtab_up_ref, rayl_ref,
                         ct_ref, cs_ref, cg_ref,
                         mu0_ref, albdir_ref, albdif_ref, inc_ref,
                         incdif_ref, gup_ref, gdn_ref, gdir_ref,
                         desc_b_ref, msc_b_ref,
                         ct_b_ref, cs_b_ref, cg_b_ref,
                         mu0_b_ref, albdir_b_ref, albdif_b_ref,
                         inc_b_ref, incdif_b_ref,
                         pres0_s, pres1_s, dfe0_s, dfe1_s, dfp0_s, dfp1_s,
                         tau_s, kray_s,
                         dirlev, tns_s, rdif_s, tdif_s, den_s, alb_s,
                         src_s, fdn_s, sdn_s,
                         Ff_s, Alb_b, Src_b, td_b, r_b, sdnb_s, supb_s,
                         Dir_b, tnsb_s, taub_s, *,
                         nlay, w, band_minors, ncont_lo, nflav,
                         with_cloud):
    b = pl.program_id(1)
    dtype = tau_s.dtype
    tiny = jnp.asarray(np.finfo(np.float32).tiny, dtype)
    eps = jnp.asarray(np.finfo(np.float32).eps, dtype)
    min_k = jnp.asarray(1.0e4 * np.finfo(np.float32).eps, dtype)
    min_mu0 = jnp.asarray(np.sqrt(np.finfo(np.float32).eps), dtype)
    nlev = nlay + 1
    TE0, FE0, CM0 = 6, 6 + 2 * nflav, 6 + 4 * nflav
    TR0 = 6 + 6 * nflav
    flo = flav_ref[2 * b]
    fhi = flav_ref[2 * b + 1]

    @pl.when(b == 0)
    def _():
        desc_b_ref[:, :, :] = jnp.zeros(desc_b_ref.shape, dtype)
        msc_b_ref[:, :, :] = jnp.zeros(msc_b_ref.shape, dtype)
        mu0_b_ref[:, :] = jnp.zeros(mu0_b_ref.shape, dtype)

    def fields(it, l):
        tropo = desc_ref[2, l, :]

        def sel(base):
            return jnp.where(tropo > 0.5,
                             desc_ref[base + 2 * flo + it, l, :],
                             desc_ref[base + 2 * fhi + it, l, :])
        return (sel(TE0).astype(jnp.int32), sel(FE0)[None, :],
                sel(CM0)[None, :], desc_ref[3 + it, l, :][None, :])

    def ray_fields(it, l):
        tropo = desc_ref[2, l, :]
        tr = jnp.where(tropo > 0.5,
                       desc_ref[TR0 + 2 * flo + it, l, :],
                       desc_ref[TR0 + 2 * fhi + it, l, :]).astype(jnp.int32)
        fe = jnp.where(tropo > 0.5,
                       desc_ref[FE0 + 2 * flo + it, l, :],
                       desc_ref[FE0 + 2 * fhi + it, l, :])[None, :]
        ftv = desc_ref[3 + it, l, :][None, :]
        return tr, fe, ftv

    def ray_gather(it, l):
        """Rayleigh lo/hi lerp on the general (per-lane tropopause)
        path: gather both atmospheres, select by the tropo mask —
        numerically identical to the forward's tcode fast paths."""
        tropo2 = desc_ref[2, l, :][None, :]
        tr, fe, ftv = ray_fields(it, l)
        out = []
        for atm in range(2):
            lo = _gather_rows(rayl_ref[b, atm * 2 * w:atm * 2 * w + w, :],
                              tr)
            hi = _gather_rows(
                rayl_ref[b, (atm * 2 + 1) * w:(atm * 2 + 2) * w, :], tr)
            out.append((lo, hi))
        lo = tropo2 * out[0][0] + (1.0 - tropo2) * out[1][0]
        hi = tropo2 * out[0][1] + (1.0 - tropo2) * out[1][1]
        return lo, hi, fe, ftv

    # ---- P-R: gas-optics recompute with stored payloads ----
    def build_layer(l, _):
        fp = desc_ref[0, l, :][None, :]
        jp0 = jpin_ref[0, 0, l]
        slab = tab_ref[b, pl.ds(jp0 * w, 2 * w), :]
        acc = None
        for it, (pres_s, dfe_s, dfp_s) in enumerate(
                ((pres0_s, dfe0_s, dfp0_s), (pres1_s, dfe1_s, dfp1_s))):
            te, fe, cmv, ftv = fields(it, l)
            g0 = _gather_rows(slab, te)
            g1 = _gather_rows(slab, te + 1)
            kk = (1.0 - fe) * g0 + fe * g1
            dk = g1 - g0
            presA, presB = kk[:w, :], kk[w:, :]
            pres = (1.0 - fp) * presA + fp * presB
            pres_s[l, :, :] = pres
            dfe_s[l, :, :] = (1.0 - fp) * dk[:w, :] + fp * dk[w:, :]
            dfp_s[l, :, :] = presB - presA
            term = (ftv * cmv) * pres
            acc = term if acc is None else acc + term
        tau_s[l, :, :] = acc

        # rayleigh k (pre-rayscale)
        k = jnp.zeros((w, _BC), dtype)
        for it in range(2):
            lo, hi, fe, ftv = ray_gather(it, l)
            k = k + ((1.0 - fe) * ftv) * lo + (fe * ftv) * hi
        kray_s[l, :, :] = k
        return 0

    jax.lax.fori_loop(0, nlay, build_layer, 0)

    # minors into tau: the forward recompute IS the forward's own
    # minor_pass (fused_minors.py) — one implementation, so the backward
    # can never diverge from the accumulation it differentiates; the
    # adjoint re-gathers (minor_bar_group below) keep the explicit
    # per-band structure via run_minor_layers
    def run_minor_layers(fn):
        for bi, members in enumerate(band_minors):
            if not members:
                continue

            @pl.when(b == bi)
            def _(members=members):
                lo_mem = tuple(m for m in members if m[0])
                up_mem = tuple(m for m in members if not m[0])

                def layer(l, _):
                    tc = jpin_ref[0, 2, l]
                    if lo_mem:
                        @pl.when(tc != 2)
                        def _():
                            fn(lo_mem, l)
                    if up_mem:
                        @pl.when(tc != 1)
                        def _():
                            fn(up_mem, l)
                    return 0

                jax.lax.fori_loop(0, nlay, layer, 0)

    for bi in range(len(band_minors)):
        members = band_minors[bi]
        if not members:
            continue

        @pl.when(b == bi)
        def _(members=members):
            minor_pass(tau_s, desc_ref, msc_ref, mtab_lo_ref,
                       mtab_up_ref, jpin_ref, members, nlay=nlay, w=w,
                       ncont_lo=ncont_lo, TR0=TR0, FE0=FE0, dtype=dtype)

    # ---- combine_abs_and_rayleigh + cloud (forward values) ----
    # rayscale row is per (layer, lane): read as a (nlay, 1, BC) value
    rayscale = desc_ref[5, :, :][:, None, :]
    tau_gas = tau_s[:, :, :]
    ray = kray_s[:, :, :] * rayscale
    t_gas = tau_gas + ray
    big = t_gas > 2.0 * tiny
    t_gas_w = jnp.where(big, t_gas, 1.0)
    ssa_gas = jnp.where(big, ray / t_gas_w, 0.0)
    if with_cloud:
        o_tau = ct_ref[0, :, :][:, None, :]
        o_ssa = cs_ref[0, :, :][:, None, :]
        o_g = cg_ref[0, :, :][:, None, :]
        t = t_gas + o_tau
        ts = t_gas * ssa_gas + o_tau * o_ssa
        ts_safe = jnp.maximum(ts, tiny)
        t_safe = jnp.maximum(t, tiny)
        g12 = (o_tau * o_ssa * o_g) / ts_safe
        ssa12 = ts / t_safe
        asym = jnp.where(ts > 2.0 * tiny, g12, 0.0)
        w0 = jnp.where(t > 2.0 * tiny, ssa12, ssa_gas)
    else:
        t, w0, asym = t_gas, ssa_gas, jnp.zeros_like(t_gas)

    # ---- P-0: forward solve recompute (solver_sw_bwd.py P0, fused
    # layer-major layout) ----
    mu0v = mu0_ref[:, :]
    mu0 = mu0v[:, None, :]
    mu0_s = jnp.maximum(min_mu0, mu0)
    g1 = (8.0 - w0 * (5.0 + 3.0 * asym)) * 0.25
    g2 = 3.0 * (w0 * (1.0 - asym)) * 0.25
    karg = (g1 - g2) * (g1 + g2)
    k = jnp.sqrt(jnp.maximum(karg, min_k))
    e1 = jnp.exp(-t * k)
    e2 = e1 * e1
    A = k * (1.0 + e2) + g1 * (1.0 - e2)
    rt = 1.0 / A
    rdif = rt * g2 * (1.0 - e2)
    tdif = rt * 2.0 * k * e1
    rdif_s[:, :, :] = rdif
    tdif_s[:, :, :] = tdif

    k_mu = k * mu0_s
    den0 = 1.0 - k_mu * k_mu
    den_ok = jnp.abs(den0) >= eps
    den = jnp.where(den_ok, den0, eps)
    rt2 = w0 * rt / den
    g3 = (2.0 - 3.0 * mu0_s * asym) * 0.25
    g4 = 1.0 - g3
    a1 = g1 * g4 + g2 * g3
    a2 = g1 * g3 + g2 * g4
    kg3 = k * g3
    kg4 = k * g4
    tns = jnp.exp(-t / mu0_s)
    tns_s[:, :, :] = tns
    Qr = ((1.0 - k_mu) * (a2 + kg3)
          - (1.0 + k_mu) * (a2 - kg3) * e2
          - 2.0 * (kg3 - a2 * k_mu) * e1 * tns)
    Qt = ((1.0 + k_mu) * (a1 + kg4) * tns
          - (1.0 - k_mu) * (a1 - kg4) * e2 * tns
          - 2.0 * (kg4 + a1 * k_mu) * e1)
    rdir0 = rt2 * Qr
    tdir0 = -rt2 * Qt
    hi_r = 1.0 - tns
    rdir = jnp.clip(rdir0, 0.0, hi_r)
    hi_t = 1.0 - tns - rdir
    tdir = jnp.clip(tdir0, 0.0, hi_t)

    incv = inc_ref[0, :, :]
    dirlev[0, :, :] = incv * mu0v[0, :][None, :]

    def down_dir(l, _):
        dirlev[l + 1, :, :] = dirlev[l, :, :] * tns_s[l, :, :]
        return 0

    _sl._loop(nlay, down_dir)

    day = (mu0 > 0.0).astype(dtype)
    # stage the direct-beam sources in scratch: up_build indexes layers
    # with a traced loop variable, which Mosaic supports only on REFS
    # (value-level x[v] lowers to dynamic_slice and is rejected).
    # supb_s is free until A-U overwrites it per layer.
    supb_s[:, :, :] = day * rdir * dirlev[:nlay, :, :]
    sdn_s[:, :, :] = day * tdir * dirlev[:nlay, :, :]

    day_sfc = (mu0v[nlay - 1, :][None, :] > 0.0).astype(dtype)
    albdirv = albdir_ref[0, :, :]
    albdifv = albdif_ref[0, :, :]
    alb_s[nlay, :, :] = albdifv
    src_s[nlay, :, :] = day_sfc * dirlev[nlay, :, :] * albdirv

    def up_build(i, _):
        v = nlay - 1 - i
        r = rdif_s[v, :, :]
        td = tdif_s[v, :, :]
        ab = alb_s[v + 1, :, :]
        d = 1.0 / (1.0 - r * ab)
        den_s[v, :, :] = d
        alb_s[v, :, :] = r + td * td * ab * d
        src_s[v, :, :] = (supb_s[v, :, :]
                          + td * d * (src_s[v + 1, :, :]
                                      + ab * sdn_s[v, :, :]))
        return 0

    _sl._loop(nlay, up_build)

    fdn_s[0, :, :] = incdif_ref[0, :, :]

    def dn_sweep(v, _):
        fdn_s[v + 1, :, :] = (tdif_s[v, :, :] * fdn_s[v, :, :]
                              + rdif_s[v, :, :] * src_s[v + 1, :, :]
                              + sdn_s[v, :, :]) * den_s[v, :, :]
        return 0

    _sl._loop(nlay, dn_sweep)

    # ---- A-F: adjoint of the top-down flux sweep ----
    def grow(ref, i):
        return jnp.broadcast_to(ref[i, :][None, :], (w, _BC))

    Ff_s[nlay, :, :] = (grow(gdn_ref, nlay)
                        + grow(gup_ref, nlay) * alb_s[nlay, :, :])
    Alb_b[nlay, :, :] = grow(gup_ref, nlay) * fdn_s[nlay, :, :]
    Src_b[nlay, :, :] = grow(gup_ref, nlay)

    def af(i, _):
        v = nlay - 1 - i
        Fh = Ff_s[v + 1, :, :]
        d = den_s[v, :, :]
        prod = (tdif_s[v, :, :] * fdn_s[v, :, :]
                + rdif_s[v, :, :] * src_s[v + 1, :, :]
                + sdn_s[v, :, :])
        td_b[v, :, :] = Fh * d * fdn_s[v, :, :]
        r_b[v, :, :] = Fh * d * src_s[v + 1, :, :]
        sdnb_s[v, :, :] = Fh * d
        dd = (Fh * prod) * d * d
        r_b[v, :, :] += dd * alb_s[v + 1, :, :]
        Alb_b[v + 1, :, :] += dd * rdif_s[v, :, :]
        Src_b[v + 1, :, :] += Fh * d * rdif_s[v, :, :]
        Ff_s[v, :, :] = (grow(gdn_ref, v)
                         + grow(gup_ref, v) * alb_s[v, :, :]
                         + tdif_s[v, :, :] * d * Fh)
        Alb_b[v, :, :] = grow(gup_ref, v) * fdn_s[v, :, :]
        Src_b[v, :, :] = grow(gup_ref, v)
        return 0

    _sl._loop(nlay, af)
    incdif_b_ref[0, :, :] = Ff_s[0, :, :]

    # ---- A-U: adjoint of the bottom-up build ----
    def au(v, _):
        r = rdif_s[v, :, :]
        td = tdif_s[v, :, :]
        ab = alb_s[v + 1, :, :]
        d = den_s[v, :, :]
        ab_h = Alb_b[v, :, :]
        sb = Src_b[v, :, :]
        inner = src_s[v + 1, :, :] + ab * sdn_s[v, :, :]
        r_b[v, :, :] += ab_h
        td_b[v, :, :] += ab_h * 2.0 * td * ab * d
        d_h = ab_h * td * td * ab
        ab_acc = ab_h * td * td * d
        supb_s[v, :, :] = sb
        td_b[v, :, :] += sb * d * inner
        d_h += sb * td * inner
        Src_b[v + 1, :, :] += sb * td * d
        ab_acc += sb * td * d * sdn_s[v, :, :]
        sdnb_s[v, :, :] += sb * td * d * ab
        dd = d_h * d * d
        r_b[v, :, :] += dd * ab
        ab_acc += dd * r
        Alb_b[v + 1, :, :] += ab_acc
        return 0

    _sl._loop(nlay, au)

    # ---- A-S: surface + sources -> beam, reverse beam sweep ----
    albdif_b_ref[0, :, :] = Alb_b[nlay, :, :]
    albdir_b_ref[0, :, :] = (Src_b[nlay, :, :] * day_sfc
                             * dirlev[nlay, :, :])
    Dir_b[nlay, :, :] = (grow(gdn_ref, nlay) + grow(gdir_ref, nlay)
                         + Src_b[nlay, :, :] * day_sfc * albdirv)
    rdir_b = supb_s[:, :, :] * day * dirlev[:nlay, :, :]
    tdir_b = sdnb_s[:, :, :] * day * dirlev[:nlay, :, :]
    dl_src = day * (rdir * supb_s[:, :, :] + tdir * sdnb_s[:, :, :])
    taub_s[:, :, :] = dl_src          # staging for the sweep reads

    def ab_sweep(i, _):
        l = nlay - 1 - i
        Dh = Dir_b[l + 1, :, :]
        tnsb_s[l, :, :] = dirlev[l, :, :] * Dh
        Dir_b[l, :, :] = (grow(gdn_ref, l) + grow(gdir_ref, l)
                          + taub_s[l, :, :] + tns_s[l, :, :] * Dh)
        return 0

    _sl._loop(nlay, ab_sweep)
    inc_b_ref[0, :, :] = Dir_b[0, :, :] * mu0v[0, :][None, :]

    # ---- A-C: Meador-Weaver/PIFM chain transposed (solver_sw_bwd.py) --
    tns_b = tnsb_s[:, :, :]
    rdif_b = r_b[:, :, :]
    tdif_b = td_b[:, :, :]

    in_t = ((tdir0 > 0.0) & (tdir0 < hi_t)).astype(dtype)
    hi_t_b = jnp.where(tdir0 >= hi_t, tdir_b, 0.0)
    tdir0_b = tdir_b * in_t
    rdir_b = rdir_b - hi_t_b
    tns_b = tns_b - hi_t_b
    in_r = ((rdir0 > 0.0) & (rdir0 < hi_r)).astype(dtype)
    hi_r_b = jnp.where(rdir0 >= hi_r, rdir_b, 0.0)
    rdir0_b = rdir_b * in_r
    tns_b = tns_b - hi_r_b

    rt2_b = rdir0_b * Qr - tdir0_b * Qt
    Qr_b = rdir0_b * rt2
    Qt_b = -tdir0_b * rt2

    kmu_b = Qr_b * (-(a2 + kg3) - (a2 - kg3) * e2
                    + 2.0 * a2 * e1 * tns) \
        + Qt_b * ((a1 + kg4) * tns + (a1 - kg4) * e2 * tns
                  - 2.0 * a1 * e1)
    a2_b = Qr_b * ((1.0 - k_mu) - (1.0 + k_mu) * e2
                   + 2.0 * k_mu * e1 * tns)
    kg3_b = Qr_b * ((1.0 - k_mu) + (1.0 + k_mu) * e2 - 2.0 * e1 * tns)
    a1_b = Qt_b * ((1.0 + k_mu) * tns - (1.0 - k_mu) * e2 * tns
                   - 2.0 * k_mu * e1)
    kg4_b = Qt_b * ((1.0 + k_mu) * tns + (1.0 - k_mu) * e2 * tns
                    - 2.0 * e1)
    e2_b = (Qr_b * (-(1.0 + k_mu) * (a2 - kg3))
            + Qt_b * (-(1.0 - k_mu) * (a1 - kg4) * tns))
    e1_b = (Qr_b * (-2.0 * (kg3 - a2 * k_mu) * tns)
            + Qt_b * (-2.0 * (kg4 + a1 * k_mu)))
    tns_b = tns_b + (Qr_b * (-2.0 * (kg3 - a2 * k_mu) * e1)
                     + Qt_b * ((1.0 + k_mu) * (a1 + kg4)
                               - (1.0 - k_mu) * (a1 - kg4) * e2))

    rt_b = rdif_b * g2 * (1.0 - e2) + tdif_b * 2.0 * k * e1
    g2_b = rdif_b * rt * (1.0 - e2)
    e2_b = e2_b - rdif_b * rt * g2
    k_b = tdif_b * 2.0 * rt * e1
    e1_b = e1_b + tdif_b * 2.0 * rt * k

    w0_b = rt2_b * rt / den
    rt_b = rt_b + rt2_b * w0 / den
    den_b = -rt2_b * rt2 / den
    den0_b = jnp.where(den_ok, den_b, 0.0)
    kmu_b = kmu_b - 2.0 * k_mu * den0_b

    A_b = -rt_b * rt * rt
    k_b = k_b + A_b * (1.0 + e2)
    g1_b = A_b * (1.0 - e2)
    e2_b = e2_b + A_b * (k - g1)

    k_b = k_b + kg3_b * g3 + kg4_b * g4 + kmu_b * mu0_s
    g3_b = kg3_b * k
    g4_b = kg4_b * k
    mu0s_b = kmu_b * k

    g1_b = g1_b + a1_b * g4 + a2_b * g3
    g4_b = g4_b + a1_b * g1 + a2_b * g2
    g2_b = g2_b + a1_b * g3 + a2_b * g4
    g3_b = g3_b + a1_b * g2 + a2_b * g1

    g3_b = g3_b - g4_b
    mu0s_b = mu0s_b - 0.75 * asym * g3_b
    asym_b = -0.75 * mu0_s * g3_b

    e1_b = e1_b + 2.0 * e1 * e2_b
    t_b = -tns_b * tns / mu0_s - e1_b * e1 * k
    mu0s_b = mu0s_b + tns_b * tns * t / (mu0_s * mu0_s)
    k_b = k_b - e1_b * e1 * t

    karg_b = jnp.where(karg >= min_k, k_b / (2.0 * k), 0.0)
    g1_b = g1_b + 2.0 * g1 * karg_b
    g2_b = g2_b - 2.0 * g2 * karg_b

    w0_b = w0_b - 0.25 * (5.0 + 3.0 * asym) * g1_b \
        + 0.75 * (1.0 - asym) * g2_b
    asym_b = asym_b - 0.75 * w0 * g1_b - 0.75 * w0 * g2_b

    # mu0 cotangent: mu0s = max(min_mu0, mu0); + the TOA beam seed
    mu0f_b = jnp.where(mu0 > min_mu0, mu0s_b, 0.0)
    mu0_rows = jnp.sum(mu0f_b, axis=1)                    # (nlay, BC)
    seed = jnp.sum(Dir_b[0, :, :] * incv, axis=0)[None, :]
    mu0_rows = mu0_rows + jnp.concatenate(
        [seed, jnp.zeros((nlay - 1, _BC), dtype)], axis=0)
    mu0_b_ref[:, :] += mu0_rows

    # ---- A-X: combine_abs_and_rayleigh + cloud transposed ----
    if with_cloud:
        ssa12_b = jnp.where(t > 2.0 * tiny, w0_b, 0.0)
        ssa_gas_b = jnp.where(t > 2.0 * tiny, jnp.zeros_like(w0_b), w0_b)
        g12_b = jnp.where(ts > 2.0 * tiny, asym_b, 0.0)
        ct_b = g12_b * (o_ssa * o_g) / ts_safe
        cs_b = g12_b * (o_tau * o_g) / ts_safe
        cg_b = g12_b * (o_tau * o_ssa) / ts_safe
        ts_b = jnp.where(ts > tiny, -g12_b * g12 / ts_safe, 0.0)
        ts_b = ts_b + ssa12_b / t_safe
        t_b = t_b + jnp.where(t > tiny, -ssa12_b * ssa12 / t_safe, 0.0)
        # ts = t_gas ssa_gas + o_tau o_ssa ; t = t_gas + o_tau
        t_gas_b = t_b + ts_b * ssa_gas
        ssa_gas_b = ssa_gas_b + ts_b * t_gas
        ct_b = ct_b + ts_b * o_ssa + t_b
        cs_b = cs_b + ts_b * o_tau
        ct_b_ref[0, :, :] = jnp.sum(ct_b, axis=1)
        cs_b_ref[0, :, :] = jnp.sum(cs_b, axis=1)
        cg_b_ref[0, :, :] = jnp.sum(cg_b, axis=1)
    else:
        t_gas_b = t_b
        ssa_gas_b = w0_b
        ct_b_ref[0, :, :] = jnp.zeros((nlay, _BC), dtype)
        cs_b_ref[0, :, :] = jnp.zeros((nlay, _BC), dtype)
        cg_b_ref[0, :, :] = jnp.zeros((nlay, _BC), dtype)

    # ssa_gas = where(big, ray/t_gas_w, 0); t_gas = tau_gas + ray
    bigf = big.astype(dtype)
    ray_b = ssa_gas_b * bigf / t_gas_w
    t_gas_b = t_gas_b - ssa_gas_b * bigf * ray / (t_gas_w * t_gas_w)
    ray_b = ray_b + t_gas_b
    tau_gas_b = t_gas_b
    # ray = kray * rayscale
    kray_b = ray_b * rayscale
    desc_b_ref[5, :, :] += jnp.sum(ray_b * kray_s[:, :, :], axis=1)
    taub_s[:, :, :] = tau_gas_b
    tnsb_s[:, :, :] = kray_b          # reuse as kray_b storage

    # ---- A-G: major / rayleigh / minor adjoints, per layer ----
    def major_bar_layer(l, _):
        tropo = desc_ref[2, l, :]
        mlo = (tropo > 0.5).astype(dtype)[None, :]
        mhi = 1.0 - mlo
        tb = taub_s[l, :, :]
        fp_acc = jnp.zeros((1, _BC), dtype)
        for it, (pres_s, dfe_s, dfp_s) in enumerate(
                ((pres0_s, dfe0_s, dfp0_s), (pres1_s, dfe1_s, dfp1_s))):
            _te, fe, cmv, ftv = fields(it, l)
            pres = pres_s[l, :, :]
            cm_b = jnp.sum(pres * (ftv * tb), axis=0)[None, :]
            ft_b = jnp.sum(pres * (cmv * tb), axis=0)[None, :]
            fe_b = jnp.sum(dfe_s[l, :, :] * (cmv * ftv * tb),
                           axis=0)[None, :]
            fp_acc = fp_acc + jnp.sum(
                dfp_s[l, :, :] * (cmv * ftv * tb), axis=0)[None, :]
            desc_b_ref[3 + it, l, :] += ft_b[0, :]
            desc_b_ref[CM0 + 2 * flo + it, l, :] += (mlo * cm_b)[0, :]
            desc_b_ref[CM0 + 2 * fhi + it, l, :] += (mhi * cm_b)[0, :]
            desc_b_ref[FE0 + 2 * flo + it, l, :] += (mlo * fe_b)[0, :]
            desc_b_ref[FE0 + 2 * fhi + it, l, :] += (mhi * fe_b)[0, :]
        desc_b_ref[0, l, :] += fp_acc[0, :]

        # rayleigh adjoint (re-gather; scatter fe/ft by tropo)
        kb = tnsb_s[l, :, :]
        for it in range(2):
            lo, hi, fe, ftv = ray_gather(it, l)
            lerp = (1.0 - fe) * lo + fe * hi
            fe_b = jnp.sum((hi - lo) * (ftv * kb), axis=0)[None, :]
            ft_b = jnp.sum(lerp * kb, axis=0)
            desc_b_ref[3 + it, l, :] += ft_b
            desc_b_ref[FE0 + 2 * flo + it, l, :] += (mlo * fe_b)[0, :]
            desc_b_ref[FE0 + 2 * fhi + it, l, :] += (mhi * fe_b)[0, :]
        return 0

    jax.lax.fori_loop(0, nlay, major_bar_layer, 0)

    def minor_bar_group(group, l):
        for (lower, f, mg, start, lg0, wm) in group:
            ncont = ncont_lo if lower else mtab_up_ref.shape[0] // 2
            tref = mtab_lo_ref if lower else mtab_up_ref
            scal = msc_ref[mg, l, :][None, :]
            tb = taub_s[l, lg0:lg0 + wm, :]
            kk = jnp.zeros((wm, _BC), dtype)
            for it in range(2):
                rr = desc_ref[TR0 + 2 * f + it, l, :].astype(jnp.int32)
                fe = desc_ref[FE0 + 2 * f + it, l, :][None, :]
                ftv = desc_ref[3 + it, l, :][None, :]
                lo = _gather_rows(tref[start:start + wm, :], rr)
                hi = _gather_rows(
                    tref[ncont + start:ncont + start + wm, :], rr)
                lerp = (1.0 - fe) * lo + fe * hi
                kk = kk + ftv * lerp
                common = scal * tb
                desc_b_ref[FE0 + 2 * f + it, l, :] += jnp.sum(
                    (hi - lo) * (ftv * common), axis=0)
                desc_b_ref[3 + it, l, :] += jnp.sum(lerp * common, axis=0)
            msc_b_ref[mg, l, :] += jnp.sum(kk * tb, axis=0)

    run_minor_layers(minor_bar_group)


def sw_fused_solve_kernel_vjp(flav, desc, msc, table_lane, mtab_lo,
                              mtab_up, rayl_lane, cloud, mu0,
                              sfc_alb_dir, sfc_alb_dif, inc, incdif, *,
                              nbnd, w, nlay, ncol, nflav, ngpt,
                              band_minors, band_g0, interpret=False):
    """The fused SW gas-optics + two-stream solve with BOTH directions
    as Pallas kernels. Differentiable wrt desc, msc, cloud, mu0,
    albedos, inc, incdif; tables/flav are constants. Same signature and
    returns as sw_fused_gas_optics_solve (broadband only). Caller must
    guarantee per-(block, layer) uniform pressure windows."""
    from .fused_sw import sw_fused_gas_optics_solve

    statics = dict(nbnd=nbnd, w=w, nlay=nlay, ncol=ncol, nflav=nflav,
                   ngpt=ngpt, band_minors=band_minors, band_g0=band_g0,
                   interpret=interpret)
    with_cloud = cloud is not None
    dtype = desc.dtype
    if not with_cloud:
        z = jnp.zeros((1, nlay, ncol), dtype)
        cloud = (z, z, z)

    @jax.custom_vjp
    def run(flav, table_lane, mtab_lo, mtab_up, rayl_lane,
            desc, msc, ct, cs, cg, mu0, albdir, albdif, inc, incdif):
        return sw_fused_gas_optics_solve(
            flav, desc, msc, table_lane, mtab_lo, mtab_up, rayl_lane,
            ((ct, cs, cg) if with_cloud else None), mu0, albdir, albdif,
            inc, incdif, **statics)

    def fwd(*args):
        return run(*args), args

    def bwd(res, ct_out):
        (flav, table_lane, mtab_lo, mtab_up, rayl_lane,
         desc, msc, ctau, cssa, cgg, mu0, albdir, albdif, inc,
         incdif) = res
        g_up, g_dn, g_dir = ct_out
        bars = _sw_fused_bwd(
            flav, desc, msc, table_lane, mtab_lo, mtab_up, rayl_lane,
            (ctau, cssa, cgg), mu0, albdir, albdif, inc, incdif,
            g_up, g_dn, g_dir, with_cloud=with_cloud, **statics)
        (desc_b, msc_b, ct_b, cs_b, cg_b, mu0_b, albdir_b, albdif_b,
         inc_b, incdif_b) = bars
        if not with_cloud:
            # the forward passed cloud=None through, ignoring the dummy
            # (1, nlay, ncol) zero primals, so their cotangents are zero
            # — and the kernel's (nbnd, ...) bars would fail the
            # custom_vjp shape check against the dummies' shape
            ct_b = jnp.zeros_like(ctau)
            cs_b = jnp.zeros_like(cssa)
            cg_b = jnp.zeros_like(cgg)
        fz = np.zeros(flav.shape, jax.dtypes.float0)
        return (fz, jnp.zeros_like(table_lane), jnp.zeros_like(mtab_lo),
                jnp.zeros_like(mtab_up), jnp.zeros_like(rayl_lane),
                desc_b, msc_b, ct_b, cs_b, cg_b, mu0_b, albdir_b,
                albdif_b, inc_b, incdif_b)

    run.defvjp(fwd, bwd)
    return run(flav, table_lane, mtab_lo, mtab_up, rayl_lane,
               desc, msc, cloud[0], cloud[1], cloud[2], mu0,
               sfc_alb_dir, sfc_alb_dif, inc, incdif)


def _sw_fused_bwd(flav, desc, msc, table_lane, mtab_lo, mtab_up,
                  rayl_lane, cloud, mu0, albdir, albdif, inc, incdif,
                  g_up, g_dn, g_dir, *, with_cloud, nbnd, w, nlay, ncol,
                  nflav, ngpt, band_minors, band_g0, interpret):
    dtype = desc.dtype
    pc = (-ncol) % _BC
    padc = lambda x: jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pc)])
    padc_e = lambda x: (x if pc == 0 else jnp.pad(
        x, [(0, 0)] * (x.ndim - 1) + [(0, pc)], mode="edge"))
    ncol_p = ncol + pc
    nlev = nlay + 1

    desc_p = padc_e(desc)
    # uniform flag pinned to 1: the adjoint kernels' eligibility (shared
    # pressure grids) is asserted eagerly by the caller
    jpin, _ = block_pressure_codes(desc_p, nlay=nlay,
                                   assume_uniform=True, with_fp=False)

    kern = functools.partial(
        _fused_sw_bwd_kernel, nlay=nlay, w=w, band_minors=band_minors,
        ncont_lo=mtab_lo.shape[0] // 2, nflav=nflav,
        with_cloud=with_cloud)

    cb_rows = lambda a: pl.BlockSpec(
        (a.shape[0], nlay, _BC), lambda c, b: (0, 0, c),
        memory_space=pltpu.VMEM)
    resident = lambda a: pl.BlockSpec(a.shape, lambda c, b: (0,) * a.ndim,
                                      memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    smem_cl = pl.BlockSpec((1, 3, nlay), lambda c, b: (c, 0, 0),
                           memory_space=pltpu.SMEM)
    band3 = lambda: pl.BlockSpec(
        (1, nlay, _BC), lambda c, b: ((b if with_cloud else 0), 0, c),
        memory_space=pltpu.VMEM)
    band3o = pl.BlockSpec((1, nlay, _BC), lambda c, b: (b, 0, c),
                          memory_space=pltpu.VMEM)
    bnd2 = pl.BlockSpec((1, w, _BC), lambda c, b: (b, 0, c),
                        memory_space=pltpu.VMEM)
    vmu = pl.BlockSpec((nlay, _BC), lambda c, b: (0, c),
                       memory_space=pltpu.VMEM)
    vlev = pl.BlockSpec((nlev, _BC), lambda c, b: (0, c),
                        memory_space=pltpu.VMEM)
    scrw = lambda nl: pltpu.VMEM((nl, w, _BC), dtype)

    outs = pl.pallas_call(
        kern,
        grid=(ncol_p // _BC, nbnd),
        in_specs=[
            smem, smem_cl,
            cb_rows(desc), cb_rows(msc),
            resident(table_lane), resident(mtab_lo), resident(mtab_up),
            resident(rayl_lane),
            band3(), band3(), band3(),
            vmu, bnd2, bnd2, bnd2, bnd2,
            vlev, vlev, vlev,
        ],
        out_specs=[cb_rows(desc), cb_rows(msc),
                   band3o, band3o, band3o,
                   vmu, bnd2, bnd2, bnd2, bnd2],
        out_shape=[
            jax.ShapeDtypeStruct(desc_p.shape, dtype),
            jax.ShapeDtypeStruct((msc.shape[0], nlay, ncol_p), dtype),
            jax.ShapeDtypeStruct((nbnd, nlay, ncol_p), dtype),
            jax.ShapeDtypeStruct((nbnd, nlay, ncol_p), dtype),
            jax.ShapeDtypeStruct((nbnd, nlay, ncol_p), dtype),
            jax.ShapeDtypeStruct((nlay, ncol_p), dtype),
            jax.ShapeDtypeStruct((nbnd, w, ncol_p), dtype),
            jax.ShapeDtypeStruct((nbnd, w, ncol_p), dtype),
            jax.ShapeDtypeStruct((nbnd, w, ncol_p), dtype),
            jax.ShapeDtypeStruct((nbnd, w, ncol_p), dtype),
        ],
        scratch_shapes=[
            scrw(nlay), scrw(nlay),               # pres0, pres1
            scrw(nlay), scrw(nlay),               # dfe0, dfe1
            scrw(nlay), scrw(nlay),               # dfp0, dfp1
            scrw(nlay), scrw(nlay),               # tau_s, kray_s
            scrw(nlev), scrw(nlay),               # dirlev, tns_s
            scrw(nlay), scrw(nlay),               # rdif_s, tdif_s
            scrw(nlay), scrw(nlev), scrw(nlev),   # den_s, alb_s, src_s
            scrw(nlev), scrw(nlay),               # fdn_s, sdn_s
            scrw(nlev), scrw(nlev), scrw(nlev),   # Ff_s, Alb_b, Src_b
            scrw(nlay), scrw(nlay),               # td_b, r_b
            scrw(nlay), scrw(nlay),               # sdnb_s, supb_s
            scrw(nlev),                           # Dir_b
            scrw(nlay), scrw(nlay),               # tnsb_s, taub_s
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(flav, jpin, desc_p, padc(msc),
      table_lane, mtab_lo, mtab_up, rayl_lane,
      padc(cloud[0]), padc(cloud[1]), padc(cloud[2]),
      padc_e(mu0), padc(albdir), padc(albdif), padc(inc), padc(incdif),
      padc_e(g_up), padc_e(g_dn), padc_e(g_dir))

    (desc_b, msc_b, ct_b, cs_b, cg_b, mu0_b, albdir_b, albdif_b,
     inc_b, incdif_b) = outs
    unc = lambda x: x[..., :ncol]
    return (unc(desc_b), unc(msc_b), unc(ct_b), unc(cs_b), unc(cg_b),
            unc(mu0_b), unc(albdir_b), unc(albdif_b), unc(inc_b),
            unc(incdif_b))
