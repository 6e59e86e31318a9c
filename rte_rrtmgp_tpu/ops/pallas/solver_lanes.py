"""Lane-layout Pallas TPU solver kernels: spectral fields arrive in the
gas-optics gathers' native layout (ngpt, nlay, ncol) — g-points on
sublanes, columns on the 128-lane axis — so the fused all-sky/RFMIP
pipeline feeds the solvers with ZERO layout conversions. Broadband
fluxes come out (nlay+1, ncol); the caller transposes the tiny result.

Numerics identical to the (ncol, nlay, ngpt) kernels in
solver_lw_kernel.py / solver_sw_kernel.py (reference
rte/kernels/mo_rte_solver_kernels.F90:51-240, :503-609, :985-1127,
:1135-1245). Inputs are top-at-index-0 along the layer axis; padded
g-point rows (tau=0, sources=0, emis=0, inc=0) and padded columns
contribute exactly zero.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["lw_noscat_broadband_lanes", "lw_noscat_broadband_lanes_pfrac",
           "sw_two_stream_broadband_lanes"]

_BG = 8      # g-point rows per block (sublanes)
_BC = 128    # columns per block (lanes)

# Unroll factor for the sequential per-layer transport recurrences. Each
# iteration's body is a handful of VREG ops on a (w, 128) tile, so loop
# control + scratch address arithmetic is a visible fraction of the solve
# (448-512 grid steps x 2-3 recurrences x nlay iterations per launch).
# Mosaic's fori_loop lowering supports only unroll=1 or FULL unroll
# (unroll == num_steps), so the knob is boolean in effect: 1 = rolled
# loop, anything else = fully unrolled recurrence (loop control and
# scratch addressing become static). Default: FULL — measured on the
# chip at 4096x72 it is bitwise identical and saves 5.4% (SW) / 7.8%
# (LW) of the fused launches (docs/PERFORMANCE.md "Recurrence unroll",
# 2026-08-20). Set RTE_SOLVE_UNROLL=1 (read at TRACE time, so exporting
# it after import still works) or call set_unroll(1) to roll the loops
# back. Grids deeper than UNROLL_MAX_NLAY auto-roll to bound Mosaic
# compile time (full unroll grows it linearly with nlay).
UNROLL = None  # None = read RTE_SOLVE_UNROLL at trace time (default FULL)
UNROLL_MAX_NLAY = int(os.environ.get("RTE_SOLVE_UNROLL_MAX_NLAY", "512"))


def set_unroll(value):
    """Override recurrence unrolling: 1 = rolled, 0/None-like = full,
    None = defer to the RTE_SOLVE_UNROLL env var at trace time."""
    global UNROLL
    UNROLL = value


def _loop(nlay, body):
    """Sequential per-layer recurrence: rolled or fully unrolled."""
    u = UNROLL
    if u is None:
        u = int(os.environ.get("RTE_SOLVE_UNROLL", "0"))
    full = u != 1 and nlay <= UNROLL_MAX_NLAY
    jax.lax.fori_loop(0, nlay, body, 0, unroll=(nlay if full else 1))


# ---------------------------------------------------------------------------
# LW no-scattering (single angle, optional Tang-2018 rescaling + Jacobian)
# ---------------------------------------------------------------------------

def _lw_kernel(dsw_ref, tau_ref, ssa_ref, g_ref, lay_ref, lev_ref, emis_ref,
               ssrc_ref, sjac_ref, inc_ref,
               up_ref, dn_ref, jac_ref,
               trans_s, sdn_s, sup_s, cn_s, rdn_s, rup_s, jacw_s, *,
               nlay, do_rescaling, do_jacobians):
    gb = pl.program_id(1)
    dtype = tau_ref.dtype
    eps = np.finfo(np.float32).eps
    tiny = jnp.asarray(np.finfo(np.float32).tiny, dtype)
    tau_thresh = jnp.asarray(np.sqrt(np.sqrt(eps)), dtype)
    ds = dsw_ref[0]
    piw = jnp.asarray(np.pi, dtype) * dsw_ref[1]

    tl = tau_ref[:, :, :] * ds
    if do_rescaling:
        # Tang 2018 similarity rescaling (reference :148-184)
        w0 = ssa_ref[:, :, :]
        asym = g_ref[:, :, :]
        wb = w0 * (1.0 - asym) * 0.5
        scale = 1.0 - w0 + wb
        cn_s[:, :, :] = 0.4 * wb / scale
        tl = tl * scale
    trans = jnp.exp(-tl)
    trans_s[:, :, :] = trans

    # Clough et al. 1992 linear-in-tau source (reference :620-675)
    fact_big = (1.0 - trans) / jnp.maximum(tl, tiny) - trans
    fact_small = tl * (0.5 + tl * (-1.0 / 3.0 + tl * 0.125))
    fact = jnp.where(tl > tau_thresh, fact_big, fact_small)
    lay = lay_ref[:, :, :]
    lev_top = lev_ref[:, :-1, :]
    lev_bot = lev_ref[:, 1:, :]
    sdn_s[:, :, :] = (1.0 - trans) * lev_bot + 2.0 * fact * (lay - lev_bot)
    sup_s[:, :, :] = (1.0 - trans) * lev_top + 2.0 * fact * (lay - lev_top)

    # downward transport
    rdn_s[:, 0, :] = inc_ref[:, :] / piw

    def down(l, _):
        rdn_s[:, l + 1, :] = (trans_s[:, l, :] * rdn_s[:, l, :]
                              + sdn_s[:, l, :])
        return 0

    _loop(nlay, down)

    # surface reflection + emission
    emis = emis_ref[:, :]
    rup_s[:, nlay, :] = (rdn_s[:, nlay, :] * (1.0 - emis)
                         + emis * ssrc_ref[:, :])
    if do_jacobians:
        jacw_s[:, nlay, :] = emis * sjac_ref[:, :]

    # upward transport (+ Tang adjustment using the downwelling field)
    def up(i, _):
        v = nlay - 1 - i
        t = trans_s[:, v, :]
        adj = 0.0
        if do_rescaling:
            an = 1.0 - t * t
            adj = cn_s[:, v, :] * (an * rdn_s[:, v, :]
                                   - t * sdn_s[:, v, :] - sup_s[:, v, :])
        rup_s[:, v, :] = t * rup_s[:, v + 1, :] + sup_s[:, v, :] + adj
        if do_jacobians:
            jacw_s[:, v, :] = t * jacw_s[:, v + 1, :]
        return 0

    _loop(nlay, up)

    # adjusted second downward sweep (reference lw_transport_1rescl)
    if do_rescaling:
        def down2(l, _):
            t = trans_s[:, l, :]
            an = 1.0 - t * t
            adj = cn_s[:, l, :] * (an * rup_s[:, l, :]
                                   - t * sup_s[:, l, :] - sdn_s[:, l, :])
            rdn_s[:, l + 1, :] = t * rdn_s[:, l, :] + sdn_s[:, l, :] + adj
            return 0

        _loop(nlay, down2)

    # broadband: sum the block's g-point rows; accumulate over g blocks
    bb_up = piw * jnp.sum(rup_s[:, :, :], axis=0)
    bb_dn = piw * jnp.sum(rdn_s[:, :, :], axis=0)

    @pl.when(gb == 0)
    def _():
        up_ref[:, :] = bb_up
        dn_ref[:, :] = bb_dn

    @pl.when(gb != 0)
    def _():
        up_ref[:, :] += bb_up
        dn_ref[:, :] += bb_dn

    if do_jacobians:
        bb_jac = piw * jnp.sum(jacw_s[:, :, :], axis=0)

        @pl.when(gb == 0)
        def _():
            jac_ref[:, :] = bb_jac

        @pl.when(gb != 0)
        def _():
            jac_ref[:, :] += bb_jac
    else:
        @pl.when(gb == 0)
        def _():
            jac_ref[:, :] = jnp.zeros_like(jac_ref)


def lw_noscat_broadband_lanes(tau, lay_source, lev_source, sfc_emis, sfc_src,
                              inc_flux, *, ds, weight,
                              ssa=None, g=None, sfc_src_jac=None,
                              do_rescaling: bool = False,
                              do_jacobians: bool = False,
                              interpret: bool = False):
    """Broadband single-angle LW fluxes from lane-layout fields.

    tau/lay_source (ngpt, nlay, ncol); lev_source (ngpt, nlay+1, ncol);
    sfc_emis/sfc_src/inc_flux (ngpt, ncol). Returns (flux_up, flux_dn,
    flux_up_jac or None), each (nlay+1, ncol), top at index 0.
    """
    ngpt, nlay, ncol = tau.shape
    dtype = tau.dtype
    pg = (-ngpt) % _BG
    pc = (-ncol) % _BC

    pad3 = lambda x: jnp.pad(x, ((0, pg), (0, 0), (0, pc)))
    pad2 = lambda x: jnp.pad(x, ((0, pg), (0, pc)))

    zero3 = jnp.zeros_like(tau)
    zero2 = jnp.zeros((ngpt, ncol), dtype)
    dsw = jnp.stack([jnp.asarray(ds, dtype).reshape(()),
                     jnp.asarray(weight, dtype).reshape(())])
    args = (dsw, pad3(tau), pad3(ssa if ssa is not None else zero3),
            pad3(g if g is not None else zero3),
            pad3(lay_source), pad3(lev_source),
            pad2(sfc_emis), pad2(sfc_src),
            pad2(sfc_src_jac if sfc_src_jac is not None else zero2),
            pad2(inc_flux))
    ngpt_p, ncol_p = ngpt + pg, ncol + pc
    nlev = nlay + 1

    kern = functools.partial(_lw_kernel, nlay=nlay,
                             do_rescaling=do_rescaling,
                             do_jacobians=do_jacobians)
    v3 = lambda nl: pl.BlockSpec((_BG, nl, _BC), lambda c, b: (b, 0, c),
                                 memory_space=pltpu.VMEM)
    v2 = pl.BlockSpec((_BG, _BC), lambda c, b: (b, c),
                      memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    obb = pl.BlockSpec((nlev, _BC), lambda c, b: (0, c),
                       memory_space=pltpu.VMEM)
    scratch3 = lambda nl: pltpu.VMEM((_BG, nl, _BC), dtype)

    up, dn, jac = pl.pallas_call(
        kern,
        grid=(ncol_p // _BC, ngpt_p // _BG),
        in_specs=[smem, v3(nlay), v3(nlay), v3(nlay), v3(nlay), v3(nlev),
                  v2, v2, v2, v2],
        out_specs=[obb, obb, obb],
        out_shape=[jax.ShapeDtypeStruct((nlev, ncol_p), dtype)] * 3,
        scratch_shapes=[scratch3(nlay), scratch3(nlay), scratch3(nlay),
                        scratch3(nlay),
                        scratch3(nlev), scratch3(nlev), scratch3(nlev)],
        interpret=interpret,
    )(*args)
    return (up[:, :ncol], dn[:, :ncol],
            jac[:, :ncol] if do_jacobians else None)


# ---------------------------------------------------------------------------
# LW no-scattering mega-kernel: sources computed in-kernel from the Planck
# fraction and per-band Planck values — the (ngpt, nlay(+1), ncol)
# lay_source/lev_source fields never touch HBM (reference
# compute_Planck_source :568-710 fused with the solve).
# ---------------------------------------------------------------------------

def _lw_pfrac_kernel(dsw_ref, tau_ref, cld_ref, pf_ref, pbl_ref, pbv_ref,
                     pbs_ref, emis_ref, inc_ref,
                     up_ref, dn_ref,
                     trans_s, sdn_s, sup_s, rdn_s, rup_s, *,
                     nlay, with_cloud):
    gb = pl.program_id(1)
    dtype = tau_ref.dtype
    eps = np.finfo(np.float32).eps
    tiny = jnp.asarray(np.finfo(np.float32).tiny, dtype)
    tau_thresh = jnp.asarray(np.sqrt(np.sqrt(eps)), dtype)
    ds = dsw_ref[0]
    piw = jnp.asarray(np.pi, dtype) * dsw_ref[1]

    tau = tau_ref[:, :, :]
    if with_cloud:
        # by-band absorption-only cloud increment
        # (increment_1scalar_by_2stream + _bybnd expansion, in-kernel)
        tau = tau + cld_ref[0, :, :][None, :, :]
    tl = tau * ds
    trans = jnp.exp(-tl)
    trans_s[:, :, :] = trans

    # Planck sources from pfrac (geometric-mean interior levels,
    # reference :695-706) and the block band's Planck values
    pf = pf_ref[:, :, :]
    pb_lay = pbl_ref[0, :, :][None, :, :]
    pb_lev = pbv_ref[0, :, :][None, :, :]
    lay = pf * pb_lay
    pf_in = jnp.sqrt(pf[:, 1:, :] * pf[:, :-1, :])
    lev_top = jnp.concatenate([pf[:, :1, :], pf_in], axis=1) \
        * pb_lev[:, :-1, :]
    lev_bot = jnp.concatenate([pf_in, pf[:, -1:, :]], axis=1) \
        * pb_lev[:, 1:, :]

    # Clough et al. 1992 linear-in-tau source (reference :620-675)
    fact_big = (1.0 - trans) / jnp.maximum(tl, tiny) - trans
    fact_small = tl * (0.5 + tl * (-1.0 / 3.0 + tl * 0.125))
    fact = jnp.where(tl > tau_thresh, fact_big, fact_small)
    sdn_s[:, :, :] = (1.0 - trans) * lev_bot + 2.0 * fact * (lay - lev_bot)
    sup_s[:, :, :] = (1.0 - trans) * lev_top + 2.0 * fact * (lay - lev_top)

    # downward transport
    rdn_s[:, 0, :] = inc_ref[:, :] / piw

    def down(l, _):
        rdn_s[:, l + 1, :] = (trans_s[:, l, :] * rdn_s[:, l, :]
                              + sdn_s[:, l, :])
        return 0

    _loop(nlay, down)

    # surface reflection + emission: sfc_src = pfrac(sfc) * B(tsfc)
    emis = emis_ref[:, :]
    sfc_src = pf[:, nlay - 1, :] * pbs_ref[0, 0, :][None, :]
    rup_s[:, nlay, :] = (rdn_s[:, nlay, :] * (1.0 - emis) + emis * sfc_src)

    def up(i, _):
        v = nlay - 1 - i
        rup_s[:, v, :] = (trans_s[:, v, :] * rup_s[:, v + 1, :]
                          + sup_s[:, v, :])
        return 0

    _loop(nlay, up)

    bb_up = piw * jnp.sum(rup_s[:, :, :], axis=0)
    bb_dn = piw * jnp.sum(rdn_s[:, :, :], axis=0)

    @pl.when(gb == 0)
    def _():
        up_ref[:, :] = bb_up
        dn_ref[:, :] = bb_dn

    @pl.when(gb != 0)
    def _():
        up_ref[:, :] += bb_up
        dn_ref[:, :] += bb_dn


def lw_noscat_broadband_lanes_pfrac(tau, pfrac, pb_lay, pb_lev, pb_sfc,
                                    sfc_emis, inc_flux, *, ds, weight,
                                    band_width: int, cloud_tau_abs=None,
                                    interpret: bool = False):
    """Broadband single-angle LW fluxes with in-kernel Planck sources.

    tau/pfrac (ngpt, nlay, ncol); pb_lay (nbnd, nlay, ncol); pb_lev
    (nbnd, nlay+1, ncol); pb_sfc (nbnd, ncol); sfc_emis/inc_flux
    (ngpt, ncol). Requires uniform band width divisible by the 8-row
    g-point block (ngpt % band_width == 0); the caller falls back to
    the materialized-sources kernel otherwise. Returns (flux_up,
    flux_dn), each (nlay+1, ncol), top at index 0.
    """
    ngpt, nlay, ncol = tau.shape
    dtype = tau.dtype
    assert band_width % _BG == 0 and ngpt % band_width == 0
    pc = (-ncol) % _BC
    pad3 = lambda x: jnp.pad(x, ((0, 0), (0, 0), (0, pc)))
    pad2 = lambda x: jnp.pad(x, ((0, 0), (0, pc)))
    dsw = jnp.stack([jnp.asarray(ds, dtype).reshape(()),
                     jnp.asarray(weight, dtype).reshape(())])
    ncol_p = ncol + pc
    nlev = nlay + 1
    bpg = band_width // _BG     # g-point blocks per band
    with_cloud = cloud_tau_abs is not None
    cld = (cloud_tau_abs if with_cloud
           else jnp.zeros((1, nlay, ncol), dtype))

    kern = functools.partial(_lw_pfrac_kernel, nlay=nlay,
                             with_cloud=with_cloud)
    v3 = pl.BlockSpec((_BG, nlay, _BC), lambda c, b: (b, 0, c),
                      memory_space=pltpu.VMEM)
    vband = lambda nl: pl.BlockSpec((1, nl, _BC),
                                    lambda c, b: (b // bpg, 0, c),
                                    memory_space=pltpu.VMEM)
    vcld = pl.BlockSpec((1, nlay, _BC),
                        lambda c, b: ((b // bpg) if with_cloud else 0, 0, c),
                        memory_space=pltpu.VMEM)
    vbs = pl.BlockSpec((1, 1, _BC), lambda c, b: (b // bpg, 0, c),
                      memory_space=pltpu.VMEM)
    v2 = pl.BlockSpec((_BG, _BC), lambda c, b: (b, c),
                      memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    obb = pl.BlockSpec((nlev, _BC), lambda c, b: (0, c),
                       memory_space=pltpu.VMEM)
    scratch3 = lambda nl: pltpu.VMEM((_BG, nl, _BC), dtype)

    up, dn = pl.pallas_call(
        kern,
        grid=(ncol_p // _BC, ngpt // _BG),
        in_specs=[smem, v3, vcld, v3, vband(nlay), vband(nlev), vbs,
                  v2, v2],
        out_specs=[obb, obb],
        out_shape=[jax.ShapeDtypeStruct((nlev, ncol_p), dtype)] * 2,
        scratch_shapes=[scratch3(nlay), scratch3(nlay), scratch3(nlay),
                        scratch3(nlev), scratch3(nlev)],
        interpret=interpret,
    )(dsw, pad3(tau), pad3(cld), pad3(pfrac), pad3(pb_lay), pad3(pb_lev),
      pad2(pb_sfc)[:, None, :], pad2(sfc_emis), pad2(inc_flux))
    return up[:, :ncol], dn[:, :ncol]


# ---------------------------------------------------------------------------
# SW two-stream + adding (broadband)
# ---------------------------------------------------------------------------

def _sw_kernel(tau_ref, ssa_ref, g_ref, mu0_ref, albdir_ref, albdif_ref,
               inc_ref, incdif_ref,
               up_ref, dn_ref, dir_ref,
               dirlev, sdn_s, sup_s, rdif_s, tdif_s,
               alb_s, src_s, den_s, fup_s, fdn_s, tns_s, *, nlay):
    t = tau_ref[:, :, :]
    w0 = ssa_ref[:, :, :]
    asym = g_ref[:, :, :]
    _sw_body(t, w0, asym, mu0_ref[:, :], albdir_ref[:, :],
             albdif_ref[:, :], inc_ref[:, :], incdif_ref[:, :],
             up_ref, dn_ref, dir_ref,
             dirlev, sdn_s, sup_s, rdif_s, tdif_s,
             alb_s, src_s, den_s, fup_s, fdn_s, tns_s, nlay=nlay)


def _sw_body_lm(t, w0, asym, mu0v, albdirv, albdifv, incv, incdifv,
                up_ref, dn_ref, dir_ref,
                dirlev, sdn_s, sup_s, rdif_s, tdif_s,
                alb_s, src_s, den_s, fup_s, fdn_s, tns_s, *, nlay,
                byband=False):
    """Layer-major twin of _sw_body: all spectral fields and scratches are
    (nlay[+1], w, _BC) so each per-layer recurrence step is a contiguous
    tile slice (see docs/PERFORMANCE.md, v_laymaj)."""
    gb = pl.program_id(1)
    dtype = t.dtype
    eps = jnp.asarray(np.finfo(np.float32).eps, dtype)
    min_k = jnp.asarray(1.0e4 * np.finfo(np.float32).eps, dtype)
    min_mu0 = jnp.asarray(np.sqrt(np.finfo(np.float32).eps), dtype)

    mu0 = mu0v[:, None, :]                               # (nlay, 1, BC)
    mu0_s = jnp.maximum(min_mu0, mu0)

    # Meador-Weaver / PIFM layer coefficients (reference :985-1127)
    g1 = (8.0 - w0 * (5.0 + 3.0 * asym)) * 0.25
    g2 = 3.0 * (w0 * (1.0 - asym)) * 0.25
    k = jnp.sqrt(jnp.maximum((g1 - g2) * (g1 + g2), min_k))
    e1 = jnp.exp(-t * k)
    e2 = e1 * e1
    rt = 1.0 / (k * (1.0 + e2) + g1 * (1.0 - e2))
    rdif_s[:, :, :] = rt * g2 * (1.0 - e2)
    tdif_s[:, :, :] = rt * 2.0 * k * e1

    k_mu = k * mu0_s
    den = 1.0 - k_mu * k_mu
    den = jnp.where(jnp.abs(den) >= eps, den, eps)
    rt2 = w0 * rt / den
    g3 = (2.0 - 3.0 * mu0_s * asym) * 0.25
    g4 = 1.0 - g3
    a1 = g1 * g4 + g2 * g3
    a2 = g1 * g3 + g2 * g4
    kg3 = k * g3
    kg4 = k * g4
    tns = jnp.exp(-t / mu0_s)
    tns_s[:, :, :] = tns
    rdir = rt2 * ((1.0 - k_mu) * (a2 + kg3)
                  - (1.0 + k_mu) * (a2 - kg3) * e2
                  - 2.0 * (kg3 - a2 * k_mu) * e1 * tns)
    tdir = -rt2 * ((1.0 + k_mu) * (a1 + kg4) * tns
                   - (1.0 - k_mu) * (a1 - kg4) * e2 * tns
                   - 2.0 * (kg4 + a1 * k_mu) * e1)
    rdir = jnp.clip(rdir, 0.0, 1.0 - tns)
    tdir = jnp.clip(tdir, 0.0, 1.0 - tns - rdir)

    # direct-beam sweep (needs the level-resolved beam for the sources)
    dirlev[0, :, :] = incv * mu0v[0, :][None, :]

    def down_dir(l, _):
        dirlev[l + 1, :, :] = dirlev[l, :, :] * tns_s[l, :, :]
        return 0

    _loop(nlay, down_dir)

    day = (mu0 > 0.0).astype(dtype)
    sup_s[:nlay, :, :] = day * rdir * dirlev[:nlay, :, :]
    sdn_s[:nlay, :, :] = day * tdir * dirlev[:nlay, :, :]

    day_sfc = (mu0v[nlay - 1, :][None, :] > 0.0).astype(dtype)
    alb_s[nlay, :, :] = albdifv
    src_s[nlay, :, :] = day_sfc * dirlev[nlay, :, :] * albdirv

    # Shonk-Hogan adding: bottom-up albedo/source build (Eqs 9-11)
    def up_build(i, _):
        v = nlay - 1 - i
        r = rdif_s[v, :, :]
        td = tdif_s[v, :, :]
        ab = alb_s[v + 1, :, :]
        d = 1.0 / (1.0 - r * ab)
        den_s[v, :, :] = d
        alb_s[v, :, :] = r + td * td * ab * d
        src_s[v, :, :] = (sup_s[v, :, :]
                          + td * d * (src_s[v + 1, :, :]
                                      + ab * sdn_s[v, :, :]))
        return 0

    _loop(nlay, up_build)

    # top-down flux sweep (Eqs 12-13)
    fdn_s[0, :, :] = incdifv
    fup_s[0, :, :] = incdifv * alb_s[0, :, :] + src_s[0, :, :]

    def dn_sweep(v, _):
        f = (tdif_s[v, :, :] * fdn_s[v, :, :]
             + rdif_s[v, :, :] * src_s[v + 1, :, :]
             + sdn_s[v, :, :]) * den_s[v, :, :]
        fdn_s[v + 1, :, :] = f
        fup_s[v + 1, :, :] = f * alb_s[v + 1, :, :] + src_s[v + 1, :, :]
        return 0

    _loop(nlay, dn_sweep)

    # broadband: sum g-point rows; accumulate over g blocks (or, byband,
    # write this band's own output slice - used by the fused SW kernel)
    bb_up = jnp.sum(fup_s[:, :, :], axis=1)
    bb_dn = jnp.sum(fdn_s[:, :, :] + dirlev[:, :, :], axis=1)
    bb_dir = jnp.sum(dirlev[:, :, :], axis=1)

    if byband:
        up_ref[0, :, :] = bb_up
        dn_ref[0, :, :] = bb_dn
        dir_ref[0, :, :] = bb_dir
    else:
        @pl.when(gb == 0)
        def _():
            up_ref[:, :] = bb_up
            dn_ref[:, :] = bb_dn
            dir_ref[:, :] = bb_dir

        @pl.when(gb != 0)
        def _():
            up_ref[:, :] += bb_up
            dn_ref[:, :] += bb_dn
            dir_ref[:, :] += bb_dir


def _sw_body(t, w0, asym, mu0v, albdirv, albdifv, incv, incdifv,
             up_ref, dn_ref, dir_ref,
             dirlev, sdn_s, sup_s, rdif_s, tdif_s,
             alb_s, src_s, den_s, fup_s, fdn_s, tns_s, *, nlay,
             byband=False):
    gb = pl.program_id(1)
    dtype = t.dtype
    eps = jnp.asarray(np.finfo(np.float32).eps, dtype)
    min_k = jnp.asarray(1.0e4 * np.finfo(np.float32).eps, dtype)
    min_mu0 = jnp.asarray(np.sqrt(np.finfo(np.float32).eps), dtype)

    mu0 = mu0v[None, :, :]                               # (1, nlay, BC)
    mu0_s = jnp.maximum(min_mu0, mu0)

    # Meador-Weaver / PIFM layer coefficients (reference :985-1127)
    g1 = (8.0 - w0 * (5.0 + 3.0 * asym)) * 0.25
    g2 = 3.0 * (w0 * (1.0 - asym)) * 0.25
    k = jnp.sqrt(jnp.maximum((g1 - g2) * (g1 + g2), min_k))
    e1 = jnp.exp(-t * k)
    e2 = e1 * e1
    rt = 1.0 / (k * (1.0 + e2) + g1 * (1.0 - e2))
    rdif_s[:, :, :] = rt * g2 * (1.0 - e2)
    tdif_s[:, :, :] = rt * 2.0 * k * e1

    k_mu = k * mu0_s
    den = 1.0 - k_mu * k_mu
    den = jnp.where(jnp.abs(den) >= eps, den, eps)
    rt2 = w0 * rt / den
    g3 = (2.0 - 3.0 * mu0_s * asym) * 0.25
    g4 = 1.0 - g3
    a1 = g1 * g4 + g2 * g3
    a2 = g1 * g3 + g2 * g4
    kg3 = k * g3
    kg4 = k * g4
    tns = jnp.exp(-t / mu0_s)
    tns_s[:, :, :] = tns
    rdir = rt2 * ((1.0 - k_mu) * (a2 + kg3)
                  - (1.0 + k_mu) * (a2 - kg3) * e2
                  - 2.0 * (kg3 - a2 * k_mu) * e1 * tns)
    tdir = -rt2 * ((1.0 + k_mu) * (a1 + kg4) * tns
                   - (1.0 - k_mu) * (a1 - kg4) * e2 * tns
                   - 2.0 * (kg4 + a1 * k_mu) * e1)
    rdir = jnp.clip(rdir, 0.0, 1.0 - tns)
    tdir = jnp.clip(tdir, 0.0, 1.0 - tns - rdir)

    # direct-beam sweep (needs the level-resolved beam for the sources)
    dirlev[:, 0, :] = incv * mu0v[0, :][None, :]

    def down_dir(l, _):
        dirlev[:, l + 1, :] = dirlev[:, l, :] * tns_s[:, l, :]
        return 0

    _loop(nlay, down_dir)

    day = (mu0 > 0.0).astype(dtype)
    sup_s[:, :, :] = day * rdir * dirlev[:, :-1, :]
    sdn_s[:, :, :] = day * tdir * dirlev[:, :-1, :]

    day_sfc = (mu0v[nlay - 1, :][None, :] > 0.0).astype(dtype)
    alb_s[:, nlay, :] = albdifv
    src_s[:, nlay, :] = day_sfc * dirlev[:, nlay, :] * albdirv

    # Shonk-Hogan adding: bottom-up albedo/source build (Eqs 9-11)
    def up_build(i, _):
        v = nlay - 1 - i
        r = rdif_s[:, v, :]
        td = tdif_s[:, v, :]
        ab = alb_s[:, v + 1, :]
        d = 1.0 / (1.0 - r * ab)
        den_s[:, v, :] = d
        alb_s[:, v, :] = r + td * td * ab * d
        src_s[:, v, :] = (sup_s[:, v, :]
                          + td * d * (src_s[:, v + 1, :]
                                      + ab * sdn_s[:, v, :]))
        return 0

    _loop(nlay, up_build)

    # top-down flux sweep (Eqs 12-13)
    fdn_s[:, 0, :] = incdifv
    fup_s[:, 0, :] = incdifv * alb_s[:, 0, :] + src_s[:, 0, :]

    def dn_sweep(v, _):
        f = (tdif_s[:, v, :] * fdn_s[:, v, :]
             + rdif_s[:, v, :] * src_s[:, v + 1, :]
             + sdn_s[:, v, :]) * den_s[:, v, :]
        fdn_s[:, v + 1, :] = f
        fup_s[:, v + 1, :] = f * alb_s[:, v + 1, :] + src_s[:, v + 1, :]
        return 0

    _loop(nlay, dn_sweep)

    # broadband: sum g-point rows; accumulate over g blocks (or, byband,
    # write this band's own output slice - used by the fused SW kernel)
    bb_up = jnp.sum(fup_s[:, :, :], axis=0)
    bb_dn = jnp.sum(fdn_s[:, :, :] + dirlev[:, :, :], axis=0)
    bb_dir = jnp.sum(dirlev[:, :, :], axis=0)

    if byband:
        up_ref[0, :, :] = bb_up
        dn_ref[0, :, :] = bb_dn
        dir_ref[0, :, :] = bb_dir
    else:
        @pl.when(gb == 0)
        def _():
            up_ref[:, :] = bb_up
            dn_ref[:, :] = bb_dn
            dir_ref[:, :] = bb_dir

        @pl.when(gb != 0)
        def _():
            up_ref[:, :] += bb_up
            dn_ref[:, :] += bb_dn
            dir_ref[:, :] += bb_dir


def sw_two_stream_broadband_lanes(tau, ssa, g, mu0, sfc_alb_dir, sfc_alb_dif,
                                  inc_flux_dir, inc_flux_dif=None, *,
                                  interpret: bool = False):
    """Broadband SW two-stream fluxes from lane-layout fields.

    tau/ssa/g (ngpt, nlay, ncol); mu0 (nlay, ncol); boundary fields
    (ngpt, ncol). Returns (flux_up, flux_dn_total, flux_dir), each
    (nlay+1, ncol), top at index 0.
    """
    ngpt, nlay, ncol = tau.shape
    dtype = tau.dtype
    pg = (-ngpt) % _BG
    pc = (-ncol) % _BC

    pad3 = lambda x: jnp.pad(x, ((0, pg), (0, 0), (0, pc)))
    pad2 = lambda x: jnp.pad(x, ((0, pg), (0, pc)))

    mu0_p = jnp.pad(mu0, ((0, 0), (0, pc)), mode="edge")
    incdif = (inc_flux_dif if inc_flux_dif is not None
              else jnp.zeros_like(inc_flux_dir))
    ngpt_p, ncol_p = ngpt + pg, ncol + pc
    nlev = nlay + 1

    kern = functools.partial(_sw_kernel, nlay=nlay)
    v3 = pl.BlockSpec((_BG, nlay, _BC), lambda c, b: (b, 0, c),
                      memory_space=pltpu.VMEM)
    v2 = pl.BlockSpec((_BG, _BC), lambda c, b: (b, c),
                      memory_space=pltpu.VMEM)
    vmu = pl.BlockSpec((nlay, _BC), lambda c, b: (0, c),
                       memory_space=pltpu.VMEM)
    obb = pl.BlockSpec((nlev, _BC), lambda c, b: (0, c),
                       memory_space=pltpu.VMEM)
    scratch3 = lambda nl: pltpu.VMEM((_BG, nl, _BC), dtype)

    up, dn, fdir = pl.pallas_call(
        kern,
        grid=(ncol_p // _BC, ngpt_p // _BG),
        in_specs=[v3, v3, v3, vmu, v2, v2, v2, v2],
        out_specs=[obb, obb, obb],
        out_shape=[jax.ShapeDtypeStruct((nlev, ncol_p), dtype)] * 3,
        scratch_shapes=[scratch3(nlev), scratch3(nlay), scratch3(nlay),
                        scratch3(nlay), scratch3(nlay),
                        scratch3(nlev), scratch3(nlev), scratch3(nlay),
                        scratch3(nlev), scratch3(nlev), scratch3(nlay)],
        interpret=interpret,
    )(pad3(tau), pad3(ssa), pad3(g), mu0_p, pad2(sfc_alb_dir),
      pad2(sfc_alb_dif), pad2(inc_flux_dir), pad2(incdif))
    return up[:, :ncol], dn[:, :ncol], fdir[:, :ncol]


# ---------------------------------------------------------------------------
# SW mega-kernel: combine_abs_and_rayleigh (reference :1954-2036) and the
# by-band delta-scaled cloud increment (increment_2stream_by_2stream,
# optical-props kernels :199-226) fused into the two-stream solve — the
# combined (tau, ssa, g) fields never touch HBM.
# ---------------------------------------------------------------------------

def _sw_mega_kernel(taua_ref, ray_ref, ct_ref, cs_ref, cg_ref,
                    mu0_ref, albdir_ref, albdif_ref, inc_ref, incdif_ref,
                    up_ref, dn_ref, dir_ref,
                    dirlev, sdn_s, sup_s, rdif_s, tdif_s,
                    alb_s, src_s, den_s, fup_s, fdn_s, tns_s, *,
                    nlay, with_cloud):
    dtype = taua_ref.dtype
    tiny = jnp.asarray(np.finfo(np.float32).tiny, dtype)
    ray = ray_ref[:, :, :]
    t_gas = taua_ref[:, :, :] + ray
    big = t_gas > 2.0 * tiny
    ssa_gas = jnp.where(big, ray / jnp.where(big, t_gas, 1.0), 0.0)
    if with_cloud:
        o_tau = ct_ref[0, :, :][None, :, :]
        o_ssa = cs_ref[0, :, :][None, :, :]
        o_g = cg_ref[0, :, :][None, :, :]
        t = t_gas + o_tau
        tauscat = t_gas * ssa_gas + o_tau * o_ssa
        g12 = (o_tau * o_ssa * o_g) / jnp.maximum(tauscat, tiny)
        ssa12 = tauscat / jnp.maximum(t, tiny)
        asym = jnp.where(tauscat > 2.0 * tiny, g12, 0.0)
        w0 = jnp.where(t > 2.0 * tiny, ssa12, ssa_gas)
    else:
        t, w0, asym = t_gas, ssa_gas, jnp.zeros_like(t_gas)
    _sw_body(t, w0, asym, mu0_ref[:, :], albdir_ref[:, :],
             albdif_ref[:, :], inc_ref[:, :], incdif_ref[:, :],
             up_ref, dn_ref, dir_ref,
             dirlev, sdn_s, sup_s, rdif_s, tdif_s,
             alb_s, src_s, den_s, fup_s, fdn_s, tns_s, nlay=nlay)


def sw_two_stream_broadband_lanes_combined(
        tau_abs, tau_ray, cloud, mu0, sfc_alb_dir, sfc_alb_dif,
        inc_flux_dir, inc_flux_dif=None, *, band_width: int,
        interpret: bool = False):
    """Broadband SW two-stream fluxes with in-kernel Rayleigh combine and
    by-band cloud increment.

    tau_abs/tau_ray (ngpt, nlay, ncol); cloud = (tau, ssa, g) by band,
    each (nbnd, nlay, ncol) already delta-scaled, or None; mu0 (nlay,
    ncol); boundary fields (ngpt, ncol). Requires uniform band width
    divisible by 8 and ngpt % band_width == 0.
    """
    ngpt, nlay, ncol = tau_abs.shape
    dtype = tau_abs.dtype
    assert band_width % _BG == 0 and ngpt % band_width == 0
    pc = (-ncol) % _BC
    pad3 = lambda x: jnp.pad(x, ((0, 0), (0, 0), (0, pc)))
    pad2 = lambda x: jnp.pad(x, ((0, 0), (0, pc)))
    mu0_p = jnp.pad(mu0, ((0, 0), (0, pc)), mode="edge")
    incdif = (inc_flux_dif if inc_flux_dif is not None
              else jnp.zeros_like(inc_flux_dir))
    ncol_p = ncol + pc
    nlev = nlay + 1
    bpg = band_width // _BG
    with_cloud = cloud is not None
    if not with_cloud:
        # dummy band arrays (never read in-kernel)
        z = jnp.zeros((1, nlay, ncol_p), dtype)
        cloud = (z, z, z)

    kern = functools.partial(_sw_mega_kernel, nlay=nlay,
                             with_cloud=with_cloud)
    v3 = pl.BlockSpec((_BG, nlay, _BC), lambda c, b: (b, 0, c),
                      memory_space=pltpu.VMEM)
    vband = pl.BlockSpec((1, nlay, _BC),
                         lambda c, b: ((b // bpg) if with_cloud else 0, 0, c),
                         memory_space=pltpu.VMEM)
    v2 = pl.BlockSpec((_BG, _BC), lambda c, b: (b, c),
                      memory_space=pltpu.VMEM)
    vmu = pl.BlockSpec((nlay, _BC), lambda c, b: (0, c),
                       memory_space=pltpu.VMEM)
    obb = pl.BlockSpec((nlev, _BC), lambda c, b: (0, c),
                       memory_space=pltpu.VMEM)
    scratch3 = lambda nl: pltpu.VMEM((_BG, nl, _BC), dtype)

    up, dn, fdir = pl.pallas_call(
        kern,
        grid=(ncol_p // _BC, ngpt // _BG),
        in_specs=[v3, v3, vband, vband, vband, vmu, v2, v2, v2, v2],
        out_specs=[obb, obb, obb],
        out_shape=[jax.ShapeDtypeStruct((nlev, ncol_p), dtype)] * 3,
        scratch_shapes=[scratch3(nlev), scratch3(nlay), scratch3(nlay),
                        scratch3(nlay), scratch3(nlay),
                        scratch3(nlev), scratch3(nlev), scratch3(nlay),
                        scratch3(nlev), scratch3(nlev), scratch3(nlay)],
        interpret=interpret,
    )(pad3(tau_abs), pad3(tau_ray), pad3(cloud[0]), pad3(cloud[1]),
      pad3(cloud[2]), mu0_p, pad2(sfc_alb_dir), pad2(sfc_alb_dif),
      pad2(inc_flux_dir), pad2(incdif))
    return up[:, :ncol], dn[:, :ncol], fdir[:, :ncol]
