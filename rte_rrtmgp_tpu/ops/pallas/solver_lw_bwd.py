"""Hand-derived adjoint Pallas kernel for the LW no-scattering solve.

The generic gradient path re-traces the XLA solver on the backward pass
(ops/pallas/autodiff.with_xla_grad). This module instead gives the
broadband single-angle LW solve (the all-sky/RFMIP default dispatch) a
Pallas BACKWARD kernel: the adjoint of the transport recurrences is a
pair of reverse-direction recurrences of the same shape (the reference
itself transports its surface Jacobian the same way,
rte/kernels/mo_rte_solver_kernels.F90:731-742), so the whole backward
runs at forward-kernel speed with every spectral intermediate in VMEM.

Adjoint derivation (per g-point; forward refs in solver_lw_kernel.py):

  F1  tl = tau*ds;  trans = exp(-tl)
      fact = big? (1-trans)/tl - trans : tl*(1/2 - tl/3 + tl^2/8)
      sdn = (1-trans)*lev_bot + 2*fact*(lay - lev_bot)
      sup = (1-trans)*lev_top + 2*fact*(lay - lev_top)
  F2  rdn[0] = inc/piw;          rdn[l+1] = trans[l]*rdn[l] + sdn[l]
  F3  rup[N] = (1-emis)*rdn[N] + emis*sfc_src
  F4  rup[v] = trans[v]*rup[v+1] + sup[v]        (v = N-1 .. 0)
  F5  up = piw * sum_g rup;  dn = piw * sum_g rdn

Backward (cotangents g_up/g_dn of the broadband fluxes):
  A5  gup[l] = piw*g_up[l];  gdn[l] = piw*g_dn[l]   (broadcast over g)
  A4  downward sweep, carry R:  R[0] = gup[0]
        trans_bar[v] += R[v]*rup[v+1];  sup_bar[v] = R[v]
        R[v+1] = gup[v+1] + trans[v]*R[v]
  A3  emis_bar = R[N]*(sfc_src - rdn[N]);  ssrc_bar = emis*R[N]
      (surface reflection feeds A2 with (1-emis)*R[N])
  A2  upward sweep, carry D:  D[N] = gdn[N] + (1-emis)*R[N]
        trans_bar[l] += rdn[l]*D[l+1];  sdn_bar[l] = D[l+1]
        D[l] = gdn[l] + trans[l]*D[l+1]
      inc_bar = D[0]/piw
  A1  lay_bar   = 2*fact*(sdn_bar + sup_bar)
      levb_bar  = (1 - trans - 2*fact)*sdn_bar
      levt_bar  = (1 - trans - 2*fact)*sup_bar
      lev_bar[l] = levt_bar[l] + levb_bar[l-1]
      fact_bar  = 2*((lay-lev_bot)*sdn_bar + (lay-lev_top)*sup_bar)
      trans_bar += -(lev_bot*sdn_bar + lev_top*sup_bar)
                  + fact_bar * (big ? -1/tl - 1 : 0)
      tl_bar    = fact_bar * (big ? -(1-trans)/tl^2
                                  : 1/2 - (2/3)tl + (3/8)tl^2)
                  - trans*trans_bar
      tau_bar   = tl_bar*ds;   ds_bar = sum(tl_bar*tau)

Eligibility (caller falls back to the XLA backward otherwise): scalar
secant, single angle, no Tang rescaling, no Jacobian, broadband output.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import solver_lanes as _sl

from .solver_lw_kernel import _BCOL, _BGPT, lw_noscat_broadband_lane

__all__ = ["lw_noscat_broadband_lane_vjp"]


def _lw_bwd_kernel(dsw_ref, tau_ref, lay_ref, lev_ref, emis_ref,
                   ssrc_ref, inc_ref, gup_ref, gdn_ref,
                   tau_b_ref, lay_b_ref, lev_b_ref, emis_b_ref,
                   ssrc_b_ref, inc_b_ref, ds_b_ref,
                   trans_s, sdn_s, sup_s, rdn_s, rup_s, R_s, D_s, *, nlay):
    dtype = tau_ref.dtype
    eps = np.finfo(np.float32).eps
    tiny = jnp.asarray(np.finfo(np.float32).tiny, dtype)
    tau_thresh = jnp.asarray(np.sqrt(np.sqrt(eps)), dtype)
    ds = dsw_ref[0]
    piw = jnp.asarray(np.pi, dtype) * dsw_ref[1]
    ng = tau_ref.shape[-1]

    def brow(ref, i):
        # one broadband level row (BCOL,) broadcast over the g lanes
        return jnp.broadcast_to(ref[:, i][:, None], (ref.shape[0], ng))

    # ---- forward recompute (identical numerics to the forward kernel) --
    tl = tau_ref[:, :, :] * ds
    trans = jnp.exp(-tl)
    trans_s[:, :, :] = trans
    tlm = jnp.maximum(tl, tiny)
    big = tl > tau_thresh
    fact = jnp.where(big, (1.0 - trans) / tlm - trans,
                     tl * (0.5 + tl * (-1.0 / 3.0 + tl * 0.125)))
    lay = lay_ref[:, :, :]
    lev_top = lev_ref[:, :-1, :]
    lev_bot = lev_ref[:, 1:, :]
    sdn_s[:, :, :] = (1.0 - trans) * lev_bot + 2.0 * fact * (lay - lev_bot)
    sup_s[:, :, :] = (1.0 - trans) * lev_top + 2.0 * fact * (lay - lev_top)

    rdn_s[:, 0, :] = inc_ref[:, :] / piw

    def down(l, _):
        rdn_s[:, l + 1, :] = (trans_s[:, l, :] * rdn_s[:, l, :]
                              + sdn_s[:, l, :])
        return 0

    _sl._loop(nlay, down)

    emis = emis_ref[:, :]
    rup_s[:, nlay, :] = (rdn_s[:, nlay, :] * (1.0 - emis)
                         + emis * ssrc_ref[:, :])

    def up(i, _):
        v = nlay - 1 - i
        rup_s[:, v, :] = (trans_s[:, v, :] * rup_s[:, v + 1, :]
                          + sup_s[:, v, :])
        return 0

    _sl._loop(nlay, up)

    # ---- adjoint ----
    # A4: downward sweep with carry R (rup's adjoint). trans_bar
    # accumulates straight into tau_b_ref (reused as the trans_bar
    # buffer until A1 converts it); sup_bar overwrites sup_s (forward
    # values already consumed by the recurrences).
    R_s[:, 0, :] = piw * brow(gup_ref, 0)

    def a4(v, _):
        r = R_s[:, v, :]
        tau_b_ref[:, v, :] = r * rup_s[:, v + 1, :]        # trans_bar init
        sup_s[:, v, :] = r                                  # sup_bar
        R_s[:, v + 1, :] = (piw * brow(gup_ref, v + 1)
                            + trans_s[:, v, :] * r)
        return 0

    _sl._loop(nlay, a4)

    # A3: surface
    r_sfc = R_s[:, nlay, :]
    emis_b_ref[:, :] = r_sfc * (ssrc_ref[:, :] - rdn_s[:, nlay, :])
    ssrc_b_ref[:, :] = emis * r_sfc

    # A2: upward sweep with carry D (rdn's adjoint); sdn_bar overwrites
    # sdn_s; trans_bar accumulates into tau_b_ref.
    D_s[:, nlay, :] = (piw * brow(gdn_ref, nlay)
                       + (1.0 - emis) * r_sfc)

    def a2(i, _):
        l = nlay - 1 - i
        d = D_s[:, l + 1, :]
        tau_b_ref[:, l, :] += rdn_s[:, l, :] * d
        sdn_s[:, l, :] = d                                  # sdn_bar
        D_s[:, l, :] = piw * brow(gdn_ref, l) + trans_s[:, l, :] * d
        return 0

    _sl._loop(nlay, a2)

    inc_b_ref[:, :] = D_s[:, 0, :] / piw

    # A1: elementwise chain (vector ops over the whole (lay, gpt) tile)
    sdn_b = sdn_s[:, :, :]
    sup_b = sup_s[:, :, :]
    trans_b = tau_b_ref[:, :, :]
    lay_b_ref[:, :, :] = 2.0 * fact * (sdn_b + sup_b)
    coef = 1.0 - trans - 2.0 * fact
    levb_b = coef * sdn_b
    levt_b = coef * sup_b
    zero_col = jnp.zeros_like(levt_b[:, :1, :])
    lev_b_ref[:, :, :] = (jnp.concatenate([levt_b, zero_col], axis=1)
                          + jnp.concatenate([zero_col, levb_b], axis=1))
    fact_b = 2.0 * ((lay - lev_bot) * sdn_b + (lay - lev_top) * sup_b)
    trans_b = (trans_b - (lev_bot * sdn_b + lev_top * sup_b)
               + fact_b * jnp.where(big, -1.0 / tlm - 1.0, 0.0))
    dsmall = 0.5 + tl * (-2.0 / 3.0 + tl * 0.375)
    tl_b = (fact_b * jnp.where(big, -(1.0 - trans) / (tlm * tlm), dsmall)
            - trans * trans_b)
    tau_b_ref[:, :, :] = tl_b * ds
    # scalar-secant cotangent: ds_bar = sum(tl_b * tau), reduced over
    # layers here, over (col, gpt) by the caller
    ds_b_ref[:, :] = jnp.sum(tl_b * tau_ref[:, :, :], axis=1)


def _lw_bwd_lane(tau, lay_source, lev_source, sfc_emis, sfc_src, inc_flux,
                 g_up, g_dn, *, ds, weight, interpret=False):
    """Run the adjoint kernel. Shapes as the forward lane entry point;
    g_up/g_dn are (ncol, nlay+1) broadband cotangents. Returns cotangents
    (tau_b, lay_b, lev_b, emis_b, ssrc_b, inc_b, ds_b)."""
    ncol, nlay, ngpt = tau.shape
    dtype = tau.dtype
    pc = (-ncol) % _BCOL
    pg = (-ngpt) % _BGPT
    pad3 = lambda x: jnp.pad(x, ((0, pc), (0, 0), (0, pg)))
    pad2 = lambda x: jnp.pad(x, ((0, pc), (0, pg)))
    padc = lambda x: jnp.pad(x, ((0, pc), (0, 0)))
    ncol_p, ngpt_p = ncol + pc, ngpt + pg
    nlev = nlay + 1

    dsw = jnp.stack([jnp.asarray(ds, dtype).reshape(()),
                     jnp.asarray(weight, dtype).reshape(())])
    kern = functools.partial(_lw_bwd_kernel, nlay=nlay)
    v3 = lambda nl: pl.BlockSpec((_BCOL, nl, _BGPT), lambda c, b: (c, 0, b),
                                 memory_space=pltpu.VMEM)
    v2 = pl.BlockSpec((_BCOL, _BGPT), lambda c, b: (c, b),
                      memory_space=pltpu.VMEM)
    vbb = pl.BlockSpec((_BCOL, nlev), lambda c, b: (c, 0),
                       memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    scratch3 = lambda nl: pltpu.VMEM((_BCOL, nl, _BGPT), dtype)

    outs = pl.pallas_call(
        kern,
        grid=(ncol_p // _BCOL, ngpt_p // _BGPT),
        in_specs=[smem, v3(nlay), v3(nlay), v3(nlev), v2, v2, v2,
                  vbb, vbb],
        out_specs=[v3(nlay), v3(nlay), v3(nlev), v2, v2, v2, v2],
        out_shape=[jax.ShapeDtypeStruct((ncol_p, nlay, ngpt_p), dtype),
                   jax.ShapeDtypeStruct((ncol_p, nlay, ngpt_p), dtype),
                   jax.ShapeDtypeStruct((ncol_p, nlev, ngpt_p), dtype),
                   jax.ShapeDtypeStruct((ncol_p, ngpt_p), dtype),
                   jax.ShapeDtypeStruct((ncol_p, ngpt_p), dtype),
                   jax.ShapeDtypeStruct((ncol_p, ngpt_p), dtype),
                   jax.ShapeDtypeStruct((ncol_p, ngpt_p), dtype)],
        scratch_shapes=[scratch3(nlay), scratch3(nlay), scratch3(nlay),
                        scratch3(nlev), scratch3(nlev), scratch3(nlev),
                        scratch3(nlev)],
        # 13 (16, nlay, 128) blocks + double-buffered operands exceed the
        # 16 MB default scoped-VMEM limit at production nlay (measured
        # 33.2 MB at 4096x72x256 on the chip)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(dsw, pad3(tau), pad3(lay_source), pad3(lev_source), pad2(sfc_emis),
      pad2(sfc_src), pad2(inc_flux), padc(g_up), padc(g_dn))
    tau_b, lay_b, lev_b, emis_b, ssrc_b, inc_b, ds_part = outs
    unp3 = lambda x: x[:ncol, :, :ngpt]
    unp2 = lambda x: x[:ncol, :ngpt]
    ds_b = jnp.sum(ds_part[:ncol, :ngpt])
    return (unp3(tau_b), unp3(lay_b), unp3(lev_b), unp2(emis_b),
            unp2(ssrc_b), unp2(inc_b), ds_b)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def lw_noscat_broadband_lane_vjp(tau, lay_source, lev_source, sfc_emis,
                                 sfc_src, inc_flux, ds, weight, interpret):
    """Broadband single-angle LW solve whose FORWARD and BACKWARD are
    both Pallas kernels: gradients at forward-kernel speed with every
    spectral intermediate in VMEM (vs the generic XLA-retrace backward).
    ds/weight are static Python floats. Returns (flux_up, flux_dn)."""
    up, dn, _ = lw_noscat_broadband_lane(
        tau, lay_source, lev_source, sfc_emis, sfc_src, inc_flux,
        ds=ds, weight=weight, interpret=interpret)
    return up, dn


def _vjp_fwd(tau, lay_source, lev_source, sfc_emis, sfc_src, inc_flux,
             ds, weight, interpret):
    out = lw_noscat_broadband_lane_vjp(
        tau, lay_source, lev_source, sfc_emis, sfc_src, inc_flux,
        ds, weight, interpret)
    return out, (tau, lay_source, lev_source, sfc_emis, sfc_src, inc_flux)


def _vjp_bwd(ds, weight, interpret, res, ct):
    tau, lay_source, lev_source, sfc_emis, sfc_src, inc_flux = res
    g_up, g_dn = ct
    tau_b, lay_b, lev_b, emis_b, ssrc_b, inc_b, _ = _lw_bwd_lane(
        tau, lay_source, lev_source, sfc_emis, sfc_src, inc_flux,
        g_up, g_dn, ds=ds, weight=weight, interpret=interpret)
    return tau_b, lay_b, lev_b, emis_b, ssrc_b, inc_b


lw_noscat_broadband_lane_vjp.defvjp(_vjp_fwd, _vjp_bwd)
