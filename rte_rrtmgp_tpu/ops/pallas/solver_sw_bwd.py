"""Hand-derived adjoint Pallas kernel for the SW two-stream solve.

SW counterpart of solver_lw_bwd.py: the broadband two-stream + adding
solve (the all-sky/RFMIP default dispatch) gets a Pallas BACKWARD
kernel, so gradients run at forward-kernel speed instead of re-tracing
the XLA solver. The adjoints of the Shonk-Hogan recurrences are
reverse-direction recurrences of the same shape; the Meador-Weaver/PIFM
coefficient chain is transposed analytically term by term (forward refs
in solver_sw_kernel._sw_kernel; reference numerics
rte/kernels/mo_rte_solver_kernels.F90:503-609, :985-1127, :1135-1245).

Phase structure (cotangents of broadband up/dn_total/dir fluxes):
  P0  forward recompute, saving dirlev, tns, rdif, tdif, den, alb, src,
      fdn, sdn (all VMEM scratch).
  A-F adjoint of the top-down flux sweep: reverse (upward) carry
      Ffdn[v] = gdn[v] + gup[v]*alb[v] + tdif[v]*den[v]*Ffdn[v+1],
      scattering cotangents into tdif/rdif/sdn/den/src/alb.
  A-U adjoint of the bottom-up albedo/source build: FORWARD (downward)
      carry over (alb_bar, src_bar), scattering into rdif/tdif/sup/sdn
      and the surface albedos.
  A-S sources -> beam: dirlev_bar from sup/sdn bars; reverse beam sweep
      accumulating tns_bar and the TOA inc/mu0 cotangents.
  A-C the Meador-Weaver/PIFM elementwise chain transposed: clip
      adjoints, the Q_r/Q_t product rules, and the g1/g2/g3/g4/k/e1/e2/
      tns/rt/rt2/den factors collapsed into tau/ssa/g/mu0 cotangents.

Exactness is pinned by a float64 interpret-mode test against XLA
autodiff (tests/test_fused_autodiff.py); the f32 tier differs from the
XLA backward only by independent-implementation rounding.

Eligibility (caller falls back to the XLA backward otherwise):
broadband output, no spectral/byband mode.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import solver_lanes as _sl

from .solver_sw_kernel import _BCOL, _BGPT, sw_two_stream_broadband_lane

__all__ = ["sw_two_stream_broadband_lane_vjp"]


def _sw_bwd_kernel(tau_ref, ssa_ref, g_ref, mu0_ref, albdir_ref,
                   albdif_ref, inc_ref, incdif_ref,
                   gup_ref, gdn_ref, gdir_ref,
                   tau_b_ref, ssa_b_ref, g_b_ref, mu0_b_ref,
                   albdir_b_ref, albdif_b_ref, inc_b_ref, incdif_b_ref,
                   dirlev, tns_s, rdif_s, tdif_s, den_s, alb_s, src_s,
                   fdn_s, sdn_s,
                   Ff_s, Alb_b, Src_b, td_b, r_b, sdn_b, sup_b, Dir_b,
                   *, nlay):
    gb = pl.program_id(1)
    dtype = tau_ref.dtype
    eps = jnp.asarray(np.finfo(np.float32).eps, dtype)
    min_k = jnp.asarray(1.0e4 * np.finfo(np.float32).eps, dtype)
    min_mu0 = jnp.asarray(np.sqrt(np.finfo(np.float32).eps), dtype)
    ng = tau_ref.shape[-1]

    def brow(ref, i):
        return jnp.broadcast_to(ref[:, i][:, None], (ref.shape[0], ng))

    # ---- P0: forward recompute (identical numerics to _sw_kernel) ----
    t = tau_ref[:, :, :]
    w0 = ssa_ref[:, :, :]
    asym = g_ref[:, :, :]
    mu0 = mu0_ref[:, :][:, :, None]
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

    dirlev[:, 0, :] = inc_ref[:, :] * mu0_ref[:, 0][:, None]

    def down_dir(l, _):
        dirlev[:, l + 1, :] = dirlev[:, l, :] * tns_s[:, l, :]
        return 0

    _sl._loop(nlay, down_dir)

    day = (mu0 > 0.0).astype(dtype)
    # stage the direct-beam sources in scratch: the recurrences below
    # index layers with a traced loop variable, which Mosaic supports
    # only on REFS (a value-level x[:, v, :] lowers to dynamic_slice and
    # is rejected). sup_b is free until A-U overwrites it per layer.
    sup_b[:, :, :] = day * rdir * dirlev[:, :-1, :]
    sdn_s[:, :, :] = day * tdir * dirlev[:, :-1, :]

    day_sfc = (mu0_ref[:, nlay - 1][:, None] > 0.0).astype(dtype)
    alb_s[:, nlay, :] = albdif_ref[:, :]
    src_s[:, nlay, :] = day_sfc * dirlev[:, nlay, :] * albdir_ref[:, :]

    def up_build(i, _):
        v = nlay - 1 - i
        r = rdif_s[:, v, :]
        td = tdif_s[:, v, :]
        ab = alb_s[:, v + 1, :]
        d = 1.0 / (1.0 - r * ab)
        den_s[:, v, :] = d
        alb_s[:, v, :] = r + td * td * ab * d
        src_s[:, v, :] = (sup_b[:, v, :]
                          + td * d * (src_s[:, v + 1, :]
                                      + ab * sdn_s[:, v, :]))
        return 0

    _sl._loop(nlay, up_build)

    fdn_s[:, 0, :] = incdif_ref[:, :]

    def dn_sweep(v, _):
        f = (tdif_s[:, v, :] * fdn_s[:, v, :]
             + rdif_s[:, v, :] * src_s[:, v + 1, :]
             + sdn_s[:, v, :]) * den_s[:, v, :]
        fdn_s[:, v + 1, :] = f
        return 0

    _sl._loop(nlay, dn_sweep)

    # ---- A-F: adjoint of the top-down flux sweep ----
    # fup[v] = fdn[v]*alb[v] + src[v]  (terminal); fdn recurrence carries
    # Ffdn[v] = gdn[v] + gup[v]*alb[v] + tdif[v]*den[v]*Ffdn[v+1].
    # Per step v (producing fdn[v+1]): scatter into tdif/rdif/sdn/den and
    # src[v+1]/alb contributions; alb[v] also takes gup[v]*fdn[v].
    Ff_s[:, nlay, :] = (brow(gdn_ref, nlay)
                        + brow(gup_ref, nlay) * alb_s[:, nlay, :])
    Alb_b[:, nlay, :] = brow(gup_ref, nlay) * fdn_s[:, nlay, :]
    Src_b[:, nlay, :] = brow(gup_ref, nlay)

    def af(i, _):
        v = nlay - 1 - i
        Fh = Ff_s[:, v + 1, :]
        d = den_s[:, v, :]
        prod = (tdif_s[:, v, :] * fdn_s[:, v, :]
                + rdif_s[:, v, :] * src_s[:, v + 1, :]
                + sdn_s[:, v, :])
        td_b[:, v, :] = Fh * d * fdn_s[:, v, :]
        r_b[:, v, :] = Fh * d * src_s[:, v + 1, :]
        sdn_b[:, v, :] = Fh * d
        den_b = Fh * prod                      # d-hat from the sweep
        # d = 1/(1 - r*ab): handled in A-U below; stash den_b by folding
        # it through d's partials NOW (r and ab=alb[v+1] are saved):
        dd = den_b * d * d
        r_b[:, v, :] += dd * alb_s[:, v + 1, :]
        Alb_b[:, v + 1, :] += dd * rdif_s[:, v, :]
        Src_b[:, v + 1, :] += Fh * d * rdif_s[:, v, :]
        Ff_s[:, v, :] = (brow(gdn_ref, v)
                         + brow(gup_ref, v) * alb_s[:, v, :]
                         + tdif_s[:, v, :] * d * Fh)
        Alb_b[:, v, :] = brow(gup_ref, v) * fdn_s[:, v, :]
        Src_b[:, v, :] = brow(gup_ref, v)
        return 0

    _sl._loop(nlay, af)
    incdif_b_ref[:, :] = Ff_s[:, 0, :]

    # ---- A-U: adjoint of the bottom-up build (forward/downward order;
    # Alb_b/Src_b[v] are final when step v runs; contributions flow to
    # v+1) ----
    def au(v, _):
        r = rdif_s[:, v, :]
        td = tdif_s[:, v, :]
        ab = alb_s[:, v + 1, :]
        d = den_s[:, v, :]
        ab_h = Alb_b[:, v, :]
        sb = Src_b[:, v, :]
        inner = src_s[:, v + 1, :] + ab * sdn_s[:, v, :]
        # alb[v] = r + td^2 ab d
        r_b[:, v, :] += ab_h
        td_b[:, v, :] += ab_h * 2.0 * td * ab * d
        d_h = ab_h * td * td * ab
        ab_acc = ab_h * td * td * d
        # src[v] = sup[v] + td d inner
        sup_b[:, v, :] = sb
        td_b[:, v, :] += sb * d * inner
        d_h += sb * td * inner
        Src_b[:, v + 1, :] += sb * td * d
        ab_acc += sb * td * d * sdn_s[:, v, :]
        sdn_b[:, v, :] += sb * td * d * ab
        # d = 1/(1 - r ab)
        dd = d_h * d * d
        r_b[:, v, :] += dd * ab
        ab_acc += dd * r
        Alb_b[:, v + 1, :] += ab_acc
        return 0

    _sl._loop(nlay, au)

    # ---- A-S: surface + sources -> beam, then the reverse beam sweep --
    albdif_b_ref[:, :] = Alb_b[:, nlay, :]
    albdir_b_ref[:, :] = Src_b[:, nlay, :] * day_sfc * dirlev[:, nlay, :]
    # dirlev cotangents: direct flux sums (gdn + gdir at every level),
    # the source terms (levels 0..nlay-1), the surface source (level
    # nlay), then the reverse beam recurrence.
    Dir_b[:, nlay, :] = (brow(gdn_ref, nlay) + brow(gdir_ref, nlay)
                         + Src_b[:, nlay, :] * day_sfc * albdir_ref[:, :])
    rdir_b = sup_b[:, :, :] * day * dirlev[:, :-1, :]
    tdir_b = sdn_b[:, :, :] * day * dirlev[:, :-1, :]
    # the source terms' dirlev cotangent (levels 0..nlay-1), hoisted out
    # of the sweep; sup_b/sdn_b are final here. Staged in the alb_s
    # scratch (free after A-U) so the sweep's per-layer read is a REF
    # load, not a value-level dynamic_slice (Mosaic rejects the latter).
    alb_s[:, :nlay, :] = day * (rdir * sup_b[:, :, :]
                                + tdir * sdn_b[:, :, :])

    def ab_sweep(i, _):
        l = nlay - 1 - i
        Dh = Dir_b[:, l + 1, :]
        # tns_bar stored via tau_b_ref as staging (converted in A-C)
        tau_b_ref[:, l, :] = dirlev[:, l, :] * Dh      # tns_bar[l]
        Dir_b[:, l, :] = (brow(gdn_ref, l) + brow(gdir_ref, l)
                          + alb_s[:, l, :] + tns_s[:, l, :] * Dh)
        return 0

    _sl._loop(nlay, ab_sweep)
    inc_b_ref[:, :] = Dir_b[:, 0, :] * mu0_ref[:, 0][:, None]

    # ---- A-C: the Meador-Weaver/PIFM coefficient chain, transposed ----
    tns_b = tau_b_ref[:, :, :]                 # staged in ab_sweep
    rdif_b = r_b[:, :, :]
    tdif_b = td_b[:, :, :]

    # clip adjoints (strict interior; boundary ties are measure-zero)
    in_t = ((tdir0 > 0.0) & (tdir0 < hi_t)).astype(dtype)
    hi_t_b = jnp.where(tdir0 >= hi_t, tdir_b, 0.0)
    tdir0_b = tdir_b * in_t
    rdir_b = rdir_b - hi_t_b                  # hi_t = 1 - tns - rdir
    tns_b = tns_b - hi_t_b
    in_r = ((rdir0 > 0.0) & (rdir0 < hi_r)).astype(dtype)
    hi_r_b = jnp.where(rdir0 >= hi_r, rdir_b, 0.0)
    rdir0_b = rdir_b * in_r
    tns_b = tns_b - hi_r_b                    # hi_r = 1 - tns

    # rdir0 = rt2 Qr ; tdir0 = -rt2 Qt
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

    # rdif = rt g2 (1-e2); tdif = 2 rt k e1
    rt_b = rdif_b * g2 * (1.0 - e2) + tdif_b * 2.0 * k * e1
    g2_b = rdif_b * rt * (1.0 - e2)
    e2_b = e2_b - rdif_b * rt * g2
    k_b = tdif_b * 2.0 * rt * e1
    e1_b = e1_b + tdif_b * 2.0 * rt * k

    # rt2 = w0 rt / den
    w0_b = rt2_b * rt / den
    rt_b = rt_b + rt2_b * w0 / den
    den_b = -rt2_b * rt2 / den
    den0_b = jnp.where(den_ok, den_b, 0.0)
    kmu_b = kmu_b - 2.0 * k_mu * den0_b

    # rt = 1/A
    A_b = -rt_b * rt * rt
    k_b = k_b + A_b * (1.0 + e2)
    g1_b = A_b * (1.0 - e2)
    e2_b = e2_b + A_b * (k - g1)

    # kg3 = k g3; kg4 = k g4; kmu = k mu0s
    k_b = k_b + kg3_b * g3 + kg4_b * g4 + kmu_b * mu0_s
    g3_b = kg3_b * k
    g4_b = kg4_b * k
    mu0s_b = kmu_b * k

    # a1 = g1 g4 + g2 g3; a2 = g1 g3 + g2 g4
    g1_b = g1_b + a1_b * g4 + a2_b * g3
    g4_b = g4_b + a1_b * g1 + a2_b * g2
    g2_b = g2_b + a1_b * g3 + a2_b * g4
    g3_b = g3_b + a1_b * g2 + a2_b * g1

    # g4 = 1 - g3 ; g3 = (2 - 3 mu0s asym)/4
    g3_b = g3_b - g4_b
    mu0s_b = mu0s_b - 0.75 * asym * g3_b
    asym_b = -0.75 * mu0_s * g3_b

    # tns = exp(-t/mu0s); e1 = exp(-t k); e2 = e1^2
    e1_b = e1_b + 2.0 * e1 * e2_b
    tau_b = -tns_b * tns / mu0_s - e1_b * e1 * k
    mu0s_b = mu0s_b + tns_b * tns * t / (mu0_s * mu0_s)
    k_b = k_b - e1_b * e1 * t

    # k = sqrt(max(karg, min_k)); karg = g1^2 - g2^2
    karg_b = jnp.where(karg >= min_k, k_b / (2.0 * k), 0.0)
    g1_b = g1_b + 2.0 * g1 * karg_b
    g2_b = g2_b - 2.0 * g2 * karg_b

    # g1 = 2 - w0 (5 + 3 asym)/4 ; g2 = (3/4) w0 (1 - asym)
    w0_b = w0_b - 0.25 * (5.0 + 3.0 * asym) * g1_b \
        + 0.75 * (1.0 - asym) * g2_b
    asym_b = asym_b - 0.75 * w0 * g1_b - 0.75 * w0 * g2_b

    # mu0s = max(min_mu0, mu0); plus the TOA beam seed mu0[:,0]
    # (value-level .at[].add lowers via dynamic_update_slice, which
    # Mosaic rejects — express the layer-0 seed as a static concat)
    mu0f_b = jnp.where(mu0 > min_mu0, mu0s_b, 0.0)
    mu0_red = jnp.sum(mu0f_b, axis=-1)               # (BC, nlay)
    seed = jnp.sum(Dir_b[:, 0, :] * inc_ref[:, :], axis=-1)
    nl = mu0_red.shape[1]
    mu0_red = mu0_red + jnp.concatenate(
        [seed[:, None], jnp.zeros((mu0_red.shape[0], nl - 1),
                                  mu0_red.dtype)], axis=1)

    tau_b_ref[:, :, :] = tau_b
    ssa_b_ref[:, :, :] = w0_b
    g_b_ref[:, :, :] = asym_b

    @pl.when(gb == 0)
    def _():
        mu0_b_ref[:, :] = mu0_red

    @pl.when(gb != 0)
    def _():
        mu0_b_ref[:, :] += mu0_red


def _sw_bwd_lane(tau, ssa, g, mu0, sfc_alb_dir, sfc_alb_dif, inc_flux_dir,
                 inc_flux_dif, g_up, g_dn, g_dir, *, interpret=False):
    """Run the SW adjoint kernel; shapes as the forward entry point.
    Returns cotangents (tau, ssa, g, mu0, alb_dir, alb_dif, inc, incdif)."""
    ncol, nlay, ngpt = tau.shape
    dtype = tau.dtype
    pc = (-ncol) % _BCOL
    pg = (-ngpt) % _BGPT
    pad3 = lambda x: jnp.pad(x, ((0, pc), (0, 0), (0, pg)))
    pad2 = lambda x: jnp.pad(x, ((0, pc), (0, pg)))
    padc = lambda x: jnp.pad(x, ((0, pc), (0, 0)))
    ncol_p, ngpt_p = ncol + pc, ngpt + pg
    nlev = nlay + 1

    kern = functools.partial(_sw_bwd_kernel, nlay=nlay)
    v3 = pl.BlockSpec((_BCOL, nlay, _BGPT), lambda c, b: (c, 0, b),
                      memory_space=pltpu.VMEM)
    v2 = pl.BlockSpec((_BCOL, _BGPT), lambda c, b: (c, b),
                      memory_space=pltpu.VMEM)
    vmu = pl.BlockSpec((_BCOL, nlay), lambda c, b: (c, 0),
                       memory_space=pltpu.VMEM)
    vbb = pl.BlockSpec((_BCOL, nlev), lambda c, b: (c, 0),
                       memory_space=pltpu.VMEM)
    scratch3 = lambda nl: pltpu.VMEM((_BCOL, nl, _BGPT), dtype)

    outs = pl.pallas_call(
        kern,
        grid=(ncol_p // _BCOL, ngpt_p // _BGPT),
        in_specs=[v3, v3, v3, vmu, v2, v2, v2, v2, vbb, vbb, vbb],
        out_specs=[v3, v3, v3, vmu, v2, v2, v2, v2],
        out_shape=[jax.ShapeDtypeStruct((ncol_p, nlay, ngpt_p), dtype)] * 3
        + [jax.ShapeDtypeStruct((ncol_p, nlay), dtype)]
        + [jax.ShapeDtypeStruct((ncol_p, ngpt_p), dtype)] * 4,
        scratch_shapes=[scratch3(nlev), scratch3(nlay), scratch3(nlay),
                        scratch3(nlay), scratch3(nlay), scratch3(nlev),
                        scratch3(nlev), scratch3(nlev), scratch3(nlay),
                        scratch3(nlev), scratch3(nlev), scratch3(nlev),
                        scratch3(nlay), scratch3(nlay), scratch3(nlay),
                        scratch3(nlay), scratch3(nlev)],
        # 23 (16, nlay, 128) blocks + double-buffered operands + the
        # fully-unrolled recurrences' stack exceed the 16 MB default
        # scoped-VMEM limit at production nlay (measured 77.3 MB at
        # 4096x72x224 on the chip with full unroll)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(pad3(tau), pad3(ssa), pad3(g),
      jnp.pad(mu0, ((0, pc), (0, 0)), mode="edge"),
      pad2(sfc_alb_dir), pad2(sfc_alb_dif), pad2(inc_flux_dir),
      pad2(inc_flux_dif), padc(g_up), padc(g_dn), padc(g_dir))
    tau_b, ssa_b, g_b, mu0_b, adir_b, adif_b, inc_b, incdif_b = outs
    unp3 = lambda x: x[:ncol, :, :ngpt]
    unp2 = lambda x: x[:ncol, :ngpt]
    return (unp3(tau_b), unp3(ssa_b), unp3(g_b), mu0_b[:ncol],
            unp2(adir_b), unp2(adif_b), unp2(inc_b), unp2(incdif_b))


@functools.partial(jax.custom_vjp, nondiff_argnums=(8,))
def sw_two_stream_broadband_lane_vjp(tau, ssa, g, mu0, sfc_alb_dir,
                                     sfc_alb_dif, inc_flux_dir,
                                     inc_flux_dif, interpret):
    """Broadband SW two-stream solve whose FORWARD and BACKWARD are both
    Pallas kernels. inc_flux_dif must be an array (caller substitutes
    zeros for None). Returns (flux_up, flux_dn_total, flux_dir)."""
    return sw_two_stream_broadband_lane(
        tau, ssa, g, mu0, sfc_alb_dir, sfc_alb_dif, inc_flux_dir,
        inc_flux_dif, interpret=interpret)


def _vjp_fwd(tau, ssa, g, mu0, sfc_alb_dir, sfc_alb_dif, inc_flux_dir,
             inc_flux_dif, interpret):
    out = sw_two_stream_broadband_lane_vjp(
        tau, ssa, g, mu0, sfc_alb_dir, sfc_alb_dif, inc_flux_dir,
        inc_flux_dif, interpret)
    return out, (tau, ssa, g, mu0, sfc_alb_dir, sfc_alb_dif,
                 inc_flux_dir, inc_flux_dif)


def _vjp_bwd(interpret, res, ct):
    g_up, g_dn, g_dir = ct
    return _sw_bwd_lane(*res, g_up, g_dn, g_dir, interpret=interpret)


sw_two_stream_broadband_lane_vjp.defvjp(_vjp_fwd, _vjp_bwd)
