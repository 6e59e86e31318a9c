"""Fused Pallas TPU kernel for the LW no-scattering solve (broadband,
single quadrature angle, optional Tang-2018 rescaling and surface
Jacobian) — the all-sky/RFMIP default dispatch.

Per (column-block, g-point-block): transmittance and the Clough
linear-in-tau source terms, the downward transport recurrence, surface
reflection + emission, the upward transport with the Tang similarity
adjustment, the adjusted second downward sweep, and lane-summed
broadband fluxes (x pi * quadrature weight) — all in VMEM scratch.

Numerics identical to ops/solver_lw.lw_solver_noscat with one angle
(reference lw_solver_noscat_oneangle + lw_transport_1rescl,
rte/kernels/mo_rte_solver_kernels.F90:51-240, :620-844). Padded g-points
carry tau=0 and zero sources/emissivity/inc, contributing exactly zero.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["lw_noscat_broadband_lane", "lw_two_stream_broadband_lane"]

_BCOL = 16
_BGPT = 128


def _lw_kernel(dsw_ref, tau_ref, ssa_ref, g_ref, lay_ref, lev_ref, emis_ref,
               ssrc_ref, sjac_ref, inc_ref, dsf_ref,
               up_ref, dn_ref, jac_ref,
               trans_s, sdn_s, sup_s, an_s, cn_s, rdn_s, rup_s, jacw_s, *,
               nlay, do_rescaling, do_jacobians, ds_per_gpt,
               band_width=None):
    gb = pl.program_id(1)
    dtype = tau_ref.dtype
    eps = np.finfo(np.float32).eps
    tiny = jnp.asarray(np.finfo(np.float32).tiny, dtype)
    tau_thresh = jnp.asarray(np.sqrt(np.sqrt(eps)), dtype)
    # per-(col, gpt) user secants (rte_lw(lw_ds=...), reference
    # mo_rte_lw.F90:344-366) or the scalar quadrature secant
    ds = dsf_ref[:, :][:, None, :] if ds_per_gpt else dsw_ref[0]
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
        an_s[:, :, :] = 1.0 - trans * trans
    else:
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

    jax.lax.fori_loop(0, nlay, down, 0)

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
            adj = cn_s[:, v, :] * (an_s[:, v, :] * rdn_s[:, v, :]
                                   - t * sdn_s[:, v, :] - sup_s[:, v, :])
        rup_s[:, v, :] = t * rup_s[:, v + 1, :] + sup_s[:, v, :] + adj
        if do_jacobians:
            jacw_s[:, v, :] = t * jacw_s[:, v + 1, :]
        return 0

    jax.lax.fori_loop(0, nlay, up, 0)

    # adjusted second downward sweep (reference lw_transport_1rescl)
    if do_rescaling:
        def down2(l, _):
            t = trans_s[:, l, :]
            adj = cn_s[:, l, :] * (an_s[:, l, :] * rup_s[:, l, :]
                                   - t * sup_s[:, l, :] - sdn_s[:, l, :])
            rdn_s[:, l + 1, :] = t * rdn_s[:, l, :] + sdn_s[:, l, :] + adj
            return 0

        jax.lax.fori_loop(0, nlay, down2, 0)

    if band_width is not None:
        # per-band sums: this g-point block owns its own nb-band output
        # slice, no cross-block accumulation (reference sum_byband,
        # rte/extensions/mo_fluxes_byband.F90:159-190, fused in-solver).
        # Output blocked (gpt-block, col-block, bands-per-block * nlev),
        # band-major flattened trailing dim so every write is a static
        # slice and the block equals the array's last dims (Mosaic).
        nb = rup_s.shape[-1] // band_width
        nlev = rup_s.shape[1]
        for j in range(nb):
            sl = slice(j * band_width, (j + 1) * band_width)
            up_ref[0, :, j * nlev:(j + 1) * nlev] = piw * jnp.sum(
                rup_s[:, :, sl], axis=-1)
            dn_ref[0, :, j * nlev:(j + 1) * nlev] = piw * jnp.sum(
                rdn_s[:, :, sl], axis=-1)
    else:
        bb_up = piw * jnp.sum(rup_s[:, :, :], axis=-1)
        bb_dn = piw * jnp.sum(rdn_s[:, :, :], axis=-1)

        @pl.when(gb == 0)
        def _():
            up_ref[:, :] = bb_up
            dn_ref[:, :] = bb_dn

        @pl.when(gb != 0)
        def _():
            up_ref[:, :] += bb_up
            dn_ref[:, :] += bb_dn

    # the surface-T Jacobian stays broadband in every mode (the reference
    # Jacobian is broadband-only, mo_rte_lw.F90:290-322)
    if do_jacobians:
        bb_jac = piw * jnp.sum(jacw_s[:, :, :], axis=-1)

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


def lw_noscat_broadband_lane(tau, lay_source, lev_source, sfc_emis, sfc_src,
                             inc_flux, *, ds, weight,
                             ssa=None, g=None, sfc_src_jac=None,
                             do_rescaling: bool = False,
                             do_jacobians: bool = False,
                             band_width=None,
                             interpret: bool = False):
    """Broadband single-angle LW fluxes (flux_up, flux_dn, flux_up_jac),
    (ncol, nlay+1) each. Inputs top-at-index-0; ds is the scalar secant
    (python float or traced scalar) OR a per-(ncol, ngpt) secant field
    (the lw_Ds path); weight is the quadrature weight.

    With ``band_width`` (uniform band width dividing 128 that tiles
    ngpt), flux_up/flux_dn become per-band sums (ncol, nlay+1, nbnd)
    accumulated in-kernel; the Jacobian stays broadband."""
    ncol, nlay, ngpt = tau.shape
    dtype = tau.dtype
    pc = (-ncol) % _BCOL
    pg = (-ngpt) % _BGPT

    def pad3(x, lev=False):
        return jnp.pad(x, ((0, pc), (0, 0), (0, pg)))

    def pad2(x):
        return jnp.pad(x, ((0, pc), (0, pg)))

    ds_arr = jnp.asarray(ds, dtype)
    ds_per_gpt = ds_arr.ndim == 2
    zero3 = jnp.zeros_like(tau)
    zero2 = jnp.zeros((ncol, ngpt), dtype)
    dsw = jnp.stack([(jnp.zeros((), dtype) if ds_per_gpt
                      else ds_arr.reshape(())),
                     jnp.asarray(weight, dtype).reshape(())])
    args = (dsw, pad3(tau), pad3(ssa if ssa is not None else zero3),
            pad3(g if g is not None else zero3),
            pad3(lay_source), pad3(lev_source),
            pad2(sfc_emis), pad2(sfc_src),
            pad2(sfc_src_jac if sfc_src_jac is not None else zero2),
            pad2(inc_flux),
            pad2(ds_arr if ds_per_gpt else zero2))
    ncol_p, ngpt_p = ncol + pc, ngpt + pg
    nlev = nlay + 1

    if band_width is not None and (band_width <= 0
                                   or _BGPT % band_width != 0
                                   or ngpt % band_width != 0):
        raise ValueError(f"band_width {band_width} must divide {_BGPT} "
                         f"and tile ngpt {ngpt}")

    kern = functools.partial(_lw_kernel, nlay=nlay,
                             do_rescaling=do_rescaling,
                             do_jacobians=do_jacobians,
                             ds_per_gpt=ds_per_gpt,
                             band_width=band_width)
    v3 = lambda nl: pl.BlockSpec((_BCOL, nl, _BGPT), lambda c, b: (c, 0, b),
                                 memory_space=pltpu.VMEM)
    v2 = pl.BlockSpec((_BCOL, _BGPT), lambda c, b: (c, b),
                      memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    obb = pl.BlockSpec((_BCOL, nlev), lambda c, b: (c, 0),
                       memory_space=pltpu.VMEM)
    scratch3 = lambda nl: pltpu.VMEM((_BCOL, nl, _BGPT), dtype)

    if band_width is None:
        flux_specs = [obb, obb]
        flux_shapes = [jax.ShapeDtypeStruct((ncol_p, nlev), dtype)] * 2
    else:
        nbpb = _BGPT // band_width          # bands per g-point block
        ngb = ngpt_p // _BGPT
        oby = pl.BlockSpec((1, _BCOL, nbpb * nlev),
                           lambda c, b: (b, c, 0),
                           memory_space=pltpu.VMEM)
        flux_specs = [oby, oby]
        flux_shapes = [jax.ShapeDtypeStruct((ngb, ncol_p, nbpb * nlev),
                                            dtype)] * 2

    up, dn, jac = pl.pallas_call(
        kern,
        grid=(ncol_p // _BCOL, ngpt_p // _BGPT),
        in_specs=[smem, v3(nlay), v3(nlay), v3(nlay), v3(nlay), v3(nlev),
                  v2, v2, v2, v2, v2],
        out_specs=flux_specs + [obb],
        out_shape=flux_shapes + [jax.ShapeDtypeStruct((ncol_p, nlev), dtype)],
        scratch_shapes=[scratch3(nlay), scratch3(nlay), scratch3(nlay),
                        scratch3(nlay), scratch3(nlay),
                        scratch3(nlev), scratch3(nlev), scratch3(nlev)],
        interpret=interpret,
    )(*args)
    if band_width is not None:
        nbnd = ngpt // band_width
        nbpb = _BGPT // band_width
        # band-major (ngb, ncol_p, nbpb*nlev) -> (ncol, nlev, nbnd)
        unblk = lambda x: jnp.transpose(
            x.reshape(x.shape[0], x.shape[1], nbpb, nlev),
            (1, 3, 0, 2)).reshape(x.shape[1], nlev, -1)[:ncol, :, :nbnd]
        up, dn = unblk(up), unblk(dn)
    else:
        up, dn = up[:ncol], dn[:ncol]
    return (up, dn, jac[:ncol] if do_jacobians else None)


# ---------------------------------------------------------------------------
# True two-stream LW (Fu 1997 diffusivity + Toon sources + Shonk-Hogan
# adding), the rte_lw(use_2stream=True) path
# ---------------------------------------------------------------------------

def _lw2_kernel(tau_ref, ssa_ref, g_ref, lay_ref, lev_ref, emis_ref,
                ssrc_ref, inc_ref,
                up_ref, dn_ref,
                rdif_s, tdif_s, sdn_s, sup_s, alb_s, src_s, den_s,
                fup_s, fdn_s, *, nlay, band_width):
    gb = pl.program_id(1)
    dtype = tau_ref.dtype
    pi = jnp.asarray(np.pi, dtype)

    t = tau_ref[:, :, :]
    w0 = ssa_ref[:, :, :]
    asym = g_ref[:, :, :]

    # lw_two_stream (reference :854-909): LW diffusivity secant 1.66
    lw_diff_sec = jnp.asarray(1.66, dtype)
    g1 = lw_diff_sec * (1.0 - 0.5 * w0 * (1.0 + asym))
    g2 = lw_diff_sec * 0.5 * w0 * (1.0 - asym)
    k = jnp.sqrt(jnp.maximum((g1 - g2) * (g1 + g2),
                             jnp.asarray(1e-12, dtype)))
    e1 = jnp.exp(-t * k)
    e2 = e1 * e1
    rt = 1.0 / (k * (1.0 + e2) + g1 * (1.0 - e2))
    rdif = rt * g2 * (1.0 - e2)
    tdif = rt * 2.0 * k * e1
    rdif_s[:, :, :] = rdif
    tdif_s[:, :, :] = tdif

    # lw_source_2str (reference :917-967): Toon 89 linear-in-B, x pi
    # (the linear-in-B source uses level Plancks only; lay_ref is kept in
    # the signature for parity with the noscat kernel but never read)
    lev_top = lev_ref[:, :-1, :]
    lev_bot = lev_ref[:, 1:, :]
    safe = t * (g1 + g2)
    z = (lev_bot - lev_top) / jnp.where(safe > 0, safe, 1.0)
    thin = t <= jnp.asarray(1.0e-8, dtype)
    sup_s[:, :, :] = jnp.where(
        thin, 0.0, pi * ((z + lev_top) - rdif * (-z + lev_top)
                         - tdif * (z + lev_bot)))
    sdn_s[:, :, :] = jnp.where(
        thin, 0.0, pi * ((-z + lev_bot) - rdif * (z + lev_bot)
                         - tdif * (-z + lev_top)))

    emis = emis_ref[:, :]
    alb_s[:, nlay, :] = 1.0 - emis
    src_s[:, nlay, :] = pi * emis * ssrc_ref[:, :]

    # Shonk-Hogan adding (reference :1135-1245): bottom-up build
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

    jax.lax.fori_loop(0, nlay, up_build, 0)

    fdn_s[:, 0, :] = inc_ref[:, :]
    fup_s[:, 0, :] = inc_ref[:, :] * alb_s[:, 0, :] + src_s[:, 0, :]

    def dn_sweep(v, _):
        f = (tdif_s[:, v, :] * fdn_s[:, v, :]
             + rdif_s[:, v, :] * src_s[:, v + 1, :]
             + sdn_s[:, v, :]) * den_s[:, v, :]
        fdn_s[:, v + 1, :] = f
        fup_s[:, v + 1, :] = f * alb_s[:, v + 1, :] + src_s[:, v + 1, :]
        return 0

    jax.lax.fori_loop(0, nlay, dn_sweep, 0)

    if band_width is not None:
        # per-band lane-group sums written to static (band-major) slices
        nb = fup_s.shape[-1] // band_width
        nlev = fup_s.shape[1]
        for j in range(nb):
            sl = slice(j * band_width, (j + 1) * band_width)
            up_ref[0, :, j * nlev:(j + 1) * nlev] = jnp.sum(
                fup_s[:, :, sl], axis=-1)
            dn_ref[0, :, j * nlev:(j + 1) * nlev] = jnp.sum(
                fdn_s[:, :, sl], axis=-1)
    else:
        bb_up = jnp.sum(fup_s[:, :, :], axis=-1)
        bb_dn = jnp.sum(fdn_s[:, :, :], axis=-1)

        @pl.when(gb == 0)
        def _():
            up_ref[:, :] = bb_up
            dn_ref[:, :] = bb_dn

        @pl.when(gb != 0)
        def _():
            up_ref[:, :] += bb_up
            dn_ref[:, :] += bb_dn


def lw_two_stream_broadband_lane(tau, ssa, g, lay_source, lev_source,
                                 sfc_emis, sfc_src, inc_flux, *,
                                 band_width=None,
                                 interpret: bool = False):
    """Broadband (or byband) true two-stream LW fluxes (flux_up, flux_dn),
    (ncol, nlay+1[, nbnd]). Inputs top-at-index-0. Padded g-points carry
    tau=ssa=sources=inc=0, contributing exactly zero."""
    ncol, nlay, ngpt = tau.shape
    dtype = tau.dtype
    pc = (-ncol) % _BCOL
    pg = (-ngpt) % _BGPT

    pad3 = lambda x: jnp.pad(x, ((0, pc), (0, 0), (0, pg)))
    pad2 = lambda x: jnp.pad(x, ((0, pc), (0, pg)))

    ncol_p, ngpt_p = ncol + pc, ngpt + pg
    nlev = nlay + 1
    if band_width is not None and (band_width <= 0
                                   or _BGPT % band_width != 0
                                   or ngpt % band_width != 0):
        raise ValueError(f"band_width {band_width} must divide {_BGPT} "
                         f"and tile ngpt {ngpt}")

    kern = functools.partial(_lw2_kernel, nlay=nlay, band_width=band_width)
    v3 = lambda nl: pl.BlockSpec((_BCOL, nl, _BGPT), lambda c, b: (c, 0, b),
                                 memory_space=pltpu.VMEM)
    v2 = pl.BlockSpec((_BCOL, _BGPT), lambda c, b: (c, b),
                      memory_space=pltpu.VMEM)
    scratch3 = lambda nl: pltpu.VMEM((_BCOL, nl, _BGPT), dtype)

    if band_width is None:
        ospec = pl.BlockSpec((_BCOL, nlev), lambda c, b: (c, 0),
                             memory_space=pltpu.VMEM)
        oshape = jax.ShapeDtypeStruct((ncol_p, nlev), dtype)
    else:
        nbpb = _BGPT // band_width
        ngb = ngpt_p // _BGPT
        ospec = pl.BlockSpec((1, _BCOL, nbpb * nlev),
                             lambda c, b: (b, c, 0),
                             memory_space=pltpu.VMEM)
        oshape = jax.ShapeDtypeStruct((ngb, ncol_p, nbpb * nlev), dtype)

    up, dn = pl.pallas_call(
        kern,
        grid=(ncol_p // _BCOL, ngpt_p // _BGPT),
        in_specs=[v3(nlay), v3(nlay), v3(nlay), v3(nlay), v3(nlev),
                  v2, v2, v2],
        out_specs=[ospec, ospec],
        out_shape=[oshape] * 2,
        scratch_shapes=[scratch3(nlay), scratch3(nlay), scratch3(nlay),
                        scratch3(nlay), scratch3(nlev), scratch3(nlev),
                        scratch3(nlay), scratch3(nlev), scratch3(nlev)],
        interpret=interpret,
    )(pad3(tau), pad3(ssa), pad3(g), pad3(lay_source), pad3(lev_source),
      pad2(sfc_emis), pad2(sfc_src), pad2(inc_flux))
    if band_width is not None:
        nbnd = ngpt // band_width
        nbpb = _BGPT // band_width
        unblk = lambda x: jnp.transpose(
            x.reshape(x.shape[0], x.shape[1], nbpb, nlev),
            (1, 3, 0, 2)).reshape(x.shape[1], nlev, -1)[:ncol, :, :nbnd]
        return unblk(up), unblk(dn)
    return up[:ncol], dn[:ncol]
