"""The grand fused LW kernel: RRTMGP gas optics AND the no-scattering
transport solve in ONE Pallas TPU kernel.

Per (column-block, band) grid step, entirely in VMEM:
  - major-gas 3-D table interpolation per layer (the lane-gather design
    of major_gather.py, pressure-uniform fast path included), with the
    Planck fraction packed behind kmajor in the same gathers,
  - minor-gas contributions for the band's g-point windows (the
    lane-gather design of minor_gather.py, tables VMEM-resident),
  - the by-band absorption cloud increment,
  - Planck lay/lev/sfc sources from pfrac and per-band Planck values,
  - the downward/upward transport recurrences,
  - the broadband reduction, accumulated across bands.

The (ngpt, nlay, ncol) spectral fields NEVER touch HBM — on a 4096x72
case that removes ~1.2 GB of traffic per LW step.
Reference numerics: gas_optical_depths_major/minor + compute_Planck_source
+ lw_solver_noscat_oneangle (rrtmgp/kernels/mo_gas_optics_rrtmgp_kernels
.F90:345-501, :568-710; rte/kernels/mo_rte_solver_kernels.F90:51-240).

Performance structure (docs/PERFORMANCE.md):
  - scratches are LAYER-MAJOR (nlay, w, 128): every per-layer access in
    the build/minor/transport loops is a contiguous 2-VREG tile slice
    (the (w, nlay, 128) layout made each one w strided single-sublane
    accesses; 18.5 -> 16.7 ms standalone),
  - per-(block, layer) pressure-window base/uniformity AND the fpress
    scalar/uniformity are precomputed into SMEM,
  - fp-uniform fast path: when fpress is constant across the 128-column
    block at a layer (shared pressure grids, incl. the reference's own
    all-sky benchmark), the two pressure levels of the slab are
    pre-lerped by the scalar fp BEFORE the eta/temp gathers — gathered
    rows halve (256 -> 128 per layer), exactly (the trilinear interp is
    linear in table values); 16.7 -> 15.5 ms standalone.

Eligibility (caller falls back to the staged lane pipeline otherwise):
uniform band width, layer-major cells, pressure window within PSPAN,
all lane tables present.
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
from . import solver_lanes as _sl

__all__ = ["lw_fused_gas_optics_solve"]


def planck_band_pair(t, tot_ref, *, tp_min, tp_delta, ntot, nrow_t):
    """(value, d value/d t) of the band-b in-kernel totplnk lerp: the
    reference interpolate1D (kernels :715-737), folded in-kernel. The
    totplnk temperature domain rides the 128-lane axis of tot_ref in
    ``nrow_t`` row groups; the lookup is a per-element cross-lane gather
    + row-group select. t (rows, _BC) -> (rows, _BC). Matches the XLA
    planck_bands_lanes numerics exactly (same f32 ops). ONE definition
    shared by the forward kernel (value) and the adjoint kernel
    (fused_lw_bwd.py, value + derivative) so the backward's lookup can
    never drift from the forward it differentiates; the unused
    derivative is dead-code-eliminated in the forward."""
    if t.shape[0] == 1:
        # Mosaic's gather lowering rejects (1, n) operands: jnp
        # take_along_axis treats the size-1 batch dim as broadcast,
        # so the indices rank no longer matches the strict 2-D rule
        # (lowering.py _gather_lowering_rule). Gather on a full
        # 8-sublane tile and slice the row back out.
        v, d = planck_band_pair(jnp.broadcast_to(t, (8,) + t.shape[1:]),
                                tot_ref, tp_min=tp_min, tp_delta=tp_delta,
                                ntot=ntot, nrow_t=nrow_t)
        return v[:1], d[:1]
    val0 = (t - tp_min) / tp_delta
    frac = val0 - jnp.trunc(val0)
    idx = jnp.clip(val0.astype(jnp.int32), 0, ntot - 2)

    def take(ix):
        lane = jax.lax.rem(ix, jnp.asarray(128, ix.dtype))
        acc = jnp.zeros_like(t)
        for r in range(nrow_t):
            src = jnp.broadcast_to(tot_ref[0, r, :][None, :], t.shape)
            g = jnp.take_along_axis(src, lane, axis=1)
            acc = acc + jnp.where(ix // 128 == r, g, jnp.zeros_like(g))
        return acc

    lo = take(idx)
    hi = take(idx + 1)
    return lo + frac * (hi - lo), (hi - lo) / tp_delta


def _fused_lw_kernel(dsw_ref, flav_ref, jpin_ref, fpin_ref, desc_ref,
                     msc_ref, tab_ref, mtab_lo_ref, mtab_up_ref,
                     tlay_ref, tlev_ref, tsfc_ref, tot_ref,
                     cld_ref, emis_ref, inc_ref,
                     up_ref, dn_ref,
                     tau_s, pf_s, sdn_s, sup_s, rdn_s, rup_s, *,
                     nlay, w, pspan, band_minors, ncont_lo, nflav,
                     with_cloud, ntot, nrow_t, byband=False):
    b = pl.program_id(1)
    dtype = tau_s.dtype
    eps = np.finfo(np.float32).eps
    tiny = jnp.asarray(np.finfo(np.float32).tiny, dtype)
    tau_thresh = jnp.asarray(np.sqrt(np.sqrt(eps)), dtype)
    ds = dsw_ref[0]
    piw = jnp.asarray(np.pi, dtype) * dsw_ref[1]
    tp_min = dsw_ref[2]
    tp_delta = dsw_ref[3]

    def planck_band(t):
        return planck_band_pair(t, tot_ref, tp_min=tp_min,
                                tp_delta=tp_delta, ntot=ntot,
                                nrow_t=nrow_t)[0]
    ntw = 2 * w     # [tau rows, planck rows] payload
    # desc rows: [fp, jp, tropo, ft0, ft1, te(2*nflav), fe(2*nflav),
    # cm(2*nflav), tr(2*nflav)] — flavor rows selected at runtime via the
    # SMEM band->flavor table; tr is the minor-domain row index
    # (jt+it)*(neta-1)+jeta, which the minor windows read directly
    TE0, FE0, CM0 = 5, 5 + 2 * nflav, 5 + 4 * nflav
    TR0 = 5 + 6 * nflav
    flo = flav_ref[2 * b]
    fhi = flav_ref[2 * b + 1]

    # ---- per-layer gas optics: major (+pfrac) lookups ----
    def build_layer(l, _):
        fp = desc_ref[0, l, :][None, :]
        tropo = desc_ref[2, l, :]
        # per-(block, layer) pressure-window base + uniformity and the
        # fpress scalar + uniformity, precomputed outside the kernel
        # into SMEM (the in-kernel cross-lane min/max reductions cost
        # ~30% of the kernel)
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

    # minor gases: each band's (statically clipped) g-point windows — one
    # predicated layer loop per band, so the hot major loop above stays
    # branch-free. The accumulation structure lives in
    # fused_minors.minor_pass (shared with the SW kernel;
    # mode-selectable — see its docstring).
    for bi, members in enumerate(band_minors):
        if not members:
            continue

        @pl.when(b == bi)
        def _(members=members):
            minor_pass(tau_s, desc_ref, msc_ref, mtab_lo_ref, mtab_up_ref,
                       jpin_ref, members, nlay=nlay, w=w,
                       ncont_lo=ncont_lo, TR0=TR0, FE0=FE0, dtype=dtype)

    # ---- cloud increment (absorption-only, by band) ----
    tau = tau_s[:, :, :]
    if with_cloud:
        tau = tau + cld_ref[0, :, :][:, None, :]

    # ---- Planck sources from pfrac + band Planck values ----
    pf = pf_s[:, :, :]
    pb_lay = planck_band(tlay_ref[:, :])[:, None, :]
    pb_lev = planck_band(tlev_ref[:, :])[:, None, :]
    lay = pf * pb_lay
    pf_in = jnp.sqrt(pf[1:, :, :] * pf[:-1, :, :])
    lev_top = jnp.concatenate([pf[:1, :, :], pf_in], axis=0) \
        * pb_lev[:-1, :, :]
    lev_bot = jnp.concatenate([pf_in, pf[-1:, :, :]], axis=0) \
        * pb_lev[1:, :, :]

    # ---- transport (reference :51-240, :620-745) ----
    tl = tau * ds
    trans = jnp.exp(-tl)
    tau_s[:, :, :] = trans                 # reuse as the trans scratch
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

    _sl._loop(nlay, down)

    emis = emis_ref[0, :, :]
    sfc_src = pf[nlay - 1, :, :] * planck_band(tsfc_ref[:, :])
    rup_s[nlay, :, :] = (rdn_s[nlay, :, :] * (1.0 - emis) + emis * sfc_src)

    def up(i, _):
        v = nlay - 1 - i
        rup_s[v, :, :] = (tau_s[v, :, :] * rup_s[v + 1, :, :]
                          + sup_s[v, :, :])
        return 0

    _sl._loop(nlay, up)

    bb_up = piw * jnp.sum(rup_s[:, :, :], axis=1)
    bb_dn = piw * jnp.sum(rdn_s[:, :, :], axis=1)

    if byband:
        # each band IS a grid step: write its own (nlev, ncol) slice
        # (reference ty_fluxes_byband, mo_fluxes_byband.F90:159-219)
        up_ref[0, :, :] = bb_up
        dn_ref[0, :, :] = bb_dn
    else:
        @pl.when(b == 0)
        def _():
            up_ref[:, :] = bb_up
            dn_ref[:, :] = bb_dn

        @pl.when(b != 0)
        def _():
            up_ref[:, :] += bb_up
            dn_ref[:, :] += bb_dn


def lw_fused_gas_optics_solve(flav, desc, msc, table_lane,
                              mtab_lo, mtab_up, tlay, tlev, tsfc,
                              totplnk, emis, inc, *, ds, weight,
                              tp_min, tp_delta, nbnd, w, nlay, ncol,
                              nflav, band_minors, cloud_tau_abs=None,
                              byband: bool = False,
                              interpret: bool = False):
    """Run the fused gas-optics + LW solve. All per-cell descriptor arrays
    arrive reshaped (rows, nlay, ncol) layer-major; see the builder in
    ops/gas_optics_pallas.lw_fused_lanes for their exact contents.
    flav: (2*nbnd,) int32 per-band (flavor_lower, flavor_upper) SMEM table.
    tlay (nlay, ncol) / tlev (nlay+1, ncol) / tsfc (ncol,): temperatures —
    the band Planck values are interpolated from ``totplnk`` (ntot, nbnd)
    IN-KERNEL (grid offset tp_min, spacing tp_delta), so no per-band
    Planck fields cross HBM.
    Returns (flux_up, flux_dn), each (nlay+1, ncol) top at index 0, or
    (nbnd, nlay+1, ncol) per-band sums with ``byband``."""
    dtype = desc.dtype
    ntot = totplnk.shape[0]
    nrow_t = (ntot + 127) // 128
    # totplnk temperature domain on the 128-lane axis, per band
    tot_lane = jnp.pad(totplnk.astype(dtype),
                       ((0, nrow_t * 128 - ntot), (0, 0))
                       ).T.reshape(nbnd, nrow_t, 128)
    tsfc = jnp.asarray(tsfc, dtype).reshape(1, -1)
    pc = (-ncol) % _BC
    padc = lambda x: jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pc)])
    # edge-pad the descriptor columns: padded lanes share a 128-lane group
    # with real cells, and a zero-padded jp row would blow the pressure
    # window for the real lanes
    padc_e = lambda x: (x if pc == 0 else jnp.pad(
        x, [(0, 0)] * (x.ndim - 1) + [(0, pc)], mode="edge"))
    ncol_p = ncol + pc
    nlev = nlay + 1
    with_cloud = cloud_tau_abs is not None
    cld = (cloud_tau_abs if with_cloud
           else jnp.zeros((1, nlay, ncol), dtype))
    dsw = jnp.stack([jnp.asarray(ds, dtype).reshape(()),
                     jnp.asarray(weight, dtype).reshape(()),
                     jnp.asarray(tp_min, dtype).reshape(()),
                     jnp.asarray(tp_delta, dtype).reshape(())])

    desc_p = padc_e(desc)
    # per-(column-block, layer) pressure-window base index + uniform flag,
    # and the fpress scalar + uniform flag, precomputed here (cheap in
    # XLA) so the kernel's layer loop does no cross-lane reductions
    jpin, fpin = block_pressure_codes(desc_p, nlay=nlay)

    kern = functools.partial(
        _fused_lw_kernel, nlay=nlay, w=w, pspan=PSPAN,
        band_minors=band_minors, ncont_lo=mtab_lo.shape[0] // 2,
        nflav=nflav, with_cloud=with_cloud, ntot=ntot, nrow_t=nrow_t,
        byband=byband)

    cb_rows = lambda a: pl.BlockSpec(
        (a.shape[0], nlay, _BC), lambda c, b: (0, 0, c),
        memory_space=pltpu.VMEM)
    resident = lambda a: pl.BlockSpec(a.shape, lambda c, b: (0,) * a.ndim,
                                      memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    smem_cl = lambda r: pl.BlockSpec((1, r, nlay), lambda c, b: (c, 0, 0),
                                     memory_space=pltpu.SMEM)
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

    up, dn = pl.pallas_call(
        kern,
        grid=(ncol_p // _BC, nbnd),
        in_specs=[
            smem, smem, smem_cl(3), smem_cl(2),
            cb_rows(desc), cb_rows(msc),
            # whole major table VMEM-resident (fetched ONCE per launch):
            # a per-band block with the band grid dimension innermost
            # would re-fetch ~2 MB on EVERY grid step (~1 GB/step)
            resident(table_lane),
            resident(mtab_lo), resident(mtab_up),
            pl.BlockSpec((nlay, _BC), lambda c, b: (0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nlev, _BC), lambda c, b: (0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _BC), lambda c, b: (0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nrow_t, 128), lambda c, b: (b, 0, 0),
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
        out_shape=[oshape] * 2,
        scratch_shapes=[scr(nlay), scr(nlay), scr(nlay), scr(nlay),
                        scr(nlev), scr(nlev)],
        # the per-column-block descriptor blocks (minor idx/weights/
        # scaling) are large and double-buffered; the default 16 MB
        # scoped-vmem budget is too small (physical VMEM is 128 MB)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(dsw, flav, jpin, fpin, desc_p, padc(msc),
      table_lane, mtab_lo, mtab_up, padc(jnp.asarray(tlay, dtype)),
      padc(jnp.asarray(tlev, dtype)), padc(tsfc), tot_lane,
      padc(cld), padc(emis), padc(inc))
    if byband:
        return up[:, :, :ncol], dn[:, :, :ncol]
    return up[:, :ncol], dn[:, :ncol]
