"""The all-sky problem: the reference's benchmark configuration.

Re-implements examples/all-sky/rrtmgp_allsky.F90 as pure functions:
analytic RCE-like profiles, synthetic clouds (2/3 of columns, troposphere
only; reference compute_clouds :590-662) and MERRA aerosols (sulfate in
the lower stratosphere / dust in the lower troposphere in half the
columns; compute_aerosols :666-739), then the full pipeline per step:

  cloud optics -> aerosol optics -> gas optics -> increment
  -> LW rescaled no-scattering solve and/or SW two-stream solve.

``allsky_step_lw`` / ``allsky_step_sw`` are the flagship jit targets for
the benchmark and the multi-chip dry run.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import on_tpu as _cfg_on_tpu
from ..fluxes import Fluxes
from ..gas_concs import GasConcs
from ..optical_props import delta_scale, increment
from ..rte import rte_lw, rte_sw
from ..models.rrtmgp.aerosol_optics import (MERRA_AERO_DUST, MERRA_AERO_SULF,
                                            get_relhum)
from ..utils.profiles import allsky_profiles

__all__ = ["AllSkyInputs", "make_allsky_inputs", "allsky_step_lw",
           "allsky_step_sw", "allsky_step_lw_lanes", "allsky_step_sw_lanes"]


class AllSkyInputs(NamedTuple):
    play: jax.Array       # (ncol, nlay)
    plev: jax.Array       # (ncol, nlay+1)
    tlay: jax.Array
    tlev: jax.Array
    tsfc: jax.Array       # (ncol,)
    gas_concs: GasConcs
    lwp: jax.Array        # (ncol, nlay) cloud liquid water path [g/m2]
    iwp: jax.Array
    rel: jax.Array        # liquid effective radius [microns]
    dei: jax.Array        # ice effective diameter [microns]
    aero_type: jax.Array  # (ncol, nlay) int
    aero_size: jax.Array
    aero_mass: jax.Array
    relhum: jax.Array
    sfc_emis: jax.Array   # (ncol, 1)
    sfc_alb: jax.Array    # (ncol, 1)
    mu0: jax.Array        # (ncol,)


def make_allsky_inputs(ncol: int, nlay: int, *, cloud_optics=None,
                       dtype=jnp.float32) -> AllSkyInputs:
    """Build the all-sky problem (reference rrtmgp_allsky.F90 main program:
    analytic profiles :496-587, clouds :590-662, aerosols :666-739,
    emissivity 0.98 / albedo 0.06 / mu0 0.86)."""
    play, plev, tlay, tlev, gas = allsky_profiles(ncol, nlay)

    # clouds: troposphere (100-900 hPa), 2 of every 3 columns
    icol = np.arange(ncol)[:, None] + 1                    # 1-based like ref
    cloud_mask = (play > 100.0e2) & (play < 900.0e2) & ((icol % 3) != 0)
    lwp = np.where(cloud_mask & (tlay > 263.0), 10.0, 0.0)
    iwp = np.where(cloud_mask & (tlay < 273.0), 10.0, 0.0)
    if cloud_optics is not None:
        rel_val = 0.5 * (cloud_optics.radliq_lwr + cloud_optics.radliq_upr)
        dei_val = 0.5 * (cloud_optics.diamice_lwr + cloud_optics.diamice_upr)
    else:
        rel_val, dei_val = 10.0, 20.0  # SSM: arbitrary (reference :640-641)
    rel = np.where(lwp > 0.0, rel_val, 0.0)
    dei = np.where(iwp > 0.0, dei_val, 0.0)

    # aerosols: sulfate 50-100 hPa, dust 700-900 hPa, odd columns (1-based)
    is_even_col = (icol % 2) != 0
    is_sulf = (play > 50.0e2) & (play < 100.0e2) & is_even_col
    is_dust = (play > 700.0e2) & (play < 900.0e2) & is_even_col
    aero_type = np.where(is_sulf, MERRA_AERO_SULF,
                         np.where(is_dust, MERRA_AERO_DUST, 0))
    aero_size = np.where(is_sulf, 0.2, np.where(is_dust, 0.5, 0.0))
    aero_mass = np.where(is_sulf, 1.0e-6, np.where(is_dust, 3.0e-5, 0.0))
    vmr_h2o = np.asarray(gas.get_vmr("h2o", ncol, nlay))
    # stay on the host: no eager device round-trip during input building
    relhum = get_relhum(np.asarray(play), np.asarray(tlay), vmr_h2o)

    cast = lambda x: jnp.asarray(x, dtype)
    gas_cast = GasConcs(names=gas.names,
                        values=tuple(cast(val) for val in gas.values))
    return AllSkyInputs(
        play=cast(play), plev=cast(plev), tlay=cast(tlay), tlev=cast(tlev),
        tsfc=cast(tlay[:, -1] * 0 + 300.0),
        gas_concs=gas_cast,
        lwp=cast(lwp), iwp=cast(iwp), rel=cast(rel), dei=cast(dei),
        aero_type=jnp.asarray(aero_type, jnp.int32),
        aero_size=cast(aero_size), aero_mass=cast(aero_mass),
        relhum=cast(np.clip(relhum, 0.0, 1.0)),
        sfc_emis=cast(np.full((ncol, 1), 0.98)),
        sfc_alb=cast(np.full((ncol, 1), 0.06)),
        mu0=cast(np.full(ncol, 0.86)))


def _lanes_active() -> bool:
    """True when the Pallas lane pipeline should run (mirrors the
    use_pallas resolution in gas-optics providers)."""
    from ..config import get_config, on_tpu as _on_tpu
    cfg = get_config().use_pallas
    on_tpu = _on_tpu()
    return on_tpu if cfg is None else cfg


def _expand_bands(x, band_lims_gpt):
    """(nbnd, ...) -> (ngpt, ...) row repeat with static band widths (the
    lane-layout equivalent of the _bybnd expansion)."""
    lims = np.asarray(band_lims_gpt)
    widths = (lims[:, 1] - lims[:, 0] + 1).astype(np.int32)
    return jnp.repeat(x, jnp.asarray(widths), axis=0,
                      total_repeat_length=int(lims[-1, 1]))


def _aerosol_abs_lanes(inputs: AllSkyInputs, aerosol_optics):
    """By-band absorption-only aerosol increment in lane layout
    (nbnd, nlay, ncol) (reference aerosols%increment on the 1scl LW path,
    rrtmgp_allsky.F90:375)."""
    at, ats, _ = aerosol_optics.aerosol_optics_lanes(
        inputs.aero_type, inputs.aero_size, inputs.aero_mass, inputs.relhum)
    return at - ats


def _delta_scaled_band(t, ts, tsg, dtype):
    """(tau, tau*ssa, tau*ssa*g) by band -> delta-Eddington-scaled
    (tau, ssa, g) (identical formulas to optical_props.delta_scale with
    f = g^2, applied at band resolution)."""
    eps = jnp.finfo(dtype).eps
    tiny = jnp.finfo(dtype).tiny
    one = jnp.asarray(1.0, dtype)
    g = tsg / jnp.maximum(eps, ts)
    ssa = ts / jnp.maximum(eps, t)
    f = g * g
    wf = ssa * f
    return ((one - wf) * t,
            jnp.where(wf < one, (ssa - wf) / jnp.maximum(one - wf, tiny), 0.0),
            jnp.where(f < one, (g - f) / jnp.maximum(one - f, tiny), 0.0))


def _combine_band_2str(a, b, dtype):
    """Combine two by-band (tau, ssa, g) increments into one (the
    tau-weighted averaging of increment_2stream_by_2stream is associative,
    so incrementing gas optics with the combination equals sequential
    increments; reference rrtmgp_allsky.F90:394-399)."""
    if a is None:
        return b
    if b is None:
        return a
    tiny = jnp.finfo(dtype).tiny
    t = a[0] + b[0]
    tauscat = a[0] * a[1] + b[0] * b[1]
    g = (a[0] * a[1] * a[2] + b[0] * b[1] * b[2]) / jnp.maximum(tauscat, tiny)
    ssa = tauscat / jnp.maximum(t, tiny)
    return (t, jnp.where(t > 2.0 * tiny, ssa, 0.0),
            jnp.where(tauscat > 2.0 * tiny, g, 0.0))


def allsky_step_lw_lanes(inputs: AllSkyInputs, gas_optics, *,
                         cloud_optics=None, use_clouds=True,
                         aerosol_optics=None,
                         use_aerosols=False,
                         byband=False) -> Optional[Fluxes]:
    """Fused lane-layout LW step: gas optics, cloud + aerosol increments,
    and the no-scattering solve all in the gathers' native
    (ngpt, nlay, ncol) layout (see ops/pallas/solver_lanes.py). Returns
    None when the lane pipeline is unavailable and the caller must take
    the generic path."""
    from ..ops.pallas.solver_lanes import (lw_noscat_broadband_lanes,
                                           lw_noscat_broadband_lanes_pfrac)
    from ..ops.solver_lw import GAUSS_DS, GAUSS_WTS

    # mega-kernel eligibility: uniform band width, multiple of the 8-row
    # g-point block (production k-distributions: 16 gpt/band)
    lims = np.asarray(gas_optics.grid.band_lims_gpt_array)
    widths = lims[:, 1] - lims[:, 0] + 1
    w0 = int(widths[0])
    banded = bool((widths == w0).all() and w0 % 8 == 0)

    interpret0 = not _cfg_on_tpu()
    if banded and hasattr(gas_optics, "lw_fused_solve"):
        # grand fused path: gas optics + cloud increment + solve in one
        # kernel; spectral fields never touch HBM
        cld_abs0 = None
        if use_clouds and cloud_optics is not None:
            cld0 = cloud_optics.cloud_optics_lanes(
                inputs.lwp, inputs.iwp, inputs.rel, inputs.dei,
                interpret=interpret0)
            if cld0 is None:
                return None
            cld_abs0 = cld0[0] - cld0[1]
        if use_aerosols and aerosol_optics is not None:
            aer_abs0 = _aerosol_abs_lanes(inputs, aerosol_optics)
            cld_abs0 = (aer_abs0 if cld_abs0 is None
                        else cld_abs0 + aer_abs0)
        ncol0 = inputs.play.shape[0]
        emis0 = jnp.broadcast_to(inputs.sfc_emis[:, 0][None, :],
                                 (gas_optics.ngpt, ncol0))
        from ..ops.solver_lw import GAUSS_DS as _DS, GAUSS_WTS as _WT
        fused0 = gas_optics.lw_fused_solve(
            inputs.play, inputs.plev, inputs.tlay, inputs.tsfc,
            inputs.gas_concs, sfc_emis=emis0, tlev=inputs.tlev,
            cloud_tau_abs=cld_abs0, ds=_DS[0][0], weight=_WT[0][0],
            byband=byband)
        if fused0 is not None:
            # broadband (nlev, ncol) -> (ncol, nlev); byband
            # (nbnd, nlev, ncol) -> (ncol, nlev, nbnd)
            t = ((lambda x: jnp.transpose(x, (2, 1, 0))) if byband
                 else (lambda x: x.T))
            up0, dn0 = t(fused0[0]), t(fused0[1])
            return Fluxes(flux_up=up0, flux_dn=dn0, flux_net=dn0 - up0)
    if byband:
        return None      # byband is fused-path-only; caller falls back

    out = gas_optics.gas_optics_lw_lanes(
        inputs.play, inputs.plev, inputs.tlay, inputs.tsfc, inputs.gas_concs,
        tlev=inputs.tlev, banded_planck=banded)
    if out is None:
        return None
    if banded:
        tau, pfrac, (pb_sfc, pb_lay, pb_lev) = out
    else:
        tau, (sfc_src, lay_src, lev_src, _jac) = out
    interpret = not _cfg_on_tpu()
    cld_abs = None
    if use_clouds and cloud_optics is not None:
        cld = cloud_optics.cloud_optics_lanes(inputs.lwp, inputs.iwp,
                                              inputs.rel, inputs.dei,
                                              interpret=interpret)
        if cld is None:
            return None
        ct, cts, _ = cld
        # absorption-only increment: tau += (tau - tau*ssa) by band
        # (increment_1scalar_by_2stream + _bybnd expansion); the banded
        # mega-kernel adds it in-kernel instead
        cld_abs = ct - cts
    if use_aerosols and aerosol_optics is not None:
        aer_abs = _aerosol_abs_lanes(inputs, aerosol_optics)
        cld_abs = aer_abs if cld_abs is None else cld_abs + aer_abs
    if cld_abs is not None and not banded:
        tau = tau + _expand_bands(cld_abs,
                                  gas_optics.grid.band_lims_gpt_array)
    ngpt, _, ncol = tau.shape
    emis = jnp.broadcast_to(inputs.sfc_emis[:, 0][None, :], (ngpt, ncol))
    inc = jnp.zeros((ngpt, ncol), tau.dtype)
    if banded:
        up, dn = lw_noscat_broadband_lanes_pfrac(
            tau, pfrac, pb_lay, pb_lev, pb_sfc, emis, inc,
            ds=GAUSS_DS[0][0], weight=GAUSS_WTS[0][0], band_width=w0,
            cloud_tau_abs=cld_abs, interpret=interpret)
    else:
        up, dn, _ = lw_noscat_broadband_lanes(
            tau, lay_src, lev_src, emis, sfc_src, inc,
            ds=GAUSS_DS[0][0], weight=GAUSS_WTS[0][0], interpret=interpret)
    up, dn = up.T, dn.T
    return Fluxes(flux_up=up, flux_dn=dn, flux_net=dn - up)


def allsky_step_sw_lanes(inputs: AllSkyInputs, gas_optics, *,
                         cloud_optics=None, use_clouds=True,
                         aerosol_optics=None,
                         use_aerosols=False,
                         byband=False) -> Optional[Fluxes]:
    """Fused lane-layout SW step: gas optics + Rayleigh, delta-scaled
    cloud + aerosol increments, and the two-stream solve in lane layout."""
    from ..ops.pallas.solver_lanes import (
        sw_two_stream_broadband_lanes, sw_two_stream_broadband_lanes_combined)

    # mega-kernel eligibility: uniform band width, multiple of the 8-row
    # g-point block (production k-distributions: 16 gpt/band)
    lims = np.asarray(gas_optics.grid.band_lims_gpt_array)
    widths = lims[:, 1] - lims[:, 0] + 1
    w0 = int(widths[0])
    banded = bool((widths == w0).all() and w0 % 8 == 0)

    interpret = not _cfg_on_tpu()
    dtype = inputs.play.dtype
    tiny = jnp.finfo(dtype).tiny
    if banded and hasattr(gas_optics, "sw_fused_solve"):
        # grand fused path: gas optics + Rayleigh + cloud increment +
        # two-stream solve in one kernel
        cld_b = None
        if use_clouds and cloud_optics is not None:
            cld0 = cloud_optics.cloud_optics_lanes(
                inputs.lwp, inputs.iwp, inputs.rel, inputs.dei,
                interpret=interpret)
            if cld0 is None:
                return None
            cld_b = _delta_scaled_band(*cld0, dtype)
        if use_aerosols and aerosol_optics is not None:
            aer0 = aerosol_optics.aerosol_optics_lanes(
                inputs.aero_type, inputs.aero_size, inputs.aero_mass,
                inputs.relhum)
            cld_b = _combine_band_2str(cld_b, _delta_scaled_band(*aer0, dtype),
                                       dtype)
        ncol0 = inputs.play.shape[0]
        nlay0 = inputs.play.shape[1]
        mu0_0 = jnp.broadcast_to(jnp.asarray(inputs.mu0, dtype)[None, :],
                                 (nlay0, ncol0))
        alb0 = jnp.broadcast_to(inputs.sfc_alb[:, 0][None, :],
                                (gas_optics.ngpt, ncol0))
        fused0 = gas_optics.sw_fused_solve(
            inputs.play, inputs.plev, inputs.tlay, inputs.gas_concs,
            mu0=mu0_0, sfc_alb_dir=alb0, sfc_alb_dif=alb0, cloud=cld_b,
            byband=byband)
        if fused0 is not None:
            t = ((lambda x: jnp.transpose(x, (2, 1, 0))) if byband
                 else (lambda x: x.T))
            up0, dn0, dir0 = t(fused0[0]), t(fused0[1]), t(fused0[2])
            return Fluxes(flux_up=up0, flux_dn=dn0, flux_net=dn0 - up0,
                          flux_dn_dir=dir0)
    if byband:
        return None      # byband is fused-path-only; caller falls back

    out = gas_optics.gas_optics_sw_lanes(
        inputs.play, inputs.plev, inputs.tlay, inputs.gas_concs,
        split_rayleigh=banded)
    if out is None:
        return None
    tau, ssa_or_ray, toa = out
    cld_banded = None
    if use_clouds and cloud_optics is not None:
        cld = cloud_optics.cloud_optics_lanes(inputs.lwp, inputs.iwp,
                                              inputs.rel, inputs.dei,
                                              interpret=interpret)
        if cld is None:
            return None
        cld_banded = _delta_scaled_band(*cld, dtype)
    if use_aerosols and aerosol_optics is not None:
        aer = aerosol_optics.aerosol_optics_lanes(
            inputs.aero_type, inputs.aero_size, inputs.aero_mass,
            inputs.relhum)
        cld_banded = _combine_band_2str(cld_banded,
                                        _delta_scaled_band(*aer, dtype),
                                        dtype)
    ngpt, nlay, ncol = tau.shape
    mu0 = jnp.broadcast_to(jnp.asarray(inputs.mu0, dtype)[None, :],
                           (nlay, ncol))
    alb = jnp.broadcast_to(inputs.sfc_alb[:, 0][None, :], (ngpt, ncol))
    if banded:
        # mega-kernel: Rayleigh combine + cloud increment in-solver
        up, dn, fdir = sw_two_stream_broadband_lanes_combined(
            tau, ssa_or_ray, cld_banded, mu0, alb, alb, toa,
            band_width=w0, interpret=interpret)
    else:
        ssa = ssa_or_ray
        g = jnp.zeros_like(tau)
        if cld_banded is not None:
            # 2str += 2str by band (increment_2stream_by_2stream + _bybnd)
            blims = gas_optics.grid.band_lims_gpt_array
            o_tau = _expand_bands(cld_banded[0], blims)
            o_ssa = _expand_bands(cld_banded[1], blims)
            o_g = _expand_bands(cld_banded[2], blims)
            tau12 = tau + o_tau
            tauscat12 = tau * ssa + o_tau * o_ssa
            g12 = (tau * ssa * g + o_tau * o_ssa * o_g) \
                / jnp.maximum(tauscat12, tiny)
            ssa12 = tauscat12 / jnp.maximum(tau12, tiny)
            g = jnp.where(tauscat12 > 2.0 * tiny, g12, g)
            ssa = jnp.where(tau12 > 2.0 * tiny, ssa12, ssa)
            tau = tau12
        up, dn, fdir = sw_two_stream_broadband_lanes(
            tau, ssa, g, mu0, alb, alb, toa, interpret=interpret)
    up, dn, fdir = up.T, dn.T, fdir.T
    return Fluxes(flux_up=up, flux_dn=dn, flux_net=dn - up,
                  flux_dn_dir=fdir)


def allsky_step_lw(inputs: AllSkyInputs, gas_optics, *, cloud_optics=None,
                   aerosol_optics=None, use_clouds=True,
                   use_aerosols=False, byband=False) -> Fluxes:
    """One LW all-sky step (reference timed loop :368-380): cloud optics
    (absorption-only), aerosol optics, gas optics + Planck sources,
    increments, rescaled no-scattering solve with broadband output."""
    if (_lanes_active()
            and (cloud_optics is not None or not use_clouds)
            and (aerosol_optics is not None or not use_aerosols)
            and hasattr(gas_optics, "gas_optics_lw_lanes")):
        fused = allsky_step_lw_lanes(inputs, gas_optics,
                                     cloud_optics=cloud_optics,
                                     use_clouds=use_clouds,
                                     aerosol_optics=aerosol_optics,
                                     use_aerosols=use_aerosols,
                                     byband=byband)
        if fused is not None:
            return fused
    props, sources = gas_optics.gas_optics_lw(
        inputs.play, inputs.plev, inputs.tlay, inputs.tsfc, inputs.gas_concs,
        tlev=inputs.tlev, top_at_1=True)
    if use_clouds:
        if cloud_optics is not None:
            clouds = cloud_optics.cloud_optics(inputs.lwp, inputs.iwp,
                                               inputs.rel, inputs.dei,
                                               scattering=False)
        else:  # SSM gray clouds
            clouds = gas_optics.cloud_optics(inputs.lwp * 1e-3,
                                             inputs.iwp * 1e-3,
                                             scattering=False)
        props = increment(props, clouds)
    if use_aerosols and aerosol_optics is not None:
        aer = aerosol_optics.aerosol_optics(inputs.aero_type, inputs.aero_size,
                                            inputs.aero_mass, inputs.relhum,
                                            scattering=False)
        props = increment(props, aer)
    return rte_lw(props, sources, inputs.sfc_emis, byband=byband)


def allsky_step_sw(inputs: AllSkyInputs, gas_optics, *, cloud_optics=None,
                   aerosol_optics=None, use_clouds=True,
                   use_aerosols=False, byband=False) -> Fluxes:
    """One SW all-sky step (reference :388-404): two-stream clouds are
    delta-scaled before incrementing the gas optics."""
    if (_lanes_active()
            and (cloud_optics is not None or not use_clouds)
            and (aerosol_optics is not None or not use_aerosols)
            and hasattr(gas_optics, "gas_optics_sw_lanes")):
        fused = allsky_step_sw_lanes(inputs, gas_optics,
                                     cloud_optics=cloud_optics,
                                     use_clouds=use_clouds,
                                     aerosol_optics=aerosol_optics,
                                     use_aerosols=use_aerosols,
                                     byband=byband)
        if fused is not None:
            return fused
    props, toa = gas_optics.gas_optics_sw(
        inputs.play, inputs.plev, inputs.tlay, inputs.gas_concs, top_at_1=True)
    if use_clouds:
        if cloud_optics is not None:
            clouds = cloud_optics.cloud_optics(inputs.lwp, inputs.iwp,
                                               inputs.rel, inputs.dei)
        else:
            clouds = gas_optics.cloud_optics(inputs.lwp * 1e-3,
                                             inputs.iwp * 1e-3)
        props = increment(props, delta_scale(clouds))
    if use_aerosols and aerosol_optics is not None:
        aer = aerosol_optics.aerosol_optics(inputs.aero_type, inputs.aero_size,
                                            inputs.aero_mass, inputs.relhum)
        props = increment(props, delta_scale(aer))
    return rte_sw(props, inputs.mu0, toa, inputs.sfc_alb, inputs.sfc_alb,
                  byband=byband)
