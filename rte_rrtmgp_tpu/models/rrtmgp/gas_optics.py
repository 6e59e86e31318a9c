"""RRTMGP gas-optics front end.

Equivalent of reference ``ty_gas_optics_rrtmgp``'s run-time methods
(rrtmgp/frontend/mo_gas_optics_rrtmgp.F90): ``gas_optics_int`` (:220-331),
``gas_optics_ext`` (:337-414), ``compute_gas_taus`` (:419-745),
``source`` (:840-928), ``compute_optimal_angles`` (:1503-1562), and
``combine_abs_and_rayleigh`` (:1954-2036) — as pure functions over a
:class:`~rte_rrtmgp_tpu.models.rrtmgp.kdist.KDist`.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ... import constants
from ...gas_concs import GasConcs
from ...optical_props import OpticalProps, OpticalProps1scl, OpticalProps2str
from ...sources import SourcesLW
from ...config import get_config, on_tpu as _on_tpu
from ...ops.gas_optics import (InterpCoeffs, interpolation,
                               planck_bands_lanes, planck_sources,
                               planck_sources_lanes, tau_major, tau_minor,
                               tau_rayleigh)
from ...ops.gas_optics_pallas import (lane_gather_ok,
                                      pressure_window_ok_from_play,
                                      tau_major_pallas, tau_minor_pallas,
                                      tau_rayleigh_pallas)
from ..base import infer_top_at_1
from .kdist import KDist

__all__ = ["GasOpticsRRTMGP", "get_col_dry"]


# the custom-VJP bridge lives in ops/pallas/autodiff; imported under
# the established private name for the call sites below
from ...ops.pallas.autodiff import with_xla_grad as _with_xla_grad


def _uniform_band_width_checked(kd, byband: bool):
    """Band width for the fused XLA references' by-band grouping. The
    fused tier is only dispatched for uniform-band k-distributions (the
    Pallas eligibility checks widths explicitly), but the XLA reference
    formulation would otherwise silently mis-group a ragged grid whose
    ngpt happens to divide by nband — check instead of assume."""
    bands = np.asarray(kd.grid.band_lims_gpt_array)
    widths = bands[:, 1] - bands[:, 0] + 1
    if byband and not (widths == widths[0]).all():
        raise ValueError(
            "fused by-band path requires uniform band widths; got "
            f"{widths.tolist()}")
    return int(widths[0])


def _shared_pgrid(play) -> bool:
    """True when every column shares one pressure profile (concrete
    values only) — the eager eligibility for the fused adjoint kernels
    (uniform per-(block, layer) pressure windows are then guaranteed)."""
    try:
        arr = np.asarray(play)           # raises on traced values
    except Exception:
        return False
    return bool(np.all(arr == arr[:1]))


def get_col_dry(vmr_h2o, plev):
    """Number of dry-air molecules per cm^2 per layer (reference
    ``get_layer_number``, rte/kernels/mo_gas_optics_utils.F90:127-152)."""
    delta_plev = jnp.abs(plev[:, :-1] - plev[:, 1:])
    fact = 1.0 / (1.0 + vmr_h2o)
    m_air = (constants.m_dry + constants.m_h2o * vmr_h2o) * fact
    return (10.0 * delta_plev * constants.avogad * fact
            / (1000.0 * m_air * 100.0 * constants.grav))


class GasOpticsRRTMGP:
    """Callable gas-optics provider wrapping a loaded :class:`KDist`."""

    def __init__(self, kdist: KDist):
        self.kdist = kdist
        self.grid = kdist.grid

    # -------------- inquiry (reference :1431-1498) --------------
    def source_is_internal(self) -> bool:
        return self.kdist.source_is_internal()

    def source_is_external(self) -> bool:
        return self.kdist.source_is_external()

    def press_min(self): return self.kdist.press_ref_min
    def press_max(self): return self.kdist.press_ref_max
    def temp_min(self): return self.kdist.temp_ref_min
    def temp_max(self): return self.kdist.temp_ref_max

    @property
    def ngpt(self): return self.kdist.ngpt

    # ------------------------------------------------------------------
    def _check_key_species_present(self, gas_concs: GasConcs):
        """Reference check_key_species_present (:1403-1422)."""
        kd = self.kdist
        key = set()
        for pair in kd.flavor.T:
            for g in pair:
                if g > 0:
                    key.add(kd.gas_names[g - 1])
        missing = sorted(g for g in key if g not in gas_concs)
        if missing:
            raise ValueError(f"gas_optics: required gases {missing} are not provided")

    def _col_gas(self, play, plev, tlay, gas_concs: GasConcs, col_dry):
        """VMR gather + column amounts (reference compute_gas_taus
        :538-609): col_gas[0] = col_dry, col_gas[i] = vmr_i * col_dry.
        Layout (ngas+1, ncol, nlay): the small gas axis leads so TPU tiled
        layouts pad only the trailing (ncol, nlay) axes."""
        kd = self.kdist
        ncol, nlay = play.shape
        dtype = play.dtype
        vmrs = []
        for g in kd.gas_names:
            if g in gas_concs:
                vmrs.append(gas_concs.get_vmr(g, ncol, nlay).astype(dtype))
            else:
                vmrs.append(jnp.zeros((ncol, nlay), dtype))
        idx_h2o = kd.idx_gas("h2o")
        if col_dry is None:
            vmr_h2o = vmrs[idx_h2o - 1] if idx_h2o > 0 else jnp.zeros_like(play)
            col_dry = get_col_dry(vmr_h2o, plev)
        col_dry = jnp.asarray(col_dry, dtype)
        if idx_h2o < 0:
            # h2o absent from the k-distribution: every consumer of
            # idx_h2o (minor-gas dry_fact, Rayleigh scaling) needs the
            # water-vapor COLUMN, which is zero — point it at an explicit
            # zeros row rather than letting Python's negative indexing
            # silently select the last gas
            vmrs = vmrs + [jnp.zeros((ncol, nlay), dtype)]
            idx_h2o = len(vmrs)
        col_gas = jnp.stack([col_dry] + [v * col_dry for v in vmrs], axis=0)
        return col_gas, col_dry, idx_h2o

    def _interp(self, play, tlay, col_gas) -> InterpCoeffs:
        kd = self.kdist
        return interpolation(
            play, tlay, col_gas,
            flavor_gas1=kd.flavor[0], flavor_gas2=kd.flavor[1],
            neta=kd.neta,
            press_ref_log=kd.press_ref_log, temp_ref=kd.temp_ref,
            press_ref_log_delta=kd.press_ref_log_delta,
            temp_ref_min=kd.temp_ref_min, temp_ref_delta=kd.temp_ref_delta,
            press_ref_trop_log=kd.press_ref_trop_log, vmr_ref=kd.vmr_ref)

    def _compute_taus(self, play, plev, tlay, gas_concs, col_dry, top_at_1,
                      scattering: bool, raw_lanes: bool = False,
                      split_rayleigh: bool = False):
        """compute_gas_taus with autodiff support on the Pallas path.

        When the Pallas lane-gather kernels would run (opaque to JAX AD),
        the computation is wrapped in the custom-VJP bridge: the backward
        pass re-traces the SAME implementation with Pallas forced off, so
        jax.grad through gas_optics_lw/gas_optics_sw works regardless of
        the kernel tier. In that case the returned ``coeffs`` slot is
        None (interpolation state does not cross the AD boundary; no
        caller consumes it). The ``raw_lanes`` lane-layout contract is
        unchanged (the grand-fused path has its own VJP in
        lw_fused_solve/sw_fused_solve)."""
        if raw_lanes:
            return self._compute_taus_impl(
                play, plev, tlay, gas_concs, col_dry, top_at_1, scattering,
                raw_lanes=True, split_rayleigh=split_rayleigh)
        kd = self.kdist
        cfg = get_config().use_pallas
        # engage the AD bridge if ANY lane kernel could run inside the
        # impl (minor/rayleigh lane kernels dispatch independently of the
        # major table, e.g. for ragged band widths where kmajor_lane is
        # None) — otherwise jax.grad would hit an opaque pallas_call
        any_lane = any(t is not None for t in
                       (kd.kmajor_lane, kd.kminor_lower_lane,
                        kd.kminor_upper_lane, kd.krayl_lane))
        pallas_engaged = (lane_gather_ok(kd.temp_ref.shape[0], kd.neta - 1)
                          and (_on_tpu() if cfg is None else cfg)
                          and any_lane)
        if not pallas_engaged:
            return self._compute_taus_impl(play, plev, tlay, gas_concs,
                                           col_dry, top_at_1, scattering)

        play = jnp.asarray(play)
        plev = jnp.asarray(plev)
        tlay = jnp.asarray(tlay)

        def arm(play, plev, tlay, gas_concs, col_dry):
            props, _, pfrac = self._compute_taus_impl(
                play, plev, tlay, gas_concs, col_dry, top_at_1, scattering)
            return props.tau, (props.ssa if scattering else None), pfrac

        tau, ssa, pfrac = _with_xla_grad(arm, arm, play, plev, tlay,
                                         gas_concs, col_dry)
        if scattering:
            props = OpticalProps2str(tau=tau, ssa=ssa,
                                     g=jnp.zeros_like(tau),
                                     grid=self.grid, top_at_1=top_at_1)
        else:
            props = OpticalProps1scl(tau=tau, grid=self.grid,
                                     top_at_1=top_at_1)
        return props, None, pfrac

    def _compute_taus_impl(self, play, plev, tlay, gas_concs, col_dry,
                           top_at_1, scattering: bool,
                           raw_lanes: bool = False,
                           split_rayleigh: bool = False):
        """compute_gas_taus equivalent: absorption (+ Rayleigh) optical
        depths and the interpolation coefficients for the source function.

        With ``raw_lanes`` the result stays in the Pallas gathers' native
        lane layout — returns (tau (ngpt, nlay, ncol), ssa_or_None, pfrac)
        with no (ncol, nlay, ngpt) transposes — or None when the lane
        pipeline is unavailable (caller falls back)."""
        kd = self.kdist
        self._check_key_species_present(gas_concs)
        col_gas, col_dry_w, idx_h2o = self._col_gas(play, plev, tlay,
                                                    gas_concs, col_dry)

        # Pallas lane-gather kernels for the table lookups: auto on TPU
        # when the row domains fit; forced via config.
        on_tpu = _on_tpu()
        cfg_pallas = get_config().use_pallas
        use_pallas = (lane_gather_ok(kd.temp_ref.shape[0], kd.neta - 1)
                      and (on_tpu if cfg_pallas is None else cfg_pallas))
        interpret = not on_tpu
        ntemp_k, netam1_k = kd.temp_ref.shape[0], kd.neta - 1

        use_major = use_pallas and kd.kmajor_lane is not None
        poison = None
        if use_major and not isinstance(play, jax.core.Tracer):
            # eager guard of the major kernel's block pressure-window
            # assumption, from concrete pressures (pre-interpolation)
            from ...ops.pallas.major_gather import PSPAN
            use_major = pressure_window_ok_from_play(
                play, press_ref_log=kd.press_ref_log,
                press_ref_log_delta=kd.press_ref_log_delta,
                press_ref_trop_log=kd.press_ref_trop_log, pspan=PSPAN)
        elif use_major and not get_config().assume_pressure_window:
            if play.shape[0] % 128 == 0:
                # traced guard: blocks are layer-aligned (128-cell blocks
                # of a layer-major flat cell axis sit inside one layer),
                # so the per-layer window property is the block property.
                # NaN-poison tau on violation so a silently clamped
                # out-of-window interpolation cannot go unnoticed.
                from ...ops.gas_optics_pallas import pressure_window_violation
                from ...ops.pallas.major_gather import PSPAN
                poison = pressure_window_violation(
                    play, press_ref_log=kd.press_ref_log,
                    press_ref_log_delta=kd.press_ref_log_delta,
                    press_ref_trop_log=kd.press_ref_trop_log, pspan=PSPAN,
                    by_layer=True)
            else:
                # traced AND blocks would span layers: the window property
                # depends on the shape, not the data — a benign user shape
                # (e.g. ncol=32 under jit) would poison. Take the XLA path.
                use_major = False

        # When the major kernel runs, compute the interpolation state in
        # layer-major (nlay, ncol) layout: every per-band/per-flavor cell
        # descriptor the Pallas wrappers build then flattens as a bitcast
        # instead of a transposed copy (~220 copies on the 30-band step).
        # The XLA fallbacks expect (ncol, nlay) coeffs, so lm layout also
        # requires every lane table the pipeline will touch.
        cells_lm = (use_major
                    and (kd.kminor_lower_lane is not None)
                    and (kd.kminor_upper_lane is not None)
                    and (kd.krayl is None or kd.krayl_lane is not None))
        if raw_lanes and not cells_lm:
            return None
        raw = raw_lanes
        if cells_lm:
            play_c, tlay_c = play.T, tlay.T
            col_gas_c = jnp.swapaxes(col_gas, 1, 2)
        else:
            play_c, tlay_c, col_gas_c = play, tlay, col_gas
        coeffs = self._interp(play_c, tlay_c, col_gas_c)

        if use_major:
            tau, pfrac = tau_major_pallas(
                coeffs, kd.kmajor_lane, neta=kd.neta,
                gpoint_flavor=kd.gpoint_flavor,
                band_lims_gpt=kd.grid.band_lims_gpt_array,
                ntab=kd.kmajor_lane_ntab, cells_lm=cells_lm, raw=raw,
                interpret=interpret)
            if poison is not None:
                nan = jnp.asarray(jnp.nan, tau.dtype)
                tau = jnp.where(poison, nan, tau)
        else:
            tau, pfrac = tau_major(
                coeffs, kd.kmajor_x,
                gpoint_flavor=kd.gpoint_flavor,
                band_lims_gpt=kd.grid.band_lims_gpt_array)

        for lower, mset, ktab, klane in (
                (True, kd.minor_lower, kd.kminor_lower_x,
                 kd.kminor_lower_lane),
                (False, kd.minor_upper, kd.kminor_upper_x,
                 kd.kminor_upper_lane)):
            common = dict(
                lower=lower,
                minor_limits_gpt=mset.limits_gpt,
                kminor_start=mset.kminor_start,
                idx_minor=mset.idx_minor,
                idx_minor_scaling=mset.idx_minor_scaling,
                minor_scales_with_density=mset.scales_with_density,
                scale_by_complement=mset.scale_by_complement,
                minor_flavor=mset.flavor,
                play=play_c, tlay=tlay_c, col_gas=col_gas_c,
                idx_h2o=idx_h2o)
            if use_pallas and klane is not None:
                tau = tau_minor_pallas(
                    tau, coeffs, klane, ntemp=ntemp_k, netam1=netam1_k,
                    ncont=ktab.shape[-1], cells_lm=cells_lm, raw=raw,
                    interpret=interpret, **common)
            else:
                tau = tau_minor(tau, coeffs, ktab, **common)

        if kd.krayl is not None:
            if use_pallas and kd.krayl_lane is not None:
                tau_ray = tau_rayleigh_pallas(
                    coeffs, kd.krayl_lane, ntemp=ntemp_k, netam1=netam1_k,
                    gpoint_flavor=kd.gpoint_flavor,
                    band_lims_gpt=kd.grid.band_lims_gpt_array,
                    col_gas=col_gas_c, col_dry=(col_dry_w.T if cells_lm
                                                else col_dry_w),
                    idx_h2o=idx_h2o, cells_lm=cells_lm, raw=raw,
                    interpret=interpret)
            else:
                tau_ray = tau_rayleigh(
                    coeffs, kd.krayl_x,
                    gpoint_flavor=kd.gpoint_flavor,
                    band_lims_gpt=kd.grid.band_lims_gpt_array,
                    col_gas=col_gas_c, col_dry=(col_dry_w.T if cells_lm
                                                else col_dry_w),
                    idx_h2o=idx_h2o)
            if raw_lanes and split_rayleigh:
                # mega-kernel path: Rayleigh combine happens in-solver
                return tau, tau_ray, pfrac
            # combine_abs_and_rayleigh (reference :1954-2036)
            t = tau + tau_ray
            tiny = jnp.finfo(t.dtype).tiny
            if scattering:
                ssa = jnp.where(t > 2.0 * tiny, tau_ray / jnp.where(
                    t > 2.0 * tiny, t, 1.0), 0.0)
                if raw_lanes:
                    return t, ssa, pfrac
                props = OpticalProps2str(tau=t, ssa=ssa, g=jnp.zeros_like(t),
                                         grid=self.grid, top_at_1=top_at_1)
            else:
                if raw_lanes:
                    return t, None, pfrac
                props = OpticalProps1scl(tau=t, grid=self.grid,
                                         top_at_1=top_at_1)
        else:
            if raw_lanes and split_rayleigh:
                return tau, jnp.zeros_like(tau), pfrac
            if raw_lanes:
                return tau, (jnp.zeros_like(tau) if scattering else None), pfrac
            if scattering:
                props = OpticalProps2str(tau=tau, ssa=jnp.zeros_like(tau),
                                         g=jnp.zeros_like(tau),
                                         grid=self.grid, top_at_1=top_at_1)
            else:
                props = OpticalProps1scl(tau=tau, grid=self.grid,
                                         top_at_1=top_at_1)
        return props, coeffs, pfrac

    # ------------------------------------------------------------------
    @staticmethod
    def interp_tlev(tlay, play, plev):
        """Pressure-weighted interpolation/extrapolation of layer
        temperatures to levels (reference source() :893-911)."""
        t0 = tlay[:, :1] + (plev[:, :1] - play[:, :1]) * (
            tlay[:, 1:2] - tlay[:, :1]) / (play[:, 1:2] - play[:, :1])
        tn = tlay[:, -1:] + (plev[:, -1:] - play[:, -1:]) * (
            tlay[:, -1:] - tlay[:, -2:-1]) / (play[:, -1:] - play[:, -2:-1])
        interior = (play[:, :-1] * tlay[:, :-1] * (plev[:, 1:-1] - play[:, 1:])
                    + play[:, 1:] * tlay[:, 1:] * (play[:, :-1] - plev[:, 1:-1])
                    ) / (plev[:, 1:-1] * (play[:, :-1] - play[:, 1:]))
        return jnp.concatenate([t0, interior, tn], axis=1)

    # ------------------------------------------------------------------
    def gas_optics_lw(self, play, plev, tlay, tsfc, gas_concs: GasConcs,
                      *, tlev=None, col_dry=None, scattering: bool = False,
                      top_at_1: Optional[bool] = None
                      ) -> Tuple[OpticalProps, SourcesLW]:
        """LW: optical depths + Planck sources (reference gas_optics_int)."""
        if not self.source_is_internal():
            raise ValueError("rrtmgp gas optics: k-distribution is SW (external source)")
        kd = self.kdist
        play = jnp.asarray(play)
        plev = jnp.asarray(plev)
        tlay = jnp.asarray(tlay)
        tsfc = jnp.asarray(tsfc, play.dtype)
        top = infer_top_at_1(play, top_at_1)
        props, coeffs, pfrac = self._compute_taus(play, plev, tlay, gas_concs,
                                                  col_dry, top, scattering)
        tlev_w = (jnp.asarray(tlev) if tlev is not None
                  else self.interp_tlev(tlay, play, plev))
        sfc, lay, lev, jac = planck_sources(
            pfrac, totplnk=kd.totplnk,
            totplnk_delta=kd.totplnk_delta, temp_ref_min=kd.temp_ref_min,
            gpt2band=kd.grid.gpt2band,
            tlay=tlay, tlev=tlev_w, tsfc=tsfc, top_at_1=top)
        sources = SourcesLW(lay_source=lay, lev_source=lev, sfc_source=sfc,
                            sfc_source_jac=jac, grid=self.grid)
        return props, sources

    def gas_optics_sw(self, play, plev, tlay, gas_concs: GasConcs,
                      *, col_dry=None, scattering: bool = True,
                      top_at_1: Optional[bool] = None
                      ) -> Tuple[OpticalProps, jax.Array]:
        """SW: optical depths + TOA solar source (reference gas_optics_ext)."""
        if not self.source_is_external():
            raise ValueError("rrtmgp gas optics: k-distribution is LW (internal source)")
        kd = self.kdist
        play = jnp.asarray(play)
        top = infer_top_at_1(play, top_at_1)
        props, _, _ = self._compute_taus(play, jnp.asarray(plev),
                                         jnp.asarray(tlay), gas_concs,
                                         col_dry, top, scattering)
        ncol = play.shape[0]
        toa = jnp.broadcast_to(kd.solar_source[None, :], (ncol, kd.ngpt))
        return props, toa

    # ------------------------------------------------------------------
    # Fused lane-layout entry points: spectral fields stay in the Pallas
    # gathers' native (ngpt, nlay, ncol) layout all the way to the
    # lane-layout solver kernels (ops/pallas/solver_lanes.py) — zero
    # (ncol, nlay, ngpt) transposes on the hot path. Inputs/outputs are
    # top-at-index-0 along the layer axis.
    # ------------------------------------------------------------------
    def gas_optics_lw_lanes(self, play, plev, tlay, tsfc,
                            gas_concs: GasConcs, *, tlev=None, col_dry=None,
                            banded_planck: bool = False):
        """LW lane path: (tau (ngpt, nlay, ncol), (sfc_src, lay_src,
        lev_src, sfc_src_jac) lane sources) or None if the Pallas lane
        pipeline is unavailable (caller falls back to gas_optics_lw).

        With ``banded_planck`` the Planck sources stay band-integrated:
        returns (tau, pfrac (ngpt, nlay, ncol), (pb_sfc (nbnd, ncol),
        pb_lay (nbnd, nlay, ncol), pb_lev (nbnd, nlay+1, ncol))) for the
        mega-kernel (lw_noscat_broadband_lanes_pfrac), which computes the
        per-g-point sources in VMEM."""
        if not self.source_is_internal():
            raise ValueError("rrtmgp gas optics: k-distribution is SW")
        kd = self.kdist
        play = jnp.asarray(play)
        plev = jnp.asarray(plev)
        tlay = jnp.asarray(tlay)
        tsfc = jnp.asarray(tsfc, play.dtype)
        out = self._compute_taus(play, plev, tlay, gas_concs, col_dry,
                                 True, scattering=False, raw_lanes=True)
        if out is None:
            return None
        tau, _, pfrac = out
        tlev_w = (jnp.asarray(tlev) if tlev is not None
                  else self.interp_tlev(tlay, play, plev))
        if banded_planck:
            pb = lambda t: planck_bands_lanes(
                t, totplnk=kd.totplnk, totplnk_delta=kd.totplnk_delta,
                temp_ref_min=kd.temp_ref_min)
            return tau, pfrac, (pb(tsfc), pb(tlay.T), pb(tlev_w.T))
        sources = planck_sources_lanes(
            pfrac, totplnk=kd.totplnk, totplnk_delta=kd.totplnk_delta,
            temp_ref_min=kd.temp_ref_min, gpt2band=kd.grid.gpt2band,
            tlay=tlay.T, tlev=tlev_w.T, tsfc=tsfc, top_at_1=True)
        return tau, sources

    def gas_optics_sw_lanes(self, play, plev, tlay, gas_concs: GasConcs,
                            *, col_dry=None, split_rayleigh: bool = False):
        """SW lane path: (tau, ssa (ngpt, nlay, ncol), toa (ngpt, ncol))
        or None if the Pallas lane pipeline is unavailable. With
        ``split_rayleigh`` the first two returns are instead
        (tau_absorption, tau_rayleigh) for the SW mega-kernel, which
        performs combine_abs_and_rayleigh in-solver."""
        if not self.source_is_external():
            raise ValueError("rrtmgp gas optics: k-distribution is LW")
        kd = self.kdist
        play = jnp.asarray(play)
        out = self._compute_taus(play, jnp.asarray(plev), jnp.asarray(tlay),
                                 gas_concs, col_dry, True, scattering=True,
                                 raw_lanes=True, split_rayleigh=split_rayleigh)
        if out is None:
            return None
        tau, ssa, _ = out
        ncol = play.shape[0]
        toa = jnp.broadcast_to(kd.solar_source[:, None], (kd.ngpt, ncol))
        return tau, ssa, toa

    def _pspan_guard(self, play, *, by_layer: bool):
        """Guard the Pallas major kernels' pressure-window assumption.

        Returns False when the property fails on concrete pressures (the
        caller must take the XLA path), None when it holds or the user
        asserted it (config.assume_pressure_window), or a traced scalar
        bool to NaN-poison outputs with (play is a tracer and the eager
        check cannot run — a silent nearest-window clamp is not
        acceptable; see ops/pallas/major_gather.py)."""
        from ...ops.gas_optics_pallas import (pressure_window_ok_by_layer,
                                              pressure_window_violation)
        from ...ops.pallas.major_gather import PSPAN
        kd = self.kdist
        kw = dict(press_ref_log=kd.press_ref_log,
                  press_ref_log_delta=kd.press_ref_log_delta,
                  press_ref_trop_log=kd.press_ref_trop_log, pspan=PSPAN)
        if not isinstance(play, jax.core.Tracer):
            return None if pressure_window_ok_by_layer(play, **kw) else False
        if get_config().assume_pressure_window:
            return None
        return pressure_window_violation(play, by_layer=by_layer, **kw)

    @staticmethod
    def _apply_poison(out, poison):
        if out is None or poison is None:
            return out
        nan = jnp.asarray(jnp.nan)
        return jax.tree_util.tree_map(
            lambda x: jnp.where(poison, nan.astype(x.dtype), x), out)

    def lw_fused_solve(self, play, plev, tlay, tsfc, gas_concs: GasConcs,
                       *, sfc_emis, inc_flux=None, tlev=None, col_dry=None,
                       cloud_tau_abs=None, ds, weight, byband=False):
        """The grand fused LW path: gas optics AND the no-scattering
        transport solve in one Pallas kernel (ops/pallas/fused_lw.py) —
        the spectral tau/pfrac/source fields never touch HBM.

        sfc_emis/inc_flux: (ngpt, ncol) lane layout; cloud_tau_abs:
        optional (nbnd, nlay, ncol) by-band absorption optical depth.
        Returns (flux_up, flux_dn) each (nlay+1, ncol) top-at-0, or None
        when ineligible (caller falls back to the staged lane path)."""
        from ...ops.gas_optics_pallas import lw_fused_lanes

        if not self.source_is_internal():
            raise ValueError("rrtmgp gas optics: k-distribution is SW")
        kd = self.kdist
        play = jnp.asarray(play)
        plev = jnp.asarray(plev)
        tlay = jnp.asarray(tlay)
        tsfc = jnp.asarray(tsfc, play.dtype)

        on_tpu = _on_tpu()
        cfg_pallas = get_config().use_pallas
        use_pallas = (lane_gather_ok(kd.temp_ref.shape[0], kd.neta - 1)
                      and (on_tpu if cfg_pallas is None else cfg_pallas))
        if not use_pallas or kd.kmajor_lane is None:
            return None
        poison = self._pspan_guard(play, by_layer=True)
        if poison is False:
            return None

        self._check_key_species_present(gas_concs)
        ngpt, ncol = kd.ngpt, play.shape[0]
        inc = (inc_flux if inc_flux is not None
               else jnp.zeros((ngpt, ncol), play.dtype))
        tlev = None if tlev is None else jnp.asarray(tlev)

        # hand-derived fused adjoint kernel (ops/pallas/fused_lw_bwd.py):
        # eligible for broadband output with uniform pressure windows
        # (auto: concrete pressures sharing one profile across columns)
        kvjp_cfg = get_config().fused_adjoint
        kernel_vjp = bool(
            not byband
            and (kvjp_cfg is True
                 or (kvjp_cfg is None and _shared_pgrid(play))))

        def pallas_run(play, plev, tlay, tsfc, gas_concs, sfc_emis, inc,
                       tlev, col_dry, cloud_tau_abs):
            col_gas, _, idx_h2o = self._col_gas(play, plev, tlay,
                                                gas_concs, col_dry)
            play_c, tlay_c = play.T, tlay.T
            col_gas_c = jnp.swapaxes(col_gas, 1, 2)
            coeffs = self._interp(play_c, tlay_c, col_gas_c)
            tlev_w = (tlev if tlev is not None
                      else self.interp_tlev(tlay, play, plev))
            return lw_fused_lanes(
                coeffs, kd, play_c=play_c, tlay_c=tlay_c,
                col_gas_c=col_gas_c, idx_h2o=idx_h2o, tlev_c=tlev_w.T,
                tsfc=tsfc, emis=sfc_emis, inc=inc, ds=ds, weight=weight,
                cloud_tau_abs=cloud_tau_abs, byband=byband,
                kernel_vjp=kernel_vjp, interpret=not on_tpu)

        def xla_run(play, plev, tlay, tsfc, gas_concs, sfc_emis, inc,
                    tlev, col_dry, cloud_tau_abs):
            return self._lw_fused_xla_ref(
                play, plev, tlay, tsfc, gas_concs, sfc_emis, inc, tlev,
                col_dry, cloud_tau_abs, ds=ds, weight=weight, byband=byband)

        if kernel_vjp:
            # descriptor prep stays plain differentiable JAX; the kernel
            # itself carries its own Pallas VJP — no XLA-retrace wrapper
            out = pallas_run(play, plev, tlay, tsfc, gas_concs, sfc_emis,
                             inc, tlev, col_dry, cloud_tau_abs)
        else:
            out = _with_xla_grad(pallas_run, xla_run, play, plev, tlay,
                                 tsfc, gas_concs, sfc_emis, inc, tlev,
                                 col_dry, cloud_tau_abs)
        return self._apply_poison(out, poison)

    def _lw_fused_xla_ref(self, play, plev, tlay, tsfc, gas_concs,
                          sfc_emis, inc, tlev, col_dry, cloud_tau_abs, *,
                          ds, weight, byband):
        """XLA-path computation equivalent to the fused LW kernel (same
        argument/output layout); defines lw_fused_solve's gradient.
        Inputs top-at-index-0; sfc_emis/inc are (ngpt, ncol) lane layout;
        returns (flux_up, flux_dn) (nlay+1, ncol), or per-band
        (nbnd, nlay+1, ncol) with ``byband``."""
        from ...ops.solver_lw import lw_solver_noscat

        kd = self.kdist
        props, sources = self.gas_optics_lw(
            play, plev, tlay, tsfc, gas_concs, tlev=tlev, col_dry=col_dry,
            top_at_1=True)
        tau = props.tau
        if cloud_tau_abs is not None:
            # by-band absorption increment, band -> g-point expansion
            # (the fused kernel adds the (nbnd, nlay, ncol) field per band)
            band = jnp.asarray(kd.grid.gpt2band)
            tau = tau + jnp.transpose(cloud_tau_abs, (2, 1, 0))[:, :, band]
        w0 = _uniform_band_width_checked(kd, byband)
        f = lw_solver_noscat(
            tau, sources.lay_source, sources.lev_source, sfc_emis.T,
            sources.sfc_source, inc.T, top_at_1=True, ds=(ds,),
            weights=(weight,), byband_width=(w0 if byband else None))
        if byband:
            return (jnp.transpose(f.flux_up, (2, 1, 0)),
                    jnp.transpose(f.flux_dn, (2, 1, 0)))
        return f.flux_up.T, f.flux_dn.T

    def sw_fused_solve(self, play, plev, tlay, gas_concs: GasConcs, *,
                       mu0, sfc_alb_dir, sfc_alb_dif, inc_flux=None,
                       inc_flux_dif=None, col_dry=None, cloud=None,
                       byband=False):
        """The grand fused SW path: gas optics (major + minors +
        Rayleigh), cloud increment, and the two-stream solve in one
        Pallas kernel (ops/pallas/fused_sw.py).

        mu0 (nlay, ncol); sfc_alb_*/inc_flux (ngpt, ncol) lane layout
        (inc_flux defaults to the solar source); cloud: optional by-band
        delta-scaled (tau, ssa, g), each (nbnd, nlay, ncol). Returns
        (flux_up, flux_dn, flux_dir) each (nlay+1, ncol) top-at-0, or
        None when ineligible."""
        from ...ops.gas_optics_pallas import sw_fused_lanes

        if not self.source_is_external():
            raise ValueError("rrtmgp gas optics: k-distribution is LW")
        kd = self.kdist
        play = jnp.asarray(play)
        plev = jnp.asarray(plev)
        tlay = jnp.asarray(tlay)

        on_tpu = _on_tpu()
        cfg_pallas = get_config().use_pallas
        use_pallas = (lane_gather_ok(kd.temp_ref.shape[0], kd.neta - 1)
                      and (on_tpu if cfg_pallas is None else cfg_pallas))
        if not use_pallas or kd.kmajor_lane is None:
            return None
        poison = self._pspan_guard(play, by_layer=True)
        if poison is False:
            return None

        self._check_key_species_present(gas_concs)
        ngpt, ncol = kd.ngpt, play.shape[0]
        inc = (inc_flux if inc_flux is not None
               else jnp.broadcast_to(kd.solar_source[:, None], (ngpt, ncol)
                                     ).astype(play.dtype))

        kvjp_cfg = get_config().fused_adjoint
        kernel_vjp = bool(
            not byband
            and (kvjp_cfg is True
                 or (kvjp_cfg is None and _shared_pgrid(play))))

        def pallas_run(play, plev, tlay, gas_concs, mu0, sfc_alb_dir,
                       sfc_alb_dif, inc, incdif, col_dry, cloud):
            col_gas, col_dry_w, idx_h2o = self._col_gas(play, plev, tlay,
                                                        gas_concs, col_dry)
            play_c, tlay_c = play.T, tlay.T
            col_gas_c = jnp.swapaxes(col_gas, 1, 2)
            coeffs = self._interp(play_c, tlay_c, col_gas_c)
            return sw_fused_lanes(
                coeffs, kd, play_c=play_c, tlay_c=tlay_c,
                col_gas_c=col_gas_c, col_dry_c=col_dry_w.T,
                idx_h2o=idx_h2o, cloud=cloud, mu0=mu0,
                sfc_alb_dir=sfc_alb_dir, sfc_alb_dif=sfc_alb_dif, inc=inc,
                incdif=incdif, byband=byband, kernel_vjp=kernel_vjp,
                interpret=not on_tpu)

        def xla_run(play, plev, tlay, gas_concs, mu0, sfc_alb_dir,
                    sfc_alb_dif, inc, incdif, col_dry, cloud):
            return self._sw_fused_xla_ref(
                play, plev, tlay, gas_concs, mu0, sfc_alb_dir, sfc_alb_dif,
                inc, incdif, col_dry, cloud, byband=byband)

        if kernel_vjp:
            # descriptor prep stays plain differentiable JAX; the kernel
            # itself carries its own Pallas VJP — no XLA-retrace wrapper
            out = pallas_run(play, plev, tlay, gas_concs, mu0,
                             sfc_alb_dir, sfc_alb_dif, inc, inc_flux_dif,
                             col_dry, cloud)
        else:
            out = _with_xla_grad(pallas_run, xla_run, play, plev, tlay,
                                 gas_concs, mu0, sfc_alb_dir, sfc_alb_dif,
                                 inc, inc_flux_dif, col_dry, cloud)
        return self._apply_poison(out, poison)

    def _sw_fused_xla_ref(self, play, plev, tlay, gas_concs, mu0,
                          sfc_alb_dir, sfc_alb_dif, inc, incdif, col_dry,
                          cloud, *, byband):
        """XLA-path computation equivalent to the fused SW kernel (same
        argument/output layout); defines sw_fused_solve's gradient.
        mu0 (nlay, ncol); boundary fields (ngpt, ncol); cloud optional
        by-band delta-scaled (tau, ssa, g) each (nbnd, nlay, ncol).
        Returns (flux_up, flux_dn_total, flux_dir) (nlay+1, ncol), or
        per-band with ``byband``."""
        from ...ops.solver_sw import sw_solver_2stream

        kd = self.kdist
        props, _ = self.gas_optics_sw(play, plev, tlay, gas_concs,
                                      col_dry=col_dry, top_at_1=True)
        tau, ssa, g = props.tau, props.ssa, props.g
        if cloud is not None:
            # by-band 2-stream increment, exactly the fused kernel's
            # combine (tau-weighted ssa/g averaging with the reference's
            # tiny-guards; increment_2stream_by_2stream semantics)
            band = jnp.asarray(kd.grid.gpt2band)
            exp = lambda x: jnp.transpose(x, (2, 1, 0))[:, :, band]
            ct, cs, cg = exp(cloud[0]), exp(cloud[1]), exp(cloud[2])
            tiny = jnp.asarray(np.finfo(np.float32).tiny, tau.dtype)
            t = tau + ct
            tauscat = tau * ssa + ct * cs
            g12 = ((tau * ssa * g + ct * cs * cg)
                   / jnp.maximum(tauscat, tiny))
            ssa12 = tauscat / jnp.maximum(t, tiny)
            g = jnp.where(tauscat > 2.0 * tiny, g12, 0.0)
            ssa = jnp.where(t > 2.0 * tiny, ssa12, ssa)
            tau = t
        w0 = _uniform_band_width_checked(kd, byband)
        f = sw_solver_2stream(
            tau, ssa, g, mu0.T, sfc_alb_dir.T, sfc_alb_dif.T, inc.T,
            top_at_1=True,
            inc_flux_dif=(None if incdif is None else incdif.T),
            byband_width=(w0 if byband else None))
        if byband:
            return tuple(jnp.transpose(x, (2, 1, 0))
                         for x in (f.flux_up, f.flux_dn, f.flux_dir))
        return f.flux_up.T, f.flux_dn.T, f.flux_dir.T

    # ------------------------------------------------------------------
    def compute_optimal_angles(self, props: OpticalProps) -> jax.Array:
        """Per-(col, gpt) optimal LW secants from total-column transmittance
        (reference compute_optimal_angles :1503-1562; Hogan fits)."""
        kd = self.kdist
        if kd.optimal_angle_fit is None:
            raise ValueError("compute_optimal_angles: no fit coefficients loaded")
        if not kd.grid.gpoints_are_equal(props.grid):
            raise ValueError("compute_optimal_angles: spectral discretization mismatch")
        trans_total = jnp.exp(-jnp.sum(props.tau, axis=1))     # (ncol, ngpt)
        fit = jnp.asarray(kd.optimal_angle_fit, props.tau.dtype)
        band = kd.grid.gpt2band
        return fit[0, band][None, :] * trans_total + fit[1, band][None, :]
