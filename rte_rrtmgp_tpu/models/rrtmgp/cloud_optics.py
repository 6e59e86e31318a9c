"""RRTMGP cloud optics: particle-size lookup tables.

TPU-native equivalent of reference ``ty_cloud_optics_rrtmgp``
(rrtmgp/frontend/mo_cloud_optics_rrtmgp.F90:35-487) and its kernel
``compute_cld_from_table`` (rrtmgp/kernels/mo_cloud_optics_rrtmgp_kernels.
F90:24-65): linear interpolation in particle size of ext/ssa/asy tables,
tau = water_path * ext, liquid and ice combined via the (tau, tau*ssa,
tau*ssa*g) accumulation identity. Vectorized as masked row gathers over the
(ncol, nlay) grid; the spectral axis rides along as lanes.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...config import get_config, on_tpu as _on_tpu
from ...optical_props import OpticalProps, OpticalProps1scl, OpticalProps2str
from ...ops.pallas.minor_gather import cloud_props_lane
from ...spectral import SpectralGrid

__all__ = ["CloudOpticsRRTMGP"]


def _interp_size(table, idx0, fint):
    """Particle-size table lerp: tab[i] + fint * (tab[i+1] - tab[i]).
    table: (nsize, ngpt); idx0/fint: (ncol, nlay). (The caller applies
    the water-path factor and the phase mask.)"""
    lo = jnp.take(table, idx0, axis=0)        # (ncol, nlay, ngpt)
    hi = jnp.take(table, idx0 + 1, axis=0)
    return (lo + fint[..., None] * (hi - lo))


@dataclasses.dataclass(frozen=True)
class CloudOpticsRRTMGP:
    grid: SpectralGrid
    radliq_lwr: float
    radliq_upr: float
    diamice_lwr: float
    diamice_upr: float
    extliq: jax.Array   # (nsize_liq, ngpt)
    ssaliq: jax.Array
    asyliq: jax.Array
    extice: jax.Array   # (nrghice, nsize_ice, ngpt)
    ssaice: jax.Array
    asyice: jax.Array
    icergh: int = 1     # ice roughness category, 1-based (reference icergh)
    # lane-gather tables (ops/pallas/minor_gather.cloud_props_lane):
    # payload (prop, size corner, band) on sublanes, size-bin domain on
    # the 128-lane axis
    liq_lane: Optional[jax.Array] = None       # (3*2*nbnd, 128)
    ice_lane: Optional[jax.Array] = None       # (nrghice, 3*2*nbnd, 128)

    # ------------------------------------------------------------------
    @staticmethod
    def load(band_lims_wvn, radliq_lwr, radliq_upr, diamice_lwr, diamice_upr,
             extliq, ssaliq, asyliq, extice, ssaice, asyice,
             band_lims_gpt=None, dtype=jnp.float32) -> "CloudOpticsRRTMGP":
        """Build from tables (reference ``load``, mo_cloud_optics_rrtmgp.F90:
        77-214). extice/ssaice/asyice: (nsize_ice, ngpt, nrghice) file order,
        stored roughness-major."""
        grid = SpectralGrid.from_arrays(band_lims_wvn, band_lims_gpt)
        ice = [np.moveaxis(np.asarray(a), -1, 0) for a in (extice, ssaice, asyice)]

        def lane(tabs):
            """[3 x (nsize, nbnd)] -> (3*2*nbnd, 128) corner-expanded."""
            nsize, nbnd = np.asarray(tabs[0]).shape
            if nsize - 1 > 128:
                return None
            e = np.stack([np.stack([np.asarray(t)[c:nsize - 1 + c].T
                                    for c in (0, 1)], 0) for t in tabs], 0)
            # (3 prop, 2 corner, nbnd, nsize-1)
            flat = e.reshape(3 * 2 * nbnd, nsize - 1)
            return jnp.asarray(np.pad(flat, ((0, 0), (0, 128 - nsize + 1))),
                               dtype)

        liq_lane = lane([extliq, ssaliq, asyliq])
        ice_lanes = [lane([ice[0][r], ice[1][r], ice[2][r]])
                     for r in range(ice[0].shape[0])]
        ice_lane = (jnp.stack(ice_lanes) if all(
            il is not None for il in ice_lanes) else None)
        return CloudOpticsRRTMGP(
            grid=grid,
            radliq_lwr=float(radliq_lwr), radliq_upr=float(radliq_upr),
            diamice_lwr=float(diamice_lwr), diamice_upr=float(diamice_upr),
            extliq=jnp.asarray(extliq, dtype), ssaliq=jnp.asarray(ssaliq, dtype),
            asyliq=jnp.asarray(asyliq, dtype),
            extice=jnp.asarray(ice[0], dtype), ssaice=jnp.asarray(ice[1], dtype),
            asyice=jnp.asarray(ice[2], dtype),
            liq_lane=liq_lane, ice_lane=ice_lane)

    # ------------------------------------------------------------------
    @property
    def liq_nsteps(self): return self.extliq.shape[0]
    @property
    def ice_nsteps(self): return self.extice.shape[1]
    @property
    def liq_step_size(self):
        return (self.radliq_upr - self.radliq_lwr) / (self.liq_nsteps - 1)
    @property
    def ice_step_size(self):
        return (self.diamice_upr - self.diamice_lwr) / (self.ice_nsteps - 1)

    def num_ice_roughness_types(self) -> int:
        return self.extice.shape[0]

    def set_ice_roughness(self, icergh: int) -> "CloudOpticsRRTMGP":
        """Select the Yang-2013 ice roughness category (reference
        set_ice_roughness :437-450)."""
        if not (1 <= icergh <= self.num_ice_roughness_types()):
            raise ValueError("cloud optics: ice roughness flag out of bounds")
        return dataclasses.replace(self, icergh=icergh)

    # ------------------------------------------------------------------
    def _phase_props(self, wp, re, mask, tables, nsteps, step, offset):
        """(tau, taussa, taussag) for one phase (reference
        compute_cld_from_table)."""
        dtype = wp.dtype
        pos = (re - offset) / step
        idx0 = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, nsteps - 2)
        fint = pos - idx0.astype(dtype)
        maskf = mask.astype(dtype)[..., None]
        ext, ssa, asy = tables
        t = (wp[..., None] * _interp_size(ext, idx0, fint)) * maskf
        ts = t * _interp_size(ssa, idx0, fint)
        tsg = ts * _interp_size(asy, idx0, fint)
        return t, ts, tsg

    def cloud_optics(self, clwp, ciwp, reliq, dgice, *,
                     scattering: bool = True,
                     top_at_1: bool = True) -> OpticalProps:
        """Cloud optical properties from water paths [g/m2] and particle
        sizes [microns] (reference ``cloud_optics`` :256-431).

        Returns 2-stream (tau, ssa, g) or absorption-only (1scl) props on
        this object's (band) spectral grid.
        """
        clwp = jnp.asarray(clwp)
        ciwp = jnp.asarray(ciwp, clwp.dtype)
        reliq = jnp.asarray(reliq, clwp.dtype)
        dgice = jnp.asarray(dgice, clwp.dtype)
        self._maybe_validate(clwp, ciwp, reliq, dgice)

        on_tpu = _on_tpu()
        cfg_pallas = get_config().use_pallas
        use_pallas = (self.liq_lane is not None and self.ice_lane is not None
                      and (on_tpu if cfg_pallas is None else cfg_pallas))

        if use_pallas:
            def pallas_arm(clwp, ciwp, reliq, dgice):
                out, ncol, nlay, nbnd = self._lane_triplet_raw(
                    clwp, ciwp, reliq, dgice, interpret=not on_tpu,
                    cells_lm=False)
                tau = out[:nbnd].T.reshape(ncol, nlay, nbnd)
                taussa = out[nbnd:2 * nbnd].T.reshape(ncol, nlay, nbnd)
                taussag = out[2 * nbnd:].T.reshape(ncol, nlay, nbnd)
                return tau, taussa, taussag

            # custom-VJP bridge: jax.grad w.r.t. water paths and particle
            # sizes works with the lane kernel selected (backward = the
            # XLA table-interp path)
            from ...ops.pallas.autodiff import with_xla_grad
            tau, taussa, taussag = with_xla_grad(
                pallas_arm, self._triplet_xla, clwp, ciwp, reliq, dgice)
        else:
            tau, taussa, taussag = self._triplet_xla(clwp, ciwp, reliq,
                                                     dgice)

        if not scattering:
            # absorption-only: (1-ssa) tau = tau - taussa
            return OpticalProps1scl(tau=tau - taussa, grid=self.grid,
                                    top_at_1=top_at_1)
        eps = jnp.finfo(clwp.dtype).eps
        g = taussag / jnp.maximum(eps, taussa)
        ssa = taussa / jnp.maximum(eps, tau)
        return OpticalProps2str(tau=tau, ssa=ssa, g=g, grid=self.grid,
                                top_at_1=top_at_1)

    def _triplet_xla(self, clwp, ciwp, reliq, dgice):
        """(tau, tau*ssa, tau*ssa*g), each (ncol, nlay, nbnd), via the
        XLA table interpolation — the fall-back path AND the gradient
        definition of the lane-kernel path."""
        icergh0 = self.icergh - 1
        ltau, ltaussa, ltaussag = self._phase_props(
            clwp, reliq, clwp > 0.0,
            (self.extliq, self.ssaliq, self.asyliq),
            self.liq_nsteps, self.liq_step_size, self.radliq_lwr)
        itau, itaussa, itaussag = self._phase_props(
            ciwp, dgice, ciwp > 0.0,
            (self.extice[icergh0], self.ssaice[icergh0],
             self.asyice[icergh0]),
            self.ice_nsteps, self.ice_step_size, self.diamice_lwr)
        return (ltau + itau, ltaussa + itaussa, ltaussag + itaussag)

    def _lane_triplet_raw(self, clwp, ciwp, reliq, dgice, *, interpret,
                          cells_lm):
        """Run the cloud LUT lane kernel; returns (out rows, ncol, nlay,
        nbnd) with out = [tau; tau*ssa; tau*ssa*g] stacked by band over
        flattened cells (layer-major when ``cells_lm``)."""
        dtype = clwp.dtype
        ncol, nlay = clwp.shape
        ncell = ncol * nlay
        nbnd = self.grid.ngpt
        icergh0 = self.icergh - 1
        flat = (lambda x: x.T.reshape(ncell)) if cells_lm \
            else (lambda x: x.reshape(ncell))

        def phase_idx(re, nsteps, step, offset):
            pos = (re - offset) / step
            idx0 = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, nsteps - 2)
            return flat(idx0), flat(pos - idx0.astype(dtype))

        li, lf = phase_idx(reliq, self.liq_nsteps, self.liq_step_size,
                           self.radliq_lwr)
        ii, if_ = phase_idx(dgice, self.ice_nsteps, self.ice_step_size,
                            self.diamice_lwr)
        idx = jnp.stack([li, ii], 0)
        fint = jnp.stack([lf, if_], 0)
        wp = jnp.stack([flat(clwp * (clwp > 0.0).astype(dtype)),
                        flat(ciwp * (ciwp > 0.0).astype(dtype))], 0)
        out, n = cloud_props_lane(idx, fint, wp, self.liq_lane,
                                  self.ice_lane[icergh0], nbnd=nbnd,
                                  interpret=interpret)
        return out[:, :n], ncol, nlay, nbnd

    def cloud_optics_lanes(self, clwp, ciwp, reliq, dgice, *,
                           interpret: bool = False):
        """Lane-layout cloud optics for the fused pipeline: returns
        (tau, tau*ssa, tau*ssa*g) BY BAND, each (nbnd, nlay, ncol) — the
        cloud LUT kernel's native output with layer-major cells — or None
        when the lane tables are unavailable. Inputs are the usual
        (ncol, nlay) user-layout fields. Differentiable (custom VJP via
        the XLA table interpolation)."""
        if self.liq_lane is None or self.ice_lane is None:
            return None
        clwp = jnp.asarray(clwp)
        ciwp = jnp.asarray(ciwp, clwp.dtype)
        reliq = jnp.asarray(reliq, clwp.dtype)
        dgice = jnp.asarray(dgice, clwp.dtype)
        self._maybe_validate(clwp, ciwp, reliq, dgice)

        def pallas_arm(clwp, ciwp, reliq, dgice):
            out, ncol, nlay, nbnd = self._lane_triplet_raw(
                clwp, ciwp, reliq, dgice, interpret=interpret,
                cells_lm=True)
            tau = out[:nbnd].reshape(nbnd, nlay, ncol)
            taussa = out[nbnd:2 * nbnd].reshape(nbnd, nlay, ncol)
            taussag = out[2 * nbnd:].reshape(nbnd, nlay, ncol)
            return tau, taussa, taussag

        def xla_arm(clwp, ciwp, reliq, dgice):
            lane = lambda x: jnp.transpose(x, (2, 1, 0))
            return tuple(lane(x) for x in
                         self._triplet_xla(clwp, ciwp, reliq, dgice))

        from ...ops.pallas.autodiff import with_xla_grad
        return with_xla_grad(pallas_arm, xla_arm, clwp, ciwp, reliq, dgice)

    def _maybe_validate(self, clwp, ciwp, reliq, dgice) -> None:
        """Run the reference's bounds checks (:346-353) when value checks
        are enabled and inputs are concrete — the repo-wide convention
        (rte.py): eager calls validate, traced values are skipped (the
        LUT would silently extrapolate out-of-range sizes otherwise)."""
        import jax as _j
        if not get_config().check_values:
            return
        if any(isinstance(x, _j.core.Tracer)
               for x in (clwp, ciwp, reliq, dgice)):
            return
        self.validate_inputs(clwp, ciwp, reliq, dgice)

    def validate_inputs(self, clwp, ciwp, reliq, dgice) -> None:
        """Eager bounds checks (reference :346-353)."""
        clwp = np.asarray(clwp)
        ciwp = np.asarray(ciwp)
        reliq = np.asarray(reliq)
        dgice = np.asarray(dgice)
        liq = clwp > 0
        ice = ciwp > 0
        if np.any((reliq[liq] < self.radliq_lwr) | (reliq[liq] > self.radliq_upr)):
            raise ValueError("cloud optics: liquid effective radius is out of bounds")
        if np.any((dgice[ice] < self.diamice_lwr) | (dgice[ice] > self.diamice_upr)):
            raise ValueError("cloud optics: ice effective diameter is out of bounds")
        if np.any(clwp[liq] < 0) or np.any(ciwp[ice] < 0):
            raise ValueError("cloud optics: negative water path")
