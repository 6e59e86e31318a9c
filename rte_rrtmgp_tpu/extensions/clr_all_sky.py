"""Convenience drivers: gas optics + optional clouds -> fluxes in one call.

Equivalent of reference rte/extensions/mo_rrtmgp_clr_all_sky.F90:22-297
(``rte_lw`` / ``rte_sw`` overloads): run gas optics, optionally increment
with cloud (and aerosol) optical properties, then solve. As in the
reference wrapper, NO delta scaling is applied here — callers that want
delta-Eddington rescaled clouds (e.g. the all-sky example program,
rrtmgp_allsky.F90) delta-scale before passing them in.
"""
from __future__ import annotations

from typing import Optional

from ..fluxes import Fluxes
from ..gas_concs import GasConcs
from ..optical_props import OpticalProps, increment
from ..rte import rte_lw, rte_sw

__all__ = ["clr_all_sky_lw", "clr_all_sky_sw"]


def clr_all_sky_lw(gas_optics, play, plev, tlay, tsfc, gas_concs: GasConcs,
                   sfc_emis, *, clouds: Optional[OpticalProps] = None,
                   aerosols: Optional[OpticalProps] = None,
                   tlev=None, col_dry=None, inc_flux=None,
                   n_gauss_angles: int = 1, top_at_1=None,
                   compute_jacobian: bool = False,
                   spectral: bool = False) -> Fluxes:
    """LW all-sky convenience (reference rte_lw wrapper :48-170)."""
    scattering = clouds is not None and hasattr(clouds, "ssa")
    props, sources = gas_optics.gas_optics_lw(
        play, plev, tlay, tsfc, gas_concs, tlev=tlev, col_dry=col_dry,
        scattering=scattering, top_at_1=top_at_1)
    if clouds is not None:
        props = increment(props, clouds)
    if aerosols is not None:
        props = increment(props, aerosols)
    return rte_lw(props, sources, sfc_emis, inc_flux=inc_flux,
                  n_gauss_angles=n_gauss_angles,
                  compute_jacobian=compute_jacobian, spectral=spectral)


def clr_all_sky_sw(gas_optics, play, plev, tlay, gas_concs: GasConcs,
                   mu0, sfc_alb_dir, sfc_alb_dif, *,
                   clouds: Optional[OpticalProps] = None,
                   aerosols: Optional[OpticalProps] = None,
                   col_dry=None, inc_flux_dif=None, top_at_1=None,
                   spectral: bool = False) -> Fluxes:
    """SW all-sky convenience (reference rte_sw wrapper :172-297).

    Clouds/aerosols are incremented AS GIVEN — the reference wrapper
    applies no delta scaling (mo_rrtmgp_clr_all_sky.F90:276-288; only
    the all-sky example program delta-scales its clouds first); callers
    wanting delta-Eddington rescaling apply
    ``optical_props.delta_scale`` before the call."""
    props, toa = gas_optics.gas_optics_sw(
        play, plev, tlay, gas_concs, col_dry=col_dry, top_at_1=top_at_1)
    if clouds is not None:
        props = increment(props, clouds)
    if aerosols is not None:
        props = increment(props, aerosols)
    return rte_sw(props, mu0, toa, sfc_alb_dir, sfc_alb_dif,
                  inc_flux_dif=inc_flux_dif, spectral=spectral)
