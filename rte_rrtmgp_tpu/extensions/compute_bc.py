"""Upper boundary condition from an isothermal cap layer.

Equivalent of reference rte/extensions/mo_compute_bc.F90:13-196: build a
single isothermal layer spanning [gas-optics minimum pressure, domain top],
run the appropriate solver through it, and return the spectrally-resolved
downward flux at its base (diffuse for LW, direct for SW) for use as the
host model's upper boundary condition.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..gas_concs import GasConcs
from ..rte import rte_lw, rte_sw

__all__ = ["compute_bc"]


def compute_bc(gas_optics, play, plev, tlay, gas_concs: GasConcs,
               *, mu0=None, top_at_1: Optional[bool] = None):
    """Downward spectral flux (ncol, ngpt) at the bottom of the cap layer.

    ``gas_optics`` is any provider with gas_optics_lw/sw and press_min();
    ``mu0`` (ncol,) is required for solar (external-source) providers.
    """
    play = np.asarray(play)
    plev = np.asarray(plev)
    tlay = np.asarray(tlay)
    ncol, nlay = play.shape
    if top_at_1 is None:
        top_at_1 = bool(play[0, 0] < play[0, -1])
    top_lay = 0 if top_at_1 else nlay - 1
    top_lev = 0 if top_at_1 else nlay

    p_min = gas_optics.press_min()
    if np.any(plev[:, top_lev] <= p_min * (1 + 1e-12)):
        raise ValueError("compute_bc: pressures too close to (or less than) "
                         "gas-optics minimum")

    # single isothermal layer (reference :117-128)
    t_top = tlay[:, top_lay]
    tlay_1 = t_top[:, None]
    tlev_1 = np.stack([t_top, t_top], axis=1)
    plev_1 = np.stack([np.full(ncol, p_min), plev[:, top_lev]], axis=1)
    play_1 = 0.5 * (plev_1[:, :1] + plev_1[:, 1:])

    # gas concentrations from the top layer (reference :133-141)
    gas_1 = GasConcs.empty()
    for name in gas_concs.gas_names:
        vmr = np.asarray(gas_concs.get_vmr(name, ncol, nlay))
        gas_1 = gas_1.set_vmr(name, jnp.asarray(vmr[:, top_lay:top_lay + 1]))

    ones = np.ones((ncol, 1))
    if gas_optics.source_is_internal():
        props, sources = gas_optics.gas_optics_lw(
            play_1, plev_1, tlay_1, t_top, gas_1, tlev=tlev_1, top_at_1=True)
        f = rte_lw(props, sources, ones, spectral=True)
        return f.flux_dn[:, -1, :]
    if mu0 is None:
        raise ValueError("compute_bc: have to supply mu0 for solar calculations")
    props, toa = gas_optics.gas_optics_sw(play_1, plev_1, tlay_1, gas_1,
                                          top_at_1=True)
    f = rte_sw(props, np.asarray(mu0), toa, ones, ones, spectral=True)
    return f.flux_dn_dir[:, -1, :]
