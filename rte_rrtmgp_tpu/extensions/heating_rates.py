"""Heating rates from flux profiles.

Equivalent of reference rte/extensions/mo_heating_rates.F90:26-117:
H [K/s] = g * d(F_net)/dp / cp, plus the variable-mu0 variant that repairs
the layer where the sun sets (spherical geometry) using the diffuse-flux
divergence.
"""
from __future__ import annotations

import jax.numpy as jnp

from .. import constants

__all__ = ["compute_heating_rate"]


def compute_heating_rate(flux_up, flux_dn, p_lev, *, flux_dir=None, mu0=None):
    """Layer heating rate [K/s] (reference compute_heating_rate_general
    :34-63). With ``flux_dir`` and per-layer ``mu0`` also supplied, applies
    the solar variable-mu0 correction (:65-117): in the single layer where
    mu0 transitions to zero, use the diffuse (total - direct) divergence.

    flux_up/flux_dn[/flux_dir]: (ncol, nlay+1); p_lev: (ncol, nlay+1);
    mu0: (ncol, nlay). Returns (ncol, nlay).
    """
    dnet = ((flux_up[:, 1:] - flux_up[:, :-1])
            - (flux_dn[:, 1:] - flux_dn[:, :-1]))
    hr = dnet * constants.grav / (constants.cp_dry
                                  * (p_lev[:, 1:] - p_lev[:, :-1]))
    if flux_dir is None or mu0 is None:
        return hr

    mu0 = jnp.asarray(mu0)
    sunlit = mu0 > 0.0
    # The correction applies in the first *dark* layer adjacent to the
    # sunlit region (reference :99-115: last_sunlight_layer = transition
    # index), where the direct-beam divergence is an artifact of the
    # geometric horizon. Identified orientation-agnostically as a dark
    # layer with a sunlit neighbor, interior layers only (reference
    # requires 1 < ilay < nlay).
    dark = jnp.logical_not(sunlit)
    sun_below = jnp.concatenate(
        [sunlit[:, 1:], jnp.zeros_like(sunlit[:, :1])], axis=1)
    sun_above = jnp.concatenate(
        [jnp.zeros_like(sunlit[:, :1]), sunlit[:, :-1]], axis=1)
    transition = dark & (sun_below | sun_above)
    interior = jnp.ones_like(sunlit)
    interior = interior.at[:, 0].set(False).at[:, -1].set(False)
    transition = transition & interior

    ddir = flux_dir[:, 1:] - flux_dir[:, :-1]
    hr_diffuse = (dnet + ddir) * constants.grav / (
        constants.cp_dry * (p_lev[:, 1:] - p_lev[:, :-1]))
    return jnp.where(transition, hr_diffuse, hr)
