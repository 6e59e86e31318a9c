"""Flux reduction: spectral (per-g-point) fluxes -> user outputs.

Replaces the reference's abstract ``ty_fluxes``/``ty_fluxes_broadband``
pointer-based reduction protocol (rte/frontend/mo_fluxes.F90:36-194 and
rte/kernels/mo_fluxes_broadband_kernels.F90) plus the byband/bygpoint
extensions (rte/extensions/mo_fluxes_byband.F90, mo_fluxes_bygpoint.F90)
with pure reduction functions over the g-point axis. On TPU these are lane
reductions / one-hot matmuls that XLA fuses into the producing computation.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .spectral import SpectralGrid

__all__ = [
    "Fluxes",
    "sum_broadband",
    "net_broadband",
    "sum_byband",
    "net_byband",
]


@dataclasses.dataclass(frozen=True)
class Fluxes:
    """Broadband flux bundle (reference ``ty_fluxes_broadband``)."""
    flux_up: jax.Array                      # (ncol, nlev)
    flux_dn: jax.Array                      # (ncol, nlev)
    flux_net: jax.Array                     # (ncol, nlev) = dn - up
    flux_dn_dir: Optional[jax.Array] = None  # (ncol, nlev), SW only
    flux_up_jac: Optional[jax.Array] = None  # (ncol, nlev), LW Jacobian


jax.tree_util.register_dataclass(
    Fluxes,
    data_fields=["flux_up", "flux_dn", "flux_net", "flux_dn_dir", "flux_up_jac"],
    meta_fields=[],
)


def sum_broadband(spectral_flux: jax.Array) -> jax.Array:
    """g-point sum (reference ``sum_broadband``,
    mo_fluxes_broadband_kernels.F90:32-57)."""
    return jnp.sum(spectral_flux, axis=-1)


def net_broadband(spectral_dn: jax.Array, spectral_up: jax.Array) -> jax.Array:
    """Net = down - up, summed over g-points (reference
    ``net_broadband_full``, mo_fluxes_broadband_kernels.F90:63-95)."""
    return jnp.sum(spectral_dn - spectral_up, axis=-1)


def _band_matrix(grid: SpectralGrid, dtype) -> jax.Array:
    """One-hot (ngpt, nband) projection; a band sum becomes a small matmul
    that XLA places on the MXU and fuses with the producer."""
    m = np.zeros((grid.ngpt, grid.nband), dtype=np.float32)
    m[np.arange(grid.ngpt), grid.gpt2band] = 1.0
    return jnp.asarray(m, dtype=dtype)


def sum_byband(spectral_flux: jax.Array, grid: SpectralGrid) -> jax.Array:
    """Per-band sums (reference ``sum_byband``,
    rte/extensions/mo_fluxes_byband.F90:159-190). (..., ngpt) -> (..., nband)."""
    return spectral_flux @ _band_matrix(grid, spectral_flux.dtype)


def net_byband(spectral_dn: jax.Array, spectral_up: jax.Array,
               grid: SpectralGrid) -> jax.Array:
    """Per-band net flux (reference ``net_byband_full``)."""
    return sum_byband(spectral_dn - spectral_up, grid)
