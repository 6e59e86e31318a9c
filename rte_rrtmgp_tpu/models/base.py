"""Abstract gas-optics interface.

TPU-first equivalent of the reference's abstract ``ty_gas_optics``
(rte/frontend/gas-optics-template/mo_gas_optics.F90:41-126): any optics
provider (RRTMGP, SSM, ...) carries its spectral grid and exposes

  * ``gas_optics_lw(play, plev, tlay, tsfc, gas_concs, tlev=...)``
      -> (OpticalProps, SourcesLW)   [internal sources / longwave]
  * ``gas_optics_sw(play, plev, tlay, gas_concs)``
      -> (OpticalProps, toa_src)     [external sources / shortwave]

plus validity-range inquiries. Providers are plain Python objects holding
static (numpy) configuration and device-replicated (jnp) lookup tables;
their methods are pure and jit-traceable.
"""
from __future__ import annotations

from typing import Protocol, Tuple, runtime_checkable

import jax

from ..gas_concs import GasConcs
from ..optical_props import OpticalProps
from ..sources import SourcesLW
from ..spectral import SpectralGrid


@runtime_checkable
class GasOptics(Protocol):
    grid: SpectralGrid

    def source_is_internal(self) -> bool: ...
    def source_is_external(self) -> bool: ...
    def press_min(self) -> float: ...
    def press_max(self) -> float: ...
    def temp_min(self) -> float: ...
    def temp_max(self) -> float: ...

    def gas_optics_lw(self, play, plev, tlay, tsfc, gas_concs: GasConcs,
                      *, tlev=None, col_dry=None,
                      scattering: bool = False,
                      top_at_1=None) -> Tuple[OpticalProps, SourcesLW]: ...

    def gas_optics_sw(self, play, plev, tlay, gas_concs: GasConcs,
                      *, col_dry=None, scattering: bool = True,
                      top_at_1=None) -> Tuple[OpticalProps, jax.Array]: ...


def infer_top_at_1(play, top_at_1):
    """Data-driven vertical orientation (reference infers it from pressure
    ordering, mo_gas_optics_rrtmgp.F90:258): top_at_1 iff pressure increases
    with layer index. Requires concrete values; under jit, pass top_at_1
    explicitly."""
    if top_at_1 is not None:
        return bool(top_at_1)
    import numpy as np
    if isinstance(play, jax.core.Tracer):
        raise ValueError(
            "gas_optics: cannot infer vertical orientation from traced "
            "pressures; pass top_at_1=... explicitly under jit")
    p = np.asarray(play)
    return bool(p[0, 0] < p[0, -1])
