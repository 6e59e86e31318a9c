"""Planck source-function container for longwave radiation.

Replaces reference ``ty_source_func_lw`` (rte/frontend/mo_source_functions.F90:
30-49) with a plain pytree dataclass.
"""
from __future__ import annotations

import dataclasses

import jax

from .spectral import SpectralGrid

__all__ = ["SourcesLW", "subset_sources"]


@dataclasses.dataclass(frozen=True)
class SourcesLW:
    lay_source: jax.Array      # (ncol, nlay, ngpt)   Planck source at layer centers [W/m2]
    lev_source: jax.Array      # (ncol, nlay+1, ngpt) Planck source at layer edges [W/m2]
    sfc_source: jax.Array      # (ncol, ngpt)         surface source [W/m2]
    sfc_source_jac: jax.Array  # (ncol, ngpt)         d(sfc_source)/dT_sfc [W/m2/K]
    grid: SpectralGrid

    @property
    def ncol(self): return self.lay_source.shape[0]
    @property
    def nlay(self): return self.lay_source.shape[1]
    @property
    def ngpt(self): return self.lay_source.shape[2]


jax.tree_util.register_dataclass(
    SourcesLW,
    data_fields=["lay_source", "lev_source", "sfc_source", "sfc_source_jac"],
    meta_fields=["grid"],
)


def subset_sources(src: SourcesLW, start: int, n: int) -> SourcesLW:
    sl = slice(start, start + n)
    return SourcesLW(
        lay_source=src.lay_source[sl],
        lev_source=src.lev_source[sl],
        sfc_source=src.sfc_source[sl],
        sfc_source_jac=src.sfc_source_jac[sl],
        grid=src.grid,
    )
