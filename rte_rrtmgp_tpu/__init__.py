"""rte_rrtmgp_tpu: a TPU-native radiative-transfer framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of
RTE+RRTMGP (earth-system-radiation/rte-rrtmgp): RTE's longwave/shortwave
flux solvers, RRTMGP's correlated-k gas optics with cloud and aerosol
optics, the SSM simple spectral model, and the extension set - built
around pytrees, pure functions, ``lax.scan`` vertical recurrences, Pallas
kernels for the hot paths, and column sharding over TPU device meshes.
"""

from .config import RTEConfig, checks_disabled, get_config, set_checks, set_dtype
from .spectral import SpectralGrid
from .optical_props import (OpticalProps1scl, OpticalProps2str, OpticalPropsNstr,
                            delta_scale, increment, subset, to_1scl, validate)
from .sources import SourcesLW, subset_sources
from .gas_concs import GasConcs
from .fluxes import Fluxes, sum_broadband, net_broadband, sum_byband, net_byband
from .rte import rte_lw, rte_sw

__version__ = "0.1.0"
