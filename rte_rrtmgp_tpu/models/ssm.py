"""SSM: the Simple Spectral Model gas optics.

TPU-native re-design of reference ssm/mo_optics_ssm.F90 (ty_optics_ssm)
and ssm/mo_optics_ssm_kernels.F90: a tiny gas-optics scheme on an explicit
wavenumber grid (one g-point per wavenumber "band") whose absorption
coefficients are sums of "triangles" of ln(kappa) per gas:

    kappa(gas, nu) = sum_over_triangles kappa0 * exp(-|nu - nu0| / l)

evaluated at configure time; at run time

    tau(col, lay, nu) = [sum_gas layer_mass(gas) * kappa(gas, nu)] * p/pref

which on TPU is a (ncol*nlay, ngas) x (ngas, nnu) matmul (MXU) fused with
the pressure-broadening scale. Planck sources are analytic B_nu; the SW
variant carries a normalized blackbody stellar spectrum.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants
from ..gas_concs import GasConcs
from ..optical_props import OpticalProps1scl, OpticalProps2str
from ..sources import SourcesLW
from ..spectral import SpectralGrid
from ..ops.planck import planck_source
from .base import infer_top_at_1

__all__ = ["OpticsSSM", "ssm_lw_defaults", "ssm_sw_defaults",
           "TSUN_SSM", "TSI_SSM"]

TSUN_SSM = 5760.0   # default stellar temperature [K] (mo_optics_ssm.F90:40)
TSI_SSM = 1360.0    # default total solar irradiance [W/m2] (:41)

MOL_WEIGHTS = {"h2o": 0.018, "co2": 0.044, "o3": 0.048}  # kg/mol (:43-45)

# default cloud optical properties (:47-54)
KAPPA_CLD_LW, KAPPA_CLD_SW = 50.0, 0.0001   # m2/kg
SSA_CLD_LW, SSA_CLD_SW = 0.0, 0.9999
G_CLD_LW, G_CLD_SW = 0.0, 0.85

_NNU_DEF = 41

# default spectroscopy (mo_optics_ssm.F90:72-85): rows of
# (gas_index[1-based], kappa0 [m2/kg], nu0 [cm-1], l [cm-1])
TRIANGLES_LW_DEF = np.array([
    [1.0, 282.0, 0.0, 64.0],       # h2o rotational band
    [1.0, 24.0, 1600.0, 52.0],     # h2o vibrational band
    [2.0, 110.0, 667.0, 12.0],     # co2 15-micron band
])
GASES_LW_DEF = ("h2o", "co2")
TRIANGLES_SW_DEF = np.array([
    [1.0, 1.0, 0.0, 1200.0],       # h2o
    [2.0, 0.0, 0.0, 1000000.0],    # o3 placeholder (no triangle yet)
])
GASES_SW_DEF = ("h2o", "o3")


@dataclasses.dataclass(frozen=True)
class OpticsSSM:
    """Configured SSM optics. Build with :func:`OpticsSSM.configure` or the
    ``ssm_lw_defaults`` / ``ssm_sw_defaults`` conveniences."""
    grid: SpectralGrid
    gas_names: tuple
    mol_weights: np.ndarray          # (ngas,)
    absorption_coeffs: np.ndarray    # (ngas, nnu) [m2/kg]
    nus: np.ndarray                  # (nnu,) [cm^-1]
    dnus: np.ndarray                 # (nnu,) band widths
    toa_src: np.ndarray              # (nnu,) [W/m2], zeros for LW
    tstar: float = 0.0
    tsi: float = 0.0
    pref: float = 500.0e2            # reference pressure [Pa] (:101)
    m_dry: float = 0.029             # [kg/mol] (:102)
    kappa_cld: float = 0.0
    g_cld: float = 0.0
    ssa_cld: float = 0.0

    # ------------------------------------------------------------------
    @staticmethod
    def configure(gas_names, triangle_params, nus, nu_min, nu_max,
                  tstar: float = 0.0, tsi: float = 0.0,
                  kappa_cld: float = 0.0, g_cld: float = 0.0,
                  ssa_cld: float = 0.0) -> "OpticsSSM":
        """Build from triangle spectroscopy (reference configure_with_values,
        mo_optics_ssm.F90:165-352)."""
        nus = np.asarray(nus, np.float64)
        tri = np.asarray(triangle_params, np.float64)
        nnu = nus.shape[0]
        ngas = len(gas_names)

        if not np.all((nus > nu_min) & (nus < nu_max)):
            raise ValueError("ssm: nus must lie strictly inside (nu_min, nu_max)")
        gi = tri[:, 0]
        if not np.all((gi >= 1) & (gi <= ngas) & (gi == np.floor(gi))):
            raise ValueError("ssm: gas index in triangle_params must be integer in 1..ngas")
        if np.any(tri[:, 1] < 0):
            raise ValueError("ssm: kappa0 must be >= 0")
        if np.any(tri[:, 3] <= 0):
            raise ValueError("ssm: triangle width l must be > 0")
        if tstar < 0 or tsi < 0:
            raise ValueError("ssm: tstar/tsi must be >= 0")

        # band edges at midpoints between nus (reference :259-270)
        edges_lo = np.empty(nnu)
        edges_hi = np.empty(nnu)
        mid = 0.5 * (nus[:-1] + nus[1:])
        edges_lo[0], edges_lo[1:] = nu_min, mid
        edges_hi[-1], edges_hi[:-1] = nu_max, mid
        grid = SpectralGrid.from_arrays(np.stack([edges_lo, edges_hi], -1))
        dnus = edges_hi - edges_lo

        mol_weights = np.empty(ngas)
        for i, name in enumerate(gas_names):
            key = name.strip().lower()
            if key not in MOL_WEIGHTS:
                raise ValueError(f"ssm: unknown molecular weight for gas '{name}'")
            mol_weights[i] = MOL_WEIGHTS[key]

        # kappa(gas, nu) = sum of triangles (reference :301-308)
        k = np.zeros((ngas, nnu))
        for row in tri:
            g = int(row[0]) - 1
            k[g] += row[1] * np.exp(-np.abs(nus - row[2]) / row[3])

        if tstar > 0:
            # normalized blackbody insolation (reference :313-324)
            src = np.asarray(planck_source(jnp.float64(tstar),
                                           jnp.asarray(nus), jnp.asarray(dnus)))
            toa = src * tsi / src.sum()
        else:
            toa = np.zeros(nnu)

        return OpticsSSM(grid=grid, gas_names=tuple(n.strip().lower() for n in gas_names),
                         mol_weights=mol_weights, absorption_coeffs=k,
                         nus=nus, dnus=dnus, toa_src=toa, tstar=tstar,
                         tsi=tsi, kappa_cld=kappa_cld, g_cld=g_cld,
                         ssa_cld=ssa_cld)

    # ------------------------------------------------------------------
    def source_is_internal(self) -> bool:
        return self.tstar <= 0.0

    def source_is_external(self) -> bool:
        return self.tstar > 0.0

    def press_min(self): return 0.0
    def press_max(self): return float("inf")
    def temp_min(self): return 0.0
    def temp_max(self): return float("inf")

    @property
    def ngpt(self) -> int:
        return self.grid.ngpt

    # ------------------------------------------------------------------
    def _layer_mass(self, plev, gas_concs: GasConcs, ncol, nlay, dtype):
        """(ncol, nlay, ngas) per-gas layer mass [kg/m2]
        (reference compute_layer_mass, mo_optics_ssm_kernels.F90:84-108):
        mass = vmr * (M_gas/M_dry) * |dp| / g. Gases absent from the store
        contribute zero (reference get_layer_mass :609-614)."""
        dp = jnp.abs(plev[:, 1:] - plev[:, :-1])
        cols = []
        for i, name in enumerate(self.gas_names):
            if name in gas_concs:
                vmr = gas_concs.get_vmr(name, ncol, nlay).astype(dtype)
            else:
                vmr = jnp.zeros((ncol, nlay), dtype)
            cols.append(vmr * (self.mol_weights[i] / self.m_dry))
        mmr = jnp.stack(cols, axis=-1)  # (ncol, nlay, ngas)
        return mmr * (dp / constants.grav)[:, :, None]

    def _compute_tau(self, play, plev, gas_concs: GasConcs):
        """tau = (layer_mass @ kappa) * p/pref (reference compute_tau,
        mo_optics_ssm_kernels.F90:29-82). The gas contraction is a matmul."""
        ncol, nlay = play.shape
        dtype = play.dtype
        mass = self._layer_mass(plev, gas_concs, ncol, nlay, dtype)
        k = jnp.asarray(self.absorption_coeffs, dtype)      # (ngas, nnu)
        tau = jnp.einsum("clg,gn->cln", mass, k,
                         preferred_element_type=dtype)
        if self.pref > 0:
            tau = tau * (play / self.pref)[:, :, None]
        return tau

    # ------------------------------------------------------------------
    def gas_optics_lw(self, play, plev, tlay, tsfc, gas_concs: GasConcs,
                      *, tlev=None, col_dry=None, scattering: bool = False,
                      top_at_1: Optional[bool] = None
                      ) -> Tuple[OpticalProps1scl, SourcesLW]:
        """LW optical depth + Planck sources (reference gas_optics_int,
        mo_optics_ssm.F90:359-453). ``tlev`` is required (reference :439-441)."""
        if not self.source_is_internal():
            raise ValueError("ssm: configured for external (SW) sources")
        if tlev is None:
            raise ValueError("ssm: tlev (level temperatures) is required")
        play = jnp.asarray(play)
        top = infer_top_at_1(play, top_at_1)
        tau = self._compute_tau(play, jnp.asarray(plev), gas_concs)
        dtype = tau.dtype
        nus = jnp.asarray(self.nus, dtype)
        dnus = jnp.asarray(self.dnus, dtype)
        sources = SourcesLW(
            lay_source=planck_source(jnp.asarray(tlay, dtype), nus, dnus),
            lev_source=planck_source(jnp.asarray(tlev, dtype), nus, dnus),
            sfc_source=planck_source(jnp.asarray(tsfc, dtype), nus, dnus),
            sfc_source_jac=jnp.zeros((play.shape[0], self.ngpt), dtype),
            grid=self.grid)
        if scattering:
            props = OpticalProps2str(tau=tau, ssa=jnp.zeros_like(tau),
                                     g=jnp.zeros_like(tau), grid=self.grid,
                                     top_at_1=top)
        else:
            props = OpticalProps1scl(tau=tau, grid=self.grid, top_at_1=top)
        return props, sources

    def gas_optics_sw(self, play, plev, tlay, gas_concs: GasConcs,
                      *, col_dry=None, scattering: bool = True,
                      top_at_1: Optional[bool] = None
                      ) -> Tuple[OpticalProps2str, jax.Array]:
        """SW optical depth + TOA stellar source (reference gas_optics_ext,
        mo_optics_ssm.F90:460-534)."""
        if not self.source_is_external():
            raise ValueError("ssm: configured for internal (LW) sources")
        play = jnp.asarray(play)
        top = infer_top_at_1(play, top_at_1)
        tau = self._compute_tau(play, jnp.asarray(plev), gas_concs)
        ncol = play.shape[0]
        toa = jnp.broadcast_to(jnp.asarray(self.toa_src, tau.dtype)[None, :],
                               (ncol, self.ngpt))
        if scattering:
            props = OpticalProps2str(tau=tau, ssa=jnp.zeros_like(tau),
                                     g=jnp.zeros_like(tau), grid=self.grid,
                                     top_at_1=top)
            return props, toa
        return OpticalProps1scl(tau=tau, grid=self.grid, top_at_1=top), toa

    # ------------------------------------------------------------------
    def cloud_optics(self, clwp, ciwp, reliq=None, deice=None,
                     *, scattering: bool = True,
                     top_at_1: bool = True) -> OpticalProps2str:
        """Gray cloud optics: tau = 1000 (lwp+iwp) kappa_cld with scalar
        ssa/g (reference cloud_optics, mo_optics_ssm.F90:540-585; particle
        sizes are accepted and ignored, matching the reference)."""
        clwp = jnp.asarray(clwp)
        ciwp = jnp.asarray(ciwp)
        tau = (1000.0 * (clwp + ciwp) * self.kappa_cld)[:, :, None]
        tau = jnp.broadcast_to(tau, clwp.shape + (self.ngpt,))
        if not scattering:
            return OpticalProps1scl(tau=tau * (1.0 - self.ssa_cld),
                                    grid=self.grid, top_at_1=top_at_1)
        return OpticalProps2str(tau=tau,
                                ssa=jnp.full_like(tau, self.ssa_cld),
                                g=jnp.full_like(tau, self.g_cld),
                                grid=self.grid, top_at_1=top_at_1)


def ssm_lw_defaults() -> OpticsSSM:
    """Default LW configuration (reference configure_with_defaults,
    mo_optics_ssm.F90:125-145): h2o/co2 triangles on 41 wavenumbers in
    [50, 3000] cm^-1 with limits [0, 3500]."""
    nus = np.linspace(50.0, 3000.0, _NNU_DEF)
    return OpticsSSM.configure(GASES_LW_DEF, TRIANGLES_LW_DEF, nus,
                               0.0, 3500.0,
                               kappa_cld=KAPPA_CLD_LW, g_cld=G_CLD_LW,
                               ssa_cld=SSA_CLD_LW)


def ssm_sw_defaults() -> OpticsSSM:
    """Default SW configuration: h2o/o3 on 41 wavenumbers in
    [1000, 45000] cm^-1 with limits [0, 50000], Tstar=5760 K, TSI=1360."""
    nus = np.linspace(1000.0, 45000.0, _NNU_DEF)
    return OpticsSSM.configure(GASES_SW_DEF, TRIANGLES_SW_DEF, nus,
                               0.0, 50000.0, tstar=TSUN_SSM, tsi=TSI_SSM,
                               kappa_cld=KAPPA_CLD_SW, g_cld=G_CLD_SW,
                               ssa_cld=SSA_CLD_SW)
