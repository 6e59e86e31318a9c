"""MERRA2/GOCART aerosol optics.

TPU-native equivalent of reference ``ty_aerosol_optics_rrtmgp_merra``
(rrtmgp/frontend/mo_aerosol_optics_rrtmgp_merra.F90): per-cell aerosol
*type* dispatch over 7 GOCART species with size-bin selection (dust/salt)
and relative-humidity interpolation (hydrophilic species). The reference's
per-cell select/case becomes: evaluate each species' (tau, taussa, taussag)
branch vectorized — each is a cheap masked gather — and combine with
``jnp.select`` on the type field. Tables are stored value-major
(ext/ssa/g = axis 0) exactly as the data files provide.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ...optical_props import OpticalProps, OpticalProps1scl, OpticalProps2str
from ...spectral import SpectralGrid

__all__ = ["AerosolOpticsMERRA", "MERRA_AERO_NONE", "MERRA_AERO_DUST",
           "MERRA_AERO_SALT", "MERRA_AERO_SULF", "MERRA_AERO_BCAR_RH",
           "MERRA_AERO_BCAR", "MERRA_AERO_OCAR_RH", "MERRA_AERO_OCAR",
           "MERRA_NTYPE", "get_relhum"]

# aerosol type codes (reference :43-52)
MERRA_NTYPE = 7
MERRA_AERO_NONE = 0
MERRA_AERO_DUST = 1
MERRA_AERO_SALT = 2
MERRA_AERO_SULF = 3
MERRA_AERO_BCAR_RH = 4
MERRA_AERO_BCAR = 5
MERRA_AERO_OCAR_RH = 6
MERRA_AERO_OCAR = 7

_EXT, _SSA, _G = 0, 1, 2


@dataclasses.dataclass(frozen=True)
class AerosolOpticsMERRA:
    grid: SpectralGrid
    bin_lims: np.ndarray        # (2, nbin) size-bin limits [microns], static
    aero_rh: np.ndarray         # (nrh,) RH grid, static
    dust_tbl: jax.Array         # (3, nbin, nbnd)        [ext/ssa/g, ...]
    salt_tbl: jax.Array         # (3, nrh, nbin, nbnd)
    sulf_tbl: jax.Array         # (3, nrh, nbnd)
    bcar_tbl: jax.Array         # (3, nbnd)
    bcar_rh_tbl: jax.Array      # (3, nrh, nbnd)
    ocar_tbl: jax.Array         # (3, nbnd)
    ocar_rh_tbl: jax.Array      # (3, nrh, nbnd)

    # ------------------------------------------------------------------
    @staticmethod
    def load(band_lims_wvn, merra_aero_bin_lims, aero_rh,
             aero_dust_tbl, aero_salt_tbl, aero_sulf_tbl,
             aero_bcar_tbl, aero_bcar_rh_tbl,
             aero_ocar_tbl, aero_ocar_rh_tbl,
             dtype=jnp.float32) -> "AerosolOpticsMERRA":
        """Build from LUTs (reference load_lut :96-165). Table layouts
        follow the reference's in-memory order: dust (nval, nbin, nbnd),
        salt (nrh, nval, nbin, nbnd), sulfate/bcar_rh/ocar_rh
        (nrh, nval, nbnd), bcar/ocar (nval, nbnd) with nval = 3 = ext/ssa/g.
        Stored here value-major."""
        grid = SpectralGrid.from_arrays(band_lims_wvn)

        def vm(a, val_axis):
            return jnp.asarray(np.moveaxis(np.asarray(a), val_axis, 0), dtype)

        return AerosolOpticsMERRA(
            grid=grid,
            bin_lims=np.asarray(merra_aero_bin_lims, np.float64).reshape(2, -1),
            aero_rh=np.asarray(aero_rh, np.float64),
            dust_tbl=vm(aero_dust_tbl, 0),
            salt_tbl=vm(aero_salt_tbl, 1),
            sulf_tbl=vm(aero_sulf_tbl, 1),
            bcar_tbl=vm(aero_bcar_tbl, 0),
            bcar_rh_tbl=vm(aero_bcar_rh_tbl, 1),
            ocar_tbl=vm(aero_ocar_tbl, 0),
            ocar_rh_tbl=vm(aero_ocar_rh_tbl, 1))

    @property
    def nbin(self): return self.bin_lims.shape[1]
    @property
    def nrh(self): return self.aero_rh.shape[0]
    @property
    def nbnd(self): return self.grid.nband

    # ------------------------------------------------------------------
    def _maybe_validate(self, aero_type, aero_size, relhum) -> None:
        """Reference bounds checks (mo_aerosol_optics_rrtmgp_merra.F90
        :344-347): aerosol size within the bin table for any cell with a
        nonzero type, relative humidity in [0, 1]. Repo convention
        (rte.py): run eagerly when value checks are on; skipped for
        traced values (out-of-range sizes would otherwise silently fall
        back to size bin 0)."""
        import jax as _j
        from ...config import get_config
        if not get_config().check_values:
            return
        if any(isinstance(x, _j.core.Tracer)
               for x in (aero_type, aero_size, relhum)):
            return
        atype = np.asarray(aero_type)
        size = np.broadcast_to(np.asarray(aero_size), atype.shape)
        rh = np.broadcast_to(np.asarray(relhum), atype.shape)
        lims = np.asarray(self.bin_lims)
        active = atype > 0      # reference masks both checks by aeromsk
        if np.any((size[active] < lims[0, 0])
                  | (size[active] > lims[1, -1])):
            raise ValueError("aerosol optics: requested aerosol size is "
                             "out of bounds")
        if np.any((rh[active] < 0.0) | (rh[active] > 1.0)):
            raise ValueError("aerosol optics: relative humidity "
                             "fraction is out of bounds")

    def aerosol_optics(self, aero_type, aero_size, aero_mass, relhum, *,
                       scattering: bool = True,
                       top_at_1: bool = True) -> OpticalProps:
        """Aerosol optical properties by band (reference aerosol_optics
        :233-430). aero_type: (ncol, nlay) int codes; aero_size [microns];
        aero_mass [kg/m2]; relhum in [0, 1]."""
        tau, taussa, taussag = self._tau_triplet(aero_type, aero_size,
                                                 aero_mass, relhum)
        if not scattering:
            return OpticalProps1scl(tau=tau - taussa, grid=self.grid,
                                    top_at_1=top_at_1)
        eps = jnp.finfo(tau.dtype).eps
        return OpticalProps2str(
            tau=tau,
            ssa=taussa / jnp.maximum(eps, tau),
            g=taussag / jnp.maximum(eps, taussa),
            grid=self.grid, top_at_1=top_at_1)

    def aerosol_optics_lanes(self, aero_type, aero_size, aero_mass, relhum):
        """(tau, tau*ssa, tau*ssa*g) BY BAND in lane layout
        (nbnd, nlay, ncol) — the same contract as
        CloudOpticsRRTMGP.cloud_optics_lanes, for the fused pipeline."""
        tau, taussa, taussag = self._tau_triplet(aero_type, aero_size,
                                                 aero_mass, relhum)
        lane = lambda x: jnp.transpose(x, (2, 1, 0))
        return lane(tau), lane(taussa), lane(taussag)

    def _row_table(self):
        """The flattened (species, rh, bin) row table + per-species row
        offsets, built ONCE per instance (it depends only on the frozen
        LUTs; rebuilding it on every call repeated seven moveaxis/
        reshape ops + a concatenate per timestep in eager use)."""
        cached = getattr(self, "_row_table_cache", None)
        if cached is not None:
            return cached
        nbnd, nbin, nrh = self.nbnd, self.nbin, self.nrh
        rows = [jnp.zeros((1, 3, nbnd), self.dust_tbl.dtype)]
        off = {}

        def add(name, block):
            off[name] = sum(r.shape[0] for r in rows)
            rows.append(block)

        add("dust", jnp.moveaxis(self.dust_tbl, 0, 1))          # (nbin, 3, nbnd)
        add("salt", jnp.moveaxis(self.salt_tbl, 0, 2)           # (nrh*nbin, 3, nbnd)
            .reshape(nrh * nbin, 3, nbnd))
        add("sulf", jnp.moveaxis(self.sulf_tbl, 0, 1))          # (nrh, 3, nbnd)
        add("bcar_rh", jnp.moveaxis(self.bcar_rh_tbl, 0, 1))
        add("bcar", self.bcar_tbl[None])                        # (1, 3, nbnd)
        add("ocar_rh", jnp.moveaxis(self.ocar_rh_tbl, 0, 1))
        add("ocar", self.ocar_tbl[None])
        table = jnp.concatenate(rows, axis=0).reshape(-1, 3 * nbnd)
        cached = (table, off)
        import jax as _j
        if not isinstance(table, _j.core.Tracer):
            # cache only CONCRETE tables: when the instance crosses a
            # jit boundary as a pytree its leaves are tracers, and a
            # cached traced table would leak out of that trace
            object.__setattr__(self, "_row_table_cache", cached)
        return cached

    def _tau_triplet(self, aero_type, aero_size, aero_mass, relhum):
        """(tau, tau*ssa, tau*ssa*g), each (ncol, nlay, nbnd)."""
        self._maybe_validate(aero_type, aero_size, relhum)
        atype = jnp.asarray(aero_type, jnp.int32)
        size = jnp.asarray(aero_size)
        mass = jnp.asarray(aero_mass, size.dtype)
        rh = jnp.asarray(relhum, size.dtype)
        dtype = size.dtype
        nbnd = self.nbnd

        # --- size bin (last bin whose [lo, hi] contains size; ref :472-477) ---
        lims = self.bin_lims
        ibin = jnp.zeros(atype.shape, jnp.int32)
        for i in range(self.nbin):
            inbin = (size >= lims[0, i]) & (size <= lims[1, i])
            ibin = jnp.where(inbin, i, ibin)

        # --- RH interpolation indices (ref :481-494) ---
        rh_grid = jnp.asarray(self.aero_rh, dtype)
        # irh2 = first grid point >= rh (1 past while-loop); count grid < rh
        nbelow = jnp.sum(rh[..., None] > rh_grid[None, None, :], axis=-1)
        irh1 = jnp.where(nbelow == 0, 0, jnp.clip(nbelow, 1, self.nrh) - 1)
        irh2 = jnp.clip(nbelow, 0, self.nrh - 1)
        drh0 = jnp.take(rh_grid, irh2) - jnp.take(rh_grid, irh1)
        drh1 = rh - jnp.take(rh_grid, irh1)
        rdrh = jnp.where(irh1 == irh2, 0.0,
                         drh1 / jnp.where(irh1 == irh2, 1.0, drh0))

        # --- one gather from a flattened (species, rh, bin) row table ---
        # The reference's per-cell case dispatch would otherwise evaluate
        # every species' full (ncol, nlay, nbnd) field (the salt branch
        # alone materializes (3, nrh, ncol, nlay, nbnd) ~ GBs at
        # production sizes). Instead, the small LUTs are concatenated
        # into one (nrows, 3*nbnd) row table at row offsets known per
        # species, the per-cell (type, ibin, irh) state becomes TWO row
        # indices (the rh pair), and a pair of row gathers + the rh lerp
        # produces (ext, ssa, g) for every cell. Row 0 is zero (no/unknown
        # aerosol type). Numerics identical to the per-species branches.
        nbin, nrh = self.nbin, self.nrh
        table, off = self._row_table()

        def rows_of(irh):
            r = jnp.zeros(atype.shape, jnp.int32)
            for code, base, idx in (
                    (MERRA_AERO_DUST, off["dust"], ibin),
                    (MERRA_AERO_SALT, off["salt"], irh * nbin + ibin),
                    (MERRA_AERO_SULF, off["sulf"], irh),
                    (MERRA_AERO_BCAR_RH, off["bcar_rh"], irh),
                    (MERRA_AERO_BCAR, off["bcar"], 0),
                    (MERRA_AERO_OCAR_RH, off["ocar_rh"], irh),
                    (MERRA_AERO_OCAR, off["ocar"], 0)):
                r = jnp.where(atype == code, base + idx, r)
            return r

        lo = jnp.take(table, rows_of(irh1), axis=0)   # (ncol, nlay, 3*nbnd)
        hi = jnp.take(table, rows_of(irh2), axis=0)
        v = (lo + rdrh[..., None] * (hi - lo)).reshape(
            atype.shape + (3, nbnd))
        ext, ssa, g = v[..., _EXT, :], v[..., _SSA, :], v[..., _G, :]

        tau = mass[..., None] * ext
        taussa = tau * ssa
        taussag = taussa * g
        return tau, taussa, taussag


def get_relhum(play, tlay, vmr_h2o):
    """Layer relative humidity [0-1] from pressure/temperature/vmr
    (reference examples/all-sky/rrtmgp_allsky.F90:744-786 get_relhum).

    Works on numpy inputs without touching the device (host-side input
    builders stay free of eager device round-trips)."""
    from ... import constants
    xp = jnp if any(isinstance(a, jax.Array) for a in (play, tlay, vmr_h2o)) \
        else np
    mwd = constants.m_h2o / constants.m_dry
    t_ref = 273.16
    mmr = vmr_h2o * mwd
    q = mmr / (1.0 + mmr)
    q = xp.maximum(1.0e-7, q)
    es = xp.exp(17.67 * (tlay - t_ref) / (tlay - 29.65))
    return 0.01 * (0.263 * play * q) / es
