"""Minimal netCDF reading + rrtmgp-data loaders.

The reference leaves file I/O to the user and ships example loaders
(rrtmgp/data-loading-examples/mo_optics_utils_rrtmgp.F90:100-410). This
module provides the same capability against the rrtmgp-data archive
(k-distributions, cloud optics, MERRA aerosol optics) without a netCDF4
dependency: netCDF-4 files are HDF5 (read via h5py), classic netCDF-3
via scipy.io.netcdf_file.

Axis note: the Fortran loaders list dimensions fastest-first; numpy reads
C-order (reversed). All transposes to the layouts expected by
``KDist.from_raw`` / ``CloudOpticsRRTMGP.load`` / ``AerosolOpticsMERRA.load``
happen here.
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np

__all__ = ["NCFile", "load_gas_optics", "load_cloud_optics",
           "load_aerosol_optics", "load_solar_variability",
           "rrtmgp_data_path"]


def rrtmgp_data_path() -> Optional[str]:
    """Directory of the rrtmgp-data archive, from $RRTMGP_DATA (the
    reference uses the same env var)."""
    p = os.environ.get("RRTMGP_DATA")
    return p if p and os.path.isdir(p) else None


class NCFile:
    """Uniform read-only access to netCDF-3 (scipy) / netCDF-4 (h5py)."""

    def __init__(self, path: str):
        self.path = path
        with open(path, "rb") as f:
            magic = f.read(4)
        if magic[:3] == b"CDF":
            from scipy.io import netcdf_file
            self._nc = netcdf_file(path, mmap=False)
            self._h5 = None
        else:
            import h5py
            self._h5 = h5py.File(path, "r")
            self._nc = None

    def close(self) -> None:
        """Release the underlying file handle (loaders call this; the
        object is also a context manager)."""
        if self._nc is not None:
            self._nc.close()
        elif self._h5 is not None:
            self._h5.close()
        self._nc = self._h5 = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False

    def has(self, name: str) -> bool:
        if self._nc is not None:
            return name in self._nc.variables
        return name in self._h5

    def dim(self, name: str) -> int:
        if self._nc is not None:
            return int(self._nc.dimensions[name])
        # h5py: netCDF4 dims are stored as scalar datasets w/ CLASS=DIMENSION_SCALE
        d = self._h5[name]
        return int(d.shape[0]) if d.shape else int(d[()])

    def var(self, name: str) -> np.ndarray:
        if self._nc is not None:
            v = self._nc.variables[name]
            # scipy's netcdf_variable rejects [:] on dimensionless vars
            arr = np.array(v.getValue() if v.data.ndim == 0 else v[:])
        else:
            arr = np.array(self._h5[name][...])
        # scipy's netCDF-3 reader returns big-endian arrays, which JAX
        # rejects; normalize to native byte order
        if arr.dtype.byteorder == ">":
            arr = arr.astype(arr.dtype.newbyteorder("="))
        return arr

    def attr(self, var: str, name: str, default=None):
        """Attribute of a variable (e.g. 'units'), decoded to str."""
        if self._nc is not None:
            val = getattr(self._nc.variables[var], name, default)
        else:
            val = self._h5[var].attrs.get(name, default)
        if isinstance(val, bytes):
            val = val.decode()
        return val

    def strings(self, name: str) -> list:
        """Character-array variable -> list of python strings."""
        raw = self.var(name)
        if raw.dtype.kind in ("S", "U"):
            if raw.ndim == 1:
                # strip like the 2-D char-array branch: fixed-width
                # string variables are space-padded too
                return [(s.decode() if isinstance(s, bytes) else str(s)
                         ).strip() for s in raw]
            out = []
            for row in raw:
                chars = [c.decode() if isinstance(c, bytes) else str(c)
                         for c in row]
                out.append("".join(chars).strip())
            return out
        raise ValueError(f"{name}: not a character variable")


def load_gas_optics(path: str, available_gases, dtype=None):
    """Load a k-distribution file into a KDist (reference load_gas_optics,
    mo_optics_utils_rrtmgp.F90:100-220)."""
    import jax.numpy as jnp

    from ..models.rrtmgp.kdist import KDist

    dtype = dtype or jnp.float32
    f = NCFile(path)

    def v(name):
        return f.var(name)

    # C-order shapes (reversed from the Fortran fastest-first lists)
    kmajor = v("kmajor")                    # (ntemp, npres+1, neta, ngpt)
    kmajor = np.transpose(kmajor, (0, 2, 1, 3))    # -> (ntemp, neta, npres+1, ngpt)
    kwargs = dict(
        gas_names=f.strings("gas_names"),
        key_species=np.transpose(v("key_species"), (2, 1, 0)),
        band_lims_gpt=v("bnd_limits_gpt"),
        band_lims_wvn=v("bnd_limits_wavenumber"),
        press_ref=v("press_ref"),
        press_ref_trop=float(v("press_ref_trop")),
        temp_ref=v("temp_ref"),
        vmr_ref=np.transpose(v("vmr_ref"), (2, 1, 0)),
        kmajor=kmajor,
        kminor_lower=v("kminor_lower"),     # (ntemp, neta, ncont) C-order
        kminor_upper=v("kminor_upper"),
        gas_minor=f.strings("gas_minor"),
        identifier_minor=f.strings("identifier_minor"),
        minor_gases_lower=f.strings("minor_gases_lower"),
        minor_gases_upper=f.strings("minor_gases_upper"),
        minor_limits_gpt_lower=v("minor_limits_gpt_lower"),
        minor_limits_gpt_upper=v("minor_limits_gpt_upper"),
        minor_scales_with_density_lower=v("minor_scales_with_density_lower").astype(bool),
        minor_scales_with_density_upper=v("minor_scales_with_density_upper").astype(bool),
        scaling_gas_lower=f.strings("scaling_gas_lower"),
        scaling_gas_upper=f.strings("scaling_gas_upper"),
        scale_by_complement_lower=v("scale_by_complement_lower").astype(bool),
        scale_by_complement_upper=v("scale_by_complement_upper").astype(bool),
        kminor_start_lower=v("kminor_start_lower"),
        kminor_start_upper=v("kminor_start_upper"),
    )
    if f.has("rayl_lower"):
        kwargs["rayl_lower"] = v("rayl_lower")   # (ntemp, neta, ngpt)
        kwargs["rayl_upper"] = v("rayl_upper")
    if f.has("totplnk"):
        kwargs["totplnk"] = v("totplnk").T       # file C (nbnd, nplnk)
        pf = v("plank_fraction")
        kwargs["planck_frac"] = np.transpose(pf, (0, 2, 1, 3))
        kwargs["optimal_angle_fit"] = v("optimal_angle_fit").T
    if f.has("solar_source_quiet"):
        kwargs["solar_quiet"] = v("solar_source_quiet")
        kwargs["solar_facular"] = v("solar_source_facular")
        kwargs["solar_sunspot"] = v("solar_source_sunspot")
        kwargs["tsi_default"] = float(v("tsi_default"))
        kwargs["mg_default"] = float(v("mg_default"))
        kwargs["sb_default"] = float(v("sb_default"))
    f.close()
    return KDist.from_raw(available_gases, dtype=dtype, **kwargs)


def load_cloud_optics(path: str, dtype=None):
    """Load cloud-optics LUTs (reference load_cloud_optics,
    mo_optics_utils_rrtmgp.F90:270-330)."""
    import jax.numpy as jnp

    from ..models.rrtmgp.cloud_optics import CloudOpticsRRTMGP

    dtype = dtype or jnp.float32
    f = NCFile(path)
    # Fortran (nsize, nspec[, nrgh]) fastest-first -> C reversed
    extliq = f.var("extliq").T
    ssaliq = f.var("ssaliq").T
    asyliq = f.var("asyliq").T
    extice = np.transpose(f.var("extice"), (2, 1, 0))
    ssaice = np.transpose(f.var("ssaice"), (2, 1, 0))
    asyice = np.transpose(f.var("asyice"), (2, 1, 0))
    band_lims_gpt = f.var("bnd_limits_gpt") if f.has("bnd_limits_gpt") else None
    out = CloudOpticsRRTMGP.load(
        f.var("bnd_limits_wavenumber"),
        float(f.var("radliq_lwr")), float(f.var("radliq_upr")),
        float(f.var("diamice_lwr")), float(f.var("diamice_upr")),
        extliq, ssaliq, asyliq, extice, ssaice, asyice,
        band_lims_gpt=band_lims_gpt, dtype=dtype)
    f.close()
    return out


def load_aerosol_optics(path: str, dtype=None):
    """Load MERRA aerosol LUTs (reference load_aerosol_optics,
    mo_optics_utils_rrtmgp.F90:360-410)."""
    import jax.numpy as jnp

    from ..models.rrtmgp.aerosol_optics import AerosolOpticsMERRA

    dtype = dtype or jnp.float32

    f = NCFile(path)

    def rv(name):  # reverse C-order to Fortran fastest-first order
        a = f.var(name)
        return np.transpose(a, tuple(reversed(range(a.ndim))))

    out = AerosolOpticsMERRA.load(
        f.var("bnd_limits_wavenumber"),
        rv("merra_aero_bin_lims"), f.var("aero_rh"),
        rv("aero_dust_tbl"),
        np.transpose(rv("aero_salt_tbl"), (1, 0, 2, 3)),  # -> (nrh, nval, nbin, nbnd)
        np.transpose(rv("aero_sulf_tbl"), (1, 0, 2)),
        rv("aero_bcar_tbl"),
        np.transpose(rv("aero_bcar_rh_tbl"), (1, 0, 2)),
        rv("aero_ocar_tbl"),
        np.transpose(rv("aero_ocar_rh_tbl"), (1, 0, 2)),
        dtype=dtype)
    f.close()
    return out


def load_solar_variability(path: str) -> np.ndarray:
    """Mean-solar-cycle facular/sunspot index table from the archive's
    rrtmgp-solar-var-tables.nc: variable ``solar_var_avgcyc`` with dims
    (n_solar_frac, n_solar_terms=2) in C order, returned as the
    (2, n_solar_frac) [mg; sb] layout ``SolarVariability`` takes (the
    reference reads it Fortran-order as (nsolarterms, nsolarfrac),
    mo_solar_variability.F90:47-96)."""
    f = NCFile(path)
    tbl = np.asarray(f.var("solar_var_avgcyc"), np.float64).T
    f.close()
    if tbl.shape[0] != 2:
        raise ValueError(
            f"{path}: solar_var_avgcyc must be (n_solar_frac, 2), "
            f"got transposed shape {tbl.shape}")
    return tbl
