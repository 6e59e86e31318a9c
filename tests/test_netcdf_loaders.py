"""Round-trip tests for every netCDF reader against synthetic files that
reproduce the rrtmgp-data / RFMIP archives' exact variable names, dim
orders, and units attributes.

The file layouts written here mirror what the reference Fortran loaders
read (fastest-dim-first lists reversed to C order as stored in netCDF):
  - load_gas_optics: mo_optics_utils_rrtmgp.F90:100-243 — e.g. kmajor is
    read as (ngpt, nmixingfracs, npress+1, ntemp) Fortran, i.e. stored
    with C-order dims (temperature, pressure_interp, mixing_fraction, gpt).
  - load_cloud_optics: mo_optics_utils_rrtmgp.F90:251-335.
  - load_aerosol_optics: mo_optics_utils_rrtmgp.F90:340-410.
  - RFMIP reader: mo_rfmip_io.F90:71-190, 315-437 (units-attr scaling).

A wrong transpose in rte_rrtmgp_tpu/utils/netcdf.py or drivers/rfmip.py
makes these tests fail; loading a file must reproduce the object built by
calling from_raw/load directly on the raw arrays.
"""
import os

import numpy as np
import pytest
import jax.numpy as jnp

from rte_rrtmgp_tpu.utils.netcdf import (load_gas_optics, load_cloud_optics,
                                         load_aerosol_optics)
from rte_rrtmgp_tpu.utils.synthetic import (GASES_FULL, synthetic_kdist,
                                            synthetic_kdist_raw)


# ---------------------------------------------------------------------------
# netCDF-3 writer (scipy) — enough to fake the archive files
# ---------------------------------------------------------------------------

def write_nc(path, variables, attrs=None, strlen=32):
    """Write dict name -> ndarray (or (ndarray, dimnames)) as netCDF-3.

    String lists become (n, strlen) char arrays like the archive's
    gas_names et al. Scalars become dimensionless variables. ``attrs``
    maps varname -> {attr: value}.
    """
    from scipy.io import netcdf_file

    f = netcdf_file(str(path), "w")
    dims = {}

    def ensure_dim(name, size):
        if name not in dims:
            f.createDimension(name, size)
            dims[name] = size
        assert dims[name] == size, f"dim {name}: {dims[name]} != {size}"

    counter = [0]

    def anon_dims(shape):
        names = []
        for s in shape:
            # reuse an anonymous dim of the right size when possible
            nm = f"d{s}_{counter[0]}"
            counter[0] += 1
            names.append(nm)
            ensure_dim(nm, s)
        return tuple(names)

    for name, spec in variables.items():
        dimnames = None
        if isinstance(spec, tuple) and isinstance(spec[1], (tuple, list)):
            arr, dimnames = spec
        else:
            arr = spec
        if isinstance(arr, (list,)) and arr and isinstance(arr[0], str):
            # character array (n, strlen)
            chars = np.full((len(arr), strlen), b" ", dtype="S1")
            for i, s in enumerate(arr):
                bs = s.encode()[:strlen]
                chars[i, :len(bs)] = np.frombuffer(bs, dtype="S1")
            ensure_dim(f"n_{name}", len(arr))
            ensure_dim(f"strlen{strlen}", strlen)
            v = f.createVariable(name, "S1", (f"n_{name}", f"strlen{strlen}"))
            v[:] = chars
            continue
        arr = np.asarray(arr)
        if arr.dtype == bool:
            arr = arr.astype(np.int32)
        if arr.dtype.kind == "i":
            arr = arr.astype(np.int32)
            code = "i"
        else:
            arr = arr.astype(np.float64)
            code = "d"
        if dimnames is not None:
            for nm, s in zip(dimnames, arr.shape):
                ensure_dim(nm, s)
        else:
            dimnames = anon_dims(arr.shape)
        v = f.createVariable(name, code, dimnames)
        if arr.ndim == 0:
            v.data[()] = arr      # scipy's assignValue chokes on 0-d arrays
        else:
            v[:] = arr
        for a, val in (attrs or {}).get(name, {}).items():
            setattr(v, a, val)
    f.close()


# ---------------------------------------------------------------------------
# k-distribution round trip
# ---------------------------------------------------------------------------

def kdist_raw_to_file_vars(raw):
    """Map from_raw-convention arrays to the archive's on-disk C-order
    layouts (inverting every transpose in load_gas_optics)."""
    v = {}
    # kmajor raw (ntemp, neta, npres+1, ngpt) -> file (ntemp, npres+1, neta, ngpt)
    v["kmajor"] = np.transpose(raw["kmajor"], (0, 2, 1, 3))
    v["key_species"] = np.transpose(raw["key_species"], (2, 1, 0))
    v["bnd_limits_gpt"] = np.asarray(raw["band_lims_gpt"], np.int32)
    v["bnd_limits_wavenumber"] = raw["band_lims_wvn"]
    v["press_ref"] = raw["press_ref"]
    v["press_ref_trop"] = np.float64(raw["press_ref_trop"])
    v["temp_ref"] = raw["temp_ref"]
    # unused-by-load but present in the archive
    v["absorption_coefficient_ref_P"] = np.float64(1.0)
    v["absorption_coefficient_ref_T"] = np.float64(296.0)
    v["vmr_ref"] = np.transpose(raw["vmr_ref"], (2, 1, 0))
    v["kminor_lower"] = raw["kminor_lower"]   # (ntemp, neta, ncont) both sides
    v["kminor_upper"] = raw["kminor_upper"]
    v["gas_names"] = list(raw["gas_names"])
    v["gas_minor"] = list(raw["gas_minor"])
    v["identifier_minor"] = list(raw["identifier_minor"])
    v["minor_gases_lower"] = list(raw["minor_gases_lower"])
    v["minor_gases_upper"] = list(raw["minor_gases_upper"])
    v["minor_limits_gpt_lower"] = np.asarray(raw["minor_limits_gpt_lower"], np.int32)
    v["minor_limits_gpt_upper"] = np.asarray(raw["minor_limits_gpt_upper"], np.int32)
    for k in ("minor_scales_with_density_lower", "minor_scales_with_density_upper",
              "scale_by_complement_lower", "scale_by_complement_upper"):
        v[k] = np.asarray(raw[k], np.int32)
    v["scaling_gas_lower"] = [s if s else "" for s in raw["scaling_gas_lower"]]
    v["scaling_gas_upper"] = [s if s else "" for s in raw["scaling_gas_upper"]]
    v["kminor_start_lower"] = np.asarray(raw["kminor_start_lower"], np.int32)
    v["kminor_start_upper"] = np.asarray(raw["kminor_start_upper"], np.int32)
    if "rayl_lower" in raw:
        v["rayl_lower"] = raw["rayl_lower"]
        v["rayl_upper"] = raw["rayl_upper"]
    if "totplnk" in raw:
        v["totplnk"] = np.asarray(raw["totplnk"]).T           # file (nbnd, nplnk)
        v["plank_fraction"] = np.transpose(raw["planck_frac"], (0, 2, 1, 3))
        v["optimal_angle_fit"] = np.asarray(raw["optimal_angle_fit"]).T
    if "solar_quiet" in raw:
        v["solar_source_quiet"] = raw["solar_quiet"]
        v["solar_source_facular"] = raw["solar_facular"]
        v["solar_source_sunspot"] = raw["solar_sunspot"]
        v["tsi_default"] = np.float64(raw["tsi_default"])
        v["mg_default"] = np.float64(raw["mg_default"])
        v["sb_default"] = np.float64(raw["sb_default"])
    return v


def assert_pytrees_equal(a, b, path="root"):
    """Recursive equality over dataclasses / tuples / dicts / arrays."""
    import dataclasses

    assert type(a) is type(b), f"{path}: {type(a)} vs {type(b)}"
    if dataclasses.is_dataclass(a) and not isinstance(a, type):
        for fld in dataclasses.fields(a):
            assert_pytrees_equal(getattr(a, fld.name), getattr(b, fld.name),
                                 f"{path}.{fld.name}")
    elif isinstance(a, dict):
        assert a.keys() == b.keys(), f"{path}: keys differ"
        for k in a:
            assert_pytrees_equal(a[k], b[k], f"{path}[{k!r}]")
    elif isinstance(a, (tuple, list)) and not hasattr(a, "shape"):
        assert len(a) == len(b), f"{path}: len {len(a)} vs {len(b)}"
        for i, (x, y) in enumerate(zip(a, b)):
            assert_pytrees_equal(x, y, f"{path}[{i}]")
    elif hasattr(a, "shape") or isinstance(a, (int, float, complex, np.number)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=path)
    else:
        assert a == b, f"{path}: {a!r} != {b!r}"


@pytest.mark.parametrize("sw", [False, True], ids=["lw", "sw"])
def test_gas_optics_roundtrip(tmp_path, sw):
    raw = synthetic_kdist_raw(sw=sw, ngpt=32, nbnd=4, ntemp=5, npres=8, neta=9)
    path = tmp_path / ("kdist_sw.nc" if sw else "kdist_lw.nc")
    write_nc(path, kdist_raw_to_file_vars(raw))
    kd_file = load_gas_optics(str(path), GASES_FULL, dtype=jnp.float32)
    kd_direct = synthetic_kdist(sw=sw, ngpt=32, nbnd=4, ntemp=5, npres=8,
                                neta=9, dtype=jnp.float32)
    assert_pytrees_equal(kd_file, kd_direct)


def test_gas_optics_roundtrip_gas_subset(tmp_path):
    """Gas filtering must behave identically through the file path."""
    raw = synthetic_kdist_raw(sw=False, ngpt=32, nbnd=4, ntemp=5, npres=8)
    path = tmp_path / "kdist.nc"
    write_nc(path, kdist_raw_to_file_vars(raw))
    from rte_rrtmgp_tpu.models.rrtmgp.kdist import KDist
    subset = ("h2o", "co2", "o3", "ch4", "n2o", "co", "o2", "n2")[:5]
    kd_file = load_gas_optics(str(path), subset, dtype=jnp.float32)
    kd_direct = KDist.from_raw(subset, dtype=jnp.float32, **raw)
    assert_pytrees_equal(kd_file, kd_direct)


# ---------------------------------------------------------------------------
# cloud optics round trip
# ---------------------------------------------------------------------------

def test_cloud_optics_roundtrip(tmp_path):
    from rte_rrtmgp_tpu.models.rrtmgp.cloud_optics import CloudOpticsRRTMGP

    rng = np.random.default_rng(3)
    nbnd, nsl, nsi, nrgh = 4, 7, 6, 3
    edges = np.linspace(10.0, 3250.0, nbnd + 1)
    blw = np.stack([edges[:-1], edges[1:]], axis=1)
    extliq = rng.uniform(5e-3, 4e-2, (nsl, nbnd))
    ssaliq = rng.uniform(0.4, 0.9999, (nsl, nbnd))
    asyliq = rng.uniform(0.6, 0.95, (nsl, nbnd))
    extice = rng.uniform(5e-3, 4e-2, (nsi, nbnd, nrgh))
    ssaice = rng.uniform(0.4, 0.9999, (nsi, nbnd, nrgh))
    asyice = rng.uniform(0.6, 0.95, (nsi, nbnd, nrgh))

    path = tmp_path / "clouds.nc"
    # file C-order: 2-D (nband, nsize), 3-D (nrghice, nband, nsize)
    write_nc(path, {
        "radliq_lwr": np.float64(2.5), "radliq_upr": np.float64(21.5),
        "diamice_lwr": np.float64(10.0), "diamice_upr": np.float64(180.0),
        "extliq": (extliq.T, ("nband", "nsize_liq")),
        "ssaliq": (ssaliq.T, ("nband", "nsize_liq")),
        "asyliq": (asyliq.T, ("nband", "nsize_liq")),
        "extice": (np.transpose(extice, (2, 1, 0)), ("nrghice", "nband", "nsize_ice")),
        "ssaice": (np.transpose(ssaice, (2, 1, 0)), ("nrghice", "nband", "nsize_ice")),
        "asyice": (np.transpose(asyice, (2, 1, 0)), ("nrghice", "nband", "nsize_ice")),
        "bnd_limits_wavenumber": (blw, ("nband", "pair")),
    })
    co_file = load_cloud_optics(str(path), dtype=jnp.float32)
    co_direct = CloudOpticsRRTMGP.load(blw, 2.5, 21.5, 10.0, 180.0,
                                       extliq, ssaliq, asyliq,
                                       extice, ssaice, asyice,
                                       dtype=jnp.float32)
    assert_pytrees_equal(co_file, co_direct)


# ---------------------------------------------------------------------------
# aerosol optics round trip
# ---------------------------------------------------------------------------

def test_aerosol_optics_roundtrip(tmp_path):
    from rte_rrtmgp_tpu.models.rrtmgp.aerosol_optics import AerosolOpticsMERRA

    rng = np.random.default_rng(5)
    nbnd, nbin, nrh, nval = 4, 5, 9, 3
    edges = np.linspace(10.0, 3250.0, nbnd + 1)
    blw = np.stack([edges[:-1], edges[1:]], axis=1)
    bin_edges = np.logspace(-1, 1, nbin + 1)
    bin_lims = np.stack([bin_edges[:-1], bin_edges[1:]])   # (2, nbin) Fortran
    rh = np.linspace(0.0, 0.99, nrh)
    # Fortran-convention tables as the reference %load receives them
    dust = rng.uniform(0.1, 2.0, (nval, nbin, nbnd))
    salt = rng.uniform(0.1, 2.0, (nval, nrh, nbin, nbnd))
    sulf = rng.uniform(0.1, 2.0, (nval, nrh, nbnd))
    bcar = rng.uniform(0.1, 2.0, (nval, nbnd))
    bcar_rh = rng.uniform(0.1, 2.0, (nval, nrh, nbnd))
    ocar = rng.uniform(0.1, 2.0, (nval, nbnd))
    ocar_rh = rng.uniform(0.1, 2.0, (nval, nrh, nbnd))

    frev = lambda a: np.transpose(a, tuple(reversed(range(a.ndim))))
    path = tmp_path / "aerosols.nc"
    write_nc(path, {
        "bnd_limits_wavenumber": (blw, ("nband", "pair")),
        "merra_aero_bin_lims": (frev(bin_lims), ("nbin", "pair")),
        "aero_rh": (rh, ("nrh",)),
        "aero_dust_tbl": (frev(dust), ("nband", "nbin", "nval")),
        "aero_salt_tbl": (frev(salt), ("nband", "nbin", "nrh", "nval")),
        "aero_sulf_tbl": (frev(sulf), ("nband", "nrh", "nval")),
        "aero_bcar_tbl": (frev(bcar), ("nband", "nval")),
        "aero_bcar_rh_tbl": (frev(bcar_rh), ("nband", "nrh", "nval")),
        "aero_ocar_tbl": (frev(ocar), ("nband", "nval")),
        "aero_ocar_rh_tbl": (frev(ocar_rh), ("nband", "nrh", "nval")),
    })
    ao_file = load_aerosol_optics(str(path), dtype=jnp.float32)
    ao_direct = AerosolOpticsMERRA.load(
        blw, bin_lims, rh, dust,
        np.moveaxis(salt, 0, 1),      # loader API: (nrh, nval, nbin, nbnd)
        np.moveaxis(sulf, 0, 1),
        bcar, np.moveaxis(bcar_rh, 0, 1),
        ocar, np.moveaxis(ocar_rh, 0, 1), dtype=jnp.float32)
    assert_pytrees_equal(ao_file, ao_direct)


# ---------------------------------------------------------------------------
# RFMIP reader round trip
# ---------------------------------------------------------------------------

def test_rfmip_reader_roundtrip(tmp_path):
    from rte_rrtmgp_tpu.drivers.rfmip import read_rfmip

    rng = np.random.default_rng(11)
    nexp, nsite, nlay = 3, 8, 12
    play = np.sort(rng.uniform(1e2, 1e5, (nsite, nlay)), axis=1)[:, ::-1]
    plev = np.sort(rng.uniform(50.0, 1.05e5, (nsite, nlay + 1)), axis=1)[:, ::-1]
    tlay = rng.uniform(200.0, 310.0, (nexp, nsite, nlay))
    tlev = rng.uniform(200.0, 310.0, (nexp, nsite, nlay + 1))
    tsfc = rng.uniform(280.0, 305.0, (nexp, nsite))
    emis = rng.uniform(0.9, 1.0, nsite)
    alb = rng.uniform(0.05, 0.3, nsite)
    tsi = rng.uniform(1360.0, 1362.0, nsite)
    sza = rng.uniform(0.0, 120.0, nsite)
    h2o = rng.uniform(1e-6, 2e-2, (nexp, nsite, nlay))     # stored scaled by 1
    o3 = rng.uniform(1.0, 9.0, (nexp, nsite, nlay))        # units 1e-6
    co2 = rng.uniform(280.0, 1120.0, nexp)                 # units 1e-6
    ch4 = rng.uniform(300.0, 2000.0, nexp)                 # units 1e-9

    path = tmp_path / "rfmip.nc"
    write_nc(path, {
        "pres_layer": (play, ("site", "layer")),
        "pres_level": (plev, ("site", "level")),
        "temp_layer": (tlay, ("expt", "site", "layer")),
        "temp_level": (tlev, ("expt", "site", "level")),
        "surface_temperature": (tsfc, ("expt", "site")),
        "surface_emissivity": (emis, ("site",)),
        "surface_albedo": (alb, ("site",)),
        "total_solar_irradiance": (tsi, ("site",)),
        "solar_zenith_angle": (sza, ("site",)),
        "water_vapor": (h2o, ("expt", "site", "layer")),
        "ozone": (o3, ("expt", "site", "layer")),
        "carbon_dioxide_GM": (co2, ("expt",)),
        "methane_GM": (ch4, ("expt",)),
    }, attrs={
        "water_vapor": {"units": "1"},
        "ozone": {"units": "1e-06"},
        "carbon_dioxide_GM": {"units": "1e-06"},
        "methane_GM": {"units": "1e-09"},
    })

    data = read_rfmip(str(path), ("h2o", "co2", "ch4", "o3", "no2"),
                      dtype=np.float64)
    assert data.nsite == nsite and data.nexp == nexp
    ncol = nexp * nsite
    # column index = iexp * nsite + isite (reference Fortran reshape order,
    # mo_rfmip_io.F90:145-149: columns fastest within each experiment)
    np.testing.assert_allclose(data.play, np.tile(play, (nexp, 1)), rtol=1e-12)
    np.testing.assert_allclose(data.plev, np.tile(plev, (nexp, 1)), rtol=1e-12)
    np.testing.assert_allclose(data.tlay, tlay.reshape(ncol, nlay), rtol=1e-12)
    np.testing.assert_allclose(data.tlev, tlev.reshape(ncol, nlay + 1), rtol=1e-12)
    np.testing.assert_allclose(data.sfc_t, tsfc.reshape(-1), rtol=1e-12)
    np.testing.assert_allclose(data.sfc_emis, np.tile(emis, nexp), rtol=1e-12)
    np.testing.assert_allclose(data.sfc_alb, np.tile(alb, nexp), rtol=1e-12)
    np.testing.assert_allclose(data.tsi, np.tile(tsi, nexp), rtol=1e-12)
    np.testing.assert_allclose(data.sza, np.tile(sza, nexp), rtol=1e-12)
    # gas scalings from the units attr (reference read_scaling :422-437)
    np.testing.assert_allclose(
        np.asarray(data.gas_concs.get_vmr("h2o", ncol, nlay)),
        h2o.reshape(ncol, nlay), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(data.gas_concs.get_vmr("o3", ncol, nlay)),
        o3.reshape(ncol, nlay) * 1e-6, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(data.gas_concs.get_vmr("co2", ncol, nlay)),
        np.repeat(co2 * 1e-6, nsite)[:, None] * np.ones((1, nlay)), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(data.gas_concs.get_vmr("ch4", ncol, nlay)),
        np.repeat(ch4 * 1e-9, nsite)[:, None] * np.ones((1, nlay)), rtol=1e-6)
    # no2 is known to the k-distribution but absent from RFMIP -> zero
    np.testing.assert_array_equal(
        np.asarray(data.gas_concs.get_vmr("no2", ncol, nlay)), 0.0)


# ---------------------------------------------------------------------------
# the ONE real archive-format file available in this environment: the
# reference's in-tree solar-variability table. Reading it through the real
# netCDF machinery validates the reader against a genuine archive file
# rather than synthetic ones (reference mo_solar_variability.F90:47-96).
# ---------------------------------------------------------------------------

_SOLAR_NC = ("/root/reference/rte/extensions/solar_variability/"
             "rrtmgp-solar-var-tables.nc")


@pytest.mark.skipif(not os.path.exists(_SOLAR_NC),
                    reason="reference tree not available")
def test_real_solar_var_file_matches_packaged_npz():
    from rte_rrtmgp_tpu.extensions.solar_variability import (_DATA,
                                                             SolarVariability)
    from rte_rrtmgp_tpu.utils.netcdf import load_solar_variability

    tbl = load_solar_variability(_SOLAR_NC)
    assert tbl.shape == (2, 134)   # (terms, n_solar_frac): cycles 13-24 mean
    packaged = np.load(_DATA)["solar_var_avgcyc"].T
    np.testing.assert_array_equal(tbl, packaged)

    # drive the interpolation off the freshly-read real file and compare
    # with the packaged-table default path at several cycle fractions
    sv_nc = SolarVariability(tbl)
    sv_np = SolarVariability()
    for frac in (0.0, 0.0037, 0.25, 0.5, 0.77, 1.0):
        assert sv_nc.indices(frac) == sv_np.indices(frac)
    mg, sb = sv_nc.indices(0.5)
    # mid-cycle: facular index above the NRLSSI2 quiet-sun offset 0.1496,
    # sunspot index (SPOT67 units) positive
    assert 0.1496 < mg < 0.2 and sb > 0.0
