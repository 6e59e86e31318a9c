"""RFMIP clear-sky driver tests (reference examples/rfmip-clear-sky).

Uses the synthetic RFMIP-shaped problem (analytic RCEMIP profiles +
perturbed GHGs); when $RRTMGP_DATA points at the rrtmgp-data archive and an
RFMIP input file is present, also exercises the real netCDF path.
"""
import numpy as np
import pytest

from rte_rrtmgp_tpu.drivers.rfmip import (determine_gas_names, rfmip_lw,
                                          rfmip_lw_sw, rfmip_sw,
                                          synthetic_rfmip, unblock,
                                          write_fluxes)
from rte_rrtmgp_tpu.models.rrtmgp.gas_optics import GasOpticsRRTMGP
from rte_rrtmgp_tpu.utils.compare import compare_fields
from rte_rrtmgp_tpu.utils.synthetic import synthetic_kdist

NSITE, NLAY, NEXP = 6, 20, 3


@pytest.fixture(scope="module")
def data():
    return synthetic_rfmip(NSITE, NLAY, NEXP)


@pytest.fixture(scope="module")
def gas_lw():
    return GasOpticsRRTMGP(synthetic_kdist(sw=False, ngpt=32, nbnd=4,
                                           ntemp=6, npres=12))


@pytest.fixture(scope="module")
def gas_sw():
    return GasOpticsRRTMGP(synthetic_kdist(sw=True, ngpt=32, nbnd=4,
                                           ntemp=6, npres=12))


def test_determine_gas_names():
    kd, fl = determine_gas_names(("h2o", "co2", "o3", "n2o"), 1)
    assert kd == ("h2o", "co2", "o3", "n2o")
    assert fl == ("h2o", "carbon_dioxide", "o3", "nitrous_oxide")
    kd2, fl2 = determine_gas_names((), 2)
    assert "cfc11" in kd2 and "cfc11eq" in fl2
    with pytest.raises(ValueError):
        determine_gas_names((), 4)


def test_rfmip_lw_blocked_equals_unblocked(data, gas_lw):
    """Block decomposition is exact (reference blocks are exactly
    independent columns)."""
    up_all, dn_all = rfmip_lw(data, gas_lw)
    up_blk, dn_blk = rfmip_lw(data, gas_lw, block_size=NSITE)
    assert up_all.shape == (NSITE * NEXP, NLAY + 1)
    np.testing.assert_allclose(up_blk, up_all, rtol=2e-6, atol=1e-5)
    np.testing.assert_allclose(dn_blk, dn_all, rtol=2e-6, atol=1e-5)
    assert np.all(np.isfinite(up_all)) and np.all(up_all > 0)
    # experiments differ (GHG scaling changes OLR)
    by_exp = unblock(data, up_all)
    olr = by_exp[:, :, 0].mean(axis=1)
    assert olr.std() > 1e-3


def test_rfmip_sw_nighttime_zeroed(data, gas_sw):
    up, dn = rfmip_sw(data, gas_sw)
    night = np.asarray(data.sza) >= 90.0 - 2e-5
    assert night.any() and (~night).any()
    assert np.all(up[night] == 0.0) and np.all(dn[night] == 0.0)
    assert np.all(up[~night] >= 0.0)
    # TSI normalization: TOA down = tsi * mu0 for daytime columns
    mu0 = np.cos(np.deg2rad(data.sza[~night]))
    np.testing.assert_allclose(dn[~night][:, 0], data.tsi[~night] * mu0,
                               rtol=1e-4)


def test_rfmip_lw_sw_combined_equals_split(data, gas_lw, gas_sw):
    """The single-launch combined driver (one dispatch + one readback;
    the round-4 RFMIP throughput path) must match the split LW/SW drivers
    exactly, including its block decomposition."""
    rlu, rld, rsu, rsd = rfmip_lw_sw(data, gas_lw, gas_sw)
    lu, ld = rfmip_lw(data, gas_lw)
    su, sd = rfmip_sw(data, gas_sw)
    np.testing.assert_allclose(rlu, lu, rtol=2e-6, atol=1e-5)
    np.testing.assert_allclose(rld, ld, rtol=2e-6, atol=1e-5)
    np.testing.assert_allclose(rsu, su, rtol=2e-6, atol=1e-5)
    np.testing.assert_allclose(rsd, sd, rtol=2e-6, atol=1e-5)
    blk = rfmip_lw_sw(data, gas_lw, gas_sw, block_size=NSITE)
    for a, b in zip(blk, (rlu, rld, rsu, rsd)):
        np.testing.assert_allclose(a, b, rtol=2e-6, atol=1e-5)


def test_write_and_compare_roundtrip(tmp_path, data, gas_lw):
    up, dn = rfmip_lw(data, gas_lw)
    p = str(tmp_path / "rlu.nc")
    write_fluxes(p, "rlu", data, up)
    from scipy.io import netcdf_file
    with netcdf_file(p, "r") as f:
        back = np.array(f.variables["rlu"][:])
    assert back.shape == (NEXP, NSITE, NLAY + 1)
    np.testing.assert_allclose(back, unblock(data, up), rtol=1e-6)
    assert compare_fields(back, unblock(data, up), "rlu",
                          failure_threshold=3.5e-1)
    assert not compare_fields(back + 1.0, unblock(data, up), "rlu",
                              failure_threshold=3.5e-1, verbose=False)


def test_rfmip_with_ssm_scheme(data):
    """The RFMIP driver accepts any optics provider (the reference
    dispatches SSM vs RRTMGP by executable name)."""
    from rte_rrtmgp_tpu.models.ssm import ssm_lw_defaults, ssm_sw_defaults

    up, dn = rfmip_lw(data, ssm_lw_defaults())
    assert up.shape == (NSITE * NEXP, NLAY + 1)
    assert np.all(np.isfinite(up)) and np.all(up > 0)
    su, sd = rfmip_sw(data, ssm_sw_defaults())
    assert np.all(np.isfinite(su))
