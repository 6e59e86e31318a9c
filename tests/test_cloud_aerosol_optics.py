"""Cloud and aerosol optics tests with synthetic lookup tables."""
import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from rte_rrtmgp_tpu import OpticalProps2str, increment, rte_lw, rte_sw
from rte_rrtmgp_tpu.models.rrtmgp.cloud_optics import CloudOpticsRRTMGP
from rte_rrtmgp_tpu.models.rrtmgp.aerosol_optics import (
    AerosolOpticsMERRA, MERRA_AERO_DUST, MERRA_AERO_NONE, MERRA_AERO_SALT,
    MERRA_AERO_SULF, MERRA_AERO_BCAR, get_relhum)

NBND = 2
BAND_WVN = [[10.0, 1000.0], [1000.0, 3000.0]]
NCOL, NLAY = 4, 6


@pytest.fixture(scope="module")
def cloud_optics():
    nsize_liq, nsize_ice, nrgh = 10, 12, 3
    rng = np.random.default_rng(3)
    # monotone-ish smooth tables
    extliq = rng.uniform(1e-2, 2e-2, (nsize_liq, NBND))
    ssaliq = rng.uniform(0.4, 0.9, (nsize_liq, NBND))
    asyliq = rng.uniform(0.6, 0.9, (nsize_liq, NBND))
    extice = rng.uniform(1e-2, 2e-2, (nsize_ice, NBND, nrgh))
    ssaice = rng.uniform(0.4, 0.9, (nsize_ice, NBND, nrgh))
    asyice = rng.uniform(0.6, 0.9, (nsize_ice, NBND, nrgh))
    return CloudOpticsRRTMGP.load(
        BAND_WVN, 2.5, 21.5, 10.0, 180.0,
        extliq, ssaliq, asyliq, extice, ssaice, asyice, dtype=jnp.float64)


def test_cloud_optics_liquid_only_table_interp(cloud_optics):
    co = cloud_optics
    clwp = np.zeros((NCOL, NLAY)); clwp[0, 2] = 50.0
    reliq = np.zeros((NCOL, NLAY)); reliq[0, 2] = 7.3
    zero = np.zeros((NCOL, NLAY))
    props = co.cloud_optics(clwp, zero, reliq, zero)
    # direct table interpolation check (scalar, independent math)
    step = co.liq_step_size
    pos = (7.3 - co.radliq_lwr) / step
    i0 = int(np.floor(pos)); fint = pos - i0
    extliq = np.asarray(co.extliq)
    ssaliq = np.asarray(co.ssaliq)
    asyliq = np.asarray(co.asyliq)
    for b in range(NBND):
        ext = extliq[i0, b] + fint * (extliq[i0 + 1, b] - extliq[i0, b])
        ssa = ssaliq[i0, b] + fint * (ssaliq[i0 + 1, b] - ssaliq[i0, b])
        asy = asyliq[i0, b] + fint * (asyliq[i0 + 1, b] - asyliq[i0, b])
        np.testing.assert_allclose(float(props.tau[0, 2, b]), 50.0 * ext, rtol=1e-12)
        np.testing.assert_allclose(float(props.ssa[0, 2, b]), ssa, rtol=1e-12)
        np.testing.assert_allclose(float(props.g[0, 2, b]), asy, rtol=1e-12)
    # no cloud elsewhere
    assert float(jnp.sum(props.tau)) == pytest.approx(float(jnp.sum(props.tau[0, 2])))


def test_cloud_optics_mixed_phase_combination(cloud_optics):
    """liquid+ice combine via tau/taussa/taussag sums (reference :408-424)."""
    co = cloud_optics
    clwp = np.full((NCOL, NLAY), 20.0)
    ciwp = np.full((NCOL, NLAY), 30.0)
    reliq = np.full((NCOL, NLAY), 10.0)
    dgice = np.full((NCOL, NLAY), 50.0)
    both = co.cloud_optics(clwp, ciwp, reliq, dgice)
    zero = np.zeros((NCOL, NLAY))
    liq = co.cloud_optics(clwp, zero, reliq, zero)
    ice = co.cloud_optics(zero, ciwp, zero, dgice)
    np.testing.assert_allclose(np.asarray(both.tau),
                               np.asarray(liq.tau + ice.tau), rtol=1e-12)
    ts = np.asarray(liq.tau * liq.ssa + ice.tau * ice.ssa)
    np.testing.assert_allclose(np.asarray(both.ssa * both.tau), ts, rtol=1e-12)
    tsg = np.asarray(liq.tau * liq.ssa * liq.g + ice.tau * ice.ssa * ice.g)
    np.testing.assert_allclose(np.asarray(both.g * both.ssa * both.tau), tsg,
                               rtol=1e-10)


def test_cloud_optics_absorption_only(cloud_optics):
    co = cloud_optics
    clwp = np.full((NCOL, NLAY), 20.0)
    ciwp = np.full((NCOL, NLAY), 30.0)
    reliq = np.full((NCOL, NLAY), 10.0)
    dgice = np.full((NCOL, NLAY), 50.0)
    two = co.cloud_optics(clwp, ciwp, reliq, dgice)
    one = co.cloud_optics(clwp, ciwp, reliq, dgice, scattering=False)
    np.testing.assert_allclose(np.asarray(one.tau),
                               np.asarray(two.tau * (1 - two.ssa)), rtol=1e-10)


def test_cloud_optics_ice_roughness(cloud_optics):
    co = cloud_optics
    assert co.num_ice_roughness_types() == 3
    ciwp = np.full((NCOL, NLAY), 30.0)
    dgice = np.full((NCOL, NLAY), 50.0)
    zero = np.zeros((NCOL, NLAY))
    a = co.cloud_optics(zero, ciwp, zero, dgice)
    b = co.set_ice_roughness(2).cloud_optics(zero, ciwp, zero, dgice)
    assert not np.allclose(np.asarray(a.tau), np.asarray(b.tau))
    with pytest.raises(ValueError, match="roughness"):
        co.set_ice_roughness(4)


def test_cloud_optics_bounds_validation(cloud_optics):
    co = cloud_optics
    clwp = np.full((NCOL, NLAY), 20.0)
    reliq = np.full((NCOL, NLAY), 100.0)   # out of [2.5, 21.5]
    zero = np.zeros((NCOL, NLAY))
    with pytest.raises(ValueError, match="radius"):
        co.validate_inputs(clwp, zero, reliq, zero)


def test_cloud_increment_into_gpt_props(cloud_optics):
    """Band-resolved cloud props increment g-point gas props (the
    inc_*_bybnd path of the all-sky pipeline)."""
    from rte_rrtmgp_tpu import SpectralGrid
    ggrid = SpectralGrid.from_arrays(BAND_WVN, [[1, 3], [4, 6]])
    rng = np.random.default_rng(0)
    gas = OpticalProps2str(tau=jnp.asarray(rng.uniform(0.1, 1, (NCOL, NLAY, 6))),
                           ssa=jnp.zeros((NCOL, NLAY, 6)),
                           g=jnp.zeros((NCOL, NLAY, 6)), grid=ggrid)
    clwp = np.full((NCOL, NLAY), 20.0)
    reliq = np.full((NCOL, NLAY), 10.0)
    zero = np.zeros((NCOL, NLAY))
    cld = cloud_optics.cloud_optics(clwp, zero, reliq, zero)
    total = increment(gas, cld)
    # band value broadcast to that band's g-points
    np.testing.assert_allclose(
        np.asarray(total.tau[..., 0] - gas.tau[..., 0]),
        np.asarray(cld.tau[..., 0]), rtol=1e-12)
    np.testing.assert_allclose(
        np.asarray(total.tau[..., 4] - gas.tau[..., 4]),
        np.asarray(cld.tau[..., 1]), rtol=1e-12)


# ---------------------------------------------------------------------------
# aerosols
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def aerosol_optics():
    nbin, nrh = 3, 5
    rng = np.random.default_rng(7)
    bin_lims = np.array([[0.1, 1.1, 3.1], [1.0, 3.0, 10.0]])
    aero_rh = np.linspace(0.0, 1.0, nrh)

    def tbl(*shape):
        t = rng.uniform(0.2, 1.0, shape)
        t[..., 0, :] = rng.uniform(100.0, 1000.0, t[..., 0, :].shape)  # ext m2/kg
        return t

    # file order: dust (nval, nbin, nbnd); salt (nrh, nval, nbin, nbnd); etc.
    dust = np.moveaxis(tbl(nbin, 3, NBND), 1, 0)
    salt = np.moveaxis(tbl(nrh, nbin, 3, NBND), 2, 1)
    sulf = np.moveaxis(tbl(nrh, 3, NBND), 1, 1)
    bcar = tbl(3, NBND)
    bcar_rh = np.moveaxis(tbl(nrh, 3, NBND), 1, 1)
    ocar = tbl(3, NBND)
    ocar_rh = np.moveaxis(tbl(nrh, 3, NBND), 1, 1)
    return AerosolOpticsMERRA.load(BAND_WVN, bin_lims, aero_rh,
                                   dust, salt, sulf, bcar, bcar_rh,
                                   ocar, ocar_rh, dtype=jnp.float64)


def test_aerosol_none_gives_zero(aerosol_optics):
    atype = np.zeros((NCOL, NLAY), int)
    z = np.zeros((NCOL, NLAY))
    props = aerosol_optics.aerosol_optics(atype, z, z, z)
    assert float(jnp.sum(props.tau)) == 0.0


def test_aerosol_dust_size_bins(aerosol_optics):
    ao = aerosol_optics
    atype = np.full((NCOL, NLAY), MERRA_AERO_DUST)
    size = np.full((NCOL, NLAY), 0.5)    # bin 0
    mass = np.full((NCOL, NLAY), 3e-5)
    rh = np.full((NCOL, NLAY), 0.5)
    props = ao.aerosol_optics(atype, size, mass, rh)
    dust = np.asarray(ao.dust_tbl)       # (3, nbin, nbnd)
    np.testing.assert_allclose(np.asarray(props.tau[0, 0]),
                               3e-5 * dust[0, 0], rtol=1e-12)
    np.testing.assert_allclose(np.asarray(props.ssa[0, 0]), dust[1, 0], rtol=1e-12)
    np.testing.assert_allclose(np.asarray(props.g[0, 0]), dust[2, 0], rtol=1e-12)
    # different size -> different bin
    props2 = ao.aerosol_optics(atype, np.full((NCOL, NLAY), 5.0), mass, rh)
    np.testing.assert_allclose(np.asarray(props2.tau[0, 0]),
                               3e-5 * dust[0, 2], rtol=1e-12)


def test_aerosol_sulfate_rh_interp(aerosol_optics):
    ao = aerosol_optics
    atype = np.full((NCOL, NLAY), MERRA_AERO_SULF)
    z = np.zeros((NCOL, NLAY))
    mass = np.full((NCOL, NLAY), 1e-6)
    # rh exactly halfway between grid points 1 (0.25) and 2 (0.5)
    rh = np.full((NCOL, NLAY), 0.375)
    props = ao.aerosol_optics(atype, z + 0.2, mass, rh)
    sulf = np.asarray(ao.sulf_tbl)       # (3, nrh, nbnd)
    expect_ext = 0.5 * (sulf[0, 1] + sulf[0, 2])
    np.testing.assert_allclose(np.asarray(props.tau[0, 0]),
                               1e-6 * expect_ext, rtol=1e-12)
    # rh on a grid point exactly
    props2 = ao.aerosol_optics(atype, z + 0.2, mass, np.full((NCOL, NLAY), 0.25))
    np.testing.assert_allclose(np.asarray(props2.tau[0, 0]),
                               1e-6 * sulf[0, 1], rtol=1e-12)


def test_aerosol_hydrophobic_constant_in_rh(aerosol_optics):
    ao = aerosol_optics
    atype = np.full((NCOL, NLAY), MERRA_AERO_BCAR)
    z = np.zeros((NCOL, NLAY))
    # size must be in the bin table even for species that ignore it:
    # the reference's check_values gate bounds aero_size for every
    # active cell (mo_aerosol_optics_rrtmgp_merra.F90:344-347)
    size = np.full((NCOL, NLAY), 0.5)
    mass = np.full((NCOL, NLAY), 1e-6)
    a = ao.aerosol_optics(atype, size, mass, z + 0.1)
    b = ao.aerosol_optics(atype, size, mass, z + 0.9)
    np.testing.assert_array_equal(np.asarray(a.tau), np.asarray(b.tau))


def test_aerosol_mixed_types_per_cell(aerosol_optics):
    ao = aerosol_optics
    atype = np.zeros((NCOL, NLAY), int)
    atype[0, 0] = MERRA_AERO_DUST
    atype[1, 1] = MERRA_AERO_SULF
    atype[2, 2] = MERRA_AERO_SALT
    size = np.full((NCOL, NLAY), 0.5)
    mass = np.full((NCOL, NLAY), 1e-5)
    rh = np.full((NCOL, NLAY), 0.3)
    props = ao.aerosol_optics(atype, size, mass, rh)
    tau = np.asarray(props.tau)
    assert np.all(tau[0, 0] > 0) and np.all(tau[1, 1] > 0) and np.all(tau[2, 2] > 0)
    mask = atype == 0
    assert np.all(tau[mask] == 0.0)


def test_get_relhum_reasonable():
    play = np.full((2, 3), 8e4)
    tlay = np.full((2, 3), 290.0)
    vmr = np.full((2, 3), 8e-3)
    rh = np.asarray(get_relhum(jnp.asarray(play), jnp.asarray(tlay),
                               jnp.asarray(vmr)))
    assert np.all((rh > 0.1) & (rh < 1.5))
