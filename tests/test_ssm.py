"""SSM optics tests: full gas-optics -> solver pipeline with no data files
(mirrors the role of reference examples/rte-examples + ssm driver paths)."""
import jax.numpy as jnp
import numpy as np
import pytest

from rte_rrtmgp_tpu import rte_lw, rte_sw
from rte_rrtmgp_tpu.models.ssm import (TSI_SSM, OpticsSSM, ssm_lw_defaults,
                                       ssm_sw_defaults)
from rte_rrtmgp_tpu.utils.profiles import rcemip_profiles

NCOL, NLAY = 4, 40
SIGMA = 5.670374419e-8


@pytest.fixture(scope="module")
def atmosphere():
    return rcemip_profiles(NCOL, NLAY)


def test_ssm_configure_defaults():
    lw = ssm_lw_defaults()
    assert lw.source_is_internal() and not lw.source_is_external()
    assert lw.grid.ngpt == 41
    assert lw.absorption_coeffs.shape == (2, 41)
    # h2o rotational triangle peaks at nu0=0 -> kappa decreasing from nu=50
    k_h2o = lw.absorption_coeffs[0]
    assert k_h2o[0] > k_h2o[10]
    sw = ssm_sw_defaults()
    assert sw.source_is_external()
    # TOA source normalized to TSI
    np.testing.assert_allclose(sw.toa_src.sum(), TSI_SSM, rtol=1e-12)


def test_ssm_configure_validation():
    nus = np.linspace(50.0, 3000.0, 11)
    with pytest.raises(ValueError, match="nu"):
        OpticsSSM.configure(("h2o",), [[1.0, 1.0, 100.0, 10.0]], nus, 100.0, 3500.0)
    with pytest.raises(ValueError, match="gas index"):
        OpticsSSM.configure(("h2o",), [[2.0, 1.0, 100.0, 10.0]], nus, 0.0, 3500.0)
    with pytest.raises(ValueError, match="kappa0"):
        OpticsSSM.configure(("h2o",), [[1.0, -1.0, 100.0, 10.0]], nus, 0.0, 3500.0)
    with pytest.raises(ValueError, match="molecular weight"):
        OpticsSSM.configure(("xe",), [[1.0, 1.0, 100.0, 10.0]], nus, 0.0, 3500.0)


def test_ssm_lw_end_to_end(atmosphere):
    play, plev, tlay, tlev, _, gas = atmosphere
    ssm = ssm_lw_defaults()
    props, sources = ssm.gas_optics_lw(play, plev, tlay,
                                       tsfc=np.full(NCOL, 295.0),
                                       gas_concs=gas, tlev=tlev)
    assert props.tau.shape == (NCOL, NLAY, 41)
    assert np.all(np.asarray(props.tau) >= 0)
    f = rte_lw(props, sources, np.ones((NCOL, 1)))
    olr = np.asarray(f.flux_up[:, 0])
    # OLR bounded by surface emission and must be substantial
    assert np.all(olr > 0.2 * SIGMA * 295.0 ** 4)
    assert np.all(olr < SIGMA * 300.0 ** 4)
    # greenhouse effect: surface upwelling exceeds OLR
    assert np.all(np.asarray(f.flux_up[:, -1]) > olr)
    # downwelling at TOA is zero
    np.testing.assert_allclose(np.asarray(f.flux_dn[:, 0]), 0.0, atol=1e-12)


def test_ssm_lw_requires_tlev(atmosphere):
    play, plev, tlay, tlev, _, gas = atmosphere
    ssm = ssm_lw_defaults()
    with pytest.raises(ValueError, match="tlev"):
        ssm.gas_optics_lw(play, plev, tlay, np.full(NCOL, 295.0), gas)


def test_ssm_sw_end_to_end(atmosphere):
    play, plev, tlay, tlev, _, gas = atmosphere
    ssm = ssm_sw_defaults()
    props, toa = ssm.gas_optics_sw(play, plev, tlay, gas)
    assert toa.shape == (NCOL, 41)
    np.testing.assert_allclose(np.asarray(toa.sum(-1)), TSI_SSM, rtol=1e-6)
    mu0 = np.full(NCOL, 0.7)
    alb = np.full((NCOL, 1), 0.1)
    f = rte_sw(props, mu0, toa, alb, alb)
    inc = TSI_SSM * 0.7
    np.testing.assert_allclose(np.asarray(f.flux_dn[:, 0]), inc, rtol=1e-6)
    # absorbing-only atmosphere: surface direct < TOA, up = albedo reflection
    assert np.all(np.asarray(f.flux_dn[:, -1]) < inc)
    assert np.all(np.asarray(f.flux_dn[:, -1]) > 0.3 * inc)


def test_ssm_pressure_broadening(atmosphere):
    """tau scales as p/pref; disabling pref removes the scaling."""
    play, plev, tlay, tlev, _, gas = atmosphere
    ssm = ssm_lw_defaults()
    import dataclasses
    ssm_nopb = dataclasses.replace(ssm, pref=0.0)
    p1, _ = ssm.gas_optics_lw(play, plev, tlay, np.full(NCOL, 295.0), gas, tlev=tlev)
    p2, _ = ssm_nopb.gas_optics_lw(play, plev, tlay, np.full(NCOL, 295.0), gas, tlev=tlev)
    ratio = np.asarray(p1.tau) / np.asarray(p2.tau)
    expected = np.broadcast_to((play / ssm.pref)[:, :, None], ratio.shape)
    np.testing.assert_allclose(ratio, expected, rtol=1e-12)


def test_ssm_cloud_optics():
    ssm = ssm_lw_defaults()
    clwp = np.zeros((NCOL, NLAY))
    clwp[:, 20] = 0.05  # kg/m2
    cld = ssm.cloud_optics(clwp, np.zeros((NCOL, NLAY)))
    tau = np.asarray(cld.tau)
    np.testing.assert_allclose(tau[:, 20, :], 1000.0 * 0.05 * 50.0)
    assert np.all(tau[:, :20, :] == 0)


def test_ssm_jit_compatible(atmosphere):
    import jax
    play, plev, tlay, tlev, _, gas = atmosphere
    ssm = ssm_lw_defaults()

    @jax.jit
    def run(play, plev, tlay, tsfc, gas, tlev):
        props, sources = ssm.gas_optics_lw(play, plev, tlay, tsfc, gas,
                                           tlev=tlev, top_at_1=True)
        f = rte_lw(props, sources, jnp.ones((NCOL, 1)))
        return f.flux_up

    up = run(play, plev, tlay, np.full(NCOL, 295.0), gas, tlev)
    eager_props, eager_src = ssm.gas_optics_lw(play, plev, tlay,
                                               np.full(NCOL, 295.0), gas,
                                               tlev=tlev)
    ref = rte_lw(eager_props, eager_src, np.ones((NCOL, 1)))
    # jit fuses/reassociates: agreement to ~1e-8 relative, not bitwise
    np.testing.assert_allclose(np.asarray(up), np.asarray(ref.flux_up),
                               rtol=1e-6)
