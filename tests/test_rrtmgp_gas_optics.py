"""RRTMGP gas-optics tests: vectorized TPU implementation vs the plain-loop
numpy oracle on synthetic k-distributions, plus load-time transform checks
and LW/SW end-to-end pipeline sanity."""
import jax.numpy as jnp
import numpy as np
import pytest

from rte_rrtmgp_tpu import GasConcs, rte_lw, rte_sw
from rte_rrtmgp_tpu.models.rrtmgp.kdist import KDist
from rte_rrtmgp_tpu.models.rrtmgp.gas_optics import GasOpticsRRTMGP, get_col_dry
from rte_rrtmgp_tpu.ops.gas_optics import interpolation

from rrtmgp_synthetic import GASES, NGPT, sample_atmosphere, synthetic_raw
from rrtmgp_oracle import (oracle_interpolation, oracle_planck,
                           oracle_tau_absorption, oracle_tau_rayleigh)


@pytest.fixture(scope="module")
def kdist_lw():
    return KDist.from_raw(GASES, dtype=jnp.float64, **synthetic_raw(sw=False))


@pytest.fixture(scope="module")
def kdist_sw():
    return KDist.from_raw(GASES, dtype=jnp.float64, **synthetic_raw(sw=True))


@pytest.fixture(scope="module")
def atmos():
    play, plev, tlay, tlev, tsfc, vmr = sample_atmosphere()
    gas = GasConcs.empty()
    for k, v in vmr.items():
        gas = gas.set_vmr(k, v)
    return play, plev, tlay, tlev, tsfc, gas


def _col_gas(gop, play, plev, tlay, gas):
    """Returns col_gas in the oracle's (ncol, nlay, ngas+1) convention
    (production layout is gas-axis-leading for TPU tiling)."""
    col_gas, col_dry, idx_h2o = gop._col_gas(
        jnp.asarray(play), jnp.asarray(plev), jnp.asarray(tlay), gas, None)
    return np.moveaxis(np.asarray(col_gas), 0, -1), np.asarray(col_dry), idx_h2o


# ---------------------------------------------------------------------------
# load-time transforms
# ---------------------------------------------------------------------------

def test_flavor_construction(kdist_lw):
    kd = kdist_lw
    # bands: (h2o=1, co2=2) and (o3=3, 0) + rewritten (2,2)
    flav = kd.flavor.T.tolist()
    assert [1, 2] in flav
    assert [3, 0] in flav
    assert [2, 2] in flav
    assert kd.nflav == 3
    # gpoint_flavor maps band 1 gpts to flavor of (1,2)
    f12 = flav.index([1, 2])
    assert all(kd.gpoint_flavor[0, g] == f12 for g in range(4))
    assert all(kd.gpoint_flavor[1, g] == f12 for g in range(4))


def test_gas_filtering_reduces_minors():
    """Loading without n2o drops its minor contributions and remaps
    kminor offsets (reference reduce_minor_arrays)."""
    raw = synthetic_raw(sw=False)
    kd = KDist.from_raw(["h2o", "co2", "o3"], dtype=jnp.float64, **raw)
    assert kd.gas_names == ("h2o", "co2", "o3")
    assert kd.minor_lower.gas_names == ("h2o_slf", "h2o_frg")
    assert kd.minor_lower.kminor_start == (0, 4)
    assert kd.kminor_lower.shape[-1] == 8
    assert len(kd.minor_upper) == 0
    # dropped table slices correspond to the remaining minors
    # (note: float64 on this JAX stack is emulated with ~49-bit mantissa,
    # so device round-trips are only ~1e-15-accurate, not bitwise)
    full = np.asarray(raw["kminor_lower"])
    np.testing.assert_allclose(np.asarray(kd.kminor_lower), full[:, :, 4:12],
                               rtol=1e-13)


def test_missing_key_species_raises():
    raw = synthetic_raw(sw=False)
    with pytest.raises(ValueError, match="required gases"):
        KDist.from_raw(["h2o", "co2"], dtype=jnp.float64, **raw)  # no o3


def test_solar_variability(kdist_sw):
    kd = kdist_sw
    np.testing.assert_allclose(float(jnp.sum(kd.solar_source)), 1361.0, rtol=1e-10)
    kd2 = kd.with_solar_variability(0.2, 100.0)
    assert not np.allclose(np.asarray(kd2.solar_source), np.asarray(kd.solar_source))
    kd3 = kd2.with_tsi(1400.0)
    np.testing.assert_allclose(float(jnp.sum(kd3.solar_source)), 1400.0, rtol=1e-10)
    # spectral shape preserved by TSI scaling
    r = np.asarray(kd3.solar_source) / np.asarray(kd2.solar_source)
    np.testing.assert_allclose(r, r[0], rtol=1e-10)


# ---------------------------------------------------------------------------
# kernels vs oracle
# ---------------------------------------------------------------------------

def _coeffs(kd, play, tlay, col_gas):
    # production layout: (ngas+1, ncol, nlay)
    cg = jnp.asarray(np.moveaxis(np.asarray(col_gas), -1, 0))
    return interpolation(
        jnp.asarray(play), jnp.asarray(tlay), cg,
        flavor_gas1=kd.flavor[0], flavor_gas2=kd.flavor[1], neta=kd.neta,
        press_ref_log=kd.press_ref_log, temp_ref=kd.temp_ref,
        press_ref_log_delta=kd.press_ref_log_delta,
        temp_ref_min=kd.temp_ref_min, temp_ref_delta=kd.temp_ref_delta,
        press_ref_trop_log=kd.press_ref_trop_log, vmr_ref=kd.vmr_ref)


def test_interpolation_vs_oracle(kdist_lw, atmos):
    kd = kdist_lw
    play, plev, tlay, tlev, tsfc, gas = atmos
    gop = GasOpticsRRTMGP(kd)
    col_gas, _, _ = _col_gas(gop, play, plev, tlay, gas)
    co = _coeffs(kd, play, tlay, col_gas)
    ref = oracle_interpolation(kd, play, tlay, col_gas)
    np.testing.assert_array_equal(np.asarray(co.jtemp), ref["jtemp"])
    np.testing.assert_array_equal(np.asarray(co.jpress), ref["jpress"])
    np.testing.assert_array_equal(np.asarray(co.tropo), ref["tropo"])
    col_mix = np.transpose(np.asarray(co.col_mix), (2, 3, 1, 0))
    np.testing.assert_allclose(col_mix, ref["col_mix"], rtol=1e-12)
    # When eta falls exactly on a grid node (e.g. eta=0.5 for same-gas
    # flavors) the emulated-f64 division may round to the other side of the
    # node than numpy; (jeta, feta) pairs on either side are numerically
    # identical, so compare the effective eta position and the weight sums.
    jeta = np.transpose(np.asarray(co.jeta), (2, 3, 1, 0))
    fminor = np.transpose(np.asarray(co.fminor), (3, 4, 2, 0, 1))
    # recover feta from fminor: feta*ft + (1-feta)*ft = ft
    ft_sum = fminor.sum(-1)                            # (c,l,f,2) = ftemp term
    ref_ft_sum = ref["fminor"].sum(-1)
    np.testing.assert_allclose(ft_sum, ref_ft_sum, rtol=1e-10, atol=1e-14)
    with np.errstate(invalid="ignore"):
        eta_pos = jeta + fminor[..., 1] / np.where(ft_sum > 0, ft_sum, 1.0)
        ref_eta_pos = ref["jeta"] + ref["fminor"][..., 1] / np.where(
            ref_ft_sum > 0, ref_ft_sum, 1.0)
    np.testing.assert_allclose(eta_pos, ref_eta_pos, rtol=1e-9, atol=1e-9)
    # weights sum to the same totals
    np.testing.assert_allclose(fminor.sum((-1, -2)), ref["fminor"].sum((-1, -2)),
                               rtol=1e-10)
    fmajor = np.transpose(np.asarray(co.fmajor), (4, 5, 3, 0, 1, 2))
    np.testing.assert_allclose(fmajor.sum((-1, -2, -3)),
                               ref["fmajor"].sum((-1, -2, -3)), rtol=1e-10)


def test_tau_absorption_vs_oracle(kdist_lw, atmos):
    kd = kdist_lw
    play, plev, tlay, tlev, tsfc, gas = atmos
    gop = GasOpticsRRTMGP(kd)
    col_gas, _, _ = _col_gas(gop, play, plev, tlay, gas)
    co = _coeffs(kd, play, tlay, col_gas)
    props, _, _ = gop._compute_taus(jnp.asarray(play), jnp.asarray(plev),
                                    jnp.asarray(tlay), gas, None, True, False)
    ref_co = oracle_interpolation(kd, play, tlay, col_gas)
    ref_tau = oracle_tau_absorption(kd, ref_co, play, tlay, col_gas)
    np.testing.assert_allclose(np.asarray(props.tau), ref_tau, rtol=1e-10)
    assert np.all(ref_tau > 0)


def test_tau_rayleigh_and_combine_vs_oracle(kdist_sw, atmos):
    kd = kdist_sw
    play, plev, tlay, tlev, tsfc, gas = atmos
    gop = GasOpticsRRTMGP(kd)
    col_gas, col_dry, _ = _col_gas(gop, play, plev, tlay, gas)
    props, _, _ = gop._compute_taus(jnp.asarray(play), jnp.asarray(plev),
                                    jnp.asarray(tlay), gas, None, True, True)
    ref_co = oracle_interpolation(kd, play, tlay, col_gas)
    ref_abs = oracle_tau_absorption(kd, ref_co, play, tlay, col_gas)
    ref_ray = oracle_tau_rayleigh(kd, ref_co, col_gas, col_dry)
    np.testing.assert_allclose(np.asarray(props.tau), ref_abs + ref_ray, rtol=1e-10)
    np.testing.assert_allclose(np.asarray(props.ssa),
                               ref_ray / (ref_abs + ref_ray), rtol=1e-10)
    np.testing.assert_array_equal(np.asarray(props.g), 0.0)


def test_planck_sources_vs_oracle(kdist_lw, atmos):
    kd = kdist_lw
    play, plev, tlay, tlev, tsfc, gas = atmos
    gop = GasOpticsRRTMGP(kd)
    props, sources = gop.gas_optics_lw(play, plev, tlay, tsfc, gas, tlev=tlev)
    col_gas, _, _ = _col_gas(gop, play, plev, tlay, gas)
    ref_co = oracle_interpolation(kd, play, tlay, col_gas)
    sfc, lay, lev, jac = oracle_planck(kd, ref_co, tlay, tlev, tsfc, True)
    np.testing.assert_allclose(np.asarray(sources.sfc_source), sfc, rtol=1e-10)
    np.testing.assert_allclose(np.asarray(sources.lay_source), lay, rtol=1e-10)
    np.testing.assert_allclose(np.asarray(sources.lev_source), lev, rtol=1e-10)
    np.testing.assert_allclose(np.asarray(sources.sfc_source_jac), jac, rtol=1e-8)
    assert np.all(jac > 0)  # warmer surface emits more


# ---------------------------------------------------------------------------
# end-to-end and consistency
# ---------------------------------------------------------------------------

def test_col_dry_physical(atmos):
    play, plev, tlay, tlev, tsfc, gas = atmos
    cd = np.asarray(get_col_dry(jnp.asarray(gas.get_vmr("h2o", 3, 7)),
                                jnp.asarray(plev)))
    assert np.all(cd > 0)
    # whole-atmosphere column ~ 2.1e25 molec/cm2 for ~1e5 Pa of dry air
    total = cd.sum(axis=1)
    assert np.all((total > 1e25) & (total < 3e25))


def test_lw_end_to_end_with_solver(kdist_lw, atmos):
    play, plev, tlay, tlev, tsfc, gas = atmos
    gop = GasOpticsRRTMGP(kdist_lw)
    props, sources = gop.gas_optics_lw(play, plev, tlay, tsfc, gas, tlev=tlev)
    f = rte_lw(props, sources, np.ones((3, 1)), compute_jacobian=True)
    up = np.asarray(f.flux_up)
    assert up.shape == (3, 8)
    assert np.all(up > 0) and np.all(np.isfinite(up))
    assert np.all(np.asarray(f.flux_dn[:, 0]) == 0.0)
    assert np.all(np.asarray(f.flux_up_jac) >= 0)


def test_lw_optimal_angles(kdist_lw, atmos):
    play, plev, tlay, tlev, tsfc, gas = atmos
    gop = GasOpticsRRTMGP(kdist_lw)
    props, sources = gop.gas_optics_lw(play, plev, tlay, tsfc, gas, tlev=tlev)
    ds = gop.compute_optimal_angles(props)
    assert ds.shape == (3, NGPT)
    assert np.all(np.asarray(ds) > 1.0)  # secants > 1
    f = rte_lw(props, sources, np.ones((3, 1)), lw_ds=np.asarray(ds))
    assert np.all(np.isfinite(np.asarray(f.flux_up)))


def test_sw_end_to_end_with_solver(kdist_sw, atmos):
    play, plev, tlay, tlev, tsfc, gas = atmos
    gop = GasOpticsRRTMGP(kdist_sw)
    props, toa = gop.gas_optics_sw(play, plev, tlay, gas)
    np.testing.assert_allclose(np.asarray(toa.sum(-1)), 1361.0, rtol=1e-10)
    mu0 = np.full(3, 0.8)
    alb = np.full((3, 1), 0.15)
    f = rte_sw(props, mu0, toa, alb, alb)
    dn = np.asarray(f.flux_dn)
    np.testing.assert_allclose(dn[:, 0], 1361.0 * 0.8, rtol=1e-10)
    assert np.all(np.asarray(f.flux_up) >= 0)
    assert np.all(np.diff(np.asarray(f.flux_dn_dir), axis=1) <= 1e-10)


def test_tlev_interpolation_fallback(kdist_lw, atmos):
    """Omitting tlev triggers the pressure-weighted interpolation
    (reference source() :893-911); sources stay finite and close to the
    explicit-tlev run for a smooth profile."""
    play, plev, tlay, tlev, tsfc, gas = atmos
    gop = GasOpticsRRTMGP(kdist_lw)
    _, s1 = gop.gas_optics_lw(play, plev, tlay, tsfc, gas, tlev=None)
    assert np.all(np.isfinite(np.asarray(s1.lev_source)))


def test_orientation_invariance(kdist_lw):
    """Gas optics + solver give mirrored results for flipped profiles."""
    play, plev, tlay, tlev, tsfc, vmr = sample_atmosphere(top_at_1=True)
    playr, plevr, tlayr, tlevr, _, vmrr = sample_atmosphere(top_at_1=False)
    gas = GasConcs.empty()
    gasr = GasConcs.empty()
    for k in vmr:
        gas = gas.set_vmr(k, vmr[k])
        gasr = gasr.set_vmr(k, vmrr[k])
    gop = GasOpticsRRTMGP(kdist_lw)
    p1, s1 = gop.gas_optics_lw(play, plev, tlay, tsfc, gas, tlev=tlev)
    p2, s2 = gop.gas_optics_lw(playr, plevr, tlayr, tsfc, gasr, tlev=tlevr)
    assert p1.top_at_1 and not p2.top_at_1
    np.testing.assert_allclose(np.asarray(p1.tau),
                               np.asarray(p2.tau)[:, ::-1, :], rtol=1e-12)
    f1 = rte_lw(p1, s1, np.ones((3, 1)))
    f2 = rte_lw(p2, s2, np.ones((3, 1)))
    np.testing.assert_allclose(np.asarray(f1.flux_up),
                               np.asarray(f2.flux_up)[:, ::-1], rtol=1e-10)
