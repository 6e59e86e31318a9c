"""Extension-layer tests: heating rates, zenith correction, McICA sampling,
byband fluxes, compute_bc, clr_all_sky, solar variability."""
import os

import jax.numpy as jnp
import numpy as np
import pytest

from rte_rrtmgp_tpu import (GasConcs, OpticalProps2str, SpectralGrid,
                            rte_lw, sum_byband, net_byband)
from rte_rrtmgp_tpu import constants
from rte_rrtmgp_tpu.extensions import (SolarVariability, clr_all_sky_lw,
                                       compute_bc, compute_heating_rate,
                                       draw_samples, sampled_mask_exp_ran,
                                       sampled_mask_max_ran,
                                       zenith_angle_with_height)
from rte_rrtmgp_tpu.models.ssm import ssm_lw_defaults, ssm_sw_defaults
from rte_rrtmgp_tpu.utils.profiles import rcemip_profiles

NCOL, NLAY = 4, 20


def test_heating_rate_uniform_net_flux_is_zero():
    nlev = NLAY + 1
    p_lev = np.broadcast_to(np.linspace(100.0, 1e5, nlev), (NCOL, nlev))
    up = np.full((NCOL, nlev), 100.0)
    dn = np.full((NCOL, nlev), 250.0)
    hr = compute_heating_rate(jnp.asarray(up), jnp.asarray(dn), jnp.asarray(p_lev))
    np.testing.assert_allclose(np.asarray(hr), 0.0, atol=1e-18)


def test_heating_rate_sign_and_magnitude():
    """Downward net flux divergence heats the layer: H = g dFnet/dp / cp."""
    nlev = NLAY + 1
    p_lev = np.broadcast_to(np.linspace(100.0, 1e5, nlev), (NCOL, nlev)).copy()
    dn = np.broadcast_to(np.linspace(300.0, 200.0, nlev), (NCOL, nlev)).copy()
    up = np.zeros((NCOL, nlev))
    hr = np.asarray(compute_heating_rate(jnp.asarray(up), jnp.asarray(dn),
                                         jnp.asarray(p_lev)))
    # H = [dF_up - dF_dn] g / (cp dp); downward flux absorbed in the layer
    # (dn decreasing with depth) must heat it
    expect = (dn[:, :-1] - dn[:, 1:]) * constants.grav / (
        constants.cp_dry * (p_lev[:, 1:] - p_lev[:, :-1]))
    np.testing.assert_allclose(hr, expect, rtol=1e-12)
    assert np.all(hr > 0)


def test_heating_rate_varmu0_transition_layer():
    nlev = NLAY + 1
    p_lev = np.broadcast_to(np.linspace(100.0, 1e5, nlev), (NCOL, nlev)).copy()
    up = np.zeros((NCOL, nlev))
    dn = np.broadcast_to(np.linspace(300.0, 250.0, nlev), (NCOL, nlev)).copy()
    dirf = np.broadcast_to(np.linspace(200.0, 150.0, nlev), (NCOL, nlev)).copy()
    mu0 = np.full((NCOL, NLAY), 0.4)
    mu0[:, 10:] = 0.0  # sun sets at layer 10
    hr = np.asarray(compute_heating_rate(jnp.asarray(up), jnp.asarray(dn),
                                         jnp.asarray(p_lev),
                                         flux_dir=jnp.asarray(dirf),
                                         mu0=jnp.asarray(mu0)))
    base = np.asarray(compute_heating_rate(jnp.asarray(up), jnp.asarray(dn),
                                           jnp.asarray(p_lev)))
    # only the transition layer differs
    diff = np.abs(hr - base) > 1e-15
    assert diff[:, 10].all()
    assert diff.sum() == NCOL


def test_zenith_angle_spherical():
    ref_alt = np.zeros(NCOL)
    ref_mu = np.full(NCOL, 0.2)
    alt = np.broadcast_to(np.linspace(0.0, 50e3, NLAY), (NCOL, NLAY))
    mu = np.asarray(zenith_angle_with_height(ref_alt, ref_mu, alt))
    # mu increases with height above the reference
    assert np.all(np.diff(mu, axis=1) >= 0)
    np.testing.assert_allclose(mu[:, 0], 0.2, rtol=1e-12)
    # below the horizon: negative reference mu -> 0 at the reference level
    mu2 = np.asarray(zenith_angle_with_height(np.full(NCOL, 50e3),
                                              np.full(NCOL, 0.05),
                                              alt))
    assert np.all(mu2[:, 0] == 0.0)  # deep below reference, sun hidden


def test_sampled_mask_max_ran_statistics():
    rng = np.random.default_rng(0)
    ngpt = 64
    randoms = rng.random((NCOL, NLAY, ngpt))
    cf = np.zeros((NCOL, NLAY))
    cf[:, 5:15] = 0.5
    mask = np.asarray(sampled_mask_max_ran(randoms, cf))
    assert mask.shape == (NCOL, NLAY, ngpt)
    assert not mask[:, :5].any() and not mask[:, 15:].any()
    frac = mask[:, 5:15].mean()
    assert 0.4 < frac < 0.6
    # max overlap within a contiguous cloudy block: same deviates -> same mask
    np.testing.assert_array_equal(mask[:, 5], mask[:, 10])


def test_sampled_mask_exp_ran_limits():
    rng = np.random.default_rng(1)
    ngpt = 128
    randoms = rng.random((NCOL, NLAY, ngpt))
    cf = np.full((NCOL, NLAY), 0.5)
    # rho = 1 everywhere -> identical to max-random within cloudy block
    ov1 = np.ones((NCOL, NLAY - 1))
    m1 = np.asarray(sampled_mask_exp_ran(randoms, cf, ov1))
    mmax = np.asarray(sampled_mask_max_ran(randoms, cf))
    np.testing.assert_array_equal(m1, mmax)
    # rho = 0 -> independent random overlap: layer masks decorrelated
    ov0 = np.zeros((NCOL, NLAY - 1))
    m0 = np.asarray(sampled_mask_exp_ran(randoms, cf, ov0))
    corr = np.corrcoef(m0[:, 0].ravel(), m0[:, 1].ravel())[0, 1]
    assert abs(corr) < 0.15


def test_draw_samples():
    band_grid = SpectralGrid.from_arrays([[0., 500.], [500., 1000.]])
    gpt_grid = SpectralGrid.from_arrays([[0., 500.], [500., 1000.]],
                                        [[1, 4], [5, 8]])
    rng = np.random.default_rng(2)
    clouds = OpticalProps2str(
        tau=jnp.asarray(rng.uniform(1, 2, (NCOL, NLAY, 2))),
        ssa=jnp.asarray(rng.uniform(0.3, 0.9, (NCOL, NLAY, 2))),
        g=jnp.asarray(rng.uniform(0, 0.8, (NCOL, NLAY, 2))), grid=band_grid)
    mask = rng.random((NCOL, NLAY, 8)) > 0.5
    sampled = draw_samples(jnp.asarray(mask), clouds, gpt_grid)
    t = np.asarray(sampled.tau)
    assert np.all(t[~mask] == 0)
    np.testing.assert_allclose(t[mask[:, :, 0], 0][:1],
                               np.asarray(clouds.tau)[mask[:, :, 0], 0][:1])


def test_byband_fluxes():
    grid = SpectralGrid.from_arrays([[0., 500.], [500., 1000.]],
                                    [[1, 3], [4, 8]])
    rng = np.random.default_rng(4)
    f = jnp.asarray(rng.random((NCOL, NLAY + 1, 8)))
    bb = np.asarray(sum_byband(f, grid))
    assert bb.shape == (NCOL, NLAY + 1, 2)
    np.testing.assert_allclose(bb[..., 0], np.asarray(f[..., :3].sum(-1)), rtol=1e-12)
    np.testing.assert_allclose(bb[..., 1], np.asarray(f[..., 3:].sum(-1)), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(net_byband(f, 0.5 * f, grid)),
                               0.5 * bb, rtol=1e-12)


@pytest.fixture(scope="module")
def atmosphere():
    return rcemip_profiles(NCOL, 40)


def test_compute_bc_lw(atmosphere):
    play, plev, tlay, tlev, _, gas = atmosphere
    ssm = ssm_lw_defaults()
    bc = compute_bc(ssm, play, plev, tlay, gas)
    bc = np.asarray(bc)
    assert bc.shape == (NCOL, 41)
    assert np.all(bc >= 0) and np.any(bc > 0)
    # thin cap layer: downward emission is much smaller than sfc emission
    assert bc.sum() < 50.0 * NCOL


def test_compute_bc_sw(atmosphere):
    play, plev, tlay, tlev, _, gas = atmosphere
    ssm = ssm_sw_defaults()
    bc = np.asarray(compute_bc(ssm, play, plev, tlay, gas,
                               mu0=np.full(NCOL, 0.6)))
    assert bc.shape == (NCOL, 41)
    # nearly transparent cap: direct flux ~ toa * mu0
    np.testing.assert_allclose(bc.sum(-1), 1360.0 * 0.6, rtol=1e-2)
    with pytest.raises(ValueError, match="mu0"):
        compute_bc(ssm, play, plev, tlay, gas)


def test_clr_all_sky_lw_with_cloud(atmosphere):
    play, plev, tlay, tlev, _, gas = atmosphere
    ssm = ssm_lw_defaults()
    clear = clr_all_sky_lw(ssm, play, plev, tlay, np.full(NCOL, 295.0), gas,
                           np.ones((NCOL, 1)), tlev=tlev)
    clwp = np.zeros((NCOL, 40)); clwp[:, 25] = 0.02
    cld = ssm.cloud_optics(clwp, np.zeros_like(clwp), scattering=False)
    cloudy = clr_all_sky_lw(ssm, play, plev, tlay, np.full(NCOL, 295.0), gas,
                            np.ones((NCOL, 1)), tlev=tlev, clouds=cld)
    # a cloud reduces OLR
    assert np.all(np.asarray(cloudy.flux_up[:, 0]) < np.asarray(clear.flux_up[:, 0]))


def test_solar_variability_indices():
    sv = SolarVariability()
    mg0, sb0 = sv.indices(0.0)
    mg1, sb1 = sv.indices(1.0)
    np.testing.assert_allclose(mg0, sv.avgcyc_ind[0, 0])
    np.testing.assert_allclose(sb1, sv.avgcyc_ind[1, -1])
    mg, sb = sv.indices(0.5)  # near solar max
    assert mg > mg0 and sb > sb0
    # continuity across the interval boundaries
    a = sv.indices(0.00375)
    b = sv.indices(0.00380)
    assert abs(a[0] - b[0]) < 1e-4
    with pytest.raises(ValueError):
        sv.indices(1.5)


def test_rte_byband_matches_spectral_reduction():
    """rte_lw/rte_sw(byband=True) == sum_byband of the spectral solve,
    on both the XLA and (interpret-mode) Pallas paths (reference
    ty_fluxes_byband, mo_fluxes_byband.F90:159-219)."""
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from gray_atmosphere import gray_rad_equil
    from rte_rrtmgp_tpu import OpticalProps2str, SpectralGrid, rte_sw
    from rte_rrtmgp_tpu.config import set_use_pallas

    rng = np.random.default_rng(9)
    ncol, nlay, ngpt, nbnd = 6, 8, 16, 2
    grid16 = SpectralGrid.from_arrays(
        [[0.0, 1000.0], [1000.0, 3000.0]], [[1, 8], [9, 16]])

    # LW: 1scl noscat
    tau = jnp.asarray(rng.uniform(0.05, 2.0, (ncol, nlay, ngpt)))
    lay = jnp.asarray(rng.uniform(10, 60, (ncol, nlay, ngpt)))
    lev = jnp.asarray(rng.uniform(10, 60, (ncol, nlay + 1, ngpt)))
    from rte_rrtmgp_tpu import OpticalProps1scl, SourcesLW
    props = OpticalProps1scl(tau=tau, grid=grid16)
    src = SourcesLW(lay_source=lay, lev_source=lev,
                    sfc_source=jnp.asarray(rng.uniform(30, 80, (ncol, ngpt))),
                    sfc_source_jac=jnp.zeros((ncol, ngpt)), grid=grid16)
    emis = jnp.full((ncol, 1), 0.97)
    for pallas in (False, True):
        set_use_pallas(pallas)
        try:
            f_sp = rte_lw(props, src, emis, spectral=True)
            f_bb = rte_lw(props, src, emis, byband=True)
            np.testing.assert_allclose(
                np.asarray(f_bb.flux_up),
                np.asarray(sum_byband(f_sp.flux_up, grid16)),
                rtol=1e-6, atol=1e-10, err_msg=f"LW pallas={pallas}")
            np.testing.assert_allclose(
                np.asarray(f_bb.flux_dn),
                np.asarray(sum_byband(f_sp.flux_dn, grid16)),
                rtol=1e-6, atol=1e-10)
            assert f_bb.flux_up.shape == (ncol, nlay + 1, nbnd)

            # SW: two-stream
            p2 = OpticalProps2str(
                tau=tau, ssa=jnp.asarray(rng.uniform(0.1, 0.9, tau.shape)),
                g=jnp.asarray(rng.uniform(0.0, 0.8, tau.shape)), grid=grid16)
            mu0 = np.full(ncol, 0.6)
            inc = jnp.asarray(rng.uniform(5, 10, (ncol, ngpt)))
            alb = jnp.full((ncol, 1), 0.2)
            s_sp = rte_sw(p2, mu0, inc, alb, alb, spectral=True)
            s_bb = rte_sw(p2, mu0, inc, alb, alb, byband=True)
            np.testing.assert_allclose(
                np.asarray(s_bb.flux_up),
                np.asarray(sum_byband(s_sp.flux_up, grid16)),
                rtol=1e-6, atol=1e-10, err_msg=f"SW pallas={pallas}")
            np.testing.assert_allclose(
                np.asarray(s_bb.flux_dn_dir),
                np.asarray(sum_byband(s_sp.flux_dn_dir, grid16)),
                rtol=1e-6, atol=1e-10)
        finally:
            set_use_pallas(None)

    # ragged bands fall back to the spectral+reduce path
    grid_ragged = SpectralGrid.from_arrays(
        [[0.0, 1000.0], [1000.0, 3000.0]], [[1, 6], [7, 16]])
    props_r = OpticalProps1scl(tau=tau, grid=grid_ragged)
    src_r = SourcesLW(lay_source=lay, lev_source=lev,
                      sfc_source=src.sfc_source,
                      sfc_source_jac=src.sfc_source_jac, grid=grid_ragged)
    f_sp = rte_lw(props_r, src_r, emis, spectral=True)
    f_bb = rte_lw(props_r, src_r, emis, byband=True)
    np.testing.assert_allclose(
        np.asarray(f_bb.flux_up),
        np.asarray(sum_byband(f_sp.flux_up, grid_ragged)),
        rtol=1e-6, atol=1e-10)


def test_gradient_retrieval_example():
    """The gradient-retrieval example (examples/gradient_retrieval.py)
    converges: surface temperature recovered within 0.5 K from an 8 K
    perturbation and the water-vapor scale within 2%, by gradient descent
    through gas optics + solver (differentiability the reference lacks)."""
    import os
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from examples.gradient_retrieval import main

    t_err, s_err = main(steps=120, verbose=False)
    assert t_err < 0.5, t_err
    assert s_err < 0.02, s_err


def test_validation_plots_tool(tmp_path):
    """The flux-variants file + validation-plots pipeline (reference
    check_variants.F90 -> validation-plots.py) runs end-to-end and
    renders a figure."""
    import subprocess
    import sys

    repo = os.path.join(os.path.dirname(__file__), "..")
    nc = tmp_path / "variants.nc"
    png = tmp_path / "plots.png"
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("PALLAS_AXON_POOL_IPS", None)
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "examples", "flux_variants.py"),
         "--ncol", "4", "--nlay", "10", "--out", str(nc)],
        capture_output=True, text=True, env=env, timeout=420)
    assert r.returncode == 0, r.stderr[-1500:]
    r = subprocess.run(
        [sys.executable,
         os.path.join(repo, "examples", "validation_plots.py"),
         str(nc), str(png)],
        capture_output=True, text=True, env=env, timeout=300)
    assert r.returncode == 0, r.stderr[-1500:]
    assert png.exists() and png.stat().st_size > 10_000
