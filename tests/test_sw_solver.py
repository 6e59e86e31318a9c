"""SW solver unit tests: thin scattering atmospheres, Beer-Lambert direct
beam, linearity in the TOA boundary condition, orientation/subset invariance,
nighttime masking (mirrors reference tests/rte_sw_solver_unit_tests.F90)."""
import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from rte_rrtmgp_tpu import OpticalProps2str, SpectralGrid, rte_sw, subset

NCOL, NLAY = 8, 16
GRID = SpectralGrid.from_arrays([[3250.0, 10000.0]], [[1, 1]])


def thin_scattering(dtype=jnp.float64):
    """8 columns spanning tau {1e-4, 1e-2} x ssa {1-1e-4, 1-1e-2} x g
    {0.85, 0.65} (reference thin_scattering setup)."""
    taus = [1.0e-4, 1.0e-2]
    ssas = [1.0 - 1.0e-4, 1.0 - 1.0e-2]
    gs = [0.85, 0.65]
    cols = [(t, s, g) for t in taus for s in ssas for g in gs]
    tau = np.array([[c[0] / NLAY] * NLAY for c in cols])[:, :, None]
    ssa = np.array([[c[1]] * NLAY for c in cols])[:, :, None]
    g = np.array([[c[2]] * NLAY for c in cols])[:, :, None]
    return OpticalProps2str(tau=jnp.asarray(tau, dtype),
                            ssa=jnp.asarray(ssa, dtype),
                            g=jnp.asarray(g, dtype), grid=GRID)


TOA_FLUX = np.ones((NCOL, 1))
ALB = np.zeros((NCOL, 1))


@pytest.fixture(scope="module", params=[1.0, 0.5])
def mu0_and_fluxes(request):
    mu0 = np.full(NCOL, request.param)
    atmos = thin_scattering()
    return mu0, atmos, rte_sw(atmos, mu0, TOA_FLUX, ALB, ALB)


def test_direct_beam_beer_lambert(mu0_and_fluxes):
    mu0, atmos, f = mu0_and_fluxes
    total_tau = np.asarray(atmos.tau.sum(axis=(1, 2)))
    expected = TOA_FLUX[:, 0] * mu0 * np.exp(-total_tau / mu0)
    np.testing.assert_allclose(np.asarray(f.flux_dn_dir[:, -1]), expected,
                               rtol=1e-12)


def test_net_is_dn_minus_up(mu0_and_fluxes):
    _, _, f = mu0_and_fluxes
    np.testing.assert_array_equal(np.asarray(f.flux_net),
                                  np.asarray(f.flux_dn - f.flux_up))


def test_subset_invariance(mu0_and_fluxes):
    mu0, atmos, ref = mu0_and_fluxes
    ups, dns = [], []
    for s in (0, NCOL // 2):
        f = rte_sw(subset(atmos, s, NCOL // 2), mu0[s:s + NCOL // 2],
                   TOA_FLUX[s:s + NCOL // 2], ALB[s:s + NCOL // 2],
                   ALB[s:s + NCOL // 2])
        ups.append(np.asarray(f.flux_up))
        dns.append(np.asarray(f.flux_dn))
    np.testing.assert_array_equal(np.concatenate(ups), np.asarray(ref.flux_up))
    np.testing.assert_array_equal(np.concatenate(dns), np.asarray(ref.flux_dn))


def test_vertical_orientation_invariance(mu0_and_fluxes):
    mu0, atmos, ref = mu0_and_fluxes
    flipped = OpticalProps2str(tau=jnp.flip(atmos.tau, 1),
                               ssa=jnp.flip(atmos.ssa, 1),
                               g=jnp.flip(atmos.g, 1), grid=GRID,
                               top_at_1=False)
    f = rte_sw(flipped, mu0, TOA_FLUX, ALB, ALB)
    np.testing.assert_allclose(np.asarray(f.flux_up)[:, ::-1],
                               np.asarray(ref.flux_up), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(f.flux_dn)[:, ::-1],
                               np.asarray(ref.flux_dn), rtol=1e-12)


def test_linear_in_toa_flux(mu0_and_fluxes):
    """Fluxes scale linearly with the TOA boundary condition
    (reference :200-220)."""
    mu0, atmos, ref = mu0_and_fluxes
    f = rte_sw(atmos, mu0, 2.0 * TOA_FLUX, ALB, ALB)
    np.testing.assert_allclose(np.asarray(f.flux_up),
                               2.0 * np.asarray(ref.flux_up), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(f.flux_dn),
                               2.0 * np.asarray(ref.flux_dn), rtol=1e-12)


def test_energy_conservation(mu0_and_fluxes):
    """With zero surface albedo, TOA net = column absorption + surface
    absorption; for thin nearly-conservative scattering, up[toa] +
    dn[sfc] ~= incident."""
    mu0, atmos, f = mu0_and_fluxes
    inc = TOA_FLUX[:, 0] * mu0
    bal = np.asarray(f.flux_up[:, 0] + f.flux_dn[:, -1])
    # absorption <= 1 - ssa fraction of a thin tau: tiny
    assert np.all(bal <= inc * (1 + 1e-10))
    np.testing.assert_allclose(bal, inc, rtol=2e-2)


def test_nighttime_columns_zero():
    atmos = thin_scattering()
    mu0 = np.full(NCOL, -0.3)
    f = rte_sw(atmos, mu0, TOA_FLUX, ALB, ALB)
    assert np.all(np.asarray(f.flux_up) == 0.0)
    # diffuse field is zero; direct "flux" seeded with negative mu0 is
    # masked to zero at source level -> up==0 everywhere
    np.testing.assert_allclose(np.asarray(f.flux_up), 0.0)


def test_spectral_output_sums_to_broadband(mu0_and_fluxes):
    mu0, atmos, ref = mu0_and_fluxes
    f = rte_sw(atmos, mu0, TOA_FLUX, ALB, ALB, spectral=True)
    np.testing.assert_allclose(np.asarray(f.flux_up.sum(-1)),
                               np.asarray(ref.flux_up), rtol=1e-12)


def test_sw_noscat_direct_only():
    """1scl SW: direct beam only (reference sw_solver_noscat path)."""
    from rte_rrtmgp_tpu import OpticalProps1scl
    atmos = thin_scattering()
    props = OpticalProps1scl(tau=atmos.tau, grid=GRID)
    mu0 = np.full(NCOL, 0.7)
    f = rte_sw(props, mu0, TOA_FLUX, ALB, ALB)
    total_tau = np.asarray(atmos.tau.sum(axis=(1, 2)))
    expected = TOA_FLUX[:, 0] * mu0 * np.exp(-total_tau / mu0)
    np.testing.assert_allclose(np.asarray(f.flux_dn_dir[:, -1]), expected,
                               rtol=1e-12)


def test_mu0_by_layer_spherical():
    """Per-layer mu0 (spherical geometry) is accepted and reduces to the
    by-column result when constant."""
    atmos = thin_scattering()
    mu0 = np.full(NCOL, 0.5)
    ref = rte_sw(atmos, mu0, TOA_FLUX, ALB, ALB)
    f = rte_sw(atmos, np.full((NCOL, NLAY), 0.5), TOA_FLUX, ALB, ALB)
    np.testing.assert_array_equal(np.asarray(f.flux_up), np.asarray(ref.flux_up))


# ---------------------------------------------------------------------------
# Closed-form Meador-Weaver oracles (reference rte_sw_solver_unit_tests.F90
# :36-48 intent; formulas from Meador & Weaver 1980 Eqs 14/15/25/26 in the
# independent hyperbolic form, plus conservative/thin limits)
# ---------------------------------------------------------------------------

def _mw_hyperbolic(tau, w0, g, mu0):
    """Meador-Weaver R/T in float64 via the hyperbolic-function form —
    an independent evaluation path from sw_dif_and_source's e^{-k tau}
    refactoring."""
    tau, w0, g = (np.asarray(x, np.float64) for x in (tau, w0, g))
    gamma1 = (8.0 - w0 * (5.0 + 3.0 * g)) / 4.0
    gamma2 = 3.0 * w0 * (1.0 - g) / 4.0
    gamma3 = (2.0 - 3.0 * mu0 * g) / 4.0
    gamma4 = 1.0 - gamma3
    alpha1 = gamma1 * gamma4 + gamma2 * gamma3
    alpha2 = gamma1 * gamma3 + gamma2 * gamma4
    k = np.sqrt((gamma1 - gamma2) * (gamma1 + gamma2))
    ch, sh = np.cosh(k * tau), np.sinh(k * tau)
    den = k * ch + gamma1 * sh
    rdif = gamma2 * sh / den                     # MW Eq 25
    tdif = k / den                               # MW Eq 26
    t0 = np.exp(-tau / mu0)
    pre = w0 / (2.0 * (1.0 - (k * mu0) ** 2) * den)
    rdir = pre * ((1.0 - k * mu0) * (alpha2 + k * gamma3) * np.exp(k * tau)
                  - (1.0 + k * mu0) * (alpha2 - k * gamma3) * np.exp(-k * tau)
                  - 2.0 * k * (gamma3 - alpha2 * mu0) * t0)   # MW Eq 14
    tdir = -pre * ((1.0 + k * mu0) * (alpha1 + k * gamma4) * t0 * np.exp(k * tau)
                   - (1.0 - k * mu0) * (alpha1 - k * gamma4) * t0 * np.exp(-k * tau)
                   - 2.0 * k * (gamma4 + alpha1 * mu0))       # MW Eq 15
    # the reference spec includes the Hogan/Ukkonen energy clamps
    # (mo_rte_solver_kernels.F90:1103-1108); MW Eq 14 can go slightly
    # negative when gamma3 < 0 (large mu0*g)
    rdir = np.clip(rdir, 0.0, 1.0 - t0)
    tdir = np.clip(tdir, 0.0, 1.0 - t0 - rdir)
    return rdif, tdif, rdir, tdir


def _layer_rt(tau, w0, g, mu0):
    """Single-layer rdif/tdif/rdir(source_up)/tdir(source_dn) from
    sw_dif_and_source with unit incident direct flux."""
    from rte_rrtmgp_tpu.ops.solver_sw import sw_dif_and_source

    shape = np.broadcast(np.asarray(tau), np.asarray(w0), np.asarray(g)).shape
    ncol = int(np.prod(shape)) or 1
    mk = lambda x: jnp.asarray(np.broadcast_to(x, shape).reshape(ncol, 1, 1),
                               jnp.float64)
    mu0a = jnp.full((ncol, 1), mu0, jnp.float64)
    inc = jnp.full((ncol, 1), 1.0 / mu0, jnp.float64)   # => dir_inc == 1
    alb = jnp.zeros((ncol, 1), jnp.float64)
    rdif, tdif, sdn, sup, _, fdir = sw_dif_and_source(
        mk(tau), mk(w0), mk(g), mu0a, inc, alb)
    r = lambda a: np.asarray(a).reshape(-1)
    return r(rdif), r(tdif), r(sup), r(sdn)


def test_meador_weaver_closed_form():
    """Layer R/T against the independent hyperbolic-form evaluation over a
    grid of (tau, ssa, g, mu0)."""
    taus = np.array([1e-4, 1e-2, 0.1, 1.0, 5.0])
    ssas = np.array([0.1, 0.5, 0.9, 0.999])
    gs = np.array([0.0, 0.45, 0.85])
    for mu0 in (1.0, 0.7, 0.3):
        t, s, g = np.meshgrid(taus, ssas, gs, indexing="ij")
        rdif, tdif, rdir, tdir = _layer_rt(t, s, g, mu0)
        erdif, etdif, erdir, etdir = (x.reshape(-1) for x in
                                      _mw_hyperbolic(t, s, g, mu0))
        np.testing.assert_allclose(rdif, erdif, rtol=1e-10, atol=1e-14)
        np.testing.assert_allclose(tdif, etdif, rtol=1e-10, atol=1e-14)
        # direct terms carry the Hogan/Ukkonen clamps; the analytic values
        # here are all in the physical range so the clamps must be no-ops
        np.testing.assert_allclose(rdir, erdir, rtol=1e-8, atol=1e-13)
        np.testing.assert_allclose(tdir, etdir, rtol=1e-8, atol=1e-13)


def test_meador_weaver_conservative_limit():
    """w0 = 1: Rdif = gamma2*tau/(1+gamma1*tau), Tdif = 1/(1+gamma1*tau),
    Rdif + Tdif = 1, and no energy is absorbed from the direct beam."""
    tau = np.array([1e-3, 0.1, 1.0, 10.0])
    g = 0.6
    mu0 = 0.8
    rdif, tdif, rdir, tdir = _layer_rt(tau, 1.0, g, mu0)
    gamma1 = (8.0 - (5.0 + 3.0 * g)) / 4.0
    gamma2 = 3.0 * (1.0 - g) / 4.0
    np.testing.assert_allclose(rdif, gamma2 * tau / (1.0 + gamma1 * tau),
                               rtol=1e-6)
    np.testing.assert_allclose(tdif, 1.0 / (1.0 + gamma1 * tau), rtol=1e-6)
    # k is floored at sqrt(1e4*eps), so w0=1 is conservative only
    # to ~k^2*tau ~ 1e-11
    np.testing.assert_allclose(rdif + tdif, 1.0, rtol=1e-9)
    t0 = np.exp(-tau / mu0)
    np.testing.assert_allclose(rdir + tdir + t0, 1.0, rtol=1e-6)


def test_meador_weaver_thin_limit():
    """First-order thin-layer limits: Rdif ~ gamma2 tau, Tdif ~ 1 - gamma1
    tau, Rdir ~ w0 gamma3 tau/mu0, Tdir ~ w0 gamma4 tau/mu0."""
    tau, w0, g, mu0 = 1e-5, 0.9, 0.5, 0.6
    rdif, tdif, rdir, tdir = _layer_rt(tau, w0, g, mu0)
    gamma1 = (8.0 - w0 * (5.0 + 3.0 * g)) / 4.0
    gamma2 = 3.0 * w0 * (1.0 - g) / 4.0
    gamma3 = (2.0 - 3.0 * mu0 * g) / 4.0
    np.testing.assert_allclose(rdif, gamma2 * tau, rtol=1e-3)
    np.testing.assert_allclose(1.0 - tdif, gamma1 * tau, rtol=1e-3)
    np.testing.assert_allclose(rdir, w0 * gamma3 * tau / mu0, rtol=1e-3)
    np.testing.assert_allclose(tdir, w0 * (1.0 - gamma3) * tau / mu0,
                               rtol=1e-3)


def test_single_layer_solver_composition():
    """One layer + black surface: the full solver's TOA up / surface down
    are exactly the layer Rdir / (Tdir + direct) times the incident flux."""
    tau, w0, g, mu0v = 0.5, 0.8, 0.7, 0.9
    rdif, tdif, rdir, tdir = _layer_rt(tau, w0, g, mu0v)
    atmos = OpticalProps2str(
        tau=jnp.full((1, 1, 1), tau, jnp.float64),
        ssa=jnp.full((1, 1, 1), w0, jnp.float64),
        g=jnp.full((1, 1, 1), g, jnp.float64), grid=GRID)
    inc = np.full((1, 1), 123.0)
    f = rte_sw(atmos, np.full(1, mu0v), inc, np.zeros((1, 1)),
               np.zeros((1, 1)))
    inc_dir = 123.0 * mu0v
    np.testing.assert_allclose(np.asarray(f.flux_up[0, 0]),
                               rdir[0] * inc_dir, rtol=1e-12)
    np.testing.assert_allclose(
        np.asarray(f.flux_dn[0, 1]),
        (tdir[0] + np.exp(-tau / mu0v)) * inc_dir, rtol=1e-12)
