"""LW solver unit tests against the gray-radiative-equilibrium analytic
solution plus invariance checks, mirroring the reference's
tests/rte_lw_solver_unit_tests.F90:36-53 test list."""
import jax.numpy as jnp
import numpy as np
import pytest

from rte_rrtmgp_tpu import (OpticalProps1scl, OpticalProps2str, rte_lw,
                            subset, subset_sources)
from gray_atmosphere import (D, GRAY_GRID, SIGMA, gray_rad_equil,
                             gray_rad_equil_olr)

NCOL, NLAY = 8, 16
SFC_T = np.array([285.0] * 4 + [310.0] * 4)
TOTAL_TAU = np.array([0.1, 1.0, 10.0, 50.0] * 2)
SFC_EMIS = np.ones((NCOL, 1))


@pytest.fixture(scope="module")
def ref_fluxes():
    props, sources = gray_rad_equil(SFC_T, TOTAL_TAU, NLAY)
    return rte_lw(props, sources, SFC_EMIS)


def test_gray_rad_equil_olr(ref_fluxes):
    """OLR matches the analytic solution (reference check_gray_rad_equil)."""
    olr = gray_rad_equil_olr(SFC_T, TOTAL_TAU)
    np.testing.assert_allclose(np.asarray(ref_fluxes.flux_up[:, 0]), olr,
                               rtol=1e-10)


def test_net_flux_constant_with_height(ref_fluxes):
    """Net flux is constant with height in radiative equilibrium."""
    net = np.asarray(ref_fluxes.flux_net)
    np.testing.assert_allclose(net, np.broadcast_to(net[:, :1], net.shape),
                               rtol=1e-9)


def test_net_is_dn_minus_up(ref_fluxes):
    np.testing.assert_array_equal(
        np.asarray(ref_fluxes.flux_net),
        np.asarray(ref_fluxes.flux_dn - ref_fluxes.flux_up))


def test_subset_invariance(ref_fluxes):
    """Solving half the columns at a time gives the same fluxes
    (reference clear_sky_subset)."""
    props, sources = gray_rad_equil(SFC_T, TOTAL_TAU, NLAY)
    ups, dns = [], []
    for start in (0, NCOL // 2):
        f = rte_lw(subset(props, start, NCOL // 2),
                   subset_sources(sources, start, NCOL // 2),
                   SFC_EMIS[start:start + NCOL // 2])
        ups.append(np.asarray(f.flux_up))
        dns.append(np.asarray(f.flux_dn))
    np.testing.assert_array_equal(np.concatenate(ups), np.asarray(ref_fluxes.flux_up))
    np.testing.assert_array_equal(np.concatenate(dns), np.asarray(ref_fluxes.flux_dn))


def test_vertical_orientation_invariance(ref_fluxes):
    """Flipping the vertical axis gives the same answer (reference 'vr')."""
    props, sources = gray_rad_equil(SFC_T, TOTAL_TAU, NLAY, top_at_1=False)
    f = rte_lw(props, sources, SFC_EMIS)
    np.testing.assert_allclose(np.asarray(f.flux_up)[:, ::-1],
                               np.asarray(ref_fluxes.flux_up), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(f.flux_dn)[:, ::-1],
                               np.asarray(ref_fluxes.flux_dn), rtol=1e-12)


def test_jacobian_does_not_change_fluxes(ref_fluxes):
    props, sources = gray_rad_equil(SFC_T, TOTAL_TAU, NLAY)
    f = rte_lw(props, sources, SFC_EMIS, compute_jacobian=True)
    np.testing.assert_array_equal(np.asarray(f.flux_up), np.asarray(ref_fluxes.flux_up))
    assert f.flux_up_jac is not None


def test_jacobian_vs_finite_difference(ref_fluxes):
    """Fluxes with +1K surface are approximated by flux + Jacobian
    (reference rte_lw_solver_unit_tests.F90:180-193)."""
    props, sources = gray_rad_equil(SFC_T, TOTAL_TAU, NLAY)
    f0 = rte_lw(props, sources, SFC_EMIS, compute_jacobian=True)
    tp = SFC_T + 1.0
    import dataclasses
    sources_p = dataclasses.replace(
        sources,
        sfc_source=jnp.asarray((SIGMA / np.pi * tp ** 4)[:, None]),
        sfc_source_jac=jnp.asarray((4 * SIGMA / np.pi * tp ** 3)[:, None]))
    f1 = rte_lw(props, sources_p, SFC_EMIS)
    lhs = np.asarray(f1.flux_up - f0.flux_up)
    rhs = np.asarray(f0.flux_up_jac)
    # linear-in-T approximation: agreement to ~2% (atol floor for levels
    # where an optically-thick atmosphere extinguishes the surface signal)
    np.testing.assert_allclose(lhs, rhs, rtol=2e-2, atol=1e-6)


def test_rescaled_2str_purely_absorbing_matches_1scl(ref_fluxes):
    """2-stream props with ssa=0 through the Tang-rescaled path equal the
    no-scattering solution (reference :198-213)."""
    props, sources = gray_rad_equil(SFC_T, TOTAL_TAU, NLAY)
    props2 = OpticalProps2str(tau=props.tau, ssa=jnp.zeros_like(props.tau),
                              g=jnp.zeros_like(props.tau), grid=GRAY_GRID)
    f = rte_lw(props2, sources, SFC_EMIS, compute_jacobian=True)
    np.testing.assert_allclose(np.asarray(f.flux_up),
                               np.asarray(ref_fluxes.flux_up), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(f.flux_dn),
                               np.asarray(ref_fluxes.flux_dn), rtol=1e-12)


def test_explicit_diffusivity_angle_matches_default(ref_fluxes):
    """lw_ds = default secant reproduces the default solve (reference :219-226)."""
    props, sources = gray_rad_equil(SFC_T, TOTAL_TAU, NLAY)
    f = rte_lw(props, sources, SFC_EMIS, lw_ds=np.full((NCOL, 1), D))
    np.testing.assert_allclose(np.asarray(f.flux_up),
                               np.asarray(ref_fluxes.flux_up), rtol=1e-12)


def test_multi_angle_quadrature_converges():
    """3-angle quadrature stays close to the 1-angle diffusivity solution
    and both stay close to analytic OLR."""
    props, sources = gray_rad_equil(SFC_T, TOTAL_TAU, NLAY)
    olr = gray_rad_equil_olr(SFC_T, TOTAL_TAU)
    f3 = rte_lw(props, sources, SFC_EMIS, n_gauss_angles=3)
    f4 = rte_lw(props, sources, SFC_EMIS, n_gauss_angles=4)
    # the equilibrium profile assumes the single diffusivity angle, so other
    # quadratures deviate physically (up to ~5% at tau=50); but successive
    # quadrature orders must agree closely with each other
    np.testing.assert_allclose(np.asarray(f3.flux_up[:, 0]), olr, rtol=5e-2)
    np.testing.assert_allclose(np.asarray(f4.flux_up[:, 0]),
                               np.asarray(f3.flux_up[:, 0]), rtol=1e-3)


def test_two_stream_solver_purely_absorbing():
    """True 2-stream (use_2stream) on an absorption-only problem should be
    close to the no-scattering solution (different diffusivity: 1.66 vs
    1/0.6096... so only approximate agreement)."""
    props, sources = gray_rad_equil(SFC_T, TOTAL_TAU, NLAY)
    props2 = OpticalProps2str(tau=props.tau, ssa=jnp.zeros_like(props.tau),
                              g=jnp.zeros_like(props.tau), grid=GRAY_GRID)
    ref = rte_lw(props, sources, SFC_EMIS)
    f = rte_lw(props2, sources, SFC_EMIS, use_2stream=True)
    np.testing.assert_allclose(np.asarray(f.flux_up[:, 0]),
                               np.asarray(ref.flux_up[:, 0]), rtol=5e-2)


def test_spectral_output_sums_to_broadband(ref_fluxes):
    props, sources = gray_rad_equil(SFC_T, TOTAL_TAU, NLAY)
    f = rte_lw(props, sources, SFC_EMIS, spectral=True)
    np.testing.assert_allclose(np.asarray(f.flux_up.sum(-1)),
                               np.asarray(ref_fluxes.flux_up), rtol=1e-12)


def test_float32_accuracy():
    """The float32 (TPU working precision) path stays within the single-
    precision acceptance scale (reference gate: 3.5e-1 W/m^2)."""
    props, sources = gray_rad_equil(SFC_T, TOTAL_TAU, NLAY, dtype=jnp.float32)
    f = rte_lw(props, sources, np.ones((NCOL, 1), np.float32))
    olr = gray_rad_equil_olr(SFC_T, TOTAL_TAU)
    assert np.max(np.abs(np.asarray(f.flux_up[:, 0]) - olr)) < 3.5e-1


def test_jacobian_vs_jax_grad():
    """The hand-rolled analytic surface-temperature Jacobian (reference
    kernels:201-213, 731-742) agrees with jax.jacfwd through the full
    driver when the surface Planck source is parameterized by T_sfc.
    Both are exact derivatives of the same linear transport, so they
    must match to roundoff."""
    import jax

    props, sources = gray_rad_equil(SFC_T, TOTAL_TAU, NLAY)
    f0 = rte_lw(props, sources, SFC_EMIS, compute_jacobian=True)

    def flux_up_of_tsfc(tsfc):
        import dataclasses
        src = dataclasses.replace(
            sources,
            sfc_source=(SIGMA / np.pi * tsfc ** 4)[:, None],
            sfc_source_jac=jnp.zeros((len(SFC_T), 1)))
        return rte_lw(props, src, SFC_EMIS).flux_up

    jac = jax.jacfwd(flux_up_of_tsfc)(jnp.asarray(SFC_T, jnp.float64))
    # columns are independent: take the diagonal d flux_up[i,:] / d t[i]
    diag = np.asarray(jac)[np.arange(len(SFC_T)), :, np.arange(len(SFC_T))]
    np.testing.assert_allclose(diag, np.asarray(f0.flux_up_jac),
                               rtol=1e-10, atol=1e-13)
