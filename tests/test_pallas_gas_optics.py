"""Pallas lane-gather kernels vs the XLA gas-optics ops.

Runs the kernels in interpreter mode on the CPU backend; on TPU the same
code path compiles to Mosaic (exercised by the bench/verify drives).
"""
import jax.numpy as jnp
import numpy as np
import pytest

from rte_rrtmgp_tpu.config import set_use_pallas
from rte_rrtmgp_tpu.drivers.allsky import make_allsky_inputs
from rte_rrtmgp_tpu.models.rrtmgp.gas_optics import GasOpticsRRTMGP
from rte_rrtmgp_tpu.utils.synthetic import synthetic_kdist

NCOL, NLAY = 5, 9  # deliberately not a multiple of the 128-cell block


@pytest.fixture(scope="module")
def problem():
    inputs = make_allsky_inputs(NCOL, NLAY)
    return inputs


@pytest.fixture(autouse=True)
def _restore_config():
    yield
    set_use_pallas(None)


@pytest.mark.parametrize("sw", [False, True])
def test_pallas_matches_xla_gas_optics(problem, sw):
    kd = synthetic_kdist(sw=sw, ngpt=32, nbnd=4, ntemp=6, npres=12)
    gop = GasOpticsRRTMGP(kd)
    inputs = problem

    def run():
        if sw:
            props, _ = gop.gas_optics_sw(inputs.play, inputs.plev,
                                         inputs.tlay, inputs.gas_concs,
                                         top_at_1=True)
            return np.asarray(props.tau), np.asarray(props.ssa)
        props, src = gop.gas_optics_lw(inputs.play, inputs.plev, inputs.tlay,
                                       inputs.tsfc, inputs.gas_concs,
                                       tlev=inputs.tlev, top_at_1=True)
        return np.asarray(props.tau), np.asarray(src.lay_source)

    set_use_pallas(False)
    tau_ref, aux_ref = run()
    set_use_pallas(True)   # interpreter mode on CPU
    tau_p, aux_p = run()

    np.testing.assert_allclose(tau_p, tau_ref, rtol=5e-6, atol=1e-30)
    np.testing.assert_allclose(aux_p, aux_ref, rtol=5e-6, atol=1e-30)


def test_pallas_cloud_optics_matches(problem):
    from rte_rrtmgp_tpu.utils.synthetic import synthetic_cloud_optics
    kd = synthetic_kdist(sw=False, ngpt=32, nbnd=4, ntemp=6, npres=12)
    cld = synthetic_cloud_optics(nbnd=4,
                                 band_lims_wvn=kd.grid.band_lims_wvn_array)
    i = problem

    set_use_pallas(False)
    ref = cld.cloud_optics(i.lwp, i.iwp, i.rel, i.dei)
    ref1 = cld.cloud_optics(i.lwp, i.iwp, i.rel, i.dei, scattering=False)
    set_use_pallas(True)
    out = cld.cloud_optics(i.lwp, i.iwp, i.rel, i.dei)
    out1 = cld.cloud_optics(i.lwp, i.iwp, i.rel, i.dei, scattering=False)
    np.testing.assert_allclose(np.asarray(out.tau), np.asarray(ref.tau),
                               rtol=5e-6, atol=1e-12)
    np.testing.assert_allclose(np.asarray(out.ssa), np.asarray(ref.ssa),
                               rtol=5e-6, atol=1e-12)
    np.testing.assert_allclose(np.asarray(out.g), np.asarray(ref.g),
                               rtol=5e-6, atol=1e-12)
    np.testing.assert_allclose(np.asarray(out1.tau), np.asarray(ref1.tau),
                               rtol=5e-6, atol=1e-12)


def test_pallas_cell_padding_edge():
    """ncol*nlay not a multiple of 128: padded cells must not leak."""
    kd = synthetic_kdist(sw=True, ngpt=16, nbnd=2, ntemp=5, npres=8)
    gop = GasOpticsRRTMGP(kd)
    inputs = make_allsky_inputs(3, 7)

    set_use_pallas(False)
    ref, _ = gop.gas_optics_sw(inputs.play, inputs.plev, inputs.tlay,
                               inputs.gas_concs, top_at_1=True)
    set_use_pallas(True)
    out, _ = gop.gas_optics_sw(inputs.play, inputs.plev, inputs.tlay,
                               inputs.gas_concs, top_at_1=True)
    np.testing.assert_allclose(np.asarray(out.tau), np.asarray(ref.tau),
                               rtol=5e-6)


def test_pallas_major_varying_surface_pressure():
    """Columns with different surface pressures (sigma-style grids) stay
    within the kernel's block pressure window and match XLA."""
    import jax.numpy as jnp
    from rte_rrtmgp_tpu.utils.profiles import allsky_profiles

    kd = synthetic_kdist(sw=False, ngpt=32, nbnd=4, ntemp=6, npres=12)
    gop = GasOpticsRRTMGP(kd)
    ncol, nlay = 7, 11
    play, plev, tlay, tlev, gas = allsky_profiles(ncol, nlay)
    scale = (1.0 + 0.08 * np.linspace(-1, 1, ncol))[:, None]  # +-8% psfc
    play = jnp.asarray(play * scale, jnp.float32)
    plev = jnp.asarray(plev * scale, jnp.float32)
    tlay = jnp.asarray(tlay, jnp.float32)
    tlev = jnp.asarray(tlev, jnp.float32)
    tsfc = tlay[:, -1]

    def run():
        p, s = gop.gas_optics_lw(play, plev, tlay, tsfc, gas, tlev=tlev,
                                 top_at_1=True)
        return np.asarray(p.tau), np.asarray(s.lev_source)

    set_use_pallas(False)
    tau_ref, lev_ref = run()
    set_use_pallas(True)
    tau_p, lev_p = run()
    np.testing.assert_allclose(tau_p, tau_ref, rtol=5e-6)
    np.testing.assert_allclose(lev_p, lev_ref, rtol=5e-6)


def test_pallas_major_pathological_grid_falls_back():
    """A pressure field violating the block-window assumption must be
    detected eagerly and fall back to the XLA path (identical results)."""
    import jax.numpy as jnp
    from rte_rrtmgp_tpu.ops.gas_optics_pallas import pressure_window_ok
    from rte_rrtmgp_tpu.utils.profiles import allsky_profiles

    kd = synthetic_kdist(sw=False, ngpt=32, nbnd=4, ntemp=6, npres=40)
    gop = GasOpticsRRTMGP(kd)
    ncol, nlay = 130, 4   # blocks span one layer
    play, plev, tlay, tlev, gas = allsky_profiles(ncol, nlay)
    # scramble pressures across columns by orders of magnitude
    rng = np.random.default_rng(3)
    fac = np.exp(rng.uniform(np.log(1e-3), 0.0, (ncol, 1)))
    play = jnp.asarray(play * fac, jnp.float32)
    plev = jnp.asarray(plev * fac, jnp.float32)
    tlay = jnp.asarray(tlay, jnp.float32)
    tlev = jnp.asarray(tlev, jnp.float32)
    tsfc = tlay[:, -1]

    def run():
        p, _ = gop.gas_optics_lw(play, plev, tlay, tsfc, gas, tlev=tlev,
                                 top_at_1=True)
        return np.asarray(p.tau)

    set_use_pallas(False)
    tau_ref = run()
    set_use_pallas(True)   # eager window check must reject -> XLA fallback
    tau_p = run()
    np.testing.assert_allclose(tau_p, tau_ref, rtol=1e-6)

    # sanity: the window check does reject this grid
    from rte_rrtmgp_tpu.ops.pallas.major_gather import PSPAN
    co = gop._interp(play, tlay,
                     gop._col_gas(play, plev, tlay, gas, None)[0])
    jb = np.asarray(co.jpress) + np.where(np.asarray(co.tropo), 0, 1)
    assert not pressure_window_ok(jb, PSPAN)


def test_pallas_sw_solver_matches_xla():
    import jax.numpy as jnp
    from rte_rrtmgp_tpu.ops.solver_sw import sw_solver_2stream

    rng = np.random.default_rng(11)
    ncol, nlay, ngpt = 5, 9, 20   # neither 8- nor 128-aligned
    tau = jnp.asarray(rng.uniform(1e-3, 2.0, (ncol, nlay, ngpt)), jnp.float32)
    ssa = jnp.asarray(rng.uniform(0.1, 0.99, (ncol, nlay, ngpt)), jnp.float32)
    g = jnp.asarray(rng.uniform(0.0, 0.85, (ncol, nlay, ngpt)), jnp.float32)
    mu0 = jnp.asarray(np.broadcast_to(
        rng.uniform(-0.2, 1.0, (ncol, 1)), (ncol, nlay)).copy(), jnp.float32)
    alb_dir = jnp.asarray(rng.uniform(0, 0.4, (ncol, ngpt)), jnp.float32)
    alb_dif = jnp.asarray(rng.uniform(0, 0.4, (ncol, ngpt)), jnp.float32)
    inc = jnp.asarray(rng.uniform(1, 8, (ncol, ngpt)), jnp.float32)
    dif = jnp.asarray(rng.uniform(0, 1, (ncol, ngpt)), jnp.float32)

    for top_at_1 in (True, False):
        set_use_pallas(False)
        ref = sw_solver_2stream(tau, ssa, g, mu0, alb_dir, alb_dif, inc,
                                top_at_1=top_at_1, inc_flux_dif=dif)
        set_use_pallas(True)
        out = sw_solver_2stream(tau, ssa, g, mu0, alb_dir, alb_dif, inc,
                                top_at_1=top_at_1, inc_flux_dif=dif)
        np.testing.assert_allclose(np.asarray(out.flux_up),
                                   np.asarray(ref.flux_up), rtol=2e-5,
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(out.flux_dn),
                                   np.asarray(ref.flux_dn), rtol=2e-5,
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(out.flux_dir),
                                   np.asarray(ref.flux_dir), rtol=2e-5,
                                   atol=1e-4)


@pytest.mark.parametrize("rescale", [False, True])
@pytest.mark.parametrize("top_at_1", [True, False])
def test_pallas_lw_solver_matches_xla(rescale, top_at_1):
    import jax.numpy as jnp
    from rte_rrtmgp_tpu.ops.solver_lw import (GAUSS_DS, GAUSS_WTS,
                                              lw_solver_noscat)

    rng = np.random.default_rng(5)
    ncol, nlay, ngpt = 5, 9, 20
    tau = jnp.asarray(rng.uniform(1e-3, 3.0, (ncol, nlay, ngpt)), jnp.float32)
    lay = jnp.asarray(rng.uniform(10, 60, (ncol, nlay, ngpt)), jnp.float32)
    lev = jnp.asarray(rng.uniform(10, 60, (ncol, nlay + 1, ngpt)), jnp.float32)
    emis = jnp.asarray(rng.uniform(0.9, 1.0, (ncol, ngpt)), jnp.float32)
    src = jnp.asarray(rng.uniform(30, 80, (ncol, ngpt)), jnp.float32)
    jac = jnp.asarray(rng.uniform(0.1, 1.0, (ncol, ngpt)), jnp.float32)
    inc = jnp.asarray(rng.uniform(0, 5, (ncol, ngpt)), jnp.float32)
    ssa = jnp.asarray(rng.uniform(0, 0.7, (ncol, nlay, ngpt)), jnp.float32)
    g = jnp.asarray(rng.uniform(0, 0.8, (ncol, nlay, ngpt)), jnp.float32)

    kw = dict(top_at_1=top_at_1, ds=np.asarray(GAUSS_DS[0]),
              weights=GAUSS_WTS[0], sfc_src_jac=jac, do_jacobians=True)
    if rescale:
        kw.update(ssa=ssa, g=g, do_rescaling=True)
    set_use_pallas(False)
    ref = lw_solver_noscat(tau, lay, lev, emis, src, inc, **kw)
    set_use_pallas(True)
    out = lw_solver_noscat(tau, lay, lev, emis, src, inc, **kw)
    np.testing.assert_allclose(np.asarray(out.flux_up),
                               np.asarray(ref.flux_up), rtol=2e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out.flux_dn),
                               np.asarray(ref.flux_dn), rtol=2e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out.flux_up_jac),
                               np.asarray(ref.flux_up_jac), rtol=2e-5,
                               atol=1e-5)


@pytest.mark.parametrize("sw", [False, True])
@pytest.mark.parametrize("clouds,aerosols", [(False, False), (True, False),
                                             (True, True), (False, True)])
def test_fused_lane_step_matches_generic(sw, clouds, aerosols):
    """The fused lane-layout all-sky step (gas optics -> cloud + aerosol
    increments -> solver, all in (ngpt, nlay, ncol) layout) must match the
    generic OpticalProps pipeline (reference timed loop includes aerosols,
    rrtmgp_allsky.F90:352-355, 375, 394-399)."""
    from rte_rrtmgp_tpu.drivers.allsky import (allsky_step_lw,
                                               allsky_step_lw_lanes,
                                               allsky_step_sw,
                                               allsky_step_sw_lanes)
    from rte_rrtmgp_tpu.utils.synthetic import (synthetic_aerosol_optics,
                                                synthetic_cloud_optics)

    kd = synthetic_kdist(sw=sw, ngpt=32, nbnd=4, ntemp=6, npres=12)
    gop = GasOpticsRRTMGP(kd)
    cld = synthetic_cloud_optics(nbnd=4,
                                 band_lims_wvn=kd.grid.band_lims_wvn_array)
    aer = synthetic_aerosol_optics(
        nbnd=4, band_lims_wvn=kd.grid.band_lims_wvn_array)
    # 128 columns: each layer-major 128-cell block sits in one layer, so
    # the major kernel's pressure-window guard passes and the full lane
    # pipeline (major + minors + rayleigh + solver) is exercised
    inputs = make_allsky_inputs(128, 4, cloud_optics=cld)

    step = allsky_step_sw if sw else allsky_step_lw
    fused_fn = allsky_step_sw_lanes if sw else allsky_step_lw_lanes
    kw = dict(cloud_optics=cld if clouds else None, use_clouds=clouds,
              aerosol_optics=aer if aerosols else None,
              use_aerosols=aerosols)

    set_use_pallas(False)
    ref = step(inputs, gop, **kw)
    set_use_pallas(True)
    fused = fused_fn(inputs, gop, **kw)
    assert fused is not None, "lane pipeline unexpectedly unavailable"

    for name in ("flux_up", "flux_dn") + (("flux_dn_dir",) if sw else ()):
        a = np.asarray(getattr(fused, name))
        b = np.asarray(getattr(ref, name))
        np.testing.assert_allclose(a, b, rtol=3e-5, atol=5e-4,
                                   err_msg=f"{name} sw={sw} clouds={clouds} "
                                           f"aerosols={aerosols}")


def test_fused_rfmip_matches_generic():
    """The RFMIP drivers' fused-kernel dispatch must match the generic
    path (tiny problem; fused kernels in interpreter mode)."""
    from rte_rrtmgp_tpu.drivers.rfmip import rfmip_lw, rfmip_sw, synthetic_rfmip

    data = synthetic_rfmip(nsite=128, nlay=8, nexp=1)
    kd_lw = synthetic_kdist(sw=False, ngpt=32, nbnd=4, ntemp=6, npres=12)
    kd_sw = synthetic_kdist(sw=True, ngpt=16, nbnd=2, ntemp=6, npres=12)
    g_lw, g_sw = GasOpticsRRTMGP(kd_lw), GasOpticsRRTMGP(kd_sw)

    set_use_pallas(True)
    up, dn = rfmip_lw(data, g_lw)
    su, sd = rfmip_sw(data, g_sw)
    set_use_pallas(False)
    upr, dnr = rfmip_lw(data, g_lw)
    sur, sdr = rfmip_sw(data, g_sw)

    for name, a, b in (("rlu", up, upr), ("rld", dn, dnr),
                       ("rsu", su, sur), ("rsd", sd, sdr)):
        np.testing.assert_allclose(a, b, rtol=5e-5, atol=5e-4, err_msg=name)


def test_pallas_lw_multiangle_and_lwds_match_xla():
    """Multi-angle (n_gauss_angles 2-4) and per-gpt lw_Ds secants stay on
    the Pallas path (reference mo_rte_lw.F90:341-366) and match the XLA
    solve."""
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from gray_atmosphere import gray_rad_equil
    from rte_rrtmgp_tpu import rte_lw

    ncol, nlay = 8, 10
    tsfc = np.linspace(270.0, 310.0, ncol)
    taus = np.linspace(0.2, 20.0, ncol)
    props, src = gray_rad_equil(tsfc, taus, nlay)
    emis = jnp.full((ncol, 1), 0.96, jnp.float64)

    cases = [dict(n_gauss_angles=n) for n in (1, 2, 3, 4)]
    rng = np.random.default_rng(2)
    cases.append(dict(lw_ds=jnp.asarray(
        rng.uniform(1.5, 1.8, (ncol, 1)), jnp.float64)))

    for kw in cases:
        set_use_pallas(False)
        ref = rte_lw(props, src, emis, compute_jacobian=True, **kw)
        set_use_pallas(True)
        out = rte_lw(props, src, emis, compute_jacobian=True, **kw)
        for name in ("flux_up", "flux_dn", "flux_up_jac"):
            np.testing.assert_allclose(
                np.asarray(getattr(out, name)),
                np.asarray(getattr(ref, name)), rtol=1e-10, atol=1e-12,
                err_msg=f"{name} {kw.keys()}")


def test_pallas_lw_two_stream_matches_xla():
    """The LW true-two-stream lane kernel (rte_lw(use_2stream=True))
    matches the XLA solve, broadband and byband."""
    from rte_rrtmgp_tpu import (OpticalProps2str, SourcesLW, SpectralGrid,
                                rte_lw)

    rng = np.random.default_rng(4)
    ncol, nlay, ngpt = 7, 11, 16
    grid = SpectralGrid.from_arrays(
        [[0.0, 1500.0], [1500.0, 3250.0]], [[1, 8], [9, 16]])
    props = OpticalProps2str(
        tau=jnp.asarray(rng.uniform(1e-3, 4.0, (ncol, nlay, ngpt))),
        ssa=jnp.asarray(rng.uniform(0.0, 0.7, (ncol, nlay, ngpt))),
        g=jnp.asarray(rng.uniform(0.0, 0.8, (ncol, nlay, ngpt))),
        grid=grid)
    src = SourcesLW(
        lay_source=jnp.asarray(rng.uniform(10, 60, (ncol, nlay, ngpt))),
        lev_source=jnp.asarray(rng.uniform(10, 60, (ncol, nlay + 1, ngpt))),
        sfc_source=jnp.asarray(rng.uniform(30, 80, (ncol, ngpt))),
        sfc_source_jac=jnp.zeros((ncol, ngpt)), grid=grid)
    emis = jnp.asarray(rng.uniform(0.9, 1.0, (ncol, 1)))

    set_use_pallas(False)
    ref = rte_lw(props, src, emis, use_2stream=True)
    ref_bb = rte_lw(props, src, emis, use_2stream=True, byband=True)
    set_use_pallas(True)
    out = rte_lw(props, src, emis, use_2stream=True)
    out_bb = rte_lw(props, src, emis, use_2stream=True, byband=True)
    for a, b in ((out.flux_up, ref.flux_up), (out.flux_dn, ref.flux_dn),
                 (out_bb.flux_up, ref_bb.flux_up),
                 (out_bb.flux_dn, ref_bb.flux_dn)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-10, atol=1e-12)
    assert out_bb.flux_up.shape == (ncol, nlay + 1, 2)


@pytest.mark.parametrize("sw", [False, True])
def test_fused_allsky_byband_matches_generic(sw):
    """allsky_step_*(byband=True): the grand fused kernels' in-kernel
    per-band sums match the generic spectral+reduce path."""
    from rte_rrtmgp_tpu.drivers.allsky import allsky_step_lw, allsky_step_sw
    from rte_rrtmgp_tpu.utils.synthetic import synthetic_cloud_optics

    kd = synthetic_kdist(sw=sw, ngpt=32, nbnd=4, ntemp=6, npres=12)
    gop = GasOpticsRRTMGP(kd)
    cld = synthetic_cloud_optics(nbnd=4,
                                 band_lims_wvn=kd.grid.band_lims_wvn_array)
    inputs = make_allsky_inputs(128, 4, cloud_optics=cld)
    step = allsky_step_sw if sw else allsky_step_lw

    set_use_pallas(False)
    ref = step(inputs, gop, cloud_optics=cld, byband=True)
    set_use_pallas(True)
    out = step(inputs, gop, cloud_optics=cld, byband=True)
    assert out.flux_up.shape == (128, 5, 4)
    for name in ("flux_up", "flux_dn") + (("flux_dn_dir",) if sw else ()):
        np.testing.assert_allclose(
            np.asarray(getattr(out, name)), np.asarray(getattr(ref, name)),
            rtol=3e-5, atol=5e-4, err_msg=f"{name} sw={sw}")
    # byband sums equal the broadband fluxes
    bb = step(inputs, gop, cloud_optics=cld)
    np.testing.assert_allclose(np.asarray(out.flux_up.sum(-1)),
                               np.asarray(bb.flux_up), rtol=2e-5, atol=5e-4)


def test_fused_sw_mixed_tropo_block():
    """A 128-column block whose layer straddles the tropopause must take
    the fused SW kernel's mixed-atmosphere rayleigh path (tcode==0) and
    still match the generic pipeline (reference selects krayl[itropo]
    per cell, kernels :506-565)."""
    from rte_rrtmgp_tpu.drivers.allsky import (allsky_step_sw,
                                               allsky_step_sw_lanes)

    kd = synthetic_kdist(sw=True, ngpt=32, nbnd=4, ntemp=6, npres=12)
    gop = GasOpticsRRTMGP(kd)
    inputs = make_allsky_inputs(128, 6)
    play = np.asarray(inputs.play).copy()
    pt = float(np.exp(float(kd.press_ref_trop_log)))
    j = int(np.argmin(np.abs(play[0] - pt)))
    alt = np.where(np.arange(128) % 2 == 0, 1.01, 0.99)
    play[:, j] = pt * alt
    # sanity: layer j really is mixed across the block
    assert (play[:, j] > pt).any() and (play[:, j] <= pt).any()
    inputs = inputs._replace(play=jnp.asarray(play, jnp.float32))

    set_use_pallas(False)
    ref = allsky_step_sw(inputs, gop, use_clouds=False)
    set_use_pallas(True)
    out = allsky_step_sw_lanes(inputs, gop, use_clouds=False)
    assert out is not None, "fused SW path unexpectedly unavailable"
    for name in ("flux_up", "flux_dn", "flux_dn_dir"):
        np.testing.assert_allclose(
            np.asarray(getattr(out, name)), np.asarray(getattr(ref, name)),
            rtol=3e-5, atol=5e-4, err_msg=name)


@pytest.mark.parametrize("sw", [False, True])
def test_fused_step_column_padding(sw):
    """ncol not a multiple of 128 (the RFMIP 1800-column shape): the fused
    kernels' zero/edge column padding must not perturb the real columns."""
    from rte_rrtmgp_tpu.drivers.allsky import (allsky_step_lw,
                                               allsky_step_lw_lanes,
                                               allsky_step_sw,
                                               allsky_step_sw_lanes)

    kd = synthetic_kdist(sw=sw, ngpt=32, nbnd=4, ntemp=6, npres=12)
    gop = GasOpticsRRTMGP(kd)
    inputs = make_allsky_inputs(136, 4)
    step = allsky_step_sw if sw else allsky_step_lw
    fused_fn = allsky_step_sw_lanes if sw else allsky_step_lw_lanes

    set_use_pallas(False)
    ref = step(inputs, gop, use_clouds=False)
    set_use_pallas(True)
    out = fused_fn(inputs, gop, use_clouds=False)
    assert out is not None, "fused path unexpectedly unavailable"
    for name in ("flux_up", "flux_dn") + (("flux_dn_dir",) if sw else ()):
        a = np.asarray(getattr(out, name))
        assert a.shape[0] == 136
        np.testing.assert_allclose(
            a, np.asarray(getattr(ref, name)), rtol=3e-5, atol=5e-4,
            err_msg=f"{name} sw={sw}")
