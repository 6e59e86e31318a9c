"""Native C++ kernel tier vs the JAX reference implementations.

The C++ tier (native/, extern C ABI mirroring the reference's
RTE_KERNEL_MODE=extern interface) must agree with the JAX ops on random
problems — an independent-implementation cross-check of both.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from rte_rrtmgp_tpu.ops.solver_lw import (GAUSS_DS, GAUSS_WTS,
                                          lw_solver_noscat, lw_solver_2stream)
from rte_rrtmgp_tpu.ops.solver_sw import sw_solver_2stream, sw_solver_noscat
from rte_rrtmgp_tpu.optical_props import (OpticalProps2str, delta_scale,
                                          increment)
from rte_rrtmgp_tpu.spectral import SpectralGrid

native = pytest.importorskip("rte_rrtmgp_tpu.native")
if not native.available():
    pytest.skip("native toolchain unavailable", allow_module_level=True)

NCOL, NLAY, NGPT = 5, 9, 8
RNG = np.random.default_rng(42)


@pytest.fixture(scope="module", params=[np.float32, np.float64])
def nk(request):
    return native.load(request.param)


def _rand(*shape, lo=0.0, hi=1.0):
    return RNG.uniform(lo, hi, shape)


def _lw_problem():
    tau = _rand(NCOL, NLAY, NGPT, lo=1e-3, hi=3.0)
    lay = _rand(NCOL, NLAY, NGPT, lo=10, hi=60)
    lev = _rand(NCOL, NLAY + 1, NGPT, lo=10, hi=60)
    emis = _rand(NCOL, NGPT, lo=0.9, hi=1.0)
    src = _rand(NCOL, NGPT, lo=30, hi=80)
    jac = _rand(NCOL, NGPT, lo=0.1, hi=1.0)
    inc = _rand(NCOL, NGPT, lo=0.0, hi=5.0)
    return tau, lay, lev, emis, src, jac, inc


@pytest.mark.parametrize("top_at_1", [True, False])
@pytest.mark.parametrize("nmus", [1, 3])
def test_lw_noscat_matches_jax(nk, top_at_1, nmus):
    tau, lay, lev, emis, src, jac, inc = _lw_problem()
    ref = lw_solver_noscat(
        jnp.asarray(tau), jnp.asarray(lay), jnp.asarray(lev),
        jnp.asarray(emis), jnp.asarray(src), jnp.asarray(inc),
        top_at_1=top_at_1, ds=np.asarray(GAUSS_DS[nmus - 1]),
        weights=GAUSS_WTS[nmus - 1], sfc_src_jac=jnp.asarray(jac),
        do_jacobians=True)
    up, dn, upjac = nk.lw_solver_noscat(
        tau, lay, lev, emis, src, inc, top_at_1=top_at_1,
        ds=np.asarray(GAUSS_DS[nmus - 1]), weights=GAUSS_WTS[nmus - 1],
        sfc_src_jac=jac, do_jacobians=True, broadband=True)
    rtol = 2e-5 if nk.dtype == np.float32 else 1e-12
    np.testing.assert_allclose(up, np.asarray(ref.flux_up), rtol=rtol, atol=1e-4)
    np.testing.assert_allclose(dn, np.asarray(ref.flux_dn), rtol=rtol, atol=1e-4)
    np.testing.assert_allclose(upjac, np.asarray(ref.flux_up_jac),
                               rtol=rtol, atol=1e-5)


def test_lw_noscat_rescaling_matches_jax(nk):
    tau, lay, lev, emis, src, jac, inc = _lw_problem()
    ssa = _rand(NCOL, NLAY, NGPT, lo=0.0, hi=0.7)
    g = _rand(NCOL, NLAY, NGPT, lo=0.0, hi=0.8)
    ref = lw_solver_noscat(
        jnp.asarray(tau), jnp.asarray(lay), jnp.asarray(lev),
        jnp.asarray(emis), jnp.asarray(src), jnp.asarray(inc),
        top_at_1=True, ds=np.asarray(GAUSS_DS[0]), weights=GAUSS_WTS[0],
        ssa=jnp.asarray(ssa), g=jnp.asarray(g), do_rescaling=True)
    up, dn, _ = nk.lw_solver_noscat(
        tau, lay, lev, emis, src, inc, top_at_1=True,
        ds=np.asarray(GAUSS_DS[0]), weights=GAUSS_WTS[0],
        ssa=ssa, g=g, do_rescaling=True, broadband=True)
    rtol = 2e-5 if nk.dtype == np.float32 else 1e-12
    np.testing.assert_allclose(up, np.asarray(ref.flux_up), rtol=rtol, atol=1e-4)
    np.testing.assert_allclose(dn, np.asarray(ref.flux_dn), rtol=rtol, atol=1e-4)


@pytest.mark.parametrize("top_at_1", [True, False])
def test_lw_2stream_matches_jax(nk, top_at_1):
    tau, lay, lev, emis, src, _, inc = _lw_problem()
    ssa = _rand(NCOL, NLAY, NGPT, lo=0.05, hi=0.7)
    g = _rand(NCOL, NLAY, NGPT, lo=0.0, hi=0.8)
    ref = lw_solver_2stream(
        jnp.asarray(tau), jnp.asarray(ssa), jnp.asarray(g),
        jnp.asarray(lay), jnp.asarray(lev), jnp.asarray(emis),
        jnp.asarray(src), jnp.asarray(inc), top_at_1=top_at_1, spectral=True)
    fu, fd = nk.lw_solver_2stream(tau, ssa, g, lay, lev, emis, src, inc,
                                  top_at_1=top_at_1)
    rtol = 5e-5 if nk.dtype == np.float32 else 1e-11
    np.testing.assert_allclose(fu, np.asarray(ref.flux_up), rtol=rtol, atol=1e-3)
    np.testing.assert_allclose(fd, np.asarray(ref.flux_dn), rtol=rtol, atol=1e-3)


@pytest.mark.parametrize("top_at_1", [True, False])
def test_sw_2stream_matches_jax(nk, top_at_1):
    tau = _rand(NCOL, NLAY, NGPT, lo=1e-3, hi=2.0)
    ssa = _rand(NCOL, NLAY, NGPT, lo=0.1, hi=0.99)
    g = _rand(NCOL, NLAY, NGPT, lo=0.0, hi=0.85)
    mu0 = np.broadcast_to(_rand(NCOL, 1, lo=-0.2, hi=1.0),
                          (NCOL, NLAY)).copy()
    alb_dir = _rand(NCOL, NGPT, lo=0.0, hi=0.4)
    alb_dif = _rand(NCOL, NGPT, lo=0.0, hi=0.4)
    inc = _rand(NCOL, NGPT, lo=1.0, hi=8.0)
    dif = _rand(NCOL, NGPT, lo=0.0, hi=1.0)
    ref = sw_solver_2stream(
        jnp.asarray(tau), jnp.asarray(ssa), jnp.asarray(g), jnp.asarray(mu0),
        jnp.asarray(alb_dir), jnp.asarray(alb_dif), jnp.asarray(inc),
        top_at_1=top_at_1, inc_flux_dif=jnp.asarray(dif))
    bu, bd, br = nk.sw_solver_2stream(tau, ssa, g, mu0, alb_dir, alb_dif,
                                      inc, top_at_1=top_at_1,
                                      inc_flux_dif=dif, broadband=True)
    rtol = 5e-5 if nk.dtype == np.float32 else 1e-11
    np.testing.assert_allclose(bu, np.asarray(ref.flux_up), rtol=rtol, atol=1e-3)
    np.testing.assert_allclose(bd, np.asarray(ref.flux_dn), rtol=rtol, atol=1e-3)
    np.testing.assert_allclose(br, np.asarray(ref.flux_dir), rtol=rtol, atol=1e-3)


def test_sw_noscat_matches_jax(nk):
    tau = _rand(NCOL, NLAY, NGPT, lo=1e-3, hi=2.0)
    mu0 = np.broadcast_to(_rand(NCOL, 1, lo=0.1, hi=1.0), (NCOL, NLAY)).copy()
    inc = _rand(NCOL, NGPT, lo=1.0, hi=8.0)
    ref = sw_solver_noscat(jnp.asarray(tau), jnp.asarray(mu0),
                           jnp.asarray(inc), top_at_1=True)
    fdir = nk.sw_solver_noscat(tau, mu0, inc, top_at_1=True)
    rtol = 2e-5 if nk.dtype == np.float32 else 1e-12
    np.testing.assert_allclose(fdir, np.asarray(ref), rtol=rtol, atol=1e-5)


def test_optical_props_ops_match_jax(nk):
    grid = SpectralGrid.from_arrays(
        np.stack([np.arange(4) * 100.0, (np.arange(4) + 1) * 100.0], 1),
        np.stack([np.arange(4) * 2 + 1, np.arange(4) * 2 + 2], 1))
    tau1 = _rand(NCOL, NLAY, NGPT, lo=0.01, hi=2.0)
    ssa1 = _rand(NCOL, NLAY, NGPT, lo=0.1, hi=0.9)
    g1 = _rand(NCOL, NLAY, NGPT, lo=0.0, hi=0.8)
    tau2 = _rand(NCOL, NLAY, NGPT, lo=0.01, hi=2.0)
    ssa2 = _rand(NCOL, NLAY, NGPT, lo=0.1, hi=0.9)
    g2 = _rand(NCOL, NLAY, NGPT, lo=0.0, hi=0.8)

    # delta scale
    p = OpticalProps2str(tau=jnp.asarray(tau1), ssa=jnp.asarray(ssa1),
                         g=jnp.asarray(g1), grid=grid, top_at_1=True)
    ref = delta_scale(p)
    t, s, gg = nk.delta_scale(tau1, ssa1, g1)
    rtol = 2e-5 if nk.dtype == np.float32 else 1e-12
    np.testing.assert_allclose(t, np.asarray(ref.tau), rtol=rtol)
    np.testing.assert_allclose(s, np.asarray(ref.ssa), rtol=rtol, atol=1e-6)
    np.testing.assert_allclose(gg, np.asarray(ref.g), rtol=rtol, atol=1e-6)

    # increment (same grid)
    p2 = OpticalProps2str(tau=jnp.asarray(tau2), ssa=jnp.asarray(ssa2),
                          g=jnp.asarray(g2), grid=grid, top_at_1=True)
    ref_inc = increment(p, p2)
    t, s, gg = nk.increment_2stream_by_2stream(tau1, ssa1, g1, tau2, ssa2, g2)
    np.testing.assert_allclose(t, np.asarray(ref_inc.tau), rtol=rtol)
    np.testing.assert_allclose(s, np.asarray(ref_inc.ssa), rtol=rtol, atol=1e-6)
    np.testing.assert_allclose(gg, np.asarray(ref_inc.g), rtol=rtol, atol=1e-6)

    # by-band increment: band fields expanded by the JAX path
    nbnd = grid.nband
    tau_b = _rand(NCOL, NLAY, nbnd, lo=0.01, hi=1.0)
    ssa_b = _rand(NCOL, NLAY, nbnd, lo=0.1, hi=0.9)
    g_b = _rand(NCOL, NLAY, nbnd, lo=0.0, hi=0.8)
    band_grid = SpectralGrid.from_arrays(grid.band_lims_wvn_array)
    pb = OpticalProps2str(tau=jnp.asarray(tau_b), ssa=jnp.asarray(ssa_b),
                          g=jnp.asarray(g_b),
                          grid=band_grid, top_at_1=True)
    ref_bb = increment(p, pb)
    t, s, gg = nk.inc_2stream_by_2stream_bybnd(
        tau1, ssa1, g1, tau_b, ssa_b, g_b, grid.band_lims_gpt_array)
    np.testing.assert_allclose(t, np.asarray(ref_bb.tau), rtol=rtol)
    np.testing.assert_allclose(s, np.asarray(ref_bb.ssa), rtol=rtol, atol=1e-6)
    np.testing.assert_allclose(gg, np.asarray(ref_bb.g), rtol=rtol, atol=1e-6)


def test_flux_reductions_match(nk):
    flux = _rand(NCOL, NLAY + 1, NGPT, lo=0.0, hi=300.0)
    bb = nk.sum_broadband(flux)
    np.testing.assert_allclose(bb, flux.sum(-1), rtol=2e-6, atol=1e-3)
    lims = np.stack([np.arange(4) * 2 + 1, np.arange(4) * 2 + 2], 1)
    byb = nk.sum_byband(flux, lims)
    ref = flux.reshape(NCOL, NLAY + 1, 4, 2).sum(-1)
    np.testing.assert_allclose(byb, ref, rtol=2e-6, atol=1e-3)


# ---------------------------------------------------------------------------
# RRTMGP gas-optics / cloud-optics kernels
# (reference rrtmgp/kernels/api/mo_gas_optics_rrtmgp_kernels.F90)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def rrtmgp_problem():
    from rte_rrtmgp_tpu.drivers.allsky import make_allsky_inputs
    from rte_rrtmgp_tpu.models.rrtmgp.gas_optics import GasOpticsRRTMGP
    from rte_rrtmgp_tpu.utils.synthetic import synthetic_kdist

    kd = synthetic_kdist(sw=False, ngpt=32, nbnd=4, ntemp=6, npres=12,
                         dtype=jnp.float64)
    kd_sw = synthetic_kdist(sw=True, ngpt=32, nbnd=4, ntemp=6, npres=12,
                            dtype=jnp.float64)
    gop = GasOpticsRRTMGP(kd)
    gop_sw = GasOpticsRRTMGP(kd_sw)
    inputs = make_allsky_inputs(6, 10, dtype=jnp.float64)
    return kd, kd_sw, gop, gop_sw, inputs


def _native_interp(nk64, kd, gop, inputs):
    col_gas, col_dry, idx_h2o = gop._col_gas(
        inputs.play, inputs.plev, inputs.tlay, inputs.gas_concs, None)
    cg = np.moveaxis(np.asarray(col_gas), 0, -1)       # (ncol, nlay, ngas+1)
    interp = nk64.interpolation(
        np.asarray(inputs.play), np.asarray(inputs.tlay), cg,
        flavor=np.asarray(kd.flavor), press_ref_log=kd.press_ref_log,
        temp_ref=kd.temp_ref, press_ref_log_delta=kd.press_ref_log_delta,
        temp_ref_min=kd.temp_ref_min, temp_ref_delta=kd.temp_ref_delta,
        press_ref_trop_log=kd.press_ref_trop_log, vmr_ref=kd.vmr_ref,
        neta=kd.neta)
    return interp, cg, np.asarray(col_dry), idx_h2o, col_gas


def test_native_interpolation_matches_jax(rrtmgp_problem):
    kd, _, gop, _, inputs = rrtmgp_problem
    nk64 = native.load(np.float64)
    interp, _, _, _, col_gas = _native_interp(nk64, kd, gop, inputs)
    ref = gop._interp(inputs.play, inputs.tlay, col_gas)

    np.testing.assert_array_equal(interp["jtemp"] - 1, np.asarray(ref.jtemp))
    np.testing.assert_array_equal(interp["jpress"] - 1, np.asarray(ref.jpress))
    np.testing.assert_array_equal(interp["tropo"], np.asarray(ref.tropo))
    # jeta/col_mix/fminor/fmajor: native (.., ncol, nlay, nflav) vs JAX
    # (.., nflav, ncol, nlay)
    np.testing.assert_array_equal(
        np.moveaxis(interp["jeta"], 3, 1) - 1, np.asarray(ref.jeta))
    np.testing.assert_allclose(
        np.moveaxis(interp["col_mix"], 3, 1), np.asarray(ref.col_mix),
        rtol=1e-12)
    # native fminor(eta, temp, ...) vs JAX fminor[it, de, flav, c, l]
    fm = np.moveaxis(interp["fminor"], 4, 2)           # (2e, 2t, nflav, c, l)
    np.testing.assert_allclose(fm.swapaxes(0, 1), np.asarray(ref.fminor),
                               rtol=1e-12, atol=1e-15)
    # native fmajor(eta, press, temp, ...) vs JAX fmajor[it, dp, de, ...]
    fj = np.moveaxis(interp["fmajor"], 5, 3)       # (2e, 2p, 2t, nflav, c, l)
    np.testing.assert_allclose(fj.transpose(2, 1, 0, 3, 4, 5),
                               np.asarray(ref.fmajor), rtol=1e-12, atol=1e-15)


def test_native_tau_and_planck_match_jax(rrtmgp_problem):
    kd, _, gop, _, inputs = rrtmgp_problem
    nk64 = native.load(np.float64)
    interp, cg, _, idx_h2o, _ = _native_interp(nk64, kd, gop, inputs)

    tau = nk64.compute_tau_absorption(
        interp, ngpt=kd.grid.ngpt, gpoint_flavor=kd.gpoint_flavor,
        band_lims_gpt=kd.grid.band_lims_gpt_array,
        kmajor=np.asarray(kd.kmajor),
        kminor_lower=np.asarray(kd.kminor_lower),
        kminor_upper=np.asarray(kd.kminor_upper),
        minor_lower=kd.minor_lower, minor_upper=kd.minor_upper,
        idx_h2o=idx_h2o, play=np.asarray(inputs.play),
        tlay=np.asarray(inputs.tlay), col_gas=cg)

    props, sources = gop.gas_optics_lw(
        inputs.play, inputs.plev, inputs.tlay, inputs.tsfc, inputs.gas_concs,
        tlev=inputs.tlev, top_at_1=True)
    np.testing.assert_allclose(tau, np.asarray(props.tau), rtol=1e-10,
                               atol=1e-30)

    sfc, lay, lev, jac = nk64.compute_planck_source(
        interp, tlay=np.asarray(inputs.tlay), tlev=np.asarray(inputs.tlev),
        tsfc=np.asarray(inputs.tsfc), sfc_lay=inputs.play.shape[1],
        gpt2band=kd.grid.gpt2band, band_lims_gpt=kd.grid.band_lims_gpt_array,
        planck_frac=np.asarray(kd.planck_frac),
        temp_ref_min=kd.temp_ref_min, totplnk_delta=kd.totplnk_delta,
        totplnk=np.asarray(kd.totplnk), gpoint_flavor=kd.gpoint_flavor)
    np.testing.assert_allclose(sfc, np.asarray(sources.sfc_source),
                               rtol=1e-10)
    np.testing.assert_allclose(lay, np.asarray(sources.lay_source),
                               rtol=1e-10)
    np.testing.assert_allclose(lev, np.asarray(sources.lev_source),
                               rtol=1e-10)
    np.testing.assert_allclose(jac, np.asarray(sources.sfc_source_jac),
                               rtol=1e-8)


def test_native_rayleigh_matches_jax(rrtmgp_problem):
    _, kd_sw, _, gop_sw, inputs = rrtmgp_problem
    nk64 = native.load(np.float64)
    interp, cg, col_dry, idx_h2o, col_gas = _native_interp(
        nk64, kd_sw, gop_sw, inputs)

    tau_ray = nk64.compute_tau_rayleigh(
        interp, gpoint_flavor=kd_sw.gpoint_flavor,
        band_lims_gpt=kd_sw.grid.band_lims_gpt_array,
        krayl=np.asarray(kd_sw.krayl), idx_h2o=idx_h2o,
        col_dry=col_dry, col_gas=cg)

    props, _ = gop_sw.gas_optics_sw(inputs.play, inputs.plev, inputs.tlay,
                                    inputs.gas_concs, top_at_1=True)
    # JAX path folds Rayleigh into (tau, ssa): tau_ray = tau * ssa
    np.testing.assert_allclose(tau_ray,
                               np.asarray(props.tau * props.ssa),
                               rtol=1e-9, atol=1e-30)


def test_native_cloud_table_matches_jax(rrtmgp_problem):
    from rte_rrtmgp_tpu.utils.synthetic import synthetic_cloud_optics

    kd, _, _, _, inputs = rrtmgp_problem
    cld = synthetic_cloud_optics(nbnd=4,
                                 band_lims_wvn=kd.grid.band_lims_wvn_array,
                                 dtype=jnp.float64)
    nk64 = native.load(np.float64)
    lwp = np.asarray(inputs.lwp)
    rel = np.asarray(inputs.rel)
    tau, tss, tsg = nk64.compute_cld_from_table(
        lwp > 0.0, lwp, rel, nsteps=cld.liq_nsteps,
        step_size=cld.liq_step_size, offset=cld.radliq_lwr,
        tau_table=np.asarray(cld.extliq),
        ssa_table=np.asarray(cld.ssaliq),
        asy_table=np.asarray(cld.asyliq))
    # liquid-only cloud optics through the JAX module (iwp = 0)
    props = cld.cloud_optics(inputs.lwp, jnp.zeros_like(inputs.iwp),
                             inputs.rel, inputs.dei)
    np.testing.assert_allclose(tau, np.asarray(props.tau), rtol=1e-10,
                               atol=1e-30)
    ssa_ref = np.asarray(props.ssa)
    with np.errstate(invalid="ignore", divide="ignore"):
        ssa_native = np.where(tau > 0, tss / np.where(tau > 0, tau, 1.0), 0.0)
    np.testing.assert_allclose(ssa_native, ssa_ref, rtol=1e-10, atol=1e-12)


# ---------------------------------------------------------------------------
# header <-> bindings consistency (reference cbind_generator.py's role:
# one source of truth for the C ABI)
# ---------------------------------------------------------------------------

def test_header_prototypes_drive_ctypes_argtypes():
    """Every header prototype parses, binds to a symbol in the built
    library, and is wired as argtypes (so call-site drift raises
    ctypes.ArgumentError at the call instead of corrupting the frame)."""
    import ctypes
    from rte_rrtmgp_tpu import native

    protos = native.parse_header_prototypes()
    assert len(protos) >= 30, sorted(protos)   # 29 RTE + 5 RRTMGP kernels
    kern = native.load(np.float64)
    for name, argts in native.parse_header_prototypes(
            ctypes.c_double).items():
        fn = getattr(kern.lib, name)
        assert fn.argtypes == argts, name
        assert fn.restype is None

    # every Python wrapper call site targets a declared header symbol
    # (the full ABI is wider than the wrappers: it also serves external
    # C/C++ host models, like the reference's extern kernel mode)
    import inspect
    import re
    src = inspect.getsource(native)
    called = set(re.findall(r"\blib\.(\w+)\(", src))
    undeclared = sorted(called - set(protos))
    assert not undeclared, f"call sites with no header prototype: {undeclared}"


def test_argtypes_reject_wrong_call():
    """The generated argtypes actually enforce: calling with a wrong
    argument count/type must raise, not corrupt memory."""
    import ctypes
    from rte_rrtmgp_tpu import native

    kern = native.load(np.float32)
    fn = kern.lib.rte_sum_broadband
    with pytest.raises((ctypes.ArgumentError, TypeError)):
        fn(ctypes.c_int(1), ctypes.c_int(1), ctypes.c_int(1),
           ctypes.c_double(0.0))   # Float* param given a double scalar


def test_native_planck_out_of_range_matches_jax(rrtmgp_problem):
    """Surface temperatures OUTSIDE the totplnk table range: the native
    planck1d previously extrapolated linearly while the JAX port follows
    the reference interpolate1D (clamped index, unclamped fraction) —
    they must agree bit-for-bit semantics now (round-5 alignment)."""
    kd, _, gop, _, inputs = rrtmgp_problem
    nk64 = native.load(np.float64)
    interp, cg, _, idx_h2o, _ = _native_interp(nk64, kd, gop, inputs)

    # push the surface temperatures past both table ends
    ncol = inputs.play.shape[0]
    tsfc_hot = np.full(ncol, kd.temp_ref_max + 40.0)
    tsfc_cold = np.full(ncol, kd.temp_ref_min - 30.0)
    for tsfc in (tsfc_hot, tsfc_cold):
        sfc, _, _, jac = nk64.compute_planck_source(
            interp, tlay=np.asarray(inputs.tlay),
            tlev=np.asarray(inputs.tlev), tsfc=tsfc,
            sfc_lay=inputs.play.shape[1], gpt2band=kd.grid.gpt2band,
            band_lims_gpt=kd.grid.band_lims_gpt_array,
            planck_frac=np.asarray(kd.planck_frac),
            temp_ref_min=kd.temp_ref_min, totplnk_delta=kd.totplnk_delta,
            totplnk=np.asarray(kd.totplnk),
            gpoint_flavor=kd.gpoint_flavor)
        _, sources = gop.gas_optics_lw(
            inputs.play, inputs.plev, inputs.tlay, jnp.asarray(tsfc),
            inputs.gas_concs, tlev=inputs.tlev, top_at_1=True)
        np.testing.assert_allclose(sfc, np.asarray(sources.sfc_source),
                                   rtol=1e-10)
        np.testing.assert_allclose(jac, np.asarray(sources.sfc_source_jac),
                                   rtol=1e-8, atol=1e-12)
