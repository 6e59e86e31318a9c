"""Autodiff through the production (fused Pallas) path.

The fused kernels are opaque to JAX AD; gas_optics._with_xla_grad gives
them a custom VJP whose backward differentiates the mathematically
equivalent XLA formulation. These tests check, on the CPU interpret-mode
fused path (the same code the TPU runs):

  * jax.grad of broadband fluxes w.r.t. tlay / tsfc / gas amounts /
    cloud fields WORKS with use_pallas=True (previously: opaque);
  * it matches the XLA-path gradient (they must agree because the VJP is
    literally the XLA path's);
  * the LW surface-temperature gradient matches the reference-style
    analytic Jacobian carried through the solver (reference
    mo_rte_solver_kernels.F90:731-742), which uses a 1 K finite
    difference of the Planck function (loose tolerance).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rte_rrtmgp_tpu.config import set_use_pallas
from rte_rrtmgp_tpu.drivers.allsky import make_allsky_inputs
from rte_rrtmgp_tpu.models.rrtmgp.gas_optics import GasOpticsRRTMGP
from rte_rrtmgp_tpu.ops.solver_lw import GAUSS_DS, GAUSS_WTS
from rte_rrtmgp_tpu.utils.synthetic import (synthetic_cloud_optics,
                                            synthetic_kdist)

NCOL, NLAY = 8, 8


@pytest.fixture(scope="module")
def setup():
    kd_lw = synthetic_kdist(sw=False, ngpt=32, nbnd=4, ntemp=5, npres=10)
    kd_sw = synthetic_kdist(sw=True, ngpt=32, nbnd=4, ntemp=5, npres=10)
    gas_lw, gas_sw = GasOpticsRRTMGP(kd_lw), GasOpticsRRTMGP(kd_sw)
    cld = synthetic_cloud_optics(
        nbnd=4, band_lims_wvn=kd_lw.grid.band_lims_wvn_array)
    inp = make_allsky_inputs(NCOL, NLAY, cloud_optics=cld)
    return gas_lw, gas_sw, inp


def _lw_loss(gas_lw, inp, use_fused):
    ds, wt = GAUSS_DS[0][0], GAUSS_WTS[0][0]
    emis = jnp.broadcast_to(inp.sfc_emis[:, 0][None, :],
                            (gas_lw.ngpt, NCOL))

    def loss(tlay, tsfc, gas_concs, cloud_tau_abs):
        if use_fused:
            set_use_pallas(True)
            try:
                up, dn = gas_lw.lw_fused_solve(
                    inp.play, inp.plev, tlay, tsfc, gas_concs,
                    sfc_emis=emis, tlev=inp.tlev,
                    cloud_tau_abs=cloud_tau_abs, ds=ds, weight=wt)
            finally:
                set_use_pallas(None)
        else:
            set_use_pallas(False)
            try:
                up, dn = gas_lw._lw_fused_xla_ref(
                    inp.play, inp.plev, tlay, tsfc, gas_concs, emis,
                    jnp.zeros((gas_lw.ngpt, NCOL), inp.play.dtype),
                    inp.tlev, None, cloud_tau_abs, ds=ds, weight=wt,
                    byband=False)
            finally:
                set_use_pallas(None)
        # weighted broadband functional touching both fluxes at all levels
        w_lev = jnp.linspace(0.5, 1.5, NLAY + 1)[:, None]
        return jnp.sum(w_lev * up) + 0.5 * jnp.sum(w_lev * dn)

    return loss


def test_lw_fused_grad_matches_xla(setup):
    from rte_rrtmgp_tpu.config import set_fused_adjoint

    gas_lw, _, inp = setup
    cld_abs = 0.05 * jnp.ones((4, NLAY, NCOL), inp.play.dtype)
    args = (inp.tlay, inp.tsfc, inp.gas_concs, cld_abs)

    # pin the XLA-VJP bridge (the fused-adjoint KERNEL is validated
    # separately below): with the bridge, fused and XLA grads are
    # bitwise the same backward computation
    set_fused_adjoint(False)
    try:
        g_fused = jax.grad(_lw_loss(gas_lw, inp, True),
                           argnums=(0, 1, 2, 3))(*args)
    finally:
        set_fused_adjoint(None)
    g_xla = jax.grad(_lw_loss(gas_lw, inp, False), argnums=(0, 1, 2, 3))(*args)

    leaves_f = jax.tree_util.tree_leaves(g_fused)
    leaves_x = jax.tree_util.tree_leaves(g_xla)
    assert len(leaves_f) == len(leaves_x)
    some_nonzero = False
    for a, b in zip(leaves_f, leaves_x):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-8)
        some_nonzero |= bool(np.any(np.asarray(b) != 0.0))
    assert some_nonzero
    # gas-amount gradients flow: h2o is a key species of the synthetic kdist
    g_gas = g_fused[2]
    h2o = g_gas.values[g_gas.names.index("h2o")]
    assert np.any(np.asarray(h2o) != 0.0)
    # cloud gradient flows
    assert np.any(np.asarray(g_fused[3]) != 0.0)


def test_lw_fused_tsfc_grad_matches_analytic_jacobian(setup):
    """d(flux_up)/d(tsfc) via jax.grad of the FUSED path vs the solver's
    analytically-transported Jacobian (which uses the reference's 1 K
    finite difference of the Planck function -> loose tolerance)."""
    from rte_rrtmgp_tpu.ops.solver_lw import lw_solver_noscat

    gas_lw, _, inp = setup
    ds, wt = GAUSS_DS[0][0], GAUSS_WTS[0][0]
    emis = jnp.broadcast_to(inp.sfc_emis[:, 0][None, :],
                            (gas_lw.ngpt, NCOL))

    lev = 0   # TOA upwelling

    def up_toa_sum(tsfc):
        set_use_pallas(True)
        try:
            up, _ = gas_lw.lw_fused_solve(
                inp.play, inp.plev, inp.tlay, tsfc, inp.gas_concs,
                sfc_emis=emis, tlev=inp.tlev, ds=ds, weight=wt)
        finally:
            set_use_pallas(None)
        return jnp.sum(up[lev, :])

    grad = np.asarray(jax.grad(up_toa_sum)(inp.tsfc))

    set_use_pallas(False)
    try:
        props, src = gas_lw.gas_optics_lw(
            inp.play, inp.plev, inp.tlay, inp.tsfc, inp.gas_concs,
            tlev=inp.tlev, top_at_1=True)
        f = lw_solver_noscat(
            props.tau, src.lay_source, src.lev_source, emis.T,
            src.sfc_source, jnp.zeros((NCOL, gas_lw.ngpt), props.tau.dtype),
            top_at_1=True, ds=(ds,), weights=(wt,),
            sfc_src_jac=src.sfc_source_jac, do_jacobians=True)
    finally:
        set_use_pallas(None)
    jac = np.asarray(f.flux_up_jac[:, lev])
    np.testing.assert_allclose(grad, jac, rtol=2e-2)
    assert np.all(jac > 0)


def test_sw_fused_grad_matches_xla(setup):
    _, gas_sw, inp = setup
    dtype = inp.play.dtype
    mu0 = jnp.broadcast_to(jnp.asarray(inp.mu0, dtype)[None, :],
                           (NLAY, NCOL))
    alb = jnp.broadcast_to(inp.sfc_alb[:, 0][None, :], (gas_sw.ngpt, NCOL))
    cld = tuple(v * jnp.ones((4, NLAY, NCOL), dtype)
                for v in (0.1, 0.6, 0.5))

    def loss(tlay, gas_concs, cloud, use_fused):
        if use_fused:
            set_use_pallas(True)
            try:
                up, dn, fdir = gas_sw.sw_fused_solve(
                    inp.play, inp.plev, tlay, gas_concs, mu0=mu0,
                    sfc_alb_dir=alb, sfc_alb_dif=alb, cloud=cloud)
            finally:
                set_use_pallas(None)
        else:
            inc = jnp.broadcast_to(
                gas_sw.kdist.solar_source[:, None],
                (gas_sw.ngpt, NCOL)).astype(dtype)
            set_use_pallas(False)
            try:
                up, dn, fdir = gas_sw._sw_fused_xla_ref(
                    inp.play, inp.plev, tlay, gas_concs, mu0, alb, alb,
                    inc, None, None, cloud, byband=False)
            finally:
                set_use_pallas(None)
        w_lev = jnp.linspace(0.5, 1.5, NLAY + 1)[:, None]
        return (jnp.sum(w_lev * up) + 0.5 * jnp.sum(w_lev * dn)
                + 0.25 * jnp.sum(fdir))

    from rte_rrtmgp_tpu.config import set_fused_adjoint

    args = (inp.tlay, inp.gas_concs, cld)
    # pin the XLA-VJP bridge (the SW fused-adjoint KERNEL is validated
    # separately below at f64/f32 tolerances)
    set_fused_adjoint(False)
    try:
        g_fused = jax.grad(lambda *a: loss(*a, True),
                           argnums=(0, 1, 2))(*args)
    finally:
        set_fused_adjoint(None)
    g_xla = jax.grad(lambda *a: loss(*a, False), argnums=(0, 1, 2))(*args)
    for a, b in zip(jax.tree_util.tree_leaves(g_fused),
                    jax.tree_util.tree_leaves(g_xla)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-8)
    assert np.any(np.asarray(g_fused[0]) != 0.0)       # tlay
    o3 = g_fused[1].values[g_fused[1].names.index("o3")]
    assert np.any(np.asarray(o3) != 0.0)               # gas amounts
    assert any(np.any(np.asarray(c) != 0.0) for c in g_fused[2])  # cloud


def test_grad_through_allsky_driver_fused(setup):
    """jax.grad composes through the full all-sky driver with the fused
    path forced on, under jit."""
    from rte_rrtmgp_tpu.drivers.allsky import allsky_step_lw

    gas_lw, _, inp = setup
    cld = synthetic_cloud_optics(
        nbnd=4, band_lims_wvn=gas_lw.kdist.grid.band_lims_wvn_array)

    @jax.jit
    def loss(tlay, lwp, rel):
        set_use_pallas(True)
        try:
            f = allsky_step_lw(inp._replace(tlay=tlay, lwp=lwp, rel=rel),
                               gas_lw, cloud_optics=cld)
        finally:
            set_use_pallas(None)
        return jnp.sum(f.flux_net)

    # gradients flow through the fused gas-optics+solve AND the cloud
    # LUT lane kernel (w.r.t. water path and droplet size)
    g, g_lwp, g_rel = jax.grad(loss, argnums=(0, 1, 2))(
        inp.tlay, inp.lwp, inp.rel)
    for arr in (g, g_lwp, g_rel):
        arr = np.asarray(arr)
        assert arr.shape == (NCOL, NLAY) and np.all(np.isfinite(arr))
    assert np.any(np.asarray(g) != 0.0)
    assert np.any(np.asarray(g_lwp) != 0.0)
    assert np.any(np.asarray(g_rel) != 0.0)


def test_solver_level_grads_lw():
    """jax.grad through ops.solver_lw.lw_solver_noscat with the Pallas
    kernel selected (the staged-path dispatch point) matches the XLA
    path, including the rescaled (Tang 2018) variant."""
    from rte_rrtmgp_tpu.ops.solver_lw import lw_solver_noscat

    rng = np.random.default_rng(3)
    ncol, nlay, ngpt = 4, 6, 16
    tau = jnp.asarray(rng.uniform(0.05, 2.0, (ncol, nlay, ngpt)), jnp.float32)
    lay = jnp.asarray(rng.uniform(5.0, 20.0, (ncol, nlay, ngpt)), jnp.float32)
    lev = jnp.asarray(rng.uniform(5.0, 20.0, (ncol, nlay + 1, ngpt)),
                      jnp.float32)
    emis = jnp.full((ncol, ngpt), 0.95, jnp.float32)
    ssrc = jnp.asarray(rng.uniform(10.0, 30.0, (ncol, ngpt)), jnp.float32)
    inc = jnp.zeros((ncol, ngpt), jnp.float32)
    ssa = jnp.asarray(rng.uniform(0.05, 0.6, (ncol, nlay, ngpt)), jnp.float32)
    gg = jnp.asarray(rng.uniform(0.0, 0.7, (ncol, nlay, ngpt)), jnp.float32)

    for rescale in (False, True):
        def loss(tau, lay, ssrc, use_pallas):
            set_use_pallas(use_pallas)
            try:
                f = lw_solver_noscat(
                    tau, lay, lev, emis, ssrc, inc, top_at_1=True,
                    ds=(1.66,), weights=(0.5,),
                    ssa=ssa if rescale else None, g=gg if rescale else None,
                    do_rescaling=rescale)
            finally:
                set_use_pallas(None)
            return jnp.sum(f.flux_up) + 0.5 * jnp.sum(f.flux_dn)

        gp = jax.grad(lambda *a: loss(*a, True), argnums=(0, 1, 2))(
            tau, lay, ssrc)
        gx = jax.grad(lambda *a: loss(*a, False), argnums=(0, 1, 2))(
            tau, lay, ssrc)
        # rescale=False exercises the hand-derived adjoint KERNEL
        # (solver_lw_bwd.py): an independent implementation, so f32
        # op-reordering differences up to ~1e-4 rel are expected (its
        # exactness is pinned at f64 below). rescale=True takes the
        # XLA-retrace backward, which matches tightly.
        rtol = 5e-4 if not rescale else 1e-6
        for a, b in zip(gp, gx):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=rtol, atol=1e-8)
        assert all(np.any(np.asarray(b) != 0.0) for b in gx)


def test_adjoint_kernel_exact_f64():
    """The hand-derived adjoint LW kernel (ops/pallas/solver_lw_bwd.py)
    in float64 interpret mode matches the XLA-autodiff gradient to
    ~1e-12: the adjoint DERIVATION is exact, not approximately right
    (the f32 tier differs only by rounding)."""
    from rte_rrtmgp_tpu.ops.pallas.solver_lw_bwd import (
        lw_noscat_broadband_lane_vjp)
    from rte_rrtmgp_tpu.ops.solver_lw import lw_solver_noscat

    rng = np.random.default_rng(7)
    ncol, nlay, ngpt = 3, 9, 16
    f64 = jnp.float64
    tau = jnp.asarray(rng.uniform(0.01, 3.0, (ncol, nlay, ngpt)), f64)
    lay = jnp.asarray(rng.uniform(5.0, 20.0, (ncol, nlay, ngpt)), f64)
    lev = jnp.asarray(rng.uniform(5.0, 20.0, (ncol, nlay + 1, ngpt)), f64)
    emis = jnp.asarray(rng.uniform(0.8, 1.0, (ncol, ngpt)), f64)
    ssrc = jnp.asarray(rng.uniform(10.0, 30.0, (ncol, ngpt)), f64)
    inc = jnp.asarray(rng.uniform(0.0, 5.0, (ncol, ngpt)), f64)
    w_lev = jnp.asarray(rng.uniform(0.5, 1.5, (1, nlay + 1)), f64)

    def loss_kernel(tau, lay, lev, emis, ssrc, inc):
        up, dn = lw_noscat_broadband_lane_vjp(
            tau, lay, lev, emis, ssrc, inc, 1.66, 0.5, True)
        return jnp.sum(w_lev * up) + 0.5 * jnp.sum(w_lev * dn)

    def loss_xla(tau, lay, lev, emis, ssrc, inc):
        set_use_pallas(False)
        try:
            f = lw_solver_noscat(tau, lay, lev, emis, ssrc, inc,
                                 top_at_1=True, ds=(1.66,), weights=(0.5,))
        finally:
            set_use_pallas(None)
        return jnp.sum(w_lev * f.flux_up) + 0.5 * jnp.sum(w_lev * f.flux_dn)

    # forward values agree (kernel runs in interpret mode at f64)
    np.testing.assert_allclose(float(loss_kernel(tau, lay, lev, emis,
                                                 ssrc, inc)),
                               float(loss_xla(tau, lay, lev, emis, ssrc,
                                              inc)), rtol=1e-12)
    gk = jax.grad(loss_kernel, argnums=tuple(range(6)))(
        tau, lay, lev, emis, ssrc, inc)
    gx = jax.grad(loss_xla, argnums=tuple(range(6)))(
        tau, lay, lev, emis, ssrc, inc)
    for a, b in zip(gk, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-11, atol=1e-13)
        assert np.any(np.asarray(b) != 0.0)


def test_solver_level_grads_sw():
    """jax.grad through ops.solver_sw.sw_solver_2stream with the Pallas
    kernel selected matches the XLA path (incl. w.r.t. mu0 and albedo)."""
    from rte_rrtmgp_tpu.ops.solver_sw import sw_solver_2stream

    rng = np.random.default_rng(4)
    ncol, nlay, ngpt = 4, 6, 16
    tau = jnp.asarray(rng.uniform(0.05, 1.5, (ncol, nlay, ngpt)), jnp.float32)
    ssa = jnp.asarray(rng.uniform(0.2, 0.95, (ncol, nlay, ngpt)), jnp.float32)
    gg = jnp.asarray(rng.uniform(0.0, 0.8, (ncol, nlay, ngpt)), jnp.float32)
    mu0 = jnp.full((ncol, nlay), 0.6, jnp.float32)
    alb = jnp.full((ncol, ngpt), 0.25, jnp.float32)
    inc = jnp.asarray(rng.uniform(2.0, 8.0, (ncol, ngpt)), jnp.float32)

    def loss(tau, ssa, mu0, alb, use_pallas):
        set_use_pallas(use_pallas)
        try:
            f = sw_solver_2stream(tau, ssa, gg, mu0, alb, alb, inc,
                                  top_at_1=True)
        finally:
            set_use_pallas(None)
        return (jnp.sum(f.flux_up) + 0.5 * jnp.sum(f.flux_dn)
                + 0.25 * jnp.sum(f.flux_dir))

    gp = jax.grad(lambda *a: loss(*a, True), argnums=(0, 1, 2, 3))(
        tau, ssa, mu0, alb)
    gx = jax.grad(lambda *a: loss(*a, False), argnums=(0, 1, 2, 3))(
        tau, ssa, mu0, alb)
    # the broadband path exercises the hand-derived adjoint KERNEL
    # (solver_sw_bwd.py): an independent implementation, so f32 rounding
    # differences up to ~1e-4 rel are expected; exactness is pinned at
    # f64 by test_sw_adjoint_kernel_exact_f64
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=1e-7)
    assert all(np.any(np.asarray(b) != 0.0) for b in gx)


def test_gas_optics_level_grads(setup):
    """jax.grad through the PUBLIC gas-optics API (gas_optics_lw ->
    lw_solver_noscat; gas_optics_sw -> sw_solver_2stream) with the Pallas
    lane-gather kernels selected — the staged (non-grand-fused) tier —
    matches the XLA path."""
    from rte_rrtmgp_tpu.ops.solver_lw import lw_solver_noscat
    from rte_rrtmgp_tpu.ops.solver_sw import sw_solver_2stream

    gas_lw, gas_sw, inp = setup
    dtype = inp.play.dtype
    emis = jnp.broadcast_to(inp.sfc_emis[:, 0][:, None],
                            (NCOL, gas_lw.ngpt))
    mu0 = jnp.broadcast_to(jnp.asarray(inp.mu0, dtype)[:, None],
                           (NCOL, NLAY))
    alb = jnp.broadcast_to(inp.sfc_alb[:, 0][:, None], (NCOL, gas_sw.ngpt))

    def loss_lw(tlay, gas_concs, use_pallas):
        set_use_pallas(use_pallas)
        try:
            props, src = gas_lw.gas_optics_lw(
                inp.play, inp.plev, tlay, inp.tsfc, gas_concs,
                tlev=inp.tlev, top_at_1=True)
            f = lw_solver_noscat(
                props.tau, src.lay_source, src.lev_source, emis,
                src.sfc_source, jnp.zeros((NCOL, gas_lw.ngpt), dtype),
                top_at_1=True, ds=(GAUSS_DS[0][0],),
                weights=(GAUSS_WTS[0][0],))
        finally:
            set_use_pallas(None)
        return jnp.sum(f.flux_up) + 0.5 * jnp.sum(f.flux_dn)

    def loss_sw(tlay, gas_concs, use_pallas):
        set_use_pallas(use_pallas)
        try:
            props, toa = gas_sw.gas_optics_sw(
                inp.play, inp.plev, tlay, gas_concs, top_at_1=True)
            f = sw_solver_2stream(props.tau, props.ssa, props.g, mu0,
                                  alb, alb, toa.astype(dtype),
                                  top_at_1=True)
        finally:
            set_use_pallas(None)
        return jnp.sum(f.flux_up) + 0.5 * jnp.sum(f.flux_dn)

    # Two stacked custom-VJP boundaries (gas optics -> solver): the inner
    # backward is linearized at the Pallas forward's primal values, which
    # differ from the XLA forward's by f32 rounding (~1e-7 rel), amplified
    # through the nonlinear solve — hence a looser gate than the
    # single-boundary tests above.
    for loss in (loss_lw, loss_sw):
        gp = jax.grad(lambda *a: loss(*a, True), argnums=(0, 1))(
            inp.tlay, inp.gas_concs)
        gx = jax.grad(lambda *a: loss(*a, False), argnums=(0, 1))(
            inp.tlay, inp.gas_concs)
        for a, b in zip(jax.tree_util.tree_leaves(gp),
                        jax.tree_util.tree_leaves(gx)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-8)
        assert np.any(np.asarray(gx[0]) != 0.0)


def test_grads_with_minor_lanes_but_no_major_lane(setup):
    """Regression: when kmajor_lane is absent (e.g. ragged band widths)
    but the minor/Rayleigh lane tables exist, the impl still dispatches
    Pallas minor kernels — the AD bridge must engage on ANY lane table,
    or jax.grad dies on an opaque pallas_call."""
    import dataclasses

    gas_lw, _, inp = setup
    kd = dataclasses.replace(gas_lw.kdist, kmajor_lane=None)
    gas = GasOpticsRRTMGP(kd)
    assert kd.kminor_lower_lane is not None

    def loss(tlay):
        set_use_pallas(True)
        try:
            props, src = gas.gas_optics_lw(
                inp.play, inp.plev, tlay, inp.tsfc, inp.gas_concs,
                tlev=inp.tlev, top_at_1=True)
        finally:
            set_use_pallas(None)
        return jnp.sum(props.tau) + jnp.sum(src.lay_source)

    g = np.asarray(jax.grad(loss)(inp.tlay))
    assert g.shape == inp.tlay.shape and np.all(np.isfinite(g))
    assert np.any(g != 0.0)


def test_sw_adjoint_kernel_exact_f64():
    """The hand-derived SW adjoint kernel (ops/pallas/solver_sw_bwd.py)
    in float64 interpret mode matches XLA autodiff to ~1e-11 across ALL
    inputs (tau, ssa, g, mu0, albedos, inc, incdif) — including active
    Rdir/Tdir energy clamps and nighttime columns."""
    from rte_rrtmgp_tpu.ops.pallas.solver_sw_bwd import (
        sw_two_stream_broadband_lane_vjp)
    from rte_rrtmgp_tpu.ops.solver_sw import sw_solver_2stream

    rng = np.random.default_rng(11)
    ncol, nlay, ngpt = 4, 9, 16
    f64 = jnp.float64
    # include thick layers (clamps active) and a nighttime column
    tau = jnp.asarray(rng.uniform(0.01, 8.0, (ncol, nlay, ngpt)), f64)
    ssa = jnp.asarray(rng.uniform(0.1, 0.999, (ncol, nlay, ngpt)), f64)
    gg = jnp.asarray(rng.uniform(0.0, 0.85, (ncol, nlay, ngpt)), f64)
    mu0 = jnp.asarray(np.concatenate(
        [rng.uniform(0.2, 1.0, (ncol - 1, nlay)),
         np.full((1, nlay), -0.5)]), f64)       # last column: night
    adir = jnp.asarray(rng.uniform(0.05, 0.5, (ncol, ngpt)), f64)
    adif = jnp.asarray(rng.uniform(0.05, 0.5, (ncol, ngpt)), f64)
    inc = jnp.asarray(rng.uniform(1.0, 10.0, (ncol, ngpt)), f64)
    incdif = jnp.asarray(rng.uniform(0.0, 2.0, (ncol, ngpt)), f64)
    w_lev = jnp.asarray(rng.uniform(0.5, 1.5, (1, nlay + 1)), f64)

    def reduce(up, dn, fdir):
        return (jnp.sum(w_lev * up) + 0.5 * jnp.sum(w_lev * dn)
                + 0.25 * jnp.sum(w_lev * fdir))

    def loss_kernel(*a):
        return reduce(*sw_two_stream_broadband_lane_vjp(*a, True))

    def loss_xla(tau, ssa, gg, mu0, adir, adif, inc, incdif):
        set_use_pallas(False)
        try:
            f = sw_solver_2stream(tau, ssa, gg, mu0, adir, adif, inc,
                                  top_at_1=True, inc_flux_dif=incdif)
        finally:
            set_use_pallas(None)
        return reduce(f.flux_up, f.flux_dn, f.flux_dir)

    args = (tau, ssa, gg, mu0, adir, adif, inc, incdif)
    np.testing.assert_allclose(float(loss_kernel(*args)),
                               float(loss_xla(*args)), rtol=1e-12)
    gk = jax.grad(loss_kernel, argnums=tuple(range(8)))(*args)
    gx = jax.grad(loss_xla, argnums=tuple(range(8)))(*args)
    names = ("tau", "ssa", "g", "mu0", "adir", "adif", "inc", "incdif")
    for nm, a, b in zip(names, gk, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-10, atol=1e-12, err_msg=nm)
    assert any(np.any(np.asarray(b) != 0.0) for b in gx)


def test_byband_fused_grad_matches_xla(setup):
    """Per-band fluxes (byband=True) through the grand-fused path are
    differentiable and match the XLA-path gradient."""
    gas_lw, _, inp = setup
    ds, wt = GAUSS_DS[0][0], GAUSS_WTS[0][0]
    emis = jnp.broadcast_to(inp.sfc_emis[:, 0][None, :],
                            (gas_lw.ngpt, NCOL))
    w_bnd = jnp.linspace(0.5, 2.0, 4)[:, None, None]

    def loss(tlay, use_fused):
        if use_fused:
            set_use_pallas(True)
            try:
                up, dn = gas_lw.lw_fused_solve(
                    inp.play, inp.plev, tlay, inp.tsfc, inp.gas_concs,
                    sfc_emis=emis, tlev=inp.tlev, ds=ds, weight=wt,
                    byband=True)
            finally:
                set_use_pallas(None)
        else:
            set_use_pallas(False)
            try:
                up, dn = gas_lw._lw_fused_xla_ref(
                    inp.play, inp.plev, tlay, inp.tsfc, inp.gas_concs,
                    emis, jnp.zeros((gas_lw.ngpt, NCOL), inp.play.dtype),
                    inp.tlev, None, None, ds=ds, weight=wt, byband=True)
            finally:
                set_use_pallas(None)
        assert up.shape == (4, NLAY + 1, NCOL)
        return jnp.sum(w_bnd * up) + 0.5 * jnp.sum(w_bnd * dn)

    gp = jax.grad(lambda t: loss(t, True))(inp.tlay)
    gx = jax.grad(lambda t: loss(t, False))(inp.tlay)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gx),
                               rtol=1e-6, atol=1e-8)
    assert np.any(np.asarray(gx) != 0.0)


def _fused_lw_loss_fns(gas, inp, ngpt, ncol):
    """Paired (kernel-vjp loss, XLA loss) closures differentiating wrt
    (play, plev, tlay, tsfc, gas_concs, cloud_tau_abs)."""
    from rte_rrtmgp_tpu.config import set_fused_adjoint

    ds, wt = GAUSS_DS[0][0], GAUSS_WTS[0][0]
    dtype = inp.play.dtype
    emis = jnp.broadcast_to(inp.sfc_emis[:, 0][None, :], (ngpt, ncol)
                            ).astype(dtype)
    nlev = inp.plev.shape[1]
    w_lev = jnp.linspace(0.5, 1.5, nlev, dtype=dtype)[:, None]

    def functional(up, dn):
        return jnp.sum(w_lev.T * up.T) + 0.5 * jnp.sum(w_lev.T * dn.T)

    def loss_kernel(play, plev, tlay, tsfc, gas_concs, cld):
        set_use_pallas(True)
        set_fused_adjoint(True)
        try:
            up, dn = gas.lw_fused_solve(
                play, plev, tlay, tsfc, gas_concs, sfc_emis=emis,
                tlev=inp.tlev, cloud_tau_abs=cld, ds=ds, weight=wt)
        finally:
            set_use_pallas(None)
            set_fused_adjoint(None)
        return functional(up, dn)

    def loss_xla(play, plev, tlay, tsfc, gas_concs, cld):
        set_use_pallas(False)
        try:
            up, dn = gas._lw_fused_xla_ref(
                play, plev, tlay, tsfc, gas_concs, emis,
                jnp.zeros((ngpt, ncol), dtype), inp.tlev, None, cld,
                ds=ds, weight=wt, byband=False)
        finally:
            set_use_pallas(None)
        return functional(up, dn)

    return loss_kernel, loss_xla


def test_lw_fused_kernel_vjp_exact_f64():
    """The hand-derived FUSED-path adjoint kernel (gas optics + solve
    backward in one Pallas kernel, ops/pallas/fused_lw_bwd.py) in
    float64 interpret mode matches XLA autodiff of the reference
    formulation to ~1e-9 — including the pressure (fp), eta, col_mix,
    minor-scaling, Planck-temperature, cloud, emissivity and incident
    cotangents. The derivation is exact; the f32 tier differs only by
    independent-implementation rounding."""
    f64 = jnp.float64
    kd = synthetic_kdist(sw=False, ngpt=32, nbnd=4, ntemp=5, npres=10,
                         dtype=f64)
    gas = GasOpticsRRTMGP(kd)
    cld_opt = synthetic_cloud_optics(
        nbnd=4, band_lims_wvn=kd.grid.band_lims_wvn_array, dtype=f64)
    inp = make_allsky_inputs(NCOL, NLAY, cloud_optics=cld_opt, dtype=f64)
    cld = 0.05 * jnp.ones((4, NLAY, NCOL), f64)
    loss_k, loss_x = _fused_lw_loss_fns(gas, inp, 32, NCOL)
    args = (inp.play, inp.plev, inp.tlay, inp.tsfc, inp.gas_concs, cld)

    np.testing.assert_allclose(float(loss_k(*args)), float(loss_x(*args)),
                               rtol=1e-11)
    gk = jax.grad(loss_k, argnums=tuple(range(6)))(*args)
    gx = jax.grad(loss_x, argnums=tuple(range(6)))(*args)
    lk = jax.tree_util.tree_leaves(gk)
    lx = jax.tree_util.tree_leaves(gx)
    assert len(lk) == len(lx)
    nonzero = 0
    for a, b in zip(lk, lx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-8, atol=1e-12)
        nonzero += int(np.any(np.asarray(b) != 0.0))
    assert nonzero >= 5      # play, tlay, tsfc, gases, cloud all flow


def test_lw_fused_kernel_vjp_auto_f32(setup):
    """Auto dispatch: with shared pressure grids and concrete pressures
    the fused LW path takes the adjoint KERNEL backward by default
    (config fused_adjoint=None), agreeing with the XLA backward to f32
    independent-rounding tolerance."""
    gas_lw, _, inp = setup
    cld = 0.05 * jnp.ones((4, NLAY, NCOL), inp.play.dtype)
    loss_k, loss_x = _fused_lw_loss_fns(gas_lw, inp, 32, NCOL)
    # shared profile across columns => auto eligibility holds
    assert bool(np.all(np.asarray(inp.play) == np.asarray(inp.play[:1])))
    args = (inp.play, inp.plev, inp.tlay, inp.tsfc, inp.gas_concs, cld)
    gk = jax.grad(loss_k, argnums=(2, 3, 5))(*args)
    gx = jax.grad(loss_x, argnums=(2, 3, 5))(*args)
    for a, b in zip(jax.tree_util.tree_leaves(gk),
                    jax.tree_util.tree_leaves(gx)):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(1e-30, float(np.abs(b).max()))
        assert float(np.abs(a - b).max()) / scale < 5e-4


def _fused_sw_loss_fns(gas, inp, ngpt, ncol, nlay):
    """Paired (kernel-vjp loss, XLA loss) closures differentiating wrt
    (play, plev, tlay, gas_concs, cloud, mu0, alb)."""
    from rte_rrtmgp_tpu.config import set_fused_adjoint

    dtype = inp.play.dtype
    w_lev = jnp.linspace(0.5, 1.5, nlay + 1, dtype=dtype)[:, None]

    def functional(up, dn, fdir):
        return (jnp.sum(w_lev.T * up.T) + 0.5 * jnp.sum(w_lev.T * dn.T)
                + 0.25 * jnp.sum(fdir))

    def loss_kernel(play, plev, tlay, gas_concs, cloud, mu0, alb):
        set_use_pallas(True)
        set_fused_adjoint(True)
        try:
            up, dn, fdir = gas.sw_fused_solve(
                play, plev, tlay, gas_concs, mu0=mu0, sfc_alb_dir=alb,
                sfc_alb_dif=alb, cloud=cloud)
        finally:
            set_use_pallas(None)
            set_fused_adjoint(None)
        return functional(up, dn, fdir)

    def loss_xla(play, plev, tlay, gas_concs, cloud, mu0, alb):
        inc = jnp.broadcast_to(gas.kdist.solar_source[:, None],
                               (ngpt, ncol)).astype(dtype)
        set_use_pallas(False)
        try:
            up, dn, fdir = gas._sw_fused_xla_ref(
                play, plev, tlay, gas_concs, mu0, alb, alb, inc, None,
                None, cloud, byband=False)
        finally:
            set_use_pallas(None)
        return functional(up, dn, fdir)

    return loss_kernel, loss_xla


def test_sw_fused_kernel_vjp_exact_f64():
    """The hand-derived FUSED-path SW adjoint kernel (gas optics +
    Rayleigh + cloud combine + Meador-Weaver two-stream + adding,
    backward, in one Pallas kernel — ops/pallas/fused_sw_bwd.py) in
    float64 interpret mode matches XLA autodiff of the reference
    formulation to ~1e-8 across play/plev/tlay/gas/cloud/mu0/albedo
    cotangents."""
    f64 = jnp.float64
    kd = synthetic_kdist(sw=True, ngpt=32, nbnd=4, ntemp=5, npres=10,
                         dtype=f64)
    gas = GasOpticsRRTMGP(kd)
    cld_opt = synthetic_cloud_optics(
        nbnd=4, band_lims_wvn=kd.grid.band_lims_wvn_array, dtype=f64)
    inp = make_allsky_inputs(NCOL, NLAY, cloud_optics=cld_opt, dtype=f64)
    cloud = tuple(v * jnp.ones((4, NLAY, NCOL), f64)
                  for v in (0.1, 0.6, 0.5))
    mu0 = jnp.broadcast_to(jnp.asarray(inp.mu0, f64)[None, :],
                           (NLAY, NCOL))
    alb = jnp.broadcast_to(inp.sfc_alb[:, 0][None, :], (32, NCOL)
                           ).astype(f64)
    loss_k, loss_x = _fused_sw_loss_fns(gas, inp, 32, NCOL, NLAY)
    args = (inp.play, inp.plev, inp.tlay, inp.gas_concs, cloud, mu0, alb)

    np.testing.assert_allclose(float(loss_k(*args)), float(loss_x(*args)),
                               rtol=1e-11)
    gk = jax.grad(loss_k, argnums=tuple(range(7)))(*args)
    gx = jax.grad(loss_x, argnums=tuple(range(7)))(*args)
    lk = jax.tree_util.tree_leaves(gk)
    lx = jax.tree_util.tree_leaves(gx)
    assert len(lk) == len(lx)
    nonzero = 0
    for a, b in zip(lk, lx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-7, atol=1e-11)
        nonzero += int(np.any(np.asarray(b) != 0.0))
    assert nonzero >= 7   # play, tlay, gases, 3x cloud, mu0, alb flow


def test_sw_fused_kernel_vjp_auto_f32(setup):
    """Auto dispatch for the SW fused adjoint kernel: shared pressure
    grids + concrete pressures route the backward through the Pallas
    adjoint by default, agreeing with the XLA backward to f32
    independent-rounding tolerance."""
    _, gas_sw, inp = setup
    dtype = inp.play.dtype
    cloud = tuple(v * jnp.ones((4, NLAY, NCOL), dtype)
                  for v in (0.1, 0.6, 0.5))
    mu0 = jnp.broadcast_to(jnp.asarray(inp.mu0, dtype)[None, :],
                           (NLAY, NCOL))
    alb = jnp.broadcast_to(inp.sfc_alb[:, 0][None, :], (32, NCOL))
    loss_k, loss_x = _fused_sw_loss_fns(gas_sw, inp, 32, NCOL, NLAY)
    args = (inp.play, inp.plev, inp.tlay, inp.gas_concs, cloud, mu0, alb)
    gk = jax.grad(loss_k, argnums=(2, 3, 4, 5))(*args)
    gx = jax.grad(loss_x, argnums=(2, 3, 4, 5))(*args)
    for a, b in zip(jax.tree_util.tree_leaves(gk),
                    jax.tree_util.tree_leaves(gx)):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(1e-30, float(np.abs(b).max()))
        assert float(np.abs(a - b).max()) / scale < 5e-4
