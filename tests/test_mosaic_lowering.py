"""Cross-platform Mosaic LOWERING gate for every Pallas dispatch point.

``jax.export.export(jit(f), platforms=["tpu"])`` runs the full
jaxpr -> Mosaic MLIR lowering pipeline on ANY host, so it catches
compiles-on-hardware rejections that interpret-mode tests structurally
cannot: interpret mode executes the jaxpr directly and never invokes
Mosaic. Two real bugs of this class shipped before this gate existed —
the SW adjoint kernel's value-level ``.at[].add`` TOA seed (round 4,
fixed in 00e3e7c) and its value-level per-layer ``x[:, v, :]`` slices
inside ``fori_loop`` recurrences (round 4, found by the hardware adjoint
benchmark): both passed the f64 interpret exactness tests and crashed
only when Mosaic lowered them on the chip.

Mechanics: ``config.pretend_tpu()`` makes every dispatch site choose the
compiled (non-interpret) kernel while tracing on CPU; each test asserts
the exported module actually CONTAINS a ``tpu_custom_call`` so a silent
fallback to the XLA path cannot make the gate vacuous.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rte_rrtmgp_tpu.config import (pretend_tpu, set_fused_adjoint,
                                   set_use_pallas)
from rte_rrtmgp_tpu.drivers.allsky import make_allsky_inputs
from rte_rrtmgp_tpu.models.rrtmgp.gas_optics import GasOpticsRRTMGP
from rte_rrtmgp_tpu.ops.solver_lw import GAUSS_DS, GAUSS_WTS, lw_solver_noscat
from rte_rrtmgp_tpu.ops.solver_sw import sw_solver_2stream
from rte_rrtmgp_tpu.utils.synthetic import (synthetic_cloud_optics,
                                            synthetic_kdist)

NCOL, NLAY, NGPT = 8, 6, 16


@pytest.fixture(scope="module", autouse=True)
def _x64_off():
    """Disable x64 GLOBALLY for this module (conftest enables it for the
    f64 golden tests; Mosaic rejects 64-bit types and the production TPU
    path is f32). The global flag — NOT the jax.enable_x64(False) context
    manager — is required: under the context manager JAX stages even
    constant creation into the trace (the ambient config differs), so
    trace-time dispatch guards like ``isinstance(ds_arr, Tracer)`` see
    tracers and silently skip the adjoint-kernel branch, making the gate
    vacuous."""
    prev = jax.config.jax_enable_x64
    jax.config.update("jax_enable_x64", False)
    yield
    jax.config.update("jax_enable_x64", prev)


def _export_tpu(fn, *args):
    """Lower ``fn`` for platform tpu with compiled Pallas kernels; assert
    a kernel is actually in the module (non-vacuous)."""
    with pretend_tpu():
        set_use_pallas(True)
        try:
            exp = jax.export.export(jax.jit(fn), platforms=["tpu"])(*args)
        finally:
            set_use_pallas(None)
    assert "tpu_custom_call" in exp.mlir_module(), \
        "no Pallas kernel in the lowered module; the gate is vacuous"
    return exp


@pytest.fixture(scope="module")
def solver_inputs(_x64_off):
    rng = np.random.default_rng(0)
    f32 = jnp.float32
    return dict(
        tau=jnp.asarray(rng.uniform(0.05, 3.0, (NCOL, NLAY, NGPT)), f32),
        ssa=jnp.asarray(rng.uniform(0.2, 0.99, (NCOL, NLAY, NGPT)), f32),
        g=jnp.asarray(rng.uniform(0.0, 0.85, (NCOL, NLAY, NGPT)), f32),
        lay=jnp.asarray(rng.uniform(5.0, 20.0, (NCOL, NLAY, NGPT)), f32),
        lev=jnp.asarray(rng.uniform(5.0, 20.0, (NCOL, NLAY + 1, NGPT)), f32),
        emis=jnp.full((NCOL, NGPT), 0.95, f32),
        ssrc=jnp.asarray(rng.uniform(10.0, 30.0, (NCOL, NGPT)), f32),
        inc=jnp.zeros((NCOL, NGPT), f32),
        mu0=jnp.full((NCOL, NLAY), 0.6, f32),
        alb=jnp.full((NCOL, NGPT), 0.25, f32),
        swinc=jnp.asarray(rng.uniform(2.0, 8.0, (NCOL, NGPT)), f32),
    )


def test_lw_solver_forward_and_grad_lower(solver_inputs):
    s = solver_inputs

    def loss(tau, lay, lev, emis, ssrc):
        f = lw_solver_noscat(tau, lay, lev, emis, ssrc, s["inc"],
                             top_at_1=True, ds=(1.66,), weights=(0.5,))
        return jnp.sum(f.flux_up) + 0.5 * jnp.sum(f.flux_dn)

    args = (s["tau"], s["lay"], s["lev"], s["emis"], s["ssrc"])
    _export_tpu(loss, *args)
    _export_tpu(jax.grad(loss, argnums=tuple(range(5))), *args)


def test_lw_solver_rescaled_jacobian_lower(solver_inputs):
    s = solver_inputs

    def run(tau, ssa, g, lay, lev, emis, ssrc):
        f = lw_solver_noscat(tau, lay, lev, emis, ssrc, s["inc"],
                             top_at_1=True, ds=(1.66,), weights=(0.5,),
                             ssa=ssa, g=g, do_rescaling=True,
                             sfc_src_jac=ssrc * 0.01, do_jacobians=True)
        return jnp.sum(f.flux_up) + jnp.sum(f.flux_up_jac)

    _export_tpu(run, s["tau"], s["ssa"], s["g"], s["lay"], s["lev"],
                s["emis"], s["ssrc"])


def test_sw_solver_forward_and_grad_lower(solver_inputs):
    s = solver_inputs

    def loss(tau, ssa, g, mu0, alb):
        f = sw_solver_2stream(tau, ssa, g, mu0, alb, alb, s["swinc"],
                              top_at_1=True)
        return (jnp.sum(f.flux_up) + 0.5 * jnp.sum(f.flux_dn)
                + 0.25 * jnp.sum(f.flux_dir))

    args = (s["tau"], s["ssa"], s["g"], s["mu0"], s["alb"])
    _export_tpu(loss, *args)
    # grad takes the hand-derived adjoint kernel (solver_sw_bwd.py) —
    # the round-4 hardware crash this gate exists to prevent
    _export_tpu(jax.grad(loss, argnums=tuple(range(5))), *args)


@pytest.fixture(scope="module")
def fused_setup(_x64_off):
    kd_lw = synthetic_kdist(sw=False, ngpt=32, nbnd=4, ntemp=5, npres=10)
    kd_sw = synthetic_kdist(sw=True, ngpt=32, nbnd=4, ntemp=5, npres=10)
    gas_lw, gas_sw = GasOpticsRRTMGP(kd_lw), GasOpticsRRTMGP(kd_sw)
    cld = synthetic_cloud_optics(
        nbnd=4, band_lims_wvn=kd_lw.grid.band_lims_wvn_array)
    inp = make_allsky_inputs(NCOL, NLAY, cloud_optics=cld)
    return gas_lw, gas_sw, inp


def test_fused_lw_forward_and_fused_adjoint_lower(fused_setup):
    gas_lw, _, inp = fused_setup
    ds, wt = GAUSS_DS[0][0], GAUSS_WTS[0][0]
    emis = jnp.broadcast_to(inp.sfc_emis[:, 0][None, :],
                            (gas_lw.ngpt, NCOL))
    cld_abs = 0.05 * jnp.ones((4, NLAY, NCOL), inp.play.dtype)

    def loss(tlay, tsfc, gas_concs, cloud_tau_abs):
        up, dn = gas_lw.lw_fused_solve(
            inp.play, inp.plev, tlay, tsfc, gas_concs, sfc_emis=emis,
            tlev=inp.tlev, cloud_tau_abs=cloud_tau_abs, ds=ds, weight=wt)
        return jnp.sum(up) + 0.5 * jnp.sum(dn)

    args = (inp.tlay, inp.tsfc, inp.gas_concs, cld_abs)
    _export_tpu(loss, *args)
    set_fused_adjoint(True)    # the hand-derived fused backward kernel
    try:
        _export_tpu(jax.grad(loss, argnums=(0, 1, 3)), *args)
    finally:
        set_fused_adjoint(None)


def test_fused_sw_forward_and_fused_adjoint_lower(fused_setup):
    _, gas_sw, inp = fused_setup
    ncol = NCOL
    mu0 = jnp.full((NLAY, ncol), 0.7, inp.play.dtype)
    alb = jnp.full((gas_sw.ngpt, ncol), 0.2, inp.play.dtype)
    inc = jnp.full((gas_sw.ngpt, ncol), 3.0, inp.play.dtype)

    def loss(tlay, gas_concs, mu0):
        out = gas_sw.sw_fused_solve(
            inp.play, inp.plev, tlay, gas_concs, mu0=mu0,
            sfc_alb_dir=alb, sfc_alb_dif=alb, inc_flux=inc)
        assert out is not None, "fused SW path did not engage"
        up, dn, fdir = out[0], out[1], out[2]
        return jnp.sum(up) + 0.5 * jnp.sum(dn) + 0.25 * jnp.sum(fdir)

    args = (inp.tlay, inp.gas_concs, mu0)
    _export_tpu(loss, *args)
    set_fused_adjoint(True)
    try:
        _export_tpu(jax.grad(loss, argnums=(0, 2)), *args)
    finally:
        set_fused_adjoint(None)
