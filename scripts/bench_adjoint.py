"""Time the hand-derived adjoint solver kernels vs the XLA-retrace
backward at production shape (4096 cols x 72 lay x 256/224 gpt).

Prints JSON lines: forward time, adjoint-kernel backward time, and the
XLA-retrace backward time for both LW and SW solver dispatches.
Run under scripts/tpu_run.py.
"""
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from timing import timeit  # noqa: E402

np.asarray(jax.numpy.zeros(8) + 1.0)
print("# device ok", file=sys.stderr, flush=True)

from rte_rrtmgp_tpu.config import set_use_pallas  # noqa: E402
from rte_rrtmgp_tpu.ops.solver_lw import lw_solver_noscat  # noqa: E402
from rte_rrtmgp_tpu.ops.solver_sw import sw_solver_2stream  # noqa: E402

NCOL = int(os.environ.get("ADJ_NCOL", "4096"))
NLAY = int(os.environ.get("ADJ_NLAY", "72"))
REPS = int(os.environ.get("ADJ_REPS", "3"))
INNER = int(os.environ.get("ADJ_INNER", "5"))


def emit(**kw):
    print(json.dumps(kw), flush=True)


def run(name, loss_pallas, loss_xla, args):
    fwd = jax.jit(loss_pallas)
    t_f = timeit(fwd, *args, reps=REPS, inner=INNER)
    g_k = jax.jit(jax.grad(loss_pallas, argnums=tuple(range(len(args)))))
    t_k = timeit(g_k, *args, reps=REPS, inner=INNER)
    g_x = jax.jit(jax.grad(loss_xla, argnums=tuple(range(len(args)))))
    t_x = timeit(g_x, *args, reps=REPS, inner=max(1, INNER // 2))
    emit(measure=f"{name}_solver_grad", forward_ms=round(t_f * 1e3, 2),
         adjoint_kernel_bwd_ms=round(t_k * 1e3, 2),
         xla_retrace_bwd_ms=round(t_x * 1e3, 2),
         speedup=round(t_x / t_k, 2))


def main():
    rng = np.random.default_rng(0)
    f32 = jnp.float32

    # LW (256 gpt)
    ngpt = int(os.environ.get("ADJ_NGPT_LW", "256"))
    tau = jnp.asarray(rng.uniform(0.05, 3.0, (NCOL, NLAY, ngpt)), f32)
    lay = jnp.asarray(rng.uniform(5.0, 20.0, (NCOL, NLAY, ngpt)), f32)
    lev = jnp.asarray(rng.uniform(5.0, 20.0, (NCOL, NLAY + 1, ngpt)), f32)
    emis = jnp.full((NCOL, ngpt), 0.95, f32)
    ssrc = jnp.asarray(rng.uniform(10.0, 30.0, (NCOL, ngpt)), f32)
    inc = jnp.zeros((NCOL, ngpt), f32)

    def lw_loss(tau, lay, lev, emis, ssrc, use_pallas=True):
        set_use_pallas(use_pallas)
        try:
            f = lw_solver_noscat(tau, lay, lev, emis, ssrc, inc,
                                 top_at_1=True, ds=(1.66,), weights=(0.5,))
        finally:
            set_use_pallas(None)
        return jnp.sum(f.flux_up) + 0.5 * jnp.sum(f.flux_dn)

    guard("lw_solver", lambda: run(
        "lw", functools.partial(lw_loss, use_pallas=True),
        functools.partial(lw_loss, use_pallas=False),
        (tau, lay, lev, emis, ssrc)))

    # SW (224 gpt)
    ngpt = int(os.environ.get("ADJ_NGPT_SW", "224"))
    tau = jnp.asarray(rng.uniform(0.05, 3.0, (NCOL, NLAY, ngpt)), f32)
    ssa = jnp.asarray(rng.uniform(0.2, 0.99, (NCOL, NLAY, ngpt)), f32)
    gg = jnp.asarray(rng.uniform(0.0, 0.85, (NCOL, NLAY, ngpt)), f32)
    mu0 = jnp.full((NCOL, NLAY), 0.6, f32)
    alb = jnp.full((NCOL, ngpt), 0.25, f32)
    swinc = jnp.asarray(rng.uniform(2.0, 8.0, (NCOL, ngpt)), f32)

    def sw_loss(tau, ssa, gg, mu0, alb, use_pallas=True):
        set_use_pallas(use_pallas)
        try:
            f = sw_solver_2stream(tau, ssa, gg, mu0, alb, alb, swinc,
                                  top_at_1=True)
        finally:
            set_use_pallas(None)
        return (jnp.sum(f.flux_up) + 0.5 * jnp.sum(f.flux_dn)
                + 0.25 * jnp.sum(f.flux_dir))

    guard("sw_solver", lambda: run(
        "sw", functools.partial(sw_loss, use_pallas=True),
        functools.partial(sw_loss, use_pallas=False),
        (tau, ssa, gg, mu0, alb)))

    # ---- GRAND-FUSED path: gas optics + solve, forward vs the fused
    # adjoint kernels (ops/pallas/fused_lw_bwd.py / fused_sw_bwd.py) vs
    # the XLA-retrace backward (the round-3 behavior) ----
    guard("fused_allsky", fused_allsky)


def guard(name, fn):
    """One section's compile/lowering failure must not kill the rest."""
    import traceback
    try:
        fn()
    except Exception as e:
        print(f"# SECTION FAILED {name}: {type(e).__name__}: "
              f"{str(e).splitlines()[0][:200]}", file=sys.stderr,
              flush=True)
        traceback.print_exc()
        emit(measure=f"{name}_grad", error=f"{type(e).__name__}")


def fused_allsky():
    from rte_rrtmgp_tpu.config import set_fused_adjoint
    from rte_rrtmgp_tpu.drivers.allsky import (allsky_step_lw,
                                               allsky_step_sw,
                                               make_allsky_inputs)
    from rte_rrtmgp_tpu.models.rrtmgp.gas_optics import GasOpticsRRTMGP
    from rte_rrtmgp_tpu.utils.synthetic import (synthetic_cloud_optics,
                                                synthetic_kdist)

    small = os.environ.get("ADJ_SMALL", "0") == "1"   # CPU smoke
    kw_lw = (dict(ngpt=32, nbnd=4, ntemp=5, npres=10) if small
             else dict(ngpt=256, nbnd=16, ntemp=14, npres=59))
    kw_sw = (dict(ngpt=32, nbnd=4, ntemp=5, npres=10) if small
             else dict(ngpt=224, nbnd=14, ntemp=14, npres=59))
    kd_lw = synthetic_kdist(sw=False, **kw_lw)
    kd_sw = synthetic_kdist(sw=True, **kw_sw)
    gas_lw, gas_sw = GasOpticsRRTMGP(kd_lw), GasOpticsRRTMGP(kd_sw)
    cld_lw = synthetic_cloud_optics(
        nbnd=16, band_lims_wvn=kd_lw.grid.band_lims_wvn_array)
    cld_sw = synthetic_cloud_optics(
        nbnd=14, band_lims_wvn=kd_sw.grid.band_lims_wvn_array)
    inp = make_allsky_inputs(NCOL, NLAY, cloud_optics=cld_lw)

    def loss(tlay, lwp):
        i = inp._replace(tlay=tlay, lwp=lwp)
        flw = allsky_step_lw(i, gas_lw, cloud_optics=cld_lw)
        fsw = allsky_step_sw(i, gas_sw, cloud_optics=cld_sw)
        return (jnp.sum(flw.flux_net) + jnp.sum(fsw.flux_up)
                + jnp.sum(fsw.flux_dn))

    args = (inp.tlay, inp.lwp)
    set_use_pallas(True)
    try:
        fwd = jax.jit(loss)
        t_f = timeit(fwd, *args, reps=REPS, inner=INNER)
        set_fused_adjoint(True)       # the Pallas adjoint kernels
        gk = jax.jit(jax.grad(loss, argnums=(0, 1)))
        t_k = timeit(gk, *args, reps=REPS, inner=INNER)
        set_fused_adjoint(False)      # the XLA-retrace backward
        gx = jax.jit(jax.grad(loss, argnums=(0, 1)))
        t_x = timeit(gx, *args, reps=REPS, inner=max(1, INNER // 2))
    finally:
        set_use_pallas(None)
        set_fused_adjoint(None)
    emit(measure="fused_allsky_grad", ncol=NCOL, nlay=NLAY,
         forward_ms=round(t_f * 1e3, 2),
         adjoint_kernel_bwd_ms=round(t_k * 1e3, 2),
         xla_retrace_bwd_ms=round(t_x * 1e3, 2),
         bwd_over_fwd=round(t_k / t_f, 2),
         speedup_vs_xla=round(t_x / t_k, 2))


if __name__ == "__main__":
    main()
