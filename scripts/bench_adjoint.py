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


def _phase(result, key, fn):
    """Time one phase; record an error marker instead of dying (a compile
    OOM in one phase must not discard the others' measurements)."""
    import traceback
    try:
        result[key] = round(fn() * 1e3, 2)
    except Exception as e:
        print(f"# phase {key} failed: {type(e).__name__}: "
              f"{str(e).splitlines()[0][:160]}", file=sys.stderr, flush=True)
        traceback.print_exc()
        result[key] = f"error:{type(e).__name__}"


def run(name, loss_pallas, loss_xla, args):
    r = {"measure": f"{name}_solver_grad"}
    argn = tuple(range(len(args)))
    _phase(r, "forward_ms", lambda: timeit(
        jax.jit(loss_pallas), *args, reps=REPS, inner=INNER))
    _phase(r, "adjoint_kernel_bwd_ms", lambda: timeit(
        jax.jit(jax.grad(loss_pallas, argnums=argn)), *args,
        reps=REPS, inner=INNER))
    _phase(r, "xla_retrace_bwd_ms", lambda: timeit(
        jax.jit(jax.grad(loss_xla, argnums=argn)), *args,
        reps=REPS, inner=max(1, INNER // 2)))
    tk, tx = r.get("adjoint_kernel_bwd_ms"), r.get("xla_retrace_bwd_ms")
    if isinstance(tk, float) and isinstance(tx, float):
        r["speedup"] = round(tx / tk, 2)
    emit(**r)


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
    def make_loss(ncol):
        """One loss per problem size: the production-shape measurement
        and the reduced-ncol OOM fallback must use the SAME objective."""
        inp = make_allsky_inputs(ncol, NLAY, cloud_optics=cld_lw)

        def loss(tlay, lwp):
            i = inp._replace(tlay=tlay, lwp=lwp)
            flw = allsky_step_lw(i, gas_lw, cloud_optics=cld_lw)
            fsw = allsky_step_sw(i, gas_sw, cloud_optics=cld_sw)
            return (jnp.sum(flw.flux_net) + jnp.sum(fsw.flux_up)
                    + jnp.sum(fsw.flux_dn))

        return loss, (inp.tlay, inp.lwp)

    loss, args = make_loss(NCOL)
    r = {"measure": "fused_allsky_grad", "ncol": NCOL, "nlay": NLAY}
    set_use_pallas(True)
    try:
        _phase(r, "forward_ms", lambda: timeit(
            jax.jit(loss), *args, reps=REPS, inner=INNER))
        set_fused_adjoint(True)       # the Pallas adjoint kernels
        _phase(r, "adjoint_kernel_bwd_ms", lambda: timeit(
            jax.jit(jax.grad(loss, argnums=(0, 1))), *args,
            reps=REPS, inner=INNER))
        set_fused_adjoint(False)      # the XLA-retrace backward
        _phase(r, "xla_retrace_bwd_ms", lambda: timeit(
            jax.jit(jax.grad(loss, argnums=(0, 1))), *args,
            reps=REPS, inner=max(1, INNER // 2)))
    finally:
        set_use_pallas(None)
        set_fused_adjoint(None)
    tf, tk = r.get("forward_ms"), r.get("adjoint_kernel_bwd_ms")
    tx = r.get("xla_retrace_bwd_ms")
    if isinstance(tk, float) and isinstance(tf, float):
        r["bwd_over_fwd"] = round(tk / tf, 2)
    if isinstance(tk, float) and isinstance(tx, float):
        r["speedup_vs_xla"] = round(tx / tk, 2)
    emit(**r)
    # the XLA-retrace backward materializes the spectral intermediates in
    # HBM and can OOM at production ncol (22.1 GB needed vs 15.75 GB at
    # 4096x72 on v5e, measured 2026-08-20) — when it does, re-measure it
    # at a reduced column count so the comparison still lands
    if not isinstance(tx, float):
        ncol_s = max(512, NCOL // 4)
        loss_s, args_s = make_loss(ncol_s)
        rs = {"measure": "fused_allsky_grad_reduced", "ncol": ncol_s,
              "nlay": NLAY}
        set_use_pallas(True)
        try:
            set_fused_adjoint(True)
            _phase(rs, "adjoint_kernel_bwd_ms", lambda: timeit(
                jax.jit(jax.grad(loss_s, argnums=(0, 1))), *args_s,
                reps=REPS, inner=INNER))
            set_fused_adjoint(False)
            _phase(rs, "xla_retrace_bwd_ms", lambda: timeit(
                jax.jit(jax.grad(loss_s, argnums=(0, 1))), *args_s,
                reps=REPS, inner=max(1, INNER // 2)))
        finally:
            set_use_pallas(None)
            set_fused_adjoint(None)
        tk, tx = (rs.get("adjoint_kernel_bwd_ms"),
                  rs.get("xla_retrace_bwd_ms"))
        if isinstance(tk, float) and isinstance(tx, float):
            rs["speedup_vs_xla"] = round(tx / tk, 2)
        emit(**rs)


if __name__ == "__main__":
    main()
