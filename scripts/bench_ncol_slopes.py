"""Decompose the fused kernels' ~3 ms nlay-slope intercept into
per-LAUNCH fixed cost vs per-GRID-STEP fixed cost.

The nlay-slope fit (bench_kernel_slopes.py) gives
  t(nlay) = F + nblk * nbnd * (s0 + nlay * s1)
whose intercept F + nblk * nbnd * s0 mixes the launch-level fixed cost F
(dispatch, table residency fetch, output round-trip) with the
per-grid-step prologue s0 (paid 448/512 times). Timing the SAME kernel
at several ncol (i.e. several nblk) at fixed nlay separates them:
  t(nblk) = F + nblk * c      =>  intercept = F,  slope/nbnd - nlay*s1 = s0.

Prints one JSON line per measurement; run on the real chip via
scripts/tpu_run.py.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from timing import timeit  # noqa: E402

np.asarray(jax.numpy.zeros(8) + 1.0)
print("# device ok", flush=True)

NLAY = int(os.environ.get("SLOPE_NLAY", "72"))
NCOLS = tuple(int(x) for x in
              os.environ.get("SLOPE_NCOLS", "1024,2048,4096,8192").split(","))


def emit(**kw):
    print(json.dumps(kw), flush=True)


def fit(xs, ys):
    xs, ys = np.asarray(xs, float), np.asarray(ys, float)
    slope, icpt = np.polyfit(xs, ys, 1)
    return slope, icpt


def run_sw():
    from bench_fused_sw_variants import build_sw_kernel_inputs
    from rte_rrtmgp_tpu.ops.pallas.fused_sw import sw_fused_gas_optics_solve

    nbnd = 14
    times = []
    for ncol in NCOLS:
        arrays, static = build_sw_kernel_inputs(ncol=ncol, nlay=NLAY)
        arrays = {k: jax.device_put(v) for k, v in arrays.items()}
        jf = jax.jit(lambda a, st=static: sw_fused_gas_optics_solve(
            a["flav"], a["desc"], a["msc"], a["table_lane"],
            a["mtab_lo"], a["mtab_up"], a["rayl_lane"], a["cloud"],
            a["mu0"], a["sfc_alb_dir"], a["sfc_alb_dif"], a["inc"],
            a["incdif"], **st))
        t = timeit(jf, arrays, reps=5, inner=10)
        times.append(t)
        emit(measure="sw_fused_time_ncol", ncol=ncol, nlay=NLAY,
             ms=round(t * 1e3, 3))
    report("sw", times, nbnd)


def run_lw():
    from bench_fused_variants import build_lw_kernel_inputs
    from rte_rrtmgp_tpu.ops.pallas.fused_lw import lw_fused_gas_optics_solve

    nbnd = 16
    times = []
    for ncol in NCOLS:
        arrays, _static, static_new = build_lw_kernel_inputs(
            ncol=ncol, nlay=NLAY)
        arrays = {k: jax.device_put(v) for k, v in arrays.items()}
        jf = jax.jit(lambda a, st=static_new: lw_fused_gas_optics_solve(
            a["flav"], a["desc"], a["msc"], a["table_lane"],
            a["mtab_lo"], a["mtab_up"], a["tlay"], a["tlev"],
            a["tsfc"], a["totplnk"], a["emis"], a["inc"],
            cloud_tau_abs=a["cloud_tau_abs"], **st))
        t = timeit(jf, arrays, reps=5, inner=10)
        times.append(t)
        emit(measure="lw_fused_time_ncol", ncol=ncol, nlay=NLAY,
             ms=round(t * 1e3, 3))
    report("lw", times, nbnd)


def report(which, times, nbnd):
    nblks = [-(-c // 128) for c in NCOLS]
    slope, icpt = fit(nblks, times)
    # per-grid-step cost (all of it: prologue + per-layer work)
    emit(measure=f"{which}_ncol_slope", nlay=NLAY,
         us_per_colblock=round(slope * 1e6, 3),
         us_per_gridstep=round(slope / nbnd * 1e6, 3),
         launch_fixed_ms=round(icpt * 1e3, 3),
         ncols=list(NCOLS),
         ms=[round(t * 1e3, 3) for t in times])


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    if which in ("sw", "both"):
        run_sw()
    if which in ("lw", "both"):
        run_lw()
