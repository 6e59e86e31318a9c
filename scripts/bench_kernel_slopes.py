"""Decompose the grand-fused kernels' measured time into per-layer slope,
fixed overhead, and minor-gas cost — the measurement side of the VPU
cycle-budget audit (docs/PERFORMANCE.md "cycle budget").

Method: the kernels' work is linear in nlay (every gather/op happens per
layer) plus a per-launch fixed part (table residency fetch, grid setup).
Timing the SAME kernel at nlay in {36, 72} gives
  t(nlay) = fixed + nlay * t_layer
and re-timing with band_minors=() isolates the minor-gas contribution.
Per-(block, band, layer) cycles = slope / (nblocks * nbnd) * clock.

Prints one JSON line per measurement; run on the real chip via
scripts/tpu_run.py. Feed the resulting cycles-per-layer-block into
utils/profiling.vpu_cycle_budget's audited constants.

Usage: python scripts/bench_kernel_slopes.py [lw|sw|both]
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

NCOL = int(os.environ.get("SLOPE_NCOL", "4096"))
NLAYS = (36, 72)
CLOCK_GHZ = float(os.environ.get("BENCH_VPU_GHZ", "1.387"))


def emit(**kw):
    print(json.dumps(kw), flush=True)


def run_sw():
    from bench_fused_sw_variants import build_sw_kernel_inputs
    from rte_rrtmgp_tpu.ops.pallas.fused_sw import sw_fused_gas_optics_solve

    nbnd = 14
    times = {}
    for nlay in NLAYS:
        arrays, static = build_sw_kernel_inputs(ncol=NCOL, nlay=nlay)
        arrays = {k: jax.device_put(v) for k, v in arrays.items()}
        for tag, bm in (("full", static["band_minors"]), ("nominors", ())):
            st = dict(static, band_minors=bm)
            jf = jax.jit(lambda a, st=st: sw_fused_gas_optics_solve(
                a["flav"], a["desc"], a["msc"], a["table_lane"],
                a["mtab_lo"], a["mtab_up"], a["rayl_lane"], a["cloud"],
                a["mu0"], a["sfc_alb_dir"], a["sfc_alb_dif"], a["inc"],
                a["incdif"], **st))
            t = timeit(jf, arrays, reps=5, inner=10)
            times[(tag, nlay)] = t
            emit(measure="sw_fused_time", nlay=nlay, variant=tag,
                 ms=round(t * 1e3, 3))
    report("sw", times, nbnd)


def run_lw():
    from bench_fused_variants import build_lw_kernel_inputs
    from rte_rrtmgp_tpu.ops.pallas.fused_lw import lw_fused_gas_optics_solve

    nbnd = 16
    times = {}
    for nlay in NLAYS:
        arrays, _static, static_new = build_lw_kernel_inputs(
            ncol=NCOL, nlay=nlay)
        arrays = {k: jax.device_put(v) for k, v in arrays.items()}
        for tag, bm in (("full", static_new["band_minors"]),
                        ("nominors", ())):
            st = dict(static_new, band_minors=bm)
            jf = jax.jit(lambda a, st=st: lw_fused_gas_optics_solve(
                a["flav"], a["desc"], a["msc"], a["table_lane"],
                a["mtab_lo"], a["mtab_up"], a["tlay"], a["tlev"],
                a["tsfc"], a["totplnk"], a["emis"], a["inc"],
                cloud_tau_abs=a["cloud_tau_abs"], **st))
            t = timeit(jf, arrays, reps=5, inner=10)
            times[(tag, nlay)] = t
            emit(measure="lw_fused_time", nlay=nlay, variant=tag,
                 ms=round(t * 1e3, 3))
    report("lw", times, nbnd)


def report(which, times, nbnd):
    nblk = -(-NCOL // 128)
    lo, hi = NLAYS
    for tag in ("full", "nominors"):
        slope = (times[(tag, hi)] - times[(tag, lo)]) / (hi - lo)
        fixed = times[(tag, lo)] - slope * lo
        cyc = slope / (nblk * nbnd) * CLOCK_GHZ * 1e9
        emit(measure=f"{which}_layer_slope", variant=tag,
             us_per_layer=round(slope * 1e6, 3),
             fixed_ms=round(fixed * 1e3, 3),
             cycles_per_layer_block_band=round(cyc, 1),
             clock_ghz=CLOCK_GHZ)
    m_hi = times[("full", hi)] - times[("nominors", hi)]
    emit(measure=f"{which}_minor_cost", nlay=hi,
         ms=round(m_hi * 1e3, 3),
         fraction_of_full=round(m_hi / times[("full", hi)], 4))


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    if which in ("sw", "both"):
        run_sw()
    if which in ("lw", "both"):
        run_lw()
