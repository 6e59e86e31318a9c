"""Measure the transport-recurrence unroll factor on the fused kernels.

The three SW sweeps and two LW sweeps run nlay sequential iterations per
grid step with tiny (w, 128) bodies. Mosaic supports only rolled
(unroll=1) or FULLY unrolled (unroll=num_steps) fori_loops, so the knob
is effectively boolean: U=1 rolled, U!=1 fully unrolled. This times the
full fused LW and SW launches at both settings (same inputs, re-traced
per U via the solver_lanes.UNROLL module attribute).

Prints one JSON line per (kernel, U); run via scripts/tpu_run.py.
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

NCOL = int(os.environ.get("UNROLL_NCOL", "4096"))
NLAY = int(os.environ.get("UNROLL_NLAY", "72"))
FACTORS = tuple(int(x) for x in
                os.environ.get("UNROLL_FACTORS", "1,2").split(","))


def emit(**kw):
    print(json.dumps(kw), flush=True)


def main():
    from bench_fused_sw_variants import build_sw_kernel_inputs
    from bench_fused_variants import build_lw_kernel_inputs
    from rte_rrtmgp_tpu.ops.pallas import solver_lanes
    from rte_rrtmgp_tpu.ops.pallas.fused_lw import lw_fused_gas_optics_solve
    from rte_rrtmgp_tpu.ops.pallas.fused_sw import sw_fused_gas_optics_solve

    sw_arrays, sw_static = build_sw_kernel_inputs(ncol=NCOL, nlay=NLAY)
    sw_arrays = {k: jax.device_put(v) for k, v in sw_arrays.items()}
    lw_arrays, _s, lw_static = build_lw_kernel_inputs(ncol=NCOL, nlay=NLAY)
    lw_arrays = {k: jax.device_put(v) for k, v in lw_arrays.items()}

    base_out = {}
    for u in FACTORS:
        solver_lanes.UNROLL = u

        jf_sw = jax.jit(lambda a, st=sw_static: sw_fused_gas_optics_solve(
            a["flav"], a["desc"], a["msc"], a["table_lane"],
            a["mtab_lo"], a["mtab_up"], a["rayl_lane"], a["cloud"],
            a["mu0"], a["sfc_alb_dir"], a["sfc_alb_dif"], a["inc"],
            a["incdif"], **st))
        t_sw = timeit(jf_sw, sw_arrays, reps=5, inner=10)
        out_sw = [np.asarray(o) for o in jf_sw(sw_arrays)]

        jf_lw = jax.jit(lambda a, st=lw_static: lw_fused_gas_optics_solve(
            a["flav"], a["desc"], a["msc"], a["table_lane"],
            a["mtab_lo"], a["mtab_up"], a["tlay"], a["tlev"],
            a["tsfc"], a["totplnk"], a["emis"], a["inc"],
            cloud_tau_abs=a["cloud_tau_abs"], **st))
        t_lw = timeit(jf_lw, lw_arrays, reps=5, inner=10)
        out_lw = [np.asarray(o) for o in jf_lw(lw_arrays)]

        if u == FACTORS[0]:
            base_out["sw"], base_out["lw"] = out_sw, out_lw
        err_sw = max(float(np.abs(a - b).max() / max(np.abs(b).max(), 1e-30))
                     for a, b in zip(out_sw, base_out["sw"]))
        err_lw = max(float(np.abs(a - b).max() / max(np.abs(b).max(), 1e-30))
                     for a, b in zip(out_lw, base_out["lw"]))
        emit(measure="fused_unroll", unroll=u,
             sw_ms=round(t_sw * 1e3, 3), lw_ms=round(t_lw * 1e3, 3),
             max_rel_err_vs_u1={"sw": f"{err_sw:.2e}", "lw": f"{err_lw:.2e}"})


if __name__ == "__main__":
    main()
