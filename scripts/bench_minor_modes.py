"""Time the fused kernels' minor-gas accumulation modes on the chip.

Modes (ops/pallas/fused_minors.py): rmw (round-2 structure), vreg
(per-atmosphere-group VREG accumulation, one scratch RMW per group),
flat (branch-free full-band VREG accumulation, one RMW per layer).
Also times "none" (minors skipped entirely) to bound the minors' cost.

Prints JSON lines per (kernel, mode) with ms and max-abs error vs rmw.
Run under scripts/tpu_run.py.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from timing import timeit  # noqa: E402

np.asarray(jax.numpy.zeros(8) + 1.0)
print("# device ok", flush=True)

from bench_fused_variants import build_lw_kernel_inputs  # noqa: E402
from bench_fused_sw_variants import build_sw_kernel_inputs  # noqa: E402
from rte_rrtmgp_tpu.ops.pallas import fused_minors  # noqa: E402
from rte_rrtmgp_tpu.ops.pallas.fused_lw import lw_fused_gas_optics_solve  # noqa: E402
from rte_rrtmgp_tpu.ops.pallas.fused_sw import sw_fused_gas_optics_solve  # noqa: E402

REPS = int(os.environ.get("MM_REPS", "5"))
INNER = int(os.environ.get("MM_INNER", "5"))
MODES = os.environ.get("MM_MODES",
                       "rmw,vreg,flat,rmw_u,vreg_u,flat_u,none").split(",")


def run(kernel_name, call, static):
    ref = None
    for mode in MODES:
        if mode == "none":
            fused_minors.set_mode("rmw")
            st = dict(static, band_minors=tuple(
                () for _ in static["band_minors"]))
        else:
            fused_minors.set_mode(mode)
            st = static
        try:
            jf = jax.jit(lambda st=st: call(st))
            out = jf()
            got = np.concatenate([np.asarray(o).ravel() for o in out])
            t = timeit(jf, reps=REPS, inner=INNER)
            if ref is None:
                ref = got
            err = float(np.abs(got - ref).max())
            print(json.dumps({"kernel": kernel_name, "mode": mode,
                              "ms": round(t * 1e3, 3),
                              "max_abs_err_vs_first": err}), flush=True)
        finally:
            fused_minors.set_mode(None)


def main():
    a, static = build_sw_kernel_inputs()
    a = {k: (jax.device_put(v) if hasattr(v, "shape") else v)
         for k, v in a.items()}
    run("fused_sw", lambda st: sw_fused_gas_optics_solve(
        a["flav"], a["desc"], a["msc"], a["table_lane"], a["mtab_lo"],
        a["mtab_up"], a["rayl_lane"], a["cloud"], a["mu0"],
        a["sfc_alb_dir"], a["sfc_alb_dif"], a["inc"], a["incdif"], **st),
        static)
    del a

    a, static, static_new = build_lw_kernel_inputs()
    a = {k: (jax.device_put(v) if hasattr(v, "shape") else v)
         for k, v in a.items()}
    run("fused_lw", lambda st: lw_fused_gas_optics_solve(
        a["flav"], a["desc"], a["msc"], a["table_lane"], a["mtab_lo"],
        a["mtab_up"], a["tlay"], a["tlev"], a["tsfc"], a["totplnk"],
        a["emis"], a["inc"], cloud_tau_abs=a["cloud_tau_abs"], **st),
        static_new)


if __name__ == "__main__":
    main()
