#!/usr/bin/env python
"""Problem-size scaling sweep (reference examples/all-sky/
make_problem_size_loop.py:28-86 generates command sweeps; this runs them).

Usage:
  python examples/problem_size_sweep.py [--ncols 512,2048,8192]
      [--nlays 32,72,96] [--nreps 5]

Prints a columns/s table over (ncol, nlay) for the full LW+SW all-sky step.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ncols", default="512,2048,8192")
    ap.add_argument("--nlays", default="32,72,96")
    ap.add_argument("--nreps", type=int, default=5)
    args = ap.parse_args()

    from rte_rrtmgp_tpu.config import checks_disabled
    from rte_rrtmgp_tpu.drivers.allsky import (allsky_step_lw, allsky_step_sw,
                                               make_allsky_inputs)
    from rte_rrtmgp_tpu.models.rrtmgp.gas_optics import GasOpticsRRTMGP
    from rte_rrtmgp_tpu.utils.synthetic import (synthetic_cloud_optics,
                                                synthetic_kdist)

    kd_lw = synthetic_kdist(sw=False, ngpt=256, nbnd=16, ntemp=14, npres=59)
    kd_sw = synthetic_kdist(sw=True, ngpt=224, nbnd=14, ntemp=14, npres=59)
    gas_lw, gas_sw = GasOpticsRRTMGP(kd_lw), GasOpticsRRTMGP(kd_sw)
    cld_lw = synthetic_cloud_optics(nbnd=16,
                                    band_lims_wvn=kd_lw.grid.band_lims_wvn_array)
    cld_sw = synthetic_cloud_optics(nbnd=14,
                                    band_lims_wvn=kd_sw.grid.band_lims_wvn_array)

    print(f"{'ncol':>8} {'nlay':>6} {'time_ms':>10} {'cols/s':>12} "
          f"{'us/col':>10}")
    for ncol in [int(x) for x in args.ncols.split(",")]:
        for nlay in [int(x) for x in args.nlays.split(",")]:
            inputs = make_allsky_inputs(ncol, nlay, cloud_optics=cld_lw)

            @jax.jit
            def step(i):
                lw = allsky_step_lw(i, gas_lw, cloud_optics=cld_lw)
                sw = allsky_step_sw(i, gas_sw, cloud_optics=cld_sw)
                return lw.flux_up, sw.flux_up

            out = jax.block_until_ready(step(inputs))
            times = []
            with checks_disabled():
                for _ in range(args.nreps):
                    t0 = time.perf_counter()
                    out = step(inputs)
                    np.asarray(jax.device_get(out[0].ravel()[-1:]))
                    times.append(time.perf_counter() - t0)
            t = min(times)
            print(f"{ncol:>8} {nlay:>6} {t*1e3:>10.2f} {ncol/t:>12.1f} "
                  f"{t/ncol*1e6:>10.3f}")


if __name__ == "__main__":
    main()
