#!/usr/bin/env python
"""All-sky benchmark driver (reference examples/all-sky/rrtmgp_allsky.F90).

Usage:
  python examples/run_allsky.py NCOL NLAY NREPS [--no-clouds] [--aerosols]
      [--lw-only | --sw-only] [--dtype float32|float64] [--profile DIR]

Analytic RCE-like profiles + synthetic clouds/aerosols, RRTMGP gas optics
at production spectral dimensions (synthetic tables unless $RRTMGP_DATA
points at the rrtmgp-data archive), timed iteration loop reporting the
reference's table: ncol x nlay x ngpt and time per column
(reference :413-419).
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
    ap.add_argument("ncol", type=int, nargs="?", default=24)
    ap.add_argument("nlay", type=int, nargs="?", default=72)
    ap.add_argument("nreps", type=int, nargs="?", default=1)
    ap.add_argument("--no-clouds", action="store_true")
    ap.add_argument("--aerosols", action="store_true")
    ap.add_argument("--lw-only", action="store_true")
    ap.add_argument("--sw-only", action="store_true")
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--profile", default=None,
                    help="write a jax.profiler trace to this directory")
    args = ap.parse_args()

    from rte_rrtmgp_tpu.config import checks_disabled
    from rte_rrtmgp_tpu.drivers.allsky import (allsky_step_lw, allsky_step_sw,
                                               make_allsky_inputs)
    from rte_rrtmgp_tpu.models.rrtmgp.gas_optics import GasOpticsRRTMGP
    from rte_rrtmgp_tpu.utils import netcdf as ncio
    from rte_rrtmgp_tpu.utils.synthetic import (synthetic_aerosol_optics,
                                                synthetic_cloud_optics,
                                                synthetic_kdist)

    data_dir = ncio.rrtmgp_data_path()
    if data_dir:
        kd_lw = ncio.load_gas_optics(
            os.path.join(data_dir, "rrtmgp-gas-lw-g256.nc"),
            ("h2o", "co2", "o3", "n2o", "co", "ch4", "o2", "n2"))
        kd_sw = ncio.load_gas_optics(
            os.path.join(data_dir, "rrtmgp-gas-sw-g224.nc"),
            ("h2o", "co2", "o3", "n2o", "co", "ch4", "o2", "n2"))
        cld_lw = ncio.load_cloud_optics(
            os.path.join(data_dir, "rrtmgp-clouds-lw.nc"))
        cld_sw = ncio.load_cloud_optics(
            os.path.join(data_dir, "rrtmgp-clouds-sw.nc"))
        aer_lw = ncio.load_aerosol_optics(
            os.path.join(data_dir, "rrtmgp-aerosols-merra-lw.nc"))
        aer_sw = ncio.load_aerosol_optics(
            os.path.join(data_dir, "rrtmgp-aerosols-merra-sw.nc"))
        print(f"using rrtmgp-data from {data_dir}")
    else:
        kd_lw = synthetic_kdist(sw=False, ngpt=256, nbnd=16, ntemp=14, npres=59)
        kd_sw = synthetic_kdist(sw=True, ngpt=224, nbnd=14, ntemp=14, npres=59)
        cld_lw = synthetic_cloud_optics(
            nbnd=16, band_lims_wvn=kd_lw.grid.band_lims_wvn_array)
        cld_sw = synthetic_cloud_optics(
            nbnd=14, band_lims_wvn=kd_sw.grid.band_lims_wvn_array)
        aer_lw = synthetic_aerosol_optics(
            nbnd=16, band_lims_wvn=kd_lw.grid.band_lims_wvn_array)
        aer_sw = synthetic_aerosol_optics(
            nbnd=14, band_lims_wvn=kd_sw.grid.band_lims_wvn_array)
        print("using synthetic optics tables (set RRTMGP_DATA for real data)")

    gas_lw, gas_sw = GasOpticsRRTMGP(kd_lw), GasOpticsRRTMGP(kd_sw)
    cld_lw = None if args.no_clouds else cld_lw
    cld_sw = None if args.no_clouds else cld_sw
    aer_lw = aer_lw if args.aerosols else None
    aer_sw = aer_sw if args.aerosols else None
    inputs = make_allsky_inputs(args.ncol, args.nlay, cloud_optics=cld_lw)

    do_lw = not args.sw_only
    do_sw = not args.lw_only

    @jax.jit
    def step(inputs):
        out = []
        if do_lw:
            f = allsky_step_lw(inputs, gas_lw, cloud_optics=cld_lw,
                               aerosol_optics=aer_lw,
                               use_clouds=not args.no_clouds,
                               use_aerosols=args.aerosols)
            out += [f.flux_up, f.flux_dn]
        if do_sw:
            f = allsky_step_sw(inputs, gas_sw, cloud_optics=cld_sw,
                               aerosol_optics=aer_sw,
                               use_clouds=not args.no_clouds,
                               use_aerosols=args.aerosols)
            out += [f.flux_up, f.flux_dn, f.flux_dn_dir]
        return tuple(out)

    # first iteration includes compile + checks; later ones are the timed
    # region with checks off (reference :332-335)
    out = jax.block_until_ready(step(inputs))
    times = []
    with checks_disabled():
        for _ in range(args.nreps):
            t0 = time.perf_counter()
            out = step(inputs)
            np.asarray(jax.device_get(out[0].ravel()[-1:]))  # force completion
            times.append(time.perf_counter() - t0)

    if args.profile:
        with jax.profiler.trace(args.profile):
            out = step(inputs)
            np.asarray(jax.device_get(out[0].ravel()[-1:]))
        print(f"profile written to {args.profile}")

    t_min, t_tot = min(times), sum(times)
    ngpt = (kd_lw.ngpt if do_lw else 0) + (kd_sw.ngpt if do_sw else 0)
    print(f"{'ncol':>8} {'nlay':>6} {'ngpt':>6} {'time_per_col_ms':>16} "
          f"{'total_s':>9} {'min_s':>9}")
    print(f"{args.ncol:>8} {args.nlay:>6} {ngpt:>6} "
          f"{t_min / args.ncol * 1e3:>16.6f} {t_tot:>9.4f} {t_min:>9.4f}")
    if do_lw:
        print(f"LW flux_up TOA mean: {float(np.asarray(out[0][:, 0]).mean()):.3f} W/m2")


if __name__ == "__main__":
    main()
