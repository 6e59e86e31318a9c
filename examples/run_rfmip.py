#!/usr/bin/env python
"""RFMIP clear-sky runner (reference examples/rfmip-clear-sky drivers +
run-rfmip-examples.py + compare-to-reference.py in one CLI).

Usage:
  # real data (RFMIP input + k-distributions found via --data / $RRTMGP_DATA)
  python examples/run_rfmip.py --rfmip-file FILE --kdist-lw FILE \
      --kdist-sw FILE [--block-size N] [--forcing-index 1|2|3] [--out DIR] \
      [--ref-dir DIR]
  # or offline, at the reference problem size, with synthetic tables:
  python examples/run_rfmip.py --synthetic

Writes rlu/rld/rsu/rsd netCDF files; with --ref-dir compares each against
reference outputs using the reference's thresholds.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rfmip-file")
    ap.add_argument("--kdist-lw")
    ap.add_argument("--kdist-sw")
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--scheme", choices=["rrtmgp", "ssm"], default="rrtmgp",
                    help="optics scheme (the reference dispatches SSM vs "
                         "RRTMGP by executable name)")
    ap.add_argument("--nsite", type=int, default=100)
    ap.add_argument("--nlay", type=int, default=60)
    ap.add_argument("--nexp", type=int, default=18)
    ap.add_argument("--block-size", type=int, default=None)
    ap.add_argument("--forcing-index", type=int, default=1)
    ap.add_argument("--n-quad-angles", type=int, default=1)
    ap.add_argument("--out", default=".")
    ap.add_argument("--ref-dir", default=None)
    args = ap.parse_args()

    from rte_rrtmgp_tpu.drivers.rfmip import (read_rfmip, rfmip_lw, rfmip_sw,
                                              synthetic_rfmip, write_fluxes,
                                              unblock)
    from rte_rrtmgp_tpu.models.rrtmgp.gas_optics import GasOpticsRRTMGP
    from rte_rrtmgp_tpu.utils.compare import compare_fields
    from rte_rrtmgp_tpu.utils.netcdf import NCFile, load_gas_optics
    from rte_rrtmgp_tpu.utils.synthetic import synthetic_kdist

    if args.scheme == "ssm":
        from rte_rrtmgp_tpu.models.ssm import ssm_lw_defaults, ssm_sw_defaults
        data = (synthetic_rfmip(args.nsite, args.nlay, args.nexp)
                if (args.synthetic or not args.rfmip_file)
                else read_rfmip(args.rfmip_file,
                                forcing_index=args.forcing_index))
        gas_lw, gas_sw = ssm_lw_defaults(), ssm_sw_defaults()
    elif args.synthetic or not args.rfmip_file:
        print(f"running synthetic RFMIP-shaped problem "
              f"({args.nsite * args.nexp} cols x {args.nlay} lay)")
        data = synthetic_rfmip(args.nsite, args.nlay, args.nexp)
        gas_lw = GasOpticsRRTMGP(synthetic_kdist(sw=False, ngpt=256, nbnd=16,
                                                 ntemp=14, npres=59))
        gas_sw = GasOpticsRRTMGP(synthetic_kdist(sw=True, ngpt=224, nbnd=14,
                                                 ntemp=14, npres=59))
    else:
        kd_lw = load_gas_optics(args.kdist_lw, GASES := (
            "h2o", "co2", "o3", "n2o", "co", "ch4", "o2", "n2"))
        kd_sw = load_gas_optics(args.kdist_sw, GASES)
        data = read_rfmip(args.rfmip_file, kd_lw.gas_names,
                          args.forcing_index)
        gas_lw = GasOpticsRRTMGP(kd_lw)
        gas_sw = GasOpticsRRTMGP(kd_sw)

    rlu, rld = rfmip_lw(data, gas_lw, block_size=args.block_size,
                        n_gauss_angles=args.n_quad_angles)
    rsu, rsd = rfmip_sw(data, gas_sw, block_size=args.block_size)

    os.makedirs(args.out, exist_ok=True)
    outputs = {"rlu": rlu, "rld": rld, "rsu": rsu, "rsd": rsd}
    for name, flux in outputs.items():
        path = os.path.join(args.out, f"{name}_Efx.nc")
        write_fluxes(path, name, data, flux)
        print(f"wrote {path}  mean={float(np.mean(flux)):.4f} W/m2")

    if args.ref_dir:
        ok = True
        for name, flux in outputs.items():
            refs = [f for f in os.listdir(args.ref_dir) if name in f]
            if not refs:
                print(f"no reference file for {name}")
                continue
            ref = NCFile(os.path.join(args.ref_dir, refs[0])).var(name)
            ok &= compare_fields(unblock(data, flux), ref, name)
        sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
