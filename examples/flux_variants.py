#!/usr/bin/env python
"""Solver-variant flux files (reference tests/check_variants.F90: computes
fluxes across LW/SW solver variants and writes them for validation plots).

Variants (reference :218-475 print markers):
  LW: noscat 1-angle (default), no-tlev (interpolated level temperatures),
      3-angle quadrature, optimal-angle secants, Jacobian carried,
      true two-stream; SW: default two-stream.

Usage:
  python examples/flux_variants.py [--ncol 24] [--nlay 48] [--out lw_flux_variants.nc]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ncol", type=int, default=24)
    ap.add_argument("--nlay", type=int, default=48)
    ap.add_argument("--out", default="lw_flux_variants.nc")
    args = ap.parse_args()

    import jax.numpy as jnp
    from rte_rrtmgp_tpu import rte_lw, rte_sw
    from rte_rrtmgp_tpu.models.rrtmgp.gas_optics import GasOpticsRRTMGP
    from rte_rrtmgp_tpu.utils.profiles import rcemip_profiles
    from rte_rrtmgp_tpu.utils.synthetic import synthetic_kdist

    ncol, nlay = args.ncol, args.nlay
    play, plev, tlay, tlev, _z, gas = rcemip_profiles(ncol, nlay)
    play, plev = jnp.asarray(play, jnp.float32), jnp.asarray(plev, jnp.float32)
    tlay, tlev = jnp.asarray(tlay, jnp.float32), jnp.asarray(tlev, jnp.float32)
    tsfc = tlay[:, -1]
    emis = jnp.full((ncol, 1), 0.98, jnp.float32)

    gop = GasOpticsRRTMGP(synthetic_kdist(sw=False, ngpt=256, nbnd=16,
                                          ntemp=14, npres=59))
    variants = {}

    props, src = gop.gas_optics_lw(play, plev, tlay, tsfc, gas, tlev=tlev,
                                   top_at_1=True)
    f = rte_lw(props, src, emis)
    variants["lw_flux_up"] = f.flux_up
    variants["lw_flux_dn"] = f.flux_dn

    # no-tlev: level temperatures interpolated internally
    props2, src2 = gop.gas_optics_lw(play, plev, tlay, tsfc, gas,
                                     top_at_1=True)
    f = rte_lw(props2, src2, emis)
    variants["lw_flux_up_notlev"] = f.flux_up
    variants["lw_flux_dn_notlev"] = f.flux_dn

    # 3-angle quadrature
    f = rte_lw(props, src, emis, n_gauss_angles=3)
    variants["lw_flux_up_3ang"] = f.flux_up
    variants["lw_flux_dn_3ang"] = f.flux_dn

    # optimal angles
    ds = gop.compute_optimal_angles(props)
    f = rte_lw(props, src, emis, lw_ds=ds)
    variants["lw_flux_up_optang"] = f.flux_up
    variants["lw_flux_dn_optang"] = f.flux_dn

    # Jacobian carried (fluxes must be unchanged)
    f = rte_lw(props, src, emis, compute_jacobian=True)
    variants["lw_flux_up_jaco"] = f.flux_up
    variants["lw_flux_dn_jaco"] = f.flux_dn
    variants["lw_jaco_up"] = f.flux_up_jac

    # true two-stream
    props_2s, src_2s = gop.gas_optics_lw(play, plev, tlay, tsfc, gas,
                                         tlev=tlev, scattering=True,
                                         top_at_1=True)
    f = rte_lw(props_2s, src_2s, emis, use_2stream=True)
    variants["lw_flux_up_2str"] = f.flux_up
    variants["lw_flux_dn_2str"] = f.flux_dn

    # SW default
    gsw = GasOpticsRRTMGP(synthetic_kdist(sw=True, ngpt=224, nbnd=14,
                                          ntemp=14, npres=59))
    p_sw, toa = gsw.gas_optics_sw(play, plev, tlay, gas, top_at_1=True)
    alb = jnp.full((ncol, 1), 0.06, jnp.float32)
    mu0 = jnp.full((ncol,), 0.86, jnp.float32)
    f = rte_sw(p_sw, mu0, toa, alb, alb)
    variants["sw_flux_up"] = f.flux_up
    variants["sw_flux_dn"] = f.flux_dn
    variants["sw_flux_dir"] = f.flux_dn_dir

    from scipy.io import netcdf_file
    with netcdf_file(args.out, "w") as nc:
        nc.createDimension("site", ncol)
        nc.createDimension("level", nlay + 1)
        for name, arr in variants.items():
            v = nc.createVariable(name, np.float64, ("site", "level"))
            v[:] = np.asarray(arr, np.float64)
    print(f"wrote {args.out} with {len(variants)} variant fields")
    for name, arr in variants.items():
        a = np.asarray(arr)
        print(f"  {name:24s} mean={a.mean():10.4f}  TOA={a[:, 0].mean():10.4f}")


if __name__ == "__main__":
    main()
