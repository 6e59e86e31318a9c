#!/usr/bin/env python
"""Generic RTE problem runner (reference examples/rte-examples/
rte_examples.F90 + mo_rte_examples_io.F90): read an atmosphere-problem
netCDF (dims col x layer x variant, fields pres_layer/pres_level,
temp_layer/temp_level, surface BCs, per-variant gas concentrations), run
the chosen optics scheme + solver, write LW/SW fluxes, and optionally
compare against a solution file with the reference thresholds.

Usage:
  python examples/run_rte_problems.py PROBLEM.nc [--scheme ssm|rrtmgp]
      [--solution SOLUTION.nc] [--out fluxes.nc]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("problem")
    ap.add_argument("--scheme", choices=["ssm", "rrtmgp"], default="ssm")
    ap.add_argument("--solution", default=None)
    ap.add_argument("--out", default="rte_fluxes.nc")
    args = ap.parse_args()

    import jax.numpy as jnp
    from rte_rrtmgp_tpu import rte_lw, rte_sw
    from rte_rrtmgp_tpu.gas_concs import GasConcs
    from rte_rrtmgp_tpu.utils.compare import compare_fields
    from rte_rrtmgp_tpu.utils.netcdf import NCFile

    f = NCFile(args.problem)
    ncol = f.dim("col")
    nlay = f.dim("layer")
    try:
        nvar = f.dim("variant")
    except KeyError:
        nvar = 1
    n = ncol * nvar

    def rep_cols(a):            # shared over variants -> (n, ...)
        return np.tile(np.asarray(a)[None], (nvar,) + (1,) * a.ndim).reshape(
            (n,) + a.shape[1:])

    def per_var(a):             # (variant, col, ...) -> (n, ...)
        return np.asarray(a).reshape((n,) + a.shape[2:])

    play = rep_cols(f.var("pres_layer"))
    plev = rep_cols(f.var("pres_level"))
    tlay = per_var(f.var("temp_layer"))
    tlev = per_var(f.var("temp_level"))

    gas = GasConcs.empty()
    for name in ("h2o", "co2", "o3", "ch4", "n2o", "o2", "n2"):
        if f.has(name):
            v = np.asarray(f.var(name))
            if v.ndim >= 2:
                gas = gas.set_vmr(name, per_var(v))
            else:                      # per-variant scalar
                gas = gas.set_vmr(name, np.repeat(v, ncol)[:, None]
                                  * np.ones((1, nlay)))

    if args.scheme == "ssm":
        from rte_rrtmgp_tpu.models.ssm import ssm_lw_defaults, ssm_sw_defaults
        gas_lw, gas_sw = ssm_lw_defaults(), ssm_sw_defaults()
    else:
        from rte_rrtmgp_tpu.models.rrtmgp.gas_optics import GasOpticsRRTMGP
        from rte_rrtmgp_tpu.utils.synthetic import synthetic_kdist
        gas_lw = GasOpticsRRTMGP(synthetic_kdist(sw=False))
        gas_sw = GasOpticsRRTMGP(synthetic_kdist(sw=True))

    out = {}
    if f.has("surface_temperature"):
        tsfc = per_var(f.var("surface_temperature")).reshape(n)
        emis = per_var(f.var("surface_emissivity")).reshape(n, 1)
        props, src = gas_lw.gas_optics_lw(jnp.asarray(play), jnp.asarray(plev),
                                          jnp.asarray(tlay), jnp.asarray(tsfc),
                                          gas, tlev=jnp.asarray(tlev))
        fl = rte_lw(props, src, jnp.asarray(emis))
        out["lw_flux_up"] = np.asarray(fl.flux_up)
        out["lw_flux_dn"] = np.asarray(fl.flux_dn)
    if f.has("solar_zenith_angle"):
        sza = per_var(f.var("solar_zenith_angle")).reshape(n)
        alb = per_var(f.var("surface_albedo")).reshape(n, 1)
        tsi = per_var(f.var("total_solar_irradiance")).reshape(n)
        props, toa = gas_sw.gas_optics_sw(jnp.asarray(play), jnp.asarray(plev),
                                          jnp.asarray(tlay), gas)
        toa = toa * (tsi[:, None] / np.asarray(toa).sum(-1, keepdims=True))
        use = sza < 87.5
        mu0 = jnp.asarray(np.where(use, np.cos(np.deg2rad(sza)), 1.0),
                          jnp.float32)
        fs = rte_sw(props, mu0, jnp.asarray(toa), jnp.asarray(alb),
                    jnp.asarray(alb))
        m = use[:, None]
        out["sw_flux_up"] = np.asarray(fs.flux_up) * m
        out["sw_flux_dn"] = np.asarray(fs.flux_dn) * m
        out["sw_flux_dir"] = np.asarray(fs.flux_dn_dir) * m

    from scipy.io import netcdf_file
    with netcdf_file(args.out, "w") as nc:
        nc.createDimension("col", n)
        nc.createDimension("level", nlay + 1)
        for name, arr in out.items():
            v = nc.createVariable(name, np.float64, ("col", "level"))
            v[:] = arr.astype(np.float64)
    print(f"wrote {args.out}: " + ", ".join(
        f"{k} mean={v.mean():.3f}" for k, v in out.items()))

    if args.solution:
        ref = NCFile(args.solution)
        ok = True
        for name, arr in out.items():
            if ref.has(name):
                ok &= compare_fields(arr, per_var(ref.var(name)), name)
        sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
