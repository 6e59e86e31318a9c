"""Stage-by-stage timing of the RRTMGP gas-optics pipeline on TPU."""
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


from scripts.timing import timeit as _t


def timeit(fn, *args):
    return _t(fn, *args, reps=3, inner=4)


def main():
    ncol, nlay = 4096, 72
    from rte_rrtmgp_tpu.drivers.allsky import make_allsky_inputs
    from rte_rrtmgp_tpu.models.rrtmgp.gas_optics import GasOpticsRRTMGP
    from rte_rrtmgp_tpu.utils.synthetic import synthetic_kdist
    from rte_rrtmgp_tpu.ops.gas_optics import (tau_major, tau_minor,
                                               tau_rayleigh, planck_sources)

    kd = synthetic_kdist(sw=False, ngpt=256, nbnd=16, ntemp=14, npres=59)
    go = GasOpticsRRTMGP(kd)
    inputs = make_allsky_inputs(ncol, nlay)
    gc = inputs.gas_concs

    colgas_f = jax.jit(lambda i: go._col_gas(i.play, i.plev, i.tlay, gc, None)[:2])
    t = timeit(colgas_f, inputs)
    print(f"col_gas:      {t*1e3:8.2f} ms")
    col_gas, col_dry = colgas_f(inputs)
    idx_h2o = kd.idx_gas("h2o")

    interp_f = jax.jit(lambda i, cg: go._interp(i.play, i.tlay, cg))
    t = timeit(interp_f, inputs, col_gas)
    print(f"interp:       {t*1e3:8.2f} ms")
    coeffs = interp_f(inputs, col_gas)

    major_f = jax.jit(lambda c: tau_major(
        c, kd.kmajor_x, gpoint_flavor=kd.gpoint_flavor,
        band_lims_gpt=kd.grid.band_lims_gpt_array))
    t = timeit(major_f, coeffs)
    print(f"tau_major(+planck): {t*1e3:8.2f} ms")
    tau, pfrac = major_f(coeffs)

    for lower, mset, ktab, nm in ((True, kd.minor_lower, kd.kminor_lower, "lo"),
                                  (False, kd.minor_upper, kd.kminor_upper, "up")):
        ktab_x = kd.kminor_lower_x if lower else kd.kminor_upper_x
        minor_f = jax.jit(lambda tt, c, i, cg, ktab=ktab_x, lower=lower, mset=mset: tau_minor(
            tt, c, ktab, lower=lower,
            minor_limits_gpt=mset.limits_gpt,
            kminor_start=mset.kminor_start,
            idx_minor=mset.idx_minor,
            idx_minor_scaling=mset.idx_minor_scaling,
            minor_scales_with_density=mset.scales_with_density,
            scale_by_complement=mset.scale_by_complement,
            minor_flavor=mset.flavor,
            play=i.play, tlay=i.tlay, col_gas=cg, idx_h2o=idx_h2o))
        t = timeit(minor_f, tau, coeffs, inputs, col_gas)
        print(f"tau_minor {nm}: {t*1e3:8.2f} ms  ({len(mset.kminor_start)} gases)")

    planck_f = jax.jit(lambda p, i: planck_sources(
        p, totplnk=kd.totplnk,
        totplnk_delta=kd.totplnk_delta, temp_ref_min=kd.temp_ref_min,
        gpt2band=kd.grid.gpt2band,
        tlay=i.tlay, tlev=i.tlev, tsfc=i.tsfc, top_at_1=True))
    t = timeit(planck_f, pfrac, inputs)
    print(f"planck(rest): {t*1e3:8.2f} ms")

    kd_sw = synthetic_kdist(sw=True, ngpt=224, nbnd=14, ntemp=14, npres=59)
    go_sw = GasOpticsRRTMGP(kd_sw)
    coeffs_sw = jax.jit(lambda i, cg: go_sw._interp(i.play, i.tlay, cg))(inputs, col_gas)
    rayl_f = jax.jit(lambda c, cg, cd: tau_rayleigh(
        c, kd_sw.krayl_x, gpoint_flavor=kd_sw.gpoint_flavor,
        band_lims_gpt=kd_sw.grid.band_lims_gpt_array,
        col_gas=cg, col_dry=cd, idx_h2o=idx_h2o))
    t = timeit(rayl_f, coeffs_sw, col_gas, col_dry)
    print(f"tau_rayleigh: {t*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
