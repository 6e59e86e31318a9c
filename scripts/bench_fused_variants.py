"""Microbenchmark harness for grand-fused-kernel variants.

Builds the bench-size all-sky LW problem (4096x72, 256 gpt / 16 bands),
materializes the exact descriptor/table inputs the production
lw_fused_solve path feeds to ops/pallas/fused_lw.py, then times the
production kernel against experimental variants (scripts/fused_lw_exp.py)
on the real chip.

Usage: python scripts/bench_fused_variants.py [variant ...]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from timing import timeit  # noqa: E402

# tiny eager readback: surfaces the axon first-device-op wedge
import numpy as _np  # noqa: E402
_np.asarray(jax.numpy.zeros(8) + 1.0)
print("# device ok", flush=True)



def build_lw_kernel_inputs(ncol=4096, nlay=72, ngpt=256, nbnd=16,
                           ntemp=14, npres=59):
    """Return (kwargs_static, arrays) exactly as lw_fused_lanes passes to
    lw_fused_gas_optics_solve, with all arrays concrete on device."""
    from rte_rrtmgp_tpu.drivers.allsky import make_allsky_inputs
    from rte_rrtmgp_tpu.models.rrtmgp.gas_optics import GasOpticsRRTMGP
    from rte_rrtmgp_tpu.ops.gas_optics_pallas import (_minor_static,
                                                      _minor_tables)
    from rte_rrtmgp_tpu.ops.gas_optics import planck_bands_lanes
    from rte_rrtmgp_tpu.ops.solver_lw import GAUSS_DS, GAUSS_WTS
    from rte_rrtmgp_tpu.utils.synthetic import (synthetic_cloud_optics,
                                                synthetic_kdist)

    kd = synthetic_kdist(sw=False, ngpt=ngpt, nbnd=nbnd, ntemp=ntemp,
                         npres=npres)
    gas = GasOpticsRRTMGP(kd)
    cld = synthetic_cloud_optics(nbnd=nbnd,
                                 band_lims_wvn=kd.grid.band_lims_wvn_array)
    inputs = make_allsky_inputs(ncol, nlay, cloud_optics=cld)

    gflav = np.asarray(kd.gpoint_flavor)
    bands = np.asarray(kd.grid.band_lims_gpt_array)
    w = int(bands[0, 1] - bands[0, 0] + 1)
    dtype = jnp.float32
    neta = kd.neta
    netam1 = neta - 1

    def prep(inputs):
        gc = inputs.gas_concs
        play, plev, tlay, tlev, tsfc = (inputs.play, inputs.plev,
                                        inputs.tlay, inputs.tlev,
                                        inputs.tsfc)
        col_gas, _, idx_h2o = gas._col_gas(play, plev, tlay, gc, None)
        play_c, tlay_c = play.T, tlay.T
        col_gas_c = jnp.swapaxes(col_gas, 1, 2)
        coeffs = gas._interp(play_c, tlay_c, col_gas_c)
        nflav = coeffs.jeta.shape[1]
        jp = (coeffs.jpress + jnp.where(coeffs.tropo, 0, 1)).astype(dtype)
        rows = [coeffs.fpress, jp, coeffs.tropo.astype(dtype),
                (1.0 - coeffs.ftemp), coeffs.ftemp]
        for f in range(nflav):
            for it in range(2):
                rows.append(((coeffs.jtemp + it) * neta
                             + coeffs.jeta[it, f]).astype(dtype))
        for f in range(nflav):
            for it in range(2):
                rows.append(coeffs.feta[it, f])
        for f in range(nflav):
            for it in range(2):
                rows.append(coeffs.col_mix[it, f])
        for f in range(nflav):
            for it in range(2):
                rows.append(((coeffs.jtemp + it) * netam1
                             + coeffs.jeta[it, f]).astype(dtype))
        desc = jnp.stack(rows, 0)
        msc, band_minors = _minor_static(
            coeffs, kd, bands, w, play_c, tlay_c, col_gas_c, idx_h2o, dtype)
        pb = lambda t: planck_bands_lanes(
            t, totplnk=kd.totplnk, totplnk_delta=kd.totplnk_delta,
            temp_ref_min=kd.temp_ref_min)
        # cloud absorption by band, as allsky_step_lw_lanes builds it
        cld_out = cld.cloud_optics_lanes(inputs.lwp, inputs.iwp,
                                         inputs.rel, inputs.dei)
        ct, cts, _ = cld_out
        cld_abs = ct - cts
        emis = jnp.broadcast_to(inputs.sfc_emis.T, (ngpt, ncol)
                                ).astype(dtype)
        inc = jnp.zeros((ngpt, ncol), dtype)
        return (desc, msc, pb(tlay.T), pb(tlev.T), pb(tsfc)[:, None, :],
                tlay.T.astype(dtype), tlev.T.astype(dtype),
                tsfc.astype(dtype),
                emis.reshape(nbnd, w, ncol), inc.reshape(nbnd, w, ncol),
                cld_abs, band_minors)

    # build band_minors statically (trace once non-jitted on abstract...
    # simplest: run prep eagerly; arrays come out concrete)
    (desc, msc, pb_lay, pb_lev, pb_sfc, tlay_c, tlev_c, tsfc_c, emis, inc,
     cld_abs, band_minors) = prep(inputs)

    flav_rows = []
    for b in range(nbnd):
        g0 = int(bands[b, 0]) - 1
        flav_rows.extend([int(gflav[0, g0]), int(gflav[1, g0])])
    flav = jnp.asarray(flav_rows, jnp.int32)
    mtab_lo, mtab_up = _minor_tables(kd, dtype)
    nflav = (desc.shape[0] - 5) // 8

    arrays = dict(flav=flav, desc=desc, msc=msc, table_lane=kd.kmajor_lane,
                  mtab_lo=mtab_lo, mtab_up=mtab_up, pb_lay=pb_lay,
                  pb_lev=pb_lev, pb_sfc=pb_sfc, tlay=tlay_c, tlev=tlev_c,
                  tsfc=tsfc_c, totplnk=kd.totplnk, emis=emis, inc=inc,
                  cloud_tau_abs=cld_abs)
    static = dict(ds=float(GAUSS_DS[0][0]), weight=float(GAUSS_WTS[0][0]),
                  nbnd=nbnd, w=w, nlay=nlay, ncol=ncol, nflav=nflav,
                  band_minors=band_minors)
    static_new = dict(static, tp_min=float(kd.temp_ref_min),
                      tp_delta=float(kd.totplnk_delta))
    return arrays, static, static_new


def main():
    variants = sys.argv[1:] or ["base"]
    arrays, static, static_new = build_lw_kernel_inputs()
    arrays = {k: (jax.device_put(v) if hasattr(v, "shape") else v)
              for k, v in arrays.items()}

    from rte_rrtmgp_tpu.ops.pallas.fused_lw import lw_fused_gas_optics_solve

    # production kernel (in-kernel totplnk planck: tlay/tlev/tsfc args).
    # Experiment variants (scripts/fused_lw_exp.py in git history; findings
    # recorded in docs/PERFORMANCE.md) register here when present.
    impls = {"base": lw_fused_gas_optics_solve}
    try:
        import fused_lw_exp
        for name, fn in getattr(fused_lw_exp, "VARIANTS", {}).items():
            impls[name] = fn
    except ImportError:
        pass

    ref = None
    for name in variants:
        fn = impls[name]
        if name == "base":
            jf = jax.jit(lambda a, fn=fn: fn(
                a["flav"], a["desc"], a["msc"], a["table_lane"],
                a["mtab_lo"], a["mtab_up"], a["tlay"], a["tlev"],
                a["tsfc"], a["totplnk"], a["emis"], a["inc"],
                cloud_tau_abs=a["cloud_tau_abs"], **static_new))
        else:
            # exploration variants predate the in-kernel planck change
            # and take precomputed per-band planck fields
            jf = jax.jit(lambda a, fn=fn: fn(
                a["flav"], a["desc"], a["msc"], a["table_lane"],
                a["mtab_lo"], a["mtab_up"], a["pb_lay"], a["pb_lev"],
                a["pb_sfc"], a["emis"], a["inc"],
                cloud_tau_abs=a["cloud_tau_abs"], **static))
        out = jax.device_get(jf(arrays))
        if name == "base":
            ref = out
        elif ref is not None and name.startswith("v"):
            err = max(np.abs(np.asarray(a) - np.asarray(b)).max()
                      for a, b in zip(out, ref))
            print(f"  {name}: max abs err vs base = {err:.3e}")
        t = timeit(jf, arrays, reps=5, inner=10)
        print(f"{name:30s} {t*1e3:8.3f} ms")


if __name__ == "__main__":
    main()
