"""Microbenchmark harness for grand-fused SW kernel variants.

SW counterpart of bench_fused_variants.py: builds the bench-size all-sky
SW problem (4096x72, 224 gpt / 14 bands), materializes the exact inputs
the production sw_fused_solve path feeds to ops/pallas/fused_sw.py, then
times the production kernel against variants (scripts/fused_sw_exp.py).

Usage: python scripts/bench_fused_sw_variants.py [variant ...]
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



def build_sw_kernel_inputs(ncol=4096, nlay=72, ngpt=224, nbnd=14,
                           ntemp=14, npres=59):
    """Return (arrays, static) exactly as sw_fused_lanes passes to
    sw_fused_gas_optics_solve, with all arrays concrete on device."""
    from rte_rrtmgp_tpu.drivers.allsky import (_delta_scaled_band,
                                               make_allsky_inputs)
    from rte_rrtmgp_tpu.models.rrtmgp.gas_optics import GasOpticsRRTMGP
    from rte_rrtmgp_tpu.ops.gas_optics_pallas import (_minor_static,
                                                      _minor_tables)
    from rte_rrtmgp_tpu.utils.synthetic import (synthetic_cloud_optics,
                                                synthetic_kdist)

    kd = synthetic_kdist(sw=True, ngpt=ngpt, nbnd=nbnd, ntemp=ntemp,
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

    gc = inputs.gas_concs
    play, plev, tlay = inputs.play, inputs.plev, inputs.tlay
    col_gas, col_dry_w, idx_h2o = gas._col_gas(play, plev, tlay, gc, None)
    play_c, tlay_c = play.T, tlay.T
    col_gas_c = jnp.swapaxes(col_gas, 1, 2)
    col_dry_c = col_dry_w.T
    coeffs = gas._interp(play_c, tlay_c, col_gas_c)
    nflav = coeffs.jeta.shape[1]

    jp = (coeffs.jpress + jnp.where(coeffs.tropo, 0, 1)).astype(dtype)
    rayscale = col_gas_c[idx_h2o] + col_dry_c
    rows = [coeffs.fpress, jp, coeffs.tropo.astype(dtype),
            (1.0 - coeffs.ftemp), coeffs.ftemp, rayscale]
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
    flav_rows = []
    for b in range(nbnd):
        g0 = int(bands[b, 0]) - 1
        flav_rows.extend([int(gflav[0, g0]), int(gflav[1, g0])])
    flav = jnp.asarray(flav_rows, jnp.int32)

    msc, band_minors = _minor_static(coeffs, kd, bands, w, play_c, tlay_c,
                                     col_gas_c, idx_h2o, dtype)
    band_g0 = [int(bands[b, 0]) - 1 for b in range(nbnd)]
    mtab_lo, mtab_up = _minor_tables(kd, dtype)

    cld0 = cld.cloud_optics_lanes(inputs.lwp, inputs.iwp, inputs.rel,
                                  inputs.dei,
                                  interpret=jax.default_backend() == "cpu")
    cloud = _delta_scaled_band(*cld0, dtype)

    mu0 = jnp.broadcast_to(jnp.asarray(inputs.mu0, dtype)[None, :],
                           (nlay, ncol))
    alb = jnp.broadcast_to(inputs.sfc_alb[:, 0][None, :], (ngpt, ncol)
                           ).astype(dtype)
    inc = jnp.broadcast_to(kd.solar_source[:, None], (ngpt, ncol)
                           ).astype(dtype)
    incdif = jnp.zeros_like(inc)

    nlanes = kd.krayl_lane.shape[-1]
    rayl_band = (kd.krayl_lane.reshape(2, 2, nbnd, w, nlanes)
                 .transpose(2, 0, 1, 3, 4).reshape(nbnd, 4 * w, nlanes))

    arrays = dict(flav=flav, desc=desc, msc=msc, table_lane=kd.kmajor_lane,
                  mtab_lo=mtab_lo, mtab_up=mtab_up, rayl_lane=rayl_band,
                  cloud=cloud, mu0=mu0,
                  sfc_alb_dir=alb.reshape(nbnd, w, ncol),
                  sfc_alb_dif=alb.reshape(nbnd, w, ncol),
                  inc=inc.reshape(nbnd, w, ncol),
                  incdif=incdif.reshape(nbnd, w, ncol))
    static = dict(nbnd=nbnd, w=w, nlay=nlay, ncol=ncol, nflav=nflav,
                  ngpt=ngpt, band_minors=tuple(band_minors),
                  band_g0=tuple(band_g0))
    return arrays, static


def main():
    variants = sys.argv[1:] or ["base"]
    arrays, static = build_sw_kernel_inputs()
    arrays = {k: (jax.device_put(v) if hasattr(v, "shape") else v)
              for k, v in arrays.items()}

    from rte_rrtmgp_tpu.ops.pallas.fused_sw import sw_fused_gas_optics_solve

    impls = {"base": sw_fused_gas_optics_solve}
    try:
        import fused_sw_exp
        for name, fn in getattr(fused_sw_exp, "VARIANTS", {}).items():
            impls[name] = fn
    except ImportError:
        pass

    ref = None
    for name in variants:
        fn = impls[name]
        jf = jax.jit(lambda a, fn=fn: fn(
            a["flav"], a["desc"], a["msc"], a["table_lane"], a["mtab_lo"],
            a["mtab_up"], a["rayl_lane"], a["cloud"], a["mu0"],
            a["sfc_alb_dir"], a["sfc_alb_dif"], a["inc"], a["incdif"],
            **static))
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
