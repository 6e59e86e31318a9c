"""Profile breakdown of the all-sky step on the real chip."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timeit(fn, *args, reps=5):
    out = jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    ncol = int(os.environ.get("BENCH_NCOL", "4096"))
    nlay = 72
    from rte_rrtmgp_tpu.drivers.allsky import (allsky_step_lw, allsky_step_sw,
                                               make_allsky_inputs)
    from rte_rrtmgp_tpu.models.rrtmgp.gas_optics import GasOpticsRRTMGP
    from rte_rrtmgp_tpu.utils.synthetic import (synthetic_cloud_optics,
                                                synthetic_kdist)

    kd_lw = synthetic_kdist(sw=False, ngpt=256, nbnd=16, ntemp=14, npres=59)
    kd_sw = synthetic_kdist(sw=True, ngpt=224, nbnd=14, ntemp=14, npres=59)
    gas_lw = GasOpticsRRTMGP(kd_lw)
    gas_sw = GasOpticsRRTMGP(kd_sw)
    cld_lw = synthetic_cloud_optics(nbnd=16, band_lims_wvn=kd_lw.grid.band_lims_wvn_array)
    cld_sw = synthetic_cloud_optics(nbnd=14, band_lims_wvn=kd_sw.grid.band_lims_wvn_array)
    inputs = make_allsky_inputs(ncol, nlay, cloud_optics=cld_lw)

    lw = jax.jit(lambda i: allsky_step_lw(i, gas_lw, cloud_optics=cld_lw))
    sw = jax.jit(lambda i: allsky_step_sw(i, gas_sw, cloud_optics=cld_sw))
    t_lw = timeit(lw, inputs)
    t_sw = timeit(sw, inputs)
    print(f"LW full: {t_lw*1e3:8.2f} ms   SW full: {t_sw*1e3:8.2f} ms")

    # gas optics only
    gc = inputs.gas_concs

    go_lw = jax.jit(lambda i: gas_lw.gas_optics_lw(
        i.play, i.plev, i.tlay, i.tsfc, gc, tlev=i.tlev, top_at_1=True))
    go_sw = jax.jit(lambda i: gas_sw.gas_optics_sw(i.play, i.plev, i.tlay, gc, top_at_1=True))
    t_golw = timeit(go_lw, inputs)
    t_gosw = timeit(go_sw, inputs)
    print(f"LW gasopt: {t_golw*1e3:8.2f} ms   SW gasopt: {t_gosw*1e3:8.2f} ms")

    # solvers only (from precomputed props)
    props_lw, srcs = go_lw(inputs)
    props_sw, toa = go_sw(inputs)
    from rte_rrtmgp_tpu.rte import rte_lw, rte_sw
    from rte_rrtmgp_tpu.config import checks_disabled
    with checks_disabled():
        emis = jnp.full((ncol, 16), 0.98, jnp.float32)
        alb = jnp.full((ncol, 14), 0.06, jnp.float32)
        mu0 = jnp.full((ncol,), 0.86, jnp.float32)
        slv_lw = jax.jit(lambda p, s: rte_lw(p, s, emis))
        slv_sw = jax.jit(lambda p, t: rte_sw(p, mu0, t, alb, alb))
        t_slw = timeit(slv_lw, props_lw, srcs)
        t_ssw = timeit(slv_sw, props_sw, toa)
    print(f"LW solver: {t_slw*1e3:8.2f} ms   SW solver: {t_ssw*1e3:8.2f} ms")


if __name__ == "__main__" and not os.environ.get("PARTS"):
    main()


def parts():
    ncol = int(os.environ.get("BENCH_NCOL", "4096"))
    nlay = 72
    from scripts.timing import timeit as _t
    from rte_rrtmgp_tpu.drivers.allsky import make_allsky_inputs
    from rte_rrtmgp_tpu.models.rrtmgp.gas_optics import GasOpticsRRTMGP
    from rte_rrtmgp_tpu.utils.synthetic import (synthetic_cloud_optics,
                                                synthetic_kdist)
    from rte_rrtmgp_tpu.optical_props import increment, delta_scale

    kd_lw = synthetic_kdist(sw=False, ngpt=256, nbnd=16, ntemp=14, npres=59)
    kd_sw = synthetic_kdist(sw=True, ngpt=224, nbnd=14, ntemp=14, npres=59)
    gas_lw = GasOpticsRRTMGP(kd_lw)
    gas_sw = GasOpticsRRTMGP(kd_sw)
    cld_lw = synthetic_cloud_optics(nbnd=16, band_lims_wvn=kd_lw.grid.band_lims_wvn_array)
    cld_sw = synthetic_cloud_optics(nbnd=14, band_lims_wvn=kd_sw.grid.band_lims_wvn_array)
    inputs = make_allsky_inputs(ncol, nlay, cloud_optics=cld_lw)
    gc = inputs.gas_concs

    t = _t(jax.jit(lambda i: gas_lw.gas_optics_lw(
        i.play, i.plev, i.tlay, i.tsfc, gc, tlev=i.tlev, top_at_1=True)),
        inputs, reps=3, inner=4)
    print(f"LW gasopt full: {t*1e3:8.2f} ms")
    t = _t(jax.jit(lambda i: gas_sw.gas_optics_sw(
        i.play, i.plev, i.tlay, gc, top_at_1=True)), inputs, reps=3, inner=4)
    print(f"SW gasopt full: {t*1e3:8.2f} ms")

    t = _t(jax.jit(lambda i: cld_lw.cloud_optics(
        i.lwp, i.iwp, i.rel, i.dei, scattering=False).tau), inputs,
        reps=3, inner=4)
    print(f"cloud optics LW: {t*1e3:8.2f} ms")
    t = _t(jax.jit(lambda i: cld_sw.cloud_optics(i.lwp, i.iwp, i.rel, i.dei).tau),
           inputs, reps=3, inner=4)
    print(f"cloud optics SW: {t*1e3:8.2f} ms")

    props, _ = jax.jit(lambda i: gas_sw.gas_optics_sw(
        i.play, i.plev, i.tlay, gc, top_at_1=True))(inputs)
    clouds = jax.jit(lambda i: cld_sw.cloud_optics(i.lwp, i.iwp, i.rel, i.dei))(inputs)
    t = _t(jax.jit(lambda p, c: increment(p, delta_scale(c)).tau), props, clouds,
           reps=3, inner=4)
    print(f"delta+increment SW: {t*1e3:8.2f} ms")


if os.environ.get("PARTS"):
    parts()
