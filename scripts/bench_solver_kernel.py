"""Isolate the Pallas solver kernels' cost drivers on the real chip:
input-count scaling (bandwidth) vs nlay scaling (sequential-sweep latency)."""
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.timing import timeit
from rte_rrtmgp_tpu.ops.pallas.solver_lw_kernel import lw_noscat_broadband_lane
from rte_rrtmgp_tpu.ops.pallas.solver_sw_kernel import sw_two_stream_broadband_lane


def main():
    ncol, nlay, ngpt = 4096, 72, 256
    rng = np.random.default_rng(0)
    f = lambda *s: jnp.asarray(rng.uniform(0.1, 1.0, s), jnp.float32)
    tau = f(ncol, nlay, ngpt)
    ssa = f(ncol, nlay, ngpt)
    g = f(ncol, nlay, ngpt)
    lay = f(ncol, nlay, ngpt)
    lev = f(ncol, nlay + 1, ngpt)
    emis = f(ncol, ngpt)
    src = f(ncol, ngpt)
    inc = f(ncol, ngpt)
    mu0 = f(ncol, nlay)

    lw_resc = jax.jit(lambda *a: lw_noscat_broadband_lane(
        *a, ds=1.66, weight=0.5, ssa=ssa, g=g, do_rescaling=True))
    lw_plain = jax.jit(lambda *a: lw_noscat_broadband_lane(
        *a, ds=1.66, weight=0.5))
    t1 = timeit(lw_resc, tau, lay, lev, emis, src, inc, reps=3, inner=4)
    t2 = timeit(lw_plain, tau, lay, lev, emis, src, inc, reps=3, inner=4)
    print(f"LW rescaled (5 inputs, 3 sweeps): {t1*1e3:7.2f} ms")
    print(f"LW plain    (3 inputs, 2 sweeps): {t2*1e3:7.2f} ms")

    sw = jax.jit(lambda *a: sw_two_stream_broadband_lane(*a))
    t3 = timeit(sw, tau, ssa, g, mu0, emis, src, inc, reps=3, inner=4)
    print(f"SW 2-stream (3 inputs, 3 sweeps): {t3*1e3:7.2f} ms")

    # pure streaming floor through pallas: same read traffic as LW rescaled,
    # no sequential sweeps (sum over lay & gpt)
    stream = jax.jit(lambda a, b, c, d, e: (
        a.sum(axis=(1, 2)) + b.sum(axis=(1, 2)) + c.sum(axis=(1, 2))
        + d.sum(axis=(1, 2)) + e.sum(axis=(1, 2))))
    t4 = timeit(stream, tau, ssa, g, lay, lev, reps=3, inner=4)
    gb = 5 * tau.size * 4 / 1e9
    print(f"XLA 5-array reduce (same bytes):  {t4*1e3:7.2f} ms "
          f"({gb/t4:.0f} GB/s)")


if __name__ == "__main__":
    main()
