"""Isolate the in-kernel cross-lane gather cost: cycles per gathered row
as a function of row count and independent-gather ILP.

A single Pallas kernel gathers R rows from a VMEM-resident (R, 128)
table N times per grid step (independent indices -> ILP available),
accumulates, and writes one (8, 128) tile. Sweeping R and N separates
throughput (cost ~ N*R) from latency (cost ~ chain depth).

Usage: python scripts/bench_gather_vreg.py
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from timing import timeit  # noqa: E402

# tiny eager readback: surfaces the axon first-device-op wedge
np.asarray(jax.numpy.zeros(8) + 1.0)
print("# device ok", flush=True)

GRID = 4096     # steps; each does N gathers of R rows


def kern(idx_ref, tab_ref, out_ref, *, rows, n, inner):
    acc = jnp.zeros((rows, 128), tab_ref.dtype)

    def body(i, acc):
        for j in range(n):
            te = (idx_ref[j, :] + i) % 100   # varies per iter: no hoisting
            acc = acc + jnp.take_along_axis(
                tab_ref[:, :],
                jnp.broadcast_to(te[None, :], (rows, 128)), axis=1)
        return acc

    acc = jax.lax.fori_loop(0, inner, body, acc)
    out_ref[:, :] = acc[:8, :]


def run(rows, n, inner=64):
    tab = jnp.asarray(np.random.rand(rows, 128), jnp.float32)
    idx = jnp.asarray(np.random.randint(0, 100, (n, 128)), jnp.int32)

    f = pl.pallas_call(
        functools.partial(kern, rows=rows, n=n, inner=inner),
        grid=(GRID,),
        in_specs=[pl.BlockSpec((n, 128), lambda g: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec(tab.shape, lambda g: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, 128), lambda g: (g, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((GRID * 8, 128), jnp.float32),
    )
    jf = jax.jit(lambda i, t: f(i, t))
    t = timeit(jf, idx, tab, reps=3, inner=3)
    total_rows = GRID * inner * n * rows
    cyc_row = t * 940e6 / total_rows
    print(f"rows={rows:3d} n={n:2d}: {t*1e3:7.3f} ms  "
          f"{cyc_row:6.3f} cyc/row  ({cyc_row*8:6.2f} cyc/VREG)", flush=True)


if __name__ == "__main__":
    for rows in (8, 32, 64):
        for n in (1, 2, 4, 8):
            run(rows, n)
