"""Measure the per-pallas-launch fixed cost INSIDE one jit program.

The ncol-slope decomposition (docs/PERFORMANCE.md round 4) attributes
~3 ms per fused-kernel launch to a column-independent fixed cost. This
isolates how much of that is per-launch overhead (Mosaic prologue +
runtime custom-call entry + any axon per-launch cost) vs the fused
kernels' own fixed XLA wrapper work: chain K DEPENDENT trivial Pallas
kernel launches inside ONE jit and regress time over K (slope = cost
per launch; the kernel body is a single VREG add on an (8, 128) tile,
so the work itself is ~free). A second variant with a ~26 MB resident
VMEM table measures whether re-fetching resident-table blocks adds
per-launch cost.

Prints JSON lines. Run under scripts/tpu_run.py.
"""
import json
import os
import sys


sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

np.asarray(jax.numpy.zeros(8) + 1.0)
print("# device ok", flush=True)

from timing import timeit  # noqa: E402

REPS = int(os.environ.get("LC_REPS", "5"))
INNER = int(os.environ.get("LC_INNER", "5"))
KS = tuple(int(k) for k in os.environ.get("LC_KS", "4,16,64").split(","))
GRID = int(os.environ.get("LC_GRID", "448"))   # match the fused kernels
INTERP = jax.default_backend() == "cpu"        # CPU smoke only


def _trivial_kernel(x_ref, o_ref):
    o_ref[:, :] = x_ref[:, :] + 1.0


def _table_kernel(x_ref, tab_ref, o_ref):
    o_ref[:, :] = x_ref[:, :] + tab_ref[0, :][None, :]


def chain(k, with_table, tab):
    spec = pl.BlockSpec((8, 128), lambda i: (0, 0), memory_space=pltpu.VMEM)

    def launch(x):
        if with_table:
            return pl.pallas_call(
                _table_kernel, grid=(GRID,),
                in_specs=[spec, pl.BlockSpec(tab.shape, lambda i: (0, 0),
                                             memory_space=pltpu.VMEM)],
                out_specs=spec,
                out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
                interpret=INTERP,
            )(x, tab)
        return pl.pallas_call(
            _trivial_kernel, grid=(GRID,), in_specs=[spec], out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            interpret=INTERP)(x)

    @jax.jit
    def f(x):
        for _ in range(k):
            x = launch(x)     # dependent: no overlap between launches
        return x

    return f


def main():
    x = jnp.zeros((8, 128), jnp.float32)
    tab = jnp.ones((26 * 1024 * 1024 // 512, 128), jnp.float32)  # ~26 MB

    for with_table in (False, True):
        times = {}
        for k in KS:
            times[k] = timeit(chain(k, with_table, tab), x,
                              reps=REPS, inner=INNER)
        ks = sorted(times)
        slope = ((times[ks[-1]] - times[ks[0]]) / (ks[-1] - ks[0]))
        print(json.dumps({
            "measure": ("launch_cost_table" if with_table
                        else "launch_cost_trivial"),
            "grid_steps": GRID,
            "times_ms": {str(k): round(t * 1e3, 3)
                         for k, t in times.items()},
            "per_launch_us": round(slope * 1e6, 2)}), flush=True)


if __name__ == "__main__":
    main()
