"""Does the minor-group tropopause skip actually eliminate work?

Times the standalone fused SW kernel three ways at 4096x72:
  base     — the real atmosphere (65 lower / 7 upper layers),
  allupper — desc tropo row forced to 0 (every layer upper): all 16
             LOWER members should be skipped at every layer,
  nominors — band_minors=() (the floor).

If pl.when-on-SMEM-scalar really branches, allupper ~= base - ~16/28
of the minor cost. If allupper ~= base, the predication executes the
gathers anyway and the skip needs a different mechanism.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from timing import timeit  # noqa: E402

np.asarray(jnp.zeros(8) + 1.0)
print("# device ok", flush=True)

from bench_fused_sw_variants import build_sw_kernel_inputs  # noqa: E402
from rte_rrtmgp_tpu.ops.pallas.fused_sw import sw_fused_gas_optics_solve

arrays, static = build_sw_kernel_inputs(ncol=4096, nlay=72)
arrays = {k: jax.device_put(v) for k, v in arrays.items()}

desc_allup = arrays["desc"].at[2].set(0.0)

variants = {
    "base": (arrays["desc"], static["band_minors"]),
    "allupper": (desc_allup, static["band_minors"]),
    "nominors": (arrays["desc"], ()),
}
for name, (desc, bm) in variants.items():
    st = dict(static, band_minors=bm)
    jf = jax.jit(lambda a, desc=desc, st=st: sw_fused_gas_optics_solve(
        a["flav"], desc, a["msc"], a["table_lane"], a["mtab_lo"],
        a["mtab_up"], a["rayl_lane"], a["cloud"], a["mu0"],
        a["sfc_alb_dir"], a["sfc_alb_dif"], a["inc"], a["incdif"], **st))
    t = timeit(jf, arrays, reps=5, inner=10)
    print(f"{name:10s} {t * 1e3:8.3f} ms", flush=True)
