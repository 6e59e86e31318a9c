"""Standalone fused LW kernel: chained dispatch vs on-device fori_loop.
Localizes whether the per-call gap is specific to Pallas custom calls."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__))))
from bench_fused_variants import build_lw_kernel_inputs
from rte_rrtmgp_tpu.ops.pallas.fused_lw import lw_fused_gas_optics_solve

arrays, static, static_new = build_lw_kernel_inputs()
arrays = {k: jax.device_put(v) if hasattr(v, "shape") else v
          for k, v in arrays.items()}

def call(a):
    return lw_fused_gas_optics_solve(
        a["flav"], a["desc"], a["msc"], a["table_lane"], a["mtab_lo"],
        a["mtab_up"], a["tlay"], a["tlev"], a["tsfc"], a["totplnk"],
        a["emis"], a["inc"], cloud_tau_abs=a["cloud_tau_abs"],
        **static_new)

def force(out):
    np.asarray(jax.device_get(out[0].ravel()[-1:]))

INNER = 10
jf = jax.jit(call)
out = jf(arrays); force(out)
ts = []
for _ in range(6):
    t0 = time.perf_counter()
    for _ in range(INNER):
        out = jf(arrays)
    force(out)
    ts.append((time.perf_counter() - t0) / INNER)
print(f"fused LW chained:   {min(ts)*1e3:.2f} ms/call", flush=True)

def body(i, carry):
    s, acc = carry
    a = dict(arrays)
    a["tlay"] = arrays["tlay"] + s * 0.0
    o = call(a)
    return (o[0].ravel()[0] * 0.0, acc + o[0].ravel()[-1])

@jax.jit
def loopN(s0):
    return jax.lax.fori_loop(0, INNER, body, (s0, jnp.float32(0.0)))

r = loopN(jnp.float32(0.0)); force((r[1][None],))
ts = []
for _ in range(6):
    t0 = time.perf_counter()
    r = loopN(jnp.float32(0.0))
    force((r[1][None],))
    ts.append((time.perf_counter() - t0) / INNER)
print(f"fused LW on-device: {min(ts)*1e3:.2f} ms/call", flush=True)
