"""Decompose the RFMIP driver step: device solve time vs readback vs
host-side driver overhead (eligibility checks, dispatch). Run exclusively
on the real chip via scripts/tpu_run.py."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

np.asarray(jnp.zeros(8) + 1.0)
print("# device ok", flush=True)

from rte_rrtmgp_tpu.drivers.rfmip import (_fused_window_ok, _lwsw_solve_fn,
                                          rfmip_lw_sw, synthetic_rfmip)
from rte_rrtmgp_tpu.models.rrtmgp.gas_optics import GasOpticsRRTMGP
from rte_rrtmgp_tpu.utils.synthetic import synthetic_kdist

data = synthetic_rfmip(nsite=100, nlay=61, nexp=18)
g_lw = GasOpticsRRTMGP(synthetic_kdist(sw=False, ngpt=256, nbnd=16,
                                       ntemp=14, npres=59))
g_sw = GasOpticsRRTMGP(synthetic_kdist(sw=True, ngpt=224, nbnd=14,
                                       ntemp=14, npres=59))

print(f"[{time.strftime('%H:%M:%S')}] warmup full driver...", flush=True)
rfmip_lw_sw(data, g_lw, g_sw)

def best(fn, reps=7):
    b = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        b = min(b, time.perf_counter() - t0)
    return b * 1e3

# 1. full driver step
t_full = best(lambda: rfmip_lw_sw(data, g_lw, g_sw))
print(f"full_driver_ms={t_full:.2f}", flush=True)

# 2. host-side eligibility checks alone
t_elig = best(lambda: (_fused_window_ok(g_lw, data.play, True),
                       _fused_window_ok(g_sw, data.play, True)))
print(f"eligibility_ms={t_elig:.2f}", flush=True)

# 3. jitted solve with 1-element force (device time + dispatch, no bulk
# readback)
dev = data.device_inputs()
solve = _lwsw_solve_fn(g_lw, g_sw, True, True, True, 1)
args = (dev["play"], dev["plev"], dev["tlay"], dev["tlev"], dev["sfc_t"],
        dev["sfc_emis"], dev["sfc_alb"], dev["tsi"], dev["sza"],
        dev["gas_concs"])
out = solve(*args)
np.asarray(out.ravel()[-1:])
t_solve = best(lambda: np.asarray(solve(*args).ravel()[-1:]))
print(f"solve_plus_1elem_ms={t_solve:.2f}", flush=True)

# 4. bulk readback of a resident result
out = solve(*args)
out.block_until_ready()
t_read = best(lambda: np.asarray(out))
print(f"bulk_readback_ms={t_read:.2f}  bytes={out.size * 4}", flush=True)

# 5. back-to-back solves, single force at the end (device throughput)
def chain(n=5):
    o = None
    for _ in range(n):
        o = solve(*args)
    np.asarray(o.ravel()[-1:])
t_chain = best(lambda: chain(5)) / 5
print(f"solve_chained_amortized_ms={t_chain:.2f}", flush=True)
