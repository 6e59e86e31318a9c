"""Honest decomposition: MODE=full|lw|sw (env), one measurement per process."""
import os, sys, time
import faulthandler; faulthandler.dump_traceback_later(240, repeat=True)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

MODE = os.environ.get("MODE", "full")

# tiny eager readback: surfaces the axon first-device-op wedge
import numpy as _np  # noqa: E402
_np.asarray(jax.numpy.zeros(8) + 1.0)
print("# device ok", flush=True)

print(f"[{time.strftime('%H:%M:%S')}] building inputs...", flush=True)

from rte_rrtmgp_tpu.drivers.allsky import (allsky_step_lw, allsky_step_sw,
                                           make_allsky_inputs)
from rte_rrtmgp_tpu.models.rrtmgp.gas_optics import GasOpticsRRTMGP
from rte_rrtmgp_tpu.utils.synthetic import synthetic_cloud_optics, synthetic_kdist

if MODE in ("full", "lw"):
    kd_lw = synthetic_kdist(sw=False, ngpt=256, nbnd=16, ntemp=14, npres=59)
    gas_lw = GasOpticsRRTMGP(kd_lw)
    cld_lw = synthetic_cloud_optics(nbnd=16, band_lims_wvn=kd_lw.grid.band_lims_wvn_array)
if MODE in ("full", "sw"):
    kd_sw = synthetic_kdist(sw=True, ngpt=224, nbnd=14, ntemp=14, npres=59)
    gas_sw = GasOpticsRRTMGP(kd_sw)
    cld_sw = synthetic_cloud_optics(nbnd=14, band_lims_wvn=kd_sw.grid.band_lims_wvn_array)

cld0 = cld_lw if MODE in ("full", "lw") else cld_sw
inputs = make_allsky_inputs(4096, 72, cloud_optics=cld0)
print(f"[{time.strftime('%H:%M:%S')}] inputs ready", flush=True)

if MODE == "full":
    fn = lambda i: (allsky_step_lw(i, gas_lw, cloud_optics=cld_lw)
                    + allsky_step_sw(i, gas_sw, cloud_optics=cld_sw))
elif MODE == "lw":
    fn = lambda i: allsky_step_lw(i, gas_lw, cloud_optics=cld_lw)
else:
    fn = lambda i: allsky_step_sw(i, gas_sw, cloud_optics=cld_sw)

def force(out):
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[-1:]))

jf = jax.jit(fn)
print(f"[{time.strftime('%H:%M:%S')}] compiling/warmup...", flush=True)
out = jf(inputs); force(out)
print(f"[{time.strftime('%H:%M:%S')}] warm; timing...", flush=True)
ts = []
for _ in range(6):
    t0 = time.perf_counter()
    for _ in range(10):
        out = jf(inputs)
    force(out)
    ts.append((time.perf_counter() - t0) / 10)
print(f"MODE={MODE}: {min(ts)*1e3:.2f} ms", flush=True)
