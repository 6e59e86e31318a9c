"""Device-trace the full all-sky step and print a per-op time summary.

Captures a jax.profiler perfetto trace of N chained steps on the real
chip, then aggregates device-track slice durations by op name so the
XLA glue around the fused kernels is visible.

Usage: python scripts/trace_step.py [outdir]   (env BENCH_NCOL, MODE)
"""
import collections
import glob
import gzip
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

np.asarray(jax.numpy.zeros(8) + 1.0)
print(f"# [{time.strftime('%H:%M:%S')}] device ok", flush=True)

ncol = int(os.environ.get("BENCH_NCOL", "4096"))
nlay = 72
MODE = os.environ.get("MODE", "full")
outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jax_trace"

from rte_rrtmgp_tpu.drivers.allsky import (allsky_step_lw, allsky_step_sw,
                                           make_allsky_inputs)
from rte_rrtmgp_tpu.models.rrtmgp.gas_optics import GasOpticsRRTMGP
from rte_rrtmgp_tpu.utils.synthetic import (synthetic_cloud_optics,
                                            synthetic_kdist)

kd_lw = synthetic_kdist(sw=False, ngpt=256, nbnd=16, ntemp=14, npres=59)
kd_sw = synthetic_kdist(sw=True, ngpt=224, nbnd=14, ntemp=14, npres=59)
gas_lw = GasOpticsRRTMGP(kd_lw)
gas_sw = GasOpticsRRTMGP(kd_sw)
cld_lw = synthetic_cloud_optics(nbnd=16,
                                band_lims_wvn=kd_lw.grid.band_lims_wvn_array)
cld_sw = synthetic_cloud_optics(nbnd=14,
                                band_lims_wvn=kd_sw.grid.band_lims_wvn_array)
inputs = make_allsky_inputs(ncol, nlay, cloud_optics=cld_lw)

if MODE == "lw":
    fn = lambda i: allsky_step_lw(i, gas_lw, cloud_optics=cld_lw)
elif MODE == "sw":
    fn = lambda i: allsky_step_sw(i, gas_sw, cloud_optics=cld_sw)
else:
    fn = lambda i: (allsky_step_lw(i, gas_lw, cloud_optics=cld_lw)
                    + allsky_step_sw(i, gas_sw, cloud_optics=cld_sw))
jf = jax.jit(fn)


def force(out):
    np.asarray(jax.device_get(
        jax.tree_util.tree_leaves(out)[0].ravel()[-1:]))


print(f"# [{time.strftime('%H:%M:%S')}] compiling/warmup...", flush=True)
out = jf(inputs)
force(out)
print(f"# [{time.strftime('%H:%M:%S')}] warm; tracing...", flush=True)

N = 5
with jax.profiler.trace(outdir, create_perfetto_trace=True):
    for _ in range(N):
        out = jf(inputs)
    force(out)

print(f"# [{time.strftime('%H:%M:%S')}] parsing...", flush=True)
paths = sorted(glob.glob(os.path.join(outdir, "**", "*.trace.json.gz"),
                         recursive=True), key=os.path.getmtime)
path = paths[-1]
with gzip.open(path, "rt") as f:
    tr = json.load(f)

events = tr["traceEvents"]
pids = {}
for e in events:
    if e.get("ph") == "M" and e.get("name") == "process_name":
        pids[e["pid"]] = e["args"].get("name", "")

# device tracks: TPU core compute lanes
dev_pids = {p for p, n in pids.items()
            if "TPU" in n.upper() or "/device" in n.lower()}
agg = collections.Counter()
total = 0.0
for e in events:
    if e.get("ph") != "X" or e.get("pid") not in dev_pids:
        continue
    name = e.get("name", "?")
    dur = e.get("dur", 0) / 1e3 / N  # us -> ms, per step
    agg[name] += dur
    total += dur
print(f"pids: { {p: n for p, n in pids.items()} }")
print(f"device busy: {total:.2f} ms/step over {len(agg)} distinct ops")
for name, ms in agg.most_common(40):
    print(f"  {ms:8.3f} ms  {name[:110]}")
