"""Can a background thread overlap the axon tunnel's device->host
readback with the next step's compute?

The RFMIP and pod-scale streamed configurations are bounded by the
tunnel's fixed ~25-30 ms round trip + ~100 MB/s link, serialized
against compute in the single-threaded driver loop. If the tunnel
multiplexes concurrent RPCs, moving np.asarray(prev) to a reader
thread recovers the chip rate. Measures, per iteration over K steps:

  serial   — dispatch; np.asarray(out) inline.
  pipeline — dispatch step k+1, then np.asarray(step k) (1-deep,
             single thread; what drivers do today).
  thread   — dispatch step k+1 while a worker thread reads step k.

Run under scripts/tpu_run.py.
"""
import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

np.asarray(jnp.zeros(8) + 1.0)
print("# device ok", flush=True)

from rte_rrtmgp_tpu.drivers.rfmip import rfmip_lw_sw, synthetic_rfmip  # noqa: E402
from rte_rrtmgp_tpu.models.rrtmgp.gas_optics import GasOpticsRRTMGP  # noqa: E402
from rte_rrtmgp_tpu.utils.synthetic import synthetic_kdist  # noqa: E402

K = int(os.environ.get("TO_K", "8"))
REPS = int(os.environ.get("TO_REPS", "4"))

data = synthetic_rfmip(nsite=100, nlay=61, nexp=18)
g_lw = GasOpticsRRTMGP(synthetic_kdist(sw=False, ngpt=256, nbnd=16,
                                       ntemp=14, npres=59))
g_sw = GasOpticsRRTMGP(synthetic_kdist(sw=True, ngpt=224, nbnd=14,
                                       ntemp=14, npres=59))

step = lambda: rfmip_lw_sw(data, g_lw, g_sw, device_out=True)
np.asarray(step())     # warm


def serial():
    for _ in range(K):
        np.asarray(step())


def pipeline():
    prev = None
    for _ in range(K):
        cur = step()
        if prev is not None:
            np.asarray(prev)
        prev = cur
    np.asarray(prev)


def threaded():
    results = []

    def read(x):
        results.append(np.asarray(x))

    t = None
    prev = None
    for _ in range(K):
        cur = step()             # dispatch k (device runs async)
        if t is not None:
            t.join()             # finish reading step k-2
        if prev is not None:
            t = threading.Thread(target=read, args=(prev,))
            t.start()            # read k-1 while k computes
        prev = cur
    if t is not None:
        t.join()
    read(prev)


for name, fn in (("serial", serial), ("pipeline", pipeline),
                 ("thread", threaded)):
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        fn()
        best = min(best, (time.perf_counter() - t0) / K)
    print(json.dumps({"measure": f"tunnel_overlap_{name}",
                      "per_step_ms": round(best * 1e3, 2),
                      "cols_per_s": round(data.ncol / best, 1)}),
          flush=True)
