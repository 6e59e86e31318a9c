"""Reliable timing through the axon async stack: force a host readback.

block_until_ready() through the tunneled backend returns before compute
finishes; np.asarray() of (a slice of) the output forces completion.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np


def _force(out):
    # one readback suffices: the device queue is serial, so the last leaf's
    # data being host-visible implies every enqueued program has finished
    for leaf in reversed(jax.tree_util.tree_leaves(out)):
        if hasattr(leaf, "shape"):
            np.asarray(jax.device_get(leaf.ravel()[-1:]))
            return


def timeit(fn, *args, reps=5, inner=1):
    """Min over reps of (inner chained executions + readback)/inner."""
    out = fn(*args)
    _force(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(inner):
            out = fn(*args)
        _force(out)
        ts.append((time.perf_counter() - t0) / inner)
    return min(ts)
