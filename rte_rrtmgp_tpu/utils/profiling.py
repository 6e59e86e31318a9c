"""Tracing, timing, and roofline accounting.

The reference's only instrumentation is a system_clock loop in the all-sky
driver (examples/all-sky/rrtmgp_allsky.F90:329-419). On TPU the framework
provides first-class observability (SURVEY.md section 5):

  * :func:`trace` — jax.profiler trace context for TensorBoard/XProf.
  * :func:`benchmark` — robust wall-clock timing through asynchronous
    dispatch (forces a device->host readback to close each measurement).
  * :func:`roofline` — bytes/flops model of the radiation step and the
    fraction of a device's peak HBM bandwidth achieved (the driver-set
    kernel-efficiency target is >= 80% of the bandwidth roofline).
"""
from __future__ import annotations

import contextlib
import dataclasses
import time
from typing import Callable, Optional

import jax
import numpy as np

__all__ = ["trace", "benchmark", "BenchResult", "roofline", "step_bytes"]


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace context (view with TensorBoard / xprof)."""
    with jax.profiler.trace(log_dir):
        yield


def _force(out):
    for leaf in reversed(jax.tree_util.tree_leaves(out)):
        if hasattr(leaf, "shape"):
            np.asarray(jax.device_get(leaf.ravel()[-1:]))
            return


@dataclasses.dataclass
class BenchResult:
    times_s: list
    ncol: int

    @property
    def t_min(self):
        return min(self.times_s)

    @property
    def t_total(self):
        return sum(self.times_s)

    @property
    def cols_per_s(self):
        return self.ncol / self.t_min

    def table(self) -> str:
        return (f"time_per_col={self.t_min / self.ncol * 1e6:.3f} us  "
                f"min={self.t_min * 1e3:.2f} ms  total={self.t_total:.3f} s  "
                f"columns/s={self.cols_per_s:.1f}")


def benchmark(fn: Callable, *args, ncol: int, reps: int = 10) -> BenchResult:
    """Time a jitted step. block_until_ready alone can return before the
    device finishes on asynchronous backends, so each rep ends with a
    one-element readback of the last output leaf."""
    out = fn(*args)
    _force(out)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        _force(out)
        times.append(time.perf_counter() - t0)
    return BenchResult(times_s=times, ncol=ncol)


def step_bytes(ncol: int, nlay: int, ngpt_lw: int = 256, ngpt_sw: int = 224,
               dtype_bytes: int = 4, lw: bool = True, sw: bool = True) -> int:
    """Minimum HBM traffic model for one all-sky step: the table values the
    correlated-k interpolation must fetch (8 corners per cell per g-point
    per table) plus one write and one read of each spectral field the
    solver consumes, plus broadband outputs. Deliberately a LOWER bound —
    real executions add intermediates."""
    cells = ncol * nlay
    total = 0
    if lw:
        gather = cells * 8 * ngpt_lw * 2 * dtype_bytes      # kmajor + planck
        fields = cells * ngpt_lw * dtype_bytes
        total += gather + 5 * 2 * fields                    # tau,lay,lev r+w
        total += ncol * (nlay + 1) * 2 * dtype_bytes        # broadband out
    if sw:
        gather = cells * 8 * ngpt_sw * dtype_bytes          # kmajor
        gather += cells * 4 * ngpt_sw * dtype_bytes         # rayleigh
        fields = cells * ngpt_sw * dtype_bytes
        total += gather + 3 * 2 * fields                    # tau,ssa,g r+w
        total += ncol * (nlay + 1) * 3 * dtype_bytes
    return total


def roofline(result: BenchResult, nlay: int, *,
             hbm_bandwidth_gbs: Optional[float] = None, **kw) -> dict:
    """Achieved fraction of the HBM-bandwidth roofline for an all-sky step.
    ``hbm_bandwidth_gbs`` defaults to a v5e-class 819 GB/s; pass the
    measured streaming bandwidth of the actual part for honest numbers."""
    bw = hbm_bandwidth_gbs or 819.0
    nbytes = step_bytes(result.ncol, nlay, **kw)
    achieved = nbytes / result.t_min / 1e9
    return {
        "model_bytes": nbytes,
        "achieved_gbs": achieved,
        "roofline_gbs": bw,
        "roofline_fraction": achieved / bw,
        "time_s": result.t_min,
    }
