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

__all__ = ["trace", "benchmark", "BenchResult", "roofline", "step_bytes",
           "vpu_cycle_budget"]


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


def vpu_cycle_budget(ncol: int, nlay: int, t_min_s: float, *,
                     nbnd_lw: int = 16, w_lw: int = 16,
                     nbnd_sw: int = 14, w_sw: int = 16,
                     n_minor_members: int = 28,
                     clock_ghz: Optional[float] = None,
                     gather_cyc_per_row: float = 2.0,
                     ew_cyc_per_vreg: float = 1.0,
                     trans_cyc_per_vreg: float = 8.0) -> dict:
    """VPU cycle-budget model for the fused all-sky LW+SW step — the
    MFU-equivalent for this VPU-bound workload.

    The fused kernels (ops/pallas/fused_lw.py, fused_sw.py) are
    gather/VPU-bound, not HBM-bound (the spectral fields never leave
    VMEM), so a bandwidth roofline measures a counterfactual. This model
    instead counts the arithmetic the kernels MUST issue per
    (128-column block, band, layer) grid cell and converts it to cycles:

      * cross-lane gathers at ``gather_cyc_per_row`` cycles per gathered
        (1, 128) row (measured ~2 on this part — docs/PERFORMANCE.md
        "the cross-lane gathers cost ~2 cycles per ROW"),
      * elementwise vector ops at ``ew_cyc_per_vreg`` cycles per
        (8, 128)-f32 VREG (single-issue — conservative),
      * transcendentals (exp/div/sqrt) at ``trans_cyc_per_vreg``.

    Op counts below were tallied from the kernel sources (fp-uniform
    fast path — the production/bench regime with shared pressure grids):

    LW per (block, band, layer), w = 16 g-points, ntw = 2w payload rows
    (tau + Planck fraction):
      gathers  : pre-lerped slab2 -> 2 itemp x 2 (g0, g1) x ntw rows
                 = 4*ntw = 128 rows; plus in-kernel totplnk Planck lookup
                 ~2 row-groups x (lo, hi) x 3 calls ~= 12 rows/layer
      VREG ops : slab2 pre-lerp 12 + per-itemp lerp/combine ~44 + writes
                 4 ~= 60; transport+Planck-combine ~= 60
      transc.  : exp(transport) + div(fact) + sqrt(lev pfrac) on
                 2-VREG tiles = 3 x 2
    SW per (block, band, layer), ntw = w (tau-only payload):
      gathers  : major 4*w = 64 rows + Rayleigh single-atmosphere path
                 2 itemp x (lo, hi) x w = 64 rows
      VREG ops : major ~46 + rayleigh ~16 + combine/cloud ~24 +
                 two-stream/adding ~90 ~= 176
      transc.  : 2 exp + 2 div + 1 sqrt (Meador-Weaver + beam) x 2 VREGs
    Minor gases (both domains): ``n_minor_members`` interval instances
    (28 for the production-shaped synthetic k-distributions; the real
    g256/g224 files carry comparable counts), each costing per layer
    4*w gathered rows + ~26 VREG ops in its band's grid step.

    ``clock_ghz`` defaults to env BENCH_VPU_GHZ or 0.94 (v5e class);
    override with the measured value from scripts/bench_calibrate.py.
    Returns a dict of model fields including ``vpu_utilization`` =
    model-time / measured-time (measured time includes descriptor prep,
    transposes, and dispatch, so this is a lower bound on true kernel
    utilization)."""
    import os
    if clock_ghz is None:
        clock_ghz = float(os.environ.get("BENCH_VPU_GHZ", "0.94"))
    blocks = -(-ncol // 128)
    vreg = lambda rows: rows / 8.0          # (rows, 128) f32 -> VREGs

    # --- LW per (block, band, layer) ---
    ntw_lw = 2 * w_lw
    lw_gather_rows = 4 * ntw_lw + 12
    # 60 major + 60 transport ops, each on a (w, 128) = w/8-VREG tile
    lw_ew_vregs = (60 + 60) * vreg(w_lw)
    lw_trans_vregs = 3 * vreg(w_lw)
    lw_layer_cyc = (lw_gather_rows * gather_cyc_per_row
                    + lw_ew_vregs * ew_cyc_per_vreg
                    + lw_trans_vregs * trans_cyc_per_vreg)

    # --- SW per (block, band, layer) ---
    sw_gather_rows = 4 * w_sw + 4 * w_sw
    sw_ew_vregs = 176 * vreg(w_sw)
    sw_trans_vregs = 5 * vreg(w_sw)
    sw_layer_cyc = (sw_gather_rows * gather_cyc_per_row
                    + sw_ew_vregs * ew_cyc_per_vreg
                    + sw_trans_vregs * trans_cyc_per_vreg)

    # --- minors, amortized over the whole domain (both LW and SW) ---
    minor_layer_cyc = (4 * 16 * gather_cyc_per_row
                       + 26 * vreg(16) * ew_cyc_per_vreg)
    minors_cyc = 2 * n_minor_members * blocks * nlay * minor_layer_cyc

    total_cyc = (blocks * nlay
                 * (nbnd_lw * lw_layer_cyc + nbnd_sw * sw_layer_cyc)
                 + minors_cyc)
    model_t = total_cyc / (clock_ghz * 1e9)
    return {
        "vpu_model_cycles": int(total_cyc),
        "vpu_model_lw_cycles_per_layer_block": round(lw_layer_cyc, 1),
        "vpu_model_sw_cycles_per_layer_block": round(sw_layer_cyc, 1),
        "vpu_clock_ghz": clock_ghz,
        "vpu_model_time_ms": round(model_t * 1e3, 2),
        "vpu_utilization": round(model_t / t_min_s, 4),
    }


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
