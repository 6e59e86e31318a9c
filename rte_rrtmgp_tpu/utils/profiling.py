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
                     minor_active_frac: float = 1.0,
                     gather_rows_per_s: Optional[float] = None,
                     vreg_ops_per_s: Optional[float] = None,
                     exp_vregs_per_s: Optional[float] = None,
                     div_vregs_per_s: Optional[float] = None) -> dict:
    """Audited VPU floor model for the fused all-sky LW+SW step — the
    MFU-equivalent for this VPU-bound workload.

    The fused kernels (ops/pallas/fused_lw.py, fused_sw.py) are
    gather/VPU-bound, not HBM-bound (the spectral fields never leave
    VMEM), so a bandwidth roofline measures a counterfactual. This model
    counts the work the kernels MUST issue per (128-column block, band,
    layer) grid cell and divides by MEASURED primitive throughputs
    (scripts/bench_calibrate_audit.py on the real chip 2026-08-19,
    recorded in docs/PERFORMANCE.md "Calibration audit"; overridable via
    env BENCH_RATE_GATHER / BENCH_RATE_VREG / BENCH_RATE_EXP /
    BENCH_RATE_DIV):

      * cross-lane gathers at 8.25e8 rows/s — the ILP-rich kernel-shaped
        microbenchmark (4 independent te/te+1 gather-pair + eta-lerp
        chains, the exact pres_of_it pattern with the instruction-level
        parallelism the kernels' independent layers expose). The rate
        FOLDS IN the eta-lerp fmas issued per gather pair, so those ops
        are excluded from the elementwise tallies below,
      * elementwise vector ops at 1.224e9 (8, 128)-f32 VREG-ops/s,
      * exp at 1.171e9 and divide (and sqrt) at 3.803e8 VREG-ops/s.

    Op counts re-tallied from the kernel sources (round-4 audit;
    fp-uniform fast path + single-atmosphere Rayleigh tcode path — the
    production/bench regime with shared pressure grids); eta-lerp fmas
    excluded per the gather-rate convention:

    LW per (block, band, layer), w=16 g-points, ntw=2w payload rows
    (tau + Planck fraction gathered together, fused_lw.py:145-197):
      gathers : 2 itemp x (te, te+1) x ntw rows = 128, plus the
                in-kernel totplnk lookup amortized ~6 rows/layer
      VREG ops: slab2 pre-lerp 12 + col_mix combine 16 + Planck-source/
                transport elementwise ~38 + fact chain 14 + transport
                recurrences 4 + broadband 4 ~= 88
      transc. : exp 2 + div 4 (incl. sqrt at the div rate)
    SW per (block, band, layer), ntw = w (tau-only payload,
    fused_sw.py + solver_lanes._sw_body_lm):
      gathers : major 4*w = 64 + Rayleigh single-atmosphere 4*w = 64
      VREG ops: slab2 6 + combine 10 + rayleigh-scale 14 +
                combine_abs_and_rayleigh/cloud ~35 + Meador-Weaver/PIFM
                ~130 + adding recurrences 34 + broadband 6 ~= 239
      transc. : exp 4 + div 12 (incl. sqrt)
    Minor gases: ``n_minor_members`` interval instances per domain
    (28 at the production synthetic shapes, LW and SW each), each per
    (block, layer): 4*w gathered rows + ~6 VREG ops, scaled by
    ``minor_active_frac`` — the fraction of (member, layer) pairs on
    their own side of the tropopause (the kernels SKIP whole minor
    groups on layers entirely in the other atmosphere; pass the
    profile-derived fraction, bench.py computes it from the pressure
    grid).

    Validation (docs/PERFORMANCE.md "audited ceiling", measured
    2026-08-19 pre-skip): model LW 14.4 ms vs standalone kernel
    14.55 ms (99%); model SW 17.8 ms vs 19.97 ms (89%) — the counts and
    rates agree with the independent nlay-slope measurements well
    within the 20% audit gate. Returns ``vpu_utilization`` = floor-time
    / measured-time, a true (0, 1] utilization (measured time
    additionally includes descriptor prep, transposes, and dispatch)."""
    import os
    g_rate = gather_rows_per_s or float(
        os.environ.get("BENCH_RATE_GATHER", "8.25e8"))
    v_rate = vreg_ops_per_s or float(
        os.environ.get("BENCH_RATE_VREG", "1.224e9"))
    e_rate = exp_vregs_per_s or float(
        os.environ.get("BENCH_RATE_EXP", "1.171e9"))
    d_rate = div_vregs_per_s or float(
        os.environ.get("BENCH_RATE_DIV", "3.803e8"))
    blocks = -(-ncol // 128)
    cells = blocks * nlay

    def t(rows, vregs, exps, divs):
        return (rows / g_rate + vregs / v_rate + exps / e_rate
                + divs / d_rate)

    # --- per (block, band, layer) floors ---
    lw_layer = t(4 * (2 * w_lw) + 6, 88, 2, 4)
    sw_layer = t(8 * w_sw, 239, 4, 12)
    minor_layer = t(4 * 16, 6, 0, 0) * minor_active_frac

    lw_t = (cells * nbnd_lw * lw_layer
            + n_minor_members * cells * minor_layer)
    sw_t = (cells * nbnd_sw * sw_layer
            + n_minor_members * cells * minor_layer)
    model_t = lw_t + sw_t
    return {
        "vpu_model_time_ms": round(model_t * 1e3, 2),
        "vpu_model_lw_ms": round(lw_t * 1e3, 2),
        "vpu_model_sw_ms": round(sw_t * 1e3, 2),
        "vpu_minor_active_frac": round(minor_active_frac, 3),
        "vpu_rate_gather_rows_per_s": g_rate,
        "vpu_rate_vreg_ops_per_s": v_rate,
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
