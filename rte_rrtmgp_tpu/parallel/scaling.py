"""Weak-scaling harness and the pod-scale all-sky configuration.

The reference scales by host-managed column blocking on one process
(SURVEY.md section 2.9); the TPU framework scales the column axis over a
device mesh. This module provides:

  * :func:`weak_scaling` — columns/s at 1 device vs N devices with
    columns-per-device held fixed, reporting scaling efficiency (the
    driver-set target is >= 90% on a multi-host v5p slice). Runs on any
    backend, including the 8-virtual-device CPU mesh used in CI.
  * :func:`podscale_allsky` — the 10M-column all-sky configuration:
    shards columns over every device (multi-host aware), processes them in
    per-device chunks to bound HBM, and reports aggregate columns/s.

Multi-host use: call jax.distributed.initialize() first; each process
feeds its local column shard (mesh.local_devices), coordination rides DCN,
the solve itself needs no collectives.
"""
from __future__ import annotations

import time
from typing import Callable, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import COLUMNS, column_mesh, shard_map_columns

__all__ = ["weak_scaling", "podscale_allsky"]


def _force(out):
    for leaf in reversed(jax.tree_util.tree_leaves(out)):
        if hasattr(leaf, "shape"):
            np.asarray(jax.device_get(leaf.ravel()[-1:]))
            return


def _time_step(step, inputs, reps):
    out = step(inputs)
    _force(out)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = step(inputs)
        _force(out)
        times.append(time.perf_counter() - t0)
    return min(times)


def _shard_cols(tree, mesh, ncol):
    """Shard arrays with a leading column axis of size ncol; other
    leaves pass through. Multi-process runs assemble the global array
    from each process's local block (mesh.shard_columns semantics — a
    plain device_put would raise on non-addressable devices there)."""
    def place(x):
        if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == ncol:
            sh = NamedSharding(mesh, P(COLUMNS, *([None] * (x.ndim - 1))))
            if jax.process_count() > 1:
                return jax.make_array_from_process_local_data(
                    sh, np.asarray(x))
            return jax.device_put(x, sh)
        return x
    return jax.tree_util.tree_map(place, tree)


def weak_scaling(make_inputs: Callable[[int], object],
                 step: Callable, *, cols_per_device: int,
                 reps: int = 5, devices=None) -> dict:
    """Weak scaling: fixed columns/device, 1 device vs all devices.

    make_inputs(ncol) builds the (host) input pytree; step is the jittable
    per-step function taking that pytree. Returns columns/s at each scale
    and the efficiency ratio.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)

    # single device (shard_map so the Pallas paths run per shard —
    # GSPMD cannot partition custom calls)
    inputs1 = make_inputs(cols_per_device)
    mesh1 = Mesh(np.asarray(devices[:1]), (COLUMNS,))
    step1 = jax.jit(shard_map_columns(step, mesh1, cols_per_device))
    t1 = _time_step(step1, _shard_cols(inputs1, mesh1, cols_per_device),
                    reps)
    rate1 = cols_per_device / t1

    # all devices
    ncol_n = cols_per_device * n
    inputs_n = make_inputs(ncol_n)
    mesh_n = Mesh(np.asarray(devices), (COLUMNS,))
    step_n = jax.jit(shard_map_columns(step, mesh_n, ncol_n))
    t_n = _time_step(step_n, _shard_cols(inputs_n, mesh_n, ncol_n), reps)
    rate_n = ncol_n / t_n

    return {
        "n_devices": n,
        "cols_per_device": cols_per_device,
        "cols_per_s_1dev": rate1,
        "cols_per_s_ndev": rate_n,
        "efficiency": rate_n / (rate1 * n),
    }


def podscale_allsky(total_columns: int = 10_000_000, nlay: int = 72,
                    *, chunk_cols_per_device: Optional[int] = None,
                    ngpt_lw: int = 256, nbnd_lw: int = 16,
                    ngpt_sw: int = 224, nbnd_sw: int = 14,
                    ntemp: int = 14, npres: int = 59,
                    reps_per_chunk: int = 1, stream: bool = True,
                    host_pool: int = 2, verbose: bool = True) -> dict:
    """The 10M-column all-sky configuration (BASELINE.md): shard columns
    over every device in the process group and stream through the total in
    chunks sized to HBM. Returns aggregate columns/s and per-chunk stats.

    ``stream=True`` (default) is the honest pod-scale regime: every
    chunk's input fields are HOST numpy arrays uploaded to the device(s)
    during the run, double-buffered — chunk k+1's host->device transfer
    is enqueued before chunk k's solve is awaited, so the upload rides
    under the compute (async dispatch; the transfer engine runs
    concurrently with the kernels). ``stream=False`` reuses one
    device-resident chunk, measuring the pure compute rate with no input
    traffic (the round-3 behavior — kept for apples-to-apples
    comparisons and documented as such)."""
    from ..drivers.allsky import (allsky_step_lw, allsky_step_sw,
                                  make_allsky_inputs)
    from ..models.rrtmgp.gas_optics import GasOpticsRRTMGP
    from ..utils.synthetic import synthetic_cloud_optics, synthetic_kdist

    mesh = column_mesh()
    n_dev = len(mesh.devices.ravel())
    if chunk_cols_per_device is None:
        chunk_cols_per_device = 4096
    chunk = chunk_cols_per_device * n_dev
    n_chunks = -(-total_columns // chunk)

    kd_lw = synthetic_kdist(sw=False, ngpt=ngpt_lw, nbnd=nbnd_lw,
                            ntemp=ntemp, npres=npres)
    kd_sw = synthetic_kdist(sw=True, ngpt=ngpt_sw, nbnd=nbnd_sw,
                            ntemp=ntemp, npres=npres)
    gas_lw, gas_sw = GasOpticsRRTMGP(kd_lw), GasOpticsRRTMGP(kd_sw)
    cld_lw = synthetic_cloud_optics(nbnd=nbnd_lw,
                                    band_lims_wvn=kd_lw.grid.band_lims_wvn_array)
    cld_sw = synthetic_cloud_optics(nbnd=nbnd_sw,
                                    band_lims_wvn=kd_sw.grid.band_lims_wvn_array)
    def step_fn(i):
        lw = allsky_step_lw(i, gas_lw, cloud_optics=cld_lw)
        sw = allsky_step_sw(i, gas_sw, cloud_optics=cld_sw)
        return lw.flux_up[:, 0], sw.flux_up[:, 0]   # keep outputs tiny

    # shard_map so the Pallas fused kernels run per device shard
    step = jax.jit(shard_map_columns(step_fn, mesh, chunk))

    if stream:
        # a small pool of DISTINCT host-side (numpy) chunks cycled through
        # the run: every chunk pays a real host->device upload of every
        # per-column field, as a production ingest loop would
        pool = []
        for _p in range(max(1, host_pool)):
            inp = make_allsky_inputs(chunk, nlay, cloud_optics=cld_lw)
            pool.append(jax.tree_util.tree_map(
                lambda x: np.asarray(x) if hasattr(x, "shape") else x, inp))
        put = lambda k: _shard_cols(pool[k % len(pool)], mesh, chunk)
    else:
        resident = _shard_cols(make_allsky_inputs(
            chunk, nlay, cloud_optics=cld_lw), mesh, chunk)
        put = lambda k: resident

    from concurrent.futures import ThreadPoolExecutor

    cur = put(0)
    out = step(cur)
    _force(out)                                     # compile once
    t0 = time.perf_counter()
    # double buffer on a WORKER THREAD: chunk k+1's host->device upload
    # runs while chunk k's solve is in flight. The thread matters: a
    # same-thread device_put blocks the Python thread on the transfer
    # RPC and serializes it against the next dispatch (measured ~1.75x
    # on the tunnel, scripts/bench_tunnel_overlap.py)
    with ThreadPoolExecutor(max_workers=1) as ex:
        nxt_fut = None
        for k in range(n_chunks):
            if stream and k + 1 < n_chunks:
                nxt_fut = ex.submit(put, k + 1)
            out = step(cur)
            if reps_per_chunk > 1:
                for _ in range(reps_per_chunk - 1):
                    out = step(cur)
            cur = nxt_fut.result() if nxt_fut is not None else cur
            nxt_fut = None
            if verbose and k % max(1, n_chunks // 10) == 0:
                _force(out)
                done = (k + 1) * chunk * reps_per_chunk
                dt = time.perf_counter() - t0
                print(f"  chunk {k + 1}/{n_chunks}: {done:,} cols in "
                      f"{dt:.1f} s ({done / dt:,.0f} cols/s aggregate)")
    _force(out)
    dt = time.perf_counter() - t0
    total = n_chunks * chunk * reps_per_chunk
    return {
        "n_devices": n_dev,
        "chunk_columns": chunk,
        "n_chunks": n_chunks,
        "total_columns": total,
        "streamed_inputs": bool(stream),
        "seconds": dt,
        "cols_per_s": total / dt,
        "cols_per_s_per_device": total / dt / n_dev,
    }
