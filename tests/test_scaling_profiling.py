"""Weak-scaling harness + profiling utilities (CPU mesh)."""
import jax
import numpy as np
import pytest

from rte_rrtmgp_tpu.drivers.allsky import (allsky_step_lw, make_allsky_inputs)
from rte_rrtmgp_tpu.models.rrtmgp.gas_optics import GasOpticsRRTMGP
from rte_rrtmgp_tpu.parallel.scaling import podscale_allsky, weak_scaling
from rte_rrtmgp_tpu.utils.profiling import benchmark, roofline, step_bytes
from rte_rrtmgp_tpu.utils.synthetic import (synthetic_cloud_optics,
                                            synthetic_kdist)

NDEV = len(jax.devices())


@pytest.fixture(scope="module")
def lw_setup():
    kd = synthetic_kdist(sw=False, ngpt=32, nbnd=4, ntemp=5, npres=10)
    gas = GasOpticsRRTMGP(kd)
    cld = synthetic_cloud_optics(nbnd=4,
                                 band_lims_wvn=kd.grid.band_lims_wvn_array)
    return gas, cld


@pytest.mark.skipif(NDEV < 2, reason="needs multi-device backend")
def test_weak_scaling_runs(lw_setup):
    gas, cld = lw_setup

    def make_inputs(ncol):
        # 128 columns/device: each shard runs a full 128-lane column
        # block (the Pallas kernels' steady-state granularity), not the
        # padding path
        return make_allsky_inputs(ncol, 8, cloud_optics=cld)

    def step(i):
        f = allsky_step_lw(i, gas, cloud_optics=cld)
        return f.flux_up

    r = weak_scaling(make_inputs, step, cols_per_device=128, reps=3)
    assert r["n_devices"] == NDEV
    assert r["cols_per_s_1dev"] > 0 and r["cols_per_s_ndev"] > 0
    # Virtual CPU devices share physical cores, so the achievable weak
    # scaling here is min(ncores, n)/n of ideal (one core must run all
    # n shards serially). Gate at 40% of THAT: accidental serialization
    # of the shards on a multicore host, or a replicated-input blowup
    # (every device processing all n*cols columns -> another factor n),
    # fails this; honest time-sliced emulation passes. On real multi-chip
    # hardware (ncores >= n) this gate is 0.4 absolute; the driver-set
    # production target is 0.9 (BASELINE.md), measured by the same
    # harness on a real slice.
    import os
    ncores = os.cpu_count() or 1
    achievable = min(ncores, NDEV) / NDEV
    assert r["efficiency"] > 0.4 * achievable, r


def test_podscale_chunking_small():
    """Exercise the pod-scale config machinery at toy size."""
    r = podscale_allsky(total_columns=4 * 8 * NDEV, nlay=6,
                        chunk_cols_per_device=8,
                        ngpt_lw=16, nbnd_lw=2, ngpt_sw=16, nbnd_sw=2,
                        ntemp=4, npres=6, verbose=False)
    assert r["total_columns"] >= 4 * 8 * NDEV
    assert r["cols_per_s"] > 0
    assert r["n_chunks"] == 4


def test_benchmark_and_roofline(lw_setup):
    gas, cld = lw_setup
    inputs = make_allsky_inputs(32, 8, cloud_optics=cld)
    step = jax.jit(lambda i: allsky_step_lw(i, gas, cloud_optics=cld).flux_up)
    r = benchmark(step, inputs, ncol=32, reps=2)
    assert r.cols_per_s > 0 and "columns/s" in r.table()
    rl = roofline(r, nlay=8, ngpt_lw=32, sw=False)
    assert rl["model_bytes"] == step_bytes(32, 8, ngpt_lw=32, sw=False)
    assert 0 < rl["roofline_fraction"]
