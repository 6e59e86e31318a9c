"""Worker for the 2-process jax.distributed CPU test (run by
test_distributed.py, one subprocess per process id).

Exercises the true multi-host code path: jax.distributed.initialize over a
local TCP coordinator, a global column mesh spanning both processes'
devices, shard_columns' make_array_from_process_local_data branch
(parallel/mesh.py), and a shard_map solve whose per-process output shards
must match a locally computed single-process reference (columns are
independent, so per-column fluxes are identical).

Usage: python distributed_worker.py <process_id> <num_processes> <port>
"""
import os
import sys

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=4").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                           num_processes=nproc, process_id=pid)

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from gray_atmosphere import gray_rad_equil, gray_rad_equil_olr  # noqa: E402
from rte_rrtmgp_tpu import rte_lw  # noqa: E402
from rte_rrtmgp_tpu.parallel.mesh import (column_mesh, shard_columns,  # noqa: E402
                                          shard_map_columns)

assert jax.process_count() == nproc, jax.process_count()
NDEV = len(jax.devices())
assert NDEV == 4 * nproc, f"expected {4 * nproc} global devices, got {NDEV}"
assert len(jax.local_devices()) == 4

# global problem: 2 columns per device, distinct per column
NCOL = 2 * NDEV
NLAY = 8
sfc_t_global = np.linspace(260.0, 320.0, NCOL)
tau_global = np.linspace(0.5, 8.0, NCOL)

# this process's local column block
lo, hi = pid * (NCOL // nproc), (pid + 1) * (NCOL // nproc)
props_l, sources_l = gray_rad_equil(sfc_t_global[lo:hi], tau_global[lo:hi],
                                    NLAY)
emis_l = np.ones((hi - lo, 1))

mesh = column_mesh()           # spans BOTH processes' devices
tree_global = shard_columns((props_l, sources_l, emis_l), mesh)

# every leading-axis array must now be a global jax.Array over the mesh
for leaf in jax.tree_util.tree_leaves(tree_global):
    if hasattr(leaf, "sharding") and leaf.ndim >= 1 and leaf.shape[0] == NCOL:
        assert len(leaf.sharding.device_set) == NDEV

fn = lambda t: rte_lw(t[0], t[1], t[2]).flux_up
out = jax.jit(shard_map_columns(fn, mesh, NCOL))(tree_global)
assert out.shape == (NCOL, NLAY + 1)

# reference: eager single-process solve of this process's own columns
ref = np.asarray(rte_lw(props_l, sources_l, emis_l).flux_up)

ok = True
checked = 0
for shard in out.addressable_shards:
    sl = shard.index[0]
    got = np.asarray(shard.data)
    want = ref[sl.start - lo:sl.stop - lo]
    if not np.allclose(got, want, rtol=1e-12):
        print(f"process {pid}: shard {sl} mismatch "
              f"max={np.abs(got - want).max()}", flush=True)
        ok = False
    checked += got.shape[0]
assert checked == (hi - lo), f"process {pid} owns {checked} columns, expected {hi - lo}"

# analytic oracle on the local block: OLR = 2 sigma T^4 / (2 + D tau)
olr = gray_rad_equil_olr(sfc_t_global[lo:hi], tau_global[lo:hi])
assert np.allclose(ref[:, 0], olr, rtol=1e-10)

# diagnostics-style global reduction over DCN
from jax.experimental import multihost_utils  # noqa: E402

all_up = multihost_utils.process_allgather(out, tiled=True)
assert all_up.shape == (NCOL, NLAY + 1)

jax.distributed.shutdown()
print(f"process {pid}: OK" if ok else f"process {pid}: FAIL", flush=True)
sys.exit(0 if ok else 1)
