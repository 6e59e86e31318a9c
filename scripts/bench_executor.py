"""Executor bench: B independent blocks per dispatch vs per-step dispatch."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from __graft_entry__ import _build
from rte_rrtmgp_tpu.drivers.executor import run_blocks, stack_blocks

ncol = int(os.environ.get("BENCH_NCOL", "4096"))
B = int(os.environ.get("BENCH_BLOCKS", "8"))
step, inputs = _build(ncol=ncol, nlay=72, ngpt_lw=256, nbnd_lw=16,
                      ngpt_sw=224, nbnd_sw=14, ntemp=14, npres=59)

def force(out):
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[-1:]))

# B distinct blocks (perturb each so no two are identical)
blocks = stack_blocks([
    jax.tree_util.tree_map(
        lambda x: x * (1.0 + 1e-4 * k) if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating) else x,
        inputs)
    for k in range(B)])

runner = jax.jit(lambda b: run_blocks(step, b))
out = runner(blocks); force(out)
ts = []
for _ in range(6):
    t0 = time.perf_counter()
    out = runner(blocks)
    force(out)
    ts.append((time.perf_counter() - t0) / B)
t_exec = min(ts)
print(f"executor B={B}: {t_exec*1e3:.2f} ms/step -> {ncol/t_exec:,.0f} columns/s", flush=True)

# correctness: block 0 output == per-step output on block 0
ref = jax.jit(step)(inputs)
got = jax.tree_util.tree_map(lambda y: y[0], out)
err = max(float(jnp.abs(a - b).max()) for a, b in zip(ref, got))
print(f"block-0 vs per-step max abs err: {err:.3e}", flush=True)
