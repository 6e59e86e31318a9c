"""Quantify host/queue dispatch overhead: steady-state chained steps vs an
on-device fori_loop of the same step (device-only time, zero dispatch)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from __graft_entry__ import _build

ncol = int(os.environ.get("BENCH_NCOL", "4096"))
step, inputs = _build(ncol=ncol, nlay=72, ngpt_lw=256, nbnd_lw=16,
                      ngpt_sw=224, nbnd_sw=14, ntemp=14, npres=59)
step_jit = jax.jit(step)

def force(out):
    import numpy as np
    np.asarray(jax.device_get(out[0].ravel()[-1:]))

INNER = 10

# 1) chained dispatch (bench.py regime)
out = step_jit(inputs); force(out)
ts = []
for _ in range(8):
    t0 = time.perf_counter()
    for _ in range(INNER):
        out = step_jit(inputs)
    force(out)
    ts.append((time.perf_counter() - t0) / INNER)
t_chain = min(ts)
print(f"chained dispatch: {t_chain*1e3:.2f} ms/step")

# 2) on-device loop: perturb one input through the carry so XLA can't CSE
def loop_body(i, carry):
    scale, acc = carry
    pert = jax.tree_util.tree_map(lambda x: x, inputs)
    pert = pert._replace(tlay=inputs.tlay + scale * 1e-6)
    o = step(pert)
    return (o[0].ravel()[0], acc + o[0].ravel()[-1])

@jax.jit
def loop10(scale0):
    return jax.lax.fori_loop(0, INNER, loop_body, (scale0, jnp.float32(0.0)))

r = loop10(jnp.float32(0.0)); jax.tree_util.tree_map(lambda x: x, r)
force((r[1][None],))
ts = []
for _ in range(8):
    t0 = time.perf_counter()
    r = loop10(jnp.float32(0.0))
    force((r[1][None],))
    ts.append((time.perf_counter() - t0) / INNER)
t_loop = min(ts)
print(f"on-device loop:  {t_loop*1e3:.2f} ms/step")
print(f"host/dispatch gap: {(t_chain - t_loop)*1e3:.2f} ms/step")
