"""Test take_along_axis (per-lane row indices) gather formulation."""
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from scripts.timing import timeit

NCELL = 4096 * 72
NROWS = 14 * 9 * 60
NGPT = 256
R = 4

rng = np.random.default_rng(0)
K2 = jnp.asarray(rng.uniform(size=(NROWS, NGPT)), jnp.float32)
# per-(cell,gpt) row indices (in reality = f(jt,jp,jeta[flav(g)]))
idx = jnp.asarray(rng.integers(0, NROWS, (NCELL, NGPT)), jnp.int32)
w = jnp.asarray(rng.uniform(size=(NCELL, 1)), jnp.float32)


@jax.jit
def taa(K2, idx, w):
    acc = 0.0
    for i in range(R):
        ii = jnp.clip(idx + i, 0, NROWS - 1)
        g = jnp.take_along_axis(K2, ii, axis=0)   # (NCELL, NGPT): out[c,g]=K2[idx[c,g],g]
        acc = acc + (g * w).sum()
    return acc


t = timeit(taa, K2, idx, w, reps=3)
print(f"take_along_axis (295k x 256): {t/R*1e3:8.2f} ms/op")

# one-hot matmul on MXU, f32, full rows domain per op for comparison
Q = jnp.asarray(rng.uniform(size=(NCELL, 126)), jnp.float32)
Kq = jnp.asarray(rng.uniform(size=(126, 960)), jnp.float32)


@jax.jit
def mm(Q, Kq):
    acc = 0.0
    for i in range(R):
        acc = acc + jnp.dot(Q + i, Kq, preferred_element_type=jnp.float32).sum()
    return acc


t = timeit(mm, Q, Kq, reps=3)
print(f"matmul (295k,126)@(126,960) f32: {t/R*1e3:8.2f} ms/op "
      f"({2*NCELL*126*960/1e9:.0f} GF -> {2*NCELL*126*960*R/t/1e12:.1f} TF/s)")

mmb = jax.jit(lambda Q, Kq: sum(jnp.dot((Q + i).astype(jnp.bfloat16),
                                        Kq.astype(jnp.bfloat16),
                                        preferred_element_type=jnp.float32).sum()
                                for i in range(R)))
t = timeit(mmb, Q, Kq, reps=3)
print(f"matmul bf16 same:                {t/R*1e3:8.2f} ms/op "
      f"-> {2*NCELL*126*960*R/t/1e12:.1f} TF/s")
