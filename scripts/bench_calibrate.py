"""Calibrate raw TPU throughput through the axon stack."""
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


from scripts.timing import timeit


x = jnp.ones((4096, 72, 256), jnp.float32)          # 302 MB
a = jnp.ones((4096, 4096), jnp.float32)

t = timeit(jax.jit(lambda x: x * 1.0001 + 2.0), x)
print(f"elementwise 302MB (r+w 604MB): {t*1e3:8.2f} ms -> {0.604/t:.0f} GB/s")

t = timeit(jax.jit(lambda a: a @ a), a)
print(f"matmul 4096^3 (137 GFLOP):     {t*1e3:8.2f} ms -> {2*4096**3/t/1e12:.1f} TFLOP/s")

t = timeit(jax.jit(lambda x: jnp.exp(x)), x)
print(f"exp 302MB:                     {t*1e3:8.2f} ms")

# scan over layers like the solver
def scanner(x):
    xs = jnp.moveaxis(x, 1, 0)
    def step(c, v):
        c = c * 0.9 + v
        return c, c
    _, ys = jax.lax.scan(step, xs[0], xs)
    return jnp.moveaxis(ys, 0, 1)
t = timeit(jax.jit(scanner), x)
print(f"scan72 over 302MB:             {t*1e3:8.2f} ms")

# col_gas-like: stack of 9 (4096,72) -> (9,4096,72)
small = [jnp.ones((4096, 72), jnp.float32) for _ in range(9)]
t = timeit(jax.jit(lambda *vs: jnp.stack(vs, 0) * 2.0), *small)
print(f"stack9 of (4096,72):           {t*1e3:8.2f} ms")

# per-band concat like tau_major output path: 16 x (4096,72,16) -> concat
parts = [jnp.ones((4096, 72, 16), jnp.float32) for _ in range(16)]
t = timeit(jax.jit(lambda *ps: jnp.concatenate(ps, axis=-1)), *parts)
print(f"concat16 -> (4096,72,256):     {t*1e3:8.2f} ms")

# take with small row width from big table, rows (4096,72): ONE call
k2 = jnp.ones((7560, 16), jnp.float32)
rows = jnp.asarray(np.random.default_rng(0).integers(0, 7560, (4096, 72)), jnp.int32)
t = timeit(jax.jit(lambda k, r: jnp.take(k, r, axis=0)), k2, rows)
print(f"single take (7560,16)[rows]:   {t*1e3:8.2f} ms")

# 128 takes (8 corners x 16 bands) summed, rows VARYING per take
ks = jnp.ones((7560, 256), jnp.float32)
def many_takes(k, r):
    acc = []
    for b in range(16):
        kb = k[:, b*16:(b+1)*16]
        s = None
        for c in range(8):
            term = jnp.take(kb, jnp.clip(r + b * 8 + c, 0, 7559), axis=0)
            s = term if s is None else s + term
        acc.append(s)
    return jnp.concatenate(acc, axis=-1)
t = timeit(jax.jit(many_takes), ks, rows)
print(f"128 takes + concat:            {t*1e3:8.2f} ms")
