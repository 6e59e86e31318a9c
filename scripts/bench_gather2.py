"""Nail the TPU gather cost model + test the MXU matmul reformulation."""
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from scripts.timing import timeit

NCOL, NLAY = 4096, 72
NCELL = NCOL * NLAY
NTEMP, NETA, NPRESP1 = 14, 9, 60
NROWS = NTEMP * NETA * NPRESP1
NGPT, NBND = 256, 16
W = NGPT // NBND

rng = np.random.default_rng(0)
rows = jnp.asarray(rng.integers(0, NROWS, (NCOL, NLAY)), jnp.int32)
rows_m = jnp.asarray(rng.integers(0, NROWS, (NCOL, NLAY, 8)), jnp.int32)
k16 = jnp.asarray(rng.uniform(size=(NROWS, 16)), jnp.float32)
k256 = jnp.asarray(rng.uniform(size=(NROWS, 256)), jnp.float32)

R = 8  # inner reps chained


def chain(fn):
    """Make each inner rep depend on the last so they can't overlap-fold."""
    def wrapped(k, r):
        acc = 0.0
        for i in range(R):
            acc = acc + fn(k, jnp.clip(r + i, 0, NROWS - 1))[..., :1].sum()
        return acc
    return jax.jit(wrapped)


t = timeit(chain(lambda k, r: jnp.take(k, r, axis=0)), k16, rows, reps=3)
print(f"take (7560,16)  295k rows: {t/R*1e3:8.2f} ms/op")

t = timeit(chain(lambda k, r: jnp.take(k, r, axis=0)), k256, rows, reps=3)
print(f"take (7560,256) 295k rows: {t/R*1e3:8.2f} ms/op")

t = timeit(chain(lambda k, r: jnp.take(k, r, axis=0)), k16, rows_m, reps=3)
print(f"take (7560,16)  2.4M rows: {t/R*1e3:8.2f} ms/op")

# elementwise for bandwidth reference, chained
x = jnp.asarray(rng.uniform(size=(NCOL, NLAY, NGPT)), jnp.float32)


@jax.jit
def ew(x):
    for _ in range(R):
        x = x * 1.0001 + 2.0
    return x


t = timeit(ew, x, reps=3)
print(f"elementwise 302MB r+w:     {t/R*1e3:8.2f} ms/op -> {0.604*R/t:.0f} GB/s")

# one-hot (ncell,126) @ (126, 960) staged matmul, per band estimate:
jt = jnp.asarray(rng.integers(0, NTEMP - 1, NCELL), jnp.int32)
je = jnp.asarray(rng.integers(0, NETA - 1, NCELL), jnp.int32)
ft = jnp.asarray(rng.uniform(size=NCELL), jnp.float32)
fe = jnp.asarray(rng.uniform(size=NCELL), jnp.float32)
jp = jnp.asarray(rng.integers(0, NPRESP1 - 1, NCELL), jnp.int32)
fp = jnp.asarray(rng.uniform(size=NCELL), jnp.float32)
kq = jnp.asarray(rng.uniform(size=(126, NPRESP1 * W)), jnp.bfloat16)


@jax.jit
def staged(jt, je, ft, fe, jp, fp, kq):
    outs = 0.0
    iota126 = jnp.arange(126, dtype=jnp.int32)
    iota60 = jnp.arange(NPRESP1, dtype=jnp.int32)
    base = jt * NETA + je
    for i in range(R):
        basei = jnp.clip(base + i, 0, 125)
        q = jnp.zeros((NCELL, 126), jnp.float32)
        for dt in range(2):
            for de in range(2):
                wgt = jnp.where(dt, ft, 1 - ft) * jnp.where(de, fe, 1 - fe)
                hot = (basei + (dt * NETA + de))[:, None] == iota126[None]
                q = q + jnp.where(hot, wgt[:, None], 0.0)
        t1 = jnp.dot(q.astype(jnp.bfloat16), kq,
                     preferred_element_type=jnp.float32)  # (ncell, 60*16)
        t1 = t1.reshape(NCELL, NPRESP1, W)
        # press 2-hot contraction
        p = jnp.zeros((NCELL, NPRESP1), jnp.float32)
        for dp in range(2):
            wgt = jnp.where(dp, fp, 1 - fp)
            hot = jnp.clip(jp + dp, 0, NPRESP1 - 1)[:, None] == iota60[None]
            p = p + jnp.where(hot, wgt[:, None], 0.0)
        outs = outs + jnp.einsum("np,npw->nw", p, t1)[:, :1].sum()
    return outs


t = timeit(staged, jt, je, ft, fe, jp, fp, kq, reps=3)
print(f"staged mxu per band:       {t/R*1e3:8.2f} ms/op (x16 bands = {16*t/R*1e3:.1f} ms)")
