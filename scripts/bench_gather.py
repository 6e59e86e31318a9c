"""Microbenchmark: table-interpolation gather formulations on TPU.

The RRTMGP hot op is: out[c,l,g] = sum_{8 corners} w_k[c,l] * K[jt+it, je_it+ie, jp+ip, g]
for g in a band window. Compare:
  A: current per-corner row gather (jnp.take of width-w rows)
  B: lax.gather with slice (1,2,2,w) per it  (4 corners per descriptor)
  C: lax.gather with slice (2,2,2,w) single descriptor (rectangular approx,
     only valid when je same for both it — timing only)
  D: one-hot matmul over rows (MXU), bf16 table
"""
import os
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NCOL, NLAY = 4096, 72
NTEMP, NETA, NPRESP1 = 14, 9, 60
NGPT, NBND = 256, 16
W = NGPT // NBND


from scripts.timing import timeit, out


rng = np.random.default_rng(0)
K = jnp.asarray(rng.uniform(size=(NTEMP, NETA, NPRESP1, NGPT)), jnp.float32)
jt = jnp.asarray(rng.integers(0, NTEMP - 1, (NCOL, NLAY)), jnp.int32)
jp = jnp.asarray(rng.integers(0, NPRESP1 - 1, (NCOL, NLAY)), jnp.int32)
je = jnp.asarray(rng.integers(0, NETA - 1, (2, NCOL, NLAY)), jnp.int32)
fmaj = jnp.asarray(rng.uniform(size=(2, 2, 2, NCOL, NLAY)), jnp.float32)


@jax.jit
def form_a(K, jt, jp, je, fmaj):
    k2 = K.reshape(-1, NGPT)
    out = []
    for b in range(NBND):
        g0 = b * W
        kb = k2[:, g0:g0 + W]
        acc = None
        for it in range(2):
            jtt = jt + it
            for dp in range(2):
                jpp = jp + dp
                for de in range(2):
                    rows = (jtt * NETA + jnp.clip(je[it] + de, 0, NETA - 1)) * NPRESP1 + jpp
                    term = fmaj[it, dp, de][..., None] * jnp.take(kb, rows, axis=0)
                    acc = term if acc is None else acc + term
        out.append(acc)
    return jnp.concatenate(out, axis=-1)


def gather_block(Kb, starts, slice_sizes):
    """lax.gather of a rectangular block per (c,l) cell.
    Kb: (NTEMP, NETA, NPRESP1, w); starts: (ncell, 3) [jt, je, jp]."""
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3, 4),
        collapsed_slice_dims=(),
        start_index_map=(0, 1, 2),
    )
    return jax.lax.gather(Kb, starts, dnums, (slice_sizes + (Kb.shape[-1],)),
                          mode=jax.lax.GatherScatterMode.CLIP)


@jax.jit
def form_b(K, jt, jp, je, fmaj):
    out = []
    ncell = NCOL * NLAY
    jtf = jt.reshape(-1)
    jpf = jp.reshape(-1)
    for b in range(NBND):
        g0 = b * W
        Kb = K[..., g0:g0 + W]
        acc = 0.0
        for it in range(2):
            starts = jnp.stack([jtf + it, je[it].reshape(-1), jpf], axis=-1)
            blk = gather_block(Kb, starts, (1, 2, 2))  # (ncell,1,2,2,w)
            w_it = fmaj[it].reshape(2, 2, ncell)       # [dp, de, cell]
            acc = acc + jnp.einsum("nxepw,pen->nw", blk, w_it)
        out.append(acc.reshape(NCOL, NLAY, W))
    return jnp.concatenate(out, axis=-1)


@jax.jit
def form_c(K, jt, jp, je, fmaj):
    out = []
    ncell = NCOL * NLAY
    jtf = jt.reshape(-1)
    jpf = jp.reshape(-1)
    for b in range(NBND):
        g0 = b * W
        Kb = K[..., g0:g0 + W]
        starts = jnp.stack([jtf, je[0].reshape(-1), jpf], axis=-1)
        blk = gather_block(Kb, starts, (2, 2, 2))      # (ncell,2,2,2,w)
        wq = fmaj.reshape(2, 2, 2, ncell)
        acc = jnp.einsum("ntepw,tpen->nw", blk, wq)
        out.append(acc.reshape(NCOL, NLAY, W))
    return jnp.concatenate(out, axis=-1)


@jax.jit
def form_d(K, jt, jp, je, fmaj):
    """One-hot matmul per band, bf16."""
    k2 = K.reshape(-1, NGPT).astype(jnp.bfloat16)
    nrows = NTEMP * NETA * NPRESP1
    ncell = NCOL * NLAY
    out = []
    # build weighted 8-hot matrix once (shared across bands)
    rows_list, w_list = [], []
    for it in range(2):
        for dp in range(2):
            for de in range(2):
                rows = ((jt + it) * NETA + jnp.clip(je[it] + de, 0, NETA - 1)
                        ) * NPRESP1 + (jp + dp)
                rows_list.append(rows.reshape(-1))
                w_list.append(fmaj[it, dp, de].reshape(-1))
    rows8 = jnp.stack(rows_list, -1)    # (ncell, 8)
    w8 = jnp.stack(w_list, -1)          # (ncell, 8)
    iota = jnp.arange(nrows, dtype=jnp.int32)
    hot = (rows8[:, :, None] == iota[None, None, :])
    S = jnp.sum(jnp.where(hot, w8[:, :, None], 0.0), axis=1).astype(jnp.bfloat16)
    return jnp.dot(S, k2, preferred_element_type=jnp.float32).reshape(
        NCOL, NLAY, NGPT)


def main():
    for name, fn in [("A row-take", form_a), ("B gather(1,2,2)", form_b),
                     ("C gather(2,2,2)", form_c), ("D onehot-mxu", form_d)]:
        try:
            t, out = timeit(fn, K, jt, jp, je, fmaj)
            print(f"{name:18s} {t*1e3:9.2f} ms   sum={float(jnp.sum(out)):.6e}")
        except Exception as e:
            print(f"{name:18s} FAILED: {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
