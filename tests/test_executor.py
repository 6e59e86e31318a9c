"""Block-executor tests (drivers/executor.py): scan-over-blocks equals
per-block calls; split/stack helpers round-trip."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rte_rrtmgp_tpu.drivers.executor import (run_blocks, split_columns,
                                             stack_blocks)


def _step(x):
    # stand-in "step": pytree in, pytree out
    return {"a": x["p"] * 2.0 + x["q"].sum(axis=-1, keepdims=True),
            "b": x["q"][:, ::-1]}


def test_run_blocks_matches_per_block():
    rng = np.random.default_rng(0)
    blocks = [{"p": jnp.asarray(rng.normal(size=(8, 4))),
               "q": jnp.asarray(rng.normal(size=(8, 4)))} for _ in range(3)]
    stacked = stack_blocks(blocks)
    out = jax.jit(lambda b: run_blocks(_step, b))(stacked)
    for k, blk in enumerate(blocks):
        ref = _step(blk)
        got = jax.tree_util.tree_map(lambda y: y[k], out)
        for key in ref:
            np.testing.assert_allclose(np.asarray(got[key]),
                                       np.asarray(ref[key]), rtol=1e-6)


def test_run_blocks_reduce_fn():
    blocks = stack_blocks([{"p": jnp.ones((4, 2)) * k, "q": jnp.zeros((4, 2))}
                           for k in range(4)])
    out = run_blocks(_step, blocks, reduce_fn=lambda o: o["a"].sum())
    np.testing.assert_allclose(np.asarray(out),
                               [k * 2.0 * 8 for k in range(4)])


def test_split_columns():
    x = {"p": jnp.arange(24.0).reshape(12, 2), "q": jnp.arange(12.0)}
    blocks = split_columns(x, 3)
    assert blocks["p"].shape == (3, 4, 2)
    assert blocks["q"].shape == (3, 4)
    np.testing.assert_array_equal(np.asarray(blocks["p"][1]),
                                  np.asarray(x["p"][4:8]))
    with pytest.raises(ValueError):
        split_columns(x, 5)
