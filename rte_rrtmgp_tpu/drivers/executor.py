"""Block executor: amortize per-dispatch overhead by processing many
independent column blocks inside ONE device executable.

Measurement on the target stack (docs/PERFORMANCE.md "dispatch gap"):
the full all-sky step's device time is ~25 ms at ncol=4096, but each
jitted call dispatched through the remote-PJRT (axon) tunnel pays an
additional data-proportional ~24 ms that does not pipeline across calls
when the executable contains Pallas custom calls (plain XLA executables
chain at full speed). Scanning B blocks inside one executable removes
that per-call cost entirely: throughput ~2x at B>=4.

This is the production serving regime in any case — the reference's
benchmark harness likewise times a loop of repeated steps over column
blocks (reference examples/all-sky/rrtmgp_allsky.F90:329-419, loop of
`nloops` repetitions) and RFMIP runs sweep many blocks per executable
(reference examples/rfmip-clear-sky/rrtmgp_rfmip_lw.F90 block loop).

Usage:
    blocks = stack_blocks([inputs0, inputs1, ...])      # leading B axis
    outs   = jax.jit(lambda b: run_blocks(step, b))(blocks)
"""
from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp

__all__ = ["run_blocks", "stack_blocks", "split_columns"]


def run_blocks(step_fn: Callable[[Any], Any], inputs_blocks: Any,
               *, reduce_fn: Callable[[Any], Any] | None = None) -> Any:
    """Run ``step_fn`` over a leading block axis with ``lax.scan``.

    ``inputs_blocks``: pytree whose leaves carry a leading block axis B
    (see :func:`stack_blocks` / :func:`split_columns`). Returns the
    pytree of outputs stacked along a new leading B axis; pass
    ``reduce_fn`` to post-process each block's output inside the scan
    (e.g. keep only broadband fluxes) and shrink the stacked result.

    The scan body is traced once; compile time is that of a single step
    plus loop overhead, independent of B.
    """
    def body(carry, block):
        out = step_fn(block)
        if reduce_fn is not None:
            out = reduce_fn(out)
        return carry, out

    _, ys = jax.lax.scan(body, None, inputs_blocks)
    return ys


def stack_blocks(blocks: list) -> Any:
    """Stack a list of identically-shaped input pytrees along a new
    leading block axis (the inverse of iterating ``run_blocks`` outputs)."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *blocks)


def split_columns(inputs: Any, n_blocks: int) -> Any:
    """Split every leaf's leading column axis into ``n_blocks`` equal
    blocks: (ncol, ...) -> (n_blocks, ncol // n_blocks, ...).

    All leaves must share the same leading extent; scalars and leaves
    whose leading axis is not divisible raise ValueError.
    """
    def split(x):
        x = jnp.asarray(x)
        if x.ndim == 0 or x.shape[0] % n_blocks:
            raise ValueError(
                f"split_columns: leaf shape {x.shape} not divisible into "
                f"{n_blocks} blocks along axis 0")
        return x.reshape((n_blocks, x.shape[0] // n_blocks) + x.shape[1:])

    return jax.tree_util.tree_map(split, inputs)
