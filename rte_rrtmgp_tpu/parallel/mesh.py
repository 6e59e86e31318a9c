"""Column-sharded execution over TPU device meshes.

The radiation problem is embarrassingly parallel in the column dimension
(reference blocks columns on the host, examples/rfmip-clear-sky/
rrtmgp_rfmip_lw.F90:177-179; SURVEY.md section 2.9). The TPU-native
expression: a 1-D ``jax.sharding.Mesh`` over a "columns" axis, every
column-leading field sharded on axis 0, lookup tables replicated in HBM
(they are closed over by the jit'd function, so XLA replicates them), and
*no collectives on the solve path* — only optional ``psum`` for
domain-integrated diagnostics.

Multi-host: initialize ``jax.distributed`` (DCN for process coordination
only), build the mesh over all devices, and feed per-host column shards
via :func:`shard_columns` (which uses ``make_array_from_process_local_data``
when running multi-process).
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["column_mesh", "shard_columns", "shard_map_columns",
           "replicate", "column_sharding", "pad_columns", "domain_mean"]

COLUMNS = "columns"


def column_mesh(devices=None) -> Mesh:
    """1-D device mesh over the column axis (all local+global devices)."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (COLUMNS,))


def column_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for a column-leading array: axis 0 split over devices."""
    return NamedSharding(mesh, P(COLUMNS))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_columns(arr, multiple: int):
    """Pad axis 0 up to a multiple (sharding requires equal shards).
    Returns (padded, ncol_original)."""
    n = arr.shape[0]
    pad = (-n) % multiple
    if pad == 0:
        return arr, n
    widths = [(0, pad)] + [(0, 0)] * (arr.ndim - 1)
    return np.pad(np.asarray(arr), widths, mode="edge"), n


def shard_columns(tree, mesh: Mesh):
    """Place every array in the pytree with its leading (column) axis
    sharded over the mesh. In multi-process runs each process passes its
    local column block and the global array is assembled over DCN."""
    sharding = column_sharding(mesh)

    def place(x):
        if not hasattr(x, "ndim") or x.ndim == 0:
            return x
        if jax.process_count() > 1:
            return jax.make_array_from_process_local_data(sharding, np.asarray(x))
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(place, tree)


def domain_mean(field, *, axis_name: Optional[str] = None):
    """Mean over columns; inside shard_map/pmap contexts pass the mesh axis
    name to reduce with a psum over ICI (diagnostics only — the solve path
    itself needs no collectives)."""
    import jax.numpy as jnp
    local = jnp.mean(field, axis=0)
    if axis_name is not None:
        local = jax.lax.pmean(local, axis_name)
    return local


def shard_map_columns(fn, mesh: Mesh, ncol: int):
    """Wrap ``fn(tree) -> tree`` with ``jax.shard_map`` so every array
    whose leading axis is the column axis is split over the mesh and the
    function body runs PER SHARD.

    This is the multi-chip entry point for the Pallas paths: XLA's GSPMD
    partitioner cannot split a custom call, so under plain ``jit`` a
    sharded input would force the kernels to gather/replicate. Under
    shard_map each device compiles and runs the kernels on its own
    column shard — exactly the reference's host-side column blocking
    (rrtmgp_rfmip_lw.F90:177-179) expressed device-side, still with no
    collectives on the solve path.

    Arrays with ``shape[0] == ncol`` get ``P(COLUMNS)``; everything else
    is replicated. Output specs are inferred the same way from a shape
    evaluation of ``fn``. Only COLUMN-LEADING pytrees may be passed: the
    heuristic cannot distinguish a (ncol, ...) array from e.g. a lane
    layout (ngpt, ncol) one when ngpt == ncol, so any array whose leading
    axis differs from ncol but that carries ncol in a later axis is
    rejected — pass explicit ``in_specs``/``out_specs`` for those.

    WARNING — column-reduced outputs: an output WITHOUT a leading
    column axis (a scalar loss, a domain mean) is inferred replicated,
    and because ``check_vma=False`` is required for the Pallas custom
    calls, shard_map does NOT verify the replication — such an output
    silently carries ONE shard's value, not the global reduction. Close
    reductions over columns inside ``fn`` with the mesh collective
    (``domain_mean(x, axis_name=COLUMNS)`` / ``jax.lax.psum``) or
    reduce on the host after the sharded call returns per-column
    fields.
    """
    def spec_of(x, n):
        if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == n:
            return P(COLUMNS, *([None] * (x.ndim - 1)))
        if hasattr(x, "ndim") and x.ndim >= 2 and n in x.shape[1:]:
            raise ValueError(
                f"shard_map_columns: array of shape {x.shape} is not "
                f"column-leading but has a non-leading axis equal to "
                f"ncol={n}; the column-sharding heuristic would silently "
                f"replicate (or mis-shard) it. Transpose to column-leading "
                f"or use jax.shard_map with explicit PartitionSpecs.")
        return P()

    def wrapper(tree):
        in_specs = jax.tree_util.tree_map(lambda x: spec_of(x, ncol), tree)
        out_shape = jax.eval_shape(fn, tree)
        out_specs = jax.tree_util.tree_map(lambda x: spec_of(x, ncol),
                                           out_shape)
        # check_vma=False: pallas_call outputs don't carry the varying-
        # mesh-axes annotation the checker wants
        return jax.shard_map(fn, mesh=mesh, in_specs=(in_specs,),
                             out_specs=out_specs, check_vma=False)(tree)

    return wrapper
