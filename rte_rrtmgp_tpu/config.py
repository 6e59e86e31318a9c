"""Runtime configuration for the TPU radiation framework.

Mirrors the reference's two config mechanisms (behaviorally):
  - compile-time precision switch ``RTE_USE_SP`` (reference
    rte/kernels/mo_rte_kind.F90:24-41) -> a process-level dtype switch here.
  - runtime check toggles ``check_extents`` / ``check_values`` (reference
    rte/frontend/mo_rte_config.F90:20-51) -> flags consulted by the eager
    validation helpers. Extent (shape) checks are *always* performed at trace
    time because they are free under ``jax.jit``; value checks run eagerly
    only when enabled (they would force host syncs inside jit).
"""
from __future__ import annotations

import dataclasses
from contextlib import contextmanager

import jax.numpy as jnp

__all__ = [
    "RTEConfig",
    "get_config",
    "set_checks",
    "set_dtype",
    "set_use_pallas",
    "set_assume_pressure_window",
    "set_fused_adjoint",
    "working_dtype",
    "checks_disabled",
    "on_tpu",
    "pretend_tpu",
]


def on_tpu() -> bool:
    """True iff the default JAX backend is a TPU.

    Centralized probe (used by every Pallas-dispatch site) so unknown or
    plugin backends are *not* misclassified as TPU: Mosaic kernels compile
    natively only on real TPU backends; everything else gets interpret
    mode or the XLA fallback.

    ``pretend_tpu()`` overrides the probe for cross-platform LOWERING
    tests: ``jax.export.export(..., platforms=["tpu"])`` runs the full
    Mosaic lowering pipeline on any host, which catches
    compiles-on-hardware bugs (e.g. value-level dynamic_slice in a
    recurrence) that interpret-mode tests cannot — but only if the
    dispatch sites choose ``interpret=False`` while tracing on CPU.
    """
    if _PRETEND_TPU:
        return True
    import jax
    return jax.default_backend() == "tpu"


_PRETEND_TPU = False


@contextmanager
def pretend_tpu():
    """Within the context, ``on_tpu()`` returns True regardless of the
    backend, so Pallas dispatch sites trace compiled (non-interpret)
    kernels. Use ONLY under ``jax.export`` / AOT lowering for platform
    "tpu"; executing the traced computation on a non-TPU backend fails."""
    global _PRETEND_TPU
    prev = _PRETEND_TPU
    _PRETEND_TPU = True
    try:
        yield
    finally:
        _PRETEND_TPU = prev


@dataclasses.dataclass
class RTEConfig:
    # float32 is the TPU-native working precision (the reference's RTE_USE_SP
    # build); float64 is available on CPU for tight-tolerance validation.
    dtype: jnp.dtype = jnp.float32
    check_extents: bool = True
    check_values: bool = True
    # Pallas lane-gather kernels for minor-gas/Rayleigh interpolation:
    # None = auto (on when running on TPU and the table row domain fits
    # the 128-lane gather), True/False = force. On non-TPU backends a
    # forced True runs the kernels in interpreter mode (slow; testing).
    use_pallas: bool | None = None
    # The Pallas major/fused kernels assume every 128-cell lane group
    # spans at most PSPAN-1 pressure indices (true for physical
    # atmospheres; see ops/pallas/major_gather.py). When pressures are
    # concrete the property is checked eagerly and the XLA path is taken
    # on failure. Inside a user jax.jit the check must be traced: by
    # default a violation NaN-poisons the outputs (loud, cheap); set
    # this True to assert the property holds and skip the traced check.
    assume_pressure_window: bool = False
    # Value checks (check_values) run eagerly on concrete arrays and are
    # skipped when inputs are tracers (inside a user jax.jit) — the
    # reference likewise disables them in performance paths
    # (rrtmgp_allsky.F90:332-335). Set this True to ALSO enforce them
    # under jit via jax.debug.callback: each check runs on the host with
    # the runtime values and raises ValueError on violation (the error
    # surfaces when the computation executes; adds a host round-trip per
    # checked array — debugging aid, not a production setting). Requires
    # a backend with host-callback support (CPU/TPU; not the axon
    # tunnel plugin, which lacks send/recv callbacks).
    check_values_traced: bool = False
    # Hand-derived adjoint (backward) Pallas kernel for the grand fused
    # LW path (ops/pallas/fused_lw_bwd.py): gradients through the fused
    # tier without re-tracing the XLA gas optics. Requires per-(block,
    # layer) UNIFORM pressure-window bases — guaranteed by shared
    # pressure grids across columns (the all-sky benchmark and blocked
    # RFMIP regime). None = auto: used when the pressures are concrete
    # and every column shares one pressure profile; True = assert the
    # property and use it even under jit (caller's responsibility);
    # False = always use the XLA-retrace backward.
    fused_adjoint: bool | None = None


_CONFIG = RTEConfig()


def get_config() -> RTEConfig:
    return _CONFIG


def set_checks(*, extents: bool | None = None, values: bool | None = None,
               values_traced: bool | None = None) -> None:
    """Equivalent of reference ``rte_config_checks`` (mo_rte_config.F90:29-49).
    ``values_traced=True`` additionally enforces value checks inside jit
    via host callbacks (see RTEConfig.check_values_traced)."""
    if extents is not None:
        _CONFIG.check_extents = extents
    if values is not None:
        _CONFIG.check_values = values
    if values_traced is not None:
        _CONFIG.check_values_traced = values_traced


def set_use_pallas(value) -> None:
    """Force (True/False) or restore auto (None) Pallas kernel dispatch."""
    _CONFIG.use_pallas = value


def set_assume_pressure_window(value: bool) -> None:
    """Assert (True) the PSPAN pressure-window property so traced calls
    skip the NaN-poisoning runtime guard (see RTEConfig)."""
    _CONFIG.assume_pressure_window = value


def set_fused_adjoint(value) -> None:
    """Force (True), disable (False), or restore auto (None) the fused
    LW adjoint kernel (see RTEConfig.fused_adjoint)."""
    _CONFIG.fused_adjoint = value


def set_dtype(dtype) -> None:
    _CONFIG.dtype = jnp.dtype(dtype)


def working_dtype():
    return _CONFIG.dtype


@contextmanager
def checks_disabled():
    """Temporarily disable all runtime checks (the all-sky benchmark pattern:
    reference examples/all-sky/rrtmgp_allsky.F90:332-335)."""
    prev = (_CONFIG.check_extents, _CONFIG.check_values)
    _CONFIG.check_extents = _CONFIG.check_values = False
    try:
        yield
    finally:
        _CONFIG.check_extents, _CONFIG.check_values = prev
