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
    "working_dtype",
    "checks_disabled",
]


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


_CONFIG = RTEConfig()


def get_config() -> RTEConfig:
    return _CONFIG


def set_checks(*, extents: bool | None = None, values: bool | None = None) -> None:
    """Equivalent of reference ``rte_config_checks`` (mo_rte_config.F90:29-49)."""
    if extents is not None:
        _CONFIG.check_extents = extents
    if values is not None:
        _CONFIG.check_values = values


def set_use_pallas(value) -> None:
    """Force (True/False) or restore auto (None) Pallas kernel dispatch."""
    _CONFIG.use_pallas = value


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
