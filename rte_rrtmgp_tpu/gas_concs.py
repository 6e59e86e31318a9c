"""Gas volume-mixing-ratio store.

Behavioral equivalent of reference ``ty_gas_concs``
(rte/frontend/gas-optics-template/mo_gas_concentrations.F90:51-84):
a case-insensitive name -> VMR mapping where each entry may be a scalar,
a profile ``(nlay,)``, or a full field ``(ncol, nlay)``; reads broadcast to
``(ncol, nlay)``. Implemented as a pytree (dict of arrays + static name
tuple) so it threads through jit.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["GasConcs"]


def _norm(name: str) -> str:
    return name.strip().lower()


@dataclasses.dataclass(frozen=True)
class GasConcs:
    names: tuple          # normalized gas names, static
    values: tuple         # arrays, one per name: (), (nlay,), or (ncol, nlay)

    # ---------------- construction ----------------
    @staticmethod
    def empty() -> "GasConcs":
        return GasConcs(names=(), values=())

    def set_vmr(self, name: str, vmr) -> "GasConcs":
        """Returns a new store with ``name`` set (reference ``set_vmr``
        scalar/1D/2D overloads, mo_gas_concentrations.F90:121-240).
        Eagerly validates vmr in [0, 1] when given as concrete values."""
        key = _norm(name)
        arr = jnp.asarray(vmr)
        if arr.ndim > 2:
            raise ValueError(f"set_vmr({name}): vmr must be scalar, 1-D, or 2-D")
        if isinstance(vmr, (int, float, np.ndarray)) or not isinstance(arr, jax.core.Tracer):
            try:
                v = np.asarray(vmr)
                if np.any((v < 0.0) | (v > 1.0)):
                    raise ValueError(f"set_vmr({name}): values outside [0,1]")
            except TypeError:
                pass
        names = list(self.names)
        values = list(self.values)
        if key in names:
            values[names.index(key)] = arr
        else:
            names.append(key)
            values.append(arr)
        return GasConcs(names=tuple(names), values=tuple(values))

    # ---------------- access ----------------
    def __contains__(self, name: str) -> bool:
        return _norm(name) in self.names

    @property
    def gas_names(self) -> tuple:
        return self.names

    def get_vmr(self, name: str, ncol: int, nlay: int) -> jax.Array:
        """VMR broadcast to (ncol, nlay) (reference ``get_vmr`` 2-D,
        mo_gas_concentrations.F90:331-401)."""
        key = _norm(name)
        if key not in self.names:
            raise KeyError(f"gas '{name}' not present in GasConcs")
        arr = self.values[self.names.index(key)]
        if arr.ndim == 0:
            return jnp.broadcast_to(arr, (ncol, nlay))
        if arr.ndim == 1:
            if arr.shape[0] != nlay:
                raise ValueError(f"get_vmr({name}): profile has {arr.shape[0]} layers, expected {nlay}")
            return jnp.broadcast_to(arr[None, :], (ncol, nlay))
        if arr.shape != (ncol, nlay):
            raise ValueError(f"get_vmr({name}): field shape {arr.shape} != {(ncol, nlay)}")
        return arr

    def get_subset(self, start: int, n: int) -> "GasConcs":
        """Column subset (reference ``get_subset_range``)."""
        values = tuple(v if v.ndim < 2 else v[start:start + n] for v in self.values)
        return GasConcs(names=self.names, values=values)


jax.tree_util.register_dataclass(GasConcs, data_fields=["values"], meta_fields=["names"])
