"""Custom-VJP bridge making Pallas kernel dispatch points differentiable.

Pallas kernels are opaque to JAX autodiff. Every dispatch point in this
framework has a mathematically equivalent XLA formulation (it IS the
fallback path); :func:`with_xla_grad` runs the Pallas kernel as the
primal and differentiates the XLA formulation on the backward pass,
rematerializing its forward from the saved primal inputs (so the large
spectral intermediates are never stored as residuals).

The reference carries exactly one derivative by hand — dF_up/dT_sfc
transported through the LW solver (rte/kernels/
mo_rte_solver_kernels.F90:201-213, 731-742); here the whole model is
differentiable on both code paths.
"""
from __future__ import annotations

import jax

__all__ = ["with_xla_grad"]


def with_xla_grad(pallas_fn, xla_fn, *args):
    """Return ``pallas_fn(*args)`` with the VJP defined by ``xla_fn``.

    ``xla_fn`` must take the same positional arguments and return the
    same output pytree (same structure, shapes, dtypes, and None
    positions). The backward pass traces ``xla_fn`` with the Pallas
    config forced off, so nested dispatch points inside it lower to pure
    XLA."""
    @jax.custom_vjp
    def run(*a):
        return pallas_fn(*a)

    def fwd(*a):
        return pallas_fn(*a), a

    def bwd(a, ct):
        from ...config import get_config, set_use_pallas
        prev = get_config().use_pallas
        set_use_pallas(False)      # the reference path must trace pure XLA
        try:
            _, vjp = jax.vjp(xla_fn, *a)
        finally:
            set_use_pallas(prev)
        return vjp(ct)

    run.defvjp(fwd, bwd)
    return run(*args)
