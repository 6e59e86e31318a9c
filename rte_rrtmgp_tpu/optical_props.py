"""Optical property containers and their algebra.

TPU-first re-design of the reference class hierarchy
``ty_optical_props_{1scl,2str,nstr}`` (rte/frontend/mo_optical_props.F90):
plain pytree dataclasses of arrays with shape ``(ncol, nlay, ngpt)`` plus a
static :class:`~rte_rrtmgp_tpu.spectral.SpectralGrid`, and *pure functions*
for the algebra. The reference's 18-way double-dispatch ``increment`` table
(mo_optical_props.F90:879-1028) collapses to one function with a by-band
g-point gather; ``delta_scale`` (mo_optical_props_kernels.F90:47-98) and
``get_subset`` are pure functions too. XLA fuses all of it.

Array layout note: columns lead (batch/shard axis), g-points are minor (TPU
lane axis). The reference uses the same logical (ncol, nlay, ngpt) order
(mo_optical_props.F90:112) albeit column-fastest in Fortran memory.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from .spectral import SpectralGrid

__all__ = [
    "OpticalProps1scl",
    "OpticalProps2str",
    "OpticalPropsNstr",
    "OpticalProps",
    "delta_scale",
    "increment",
    "subset",
    "expand_to_gpt",
    "validate",
]


def _register(cls, data_fields, meta_fields):
    jax.tree_util.register_dataclass(cls, data_fields=list(data_fields),
                                     meta_fields=list(meta_fields))
    return cls


@dataclasses.dataclass(frozen=True)
class OpticalProps1scl:
    """Absorption-only optical depth (reference ``ty_optical_props_1scl``,
    mo_optical_props.F90:183-194)."""
    tau: jax.Array  # (ncol, nlay, ngpt)
    grid: SpectralGrid
    top_at_1: bool = True

    @property
    def ncol(self): return self.tau.shape[0]
    @property
    def nlay(self): return self.tau.shape[1]
    @property
    def ngpt(self): return self.tau.shape[2]


@dataclasses.dataclass(frozen=True)
class OpticalProps2str:
    """tau / single-scattering albedo / asymmetry (``ty_optical_props_2str``,
    mo_optical_props.F90:197-210)."""
    tau: jax.Array
    ssa: jax.Array
    g: jax.Array
    grid: SpectralGrid
    top_at_1: bool = True

    @property
    def ncol(self): return self.tau.shape[0]
    @property
    def nlay(self): return self.tau.shape[1]
    @property
    def ngpt(self): return self.tau.shape[2]


@dataclasses.dataclass(frozen=True)
class OpticalPropsNstr:
    """tau / ssa / phase-function moments ``p(nmom, ...)``
    (``ty_optical_props_nstr``, mo_optical_props.F90:213-227)."""
    tau: jax.Array
    ssa: jax.Array
    p: jax.Array  # (nmom, ncol, nlay, ngpt)
    grid: SpectralGrid
    top_at_1: bool = True

    @property
    def nmom(self): return self.p.shape[0]
    @property
    def ncol(self): return self.tau.shape[0]
    @property
    def nlay(self): return self.tau.shape[1]
    @property
    def ngpt(self): return self.tau.shape[2]


_register(OpticalProps1scl, ("tau",), ("grid", "top_at_1"))
_register(OpticalProps2str, ("tau", "ssa", "g"), ("grid", "top_at_1"))
_register(OpticalPropsNstr, ("tau", "ssa", "p"), ("grid", "top_at_1"))

OpticalProps = Union[OpticalProps1scl, OpticalProps2str, OpticalPropsNstr]


# ---------------------------------------------------------------------------
# delta scaling
# ---------------------------------------------------------------------------

def delta_scale(props: OpticalProps, f: Optional[jax.Array] = None) -> OpticalProps:
    """Delta-Eddington scaling. With ``f=None`` the forward-scattering fraction
    is g**2 (reference ``delta_scale_2str_k`` mo_optical_props_kernels.F90:
    47-74); otherwise a user-supplied f (``delta_scale_2str_f_k``, :76-98):

        tau' = (1 - ssa f) tau,  ssa' = ssa (1 - f) / (1 - ssa f),
        g'   = (g - f) / (1 - f)
    """
    if isinstance(props, OpticalProps1scl):
        return props  # no-op for absorption-only (reference behavior)
    if isinstance(props, OpticalPropsNstr):
        raise NotImplementedError("delta_scale for n-stream not implemented")
    g = props.g
    if f is not None:
        # reference delta_scale errors on f outside [0, 1] (a fraction;
        # f > 1 would flip tau negative); repo convention: eager values
        # validate, traced values are skipped
        from .config import get_config
        if get_config().check_values and not isinstance(f, jax.core.Tracer):
            f_np = np.asarray(f)
            if np.any((f_np < 0.0) | (f_np > 1.0)):
                raise ValueError("delta_scale: values of f out of "
                                 "bounds [0, 1]")
    f = g * g if f is None else f
    one = jnp.asarray(1.0, props.tau.dtype)
    wf = props.ssa * f
    tau = (one - wf) * props.tau
    # guard 1-f == 0 (f==1 implies g==1: fully forward -> g'=0 is the limit)
    ssa = jnp.where(wf < one, (props.ssa - wf) / jnp.maximum(one - wf, jnp.finfo(props.tau.dtype).tiny), 0.0)
    gp = jnp.where(f < one, (g - f) / jnp.maximum(one - f, jnp.finfo(props.tau.dtype).tiny), 0.0)
    return OpticalProps2str(tau=tau, ssa=ssa, g=gp, grid=props.grid, top_at_1=props.top_at_1)


# ---------------------------------------------------------------------------
# increment (the 18-way dispatch collapsed)
# ---------------------------------------------------------------------------

def expand_to_gpt(arr: jax.Array, source_grid: SpectralGrid, target_grid: SpectralGrid) -> jax.Array:
    """If ``arr`` is stored by band (ngpt == nband of source) and the target
    has more g-points, gather bands onto g-points (the ``_bybnd`` kernels,
    mo_optical_props_kernels.F90:366-630)."""
    if arr.shape[-1] == target_grid.ngpt:
        return arr
    if arr.shape[-1] == source_grid.nband and source_grid.bands_are_equal(target_grid):
        return arr[..., target_grid.gpt2band]
    raise ValueError(
        f"increment: incompatible spectral discretizations "
        f"({arr.shape[-1]} vs target ngpt={target_grid.ngpt} / nband={target_grid.nband})")


def increment(target: OpticalProps, other: OpticalProps) -> OpticalProps:
    """``target += other`` in optical-property space; returns a new pytree.

    Covers all 9 type pairs x {same g-point grid, by-band} of the reference's
    dispatch table (mo_optical_props.F90:879-1028 and the increment_* /
    inc_*_bybnd kernels, mo_optical_props_kernels.F90:106-630). tau adds;
    ssa averages tau-weighted; g averages tau*ssa-weighted.
    """
    grid = target.grid
    tiny = jnp.finfo(target.tau.dtype).tiny

    def ex(a):
        return expand_to_gpt(a, other.grid, grid)

    o_tau = ex(other.tau)
    if isinstance(other, OpticalProps1scl):
        o_ssa = None
        o_g = None
    elif isinstance(other, OpticalProps2str):
        o_ssa = ex(other.ssa)
        o_g = ex(other.g)
    else:
        o_ssa = ex(other.ssa)
        # n-stream scatterer into a 2-stream target: the first phase
        # moment IS the asymmetry parameter (reference
        # increment_2stream_by_nstream, kernels :229-259 uses p2(1))
        o_g = ex(other.p[0])

    if isinstance(target, OpticalProps1scl):
        # absorption-only target: add absorption optical depth tau*(1-ssa)
        # (increment_1scalar_by_2stream, mo_optical_props_kernels.F90:118-133)
        add = o_tau if o_ssa is None else o_tau * (1.0 - o_ssa)
        return OpticalProps1scl(tau=target.tau + add, grid=grid, top_at_1=target.top_at_1)

    if isinstance(target, OpticalProps2str):
        t_tau, t_ssa, t_g = target.tau, target.ssa, target.g
        if o_ssa is None:  # 2str += 1scl (increment_2stream_by_1scalar)
            tau = t_tau + o_tau
            ssa = t_tau * t_ssa / jnp.maximum(tau, tiny)
            ssa = jnp.where(tau > 2.0 * tiny, ssa, t_ssa)
            return OpticalProps2str(tau=tau, ssa=ssa, g=t_g, grid=grid, top_at_1=target.top_at_1)
        # 2str += 2str (increment_2stream_by_2stream, kernels:199-226):
        # tau12 = tau1+tau2; tauscat12 = tau1*ssa1 + tau2*ssa2
        # g' = (tau1*ssa1*g1 + tau2*ssa2*g2)/max(tauscat12,eps); ssa' = tauscat12/max(tau12,eps)
        o_gv = o_g if o_g is not None else jnp.zeros_like(o_tau)
        tau12 = t_tau + o_tau
        tauscat12 = t_tau * t_ssa + o_tau * o_ssa
        g12 = (t_tau * t_ssa * t_g + o_tau * o_ssa * o_gv) / jnp.maximum(tauscat12, tiny)
        ssa12 = tauscat12 / jnp.maximum(tau12, tiny)
        g12 = jnp.where(tauscat12 > 2.0 * tiny, g12, t_g)
        ssa12 = jnp.where(tau12 > 2.0 * tiny, ssa12, t_ssa)
        return OpticalProps2str(tau=tau12, ssa=ssa12, g=g12, grid=grid, top_at_1=target.top_at_1)

    # n-stream target
    t_tau, t_ssa, t_p = target.tau, target.ssa, target.p
    if o_ssa is None:  # nstr += 1scl
        tau = t_tau + o_tau
        ssa = t_tau * t_ssa / jnp.maximum(tau, tiny)
        ssa = jnp.where(tau > 2.0 * tiny, ssa, t_ssa)
        return OpticalPropsNstr(tau=tau, ssa=ssa, p=t_p, grid=grid, top_at_1=target.top_at_1)
    if isinstance(other, OpticalProps2str):
        # 2str phase function -> moments: p(m) = g**m (increment_nstream_by_2stream)
        nmom = t_p.shape[0]
        moms = jnp.stack([o_g ** (m + 1) for m in range(nmom)], axis=0)
        o_p = moms
    else:
        o_p = ex(other.p)
    tau12 = t_tau + o_tau
    tauscat12 = t_tau * t_ssa + o_tau * o_ssa
    # blend the common min(nmom) moments; the target's higher moments
    # are left untouched exactly as the reference does (kernels
    # :325-360: "if op2 has fewer moments the higher orders are
    # assumed to be 0" — and p1 rows above mom_lim are not written)
    mom_lim = min(t_p.shape[0], o_p.shape[0])
    blend = ((t_tau * t_ssa * t_p[:mom_lim]
              + o_tau * o_ssa * o_p[:mom_lim])
             / jnp.maximum(tauscat12, tiny))
    blend = jnp.where(tauscat12 > 2.0 * tiny, blend, t_p[:mom_lim])
    p12 = (blend if mom_lim == t_p.shape[0]
           else jnp.concatenate([blend, t_p[mom_lim:]], axis=0))
    ssa12 = tauscat12 / jnp.maximum(tau12, tiny)
    ssa12 = jnp.where(tau12 > 2.0 * tiny, ssa12, t_ssa)
    return OpticalPropsNstr(tau=tau12, ssa=ssa12, p=p12, grid=grid, top_at_1=target.top_at_1)


# ---------------------------------------------------------------------------
# subsetting
# ---------------------------------------------------------------------------

def subset(props: OpticalProps, start: int, n: int) -> OpticalProps:
    """Extract a column range (reference ``get_subset`` /
    ``extract_subset_dim1_3d``, mo_optical_props_kernels.F90:640+)."""
    sl = slice(start, start + n)
    if isinstance(props, OpticalProps1scl):
        return OpticalProps1scl(tau=props.tau[sl], grid=props.grid,
                                top_at_1=props.top_at_1)
    if isinstance(props, OpticalProps2str):
        return OpticalProps2str(tau=props.tau[sl], ssa=props.ssa[sl],
                                g=props.g[sl], grid=props.grid,
                                top_at_1=props.top_at_1)
    return OpticalPropsNstr(tau=props.tau[sl], ssa=props.ssa[sl],
                            p=props.p[:, sl], grid=props.grid,
                            top_at_1=props.top_at_1)


def to_1scl(props: OpticalProps) -> OpticalProps1scl:
    """Collapse scattering props to absorption-only optical depth
    tau_abs = tau (1 - ssa) (reference extract_subset_absorption_tau)."""
    if isinstance(props, OpticalProps1scl):
        return props
    return OpticalProps1scl(tau=props.tau * (1.0 - props.ssa), grid=props.grid,
                            top_at_1=props.top_at_1)


# ---------------------------------------------------------------------------
# validation (eager only)
# ---------------------------------------------------------------------------

def validate(props: OpticalProps) -> None:
    """Value checks mirroring reference ``validate()``
    (mo_optical_props.F90: tau >= 0; ssa, g in bounds). Raises ValueError.

    Concrete arrays are checked eagerly. Under jit (tracer values) the
    checks are skipped — the reference likewise disables check_values in
    performance paths (rrtmgp_allsky.F90:332-335) — unless
    ``config.set_checks(values_traced=True)``, in which case each check
    runs at execution time through ``jax.debug.callback`` and raises with
    the runtime values (a debugging aid: costs a host round-trip)."""
    import numpy as np

    from .config import get_config

    def check(tau, ssa, g):
        tau = np.asarray(tau)
        if np.any(tau < 0.0) or not np.all(np.isfinite(tau)):
            raise ValueError("validate: tau values out of range (negative or non-finite)")
        if ssa is not None:
            ssa = np.asarray(ssa)
            if np.any((ssa < 0.0) | (ssa > 1.0)):
                raise ValueError("validate: ssa values out of range [0,1]")
        if g is not None:
            g = np.asarray(g)
            if np.any((g < -1.0) | (g > 1.0)):
                raise ValueError("validate: g values out of range [-1,1]")

    ssa = props.ssa if isinstance(props, (OpticalProps2str, OpticalPropsNstr)) else None
    g = props.g if isinstance(props, OpticalProps2str) else None
    if isinstance(props.tau, jax.core.Tracer):
        if get_config().check_values_traced:
            jax.debug.callback(check, props.tau, ssa, g)
        return
    check(props.tau, ssa, g)
