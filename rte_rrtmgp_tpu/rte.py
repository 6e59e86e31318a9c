"""Top-level RTE drivers: ``rte_lw`` and ``rte_sw``.

Behavioral equivalents of reference rte/frontend/mo_rte_lw.F90:79-473 and
mo_rte_sw.F90:56-394: validate inputs, expand band boundary conditions to
g-points, dispatch on the optical-props flavor, and reduce fluxes.

Differences from the reference, by TPU-first design:
  * Errors surface as Python exceptions at trace time (the reference returns
    error strings); value validation is eager-only via ``ops``/config flags.
  * Fluxes are returned as a :class:`~rte_rrtmgp_tpu.fluxes.Fluxes` pytree;
    broadband is the default (the reference's in-solver fast path,
    mo_rte_lw.F90:290-322); ``spectral=True`` returns per-g-point fluxes
    for byband/bygpoint reductions.
  * Boundary fields are column-leading: sfc_emis/albedos are (ncol, nband)
    or (ncol, ngpt) (the reference uses (nband, ncol) + expand_and_transpose,
    mo_rte_lw.F90:478-501).
"""
from __future__ import annotations


import jax
import jax.numpy as jnp

import numpy as np

from .config import get_config
from .fluxes import Fluxes, sum_byband
from .optical_props import (OpticalProps, OpticalProps1scl, OpticalProps2str,
                            OpticalPropsNstr, validate as validate_props)
from .sources import SourcesLW
from .ops.solver_lw import (GAUSS_DS, GAUSS_WTS, lw_solver_noscat,
                            lw_solver_2stream)
from .ops.solver_sw import sw_solver_2stream, sw_solver_noscat

__all__ = ["rte_lw", "rte_sw"]


def _uniform_band_width(grid):
    """The common band width when every band spans the same number of
    g-points AND bands are contiguous ascending from g-point 1
    (production k-distributions: 16), else None. Contiguity matters:
    the in-solver byband fast path reduces by reshape(nband, width),
    which assumes band b owns g-points [b*w+1, (b+1)*w] — a reordered
    grid must take the gpt2band reduction path instead."""
    lims = np.asarray(grid.band_lims_gpt_array)
    widths = lims[:, 1] - lims[:, 0] + 1
    w = int(widths[0])
    if not (widths == w).all():
        return None
    starts = np.arange(lims.shape[0]) * w + 1
    if not (lims[:, 0] == starts).all():
        return None
    return w


def _expand_bc(arr, grid, ncol, what):
    """Expand a boundary field given per band or per g-point to (ncol, ngpt)."""
    arr = jnp.asarray(arr)
    if arr.ndim != 2 or arr.shape[0] != ncol:
        raise ValueError(f"rte: {what} must be (ncol, nband) or (ncol, ngpt); got {arr.shape}")
    if arr.shape[1] == grid.ngpt:
        return arr
    if arr.shape[1] == 1:  # gray/spectrally-flat boundary value
        return jnp.broadcast_to(arr, (ncol, grid.ngpt))
    if arr.shape[1] == grid.nband:
        return arr[:, grid.gpt2band]
    raise ValueError(f"rte: {what} has {arr.shape[1]} spectral points; "
                     f"expected nband={grid.nband} or ngpt={grid.ngpt}")


def rte_lw(optical_props: OpticalProps,
           sources: SourcesLW,
           sfc_emis,
           *,
           inc_flux=None,
           n_gauss_angles: int = 1,
           use_2stream: bool = False,
           lw_ds=None,
           compute_jacobian: bool = False,
           spectral: bool = False,
           byband: bool = False) -> Fluxes:
    """Longwave flux driver (reference ``rte_lw``, mo_rte_lw.F90:79-473).

    Dispatch (reference :242-257):
      * 1scl -> no-scattering multi-angle Gauss-Jacobi quadrature
        (1-4 angles) or user secants ``lw_ds`` (ncol, ngpt).
      * 2str, use_2stream=False (default) -> rescaled no-scattering
        (Tang 2018); Jacobian allowed.
      * 2str, use_2stream=True -> true two-stream + adding; no Jacobian.
      * nstr -> not implemented (matches reference :431).

    ``byband=True`` returns per-band flux sums (ncol, nlev, nband) —
    the ty_fluxes_byband reduction (mo_fluxes_byband.F90:159-219),
    accumulated in-solver on the Pallas path for uniform band widths.
    """
    cfg = get_config()
    grid = optical_props.grid
    ncol, nlay, ngpt = optical_props.tau.shape
    top_at_1 = optical_props.top_at_1

    if sources.lay_source.shape != (ncol, nlay, ngpt):
        raise ValueError(f"rte_lw: sources lay_source shape {sources.lay_source.shape} "
                         f"!= {(ncol, nlay, ngpt)}")
    if sources.lev_source.shape != (ncol, nlay + 1, ngpt):
        raise ValueError("rte_lw: sources lev_source inconsistently sized")
    if not (1 <= n_gauss_angles <= len(GAUSS_DS)):
        raise ValueError(f"rte_lw: n_gauss_angles must be in 1..{len(GAUSS_DS)}")
    if isinstance(optical_props, OpticalPropsNstr):
        raise NotImplementedError("rte_lw: n-stream solver not yet implemented")
    if use_2stream and isinstance(optical_props, OpticalProps1scl):
        raise ValueError("rte_lw: can't use two-stream methods with only absorption optical depth")
    if use_2stream and compute_jacobian:
        raise ValueError("rte_lw: can't provide Jacobian of fluxes with 2-stream")
    if lw_ds is not None:
        if not isinstance(optical_props, OpticalProps1scl):
            raise ValueError("rte_lw: lw_ds not valid when providing scattering optical properties")
        if n_gauss_angles != 1:
            raise ValueError("rte_lw: providing lw_ds incompatible with specifying n_gauss_angles")
    if byband and spectral:
        raise ValueError("rte_lw: byband and spectral are mutually exclusive")
    if cfg.check_values:
        validate_props(optical_props)

    bw = _uniform_band_width(grid) if byband else None
    reduce_byband = byband and bw is None      # ragged bands: reduce after

    sfc_emis_g = _expand_bc(sfc_emis, grid, ncol, "sfc_emis")
    dtype = optical_props.tau.dtype
    if inc_flux is None:
        inc = jnp.zeros((ncol, ngpt), dtype)
    else:
        inc = _expand_bc(inc_flux, grid, ncol, "inc_flux")

    if isinstance(optical_props, OpticalProps2str) and use_2stream:
        res = lw_solver_2stream(
            optical_props.tau, optical_props.ssa, optical_props.g,
            sources.lay_source, sources.lev_source, sfc_emis_g,
            sources.sfc_source, inc, top_at_1=top_at_1,
            spectral=spectral or reduce_byband, byband_width=bw)
        if reduce_byband:
            res = type(res)(flux_up=sum_byband(res.flux_up, grid),
                            flux_dn=sum_byband(res.flux_dn, grid),
                            flux_up_jac=res.flux_up_jac)
    else:
        if lw_ds is not None:
            ds = jnp.broadcast_to(jnp.asarray(lw_ds, dtype), (ncol, ngpt))[None]
            weights = (GAUSS_WTS[0][0],)
        else:
            n = n_gauss_angles
            ds = jnp.asarray(GAUSS_DS[n - 1], dtype)
            weights = GAUSS_WTS[n - 1]
        rescale = isinstance(optical_props, OpticalProps2str)
        res = lw_solver_noscat(
            optical_props.tau, sources.lay_source, sources.lev_source,
            sfc_emis_g, sources.sfc_source, inc,
            top_at_1=top_at_1, ds=ds, weights=weights,
            sfc_src_jac=sources.sfc_source_jac,
            ssa=optical_props.ssa if rescale else None,
            g=optical_props.g if rescale else None,
            do_rescaling=rescale,
            do_jacobians=compute_jacobian,
            spectral=spectral or reduce_byband,
            byband_width=bw)
        if reduce_byband:
            res = type(res)(flux_up=sum_byband(res.flux_up, grid),
                            flux_dn=sum_byband(res.flux_dn, grid),
                            flux_up_jac=res.flux_up_jac)

    jac = res.flux_up_jac
    if jac is not None and jac.shape[-1] == ngpt and not spectral:
        # the Jacobian is BROADBAND at every non-spectral resolution
        # (the reference's dF/dT_sfc is broadband-only); the ragged
        # byband path solves spectrally for the flux reduction and must
        # reduce the Jacobian all the way down to match the uniform
        # fast path's output
        jac = jnp.sum(jac, axis=-1)
    return Fluxes(flux_up=res.flux_up, flux_dn=res.flux_dn,
                  flux_net=res.flux_dn - res.flux_up,
                  flux_up_jac=jac)


def rte_sw(optical_props: OpticalProps,
           mu0,
           inc_flux,
           sfc_alb_dir,
           sfc_alb_dif,
           *,
           inc_flux_dif=None,
           spectral: bool = False,
           byband: bool = False) -> Fluxes:
    """Shortwave flux driver (reference ``rte_sw``, mo_rte_sw.F90:56-394).

    mu0: cosine of solar zenith angle, (ncol,) or (ncol, nlay) for spherical
    geometry (reference rte_sw_mu0_bycol / rte_sw_mu0_full).
    inc_flux: direct-beam incident flux (ncol, ngpt).
    Dispatch: 1scl -> direct beam only; 2str -> two-stream + adding.
    ``byband=True`` returns per-band flux sums (mo_fluxes_byband.F90),
    in-solver on the Pallas path for uniform band widths.
    """
    cfg = get_config()
    if byband and spectral:
        raise ValueError("rte_sw: byband and spectral are mutually exclusive")
    grid = optical_props.grid
    ncol, nlay, ngpt = optical_props.tau.shape
    top_at_1 = optical_props.top_at_1
    dtype = optical_props.tau.dtype

    mu0 = jnp.asarray(mu0, dtype)
    if mu0.ndim == 1:
        mu0 = jnp.broadcast_to(mu0[:, None], (ncol, nlay))
    elif mu0.shape != (ncol, nlay):
        raise ValueError(f"rte_sw: mu0 shape {mu0.shape} != (ncol,) or (ncol, nlay)")
    if cfg.check_values:
        # validate_props skips traced values itself (rte_lw does the
        # same) — don't let a traced mu0 suppress checks on concrete
        # optical properties
        validate_props(optical_props)
        if not isinstance(mu0, jax.core.Tracer):
            m = np.asarray(mu0)
            if np.any((m < -1.0) | (m > 1.0)):
                raise ValueError("rte_sw: one or more mu0 < -1 or > 1")

    inc = _expand_bc(inc_flux, grid, ncol, "inc_flux")

    if isinstance(optical_props, OpticalProps1scl):
        if inc_flux_dif is not None:
            raise ValueError(
                "rte_sw: inc_flux_dif requires scattering optical "
                "properties (the absorption-only solver computes the "
                "direct beam only and would silently drop it)")
        flux_dir = sw_solver_noscat(optical_props.tau, mu0, inc, top_at_1=top_at_1)
        if byband:
            flux_dir = sum_byband(flux_dir, grid)
        elif not spectral:
            flux_dir = jnp.sum(flux_dir, axis=-1)
        zeros = jnp.zeros_like(flux_dir)
        return Fluxes(flux_up=zeros, flux_dn=flux_dir,
                      flux_net=flux_dir, flux_dn_dir=flux_dir)
    if isinstance(optical_props, OpticalPropsNstr):
        raise NotImplementedError("rte_sw: n-stream solver not yet implemented")

    alb_dir = _expand_bc(sfc_alb_dir, grid, ncol, "sfc_alb_dir")
    alb_dif = _expand_bc(sfc_alb_dif, grid, ncol, "sfc_alb_dif")
    dif = None if inc_flux_dif is None else _expand_bc(inc_flux_dif, grid, ncol, "inc_flux_dif")

    bw = _uniform_band_width(grid) if byband else None
    reduce_byband = byband and bw is None
    res = sw_solver_2stream(optical_props.tau, optical_props.ssa,
                            optical_props.g, mu0, alb_dir, alb_dif, inc,
                            top_at_1=top_at_1, inc_flux_dif=dif,
                            spectral=spectral or reduce_byband,
                            byband_width=bw)
    if reduce_byband:
        res = type(res)(flux_up=sum_byband(res.flux_up, grid),
                        flux_dn=sum_byband(res.flux_dn, grid),
                        flux_dir=sum_byband(res.flux_dir, grid))
    return Fluxes(flux_up=res.flux_up, flux_dn=res.flux_dn,
                  flux_net=res.flux_dn - res.flux_up,
                  flux_dn_dir=res.flux_dir)
