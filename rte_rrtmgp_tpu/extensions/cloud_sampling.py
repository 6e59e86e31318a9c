"""McICA cloud sampling.

Equivalent of reference rte/extensions/mo_cloud_sampling.F90:29-315:
generate per-g-point stochastic cloud masks under maximum-random or
exponential-random overlap from user-supplied uniform deviates, and apply
them to band-resolved cloud optical properties (``draw_samples``).

The reference's per-column sequential sweep becomes a ``lax.scan`` over
layers carrying the "active" random deviates; the cloudy-run bookkeeping
(findloc first/last) is unnecessary because layers with zero cloud
fraction produce False masks directly.
"""
from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from ..optical_props import (OpticalProps, OpticalProps1scl, OpticalProps2str,
                             OpticalPropsNstr)
from ..spectral import SpectralGrid

__all__ = ["sampled_mask_max_ran", "sampled_mask_exp_ran", "draw_samples"]


def _validate(randoms, cloud_frac, overlap_param=None):
    ncol, nlay, ngpt = randoms.shape
    if cloud_frac.shape != (ncol, nlay):
        raise ValueError("sampled_mask: randoms and cloud_frac sizes inconsistent")
    if overlap_param is not None and overlap_param.shape != (ncol, nlay - 1):
        raise ValueError("sampled_mask: overlap_param must be (ncol, nlay-1)")
    # reference range checks (mo_cloud_sampling.F90:152-155, :244-251);
    # repo convention: eager values validate, traced values are skipped
    import jax as _j
    import numpy as _np
    from ..config import get_config
    if not get_config().check_values:
        return
    if not isinstance(cloud_frac, _j.core.Tracer):
        cf = _np.asarray(cloud_frac)
        if _np.any((cf < 0.0) | (cf > 1.0)):
            raise ValueError("sampled_mask: cloud fraction values out of "
                             "range [0, 1]")
    if overlap_param is not None and not isinstance(overlap_param,
                                                    _j.core.Tracer):
        op = _np.asarray(overlap_param)
        if _np.any((op < -1.0) | (op > 1.0)):
            raise ValueError("sampled_mask: overlap_param values out of "
                             "range [-1, 1]")


def _mask_scan(randoms, cloud_frac, correlate):
    """Shared sweep: carry active deviates down the column; take fresh ones
    when the layer above is clear, otherwise reuse (max-ran) or correlate
    (exp-ran)."""
    randoms_s = jnp.moveaxis(randoms, 1, 0)        # (nlay, ncol, ngpt)
    cf_s = jnp.moveaxis(cloud_frac, 1, 0)          # (nlay, ncol)

    def step(carry, xs):
        prev_rands, prev_cloudy = carry
        rands, cf, rho = xs
        fresh = jnp.logical_not(prev_cloudy)[:, None]
        use = jnp.where(fresh, rands, correlate(prev_rands, rands, rho))
        cloudy = cf > 0.0
        mask = cloudy[:, None] & (use > (1.0 - cf)[:, None])
        return (use, cloudy), mask

    ncol, nlay, ngpt = randoms.shape
    rho_s = jnp.zeros((nlay, ncol), randoms.dtype)
    init = (randoms_s[0], jnp.zeros((ncol,), bool))
    return randoms_s, cf_s, rho_s, init, step


def sampled_mask_max_ran(randoms, cloud_frac):
    """Maximum-random overlap mask (reference sampled_mask_max_ran
    :125-192). randoms: (ncol, nlay, ngpt) uniform [0,1); cloud_frac:
    (ncol, nlay). Returns bool mask (ncol, nlay, ngpt)."""
    randoms = jnp.asarray(randoms)
    cloud_frac = jnp.asarray(cloud_frac, randoms.dtype)
    _validate(randoms, cloud_frac)

    def correlate(prev, new, rho):
        return prev  # maximum overlap: reuse deviates while cloudy

    randoms_s, cf_s, rho_s, init, step = _mask_scan(randoms, cloud_frac,
                                                    correlate)
    _, mask = lax.scan(step, init, (randoms_s, cf_s, rho_s))
    return jnp.moveaxis(mask, 0, 1)


def sampled_mask_exp_ran(randoms, cloud_frac, overlap_param):
    """Exponential-random overlap mask (reference sampled_mask_exp_ran
    :205-292). overlap_param: (ncol, nlay-1) correlation in [-1,1] between
    adjacent layers."""
    randoms = jnp.asarray(randoms)
    cloud_frac = jnp.asarray(cloud_frac, randoms.dtype)
    overlap_param = jnp.asarray(overlap_param, randoms.dtype)
    _validate(randoms, cloud_frac, overlap_param)

    def correlate(prev, new, rho):
        rho = rho[:, None]
        return (rho * (prev - 0.5)
                + jnp.sqrt(1.0 - rho * rho) * (new - 0.5) + 0.5)

    randoms_s, cf_s, _, init, step = _mask_scan(randoms, cloud_frac, correlate)
    # overlap_param[l-1] couples layers l-1 and l; layer 0 never correlates
    rho_s = jnp.concatenate([jnp.zeros((1,) + overlap_param.shape[:1]),
                             jnp.moveaxis(overlap_param, 1, 0)], axis=0)
    _, mask = lax.scan(step, init, (randoms_s, cf_s, rho_s))
    return jnp.moveaxis(mask, 0, 1)


def draw_samples(cloud_mask, clouds: OpticalProps,
                 target_grid: SpectralGrid) -> OpticalProps:
    """Apply a sampled mask to band-resolved cloud properties, producing
    g-point-resolved properties (reference draw_samples :36-120 +
    apply_cloud_mask :298-314): value = band value where cloudy, else 0."""
    if isinstance(clouds, OpticalPropsNstr):
        raise NotImplementedError("draw_samples: n-stream sampling not implemented")
    if not clouds.grid.bands_are_equal(target_grid):
        raise ValueError("draw_samples: spectral structures differ")
    ngpt = target_grid.ngpt
    if cloud_mask.shape[-1] != ngpt:
        raise ValueError("draw_samples: cloud mask ngpt mismatch")
    if clouds.tau.shape[-1] != clouds.grid.nband:
        # the reference's typed interface dimensions the input as
        # (ncol, nlay, nbnd); a g-point-resolved field would silently
        # mis-gather (band indices into a g-point axis)
        raise ValueError("draw_samples: cloud properties must be "
                         "band-resolved (last axis nbnd)")
    g2b = target_grid.gpt2band

    def sample(field):
        return jnp.where(cloud_mask, field[..., g2b], 0.0)

    if isinstance(clouds, OpticalProps1scl):
        return OpticalProps1scl(tau=sample(clouds.tau), grid=target_grid,
                                top_at_1=clouds.top_at_1)
    return OpticalProps2str(tau=sample(clouds.tau), ssa=sample(clouds.ssa),
                            g=sample(clouds.g), grid=target_grid,
                            top_at_1=clouds.top_at_1)
