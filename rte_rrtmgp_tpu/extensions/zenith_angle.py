"""Spherical-geometry solar zenith angle correction.

Equivalent of reference rte/extensions/mo_zenith_angle_spherical_correction.
F90:24-100: cosine of solar zenith angle as a function of height given a
reference value, from conservation of sin(theta) * (R + z) on a spherical
planet; clamped to 0 below the horizon.
"""
from __future__ import annotations

import jax.numpy as jnp

__all__ = ["zenith_angle_with_height", "EARTH_RADIUS"]

EARTH_RADIUS = 6371.23e3  # [m] (reference :26)


def zenith_angle_with_height(ref_alt, ref_mu, alt, *,
                             planet_radius: float = EARTH_RADIUS):
    """mu(z) given mu at a reference altitude (reference
    zenith_angle_with_height :32-82).

    ref_alt/ref_mu: (ncol,); alt: (ncol, nlev_or_nlay). Returns mu with
    alt's shape; 0 where the sun is below the geometric horizon.
    """
    if planet_radius <= 0:
        raise ValueError("planet_radius must be > 0")
    ref_alt = jnp.asarray(ref_alt)
    ref_mu = jnp.asarray(ref_mu, ref_alt.dtype)
    alt = jnp.asarray(alt, ref_alt.dtype)
    sin2 = (1.0 - ref_mu[:, None] ** 2) * (
        (planet_radius + ref_alt[:, None]) / (planet_radius + alt)) ** 2
    below = sin2 >= 1.0
    # the sqrt argument must be guarded with the TAKEN-branch value so
    # the backward pass never differentiates sqrt at 0 (0 * d sqrt(0) =
    # 0 * inf = NaN would poison the whole gradient)
    safe = jnp.where(below, 1.0, jnp.maximum(1.0 - sin2, 0.0))
    return jnp.where(below, 0.0, jnp.sqrt(safe))
