"""Gray-radiative-equilibrium problem generator, the analytic LW oracle.

Mirrors the reference's self-contained unit-test setup
(tests/rte_lw_solver_unit_tests.F90:241-343, after Weaver & Ramanathan 1995):
an atmosphere whose Planck source is linear in optical depth satisfies
radiative equilibrium exactly, with OLR = 2 sigma T^4 / (2 + D tau).
"""
import jax.numpy as jnp
import numpy as np

from rte_rrtmgp_tpu import OpticalProps1scl, SourcesLW, SpectralGrid

SIGMA = 5.670374419e-8
D = 1.0 / 0.6096748751  # single-angle diffusivity secant (Gauss-Jacobi-5 n=1)

GRAY_GRID = SpectralGrid.from_arrays([[0.0, 3250.0]], [[1, 1]])


def gray_rad_equil_olr(sfc_t, total_tau):
    return (2.0 * SIGMA * np.asarray(sfc_t) ** 4) / (2.0 + D * np.asarray(total_tau))


def gray_rad_equil(sfc_t, total_tau, nlay, top_at_1=True, dtype=jnp.float64):
    """Build (OpticalProps1scl, SourcesLW) in gray radiative equilibrium."""
    sfc_t = np.asarray(sfc_t, dtype=np.float64)
    total_tau = np.asarray(total_tau, dtype=np.float64)
    ncol = sfc_t.shape[0]

    tau = np.broadcast_to((total_tau / nlay)[:, None, None], (ncol, nlay, 1)).copy()
    olr = gray_rad_equil_olr(sfc_t, total_tau)

    lev = np.zeros((ncol, nlay + 1, 1))
    lev[:, 0, 0] = 0.5 / np.pi * olr
    cum = np.cumsum(tau[:, :, 0], axis=1)
    lev[:, 1:, 0] = 0.5 / np.pi * olr[:, None] * (1.0 + D * cum)
    lay = 0.5 * (lev[:, 1:, :] + lev[:, :-1, :])

    sfc_src = (SIGMA / np.pi * sfc_t ** 4)[:, None]
    sfc_jac = (4.0 * SIGMA / np.pi * sfc_t ** 3)[:, None]

    if not top_at_1:
        tau = tau[:, ::-1]
        lev = lev[:, ::-1]
        lay = lay[:, ::-1]

    props = OpticalProps1scl(tau=jnp.asarray(tau, dtype), grid=GRAY_GRID,
                             top_at_1=top_at_1)
    sources = SourcesLW(
        lay_source=jnp.asarray(lay, dtype),
        lev_source=jnp.asarray(lev, dtype),
        sfc_source=jnp.asarray(sfc_src, dtype),
        sfc_source_jac=jnp.asarray(sfc_jac, dtype),
        grid=GRAY_GRID,
    )
    return props, sources
