"""Multi-device sharding equivalence (8 virtual CPU devices via conftest).

The reference scales by host-side column blocking and never tests
distribution; here sharded-vs-single-device agreement is a first-class
invariant (SURVEY.md section 4): solving on a column-sharded Mesh must
reproduce the single-device fluxes, with no collectives on the solve path.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from rte_rrtmgp_tpu.drivers.allsky import (allsky_step_lw, allsky_step_sw,
                                           make_allsky_inputs)
from rte_rrtmgp_tpu.models.rrtmgp.gas_optics import GasOpticsRRTMGP
from rte_rrtmgp_tpu.parallel.mesh import (column_mesh, column_sharding,
                                          pad_columns, shard_columns)
from rte_rrtmgp_tpu.utils.synthetic import (synthetic_cloud_optics,
                                            synthetic_kdist)

NDEV = len(jax.devices())
pytestmark = pytest.mark.skipif(NDEV < 2, reason="needs multi-device backend")

NCOL, NLAY = 8 * NDEV, 12


@pytest.fixture(scope="module")
def problem():
    kd_lw = synthetic_kdist(sw=False, ngpt=32, nbnd=4, ntemp=5, npres=10)
    kd_sw = synthetic_kdist(sw=True, ngpt=16, nbnd=2, ntemp=5, npres=10)
    gas_lw = GasOpticsRRTMGP(kd_lw)
    gas_sw = GasOpticsRRTMGP(kd_sw)
    cld = synthetic_cloud_optics(nbnd=4,
                                 band_lims_wvn=kd_lw.grid.band_lims_wvn_array)
    cld_sw = synthetic_cloud_optics(nbnd=2,
                                    band_lims_wvn=kd_sw.grid.band_lims_wvn_array)
    inputs = make_allsky_inputs(NCOL, NLAY, cloud_optics=cld)
    return gas_lw, gas_sw, cld, cld_sw, inputs


def _shard_inputs(inputs, mesh):
    def shardable(x):
        return hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == NCOL

    return jax.tree_util.tree_map(
        lambda x: jax.device_put(
            x, NamedSharding(mesh, P("columns", *([None] * (x.ndim - 1)))))
        if shardable(x) else x, inputs)


def test_lw_sharded_matches_single_device(problem):
    gas_lw, _, cld, _, inputs = problem
    step = jax.jit(lambda i: allsky_step_lw(i, gas_lw, cloud_optics=cld))
    ref = step(inputs)

    mesh = column_mesh()
    sharded = _shard_inputs(inputs, mesh)
    out = jax.jit(lambda i: allsky_step_lw(i, gas_lw, cloud_optics=cld),
                  out_shardings=jax.tree_util.tree_map(
                      lambda _: column_sharding(mesh), ref))(sharded)
    assert len(out.flux_up.sharding.device_set) == NDEV
    np.testing.assert_allclose(np.asarray(out.flux_up),
                               np.asarray(ref.flux_up), rtol=5e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.flux_dn),
                               np.asarray(ref.flux_dn), rtol=5e-6, atol=1e-6)


def test_sw_sharded_matches_single_device(problem):
    _, gas_sw, _, cld_sw, inputs = problem
    step = jax.jit(lambda i: allsky_step_sw(i, gas_sw, cloud_optics=cld_sw))
    ref = step(inputs)
    mesh = column_mesh()
    out = step(_shard_inputs(inputs, mesh))
    np.testing.assert_allclose(np.asarray(out.flux_up),
                               np.asarray(ref.flux_up), rtol=5e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.flux_dn_dir),
                               np.asarray(ref.flux_dn_dir), rtol=5e-6,
                               atol=1e-6)


def test_shard_columns_tree(problem):
    *_, inputs = problem
    mesh = column_mesh()
    sharded = shard_columns(inputs.play, mesh)
    assert len(sharded.sharding.device_set) == NDEV
    np.testing.assert_array_equal(np.asarray(sharded), np.asarray(inputs.play))


def test_pad_columns():
    a = np.arange(10, dtype=np.float32)[:, None] * np.ones((1, 3), np.float32)
    padded, n = pad_columns(a, 8)
    assert padded.shape == (16, 3) and n == 10
    np.testing.assert_array_equal(padded[:10], a)
    np.testing.assert_array_equal(padded[10:], np.broadcast_to(a[-1:], (6, 3)))
    same, n2 = pad_columns(a[:8], 8)
    assert same.shape == (8, 3) and n2 == 8


def test_fused_kernels_under_shard_map():
    """The Pallas fused paths must run per-shard under jax.shard_map
    (GSPMD cannot partition custom calls) and match the single-device
    result. Kernels run in interpreter mode on the CPU mesh."""
    from rte_rrtmgp_tpu.config import set_use_pallas
    from rte_rrtmgp_tpu.parallel.mesh import shard_map_columns

    kd_lw = synthetic_kdist(sw=False, ngpt=16, nbnd=2, ntemp=5, npres=10)
    kd_sw = synthetic_kdist(sw=True, ngpt=16, nbnd=2, ntemp=5, npres=10)
    g_lw, g_sw = GasOpticsRRTMGP(kd_lw), GasOpticsRRTMGP(kd_sw)
    cld = synthetic_cloud_optics(
        nbnd=2, band_lims_wvn=kd_lw.grid.band_lims_wvn_array)
    ncol = 16 * NDEV
    inputs = make_allsky_inputs(ncol, 4, cloud_optics=cld)
    mesh = column_mesh()

    def step(i):
        lw = allsky_step_lw(i, g_lw, cloud_optics=cld)
        sw = allsky_step_sw(i, g_sw, cloud_optics=cld)
        return lw.flux_up, lw.flux_dn, sw.flux_up, sw.flux_dn

    set_use_pallas(True)
    try:
        single = jax.jit(step)(inputs)
        sharded = jax.jit(shard_map_columns(step, mesh, ncol))(inputs)
    finally:
        set_use_pallas(None)
    for a, b in zip(sharded, single):
        assert len(a.sharding.device_set) == NDEV or NDEV == 1
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=5e-4)


def test_sharded_gradient_matches_single_device():
    """The training step: jax.grad of a column-summed broadband loss per
    shard under shard_map (the fused kernels' custom VJPs composing with
    shard_map + jit) equals the single-device gradient — the loss is a
    sum over columns, so per-shard gradients of the local loss ARE the
    global gradient, with no backward collectives."""
    import jax.numpy as jnp

    from rte_rrtmgp_tpu.config import set_use_pallas
    from rte_rrtmgp_tpu.parallel.mesh import shard_map_columns

    kd_lw = synthetic_kdist(sw=False, ngpt=16, nbnd=2, ntemp=5, npres=10)
    g_lw = GasOpticsRRTMGP(kd_lw)
    cld = synthetic_cloud_optics(
        nbnd=2, band_lims_wvn=kd_lw.grid.band_lims_wvn_array)
    ncol = 16 * NDEV
    inputs = make_allsky_inputs(ncol, 4, cloud_optics=cld)
    mesh = column_mesh()

    def grad_step(i):
        def local_loss(tlay):
            f = allsky_step_lw(i._replace(tlay=tlay), g_lw,
                               cloud_optics=cld)
            return jnp.sum(f.flux_up) + 0.5 * jnp.sum(f.flux_dn)
        return jax.grad(local_loss)(i.tlay)

    set_use_pallas(True)
    try:
        single = jax.jit(grad_step)(inputs)
        sharded = jax.jit(shard_map_columns(grad_step, mesh, ncol))(inputs)
    finally:
        set_use_pallas(None)
    assert len(sharded.sharding.device_set) == NDEV or NDEV == 1
    a, b = np.asarray(sharded), np.asarray(single)
    assert np.all(np.isfinite(a)) and np.any(b != 0.0)
    np.testing.assert_allclose(a, b, rtol=2e-5, atol=1e-6)
