"""Round-5 regression tests: the advisor's secant-handling findings and
the shared minor-gas accumulation pass (ops/pallas/fused_minors.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rte_rrtmgp_tpu.config import set_use_pallas
from rte_rrtmgp_tpu.models.rrtmgp.gas_optics import GasOpticsRRTMGP
from rte_rrtmgp_tpu.ops.pallas import fused_minors
from rte_rrtmgp_tpu.utils.synthetic import (synthetic_cloud_optics,
                                            synthetic_kdist)


def _lw_problem(ncol=4, nlay=6, ngpt=16, seed=3):
    rng = np.random.default_rng(seed)
    f32 = jnp.float32
    return dict(
        tau=jnp.asarray(rng.uniform(0.05, 2.0, (ncol, nlay, ngpt)), f32),
        lay=jnp.asarray(rng.uniform(5.0, 20.0, (ncol, nlay, ngpt)), f32),
        lev=jnp.asarray(rng.uniform(5.0, 20.0, (ncol, nlay + 1, ngpt)), f32),
        emis=jnp.full((ncol, ngpt), 0.95, f32),
        ssrc=jnp.asarray(rng.uniform(10.0, 30.0, (ncol, ngpt)), f32),
        inc=jnp.zeros((ncol, ngpt), f32))


def test_grad_wrt_traced_secant():
    """Differentiating w.r.t. the diffusivity secant passes a tuple
    containing a TRACED scalar as ds; static extraction must fall back to
    the traced path instead of raising ConcretizationTypeError
    (ADVICE round 4, ops/solver_lw.py static_ds extraction)."""
    from rte_rrtmgp_tpu.ops.solver_lw import lw_solver_noscat

    p = _lw_problem()

    def loss(ds_scalar):
        f = lw_solver_noscat(p["tau"], p["lay"], p["lev"], p["emis"],
                             p["ssrc"], p["inc"], top_at_1=True,
                             ds=(ds_scalar,), weights=(0.5,))
        return jnp.sum(f.flux_up)

    g = jax.jit(jax.grad(loss))(jnp.float32(1.66))
    assert np.isfinite(float(g)) and float(g) != 0.0
    # finite-difference cross-check
    eps = 1e-2
    fd = (loss(jnp.float32(1.66 + eps)) - loss(jnp.float32(1.66 - eps))) \
        / (2 * eps)
    np.testing.assert_allclose(float(g), float(fd), rtol=5e-2)


def test_concrete_array_secant_matches_tuple():
    """A CONCRETE 1-D jax.Array ds must take the same static-secant path
    as a Python tuple (ADVICE round 4: isinstance(ds, jax.Array) silently
    downgraded it to the XLA-retrace backward)."""
    from rte_rrtmgp_tpu.ops.solver_lw import lw_solver_noscat

    p = _lw_problem(seed=5)
    kw = dict(top_at_1=True, weights=(0.5,))
    f_tuple = lw_solver_noscat(p["tau"], p["lay"], p["lev"], p["emis"],
                               p["ssrc"], p["inc"], ds=(1.66,), **kw)
    f_array = lw_solver_noscat(p["tau"], p["lay"], p["lev"], p["emis"],
                               p["ssrc"], p["inc"],
                               ds=jnp.asarray([1.66], jnp.float32), **kw)
    np.testing.assert_array_equal(np.asarray(f_tuple.flux_up),
                                  np.asarray(f_array.flux_up))
    np.testing.assert_array_equal(np.asarray(f_tuple.flux_dn),
                                  np.asarray(f_array.flux_dn))


def test_unroll_env_read_at_trace_time(monkeypatch):
    """RTE_SOLVE_UNROLL is read when the kernel is TRACED, not at module
    import (ADVICE round 4); deep grids auto-roll past UNROLL_MAX_NLAY."""
    from rte_rrtmgp_tpu.ops.pallas import solver_lanes

    calls = []
    real = jax.lax.fori_loop

    def spy(lo, hi, body, init, unroll=None):
        calls.append(unroll)
        return real(lo, hi, body, init, unroll=unroll)

    monkeypatch.setattr(jax.lax, "fori_loop", spy)
    monkeypatch.setenv("RTE_SOLVE_UNROLL", "1")
    solver_lanes._loop(8, lambda l, c: c)
    assert calls[-1] == 1
    monkeypatch.setenv("RTE_SOLVE_UNROLL", "0")
    solver_lanes._loop(8, lambda l, c: c)
    assert calls[-1] == 8
    # auto-roll above the compile-time bound
    monkeypatch.setattr(solver_lanes, "UNROLL_MAX_NLAY", 4)
    solver_lanes._loop(8, lambda l, c: c)
    assert calls[-1] == 1
    # module attribute overrides the env
    monkeypatch.setattr(solver_lanes, "UNROLL_MAX_NLAY", 512)
    monkeypatch.setattr(solver_lanes, "UNROLL", 1)
    solver_lanes._loop(8, lambda l, c: c)
    assert calls[-1] == 1


@pytest.mark.parametrize("sw", [False, True])
def test_minor_modes_equivalent(sw):
    """The three minor-accumulation lowerings (rmw / vreg / flat) are the
    same numerics (exactness argument in fused_minors.py: scaling rows
    are zero off-atmosphere); outputs agree to f32 reordering."""
    from rte_rrtmgp_tpu.drivers.allsky import (allsky_step_lw_lanes,
                                               allsky_step_sw_lanes,
                                               make_allsky_inputs)

    kd = synthetic_kdist(sw=sw, ngpt=32, nbnd=4, ntemp=6, npres=12)
    gop = GasOpticsRRTMGP(kd)
    cld = synthetic_cloud_optics(nbnd=4,
                                 band_lims_wvn=kd.grid.band_lims_wvn_array)
    inputs = make_allsky_inputs(128, 4, cloud_optics=cld)
    fused_fn = allsky_step_sw_lanes if sw else allsky_step_lw_lanes

    outs = {}
    set_use_pallas(True)
    try:
        for mode in ("rmw", "vreg", "flat", "rmw_u"):
            fused_minors.set_mode(mode)
            try:
                outs[mode] = fused_fn(inputs, gop, cloud_optics=cld,
                                      use_clouds=True)
            finally:
                fused_minors.set_mode(None)
            assert outs[mode] is not None
    finally:
        set_use_pallas(None)

    ref = outs["rmw"]
    for mode in ("vreg", "flat", "rmw_u"):
        for name in ("flux_up", "flux_dn"):
            np.testing.assert_allclose(
                np.asarray(getattr(outs[mode], name)),
                np.asarray(getattr(ref, name)), rtol=1e-5, atol=1e-4,
                err_msg=f"mode={mode} {name} sw={sw}")


def test_minor_mode_rejects_unknown(monkeypatch):
    monkeypatch.setenv("RTE_MINOR_MODE", "bogus")
    with pytest.raises(ValueError, match="minor accumulation mode"):
        fused_minors._resolve_mode()


def _sw_edge_problem(dtype):
    rng = np.random.default_rng(0)
    ncol, nlay, ngpt = 6, 5, 16
    tau = rng.uniform(0.1, 2.0, (ncol, nlay, ngpt))
    tau[0] = 1e-8          # near-transparent column
    tau[1] = 80.0          # optically enormous column
    mu0 = np.full((ncol, nlay), 0.6)
    mu0[2] = -0.3          # night column
    mu0[3] = 0.0           # terminator
    return dict(
        tau=jnp.asarray(tau, dtype),
        ssa=jnp.asarray(rng.uniform(0.2, 0.9, (ncol, nlay, ngpt)), dtype),
        g=jnp.asarray(rng.uniform(0.0, 0.8, (ncol, nlay, ngpt)), dtype),
        mu0=jnp.asarray(mu0, dtype),
        alb=jnp.full((ncol, ngpt), 0.2, dtype),
        inc=jnp.asarray(rng.uniform(1.0, 5.0, (ncol, ngpt)), dtype))


@pytest.mark.parametrize("use_pallas", [False, True])
def test_sw_gradient_finite_at_edges(use_pallas):
    """Gradients through the SW two-stream solve stay FINITE for night
    columns (mu0<0), the terminator (mu0=0), near-zero tau, and huge tau
    — on both the XLA path and the adjoint-kernel path. (At tau ~ 1e-8
    the f32 d/dtau is ill-conditioned in BOTH formulations — measured
    -10.9 XLA vs -24.6 kernel vs the true f64 value -13.41 — so no f32
    cross-path gate at extremes; the f64 gate below pins exactness.)"""
    from rte_rrtmgp_tpu.ops.solver_sw import sw_solver_2stream

    p = _sw_edge_problem(jnp.float32)

    def loss(tau, ssa, g, mu0):
        set_use_pallas(use_pallas)
        try:
            f = sw_solver_2stream(tau, ssa, g, mu0, p["alb"], p["alb"],
                                  p["inc"], top_at_1=True)
        finally:
            set_use_pallas(None)
        return (jnp.sum(f.flux_up) + jnp.sum(f.flux_dn)
                + jnp.sum(f.flux_dir))

    gs = jax.grad(loss, argnums=(0, 1, 2, 3))(p["tau"], p["ssa"], p["g"],
                                              p["mu0"])
    for name, arr in zip(("tau", "ssa", "g", "mu0"), gs):
        a = np.asarray(arr)
        assert np.isfinite(a).all(), f"non-finite d/d{name}"
    # night column's fluxes are zero, so its tau gradient vanishes
    assert np.all(np.asarray(gs[0])[2] == 0.0)


def test_sw_gradient_edges_exact_f64():
    """At the same edge cases, the hand-derived SW adjoint kernel equals
    XLA autodiff to ~1e-12 in float64: the derivation is exact even
    where f32 conditioning is catastrophic."""
    from rte_rrtmgp_tpu.ops.solver_sw import sw_solver_2stream

    # x64 is enabled globally in conftest.py
    p = _sw_edge_problem(jnp.float64)

    def make(use_pallas):
        def loss(tau, ssa, g, mu0):
            set_use_pallas(use_pallas)
            try:
                f = sw_solver_2stream(tau, ssa, g, mu0, p["alb"],
                                      p["alb"], p["inc"], top_at_1=True)
            finally:
                set_use_pallas(None)
            return (jnp.sum(f.flux_up) + jnp.sum(f.flux_dn)
                    + jnp.sum(f.flux_dir))
        return loss

    gx = jax.grad(make(False), argnums=(0, 1, 2, 3))(
        p["tau"], p["ssa"], p["g"], p["mu0"])
    gk = jax.grad(make(True), argnums=(0, 1, 2, 3))(
        p["tau"], p["ssa"], p["g"], p["mu0"])
    for name, a, b in zip(("tau", "ssa", "g", "mu0"), gx, gk):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-10, atol=1e-10,
                                   err_msg=f"d/d{name}")


def test_clear_sky_fused_adjoint_grad():
    """Clear-sky (no cloud) gradients through the fused adjoint kernels
    previously CRASHED: the custom-VJP backward returned (nbnd, ...)
    cloud cotangents for the (1, ...) dummy primals (round-5 review).
    Gradients must run and match the XLA-retrace backward."""
    from rte_rrtmgp_tpu.config import set_fused_adjoint
    from rte_rrtmgp_tpu.drivers.allsky import (allsky_step_lw,
                                               allsky_step_sw,
                                               make_allsky_inputs)

    kd_lw = synthetic_kdist(sw=False, ngpt=32, nbnd=4, ntemp=5, npres=10)
    kd_sw = synthetic_kdist(sw=True, ngpt=32, nbnd=4, ntemp=5, npres=10)
    g_lw, g_sw = GasOpticsRRTMGP(kd_lw), GasOpticsRRTMGP(kd_sw)
    inp = make_allsky_inputs(128, 8)

    def make(kernel_adjoint):
        def loss(tlay):
            i = inp._replace(tlay=tlay)
            set_use_pallas(True)
            set_fused_adjoint(kernel_adjoint)
            try:
                flw = allsky_step_lw(i, g_lw, use_clouds=False)
                fsw = allsky_step_sw(i, g_sw, use_clouds=False)
            finally:
                set_use_pallas(None)
                set_fused_adjoint(None)
            return jnp.sum(flw.flux_up) + jnp.sum(fsw.flux_up)
        return loss

    gk = np.asarray(jax.grad(make(True))(inp.tlay))
    gx = np.asarray(jax.grad(make(False))(inp.tlay))
    assert np.isfinite(gk).all() and np.any(gk != 0.0)
    np.testing.assert_allclose(gk, gx, rtol=2e-3, atol=2e-4)


def test_blocked_eligibility_checks_block_grouping():
    """Fused-path eligibility for BLOCKED RFMIP runs must be evaluated on
    each block's own 128-column lane grouping: a column set whose
    aligned full-array groups are pressure-uniform can still produce a
    mixed group inside a non-128-aligned block, which would NaN-poison
    that block's fluxes at solve time (round-5 review)."""
    from rte_rrtmgp_tpu.drivers.rfmip import _fused_window_ok

    kd = synthetic_kdist(sw=False, ngpt=32, nbnd=4, ntemp=6, npres=40)
    gas = GasOpticsRRTMGP(kd)
    # columns 0-127 near the surface, 128-255 at much lower pressure:
    # aligned groups are each uniform; the block starting at column 96
    # mixes the two regimes in one lane group
    nlay = 4
    p_hi = np.geomspace(1000e2, 900e2, nlay)
    p_lo = np.geomspace(100e2, 90e2, nlay)
    play = np.concatenate([np.tile(p_hi, (128, 1)),
                           np.tile(p_lo, (128, 1))], axis=0)
    play = np.ascontiguousarray(play[:, ::-1])  # top_at_1
    assert _fused_window_ok(gas, play, True) is True
    assert _fused_window_ok(gas, play, True, block_size=128) is True
    assert _fused_window_ok(gas, play, True, block_size=96) is False


def test_col_gas_h2o_absent_yields_zero_column():
    """A k-distribution without 'h2o' in gas_names: idx_gas returns -1,
    and col_gas[idx_h2o] previously wrapped (Python negative indexing)
    to the LAST gas — silently using e.g. n2 as water vapor in the
    minor-gas dry_fact and Rayleigh scaling (round-5 review). The
    returned index must now select an all-zeros column."""
    from types import SimpleNamespace
    from rte_rrtmgp_tpu.gas_concs import GasConcs

    class KD:
        gas_names = ("co2", "n2")

        def idx_gas(self, name):
            key = name.lower()
            return (self.gas_names.index(key) + 1
                    if key in self.gas_names else -1)

    self_stub = SimpleNamespace(kdist=KD())
    ncol, nlay = 3, 4
    play = jnp.full((ncol, nlay), 500e2, jnp.float32)
    plev = jnp.broadcast_to(
        jnp.linspace(1000e2, 100e2, nlay + 1, dtype=jnp.float32)[None],
        (ncol, nlay + 1))
    tlay = jnp.full((ncol, nlay), 270.0, jnp.float32)
    gc = GasConcs.empty().set_vmr("co2", 400e-6).set_vmr("n2", 0.78)

    col_gas, col_dry, idx_h2o = GasOpticsRRTMGP._col_gas(
        self_stub, play, plev, tlay, gc, None)
    assert idx_h2o >= 0
    h2o_col = np.asarray(col_gas[idx_h2o])
    assert np.all(h2o_col == 0.0), "h2o column must be zero when absent"
    # and the real gases are untouched
    assert np.all(np.asarray(col_gas[KD().idx_gas("n2")]) > 0.0)


def test_zenith_angle_gradient_finite_below_horizon():
    """zenith_angle_with_height previously produced NaN gradients when
    any cell had the sun below the geometric horizon (0 * d sqrt(0) in
    the backward pass of the single-where formulation)."""
    from rte_rrtmgp_tpu.extensions.zenith_angle import (
        zenith_angle_with_height)

    def f(mu):
        return jnp.sum(zenith_angle_with_height(
            jnp.array([1000.0]), mu, jnp.array([[0.0, 500.0, 2000.0]])))

    g = jax.grad(f)(jnp.array([0.05]))
    assert np.isfinite(np.asarray(g)).all()


def test_cloud_sampling_range_checks():
    """Out-of-range cloud fractions / overlap params raise eagerly (the
    reference returns errors for both; previously a cloud_frac of 1.3
    silently sampled 100% cloudy and |rho| > 1 produced NaN masks)."""
    from rte_rrtmgp_tpu.extensions.cloud_sampling import (
        sampled_mask_exp_ran, sampled_mask_max_ran)

    rng = np.random.default_rng(0)
    randoms = rng.uniform(size=(2, 4, 8)).astype(np.float32)
    bad_cf = np.full((2, 4), 1.3, np.float32)
    with pytest.raises(ValueError, match="cloud fraction"):
        sampled_mask_max_ran(randoms, bad_cf)
    ok_cf = np.full((2, 4), 0.5, np.float32)
    bad_rho = np.full((2, 3), 1.5, np.float32)
    with pytest.raises(ValueError, match="overlap_param"):
        sampled_mask_exp_ran(randoms, ok_cf, bad_rho)


def test_cloud_optics_validates_when_enabled():
    """cloud_optics runs the reference's bounds checks on eager inputs
    (previously validate_inputs was dead code and out-of-range sizes
    silently extrapolated the LUT)."""
    from rte_rrtmgp_tpu.utils.synthetic import synthetic_cloud_optics

    co = synthetic_cloud_optics(
        nbnd=4, band_lims_wvn=np.array([[10.0 * (i + 1), 10.0 * (i + 2)]
                                        for i in range(4)]))
    clwp = np.full((2, 3), 20.0, np.float32)
    zero = np.zeros((2, 3), np.float32)
    bad_re = np.full((2, 3), 1e4, np.float32)
    with pytest.raises(ValueError, match="radius"):
        co.cloud_optics(clwp, zero, bad_re, zero)


def test_sw_noscat_night_columns_zero():
    """The direct-beam (1scl) solver previously divided by raw mu0:
    night columns (mu0 <= 0) produced inf/negative fluxes. They must be
    zero, consistent with the two-stream path's nighttime masking."""
    from rte_rrtmgp_tpu import OpticalProps1scl, rte_sw
    from rte_rrtmgp_tpu.spectral import SpectralGrid

    rng = np.random.default_rng(0)
    ncol, nlay, ngpt = 4, 5, 8
    grid = SpectralGrid.from_arrays(np.array([[10.0, 3000.0]]),
                                    np.array([[1, ngpt]]))
    tau = jnp.asarray(rng.uniform(0.1, 50.0, (ncol, nlay, ngpt)),
                      jnp.float32)
    props = OpticalProps1scl(tau=tau, grid=grid, top_at_1=True)
    mu0 = jnp.asarray([0.6, -0.3, 0.0, 0.8], jnp.float32)
    inc = jnp.full((ncol, ngpt), 100.0, jnp.float32)
    f = rte_sw(props, mu0, inc, jnp.zeros((ncol, 1)), jnp.zeros((ncol, 1)))
    dn = np.asarray(f.flux_dn)
    assert np.isfinite(dn).all()
    assert np.all(dn[1] == 0.0) and np.all(dn[2] == 0.0)   # night, terminator
    assert np.all(dn[0, 0] > 0.0) and np.all(dn[3, 0] > 0.0)


def test_rte_sw_1scl_rejects_inc_flux_dif():
    """inc_flux_dif with absorption-only props previously vanished
    silently; it must raise."""
    from rte_rrtmgp_tpu import OpticalProps1scl, rte_sw
    from rte_rrtmgp_tpu.spectral import SpectralGrid

    ncol, nlay, ngpt = 2, 3, 4
    grid = SpectralGrid.from_arrays(np.array([[10.0, 3000.0]]),
                                    np.array([[1, ngpt]]))
    props = OpticalProps1scl(tau=jnp.ones((ncol, nlay, ngpt)), grid=grid)
    with pytest.raises(ValueError, match="inc_flux_dif"):
        rte_sw(props, jnp.full((ncol,), 0.5), jnp.ones((ncol, ngpt)),
               jnp.zeros((ncol, 1)), jnp.zeros((ncol, 1)),
               inc_flux_dif=jnp.ones((ncol, ngpt)))


def test_increment_2str_by_nstr_uses_first_moment():
    """2str += nstr must use the n-stream phase function's FIRST moment
    as the asymmetry (reference increment_2stream_by_nstream uses p2(1));
    previously the scatterer was treated as isotropic (g = 0)."""
    from rte_rrtmgp_tpu import (OpticalProps2str, OpticalPropsNstr,
                                increment)
    from rte_rrtmgp_tpu.spectral import SpectralGrid

    rng = np.random.default_rng(1)
    ncol, nlay, ngpt, nmom = 2, 3, 4, 4
    grid = SpectralGrid.from_arrays(np.array([[10.0, 3000.0]]),
                                    np.array([[1, ngpt]]))
    t = OpticalProps2str(tau=jnp.asarray(rng.uniform(0.1, 1, (ncol, nlay, ngpt))),
                         ssa=jnp.full((ncol, nlay, ngpt), 0.5),
                         g=jnp.full((ncol, nlay, ngpt), 0.3), grid=grid)
    p = jnp.zeros((nmom, ncol, nlay, ngpt)).at[0].set(0.85)
    o_n = OpticalPropsNstr(tau=jnp.full((ncol, nlay, ngpt), 0.7),
                           ssa=jnp.full((ncol, nlay, ngpt), 0.9),
                           p=p, grid=grid)
    o_2 = OpticalProps2str(tau=o_n.tau, ssa=o_n.ssa,
                           g=jnp.full((ncol, nlay, ngpt), 0.85), grid=grid)
    got = increment(t, o_n)
    want = increment(t, o_2)
    np.testing.assert_allclose(np.asarray(got.g), np.asarray(want.g),
                               rtol=1e-6)
    assert float(jnp.max(got.g)) > 0.3   # forward peak actually arrived


def test_increment_nstr_mom_lim():
    """nstr += nstr with differing moment counts previously crashed with
    a broadcast error; the reference blends min(nmom) moments and leaves
    the target's higher moments untouched."""
    from rte_rrtmgp_tpu import OpticalPropsNstr, increment
    from rte_rrtmgp_tpu.spectral import SpectralGrid

    ncol, nlay, ngpt = 2, 3, 4
    grid = SpectralGrid.from_arrays(np.array([[10.0, 3000.0]]),
                                    np.array([[1, ngpt]]))
    t = OpticalPropsNstr(tau=jnp.ones((ncol, nlay, ngpt)),
                         ssa=jnp.full((ncol, nlay, ngpt), 0.5),
                         p=jnp.full((4, ncol, nlay, ngpt), 0.2), grid=grid)
    o = OpticalPropsNstr(tau=jnp.ones((ncol, nlay, ngpt)),
                         ssa=jnp.full((ncol, nlay, ngpt), 0.5),
                         p=jnp.full((2, ncol, nlay, ngpt), 0.8), grid=grid)
    out = increment(t, o)
    assert out.p.shape[0] == 4
    np.testing.assert_allclose(np.asarray(out.p[0]), 0.5, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out.p[3]), 0.2, rtol=1e-6)


def test_delta_scale_f_bounds():
    from rte_rrtmgp_tpu import OpticalProps2str, delta_scale
    from rte_rrtmgp_tpu.spectral import SpectralGrid

    grid = SpectralGrid.from_arrays(np.array([[10.0, 3000.0]]),
                                    np.array([[1, 4]]))
    p = OpticalProps2str(tau=jnp.ones((2, 3, 4)),
                         ssa=jnp.full((2, 3, 4), 0.9),
                         g=jnp.full((2, 3, 4), 0.5), grid=grid)
    with pytest.raises(ValueError, match="bounds"):
        delta_scale(p, f=jnp.full((2, 3, 4), 1.2))


def test_byband_jacobian_broadband():
    """rte_lw(byband=True, compute_jacobian=True): the Jacobian must be
    BROADBAND regardless of the flux resolution (the reference's
    dF/dT_sfc is broadband-only); previously the ragged-band path
    returned it per g-point, disagreeing with the uniform fast path."""
    from rte_rrtmgp_tpu import OpticalProps1scl, rte_lw
    from rte_rrtmgp_tpu.sources import SourcesLW
    from rte_rrtmgp_tpu.spectral import SpectralGrid

    rng = np.random.default_rng(2)
    ncol, nlay, ngpt = 4, 6, 8
    grid = SpectralGrid.from_arrays(
        np.array([[10.0, 500.0], [500.0, 3000.0]]),
        np.array([[1, 4], [5, 8]]))
    props = OpticalProps1scl(
        tau=jnp.asarray(rng.uniform(0.1, 2.0, (ncol, nlay, ngpt)),
                        jnp.float32), grid=grid)
    sources = SourcesLW(
        lay_source=jnp.asarray(rng.uniform(5, 20, (ncol, nlay, ngpt)),
                               jnp.float32),
        lev_source=jnp.asarray(rng.uniform(5, 20, (ncol, nlay + 1, ngpt)),
                               jnp.float32),
        sfc_source=jnp.asarray(rng.uniform(10, 30, (ncol, ngpt)),
                               jnp.float32),
        sfc_source_jac=jnp.asarray(rng.uniform(0.1, 1, (ncol, ngpt)),
                                   jnp.float32), grid=grid)
    f = rte_lw(props, sources, np.ones((ncol, 1)), compute_jacobian=True,
               byband=True)
    assert f.flux_up.shape[-1] == 2
    assert f.flux_up_jac is not None
    assert f.flux_up_jac.shape == (ncol, nlay + 1)      # broadband
    # the ragged path (non-contiguous uniform-width grid) must agree
    grid_r = SpectralGrid.from_arrays(
        np.array([[500.0, 3000.0], [10.0, 500.0]]),
        np.array([[5, 8], [1, 4]]))
    props_r = OpticalProps1scl(tau=props.tau, grid=grid_r)
    sources_r = SourcesLW(lay_source=sources.lay_source,
                          lev_source=sources.lev_source,
                          sfc_source=sources.sfc_source,
                          sfc_source_jac=sources.sfc_source_jac,
                          grid=grid_r)
    f_r = rte_lw(props_r, sources_r, np.ones((ncol, 1)),
                 compute_jacobian=True, byband=True)
    assert f_r.flux_up_jac.shape == (ncol, nlay + 1)
    np.testing.assert_allclose(np.asarray(f_r.flux_up_jac),
                               np.asarray(f.flux_up_jac), rtol=1e-6)
