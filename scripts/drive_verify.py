"""User-style end-to-end drive of the library surface (verify recipe)."""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

print("devices:", jax.devices())

from rte_rrtmgp_tpu import rte_lw, rte_sw
from rte_rrtmgp_tpu.optical_props import OpticalProps1scl, OpticalProps2str
from rte_rrtmgp_tpu.sources import SourcesLW
from rte_rrtmgp_tpu.spectral import SpectralGrid
from rte_rrtmgp_tpu.gas_concs import GasConcs
from rte_rrtmgp_tpu.models.rrtmgp.gas_optics import GasOpticsRRTMGP
from rte_rrtmgp_tpu.utils.synthetic import synthetic_kdist
from rte_rrtmgp_tpu.utils.profiles import allsky_profiles

failures = []


def check(name, ok, detail=""):
    print(f"  {'PASS' if ok else 'FAIL'}: {name} {detail}")
    if not ok:
        failures.append(name)


# ---- 1. LW gray equilibrium vs analytic OLR --------------------------------
print("[1] LW gray radiative equilibrium")
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests"))
from gray_atmosphere import gray_rad_equil, gray_rad_equil_olr

ncol, nlay = 8, 16
taus = np.array([0.1, 0.5, 1.0, 2.0, 5.0, 10.0, 30.0, 50.0])
tsfc = np.full(ncol, 300.0)
props, src = gray_rad_equil(tsfc, taus, nlay, dtype=jnp.float32)
olr_ref = gray_rad_equil_olr(tsfc, taus)
emis = jnp.ones((ncol, 1), jnp.float32)
f = jax.jit(lambda p, s: rte_lw(p, s, emis))(props, src)
olr = np.asarray(f.flux_up[:, 0])
check("gray OLR vs analytic", np.allclose(olr, olr_ref, atol=3.5e-1),
      f"max err {np.max(np.abs(olr - olr_ref)):.2e} W/m2")

# ---- 2. SW two-stream sanity ------------------------------------------------
print("[2] SW two-stream")
rng = np.random.default_rng(0)
ngpt = 16
grid2 = SpectralGrid.from_arrays(np.array([[0.0, 50000.0]]), np.array([[1, ngpt]]))
tau = jnp.asarray(rng.uniform(0.01, 1.0, (ncol, nlay, ngpt)), jnp.float32)
ssa = jnp.asarray(rng.uniform(0.1, 0.9, (ncol, nlay, ngpt)), jnp.float32)
g = jnp.asarray(rng.uniform(0.0, 0.8, (ncol, nlay, ngpt)), jnp.float32)
p2 = OpticalProps2str(tau=tau, ssa=ssa, g=g, grid=grid2, top_at_1=True)
mu0 = jnp.full((ncol,), 0.7, jnp.float32)
inc = jnp.asarray(rng.uniform(5.0, 10.0, (ncol, ngpt)), jnp.float32)
alb = jnp.full((ncol, 1), 0.2, jnp.float32)
fsw = jax.jit(lambda p, i: rte_sw(p, mu0, i, alb, alb))(p2, inc)
toa_dn = np.asarray(fsw.flux_dn[:, 0])
expect = np.asarray(jnp.sum(inc, -1)) * 0.7
check("SW TOA down = sum(inc)*mu0", np.allclose(toa_dn, expect, rtol=1e-5))
beer = np.asarray(jnp.sum(inc * 0.7 * jnp.exp(-jnp.cumsum(tau, 1)[:, -1] / 0.7), -1))
check("SW direct beam Beer-Lambert", np.allclose(
    np.asarray(fsw.flux_dn_dir[:, -1]), beer, rtol=1e-4))
check("SW up <= incident", np.all(np.asarray(fsw.flux_up) <= expect[:, None] + 1e-3))

# ---- 3. RRTMGP synthetic gas optics end-to-end on TPU ----------------------
print("[3] RRTMGP gas optics -> solvers (production dims)")
kd_lw = synthetic_kdist(sw=False, ngpt=256, nbnd=16, ntemp=14, npres=59)
kd_sw = synthetic_kdist(sw=True, ngpt=224, nbnd=14, ntemp=14, npres=59)
go_lw, go_sw = GasOpticsRRTMGP(kd_lw), GasOpticsRRTMGP(kd_sw)
play, plev, tlay, tlev, gas = allsky_profiles(32, 48)
play, plev = jnp.asarray(play, jnp.float32), jnp.asarray(plev, jnp.float32)
tlay, tlev = jnp.asarray(tlay, jnp.float32), jnp.asarray(tlev, jnp.float32)
tsfc_a = tlay[:, -1]


@jax.jit
def lw_step(play, plev, tlay, tlev, tsfc_a):
    props, sources = go_lw.gas_optics_lw(play, plev, tlay, tsfc_a, gas,
                                         tlev=tlev, top_at_1=True)
    return rte_lw(props, sources, jnp.full((32, 16), 0.98, jnp.float32))


@jax.jit
def sw_step(play, plev, tlay):
    props, toa = go_sw.gas_optics_sw(play, plev, tlay, gas, top_at_1=True)
    return rte_sw(props, jnp.full((32,), 0.86, jnp.float32), toa,
                  jnp.full((32, 14), 0.06, jnp.float32),
                  jnp.full((32, 14), 0.06, jnp.float32))


flw = lw_step(play, plev, tlay, tlev, tsfc_a)
fsw2 = sw_step(play, plev, tlay)
olr2 = np.asarray(flw.flux_up[:, 0])
check("LW fluxes finite/positive", np.all(np.isfinite(olr2)) and np.all(olr2 > 0),
      f"OLR mean {olr2.mean():.1f} W/m2")
# synthetic tables: only require net surface LW cooling on average and
# sane magnitudes (tsfc == tlay[-1] here, so dn ~ up is legitimate)
sfc_net = np.asarray(flw.flux_up[:, -1]) - np.asarray(flw.flux_dn[:, -1])
check("LW surface fluxes sane", np.all(np.asarray(flw.flux_up[:, -1]) > 0)
      and np.all(np.abs(sfc_net) < np.asarray(flw.flux_up[:, -1])))
sw_up = np.asarray(fsw2.flux_up)
sw_dn = np.asarray(fsw2.flux_dn)
check("SW fluxes finite, net down > 0", np.all(np.isfinite(sw_up))
      and np.all(sw_dn[:, -1] > sw_up[:, -1]))

# ---- 3b. RFMIP clear-sky driver (synthetic problem) -------------------------
print("[3b] RFMIP clear-sky driver")
from rte_rrtmgp_tpu.drivers.rfmip import synthetic_rfmip, rfmip_lw, rfmip_sw, unblock

rf = synthetic_rfmip(16, 40, 4)
kd_lw_s = synthetic_kdist(sw=False, ngpt=64, nbnd=8, ntemp=8, npres=20)
kd_sw_s = synthetic_kdist(sw=True, ngpt=64, nbnd=8, ntemp=8, npres=20)
rlu, rld = rfmip_lw(rf, GasOpticsRRTMGP(kd_lw_s))
rsu, rsd = rfmip_sw(rf, GasOpticsRRTMGP(kd_sw_s))
check("RFMIP LW shapes + finite", rlu.shape == (64, 41) and np.all(np.isfinite(rlu)))
night = rf.sza >= 90.0 - 2e-5
check("RFMIP SW night zeroed, day TSI-normalized",
      np.all(rsu[night] == 0.0) and np.allclose(
          rsd[~night][:, 0], rf.tsi[~night] * np.cos(np.deg2rad(rf.sza[~night])),
          rtol=1e-4))
check("RFMIP unblock shape", unblock(rf, rlu).shape == (4, 16, 41))

# the reference CI runs block_size=8 (examples/rfmip-clear-sky/
# CMakeLists.txt:81-99); the blocked executor path (pipelined readback)
# must equal the single launch ON THIS BACKEND, and the combined
# one-launch LW+SW driver must equal the split drivers
from rte_rrtmgp_tpu.drivers.rfmip import rfmip_lw_sw

go_lw_s, go_sw_s = GasOpticsRRTMGP(kd_lw_s), GasOpticsRRTMGP(kd_sw_s)
c_all = rfmip_lw_sw(rf, go_lw_s, go_sw_s)
c_blk = rfmip_lw_sw(rf, go_lw_s, go_sw_s, block_size=8)
err_blk = max(float(np.abs(a - b).max()) for a, b in zip(c_blk, c_all))
check("RFMIP block_size=8 == single launch", err_blk <= 1e-5,
      f"max abs err {err_blk:.2e} W/m2")
err_cmb = max(float(np.abs(a - b).max())
              for a, b in zip(c_all, (rlu, rld, rsu, rsd)))
check("RFMIP combined LW+SW == split drivers", err_cmb <= 1e-5,
      f"max abs err {err_cmb:.2e} W/m2")

# ---- 3c. native C++ kernel tier (extern C ABI) -------------------------------
print("[3c] native C++ kernel tier")
try:
    from rte_rrtmgp_tpu import native as rtenative
    nk = rtenative.load(np.float32)
    up_n, dn_n, _ = nk.lw_solver_noscat(
        np.asarray(props.tau), np.asarray(src.lay_source),
        np.asarray(src.lev_source), np.full((ncol, 1), 1.0, np.float32),
        np.asarray(src.sfc_source), np.zeros((ncol, 1), np.float32),
        top_at_1=True, ds=np.asarray([1.0 / 0.6096748751]), weights=(1.0,),
        broadband=True)
    check("native LW matches analytic OLR",
          np.allclose(up_n[:, 0], olr_ref, atol=3.5e-1),
          f"max err {np.max(np.abs(up_n[:, 0] - olr_ref)):.2e} W/m2")
except Exception as e:
    check("native LW matches analytic OLR", False, f"{type(e).__name__}: {e}")

# ---- 3d. production-shape fused-vs-XLA equivalence (real TPU) ---------------
# (reference check_equivalence.F90's cross-path assertions :218-475: code
# paths that should agree must agree at tolerance, at PRODUCTION shapes —
# the toy-shape interpret-mode tests can't catch lane-table indexing bugs
# that only appear at 256 gpt / 59 pressures)
_on_tpu = jax.default_backend() not in ("cpu", "gpu")
if os.environ.get("DRIVE_FUSED_EQUIV", "1" if _on_tpu else "0") == "1":
    print("[3d] fused vs XLA at production shapes (256/224 gpt, 59 press)")
    from rte_rrtmgp_tpu.config import set_use_pallas
    from rte_rrtmgp_tpu.drivers.allsky import (allsky_step_lw, allsky_step_sw,
                                               make_allsky_inputs)
    from rte_rrtmgp_tpu.utils.synthetic import (synthetic_aerosol_optics,
                                                synthetic_cloud_optics)

    cld_p = synthetic_cloud_optics(nbnd=16,
                                   band_lims_wvn=kd_lw.grid.band_lims_wvn_array)
    cld_p_sw = synthetic_cloud_optics(nbnd=14,
                                      band_lims_wvn=kd_sw.grid.band_lims_wvn_array)
    aer_p = synthetic_aerosol_optics(nbnd=16,
                                     band_lims_wvn=kd_lw.grid.band_lims_wvn_array)
    aer_p_sw = synthetic_aerosol_optics(nbnd=14,
                                        band_lims_wvn=kd_sw.grid.band_lims_wvn_array)
    inp_p = make_allsky_inputs(1024, 72, cloud_optics=cld_p)

    for use_aer in (False, True):
        kw_lw = dict(cloud_optics=cld_p, aerosol_optics=aer_p,
                     use_aerosols=use_aer)
        kw_sw = dict(cloud_optics=cld_p_sw, aerosol_optics=aer_p_sw,
                     use_aerosols=use_aer)
        set_use_pallas(True)
        flw_f = jax.jit(lambda i: allsky_step_lw(i, go_lw, **kw_lw))(inp_p)
        fsw_f = jax.jit(lambda i: allsky_step_sw(i, go_sw, **kw_sw))(inp_p)
        jax.block_until_ready((flw_f, fsw_f))
        set_use_pallas(False)
        flw_x = jax.jit(lambda i: allsky_step_lw(i, go_lw, **kw_lw))(inp_p)
        fsw_x = jax.jit(lambda i: allsky_step_sw(i, go_sw, **kw_sw))(inp_p)
        set_use_pallas(None)
        for nm, a, b in (("LW up", flw_f.flux_up, flw_x.flux_up),
                         ("LW dn", flw_f.flux_dn, flw_x.flux_dn),
                         ("SW up", fsw_f.flux_up, fsw_x.flux_up),
                         ("SW dn", fsw_f.flux_dn, fsw_x.flux_dn),
                         ("SW dir", fsw_f.flux_dn_dir, fsw_x.flux_dn_dir)):
            a, b = np.asarray(a), np.asarray(b)
            scale = max(1.0, float(np.abs(b).max()))
            err = float(np.abs(a - b).max())
            check(f"fused==XLA {nm} (aer={use_aer})",
                  err <= 3.5e-1 and err / scale < 1e-3,
                  f"max abs err {err:.2e} W/m2")

# ---- 3e. absolute golden at production shape (fused AND XLA f32 paths
# vs the committed f64 CPU golden, tests/golden/production.npz) ---------------
# Pins the production path ABSOLUTELY: a numerics change in shared
# descriptor-prep code fails here even if fused and XLA drift together
# (the [3d] relative check alone would pass). Gate = the reference's SP
# acceptance threshold 3.5e-1 W/m2 (examples/CMakeLists.txt:1-5).
if os.environ.get("DRIVE_FUSED_EQUIV", "1" if _on_tpu else "0") == "1":
    print("[3e] production-shape absolute golden (f32 vs committed f64)")
    import json
    from test_golden_regression import GOLDEN_DIR, production_setup

    golden_p = np.load(os.path.join(GOLDEN_DIR, "production.npz"))
    # per-field f32 noise floor, measured on CPU at golden-generation
    # conditions and COMMITTED (production_f32_noise.json): the random
    # synthetic k-tables amplify f32 interpolation rounding (LW Planck
    # chain ~2.5-2.9 W/m2) far beyond the reference's smooth tables, so
    # the f32 gate is max(reference SP gate, 3x that floor); the f64 CI
    # gate stays at the 7e-4 DP threshold
    with open(os.path.join(GOLDEN_DIR, "production_f32_noise.json")) as fjs:
        f32_noise = json.load(fjs)["f32_noise"]
    (gas_lw_p, gas_sw_p, cld_lw_p, cld_sw_p,
     inp_p256) = production_setup(jnp.float32)
    for label, flag in (("fused", True), ("XLA", False)):
        set_use_pallas(flag)
        try:
            lw_g = jax.jit(lambda i: allsky_step_lw(
                i, gas_lw_p, cloud_optics=cld_lw_p))(inp_p256)
            sw_g = jax.jit(lambda i: allsky_step_sw(
                i, gas_sw_p, cloud_optics=cld_sw_p))(inp_p256)
        finally:
            set_use_pallas(None)
        for nm, a in (("lw_up", lw_g.flux_up), ("lw_dn", lw_g.flux_dn),
                      ("sw_up", sw_g.flux_up), ("sw_dn", sw_g.flux_dn),
                      ("sw_dir", sw_g.flux_dn_dir)):
            err = float(np.abs(np.asarray(a, np.float64)
                               - golden_p[nm]).max())
            gate = max(3.5e-1, 3.0 * f32_noise[nm])
            check(f"golden {nm} ({label} f32)", err <= gate,
                  f"max abs err {err:.2e} W/m2 (gate {gate:.2e})")

# ---- 4. sharding equivalence handled by tests/dryrun (CPU mesh) -------------
# (run in pytest suite; here probe error paths eagerly)
print("[4] eager error paths")
try:
    rte_lw(props, src, jnp.ones((ncol + 1, 1)))
    check("bad emis shape raises", False)
except ValueError:
    check("bad emis shape raises", True)
try:
    rte_sw(p2, jnp.full((ncol,), 1.5), inc, alb, alb)
    check("mu0 out of range raises", False)
except ValueError:
    check("mu0 out of range raises", True)
try:
    rte_lw(props, src, emis, lw_ds=jnp.full((ncol, 1), 1.66), n_gauss_angles=2)
    check("lw_ds + n_gauss_angles conflict raises", False)
except ValueError:
    check("lw_ds + n_gauss_angles conflict raises", True)

print()
if failures:
    print("VERIFY FAILED:", failures)
    sys.exit(1)
print("VERIFY OK")
