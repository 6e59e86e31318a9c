"""Golden-flux regression gate.

The reference pins RFMIP/all-sky fluxes against committed files and fails
ctest when they drift past an absolute threshold
(examples/compare-to-reference.py:52-60; thresholds 7e-4 W/m2 DP /
3.5e-1 SP, examples/CMakeLists.txt:1-9). This module is the equivalent:
float64 CPU fluxes for fixed-seed synthetic RFMIP (LW+SW) and all-sky
(clouds + aerosols) cases are committed in tests/golden/*.npz and every
run is gated against them at the DP threshold, making any numerics change
visible as a test failure.

Regenerate (only when a numerics change is INTENDED, and say so in the
commit message):  python -m tests.test_golden_regression
"""
import os

import numpy as np
import pytest
import jax.numpy as jnp

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")
DP_THRESHOLD = 7.0e-4   # reference DP ctest gate, examples/CMakeLists.txt:1-9


def _rfmip_case():
    from rte_rrtmgp_tpu.drivers.rfmip import (rfmip_lw, rfmip_sw,
                                              synthetic_rfmip)
    from rte_rrtmgp_tpu.models.rrtmgp.gas_optics import GasOpticsRRTMGP
    from rte_rrtmgp_tpu.utils.synthetic import synthetic_kdist

    data = synthetic_rfmip(6, 20, 3, dtype=np.float64)
    gas_lw = GasOpticsRRTMGP(synthetic_kdist(
        sw=False, ngpt=32, nbnd=4, ntemp=6, npres=12, dtype=jnp.float64))
    gas_sw = GasOpticsRRTMGP(synthetic_kdist(
        sw=True, ngpt=32, nbnd=4, ntemp=6, npres=12, dtype=jnp.float64))
    lw_up, lw_dn = rfmip_lw(data, gas_lw)
    sw_up, sw_dn = rfmip_sw(data, gas_sw)
    return dict(lw_up=np.asarray(lw_up), lw_dn=np.asarray(lw_dn),
                sw_up=np.asarray(sw_up), sw_dn=np.asarray(sw_dn))


def _allsky_case():
    from rte_rrtmgp_tpu.drivers.allsky import (allsky_step_lw, allsky_step_sw,
                                               make_allsky_inputs)
    from rte_rrtmgp_tpu.models.rrtmgp.gas_optics import GasOpticsRRTMGP
    from rte_rrtmgp_tpu.utils.synthetic import (synthetic_aerosol_optics,
                                                synthetic_cloud_optics,
                                                synthetic_kdist)

    kd_lw = synthetic_kdist(sw=False, ngpt=32, nbnd=4, ntemp=6, npres=12,
                            dtype=jnp.float64)
    kd_sw = synthetic_kdist(sw=True, ngpt=32, nbnd=4, ntemp=6, npres=12,
                            dtype=jnp.float64)
    gas_lw, gas_sw = GasOpticsRRTMGP(kd_lw), GasOpticsRRTMGP(kd_sw)
    cld_lw = synthetic_cloud_optics(
        nbnd=4, band_lims_wvn=kd_lw.grid.band_lims_wvn_array,
        dtype=jnp.float64)
    cld_sw = synthetic_cloud_optics(
        nbnd=4, band_lims_wvn=kd_sw.grid.band_lims_wvn_array,
        dtype=jnp.float64)
    aer_lw = synthetic_aerosol_optics(
        nbnd=4, band_lims_wvn=kd_lw.grid.band_lims_wvn_array,
        dtype=jnp.float64)
    aer_sw = synthetic_aerosol_optics(
        nbnd=4, band_lims_wvn=kd_sw.grid.band_lims_wvn_array,
        dtype=jnp.float64)
    inp = make_allsky_inputs(12, 24, cloud_optics=cld_lw, dtype=jnp.float64)

    out = {}
    lw = allsky_step_lw(inp, gas_lw, cloud_optics=cld_lw)
    out["lw_up"], out["lw_dn"] = np.asarray(lw.flux_up), np.asarray(lw.flux_dn)
    sw = allsky_step_sw(inp, gas_sw, cloud_optics=cld_sw)
    out["sw_up"], out["sw_dn"] = np.asarray(sw.flux_up), np.asarray(sw.flux_dn)
    lwa = allsky_step_lw(inp, gas_lw, cloud_optics=cld_lw,
                         aerosol_optics=aer_lw, use_aerosols=True)
    out["lw_aer_up"], out["lw_aer_dn"] = (np.asarray(lwa.flux_up),
                                          np.asarray(lwa.flux_dn))
    swa = allsky_step_sw(inp, gas_sw, cloud_optics=cld_sw,
                         aerosol_optics=aer_sw, use_aerosols=True)
    out["sw_aer_up"], out["sw_aer_dn"] = (np.asarray(swa.flux_up),
                                          np.asarray(swa.flux_dn))
    return out


def production_setup(dtype):
    """The production-shape all-sky configuration (256/224 gpt, 16/14
    bands, 14 temps, 59 pressures, 256 columns x 72 layers) shared by the
    golden gate below (f64, XLA path, CPU) and scripts/drive_verify.py's
    on-TPU fused-path comparison — so the fused kernels are pinned
    ABSOLUTELY against the committed f64 fluxes, not just relatively
    against the same-session XLA path."""
    from rte_rrtmgp_tpu.drivers.allsky import make_allsky_inputs
    from rte_rrtmgp_tpu.models.rrtmgp.gas_optics import GasOpticsRRTMGP
    from rte_rrtmgp_tpu.utils.synthetic import (synthetic_cloud_optics,
                                                synthetic_kdist)

    kd_lw = synthetic_kdist(sw=False, ngpt=256, nbnd=16, ntemp=14,
                            npres=59, dtype=dtype)
    kd_sw = synthetic_kdist(sw=True, ngpt=224, nbnd=14, ntemp=14,
                            npres=59, dtype=dtype)
    gas_lw, gas_sw = GasOpticsRRTMGP(kd_lw), GasOpticsRRTMGP(kd_sw)
    cld_lw = synthetic_cloud_optics(
        nbnd=16, band_lims_wvn=kd_lw.grid.band_lims_wvn_array, dtype=dtype)
    cld_sw = synthetic_cloud_optics(
        nbnd=14, band_lims_wvn=kd_sw.grid.band_lims_wvn_array, dtype=dtype)
    inp = make_allsky_inputs(256, 72, cloud_optics=cld_lw, dtype=dtype)
    return gas_lw, gas_sw, cld_lw, cld_sw, inp


def _production_case():
    """f64 XLA-path fluxes at production spectral shape. Catches absolute
    drift in shared descriptor-prep/gas-optics code that the TPU
    fused-vs-XLA relative check would miss if both paths drift together
    (reference acceptance-gate semantics, compare-to-reference.py:52-60)."""
    from rte_rrtmgp_tpu.config import set_use_pallas
    from rte_rrtmgp_tpu.drivers.allsky import allsky_step_lw, allsky_step_sw

    gas_lw, gas_sw, cld_lw, cld_sw, inp = production_setup(jnp.float64)
    set_use_pallas(False)
    try:
        lw = allsky_step_lw(inp, gas_lw, cloud_optics=cld_lw)
        sw = allsky_step_sw(inp, gas_sw, cloud_optics=cld_sw)
    finally:
        set_use_pallas(None)
    return dict(lw_up=np.asarray(lw.flux_up), lw_dn=np.asarray(lw.flux_dn),
                sw_up=np.asarray(sw.flux_up), sw_dn=np.asarray(sw.flux_dn),
                sw_dir=np.asarray(sw.flux_dn_dir))


CASES = {"rfmip": _rfmip_case, "allsky": _allsky_case,
         "production": _production_case}


@pytest.mark.parametrize("case", sorted(CASES))
def test_golden(case):
    path = os.path.join(GOLDEN_DIR, f"{case}.npz")
    assert os.path.exists(path), (
        f"golden file {path} missing - run python -m tests.test_golden_regression")
    golden = np.load(path)
    got = CASES[case]()
    assert set(golden.files) == set(got), (
        f"{case}: field set changed {sorted(golden.files)} vs {sorted(got)}")
    for k in sorted(got):
        ref, tst = golden[k], got[k]
        assert ref.shape == tst.shape, f"{case}/{k}: shape {ref.shape} vs {tst.shape}"
        maxd = float(np.abs(tst - ref).max())
        assert maxd <= DP_THRESHOLD, (
            f"{case}/{k}: fluxes drifted from committed golden by "
            f"{maxd:.3e} W/m2 (gate {DP_THRESHOLD:.1e}). If this change is "
            f"intended, regenerate via python -m tests.test_golden_regression")


def regenerate(only=None):
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    for case, fn in CASES.items():
        if only and case not in only:
            continue
        out = fn()
        path = os.path.join(GOLDEN_DIR, f"{case}.npz")
        np.savez_compressed(path, **out)
        print(f"wrote {path}: " + ", ".join(
            f"{k}{v.shape}" for k, v in sorted(out.items())))


if __name__ == "__main__":
    import sys

    import jax

    jax.config.update("jax_platforms", "cpu")    # match conftest.py
    jax.config.update("jax_enable_x64", True)
    regenerate(only=sys.argv[1:] or None)
