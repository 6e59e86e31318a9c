"""Experimental fused-SW-kernel variants for bench_fused_sw_variants.py.

Each variant monkeypatches pieces of the production kernel, runs the same
sw_fused_gas_optics_solve signature, and is compared against "base" for
numeric equivalence by the harness. Promote a variant into
ops/pallas/solver_lanes.py only with a measured TPU win (record it in
docs/PERFORMANCE.md either way).

Variants:
  v_onediv — the Meador-Weaver coefficient block computes TWO divisions
    per (layer, band, block): rt = 1/A and rt2 = w0*rt/den. Division is
    the most expensive VPU elementwise op; replace with one reciprocal of
    the product: rcp = 1/(A*den), rt = rcp*den, rt2 = w0*rcp — trading a
    division for two multiplies. Not bit-exact (different rounding); the
    harness reports max-abs error vs base.
  v_fewdiv — v_onediv plus every other full-width division the SW chain
    can shed (6 -> 2 per element):
    * tns = exp(-t / mu0) -> exp(-t * rmu0) with rmu0 = 1/mu0 hoisted to
      the (nlay, 1, 128) mu0 shape (w-fold fewer divisions);
    * the combine/cloud-increment stage: tauscat reuses the already-held
      rayleigh tau (t_gas*ssa_gas == ray where defined, so the
      ssa_gas = ray/t_gas division disappears — its only other consumer
      is a fallback that is provably 0 there), and g12 = x/tauscat,
      ssa12 = tauscat/t collapse to one reciprocal of the product.
"""
import contextlib
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


def _sw_body_lm_onediv(t, w0, asym, mu0v, albdirv, albdifv, incv, incdifv,
                       up_ref, dn_ref, dir_ref,
                       dirlev, sdn_s, sup_s, rdif_s, tdif_s,
                       alb_s, src_s, den_s, fup_s, fdn_s, tns_s, *, nlay,
                       byband=False):
    """Copy of solver_lanes._sw_body_lm with the single-division
    coefficient block (see module docstring)."""
    gb = pl.program_id(1)
    dtype = t.dtype
    eps = jnp.asarray(np.finfo(np.float32).eps, dtype)
    min_k = jnp.asarray(1.0e4 * np.finfo(np.float32).eps, dtype)
    min_mu0 = jnp.asarray(np.sqrt(np.finfo(np.float32).eps), dtype)

    mu0 = mu0v[:, None, :]
    mu0_s = jnp.maximum(min_mu0, mu0)

    g1 = (8.0 - w0 * (5.0 + 3.0 * asym)) * 0.25
    g2 = 3.0 * (w0 * (1.0 - asym)) * 0.25
    k = jnp.sqrt(jnp.maximum((g1 - g2) * (g1 + g2), min_k))
    e1 = jnp.exp(-t * k)
    e2 = e1 * e1
    k_mu = k * mu0_s
    den = 1.0 - k_mu * k_mu
    den = jnp.where(jnp.abs(den) >= eps, den, eps)
    # ONE division for both rt and rt2
    a_rt = k * (1.0 + e2) + g1 * (1.0 - e2)
    rcp = 1.0 / (a_rt * den)
    rt = rcp * den
    rt2 = w0 * rcp
    rdif_s[:, :, :] = rt * g2 * (1.0 - e2)
    tdif_s[:, :, :] = rt * 2.0 * k * e1

    g3 = (2.0 - 3.0 * mu0_s * asym) * 0.25
    g4 = 1.0 - g3
    a1 = g1 * g4 + g2 * g3
    a2 = g1 * g3 + g2 * g4
    kg3 = k * g3
    kg4 = k * g4
    tns = jnp.exp(-t / mu0_s)
    tns_s[:, :, :] = tns
    rdir = rt2 * ((1.0 - k_mu) * (a2 + kg3)
                  - (1.0 + k_mu) * (a2 - kg3) * e2
                  - 2.0 * (kg3 - a2 * k_mu) * e1 * tns)
    tdir = -rt2 * ((1.0 + k_mu) * (a1 + kg4) * tns
                   - (1.0 - k_mu) * (a1 - kg4) * e2 * tns
                   - 2.0 * (kg4 + a1 * k_mu) * e1)
    rdir = jnp.clip(rdir, 0.0, 1.0 - tns)
    tdir = jnp.clip(tdir, 0.0, 1.0 - tns - rdir)

    dirlev[0, :, :] = incv * mu0v[0, :][None, :]

    def down_dir(l, _):
        dirlev[l + 1, :, :] = dirlev[l, :, :] * tns_s[l, :, :]
        return 0

    jax.lax.fori_loop(0, nlay, down_dir, 0)

    day = (mu0 > 0.0).astype(dtype)
    sup_s[:nlay, :, :] = day * rdir * dirlev[:nlay, :, :]
    sdn_s[:nlay, :, :] = day * tdir * dirlev[:nlay, :, :]

    day_sfc = (mu0v[nlay - 1, :][None, :] > 0.0).astype(dtype)
    alb_s[nlay, :, :] = albdifv
    src_s[nlay, :, :] = day_sfc * dirlev[nlay, :, :] * albdirv

    def up_build(i, _):
        v = nlay - 1 - i
        r = rdif_s[v, :, :]
        td = tdif_s[v, :, :]
        ab = alb_s[v + 1, :, :]
        d = 1.0 / (1.0 - r * ab)
        den_s[v, :, :] = d
        alb_s[v, :, :] = r + td * td * ab * d
        src_s[v, :, :] = (sup_s[v, :, :]
                          + td * d * (src_s[v + 1, :, :]
                                      + ab * sdn_s[v, :, :]))
        return 0

    jax.lax.fori_loop(0, nlay, up_build, 0)

    fdn_s[0, :, :] = incdifv
    fup_s[0, :, :] = incdifv * alb_s[0, :, :] + src_s[0, :, :]

    def dn_sweep(v, _):
        f = (tdif_s[v, :, :] * fdn_s[v, :, :]
             + rdif_s[v, :, :] * src_s[v + 1, :, :]
             + sdn_s[v, :, :]) * den_s[v, :, :]
        fdn_s[v + 1, :, :] = f
        fup_s[v + 1, :, :] = f * alb_s[v + 1, :, :] + src_s[v + 1, :, :]
        return 0

    jax.lax.fori_loop(0, nlay, dn_sweep, 0)

    bb_up = jnp.sum(fup_s[:, :, :], axis=1)
    bb_dn = jnp.sum(fdn_s[:, :, :] + dirlev[:, :, :], axis=1)
    bb_dir = jnp.sum(dirlev[:, :, :], axis=1)

    if byband:
        up_ref[0, :, :] = bb_up
        dn_ref[0, :, :] = bb_dn
        dir_ref[0, :, :] = bb_dir
    else:
        @pl.when(gb == 0)
        def _():
            up_ref[:, :] = bb_up
            dn_ref[:, :] = bb_dn
            dir_ref[:, :] = bb_dir

        @pl.when(gb != 0)
        def _():
            up_ref[:, :] += bb_up
            dn_ref[:, :] += bb_dn
            dir_ref[:, :] += bb_dir


def _sw_body_lm_fewdiv(t, w0, asym, mu0v, albdirv, albdifv, incv, incdifv,
                       up_ref, dn_ref, dir_ref,
                       dirlev, sdn_s, sup_s, rdif_s, tdif_s,
                       alb_s, src_s, den_s, fup_s, fdn_s, tns_s, *, nlay,
                       byband=False):
    """_sw_body_lm_onediv plus the hoisted 1/mu0 reciprocal: the tns
    direct-beam transmittance divides the (nlay, w, 128) tau field by the
    (nlay, 1, 128) mu0 — one narrow reciprocal + broadcast multiply does
    the same work with w-fold fewer divisions."""
    gb = pl.program_id(1)
    dtype = t.dtype
    eps = jnp.asarray(np.finfo(np.float32).eps, dtype)
    min_k = jnp.asarray(1.0e4 * np.finfo(np.float32).eps, dtype)
    min_mu0 = jnp.asarray(np.sqrt(np.finfo(np.float32).eps), dtype)

    mu0 = mu0v[:, None, :]
    mu0_s = jnp.maximum(min_mu0, mu0)
    rmu0 = 1.0 / mu0_s                                    # (nlay, 1, BC)

    g1 = (8.0 - w0 * (5.0 + 3.0 * asym)) * 0.25
    g2 = 3.0 * (w0 * (1.0 - asym)) * 0.25
    k = jnp.sqrt(jnp.maximum((g1 - g2) * (g1 + g2), min_k))
    e1 = jnp.exp(-t * k)
    e2 = e1 * e1
    k_mu = k * mu0_s
    den = 1.0 - k_mu * k_mu
    den = jnp.where(jnp.abs(den) >= eps, den, eps)
    a_rt = k * (1.0 + e2) + g1 * (1.0 - e2)
    rcp = 1.0 / (a_rt * den)
    rt = rcp * den
    rt2 = w0 * rcp
    rdif_s[:, :, :] = rt * g2 * (1.0 - e2)
    tdif_s[:, :, :] = rt * 2.0 * k * e1

    g3 = (2.0 - 3.0 * mu0_s * asym) * 0.25
    g4 = 1.0 - g3
    a1 = g1 * g4 + g2 * g3
    a2 = g1 * g3 + g2 * g4
    kg3 = k * g3
    kg4 = k * g4
    tns = jnp.exp(-t * rmu0)
    tns_s[:, :, :] = tns
    rdir = rt2 * ((1.0 - k_mu) * (a2 + kg3)
                  - (1.0 + k_mu) * (a2 - kg3) * e2
                  - 2.0 * (kg3 - a2 * k_mu) * e1 * tns)
    tdir = -rt2 * ((1.0 + k_mu) * (a1 + kg4) * tns
                   - (1.0 - k_mu) * (a1 - kg4) * e2 * tns
                   - 2.0 * (kg4 + a1 * k_mu) * e1)
    rdir = jnp.clip(rdir, 0.0, 1.0 - tns)
    tdir = jnp.clip(tdir, 0.0, 1.0 - tns - rdir)

    dirlev[0, :, :] = incv * mu0v[0, :][None, :]

    def down_dir(l, _):
        dirlev[l + 1, :, :] = dirlev[l, :, :] * tns_s[l, :, :]
        return 0

    jax.lax.fori_loop(0, nlay, down_dir, 0)

    day = (mu0 > 0.0).astype(dtype)
    sup_s[:nlay, :, :] = day * rdir * dirlev[:nlay, :, :]
    sdn_s[:nlay, :, :] = day * tdir * dirlev[:nlay, :, :]

    day_sfc = (mu0v[nlay - 1, :][None, :] > 0.0).astype(dtype)
    alb_s[nlay, :, :] = albdifv
    src_s[nlay, :, :] = day_sfc * dirlev[nlay, :, :] * albdirv

    def up_build(i, _):
        v = nlay - 1 - i
        r = rdif_s[v, :, :]
        td = tdif_s[v, :, :]
        ab = alb_s[v + 1, :, :]
        d = 1.0 / (1.0 - r * ab)
        den_s[v, :, :] = d
        alb_s[v, :, :] = r + td * td * ab * d
        src_s[v, :, :] = (sup_s[v, :, :]
                          + td * d * (src_s[v + 1, :, :]
                                      + ab * sdn_s[v, :, :]))
        return 0

    jax.lax.fori_loop(0, nlay, up_build, 0)

    fdn_s[0, :, :] = incdifv
    fup_s[0, :, :] = incdifv * alb_s[0, :, :] + src_s[0, :, :]

    def dn_sweep(v, _):
        f = (tdif_s[v, :, :] * fdn_s[v, :, :]
             + rdif_s[v, :, :] * src_s[v + 1, :, :]
             + sdn_s[v, :, :]) * den_s[v, :, :]
        fdn_s[v + 1, :, :] = f
        fup_s[v + 1, :, :] = f * alb_s[v + 1, :, :] + src_s[v + 1, :, :]
        return 0

    jax.lax.fori_loop(0, nlay, dn_sweep, 0)

    bb_up = jnp.sum(fup_s[:, :, :], axis=1)
    bb_dn = jnp.sum(fdn_s[:, :, :] + dirlev[:, :, :], axis=1)
    bb_dir = jnp.sum(dirlev[:, :, :], axis=1)

    if byband:
        up_ref[0, :, :] = bb_up
        dn_ref[0, :, :] = bb_dn
        dir_ref[0, :, :] = bb_dir
    else:
        @pl.when(gb == 0)
        def _():
            up_ref[:, :] = bb_up
            dn_ref[:, :] = bb_dn
            dir_ref[:, :] = bb_dir

        @pl.when(gb != 0)
        def _():
            up_ref[:, :] += bb_up
            dn_ref[:, :] += bb_dn
            dir_ref[:, :] += bb_dir


def _combine_fewdiv(tau_s, ray_s, ct_ref, cs_ref, cg_ref, *, with_cloud):
    """fused_sw._combine_gas_cloud with 3 divisions -> 1 (cloud path):
    tauscat reuses ray (t_gas*ssa_gas == where(big, ray, 0) exactly, up to
    one rounding of the division-then-multiply round trip), and the g12 /
    ssa12 pair shares one reciprocal of the product. In the cloud path
    ssa_gas is never needed: its only consumer is the w0 fallback at
    t <= 2 tiny, where t_gas <= 2 tiny forces ssa_gas = 0."""
    dtype = tau_s.dtype
    tiny = jnp.asarray(np.finfo(np.float32).tiny, dtype)
    ray = ray_s[:, :, :]
    t_gas = tau_s[:, :, :] + ray
    big = t_gas > 2.0 * tiny
    if with_cloud:
        o_tau = ct_ref[0, :, :][:, None, :]
        o_ssa = cs_ref[0, :, :][:, None, :]
        o_g = cg_ref[0, :, :][:, None, :]
        t = t_gas + o_tau
        tauscat = jnp.where(big, ray, 0.0) + o_tau * o_ssa
        ts_safe = jnp.maximum(tauscat, tiny)
        t_safe = jnp.maximum(t, tiny)
        # the shared reciprocal changes the safe-guard semantics vs the
        # base kernel's two guarded divisions: ts_safe * t_safe can
        # UNDERFLOW to 0 on TPU (f32 subnormals flush) even when both
        # factors are normal-ish (e.g. ts_safe == tiny, t_safe < 1),
        # sending rcp to inf — so guard the PRODUCT too (ADVICE r3)
        rcp = 1.0 / jnp.maximum(ts_safe * t_safe, tiny)
        g12 = (o_tau * o_ssa * o_g) * (t_safe * rcp)
        ssa12 = tauscat * (ts_safe * rcp)
        asym = jnp.where(tauscat > 2.0 * tiny, g12, 0.0)
        w0 = jnp.where(t > 2.0 * tiny, ssa12, 0.0)
    else:
        ssa_gas = jnp.where(big, ray / jnp.where(big, t_gas, 1.0), 0.0)
        t, w0, asym = t_gas, ssa_gas, jnp.zeros_like(t_gas)
    return t, w0, asym


@contextlib.contextmanager
def _patched_sw_body(body, combine=None):
    from rte_rrtmgp_tpu.ops.pallas import fused_sw
    prev = fused_sw._sw_body_lm
    prev_c = fused_sw._combine_gas_cloud
    fused_sw._sw_body_lm = body
    if combine is not None:
        fused_sw._combine_gas_cloud = combine
    try:
        yield
    finally:
        fused_sw._sw_body_lm = prev
        fused_sw._combine_gas_cloud = prev_c


def _variant(body, combine=None):
    def run(*args, **kw):
        from rte_rrtmgp_tpu.ops.pallas.fused_sw import (
            sw_fused_gas_optics_solve)
        with _patched_sw_body(body, combine):
            return sw_fused_gas_optics_solve(*args, **kw)
    return run


VARIANTS = {
    "v_onediv": _variant(_sw_body_lm_onediv),
    "v_fewdiv": _variant(_sw_body_lm_fewdiv, _combine_fewdiv),
}
