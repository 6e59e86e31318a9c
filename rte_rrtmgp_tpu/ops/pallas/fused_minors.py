"""Minor-gas accumulation pass for the grand fused kernels (LW and SW).

Factored out of fused_lw.py / fused_sw.py so both spectral domains share
one implementation and kernel experiments can patch it.

Three lowerings of the same numerics (reference layer-range masking,
mo_gas_optics_rrtmgp_kernels.F90:402-501 — a member's scaling row is
identically ZERO on layers outside its atmosphere, so all three are
exact; they differ only in f32 summation-tree shape):

- ``rmw``  — the round-2 structure: per member, gather + accumulate into
  the band's tau scratch rows with a read-modify-write; members grouped
  by atmosphere behind a ``pl.when`` on the block's tropopause code.
  The round-4 force-all-upper experiment showed the predicated gathers
  are NOT where the minors' time goes (docs/PERFORMANCE.md "Minor-gas
  atmosphere skip"): the cost is the per-member fixed work — and, this
  module's hypothesis, the scratch-carried dependency chain: every
  member's RMW on the same tau rows serializes the members' gathers,
  denying the ILP the audited 8.25e8 rows/s gather rate requires.
- ``vreg`` — accumulate each atmosphere group's members into VREGs and
  issue ONE scratch read-modify-write per group per layer. Keeps the
  tropopause skip; removes the per-member RMWs and the serialization.
- ``flat`` — accumulate ALL of the band's members into one band-width
  VREG accumulator with no tropopause predication (exact because the
  scaling rows are zero off-atmosphere) and ONE RMW per layer: the
  branch-free maximum-ILP form.

Mode selection: ``set_mode()`` / the module attribute ``MODE``; if None
the ``RTE_MINOR_MODE`` env var is read at TRACE time. All modes
measured within session noise on the chip (docs/PERFORMANCE.md round
5, "Minor-gas accumulation restructure"); the default stays ``rmw``
because it is bitwise-identical to the pre-refactor kernels and the
committed goldens, not because it is faster.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from .minor_gather import _BC, _gather_rows

__all__ = ["minor_pass", "set_mode", "MODE"]

MODE = None   # None = read RTE_MINOR_MODE at trace time


def set_mode(mode):
    """Override the accumulation mode: "rmw", "vreg", "flat", or None to
    defer to the RTE_MINOR_MODE env var at trace time."""
    global MODE
    MODE = mode


def _resolve_mode():
    """Returns (mode, unroll): an optional "_u" suffix fully unrolls the
    per-layer minor loop (the loop body is tiny relative to its control
    overhead, like the transport recurrences — solver_lanes.UNROLL)."""
    m = MODE
    if m is None:
        m = os.environ.get("RTE_MINOR_MODE", "rmw")
    unroll = m.endswith("_u")
    if unroll:
        m = m[:-2]
    if m not in ("rmw", "vreg", "flat"):
        raise ValueError(f"unknown minor accumulation mode {m!r}")
    return m, unroll


def _member_contrib(member, l, desc_ref, msc_ref, mtab_lo_ref, mtab_up_ref,
                    fm_cache, *, ncont_lo, TR0, FE0, dtype):
    """One member's scaled contribution at layer l, (wm, _BC).

    fm_cache memoizes the per-(flavor, itemp) row index and eta/temp
    weights across the layer's members (trace-time dict — members of one
    band frequently share a flavor, and the ft rows are shared by all)."""
    (lower, f, mg, start, lg0, wm) = member
    ncont = ncont_lo if lower else mtab_up_ref.shape[0] // 2
    tref = mtab_lo_ref if lower else mtab_up_ref
    scal = msc_ref[mg, l, :][None, :]
    kk = jnp.zeros((wm, _BC), dtype)
    for it in range(2):
        key = (f, it)
        if key not in fm_cache:
            rr = desc_ref[TR0 + 2 * f + it, l, :].astype(jnp.int32)
            fe = desc_ref[FE0 + 2 * f + it, l, :][None, :]
            ftv = desc_ref[3 + it, l, :][None, :]
            fm_cache[key] = (rr, (1.0 - fe) * ftv, fe * ftv)
        rr, fm0, fm1 = fm_cache[key]
        lo = _gather_rows(tref[start:start + wm, :], rr)
        hi = _gather_rows(tref[ncont + start:ncont + start + wm, :], rr)
        kk = kk + fm0 * lo + fm1 * hi
    return scal * kk


def _accumulate(group, l, w, desc_ref, msc_ref, mtab_lo_ref, mtab_up_ref,
                *, ncont_lo, TR0, FE0, dtype):
    """VREG-accumulate a group of members into one (w, _BC) value.
    Partial-band windows are zero-padded to band width (a static concat —
    value-level scatter-add does not lower on Mosaic)."""
    fm_cache = {}
    acc = None
    for member in group:
        (_, _, _, _, lg0, wm) = member
        c = _member_contrib(member, l, desc_ref, msc_ref, mtab_lo_ref,
                            mtab_up_ref, fm_cache, ncont_lo=ncont_lo,
                            TR0=TR0, FE0=FE0, dtype=dtype)
        if wm != w:
            c = jnp.pad(c, ((lg0, w - lg0 - wm), (0, 0)))
        acc = c if acc is None else acc + c
    return acc


def minor_pass(tau_s, desc_ref, msc_ref, mtab_lo_ref, mtab_up_ref, jpin_ref,
               members, *, nlay, w, ncont_lo, TR0, FE0, dtype):
    """Accumulate the band's minor-gas optical depths into tau_s.

    tau_s: (nlay, w, _BC) scratch already holding the major-gas taus.
    members: static tuple of (lower, flavor, mg_global, kminor_start,
    local_g0, width) — the band's statically clipped windows
    (gas_optics_pallas._minor_static). jpin_ref row 2 is the per-layer
    tropopause code (1 = block all lower atm, 2 = all upper, 0 = mixed).
    """
    if not members:
        return
    import jax.experimental.pallas as pl

    mode, unroll = _resolve_mode()

    def loop(body):
        jax.lax.fori_loop(0, nlay, body, 0, unroll=(nlay if unroll else 1))

    lo_mem = tuple(m for m in members if m[0])
    up_mem = tuple(m for m in members if not m[0])

    if mode == "flat":
        def minor_layer(l, _):
            acc = _accumulate(members, l, w, desc_ref, msc_ref,
                              mtab_lo_ref, mtab_up_ref, ncont_lo=ncont_lo,
                              TR0=TR0, FE0=FE0, dtype=dtype)
            tau_s[l, :, :] += acc
            return 0

        loop(minor_layer)
        return

    if mode == "vreg":
        def minor_layer(l, _):
            tc = jpin_ref[0, 2, l]
            if lo_mem:
                @pl.when(tc != 2)          # some lanes below tropopause
                def _():
                    tau_s[l, :, :] += _accumulate(
                        lo_mem, l, w, desc_ref, msc_ref, mtab_lo_ref,
                        mtab_up_ref, ncont_lo=ncont_lo, TR0=TR0, FE0=FE0,
                        dtype=dtype)
            if up_mem:
                @pl.when(tc != 1)          # some lanes above
                def _():
                    tau_s[l, :, :] += _accumulate(
                        up_mem, l, w, desc_ref, msc_ref, mtab_lo_ref,
                        mtab_up_ref, ncont_lo=ncont_lo, TR0=TR0, FE0=FE0,
                        dtype=dtype)
            return 0

        loop(minor_layer)
        return

    # mode == "rmw": the round-2 structure, kept verbatim for A/B runs
    def minor_group(group, l):
        for member in group:
            (_, _, _, _, lg0, wm) = member
            c = _member_contrib(member, l, desc_ref, msc_ref, mtab_lo_ref,
                                mtab_up_ref, {}, ncont_lo=ncont_lo,
                                TR0=TR0, FE0=FE0, dtype=dtype)
            tau_s[l, lg0:lg0 + wm, :] += c

    def minor_layer(l, _):
        tc = jpin_ref[0, 2, l]
        if lo_mem:
            @pl.when(tc != 2)
            def _():
                minor_group(lo_mem, l)
        if up_mem:
            @pl.when(tc != 1)
            def _():
                minor_group(up_mem, l)
        return 0

    loop(minor_layer)
