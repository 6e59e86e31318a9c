"""Longwave radiative-transfer solver numerics.

TPU-native re-implementation of the reference LW kernels
(rte/kernels/mo_rte_solver_kernels.F90):

  - ``lw_solver_noscat`` (:248-367): multi-angle Gaussian quadrature over the
    single-angle emission/absorption solve (:51-240), with optional
    Tang-2018 scattering rescaling (doi:10.1175/JAS-D-18-0014.1) and an
    analytic surface-temperature Jacobian.
  - ``lw_solver_2stream`` (:377-440): Meador-Weaver two-stream with
    Toon-1989 linear-in-B sources and Shonk-Hogan adding.

Design notes (TPU-first, not a port):
  * Arrays are (ncol, nlay, ngpt): columns = batch/shard axis, g-points =
    lane axis. All g-points propagate simultaneously; the only sequential
    axis is the vertical, expressed as ``lax.scan`` over layers with
    (ncol, ngpt) carries. The reference's per-g-point loop disappears.
  * Vertical orientation is canonicalized to top-at-index-0 by flipping
    inputs/outputs (cheap relayout) instead of dual code paths
    (reference keeps two loop nests per sweep, e.g. :681-745).
  * Broadband reduction is a g-point sum fused by XLA into the same
    program; spectral fluxes are only materialized when requested
    (mirrors the reference's do_broadband fast path, mo_rte_lw.F90:290-322).
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import numpy as np
import jax.numpy as jnp
from jax import lax

from ..constants import PI

__all__ = [
    "GAUSS_DS",
    "GAUSS_WTS",
    "lw_solver_noscat",
    "lw_solver_2stream",
    "lw_source_noscat",
    "lw_two_stream",
    "lw_source_2str",
]

# "Gauss-Jacobi-5" quadrature secants/weights: Table 1 of Hogan 2023
# (doi:10.1002/qj.4598), as used at reference mo_rte_lw.F90:135-160.
# GAUSS_DS[n-1][k] is the k-th secant (1/mu) of the n-point rule.
_MUS = (
    (0.6096748751,),
    (0.2509907356, 0.7908473988),
    (0.1024922169, 0.4417960320, 0.8633751621),
    (0.0454586727, 0.2322334416, 0.5740198775, 0.9030775973),
)
GAUSS_DS = tuple(tuple(1.0 / m for m in row) for row in _MUS)
GAUSS_WTS = (
    (1.0,),
    (0.2300253764, 0.7699746236),
    (0.0437820218, 0.3875796738, 0.5686383044),
    (0.0092068785, 0.1285704278, 0.4323381850, 0.4298845087),
)


class LWFluxes(NamedTuple):
    flux_up: jax.Array          # (ncol, nlev) broadband or (ncol, nlev, ngpt)
    flux_dn: jax.Array
    flux_up_jac: Optional[jax.Array]  # (ncol, nlev) broadband, or None


def _flip_lay(x):
    return jnp.flip(x, axis=1)


def lw_source_noscat(lay_source, lev_source_top, lev_source_bot, tau, trans):
    """Linear-in-tau layer emission toward each face (Clough et al. 1992
    Eq 13; reference lw_source_noscat, mo_rte_solver_kernels.F90:620-675,
    including the 3rd-order small-tau series of :652-655).

    All args (..., nlay, ...)-shaped alike; returns (source_dn, source_up)
    where "dn" exits the layer bottom and "up" exits the top.
    """
    dtype = tau.dtype
    eps = jnp.finfo(dtype).eps
    tau_thresh = jnp.sqrt(jnp.sqrt(eps))
    # fact = (1 - trans)/tau - trans, series-expanded for small tau
    safe_tau = jnp.maximum(tau, jnp.finfo(dtype).tiny)
    fact_big = (1.0 - trans) / safe_tau - trans
    fact_small = tau * (0.5 + tau * (-1.0 / 3.0 + tau * (1.0 / 8.0)))
    fact = jnp.where(tau > tau_thresh, fact_big, fact_small)
    source_dn = (1.0 - trans) * lev_source_bot + 2.0 * fact * (lay_source - lev_source_bot)
    source_up = (1.0 - trans) * lev_source_top + 2.0 * fact * (lay_source - lev_source_top)
    return source_dn, source_up


def _oneangle(tau, lay_source, lev_source, sfc_emis, sfc_src, inc_flux,
              ds, weight, sfc_src_jac, ssa, g, do_rescaling, do_jacobians,
              spectral):
    """Single-quadrature-angle emission/absorption solve, top at index 0.

    tau/lay_source: (ncol, nlay, ngpt); lev_source: (ncol, nlay+1, ngpt);
    boundary fields (ncol, ngpt); ds (ncol, ngpt) secants.
    Returns (flux_up, flux_dn, flux_up_jac) as *radiances* summed over gpt
    when not spectral (caller applies pi * weight), or per-gpt radiances.
    """
    dtype = tau.dtype
    ncol, nlay, ngpt = tau.shape

    tau_loc = tau * ds[:, None, :]
    if do_rescaling:
        # Tang 2018 similarity-principle rescaling (reference :148-178):
        #   wb = ssa (1-g)/2 ; scaleTau = 1 - ssa + wb ; Cn = 0.4 wb/scaleTau
        wb = ssa * (1.0 - g) * 0.5
        scale_tau = 1.0 - ssa + wb
        cn = 0.4 * wb / scale_tau
        tau_loc = tau_loc * scale_tau
        trans = jnp.exp(-tau_loc)
        an = 1.0 - trans * trans
    else:
        trans = jnp.exp(-tau_loc)
        an = cn = None

    lev_top = lev_source[:, :-1, :]   # top edge of each layer
    lev_bot = lev_source[:, 1:, :]    # bottom edge of each layer
    source_dn, source_up = lw_source_noscat(lay_source, lev_top, lev_bot,
                                            tau_loc, trans)

    # layer-axis-leading views for scans: (nlay, ncol, ngpt)
    trans_s = jnp.moveaxis(trans, 1, 0)
    sdn_s = jnp.moveaxis(source_dn, 1, 0)
    sup_s = jnp.moveaxis(source_up, 1, 0)

    # ---- downward transport (reference lw_transport_noscat_dn :681-708) ----
    radn_dn_top = inc_flux / (PI * weight)

    def down_step(radn, xs):
        t, s = xs
        radn = t * radn + s
        return radn, radn

    _, radn_dn_rest = lax.scan(down_step, radn_dn_top, (trans_s, sdn_s))
    radn_dn = jnp.concatenate([radn_dn_top[None], radn_dn_rest], axis=0)  # (nlev, ncol, ngpt)

    # ---- surface reflection + emission (:198-202) ----
    sfc_albedo = 1.0 - sfc_emis
    radn_up_sfc = radn_dn[-1] * sfc_albedo + sfc_emis * sfc_src
    jac_sfc = sfc_emis * sfc_src_jac if do_jacobians else None

    # ---- upward transport ----
    if do_rescaling:
        an_s = jnp.moveaxis(an, 1, 0)
        cn_s = jnp.moveaxis(cn, 1, 0)

        # Tang adjustment uses downwelling radiance at the layer's top edge
        # (reference lw_transport_1rescl :784-793)
        def up_step(carry, xs):
            radn_up, jac = carry
            t, s_up, s_dn, a, c, rdn_top = xs
            adj = c * (a * rdn_top - t * s_dn - s_up)
            radn_up = t * radn_up + s_up + adj
            if jac is not None:
                jac = t * jac
            return (radn_up, jac), (radn_up, jac)

        (_, _), (radn_up_rest, jac_rest) = lax.scan(
            up_step, (radn_up_sfc, jac_sfc),
            (trans_s, sup_s, sdn_s, an_s, cn_s, radn_dn[:-1]),
            reverse=True)
        radn_up = jnp.concatenate([radn_up_rest, radn_up_sfc[None]], axis=0)

        # second downward sweep with adjustment from the upwelling field
        # (reference :798-808; uses radn_up at the layer's top edge)
        def down2_step(radn, xs):
            t, s_up, s_dn, a, c, rup_top = xs
            adj = c * (a * rup_top - t * s_up - s_dn)
            radn = t * radn + s_dn + adj
            return radn, radn

        _, radn_dn_rest = lax.scan(
            down2_step, radn_dn_top,
            (trans_s, sup_s, sdn_s, an_s, cn_s, radn_up[:-1]))
        radn_dn = jnp.concatenate([radn_dn_top[None], radn_dn_rest], axis=0)
    else:
        def up_step(carry, xs):
            radn_up, jac = carry
            t, s = xs
            radn_up = t * radn_up + s
            if jac is not None:
                jac = t * jac
            return (radn_up, jac), (radn_up, jac)

        (_, _), (radn_up_rest, jac_rest) = lax.scan(
            up_step, (radn_up_sfc, jac_sfc), (trans_s, sup_s), reverse=True)
        radn_up = jnp.concatenate([radn_up_rest, radn_up_sfc[None]], axis=0)

    if do_jacobians:
        jac = jnp.concatenate([jac_rest, jac_sfc[None]], axis=0)
        jac_bb = jnp.sum(jac, axis=-1)          # (nlev, ncol) broadband only
    else:
        jac_bb = None

    if spectral:
        up = jnp.moveaxis(radn_up, 0, 1)        # (ncol, nlev, ngpt)
        dn = jnp.moveaxis(radn_dn, 0, 1)
    else:
        up = jnp.sum(radn_up, axis=-1).T        # (ncol, nlev)
        dn = jnp.sum(radn_dn, axis=-1).T
    jac_out = jac_bb.T if jac_bb is not None else None
    return up, dn, jac_out


def lw_solver_noscat(tau, lay_source, lev_source, sfc_emis, sfc_src, inc_flux,
                     *, top_at_1: bool, ds, weights,
                     sfc_src_jac=None, ssa=None, g=None,
                     do_rescaling: bool = False,
                     do_jacobians: bool = False,
                     spectral: bool = False,
                     byband_width=None) -> LWFluxes:
    """Multi-angle no-scattering LW solve (reference rte_lw_solver_noscat,
    mo_rte_solver_kernels.F90:248-367).

    Args:
      tau, lay_source: (ncol, nlay, ngpt); lev_source: (ncol, nlay+1, ngpt).
      sfc_emis, sfc_src, inc_flux: (ncol, ngpt).
      ds: per-angle secants, (nmus, ncol, ngpt) or sequence of scalars.
      weights: (nmus,) quadrature weights (Python floats, static).
      spectral: if True return per-g-point fluxes, else broadband.
      byband_width: uniform band width -> per-band flux sums
        (ncol, nlev, ngpt // byband_width), computed in-kernel on the
        Pallas path (reference mo_fluxes_byband.F90:159-190).
    Returns LWFluxes; fluxes are in W/m2 (intensity * pi * weight).
    """
    dtype = tau.dtype
    ncol, nlay, ngpt = tau.shape

    if not top_at_1:
        tau = _flip_lay(tau)
        lay_source = _flip_lay(lay_source)
        lev_source = _flip_lay(lev_source)
        if ssa is not None:
            ssa = _flip_lay(ssa)
        if g is not None:
            g = _flip_lay(g)

    if sfc_src_jac is None:
        sfc_src_jac = jnp.zeros_like(sfc_src)
    if do_rescaling and (ssa is None or g is None):
        raise ValueError("do_rescaling requires ssa and g")
    if not do_rescaling:
        ssa = g = None

    # STATIC per-angle secants (Python/numpy scalars, or a CONCRETE
    # jax.Array — anything whose values are known at trace time):
    # extracted from the original argument BEFORE jnp.asarray conversion.
    # Under jax.export cross-platform tracing (and the jax.enable_x64
    # context manager) even jnp.asarray of constants is staged as a
    # tracer, so a post-conversion isinstance(..., Tracer) test would
    # wrongly disable the static-secant adjoint-kernel branch below.
    # The try/except covers every non-concrete form in one place: a
    # Tracer argument, a tuple/list containing traced scalars (e.g.
    # differentiating w.r.t. the secant under jit), or anything else
    # numpy cannot concretize.
    static_ds = None
    if not isinstance(ds, jax.core.Tracer):
        try:
            ds_np = np.asarray(ds)
            if ds_np.ndim == 1:
                static_ds = tuple(float(x) for x in ds_np)
        except (TypeError, ValueError, RuntimeError,
                jax.errors.TracerArrayConversionError,
                jax.errors.ConcretizationTypeError):
            # RuntimeError: non-addressable (multi-host-sharded) or
            # donated/deleted buffers cannot be fetched — fall back to
            # the traced path exactly like any other non-concrete input
            static_ds = None

    ds_arr = jnp.asarray(ds, dtype=dtype)
    scalar_ds = ds_arr.ndim == 1

    # secants per angle: either per-angle scalars or per-(col, gpt) fields
    # (the lw_Ds path, always a single "angle")
    per_gpt_ds = ds_arr.ndim == 3

    if byband_width is not None and (byband_width <= 0
                                     or ngpt % byband_width != 0):
        raise ValueError(f"lw_solver_noscat: byband_width {byband_width} "
                         f"does not tile ngpt {ngpt}")

    def _xla_angles(tau, lay_source, lev_source, sfc_emis, sfc_src,
                    inc_flux, ds_arr, sfc_src_jac, ssa, g):
        """Pure-XLA multi-angle accumulation (+ byband grouping) — the
        fall-through path AND the gradient definition of the Pallas
        branch below."""
        da = ds_arr
        if da.ndim == 1:   # per-angle scalars
            da = jnp.broadcast_to(da[:, None, None],
                                  (da.shape[0], ncol, ngpt))
        up = dn = jac = None
        want_spectral = spectral or byband_width is not None
        for imu in range(da.shape[0]):
            w = float(weights[imu])
            u, d, j = _oneangle(tau, lay_source, lev_source, sfc_emis,
                                sfc_src, inc_flux, da[imu], w, sfc_src_jac,
                                ssa, g, do_rescaling, do_jacobians,
                                want_spectral)
            piw = jnp.asarray(PI * w, dtype)
            u, d = u * piw, d * piw
            j = j * piw if j is not None else None
            up = u if up is None else up + u
            dn = d if dn is None else dn + d
            jac = j if jac is None else jac + j
        if byband_width is not None and not spectral:
            # XLA byband fallback: group-sum the spectral fluxes
            nb = ngpt // byband_width
            group = lambda x: jnp.sum(
                x.reshape(x.shape[0], x.shape[1], nb, byband_width), axis=-1)
            up, dn = group(up), group(dn)
        return up, dn, jac

    if not spectral and (scalar_ds or per_gpt_ds):
        # fused Pallas kernel (auto on TPU; forced/disabled via
        # config.use_pallas); multi-angle sums per-angle kernel launches
        # exactly as the reference accumulates angles (:314-361).
        # Wrapped in the custom-VJP bridge: jax.grad works on this path,
        # with the gradient defined by the XLA formulation above.
        from ..config import get_config, on_tpu as _on_tpu
        on_tpu = _on_tpu()
        cfg = get_config().use_pallas
        kernel_byband = byband_width is not None and 128 % byband_width == 0
        if ((on_tpu if cfg is None else cfg)
                and (byband_width is None or kernel_byband)):
            from .pallas.autodiff import with_xla_grad
            from .pallas.solver_lw_kernel import lw_noscat_broadband_lane

            # the default dispatch (single angle, scalar secant, no
            # rescaling/Jacobian, broadband) has a hand-derived adjoint
            # kernel: BOTH directions run as Pallas kernels, no XLA
            # retrace on the backward pass (ops/pallas/solver_lw_bwd.py)
            if (not do_rescaling and not do_jacobians
                    and byband_width is None and static_ds is not None
                    and len(weights) == 1):
                from .pallas.solver_lw_bwd import (
                    lw_noscat_broadband_lane_vjp)
                up, dn = lw_noscat_broadband_lane_vjp(
                    tau, lay_source, lev_source, sfc_emis, sfc_src,
                    inc_flux, static_ds[0], float(weights[0]),
                    not on_tpu)
                if not top_at_1:
                    up = jnp.flip(up, axis=1)
                    dn = jnp.flip(dn, axis=1)
                return LWFluxes(flux_up=up, flux_dn=dn, flux_up_jac=None)

            def _pallas_angles(tau, lay_source, lev_source, sfc_emis,
                               sfc_src, inc_flux, ds_arr, sfc_src_jac,
                               ssa, g):
                up = dn = jac = None
                for imu in range(len(weights)):
                    u, d, j = lw_noscat_broadband_lane(
                        tau, lay_source, lev_source, sfc_emis, sfc_src,
                        inc_flux, ds=ds_arr[imu], weight=weights[imu],
                        ssa=ssa, g=g, sfc_src_jac=sfc_src_jac,
                        do_rescaling=do_rescaling,
                        do_jacobians=do_jacobians,
                        band_width=byband_width, interpret=not on_tpu)
                    up = u if up is None else up + u
                    dn = d if dn is None else dn + d
                    jac = j if jac is None else jac + j
                return up, dn, jac

            up, dn, jac = with_xla_grad(
                _pallas_angles, _xla_angles, tau, lay_source, lev_source,
                sfc_emis, sfc_src, inc_flux, ds_arr, sfc_src_jac, ssa, g)
            if not top_at_1:
                up = jnp.flip(up, axis=1)
                dn = jnp.flip(dn, axis=1)
                jac = jnp.flip(jac, axis=1) if jac is not None else None
            return LWFluxes(flux_up=up, flux_dn=dn, flux_up_jac=jac)

    up, dn, jac = _xla_angles(tau, lay_source, lev_source, sfc_emis,
                              sfc_src, inc_flux, ds_arr, sfc_src_jac,
                              ssa, g)

    if not top_at_1:
        up = jnp.flip(up, axis=1)
        dn = jnp.flip(dn, axis=1)
        jac = jnp.flip(jac, axis=1) if jac is not None else None
    return LWFluxes(flux_up=up, flux_dn=dn, flux_up_jac=jac)


# ---------------------------------------------------------------------------
# Two-stream LW
# ---------------------------------------------------------------------------

def lw_two_stream(tau, w0, g):
    """Meador-Weaver diffuse reflectance/transmittance with LW diffusivity
    secant 1.66 (Fu et al. 1997 Eqs 2.9-2.10; reference lw_two_stream,
    mo_rte_solver_kernels.F90:854-909). Returns gamma1, gamma2, Rdif, Tdif."""
    dtype = tau.dtype
    lw_diff_sec = jnp.asarray(1.66, dtype)
    gamma1 = lw_diff_sec * (1.0 - 0.5 * w0 * (1.0 + g))
    gamma2 = lw_diff_sec * 0.5 * w0 * (1.0 - g)
    k = jnp.sqrt(jnp.maximum((gamma1 - gamma2) * (gamma1 + gamma2),
                             jnp.asarray(1e-12, dtype)))
    e1 = jnp.exp(-tau * k)
    e2 = e1 * e1
    rt = 1.0 / (k * (1.0 + e2) + gamma1 * (1.0 - e2))
    rdif = rt * gamma2 * (1.0 - e2)
    tdif = rt * 2.0 * k * e1
    return gamma1, gamma2, rdif, tdif


def lw_source_2str(sfc_emis, sfc_src, lay_source, lev_top, lev_bot,
                   gamma1, gamma2, rdif, tdif, tau):
    """Toon et al. 1989 (JGR) Eqs 26-27 linear-in-B two-stream source,
    x pi to convert W/m2-str to flux (reference lw_source_2str,
    mo_rte_solver_kernels.F90:917-967)."""
    dtype = tau.dtype
    pi = jnp.asarray(PI, dtype)
    safe = tau * (gamma1 + gamma2)
    z = (lev_bot - lev_top) / jnp.where(safe > 0, safe, 1.0)
    zup_top = z + lev_top
    zup_bot = z + lev_bot
    zdn_top = -z + lev_top
    zdn_bot = -z + lev_bot
    src_up = pi * (zup_top - rdif * zdn_top - tdif * zup_bot)
    src_dn = pi * (zdn_bot - rdif * zup_bot - tdif * zdn_top)
    thin = tau <= jnp.asarray(1.0e-8, dtype)
    src_up = jnp.where(thin, 0.0, src_up)
    src_dn = jnp.where(thin, 0.0, src_dn)
    src_sfc = pi * sfc_emis * sfc_src
    return src_dn, src_up, src_sfc


def adding(albedo_sfc, rdif, tdif, src_dn, src_up, src_sfc, flux_dn_top):
    """Shonk & Hogan 2008 adding for diffuse transport, top at index 0
    (reference ``adding``, mo_rte_solver_kernels.F90:1135-1245; Eqs 9-13).

    Shapes: rdif/tdif/src_dn/src_up (ncol, nlay, ngpt) or any (..., per-layer)
    with layer axis=1; albedo_sfc/src_sfc/flux_dn_top (ncol, ngpt).
    Returns (flux_up, flux_dn) at levels, axis 1 = nlay+1.
    """
    rdif_s = jnp.moveaxis(rdif, 1, 0)
    tdif_s = jnp.moveaxis(tdif, 1, 0)
    sdn_s = jnp.moveaxis(src_dn, 1, 0)
    sup_s = jnp.moveaxis(src_up, 1, 0)

    # bottom-to-top sweep building albedo (alpha) and upward source (G)
    def up_build(carry, xs):
        alb_below, src_below = carry
        r, t, sd, su = xs
        denom = 1.0 / (1.0 - r * alb_below)                       # Eq 10
        alb = r + t * t * alb_below * denom                       # Eq 9
        src = su + t * denom * (src_below + alb_below * sd)       # Eq 11
        return (alb, src), (alb, src, denom)

    (alb_top, src_top), (alb_rest, src_rest, denom_s) = lax.scan(
        up_build, (albedo_sfc, src_sfc), (rdif_s, tdif_s, sdn_s, sup_s),
        reverse=True)
    # albedo/src at levels 0..nlay: scan (reverse) emits per-layer values at
    # the layer's top edge; the surface level holds the BCs.
    albedo = jnp.concatenate([alb_rest, albedo_sfc[None]], axis=0)
    src = jnp.concatenate([src_rest, src_sfc[None]], axis=0)

    flux_up_top = flux_dn_top * albedo[0] + src[0]                # Eq 12 at TOA

    def dn_sweep(fdn, xs):
        t, r, sd, denom, alb_lev, src_lev = xs
        fdn = (t * fdn + r * src_lev + sd) * denom                # Eq 13
        fup = fdn * alb_lev + src_lev                             # Eq 12
        return fdn, (fup, fdn)

    _, (fup_rest, fdn_rest) = lax.scan(
        dn_sweep, flux_dn_top,
        (tdif_s, rdif_s, sdn_s, denom_s, albedo[1:], src[1:]))
    flux_up = jnp.concatenate([flux_up_top[None], fup_rest], axis=0)
    flux_dn = jnp.concatenate([flux_dn_top[None], fdn_rest], axis=0)
    # (nlev, ncol, ngpt) -> (ncol, nlev, ngpt)
    return jnp.moveaxis(flux_up, 0, 1), jnp.moveaxis(flux_dn, 0, 1)


def lw_solver_2stream(tau, ssa, g, lay_source, lev_source, sfc_emis, sfc_src,
                      inc_flux, *, top_at_1: bool,
                      spectral: bool = False,
                      byband_width=None) -> LWFluxes:
    """True two-stream LW solve (reference rte_lw_solver_2stream,
    mo_rte_solver_kernels.F90:377-440)."""
    ngpt = tau.shape[-1]
    if byband_width is not None and (byband_width <= 0
                                     or ngpt % byband_width != 0):
        raise ValueError(f"lw_solver_2stream: byband_width {byband_width} "
                         f"does not tile ngpt {ngpt}")
    if not top_at_1:
        tau, ssa, g = _flip_lay(tau), _flip_lay(ssa), _flip_lay(g)
        lay_source = _flip_lay(lay_source)
        lev_source = _flip_lay(lev_source)

    if not spectral:
        # fused Pallas kernel: coefficients + Toon sources + adding +
        # broadband/byband reduction in VMEM (auto on TPU)
        from ..config import get_config, on_tpu as _on_tpu
        on_tpu = _on_tpu()
        cfg = get_config().use_pallas
        kernel_byband = byband_width is not None and 128 % byband_width == 0
        if ((on_tpu if cfg is None else cfg)
                and (byband_width is None or kernel_byband)):
            from .pallas.solver_lw_kernel import lw_two_stream_broadband_lane
            up, dn = lw_two_stream_broadband_lane(
                tau, ssa, g, lay_source, lev_source, sfc_emis, sfc_src,
                inc_flux, band_width=byband_width, interpret=not on_tpu)
            if not top_at_1:
                up = jnp.flip(up, axis=1)
                dn = jnp.flip(dn, axis=1)
            return LWFluxes(flux_up=up, flux_dn=dn, flux_up_jac=None)

    gamma1, gamma2, rdif, tdif = lw_two_stream(tau, ssa, g)
    lev_top = lev_source[:, :-1, :]
    lev_bot = lev_source[:, 1:, :]
    src_dn, src_up, src_sfc = lw_source_2str(sfc_emis, sfc_src, lay_source,
                                             lev_top, lev_bot,
                                             gamma1, gamma2, rdif, tdif, tau)
    sfc_albedo = 1.0 - sfc_emis
    flux_up, flux_dn = adding(sfc_albedo, rdif, tdif, src_dn, src_up,
                              src_sfc, inc_flux)
    if not spectral:
        if byband_width is not None:
            nb = ngpt // byband_width
            group = lambda x: jnp.sum(x.reshape(
                x.shape[0], x.shape[1], nb, byband_width), axis=-1)
            flux_up, flux_dn = group(flux_up), group(flux_dn)
        else:
            flux_up = jnp.sum(flux_up, axis=-1)
            flux_dn = jnp.sum(flux_dn, axis=-1)
    if not top_at_1:
        flux_up = jnp.flip(flux_up, axis=1)
        flux_dn = jnp.flip(flux_dn, axis=1)
    return LWFluxes(flux_up=flux_up, flux_dn=flux_dn, flux_up_jac=None)
