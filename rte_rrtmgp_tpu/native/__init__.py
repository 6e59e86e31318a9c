"""Native C++ kernel tier: ctypes bindings over the extern C ABI.

The reference exposes its kernels through a C ABI so host models can swap
implementations (rte/kernels/api/, cbind_generator.py, CMake
``RTE_KERNEL_MODE=extern``). This package is the framework's equivalent:
``native/`` holds C++ implementations of the RTE solver/optical-props/flux
kernels with the same symbol names and array-layout contract, and this
module builds (cmake+ninja, cached) and binds them for CPU execution —
e.g. for host models that cannot run JAX, or for cross-checking the
TPU path against an independent compiled implementation.

Arrays here are numpy, Fortran-layout contract (columns fastest): a field
documented (ncol, nlay, ngpt) is passed as a numpy array of that shape in
Fortran order (``np.asfortranarray``). Wrappers handle the conversion.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

__all__ = ["build", "load", "available", "NativeKernels",
           "parse_header_prototypes"]

_ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
_NATIVE_DIR = os.path.join(_ROOT, "native")
_BUILD_DIR = os.path.join(_NATIVE_DIR, "build")

_libs = {}

_HEADERS = (os.path.join(_NATIVE_DIR, "include", "rte_kernels.h"),
            os.path.join(_NATIVE_DIR, "include", "rrtmgp_kernels.h"))


def parse_header_prototypes(float_ctype=ctypes.c_float) -> dict:
    """Parse the C ABI headers into {symbol: [ctypes argtypes]}.

    The headers are the single source of truth for the ABI (the reference
    generates its C headers from the Fortran with cbind_generator.py:7-60;
    here the direction is reversed: the hand-written headers drive the
    ctypes declarations). ``load()`` applies these as ``argtypes`` on
    every bound symbol, so any drift between a header prototype and a
    Python call site fails immediately with ctypes.ArgumentError instead
    of silently corrupting the call frame."""
    import re

    base = {"int": ctypes.c_int, "Bool": ctypes.c_bool, "Float": float_ctype}
    protos = {}
    for path in _HEADERS:
        with open(path) as f:
            text = f.read()
        text = re.sub(r"/\*.*?\*/", " ", text, flags=re.S)
        text = re.sub(r"//[^\n]*", " ", text)
        for m in re.finditer(r"\bvoid\s+(\w+)\s*\(([^;{]*)\)\s*;", text):
            name, params = m.group(1), m.group(2)
            argts = []
            for p in params.split(","):
                p = p.strip()
                if not p or p == "void":
                    continue
                tm = re.match(r"(?:const\s+)?(\w+)\s*(\*?)", p)
                if tm is None or tm.group(1) not in base:
                    raise ValueError(
                        f"{path}: unsupported parameter type in "
                        f"{name}: {p!r}")
                t = base[tm.group(1)]
                argts.append(ctypes.POINTER(t) if tm.group(2) else t)
            protos[name] = argts
    return protos


def build(force: bool = False) -> str:
    """Build the native libraries (cmake + ninja or make), cached."""
    lib32 = os.path.join(_BUILD_DIR, "librte_kernels_f32.so")
    if os.path.exists(lib32) and not force:
        return _BUILD_DIR
    os.makedirs(_BUILD_DIR, exist_ok=True)
    gen = []
    try:
        subprocess.run(["ninja", "--version"], capture_output=True, check=True)
        gen = ["-G", "Ninja"]
    except (OSError, subprocess.CalledProcessError):
        pass
    subprocess.run(["cmake", *gen, ".."], cwd=_BUILD_DIR, check=True,
                   capture_output=True)
    subprocess.run(["cmake", "--build", ".", "-j"], cwd=_BUILD_DIR,
                   check=True, capture_output=True)
    return _BUILD_DIR


def available() -> bool:
    try:
        build()
        return True
    except Exception:
        return False


def load(dtype=np.float32) -> "NativeKernels":
    """Load (building if needed) the kernel library for a working dtype."""
    dt = np.dtype(dtype)
    key = {"float32": "f32", "float64": "f64"}[dt.name]
    if key not in _libs:
        build()
        lib = ctypes.CDLL(os.path.join(_BUILD_DIR, f"librte_kernels_{key}.so"))
        _libs[key] = NativeKernels(lib, dt)
    return _libs[key]


class NativeKernels:
    """numpy-facing wrappers over the C ABI for one working precision."""

    def __init__(self, lib: ctypes.CDLL, dtype: np.dtype):
        self.lib = lib
        self.dtype = dtype
        cfloat = ctypes.c_float if dtype == np.float32 else ctypes.c_double
        for name, argts in parse_header_prototypes(cfloat).items():
            fn = getattr(lib, name)   # missing symbol = header/lib drift
            fn.argtypes = argts
            fn.restype = None

    # ------------------------------------------------------------------
    def _f(self, a, shape=None):
        """To Fortran-ordered working-precision array."""
        a = np.asfortranarray(np.asarray(a, self.dtype))
        if shape is not None and a.shape != shape:
            raise ValueError(f"native: expected shape {shape}, got {a.shape}")
        return a

    @staticmethod
    def _p(a):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float)) \
            if a.dtype == np.float32 else \
            a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))

    @staticmethod
    def _ip(a):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int))

    def _out(self, *shape):
        return np.zeros(shape, self.dtype, order="F")

    # ------------------------------------------------------------------
    def lw_solver_noscat(self, tau, lay_source, lev_source, sfc_emis,
                         sfc_src, inc_flux, *, top_at_1, ds, weights,
                         sfc_src_jac=None, ssa=None, g=None,
                         do_rescaling=False, do_jacobians=False,
                         broadband=True):
        ncol, nlay, ngpt = tau.shape
        nmus = len(weights)
        tau = self._f(tau)
        lay = self._f(lay_source)
        lev = self._f(lev_source, (ncol, nlay + 1, ngpt))
        emis = self._f(sfc_emis, (ncol, ngpt))
        ssrc = self._f(sfc_src, (ncol, ngpt))
        inc = self._f(inc_flux, (ncol, ngpt))
        ds = self._f(np.broadcast_to(
            np.asarray(ds, self.dtype).reshape(nmus, 1, 1),
            (nmus, ncol, ngpt)).transpose(1, 2, 0))
        wts = self._f(np.asarray(weights))
        jac_src = self._f(sfc_src_jac if sfc_src_jac is not None
                          else np.zeros((ncol, ngpt)), (ncol, ngpt))
        ssa_a = self._f(ssa if ssa is not None else np.zeros_like(tau))
        g_a = self._f(g if g is not None else np.zeros_like(tau))

        if broadband:
            bb_up = self._out(ncol, nlay + 1)
            bb_dn = self._out(ncol, nlay + 1)
            sp_up = sp_dn = self._out(1, 1, 1)
        else:
            sp_up = self._out(ncol, nlay + 1, ngpt)
            sp_dn = self._out(ncol, nlay + 1, ngpt)
            bb_up = bb_dn = self._out(1, 1)
        jac = self._out(ncol, nlay + 1)

        self.lib.rte_lw_solver_noscat(
            ctypes.c_int(ncol), ctypes.c_int(nlay), ctypes.c_int(ngpt),
            ctypes.c_bool(top_at_1), ctypes.c_int(nmus),
            self._p(ds), self._p(wts), self._p(tau), self._p(lay),
            self._p(lev), self._p(emis), self._p(ssrc), self._p(inc),
            self._p(sp_up), self._p(sp_dn),
            ctypes.c_bool(broadband), self._p(bb_up), self._p(bb_dn),
            ctypes.c_bool(do_jacobians), self._p(jac_src), self._p(jac),
            ctypes.c_bool(do_rescaling), self._p(ssa_a), self._p(g_a))
        if broadband:
            return (bb_up, bb_dn, jac if do_jacobians else None)
        return (sp_up, sp_dn, jac if do_jacobians else None)

    def lw_solver_2stream(self, tau, ssa, g, lay_source, lev_source,
                          sfc_emis, sfc_src, inc_flux, *, top_at_1):
        ncol, nlay, ngpt = tau.shape
        fu = self._out(ncol, nlay + 1, ngpt)
        fd = self._out(ncol, nlay + 1, ngpt)
        self.lib.rte_lw_solver_2stream(
            ctypes.c_int(ncol), ctypes.c_int(nlay), ctypes.c_int(ngpt),
            ctypes.c_bool(top_at_1), self._p(self._f(tau)),
            self._p(self._f(ssa)), self._p(self._f(g)),
            self._p(self._f(lay_source)),
            self._p(self._f(lev_source, (ncol, nlay + 1, ngpt))),
            self._p(self._f(sfc_emis, (ncol, ngpt))),
            self._p(self._f(sfc_src, (ncol, ngpt))),
            self._p(self._f(inc_flux, (ncol, ngpt))),
            self._p(fu), self._p(fd))
        return fu, fd

    def sw_solver_noscat(self, tau, mu0, inc_flux_dir, *, top_at_1):
        ncol, nlay, ngpt = tau.shape
        fdir = self._out(ncol, nlay + 1, ngpt)
        self.lib.rte_sw_solver_noscat(
            ctypes.c_int(ncol), ctypes.c_int(nlay), ctypes.c_int(ngpt),
            ctypes.c_bool(top_at_1), self._p(self._f(tau)),
            self._p(self._f(mu0, (ncol, nlay))),
            self._p(self._f(inc_flux_dir, (ncol, ngpt))), self._p(fdir))
        return fdir

    def sw_solver_2stream(self, tau, ssa, g, mu0, sfc_alb_dir, sfc_alb_dif,
                          inc_flux_dir, *, top_at_1, inc_flux_dif=None,
                          broadband=True):
        ncol, nlay, ngpt = tau.shape
        has_dif = inc_flux_dif is not None
        dif = self._f(inc_flux_dif if has_dif else np.zeros((ncol, ngpt)),
                      (ncol, ngpt))
        if broadband:
            bu = self._out(ncol, nlay + 1)
            bd = self._out(ncol, nlay + 1)
            br = self._out(ncol, nlay + 1)
            su = sd = sr = self._out(1, 1, 1)
        else:
            su = self._out(ncol, nlay + 1, ngpt)
            sd = self._out(ncol, nlay + 1, ngpt)
            sr = self._out(ncol, nlay + 1, ngpt)
            bu = bd = br = self._out(1, 1)
        self.lib.rte_sw_solver_2stream(
            ctypes.c_int(ncol), ctypes.c_int(nlay), ctypes.c_int(ngpt),
            ctypes.c_bool(top_at_1), self._p(self._f(tau)),
            self._p(self._f(ssa)), self._p(self._f(g)),
            self._p(self._f(mu0, (ncol, nlay))),
            self._p(self._f(sfc_alb_dir, (ncol, ngpt))),
            self._p(self._f(sfc_alb_dif, (ncol, ngpt))),
            self._p(self._f(inc_flux_dir, (ncol, ngpt))),
            self._p(su), self._p(sd), self._p(sr),
            ctypes.c_bool(has_dif), self._p(dif),
            ctypes.c_bool(broadband), self._p(bu), self._p(bd), self._p(br))
        return (bu, bd, br) if broadband else (su, sd, sr)

    # ------------------------------------------------------------------
    def delta_scale(self, tau, ssa, g, f=None):
        ncol, nlay, ngpt = tau.shape
        tau = self._f(tau).copy(order="F")
        ssa = self._f(ssa).copy(order="F")
        g = self._f(g).copy(order="F")
        if f is None:
            self.lib.rte_delta_scale_2str_k(
                ctypes.c_int(ncol), ctypes.c_int(nlay), ctypes.c_int(ngpt),
                self._p(tau), self._p(ssa), self._p(g))
        else:
            self.lib.rte_delta_scale_2str_f_k(
                ctypes.c_int(ncol), ctypes.c_int(nlay), ctypes.c_int(ngpt),
                self._p(tau), self._p(ssa), self._p(g),
                self._p(self._f(f)))
        return tau, ssa, g

    def increment_2stream_by_2stream(self, tau1, ssa1, g1, tau2, ssa2, g2):
        ncol, nlay, ngpt = tau1.shape
        tau1 = self._f(tau1).copy(order="F")
        ssa1 = self._f(ssa1).copy(order="F")
        g1 = self._f(g1).copy(order="F")
        self.lib.rte_increment_2stream_by_2stream(
            ctypes.c_int(ncol), ctypes.c_int(nlay), ctypes.c_int(ngpt),
            self._p(tau1), self._p(ssa1), self._p(g1),
            self._p(self._f(tau2)), self._p(self._f(ssa2)),
            self._p(self._f(g2)))
        return tau1, ssa1, g1

    def inc_2stream_by_2stream_bybnd(self, tau1, ssa1, g1, tau2, ssa2, g2,
                                     band_lims_gpt):
        ncol, nlay, ngpt = tau1.shape
        lims = np.asfortranarray(np.asarray(band_lims_gpt, np.int32).T)
        nbnd = lims.shape[1]
        tau1 = self._f(tau1).copy(order="F")
        ssa1 = self._f(ssa1).copy(order="F")
        g1 = self._f(g1).copy(order="F")
        self.lib.rte_inc_2stream_by_2stream_bybnd(
            ctypes.c_int(ncol), ctypes.c_int(nlay), ctypes.c_int(ngpt),
            self._p(tau1), self._p(ssa1), self._p(g1),
            self._p(self._f(tau2)), self._p(self._f(ssa2)),
            self._p(self._f(g2)), ctypes.c_int(nbnd), self._ip(lims))
        return tau1, ssa1, g1

    # ------------------------------------------------------------------
    def sum_broadband(self, spectral_flux):
        ncol, nlev, ngpt = spectral_flux.shape
        out = self._out(ncol, nlev)
        self.lib.rte_sum_broadband(
            ctypes.c_int(ncol), ctypes.c_int(nlev), ctypes.c_int(ngpt),
            self._p(self._f(spectral_flux)), self._p(out))
        return out

    # ------------------------------------------------------------------
    # RRTMGP gas-optics / cloud-optics kernels
    # (reference rrtmgp/kernels/api/mo_gas_optics_rrtmgp_kernels.F90,
    # api/mo_cloud_optics_rrtmgp_kernels.F90)
    # ------------------------------------------------------------------
    @staticmethod
    def _bp(a):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_bool))

    def interpolation(self, play, tlay, col_gas, *, flavor, press_ref_log,
                      temp_ref, press_ref_log_delta, temp_ref_min,
                      temp_ref_delta, press_ref_trop_log, vmr_ref, neta):
        """rrtmgp_interpolation. col_gas: (ncol, nlay, ngas+1) with dry air
        at index 0; flavor: (2, nflav) col_gas indices (0 = dry air).
        Returns dict of Fortran-ordered outputs (indices 1-based, ready to
        feed back into the tau/Planck kernels)."""
        ncol, nlay = play.shape
        ngas = col_gas.shape[2] - 1
        flav = np.asfortranarray(np.asarray(flavor, np.int32))
        nflav = flav.shape[1]
        npres = len(press_ref_log)
        ntemp = len(temp_ref)
        out = dict(
            jtemp=np.zeros((ncol, nlay), np.int32, order="F"),
            fmajor=np.zeros((2, 2, 2, ncol, nlay, nflav), self.dtype, order="F"),
            fminor=np.zeros((2, 2, ncol, nlay, nflav), self.dtype, order="F"),
            col_mix=np.zeros((2, ncol, nlay, nflav), self.dtype, order="F"),
            tropo=np.zeros((ncol, nlay), np.bool_, order="F"),
            jeta=np.zeros((2, ncol, nlay, nflav), np.int32, order="F"),
            jpress=np.zeros((ncol, nlay), np.int32, order="F"),
        )
        cf = ctypes.c_float if self.dtype == np.float32 else ctypes.c_double
        self.lib.rrtmgp_interpolation(
            ctypes.c_int(ncol), ctypes.c_int(nlay), ctypes.c_int(ngas),
            ctypes.c_int(nflav), ctypes.c_int(neta), ctypes.c_int(npres),
            ctypes.c_int(ntemp), self._ip(flav),
            self._p(self._f(press_ref_log)), self._p(self._f(temp_ref)),
            cf(press_ref_log_delta), cf(temp_ref_min), cf(temp_ref_delta),
            cf(press_ref_trop_log),
            self._p(self._f(vmr_ref, (2, ngas + 1, ntemp))),
            self._p(self._f(play)), self._p(self._f(tlay)),
            self._p(self._f(col_gas)),
            self._ip(out["jtemp"]), self._p(out["fmajor"]),
            self._p(out["fminor"]), self._p(out["col_mix"]),
            self._bp(out["tropo"]), self._ip(out["jeta"]),
            self._ip(out["jpress"]))
        return out

    def compute_tau_absorption(self, interp, *, ngpt, gpoint_flavor,
                               band_lims_gpt, kmajor, kminor_lower,
                               kminor_upper, minor_lower, minor_upper,
                               idx_h2o, play, tlay, col_gas):
        """rrtmgp_compute_tau_absorption. interp: the dict returned by
        :meth:`interpolation`. minor_lower/upper: objects with the
        1-based-convertible minor metadata (KDist.MinorSet works).
        Returns tau (ncol, nlay, ngpt) Fortran-ordered."""
        ncol, nlay = play.shape
        ngas = col_gas.shape[2] - 1
        ntemp, neta, npresp1, _ = kmajor.shape
        nflav = interp["jeta"].shape[3]
        nbnd = len(band_lims_gpt)

        def minor_args(ms):
            n = len(ms.kminor_start)
            lims = np.asfortranarray(
                np.asarray(ms.limits_gpt, np.int32).reshape(n, 2).T + 1)
            return (n, lims,
                    np.asarray(ms.scales_with_density, np.bool_),
                    np.asarray(ms.scale_by_complement, np.bool_),
                    np.asarray(ms.idx_minor, np.int32),
                    np.asarray(ms.idx_minor_scaling, np.int32),
                    np.asarray(ms.kminor_start, np.int32) + 1)

        nml, lim_l, swd_l, sbc_l, im_l, ims_l, ks_l = minor_args(minor_lower)
        nmu, lim_u, swd_u, sbc_u, im_u, ims_u, ks_u = minor_args(minor_upper)
        gflav = np.asfortranarray(np.asarray(gpoint_flavor, np.int32) + 1)
        blims = np.asfortranarray(np.asarray(band_lims_gpt, np.int32).T)
        tau = np.zeros((ncol, nlay, ngpt), self.dtype, order="F")
        self.lib.rrtmgp_compute_tau_absorption(
            ctypes.c_int(ncol), ctypes.c_int(nlay), ctypes.c_int(nbnd),
            ctypes.c_int(ngpt), ctypes.c_int(ngas), ctypes.c_int(nflav),
            ctypes.c_int(neta), ctypes.c_int(npresp1 - 1),
            ctypes.c_int(ntemp),
            ctypes.c_int(nml), ctypes.c_int(kminor_lower.shape[2]),
            ctypes.c_int(nmu), ctypes.c_int(kminor_upper.shape[2]),
            ctypes.c_int(idx_h2o),
            self._ip(gflav), self._ip(blims),
            self._p(self._f(kmajor)), self._p(self._f(kminor_lower)),
            self._p(self._f(kminor_upper)),
            self._ip(lim_l), self._ip(lim_u),
            self._bp(swd_l), self._bp(swd_u),
            self._bp(sbc_l), self._bp(sbc_u),
            self._ip(im_l), self._ip(im_u),
            self._ip(ims_l), self._ip(ims_u),
            self._ip(ks_l), self._ip(ks_u),
            self._bp(interp["tropo"]), self._p(interp["col_mix"]),
            self._p(interp["fmajor"]), self._p(interp["fminor"]),
            self._p(self._f(play)), self._p(self._f(tlay)),
            self._p(self._f(col_gas)),
            self._ip(interp["jeta"]), self._ip(interp["jtemp"]),
            self._ip(interp["jpress"]), self._p(tau))
        return tau

    def compute_tau_rayleigh(self, interp, *, gpoint_flavor, band_lims_gpt,
                             krayl, idx_h2o, col_dry, col_gas):
        """rrtmgp_compute_tau_rayleigh -> tau_rayleigh (ncol, nlay, ngpt)."""
        ncol, nlay = col_dry.shape
        ngas = col_gas.shape[2] - 1
        ntemp, neta, ngpt, _ = krayl.shape
        nflav = interp["jeta"].shape[3]
        gflav = np.asfortranarray(np.asarray(gpoint_flavor, np.int32) + 1)
        blims = np.asfortranarray(np.asarray(band_lims_gpt, np.int32).T)
        out = np.zeros((ncol, nlay, ngpt), self.dtype, order="F")
        self.lib.rrtmgp_compute_tau_rayleigh(
            ctypes.c_int(ncol), ctypes.c_int(nlay),
            ctypes.c_int(blims.shape[1]), ctypes.c_int(ngpt),
            ctypes.c_int(ngas), ctypes.c_int(nflav), ctypes.c_int(neta),
            ctypes.c_int(0), ctypes.c_int(ntemp),
            self._ip(gflav), self._ip(blims), self._p(self._f(krayl)),
            ctypes.c_int(idx_h2o), self._p(self._f(col_dry)),
            self._p(self._f(col_gas)), self._p(interp["fminor"]),
            self._ip(interp["jeta"]), self._bp(interp["tropo"]),
            self._ip(interp["jtemp"]), self._p(out))
        return out

    def compute_planck_source(self, interp, *, tlay, tlev, tsfc, sfc_lay,
                              gpt2band, band_lims_gpt, planck_frac,
                              temp_ref_min, totplnk_delta, totplnk,
                              gpoint_flavor):
        """rrtmgp_compute_Planck_source -> (sfc_src, lay_src, lev_src,
        sfc_src_jac). sfc_lay 1-based; gpt2band 0-based (converted)."""
        ncol, nlay = tlay.shape
        ntemp, neta, npresp1, ngpt = planck_frac.shape
        totplnk = np.asarray(totplnk)
        nplnk, nbnd = totplnk.shape
        gbands = np.asarray(gpt2band, np.int32) + 1
        gflav = np.asfortranarray(np.asarray(gpoint_flavor, np.int32) + 1)
        blims = np.asfortranarray(np.asarray(band_lims_gpt, np.int32).T)
        cf = ctypes.c_float if self.dtype == np.float32 else ctypes.c_double
        sfc = np.zeros((ncol, ngpt), self.dtype, order="F")
        lay = np.zeros((ncol, nlay, ngpt), self.dtype, order="F")
        lev = np.zeros((ncol, nlay + 1, ngpt), self.dtype, order="F")
        jac = np.zeros((ncol, ngpt), self.dtype, order="F")
        nflav = interp["jeta"].shape[3]
        self.lib.rrtmgp_compute_Planck_source(
            ctypes.c_int(ncol), ctypes.c_int(nlay), ctypes.c_int(nbnd),
            ctypes.c_int(ngpt), ctypes.c_int(nflav), ctypes.c_int(neta),
            ctypes.c_int(npresp1 - 1), ctypes.c_int(ntemp),
            ctypes.c_int(nplnk),
            self._p(self._f(tlay)), self._p(self._f(tlev)),
            self._p(self._f(tsfc)), ctypes.c_int(sfc_lay),
            self._p(interp["fmajor"]), self._ip(interp["jeta"]),
            self._bp(interp["tropo"]), self._ip(interp["jtemp"]),
            self._ip(interp["jpress"]),
            self._ip(np.ascontiguousarray(gbands)), self._ip(blims),
            self._p(self._f(planck_frac)),
            cf(temp_ref_min), cf(totplnk_delta),
            self._p(self._f(totplnk)), self._ip(gflav),
            self._p(sfc), self._p(lay), self._p(lev), self._p(jac))
        return sfc, lay, lev, jac

    def compute_cld_from_table(self, mask, lwp, re, *, nsteps, step_size,
                               offset, tau_table, ssa_table, asy_table):
        """rrtmgp_compute_cld_from_table -> (tau, taussa, taussag)."""
        ncol, nlay = lwp.shape
        ngpt = np.asarray(tau_table).shape[1]
        cf = ctypes.c_float if self.dtype == np.float32 else ctypes.c_double
        mask = np.asfortranarray(np.asarray(mask, np.bool_))
        tau = np.zeros((ncol, nlay, ngpt), self.dtype, order="F")
        tss = np.zeros((ncol, nlay, ngpt), self.dtype, order="F")
        tsg = np.zeros((ncol, nlay, ngpt), self.dtype, order="F")
        self.lib.rrtmgp_compute_cld_from_table(
            ctypes.c_int(ncol), ctypes.c_int(nlay), ctypes.c_int(ngpt),
            self._bp(mask), self._p(self._f(lwp)), self._p(self._f(re)),
            ctypes.c_int(nsteps), cf(step_size), cf(offset),
            self._p(self._f(tau_table)), self._p(self._f(ssa_table)),
            self._p(self._f(asy_table)),
            self._p(tau), self._p(tss), self._p(tsg))
        return tau, tss, tsg

    def sum_byband(self, spectral_flux, band_lims_gpt):
        ncol, nlev, ngpt = spectral_flux.shape
        lims = np.asfortranarray(np.asarray(band_lims_gpt, np.int32).T)
        nbnd = lims.shape[1]
        out = self._out(ncol, nlev, nbnd)
        self.lib.rte_sum_byband(
            ctypes.c_int(ncol), ctypes.c_int(nlev), ctypes.c_int(ngpt),
            ctypes.c_int(nbnd), self._ip(lims),
            self._p(self._f(spectral_flux)), self._p(out))
        return out
