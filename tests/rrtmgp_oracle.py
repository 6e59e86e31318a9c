"""Plain-loop NumPy oracle for RRTMGP gas optics.

An independent, deliberately-slow scalar implementation of the correlated-k
interpolation algorithm (as documented in the reference kernels
rrtmgp/kernels/mo_gas_optics_rrtmgp_kernels.F90), used to validate the
vectorized TPU implementation on synthetic k-distributions. Operates on a
loaded KDist's (numpy-converted) tables so it exercises exactly the same
reduced data the production code sees.
"""
import numpy as np


def _np(kd):
    """Snapshot a KDist's device tables as numpy."""
    d = {
        "kmajor": np.asarray(kd.kmajor, np.float64),
        "kminor_lower": np.asarray(kd.kminor_lower, np.float64),
        "kminor_upper": np.asarray(kd.kminor_upper, np.float64),
    }
    if kd.krayl is not None:
        d["krayl"] = np.asarray(kd.krayl, np.float64)
    if kd.planck_frac is not None:
        d["planck_frac"] = np.asarray(kd.planck_frac, np.float64)
        d["totplnk"] = np.asarray(kd.totplnk, np.float64)
    return d


def oracle_interpolation(kd, play, tlay, col_gas):
    """Scalar version of the interpolation kernel. Returns a dict of
    0-based index arrays and weights in the same conventions as
    rte_rrtmgp_tpu.ops.gas_optics.InterpCoeffs."""
    ncol, nlay = play.shape
    nflav = kd.nflav
    ntemp = kd.temp_ref.shape[0]
    npres = kd.press_ref_log.shape[0]
    neta = kd.neta

    jtemp = np.zeros((ncol, nlay), np.int64)
    ftemp = np.zeros((ncol, nlay))
    jpress = np.zeros((ncol, nlay), np.int64)
    fpress = np.zeros((ncol, nlay))
    tropo = np.zeros((ncol, nlay), bool)
    jeta = np.zeros((ncol, nlay, nflav, 2), np.int64)
    col_mix = np.zeros((ncol, nlay, nflav, 2))
    fminor = np.zeros((ncol, nlay, nflav, 2, 2))
    fmajor = np.zeros((ncol, nlay, nflav, 2, 2, 2))

    press_trop = np.exp(kd.press_ref_trop_log)
    tiny = np.finfo(np.float64).tiny

    for c in range(ncol):
        for l in range(nlay):
            jt_raw = int(np.floor((tlay[c, l] - (kd.temp_ref_min - kd.temp_ref_delta))
                                  / kd.temp_ref_delta))  # 1-based raw
            jt = min(ntemp - 1, max(1, jt_raw))
            jtemp[c, l] = jt - 1
            ftemp[c, l] = (tlay[c, l] - kd.temp_ref[min(max(jt_raw, 1), ntemp) - 1]) \
                / kd.temp_ref_delta
            locp = 1.0 + (np.log(play[c, l]) - kd.press_ref_log[0]) / kd.press_ref_log_delta
            jp = min(float(npres - 1), max(1.0, float(np.trunc(locp))))
            jpress[c, l] = int(jp) - 1
            fpress[c, l] = locp - jp
            tropo[c, l] = play[c, l] > press_trop
            itropo = 0 if tropo[c, l] else 1

            for f in range(nflav):
                g1, g2 = int(kd.flavor[0, f]), int(kd.flavor[1, f])
                for it in range(2):
                    jtt = min(jtemp[c, l] + it, ntemp - 1)
                    ratio = kd.vmr_ref[itropo, g1, jtt] / kd.vmr_ref[itropo, g2, jtt]
                    cm = col_gas[c, l, g1] + ratio * col_gas[c, l, g2]
                    col_mix[c, l, f, it] = cm
                    eta = col_gas[c, l, g1] / cm if cm > 2 * tiny else 0.5
                    loceta = eta * (neta - 1)
                    jeta[c, l, f, it] = min(int(loceta) + 1, neta - 1) - 1
                    feta = loceta - np.trunc(loceta)
                    ft = (1.0 - ftemp[c, l]) if it == 0 else ftemp[c, l]
                    fminor[c, l, f, it, 0] = (1 - feta) * ft
                    fminor[c, l, f, it, 1] = feta * ft
                    for dp in range(2):
                        fpw = (1 - fpress[c, l]) if dp == 0 else fpress[c, l]
                        for de in range(2):
                            fmajor[c, l, f, it, dp, de] = fpw * fminor[c, l, f, it, de]
    return dict(jtemp=jtemp, ftemp=ftemp, jpress=jpress, fpress=fpress,
                tropo=tropo, jeta=jeta, col_mix=col_mix, fminor=fminor,
                fmajor=fmajor)


def oracle_tau_absorption(kd, co, play, tlay, col_gas):
    """Scalar major + minor optical depths."""
    t = _np(kd)
    ncol, nlay = play.shape
    ngpt = kd.ngpt
    ntemp, neta, npresp1, _ = t["kmajor"].shape
    tau = np.zeros((ncol, nlay, ngpt))
    gpt2flav = kd.gpoint_flavor  # (2, ngpt) 0-based
    idx_h2o = kd.idx_gas("h2o")

    # --- major ---
    for c in range(ncol):
        for l in range(nlay):
            itropo = 0 if co["tropo"][c, l] else 1
            jp = co["jpress"][c, l] + itropo  # 0-based lower press row
            for g in range(ngpt):
                f = gpt2flav[itropo, g]
                acc = 0.0
                for it in range(2):
                    jt = min(co["jtemp"][c, l] + it, ntemp - 1)
                    je = co["jeta"][c, l, f, it]
                    for dp in range(2):
                        for de in range(2):
                            acc += (co["col_mix"][c, l, f, it]
                                    * co["fmajor"][c, l, f, it, dp, de]
                                    * t["kmajor"][jt, min(je + de, neta - 1),
                                                  jp + dp, g])
                tau[c, l, g] = acc

    # --- minor, both atmospheres ---
    for lower, mset, kt in ((True, kd.minor_lower, t["kminor_lower"]),
                            (False, kd.minor_upper, t["kminor_upper"])):
        for m in range(len(mset)):
            g0, g1 = mset.limits_gpt[m]
            start = mset.kminor_start[m]
            for c in range(ncol):
                for l in range(nlay):
                    in_region = co["tropo"][c, l] if lower else not co["tropo"][c, l]
                    if not in_region:
                        continue
                    scaling = col_gas[c, l, mset.idx_minor[m]]
                    if mset.scales_with_density[m]:
                        scaling *= 0.01 * play[c, l] / tlay[c, l]
                        isc = mset.idx_minor_scaling[m]
                        if isc > 0:
                            vmr_fact = 1.0 / col_gas[c, l, 0]
                            dry_fact = 1.0 / (1.0 + col_gas[c, l, idx_h2o] * vmr_fact)
                            frac = col_gas[c, l, isc] * vmr_fact * dry_fact
                            scaling *= (1.0 - frac) if mset.scale_by_complement[m] else frac
                    itropo = 0 if lower else 1
                    f = gpt2flav[itropo, g0]
                    for g in range(g0, g1 + 1):
                        acc = 0.0
                        for it in range(2):
                            jt = min(co["jtemp"][c, l] + it,
                                     t["kminor_lower"].shape[0] - 1)
                            je = co["jeta"][c, l, f, it]
                            for de in range(2):
                                acc += (co["fminor"][c, l, f, it, de]
                                        * kt[jt, min(je + de, kd.neta - 1),
                                             start + (g - g0)])
                        tau[c, l, g] += scaling * acc
    return tau


def oracle_tau_rayleigh(kd, co, col_gas, col_dry):
    t = _np(kd)
    ncol, nlay = col_dry.shape
    ngpt = kd.ngpt
    ntemp, neta = t["krayl"].shape[:2]
    idx_h2o = kd.idx_gas("h2o")
    tau_r = np.zeros((ncol, nlay, ngpt))
    for c in range(ncol):
        for l in range(nlay):
            itropo = 0 if co["tropo"][c, l] else 1
            for g in range(ngpt):
                f = kd.gpoint_flavor[itropo, g]
                acc = 0.0
                for it in range(2):
                    jt = min(co["jtemp"][c, l] + it, ntemp - 1)
                    je = co["jeta"][c, l, f, it]
                    for de in range(2):
                        acc += (co["fminor"][c, l, f, it, de]
                                * t["krayl"][jt, min(je + de, neta - 1), g, itropo])
                tau_r[c, l, g] = acc * (col_gas[c, l, idx_h2o] + col_dry[c, l])
    return tau_r


def oracle_planck(kd, co, tlay, tlev, tsfc, top_at_1):
    t = _np(kd)
    ncol, nlay = tlay.shape
    ngpt = kd.ngpt
    ntemp, neta, npresp1, _ = t["planck_frac"].shape
    nplnk, nbnd = t["totplnk"].shape
    band = kd.grid.gpt2band

    # pfrac = major interp with unit scaling
    pfrac = np.zeros((ncol, nlay, ngpt))
    for c in range(ncol):
        for l in range(nlay):
            itropo = 0 if co["tropo"][c, l] else 1
            jp = co["jpress"][c, l] + itropo
            for g in range(ngpt):
                f = kd.gpoint_flavor[itropo, g]
                acc = 0.0
                for it in range(2):
                    jt = min(co["jtemp"][c, l] + it, ntemp - 1)
                    je = co["jeta"][c, l, f, it]
                    for dp in range(2):
                        for de in range(2):
                            acc += (co["fmajor"][c, l, f, it, dp, de]
                                    * t["planck_frac"][jt, min(je + de, neta - 1),
                                                       jp + dp, g])
                pfrac[c, l, g] = acc

    def planck_1d(val):
        val0 = (val - kd.temp_ref_min) / kd.totplnk_delta
        frac = val0 - np.trunc(val0)
        idx = min(nplnk - 2, max(0, int(val0)))
        return t["totplnk"][idx] + frac * (t["totplnk"][idx + 1] - t["totplnk"][idx])

    sfc_lay = nlay - 1 if top_at_1 else 0
    sfc_src = np.zeros((ncol, ngpt))
    sfc_jac = np.zeros((ncol, ngpt))
    lay_src = np.zeros((ncol, nlay, ngpt))
    lev_src = np.zeros((ncol, nlay + 1, ngpt))
    for c in range(ncol):
        pb = planck_1d(tsfc[c])
        pb1 = planck_1d(tsfc[c] + 1.0)
        for g in range(ngpt):
            sfc_src[c, g] = pfrac[c, sfc_lay, g] * pb[band[g]]
            sfc_jac[c, g] = pfrac[c, sfc_lay, g] * (pb1[band[g]] - pb[band[g]])
        for l in range(nlay):
            pb = planck_1d(tlay[c, l])
            for g in range(ngpt):
                lay_src[c, l, g] = pfrac[c, l, g] * pb[band[g]]
        for l in range(nlay + 1):
            pb = planck_1d(tlev[c, l])
            for g in range(ngpt):
                if l == 0:
                    pf = pfrac[c, 0, g]
                elif l == nlay:
                    pf = pfrac[c, nlay - 1, g]
                else:
                    pf = np.sqrt(pfrac[c, l - 1, g] * pfrac[c, l, g])
                lev_src[c, l, g] = pf * pb[band[g]]
    return sfc_src, lay_src, lev_src, sfc_jac
