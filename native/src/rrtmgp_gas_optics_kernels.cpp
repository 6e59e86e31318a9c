/* RRTMGP gas-optics kernels, native C++ tier.
 *
 * Same numerics as the JAX ops (rte_rrtmgp_tpu/ops/gas_optics.py) behind
 * the reference's extern C ABI
 * (rrtmgp/kernels/api/mo_gas_optics_rrtmgp_kernels.F90:1-245):
 *   - interpolation: temperature/log-pressure/eta indices + 2x2x2 weights
 *     with the eta=0.5 guard for vanishing key-species amounts,
 *   - compute_tau_absorption: per-band major-gas 3-D interpolation scaled
 *     by col_mix, plus minor-gas g-point windows with density /
 *     (complement-)scaling-gas factors (water-vapor continuum logic),
 *   - compute_tau_rayleigh: 2x2 eta/temperature interpolation of the
 *     atmosphere-selected Rayleigh table scaled by (col_h2o + col_dry),
 *   - compute_Planck_source: Planck fraction via the major-tau
 *     interpolation, 1-D band Planck interpolation by temperature,
 *     geometric-mean level sources, 1 K surface Jacobian.
 *
 * Layout: Fortran order, first documented dimension fastest; all index
 * arguments 1-based (see rrtmgp_kernels.h).  Loops keep the column index
 * innermost (the fastest storage axis) for vectorization.
 */
#include <cmath>
#include <cstring>
#include <limits>

#include "rrtmgp_kernels.h"

namespace {

inline long idx2(long c, long l, long ncol) { return c + ncol * l; }
inline long idx3(long c, long l, long g, long ncol, long nlay) {
  return c + ncol * (l + nlay * g);
}
/* (2, ncol, nlay, nflav) fields: jeta, col_mix */
inline long idxf2(long it, long c, long l, long f, long ncol, long nlay) {
  return it + 2 * (c + ncol * (l + nlay * f));
}
/* (2, 2, ncol, nlay, nflav): fminor(eta, temp, ...) */
inline long idxf4(long de, long it, long c, long l, long f, long ncol,
                  long nlay) {
  return de + 2 * (it + 2 * (c + ncol * (l + nlay * f)));
}
/* (2, 2, 2, ncol, nlay, nflav): fmajor(eta, press, temp, ...) */
inline long idxf8(long de, long dp, long it, long c, long l, long f,
                  long ncol, long nlay) {
  return de + 2 * (dp + 2 * (it + 2 * (c + ncol * (l + nlay * f))));
}
/* (ntemp, neta, npres+1, ngpt) tables: kmajor, pfracin */
inline long idxk(long jt, long je, long jp, long g, long ntemp, long neta,
                 long npresp1) {
  return jt + ntemp * (je + neta * (jp + npresp1 * g));
}

}  // namespace

extern "C" {

void rrtmgp_interpolation(
    int ncol, int nlay, int ngas, int nflav, int neta, int npres, int ntemp,
    const int* flavor, const Float* press_ref_log, const Float* temp_ref,
    Float press_ref_log_delta, Float temp_ref_min, Float temp_ref_delta,
    Float press_ref_trop_log, const Float* vmr_ref, const Float* play,
    const Float* tlay, const Float* col_gas, int* jtemp, Float* fmajor,
    Float* fminor, Float* col_mix, Bool* tropo, int* jeta, int* jpress) {
  const Float tiny = std::numeric_limits<Float>::min();
  const long NC = ncol, NL = nlay;

  for (long l = 0; l < NL; ++l) {
    for (long c = 0; c < NC; ++c) {
      const long cell = idx2(c, l, NC);
      /* temperature index/fraction (reference :106-108) */
      const Float t = tlay[cell];
      int jt = (int)((t - (temp_ref_min - temp_ref_delta)) / temp_ref_delta);
      jt = jt < 1 ? 1 : (jt > ntemp - 1 ? ntemp - 1 : jt);
      const Float ftemp = (t - temp_ref[jt - 1]) / temp_ref_delta;
      jtemp[cell] = jt;

      /* log-pressure index/fraction (reference :111-114) */
      const Float locpress =
          (Float)1 + (std::log(play[cell]) - press_ref_log[0]) /
                         press_ref_log_delta;
      int jp = (int)locpress;
      jp = jp < 1 ? 1 : (jp > npres - 1 ? npres - 1 : jp);
      const Float fpress = locpress - (Float)jp;
      jpress[cell] = jp;

      const bool trop = std::log(play[cell]) > press_ref_trop_log;
      tropo[cell] = trop;
      const long itropo = trop ? 0 : 1;

      const Float ft[2] = {(Float)1 - ftemp, ftemp};
      const Float fp[2] = {(Float)1 - fpress, fpress};

      for (long f = 0; f < nflav; ++f) {
        const long g1 = flavor[2 * f];       /* 1-based into col_gas       */
        const long g2 = flavor[2 * f + 1];
        for (long it = 0; it < 2; ++it) {
          /* eta with the vanishing-col_mix guard (reference :133-154) */
          const long jt_ref = jt - 1 + it;   /* 0-based into vmr_ref       */
          const Float r =
              vmr_ref[itropo + 2 * (g1 + (long)(ngas + 1) * jt_ref)] /
              vmr_ref[itropo + 2 * (g2 + (long)(ngas + 1) * jt_ref)];
          const Float cg1 = col_gas[idx3(c, l, g1, NC, NL)];
          const Float cg2 = col_gas[idx3(c, l, g2, NC, NL)];
          const Float cm = cg1 + r * cg2;
          const Float eta = cm > 2 * tiny ? cg1 / cm : (Float)0.5;
          const Float loceta = eta * (Float)(neta - 1);
          int je = (int)loceta + 1;
          if (je > neta - 1) je = neta - 1;
          const Float feta = loceta - std::trunc(loceta);

          col_mix[idxf2(it, c, l, f, NC, NL)] = cm;
          jeta[idxf2(it, c, l, f, NC, NL)] = je;
          const Float fe[2] = {(Float)1 - feta, feta};
          for (long de = 0; de < 2; ++de) {
            const Float fm = fe[de] * ft[it];
            fminor[idxf4(de, it, c, l, f, NC, NL)] = fm;
            for (long dp = 0; dp < 2; ++dp)
              fmajor[idxf8(de, dp, it, c, l, f, NC, NL)] = fm * fp[dp];
          }
        }
      }
    }
  }
}

namespace {

/* minor-gas optical depths for one atmosphere (reference
 * gas_optical_depths_minor, kernels :402-501) */
void tau_minor_one_atmos(
    long ncol, long nlay, long ngas, long nflav, long neta, long ntemp,
    long nminor, long nminork, int idx_h2o, bool lower,
    const int* gpoint_flavor, const Float* kminor,
    const int* minor_limits_gpt, const Bool* scales_with_density,
    const Bool* scale_by_complement, const int* idx_minor,
    const int* idx_minor_scaling, const int* kminor_start, const Bool* tropo,
    const Float* fminor, const Float* play, const Float* tlay,
    const Float* col_gas, const int* jeta, const int* jtemp, Float* tau) {
  const long NC = ncol, NL = nlay;
  const Float PaTohPa = (Float)0.01;

  for (long m = 0; m < nminor; ++m) {
    const long g0 = minor_limits_gpt[2 * m] - 1;      /* 0-based inclusive */
    const long g1 = minor_limits_gpt[2 * m + 1] - 1;
    /* every g-point in a minor interval shares the band's flavor */
    const long flav = gpoint_flavor[2 * g0 + (lower ? 0 : 1)] - 1;
    const long kstart = kminor_start[m] - 1;
    const long igas = idx_minor[m];
    const long isc = idx_minor_scaling[m];

    for (long l = 0; l < NL; ++l) {
      for (long c = 0; c < NC; ++c) {
        const long cell = idx2(c, l, NC);
        if ((bool)tropo[cell] != lower) continue;
        Float scaling = col_gas[idx3(c, l, igas, NC, NL)];
        if (scales_with_density[m]) {
          scaling *= PaTohPa * play[cell] / tlay[cell];
          if (isc > 0) {
            const Float col_dry = col_gas[idx3(c, l, 0, NC, NL)];
            const Float vmr_fact = (Float)1 / col_dry;
            const Float dry_fact =
                (Float)1 /
                ((Float)1 + col_gas[idx3(c, l, idx_h2o, NC, NL)] * vmr_fact);
            const Float frac =
                col_gas[idx3(c, l, isc, NC, NL)] * vmr_fact * dry_fact;
            scaling *= scale_by_complement[m] ? ((Float)1 - frac) : frac;
          }
        }
        const long jt0 = jtemp[cell] - 1;
        for (long g = g0; g <= g1; ++g) {
          Float k = 0;
          for (long it = 0; it < 2; ++it) {
            const long je0 = jeta[idxf2(it, c, l, flav, NC, NL)] - 1;
            const long row = kstart + (g - g0);
            for (long de = 0; de < 2; ++de)
              k += fminor[idxf4(de, it, c, l, flav, NC, NL)] *
                   kminor[(jt0 + it) + ntemp * ((je0 + de) + neta * row)];
          }
          tau[idx3(c, l, g, NC, NL)] += scaling * k;
        }
      }
    }
  }
  (void)nflav;
  (void)nminork;
}

}  // namespace

void rrtmgp_compute_tau_absorption(
    int ncol, int nlay, int nbnd, int ngpt, int ngas, int nflav, int neta,
    int npres, int ntemp, int nminorlower, int nminorklower, int nminorupper,
    int nminorkupper, int idx_h2o, const int* gpoint_flavor,
    const int* band_lims_gpt, const Float* kmajor, const Float* kminor_lower,
    const Float* kminor_upper, const int* minor_limits_gpt_lower,
    const int* minor_limits_gpt_upper,
    const Bool* minor_scales_with_density_lower,
    const Bool* minor_scales_with_density_upper,
    const Bool* scale_by_complement_lower,
    const Bool* scale_by_complement_upper, const int* idx_minor_lower,
    const int* idx_minor_upper, const int* idx_minor_scaling_lower,
    const int* idx_minor_scaling_upper, const int* kminor_start_lower,
    const int* kminor_start_upper, const Bool* tropo, const Float* col_mix,
    const Float* fmajor, const Float* fminor, const Float* play,
    const Float* tlay, const Float* col_gas, const int* jeta,
    const int* jtemp, const int* jpress, Float* tau) {
  const long NC = ncol, NL = nlay;

  /* major gases, band by band (reference gas_optical_depths_major
   * :345-396): every g-point in a band shares the flavor, so the
   * 2x2x2 weights are fetched once per (cell, itemp) */
  for (long b = 0; b < nbnd; ++b) {
    const long g0 = band_lims_gpt[2 * b] - 1;
    const long g1 = band_lims_gpt[2 * b + 1] - 1;
    for (long l = 0; l < NL; ++l) {
      for (long c = 0; c < NC; ++c) {
        const long cell = idx2(c, l, NC);
        const bool trop = tropo[cell];
        const long flav = gpoint_flavor[2 * g0 + (trop ? 0 : 1)] - 1;
        const long jt0 = jtemp[cell] - 1;
        /* pressure plane: troposphere reads [jpress-1, jpress], upper
         * atmosphere [jpress, jpress+1] of the npres+1-plane table */
        const long jp0 = jpress[cell] - 1 + (trop ? 0 : 1);
        for (long it = 0; it < 2; ++it) {
          const long je0 = jeta[idxf2(it, c, l, flav, NC, NL)] - 1;
          const Float cm = col_mix[idxf2(it, c, l, flav, NC, NL)];
          Float w[2][2];
          for (long dp = 0; dp < 2; ++dp)
            for (long de = 0; de < 2; ++de)
              w[dp][de] = fmajor[idxf8(de, dp, it, c, l, flav, NC, NL)];
          for (long g = g0; g <= g1; ++g) {
            Float acc = 0;
            for (long dp = 0; dp < 2; ++dp)
              for (long de = 0; de < 2; ++de)
                acc += w[dp][de] * kmajor[idxk(jt0 + it, je0 + de, jp0 + dp,
                                               g, ntemp, neta, npres + 1)];
            tau[idx3(c, l, g, NC, NL)] += cm * acc;
          }
        }
      }
    }
  }

  tau_minor_one_atmos(NC, NL, ngas, nflav, neta, ntemp, nminorlower,
                      nminorklower, idx_h2o, true, gpoint_flavor,
                      kminor_lower, minor_limits_gpt_lower,
                      minor_scales_with_density_lower,
                      scale_by_complement_lower, idx_minor_lower,
                      idx_minor_scaling_lower, kminor_start_lower, tropo,
                      fminor, play, tlay, col_gas, jeta, jtemp, tau);
  tau_minor_one_atmos(NC, NL, ngas, nflav, neta, ntemp, nminorupper,
                      nminorkupper, idx_h2o, false, gpoint_flavor,
                      kminor_upper, minor_limits_gpt_upper,
                      minor_scales_with_density_upper,
                      scale_by_complement_upper, idx_minor_upper,
                      idx_minor_scaling_upper, kminor_start_upper, tropo,
                      fminor, play, tlay, col_gas, jeta, jtemp, tau);
  (void)ngpt;
}

void rrtmgp_compute_tau_rayleigh(
    int ncol, int nlay, int nbnd, int ngpt, int ngas, int nflav, int neta,
    int npres, int ntemp, const int* gpoint_flavor, const int* band_lims_gpt,
    const Float* krayl, int idx_h2o, const Float* col_dry,
    const Float* col_gas, const Float* fminor, const int* jeta,
    const Bool* tropo, const int* jtemp, Float* tau_rayleigh) {
  const long NC = ncol, NL = nlay;
  (void)nbnd;
  (void)band_lims_gpt;
  (void)npres;

  for (long l = 0; l < NL; ++l) {
    for (long c = 0; c < NC; ++c) {
      const long cell = idx2(c, l, NC);
      const bool trop = tropo[cell];
      const long itropo = trop ? 0 : 1;
      const long jt0 = jtemp[cell] - 1;
      const Float scale =
          col_gas[idx3(c, l, idx_h2o, NC, NL)] + col_dry[cell];
      for (long g = 0; g < ngpt; ++g) {
        const long flav = gpoint_flavor[2 * g + itropo] - 1;
        Float k = 0;
        for (long it = 0; it < 2; ++it) {
          const long je0 = jeta[idxf2(it, c, l, flav, NC, NL)] - 1;
          for (long de = 0; de < 2; ++de)
            k += fminor[idxf4(de, it, c, l, flav, NC, NL)] *
                 krayl[(jt0 + it) +
                       (long)ntemp * ((je0 + de) +
                                      (long)neta * (g + (long)ngpt * itropo))];
        }
        tau_rayleigh[idx3(c, l, g, NC, NL)] = k * scale;
      }
    }
  }
  (void)nflav;
}

namespace {

/* interpolate1D of the band Planck table (reference kernels :715-737):
 * returns B(T) for one band; index clamps extrapolate out-of-range T. */
inline Float planck1d(Float t, Float offset, Float delta, const Float* totplnk,
                      long nPlanckTemp, long band) {
  // reference interpolate1D (mo_gas_optics_rrtmgp_kernels.F90): the
  // fraction is the fractional part of the UNCLAMPED index (aint), the
  // index is clamped — out-of-range temperatures follow the reference's
  // own convention (earlier revisions of this function extrapolated
  // linearly instead, diverging from the Fortran and the JAX port)
  const Float f = (t - offset) / delta;
  const Float frac = f - std::trunc(f);
  int i = (int)f + 1;
  i = i < 1 ? 1 : (i > (int)nPlanckTemp - 1 ? (int)nPlanckTemp - 1 : i);
  const Float lo = totplnk[(i - 1) + nPlanckTemp * band];
  const Float hi = totplnk[i + nPlanckTemp * band];
  return lo + frac * (hi - lo);
}

}  // namespace

void rrtmgp_compute_Planck_source(
    int ncol, int nlay, int nbnd, int ngpt, int nflav, int neta, int npres,
    int ntemp, int nPlanckTemp, const Float* tlay, const Float* tlev,
    const Float* tsfc, int sfc_lay, const Float* fmajor, const int* jeta,
    const Bool* tropo, const int* jtemp, const int* jpress,
    const int* gpoint_bands, const int* band_lims_gpt, const Float* pfracin,
    Float temp_ref_min, Float totplnk_delta, const Float* totplnk,
    const int* gpoint_flavor, Float* sfc_src, Float* lay_src, Float* lev_src,
    Float* sfc_source_Jac) {
  const long NC = ncol, NL = nlay;
  (void)nbnd;
  (void)band_lims_gpt;
  (void)nflav;

  /* Planck fraction per (cell, gpt): the major-tau interpolation with
   * unit scaling (reference :619-634). Stored in lay_src temporarily. */
  for (long l = 0; l < NL; ++l) {
    for (long c = 0; c < NC; ++c) {
      const long cell = idx2(c, l, NC);
      const bool trop = tropo[cell];
      const long itropo = trop ? 0 : 1;
      const long jt0 = jtemp[cell] - 1;
      const long jp0 = jpress[cell] - 1 + (trop ? 0 : 1);
      for (long g = 0; g < ngpt; ++g) {
        const long flav = gpoint_flavor[2 * g + itropo] - 1;
        Float pf = 0;
        for (long it = 0; it < 2; ++it) {
          const long je0 = jeta[idxf2(it, c, l, flav, NC, NL)] - 1;
          for (long dp = 0; dp < 2; ++dp)
            for (long de = 0; de < 2; ++de)
              pf += fmajor[idxf8(de, dp, it, c, l, flav, NC, NL)] *
                    pfracin[idxk(jt0 + it, je0 + de, jp0 + dp, g, ntemp,
                                 neta, npres + 1)];
        }
        lay_src[idx3(c, l, g, NC, NL)] = pf; /* pfrac for now */
      }
    }
  }

  /* surface source + 1 K Jacobian from the surface layer's pfrac
   * (reference :600-617, delta_Tsurf = 1) */
  for (long g = 0; g < ngpt; ++g) {
    const long band = gpoint_bands[g] - 1;
    for (long c = 0; c < NC; ++c) {
      const Float pf = lay_src[idx3(c, sfc_lay - 1, g, NC, NL)];
      const Float b0 = planck1d(tsfc[c], temp_ref_min, totplnk_delta,
                                totplnk, nPlanckTemp, band);
      const Float b1 = planck1d(tsfc[c] + (Float)1, temp_ref_min,
                                totplnk_delta, totplnk, nPlanckTemp, band);
      sfc_src[c + NC * g] = pf * b0;
      sfc_source_Jac[c + NC * g] = pf * (b1 - b0);
    }
  }

  /* level sources: geometric-mean pfrac at interior levels (reference
   * :695-706); must run BEFORE lay_src is scaled in place */
  for (long g = 0; g < ngpt; ++g) {
    const long band = gpoint_bands[g] - 1;
    for (long lv = 0; lv < NL + 1; ++lv) {
      for (long c = 0; c < NC; ++c) {
        Float pf;
        if (lv == 0)
          pf = lay_src[idx3(c, 0, g, NC, NL)];
        else if (lv == NL)
          pf = lay_src[idx3(c, NL - 1, g, NC, NL)];
        else
          pf = std::sqrt(lay_src[idx3(c, lv - 1, g, NC, NL)] *
                         lay_src[idx3(c, lv, g, NC, NL)]);
        lev_src[c + NC * (lv + (NL + 1) * g)] =
            pf * planck1d(tlev[idx2(c, lv, NC)], temp_ref_min, totplnk_delta,
                          totplnk, nPlanckTemp, band);
      }
    }
  }

  /* layer sources: scale the stored pfrac in place */
  for (long g = 0; g < ngpt; ++g) {
    const long band = gpoint_bands[g] - 1;
    for (long l = 0; l < NL; ++l)
      for (long c = 0; c < NC; ++c)
        lay_src[idx3(c, l, g, NC, NL)] *=
            planck1d(tlay[idx2(c, l, NC)], temp_ref_min, totplnk_delta,
                     totplnk, nPlanckTemp, band);
  }
}

void rrtmgp_compute_cld_from_table(
    int ncol, int nlay, int ngpt, const Bool* mask, const Float* lwp,
    const Float* re, int nsteps, Float step_size, Float offset,
    const Float* tau_table, const Float* ssa_table, const Float* asy_table,
    Float* tau, Float* taussa, Float* taussag) {
  const long NC = ncol, NL = nlay;
  for (long g = 0; g < ngpt; ++g) {
    for (long l = 0; l < NL; ++l) {
      for (long c = 0; c < NC; ++c) {
        const long cell = idx2(c, l, NC);
        const long out = idx3(c, l, g, NC, NL);
        if (!mask[cell]) {
          tau[out] = taussa[out] = taussag[out] = 0;
          continue;
        }
        const Float pos = (re[cell] - offset) / step_size;
        int i = (int)pos + 1;                  /* 1-based */
        if (i > nsteps - 1) i = nsteps - 1;
        if (i < 1) i = 1;
        const Float fint = pos - (Float)(i - 1);
        const long lo = (i - 1) + (long)nsteps * g;
        const long hi = i + (long)nsteps * g;
        const Float t =
            lwp[cell] *
            (tau_table[lo] + fint * (tau_table[hi] - tau_table[lo]));
        const Float ts =
            t * (ssa_table[lo] + fint * (ssa_table[hi] - ssa_table[lo]));
        tau[out] = t;
        taussa[out] = ts;
        taussag[out] =
            ts * (asy_table[lo] + fint * (asy_table[hi] - asy_table[lo]));
      }
    }
  }
}

}  /* extern "C" */
