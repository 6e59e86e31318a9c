/* Optical-property algebra kernels, native C++ tier.
 *
 * Same numerics as rte_rrtmgp_tpu/optical_props.py (delta_scale,
 * increment, subset) behind the reference's extern C ABI
 * (rte/kernels/api/mo_optical_props_kernels.F90): delta-Eddington
 * scaling and tau-weighted averaging when combining streams, with the
 * reference's eps = 3*tiny guard on denominators.
 */
#include <cmath>
#include <limits>

#include "rte_kernels.h"

namespace {
constexpr long I3(long c, long l, long g, long ncol, long nlay) {
  return c + ncol * (l + nlay * g);
}
const Float kEps = 3 * std::numeric_limits<Float>::min();

template <typename Fn>
void by_band(int ncol, int nlay, int ngpt, int nbnd, const int* gpt_lims,
             Fn fn) {
  (void)ngpt;
  for (int b = 0; b < nbnd; ++b) {
    const int g0 = gpt_lims[2 * b] - 1, g1 = gpt_lims[2 * b + 1] - 1;
    for (int gp = g0; gp <= g1; ++gp)
      for (long l = 0; l < nlay; ++l)
        for (long c = 0; c < ncol; ++c)
          fn(I3(c, l, gp, ncol, nlay), I3(c, l, b, ncol, nlay));
  }
}
}  // namespace

extern "C" {

void rte_delta_scale_2str_k(int ncol, int nlay, int ngpt, Float* tau,
                            Float* ssa, Float* g) {
  const long n = (long)ncol * nlay * ngpt;
  for (long i = 0; i < n; ++i) {
    const Float f = g[i] * g[i];
    const Float wf = ssa[i] * f;
    tau[i] = (1 - wf) * tau[i];
    ssa[i] = (ssa[i] - wf) / std::max(kEps, 1 - wf);
    g[i] = (g[i] - f) / std::max(kEps, 1 - f);
  }
}

void rte_delta_scale_2str_f_k(int ncol, int nlay, int ngpt, Float* tau,
                              Float* ssa, Float* g, const Float* f) {
  const long n = (long)ncol * nlay * ngpt;
  for (long i = 0; i < n; ++i) {
    const Float wf = ssa[i] * f[i];
    tau[i] = (1 - wf) * tau[i];
    ssa[i] = (ssa[i] - wf) / std::max(kEps, 1 - wf);
    g[i] = (g[i] - f[i]) / std::max(kEps, 1 - f[i]);
  }
}

void rte_increment_1scalar_by_1scalar(int ncol, int nlay, int ngpt,
                                      Float* tau1, const Float* tau2) {
  const long n = (long)ncol * nlay * ngpt;
  for (long i = 0; i < n; ++i) tau1[i] += tau2[i];
}

void rte_increment_1scalar_by_2stream(int ncol, int nlay, int ngpt,
                                      Float* tau1, const Float* tau2,
                                      const Float* ssa2) {
  const long n = (long)ncol * nlay * ngpt;
  for (long i = 0; i < n; ++i) tau1[i] += tau2[i] * (1 - ssa2[i]);
}

void rte_increment_2stream_by_1scalar(int ncol, int nlay, int ngpt,
                                      Float* tau1, Float* ssa1,
                                      const Float* tau2) {
  const long n = (long)ncol * nlay * ngpt;
  for (long i = 0; i < n; ++i) {
    const Float t = tau1[i] + tau2[i];
    ssa1[i] = tau1[i] * ssa1[i] / std::max(kEps, t);
    tau1[i] = t;
  }
}

void rte_increment_2stream_by_2stream(int ncol, int nlay, int ngpt,
                                      Float* tau1, Float* ssa1, Float* g1,
                                      const Float* tau2, const Float* ssa2,
                                      const Float* g2) {
  const long n = (long)ncol * nlay * ngpt;
  for (long i = 0; i < n; ++i) {
    const Float tau12 = tau1[i] + tau2[i];
    const Float tauscat12 = tau1[i] * ssa1[i] + tau2[i] * ssa2[i];
    g1[i] = (tau1[i] * ssa1[i] * g1[i] + tau2[i] * ssa2[i] * g2[i]) /
            std::max(kEps, tauscat12);
    ssa1[i] = tauscat12 / std::max(kEps, tau12);
    tau1[i] = tau12;
  }
}

/* ---- band -> g-point variants: field 2 is per band ---- */

void rte_inc_1scalar_by_1scalar_bybnd(int ncol, int nlay, int ngpt,
                                      Float* tau1, const Float* tau2,
                                      int nbnd, const int* gpt_lims) {
  by_band(ncol, nlay, ngpt, nbnd, gpt_lims,
          [&](long i, long j) { tau1[i] += tau2[j]; });
}

void rte_inc_1scalar_by_2stream_bybnd(int ncol, int nlay, int ngpt,
                                      Float* tau1, const Float* tau2,
                                      const Float* ssa2, int nbnd,
                                      const int* gpt_lims) {
  by_band(ncol, nlay, ngpt, nbnd, gpt_lims,
          [&](long i, long j) { tau1[i] += tau2[j] * (1 - ssa2[j]); });
}

void rte_inc_2stream_by_1scalar_bybnd(int ncol, int nlay, int ngpt,
                                      Float* tau1, Float* ssa1,
                                      const Float* tau2, int nbnd,
                                      const int* gpt_lims) {
  by_band(ncol, nlay, ngpt, nbnd, gpt_lims, [&](long i, long j) {
    const Float t = tau1[i] + tau2[j];
    ssa1[i] = tau1[i] * ssa1[i] / std::max(kEps, t);
    tau1[i] = t;
  });
}

void rte_inc_2stream_by_2stream_bybnd(int ncol, int nlay, int ngpt,
                                      Float* tau1, Float* ssa1, Float* g1,
                                      const Float* tau2, const Float* ssa2,
                                      const Float* g2, int nbnd,
                                      const int* gpt_lims) {
  by_band(ncol, nlay, ngpt, nbnd, gpt_lims, [&](long i, long j) {
    const Float tau12 = tau1[i] + tau2[j];
    const Float tauscat12 = tau1[i] * ssa1[i] + tau2[j] * ssa2[j];
    g1[i] = (tau1[i] * ssa1[i] * g1[i] + tau2[j] * ssa2[j] * g2[j]) /
            std::max(kEps, tauscat12);
    ssa1[i] = tauscat12 / std::max(kEps, tau12);
    tau1[i] = tau12;
  });
}

void rte_extract_subset_dim1_3d(int ncol, int nlay, int ngpt,
                                const Float* array_in, int colS, int colE,
                                Float* array_out) {
  const long nsub = colE - colS + 1;
  for (long gp = 0; gp < ngpt; ++gp)
    for (long l = 0; l < nlay; ++l)
      for (long c = 0; c < nsub; ++c)
        array_out[c + nsub * (l + (long)nlay * gp)] =
            array_in[I3(colS - 1 + c, l, gp, ncol, nlay)];
}

void rte_extract_subset_absorption_tau(int ncol, int nlay, int ngpt,
                                       const Float* tau_in,
                                       const Float* ssa_in, int colS,
                                       int colE, Float* tau_out) {
  const long nsub = colE - colS + 1;
  for (long gp = 0; gp < ngpt; ++gp)
    for (long l = 0; l < nlay; ++l)
      for (long c = 0; c < nsub; ++c) {
        const long i = I3(colS - 1 + c, l, gp, ncol, nlay);
        tau_out[c + nsub * (l + (long)nlay * gp)] =
            tau_in[i] * (1 - ssa_in[i]);
      }
}

}  // extern "C"
