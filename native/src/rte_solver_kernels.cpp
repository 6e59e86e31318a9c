/* RTE solver kernels, native C++ tier.
 *
 * Implements the same numerics as the JAX ops (rte_rrtmgp_tpu/ops/
 * solver_lw.py, solver_sw.py) behind the reference's extern C ABI
 * (rte/kernels/api/mo_rte_solver_kernels.F90):
 *
 *   - LW emission/absorption multi-angle solve with optional Tang-2018
 *     scattering rescaling and an analytic surface-temperature Jacobian
 *     (Clough et al. 1992 linear-in-tau source; Hogan 2023 quadrature).
 *   - LW two-stream: Fu 1997 diffusivity, Meador-Weaver R/T, Toon 1989
 *     linear-in-B sources, Shonk-Hogan 2008 adding.
 *   - SW direct beam (Beer-Lambert) and SW two-stream: Zdunkowski PIFM
 *     gammas, Meador-Weaver Eqs 14/15/25/26 with energy-safety clamps,
 *     nighttime masking, Shonk-Hogan adding.
 *
 * Layout: Fortran order, columns fastest (see rte_kernels.h).  The
 * vertical is addressed by "position from TOA" so both orientations
 * share one code path.
 */
#include <cmath>
#include <cstring>
#include <limits>
#include <vector>

#include "rte_kernels.h"

namespace {

constexpr Float kPi = (Float)3.14159265358979323846;

inline long idx2(long c, long l, long ncol) { return c + ncol * l; }
inline long idx3(long c, long l, long g, long ncol, long nlay) {
  return c + ncol * (l + nlay * g);
}

/* storage index of the layer / level at vertical position v (0 = TOA) */
inline long lay_at(long v, long nlay, bool top_at_1) {
  return top_at_1 ? v : nlay - 1 - v;
}
inline long lev_at(long v, long nlay, bool top_at_1) {
  return top_at_1 ? v : nlay - v;
}

struct LwWork {
  std::vector<Float> trans, sdn, sup, an, cn, rdn, rup, jac;
  LwWork(long ncol, long nlay, bool rescaling, bool jacobians)
      : trans(ncol * nlay), sdn(ncol * nlay), sup(ncol * nlay),
        an(rescaling ? ncol * nlay : 0), cn(rescaling ? ncol * nlay : 0),
        rdn(ncol * (nlay + 1)), rup(ncol * (nlay + 1)),
        jac(jacobians ? ncol * (nlay + 1) : 0) {}
};

/* single-quadrature-angle LW solve for one g-point; results are
 * radiances in work.rdn / work.rup (vertical position indexing). */
void lw_oneangle_gpt(long ncol, long nlay, long g, bool top_at_1,
                     const Float* Ds_g,  /* (ncol) secants for this gpt   */
                     Float weight, const Float* tau, const Float* lay_src,
                     const Float* lev_src, const Float* sfc_emis,
                     const Float* sfc_src, const Float* inc_flux,
                     bool do_rescaling, const Float* ssa, const Float* gg,
                     bool do_jac, const Float* sfc_srcJac, LwWork& w) {
  const Float eps = std::numeric_limits<Float>::epsilon();
  const Float tiny = std::numeric_limits<Float>::min();
  const Float tau_thresh = std::sqrt(std::sqrt(eps));

  /* per-layer transmittance and linear-in-tau sources */
  for (long v = 0; v < nlay; ++v) {
    const long l = lay_at(v, nlay, top_at_1);
    const long lt = lev_at(v, nlay, top_at_1);      /* level above layer */
    const long lb = lev_at(v + 1, nlay, top_at_1);  /* level below layer */
    for (long c = 0; c < ncol; ++c) {
      Float tl = tau[idx3(c, l, g, ncol, nlay)] * Ds_g[c];
      if (do_rescaling) {
        /* Tang 2018 similarity rescaling (doi:10.1175/JAS-D-18-0014.1) */
        const Float s = ssa[idx3(c, l, g, ncol, nlay)];
        const Float as = gg[idx3(c, l, g, ncol, nlay)];
        const Float wb = s * (1 - as) / 2;
        const Float scale = 1 - s + wb;
        tl *= scale;
        const Float tr = std::exp(-tl);
        w.cn[idx2(c, v, ncol)] = (Float)0.4 * wb / scale;
        w.an[idx2(c, v, ncol)] = 1 - tr * tr;
        w.trans[idx2(c, v, ncol)] = tr;
      } else {
        w.trans[idx2(c, v, ncol)] = std::exp(-tl);
      }
      const Float tr = w.trans[idx2(c, v, ncol)];
      /* fact = (1 - trans)/tau - trans, 3rd-order series for small tau
       * (Clough et al. 1992 Eq 13) */
      Float fact;
      if (tl > tau_thresh) {
        fact = (1 - tr) / std::max(tl, tiny) - tr;
      } else {
        fact = tl * ((Float)0.5 + tl * ((Float)(-1.0 / 3.0) + tl * (Float)0.125));
      }
      const Float lay = lay_src[idx3(c, l, g, ncol, nlay)];
      const Float ltp = lev_src[idx3(c, lt, g, ncol, nlay + 1)];
      const Float lbt = lev_src[idx3(c, lb, g, ncol, nlay + 1)];
      w.sdn[idx2(c, v, ncol)] = (1 - tr) * lbt + 2 * fact * (lay - lbt);
      w.sup[idx2(c, v, ncol)] = (1 - tr) * ltp + 2 * fact * (lay - ltp);
    }
  }

  /* downward transport */
  for (long c = 0; c < ncol; ++c)
    w.rdn[idx2(c, 0, ncol)] =
        inc_flux[idx2(c, g, ncol)] / (kPi * weight);
  for (long v = 0; v < nlay; ++v)
    for (long c = 0; c < ncol; ++c)
      w.rdn[idx2(c, v + 1, ncol)] =
          w.trans[idx2(c, v, ncol)] * w.rdn[idx2(c, v, ncol)] +
          w.sdn[idx2(c, v, ncol)];

  /* surface reflection + emission */
  for (long c = 0; c < ncol; ++c) {
    const Float emis = sfc_emis[idx2(c, g, ncol)];
    w.rup[idx2(c, nlay, ncol)] =
        w.rdn[idx2(c, nlay, ncol)] * (1 - emis) +
        emis * sfc_src[idx2(c, g, ncol)];
    if (do_jac)
      w.jac[idx2(c, nlay, ncol)] = emis * sfc_srcJac[idx2(c, g, ncol)];
  }

  /* upward transport (+ Tang adjustment and second downward sweep) */
  for (long v = nlay - 1; v >= 0; --v)
    for (long c = 0; c < ncol; ++c) {
      const Float tr = w.trans[idx2(c, v, ncol)];
      Float adj = 0;
      if (do_rescaling)
        adj = w.cn[idx2(c, v, ncol)] *
              (w.an[idx2(c, v, ncol)] * w.rdn[idx2(c, v, ncol)] -
               tr * w.sdn[idx2(c, v, ncol)] - w.sup[idx2(c, v, ncol)]);
      w.rup[idx2(c, v, ncol)] =
          tr * w.rup[idx2(c, v + 1, ncol)] + w.sup[idx2(c, v, ncol)] + adj;
      if (do_jac)
        w.jac[idx2(c, v, ncol)] = tr * w.jac[idx2(c, v + 1, ncol)];
    }
  if (do_rescaling)
    for (long v = 0; v < nlay; ++v)
      for (long c = 0; c < ncol; ++c) {
        const Float tr = w.trans[idx2(c, v, ncol)];
        const Float adj =
            w.cn[idx2(c, v, ncol)] *
            (w.an[idx2(c, v, ncol)] * w.rup[idx2(c, v, ncol)] -
             tr * w.sup[idx2(c, v, ncol)] - w.sdn[idx2(c, v, ncol)]);
        w.rdn[idx2(c, v + 1, ncol)] =
            tr * w.rdn[idx2(c, v, ncol)] + w.sdn[idx2(c, v, ncol)] + adj;
      }
}

/* Shonk & Hogan 2008 adding scheme for one g-point, vertical-position
 * indexed inputs (layer arrays at positions 0..nlay-1 from TOA).
 * rdif/tdif/sdn/sup: (ncol, nlay); albedo_sfc/src_sfc/dn_top: (ncol).
 * Outputs fup/fdn: (ncol, nlay+1). */
void adding_gpt(long ncol, long nlay, const Float* rdif, const Float* tdif,
                const Float* sdn, const Float* sup, const Float* alb_sfc,
                const Float* src_sfc, const Float* dn_top, Float* fup,
                Float* fdn, std::vector<Float>& albedo,
                std::vector<Float>& src, std::vector<Float>& denom) {
  /* bottom-up sweep building albedo and upward source below each level */
  for (long c = 0; c < ncol; ++c) {
    albedo[idx2(c, nlay, ncol)] = alb_sfc[c];
    src[idx2(c, nlay, ncol)] = src_sfc[c];
  }
  for (long v = nlay - 1; v >= 0; --v)
    for (long c = 0; c < ncol; ++c) {
      const Float r = rdif[idx2(c, v, ncol)];
      const Float t = tdif[idx2(c, v, ncol)];
      const Float ab = albedo[idx2(c, v + 1, ncol)];
      const Float d = 1 / (1 - r * ab);                       /* Eq 10 */
      denom[idx2(c, v, ncol)] = d;
      albedo[idx2(c, v, ncol)] = r + t * t * ab * d;          /* Eq  9 */
      src[idx2(c, v, ncol)] =
          sup[idx2(c, v, ncol)] +
          t * d * (src[idx2(c, v + 1, ncol)] +
                   ab * sdn[idx2(c, v, ncol)]);               /* Eq 11 */
    }
  /* top-down flux sweep */
  for (long c = 0; c < ncol; ++c) {
    fdn[idx2(c, 0, ncol)] = dn_top[c];
    fup[idx2(c, 0, ncol)] =
        dn_top[c] * albedo[idx2(c, 0, ncol)] + src[idx2(c, 0, ncol)];
  }
  for (long v = 0; v < nlay; ++v)
    for (long c = 0; c < ncol; ++c) {
      const Float d = denom[idx2(c, v, ncol)];
      const Float f =
          (tdif[idx2(c, v, ncol)] * fdn[idx2(c, v, ncol)] +
           rdif[idx2(c, v, ncol)] * src[idx2(c, v + 1, ncol)] +
           sdn[idx2(c, v, ncol)]) * d;                        /* Eq 13 */
      fdn[idx2(c, v + 1, ncol)] = f;
      fup[idx2(c, v + 1, ncol)] =
          f * albedo[idx2(c, v + 1, ncol)] + src[idx2(c, v + 1, ncol)];
    }
}

}  // namespace

extern "C" {

void rte_lw_solver_noscat(
    int ncol_i, int nlay_i, int ngpt_i, Bool top_at_1, int nmus,
    const Float* Ds, const Float* weights, const Float* tau,
    const Float* lay_source, const Float* lev_source, const Float* sfc_emis,
    const Float* sfc_src, const Float* inc_flux, Float* flux_up,
    Float* flux_dn, Bool do_broadband, Float* broadband_up,
    Float* broadband_dn, Bool do_Jacobians, const Float* sfc_srcJac,
    Float* flux_upJac, Bool do_rescaling, const Float* ssa, const Float* g) {
  const long ncol = ncol_i, nlay = nlay_i, ngpt = ngpt_i;
  const long nlev = nlay + 1;

  if (do_broadband) {
    std::memset(broadband_up, 0, sizeof(Float) * ncol * nlev);
    std::memset(broadband_dn, 0, sizeof(Float) * ncol * nlev);
  }
  if (do_Jacobians)
    std::memset(flux_upJac, 0, sizeof(Float) * ncol * nlev);

#pragma omp parallel
  {
    LwWork w(ncol, nlay, do_rescaling, do_Jacobians);
    std::vector<Float> ds_g(ncol);
#pragma omp for schedule(static)
    for (long gp = 0; gp < ngpt; ++gp) {
      for (int imu = 0; imu < nmus; ++imu) {
        const Float wt = weights[imu];
        for (long c = 0; c < ncol; ++c)
          ds_g[c] = Ds[c + ncol * (gp + ngpt * imu)];
        lw_oneangle_gpt(ncol, nlay, gp, top_at_1, ds_g.data(), wt, tau,
                        lay_source, lev_source, sfc_emis, sfc_src, inc_flux,
                        do_rescaling, ssa, g, do_Jacobians, sfc_srcJac, w);
        const Float piw = kPi * wt;
        for (long v = 0; v <= nlay; ++v) {
          const long lv = lev_at(v, nlay, top_at_1);
          for (long c = 0; c < ncol; ++c) {
            const Float up = piw * w.rup[idx2(c, v, ncol)];
            const Float dn = piw * w.rdn[idx2(c, v, ncol)];
            if (do_broadband) {
#pragma omp atomic
              broadband_up[idx2(c, lv, ncol)] += up;
#pragma omp atomic
              broadband_dn[idx2(c, lv, ncol)] += dn;
            } else {
              Float* fu = &flux_up[idx3(c, lv, gp, ncol, nlev)];
              Float* fd = &flux_dn[idx3(c, lv, gp, ncol, nlev)];
              if (imu == 0) { *fu = up; *fd = dn; }
              else { *fu += up; *fd += dn; }
            }
            if (do_Jacobians) {
#pragma omp atomic
              flux_upJac[idx2(c, lv, ncol)] += piw * w.jac[idx2(c, v, ncol)];
            }
          }
        }
      }
    }
  }
}

void rte_lw_solver_2stream(
    int ncol_i, int nlay_i, int ngpt_i, Bool top_at_1, const Float* tau,
    const Float* ssa, const Float* g, const Float* lay_source,
    const Float* lev_source, const Float* sfc_emis, const Float* sfc_src,
    const Float* inc_flux, Float* flux_up, Float* flux_dn) {
  const long ncol = ncol_i, nlay = nlay_i, ngpt = ngpt_i;
  const long nlev = nlay + 1;
  const Float lw_diff_sec = (Float)1.66;  /* Fu et al. 1997 */

#pragma omp parallel
  {
    std::vector<Float> rdif(ncol * nlay), tdif(ncol * nlay);
    std::vector<Float> sdn(ncol * nlay), sup(ncol * nlay);
    std::vector<Float> alb(ncol), ssfc(ncol), dtop(ncol);
    std::vector<Float> albedo(ncol * (nlay + 1)), src(ncol * (nlay + 1));
    std::vector<Float> denom(ncol * nlay);
    std::vector<Float> fup(ncol * (nlay + 1)), fdn(ncol * (nlay + 1));
#pragma omp for schedule(static)
    for (long gp = 0; gp < ngpt; ++gp) {
      for (long v = 0; v < nlay; ++v) {
        const long l = lay_at(v, nlay, top_at_1);
        const long lt = lev_at(v, nlay, top_at_1);
        const long lb = lev_at(v + 1, nlay, top_at_1);
        for (long c = 0; c < ncol; ++c) {
          const Float t = tau[idx3(c, l, gp, ncol, nlay)];
          const Float w0 = ssa[idx3(c, l, gp, ncol, nlay)];
          const Float as = g[idx3(c, l, gp, ncol, nlay)];
          /* Meador-Weaver with LW diffusivity (reference lw_two_stream) */
          const Float g1 = lw_diff_sec * (1 - (Float)0.5 * w0 * (1 + as));
          const Float g2 = lw_diff_sec * (Float)0.5 * w0 * (1 - as);
          const Float k = std::sqrt(
              std::max((g1 - g2) * (g1 + g2), (Float)1e-12));
          const Float e1 = std::exp(-t * k);
          const Float e2 = e1 * e1;
          const Float rt = 1 / (k * (1 + e2) + g1 * (1 - e2));
          const Float rd = rt * g2 * (1 - e2);
          const Float td = rt * 2 * k * e1;
          rdif[idx2(c, v, ncol)] = rd;
          tdif[idx2(c, v, ncol)] = td;
          /* Toon et al. 1989 linear-in-B source, x pi */
          const Float ltp = lev_source[idx3(c, lt, gp, ncol, nlay + 1)];
          const Float lbt = lev_source[idx3(c, lb, gp, ncol, nlay + 1)];
          const Float safe = t * (g1 + g2);
          const Float z = (lbt - ltp) / (safe > 0 ? safe : 1);
          Float s_up = kPi * ((z + ltp) - rd * (-z + ltp) - td * (z + lbt));
          Float s_dn = kPi * ((-z + lbt) - rd * (z + lbt) - td * (-z + ltp));
          if (t <= (Float)1e-8) { s_up = 0; s_dn = 0; }
          sup[idx2(c, v, ncol)] = s_up;
          sdn[idx2(c, v, ncol)] = s_dn;
        }
      }
      for (long c = 0; c < ncol; ++c) {
        const Float emis = sfc_emis[idx2(c, gp, ncol)];
        alb[c] = 1 - emis;
        ssfc[c] = kPi * emis * sfc_src[idx2(c, gp, ncol)];
        dtop[c] = inc_flux[idx2(c, gp, ncol)];
      }
      adding_gpt(ncol, nlay, rdif.data(), tdif.data(), sdn.data(), sup.data(),
                 alb.data(), ssfc.data(), dtop.data(), fup.data(), fdn.data(),
                 albedo, src, denom);
      for (long v = 0; v <= nlay; ++v) {
        const long lv = lev_at(v, nlay, top_at_1);
        for (long c = 0; c < ncol; ++c) {
          flux_up[idx3(c, lv, gp, ncol, nlev)] = fup[idx2(c, v, ncol)];
          flux_dn[idx3(c, lv, gp, ncol, nlev)] = fdn[idx2(c, v, ncol)];
        }
      }
    }
  }
}

void rte_sw_solver_noscat(int ncol_i, int nlay_i, int ngpt_i, Bool top_at_1,
                          const Float* tau, const Float* mu0,
                          const Float* inc_flux_dir, Float* flux_dir) {
  const long ncol = ncol_i, nlay = nlay_i, ngpt = ngpt_i;
  const long nlev = nlay + 1;
#pragma omp parallel for schedule(static)
  for (long gp = 0; gp < ngpt; ++gp) {
    for (long c = 0; c < ncol; ++c) {
      const long l0 = lay_at(0, nlay, top_at_1);
      Float f = inc_flux_dir[idx2(c, gp, ncol)] * mu0[idx2(c, l0, ncol)];
      flux_dir[idx3(c, lev_at(0, nlay, top_at_1), gp, ncol, nlev)] = f;
      for (long v = 0; v < nlay; ++v) {
        const long l = lay_at(v, nlay, top_at_1);
        f *= std::exp(-tau[idx3(c, l, gp, ncol, nlay)] /
                      mu0[idx2(c, l, ncol)]);
        flux_dir[idx3(c, lev_at(v + 1, nlay, top_at_1), gp, ncol, nlev)] = f;
      }
    }
  }
}

void rte_sw_solver_2stream(
    int ncol_i, int nlay_i, int ngpt_i, Bool top_at_1, const Float* tau,
    const Float* ssa, const Float* g, const Float* mu0,
    const Float* sfc_alb_dir, const Float* sfc_alb_dif,
    const Float* inc_flux_dir, Float* flux_up, Float* flux_dn,
    Float* flux_dir, Bool has_dif_bc, const Float* inc_flux_dif,
    Bool do_broadband, Float* broadband_up, Float* broadband_dn,
    Float* broadband_dir) {
  const long ncol = ncol_i, nlay = nlay_i, ngpt = ngpt_i;
  const long nlev = nlay + 1;
  const Float eps = std::numeric_limits<Float>::epsilon();
  const Float min_k = (Float)1e4 * eps;
  const Float min_mu0 = std::sqrt(eps);

  if (do_broadband) {
    std::memset(broadband_up, 0, sizeof(Float) * ncol * nlev);
    std::memset(broadband_dn, 0, sizeof(Float) * ncol * nlev);
    std::memset(broadband_dir, 0, sizeof(Float) * ncol * nlev);
  }

#pragma omp parallel
  {
    std::vector<Float> rdif(ncol * nlay), tdif(ncol * nlay);
    std::vector<Float> sdn(ncol * nlay), sup(ncol * nlay);
    std::vector<Float> dir(ncol * (nlay + 1));
    std::vector<Float> alb(ncol), ssfc(ncol), dtop(ncol);
    std::vector<Float> albedo(ncol * (nlay + 1)), src(ncol * (nlay + 1));
    std::vector<Float> denom(ncol * nlay);
    std::vector<Float> fup(ncol * (nlay + 1)), fdn(ncol * (nlay + 1));
#pragma omp for schedule(static)
    for (long gp = 0; gp < ngpt; ++gp) {
      /* direct beam + per-layer diffuse R/T and direct-driven sources
       * (reference sw_dif_and_source: PIFM + Meador-Weaver + clamps) */
      for (long c = 0; c < ncol; ++c) {
        const long l0 = lay_at(0, nlay, top_at_1);
        dir[idx2(c, 0, ncol)] =
            inc_flux_dir[idx2(c, gp, ncol)] * mu0[idx2(c, l0, ncol)];
      }
      for (long v = 0; v < nlay; ++v) {
        const long l = lay_at(v, nlay, top_at_1);
        for (long c = 0; c < ncol; ++c) {
          const Float t = tau[idx3(c, l, gp, ncol, nlay)];
          const Float w0 = ssa[idx3(c, l, gp, ncol, nlay)];
          const Float as = g[idx3(c, l, gp, ncol, nlay)];
          const Float m0 = mu0[idx2(c, l, ncol)];
          const Float m0s = std::max(min_mu0, m0);
          const Float g1 = (8 - w0 * (5 + 3 * as)) * (Float)0.25;
          const Float g2 = 3 * (w0 * (1 - as)) * (Float)0.25;
          const Float k =
              std::sqrt(std::max((g1 - g2) * (g1 + g2), min_k));
          const Float e1 = std::exp(-t * k);
          const Float e2 = e1 * e1;
          const Float rt = 1 / (k * (1 + e2) + g1 * (1 - e2));
          rdif[idx2(c, v, ncol)] = rt * g2 * (1 - e2);
          tdif[idx2(c, v, ncol)] = rt * 2 * k * e1;
          const Float k_mu = k * m0s;
          Float den = 1 - k_mu * k_mu;
          den = std::abs(den) >= eps ? den : eps;
          const Float rt2 = w0 * rt / den;
          const Float g3 = (2 - 3 * m0s * as) * (Float)0.25;  /* PIFM */
          const Float g4 = 1 - g3;
          const Float a1 = g1 * g4 + g2 * g3;
          const Float a2 = g1 * g3 + g2 * g4;
          const Float kg3 = k * g3, kg4 = k * g4;
          const Float tnoscat = std::exp(-t / m0s);
          Float rdir = rt2 * ((1 - k_mu) * (a2 + kg3) -
                              (1 + k_mu) * (a2 - kg3) * e2 -
                              2 * (kg3 - a2 * k_mu) * e1 * tnoscat);
          Float tdir = -rt2 * ((1 + k_mu) * (a1 + kg4) * tnoscat -
                               (1 - k_mu) * (a1 - kg4) * e2 * tnoscat -
                               2 * (kg4 + a1 * k_mu) * e1);
          /* energy-safety clamps (Hogan/Ukkonen) */
          rdir = std::min(std::max(rdir, (Float)0), 1 - tnoscat);
          tdir = std::min(std::max(tdir, (Float)0), 1 - tnoscat - rdir);
          const Float inc = dir[idx2(c, v, ncol)];
          const bool day = m0 > 0;
          sup[idx2(c, v, ncol)] = day ? rdir * inc : 0;
          sdn[idx2(c, v, ncol)] = day ? tdir * inc : 0;
          dir[idx2(c, v + 1, ncol)] = inc * tnoscat;
        }
      }
      for (long c = 0; c < ncol; ++c) {
        const long lb = lay_at(nlay - 1, nlay, top_at_1);
        const bool day = mu0[idx2(c, lb, ncol)] > 0;
        alb[c] = sfc_alb_dif[idx2(c, gp, ncol)];
        ssfc[c] = day ? dir[idx2(c, nlay, ncol)] *
                            sfc_alb_dir[idx2(c, gp, ncol)]
                      : 0;
        dtop[c] = has_dif_bc ? inc_flux_dif[idx2(c, gp, ncol)] : 0;
      }
      adding_gpt(ncol, nlay, rdif.data(), tdif.data(), sdn.data(), sup.data(),
                 alb.data(), ssfc.data(), dtop.data(), fup.data(), fdn.data(),
                 albedo, src, denom);
      for (long v = 0; v <= nlay; ++v) {
        const long lv = lev_at(v, nlay, top_at_1);
        for (long c = 0; c < ncol; ++c) {
          const Float fu = fup[idx2(c, v, ncol)];
          const Float fd = fdn[idx2(c, v, ncol)] + dir[idx2(c, v, ncol)];
          const Float fr = dir[idx2(c, v, ncol)];
          if (do_broadband) {
#pragma omp atomic
            broadband_up[idx2(c, lv, ncol)] += fu;
#pragma omp atomic
            broadband_dn[idx2(c, lv, ncol)] += fd;
#pragma omp atomic
            broadband_dir[idx2(c, lv, ncol)] += fr;
          } else {
            flux_up[idx3(c, lv, gp, ncol, nlev)] = fu;
            flux_dn[idx3(c, lv, gp, ncol, nlev)] = fd;
            flux_dir[idx3(c, lv, gp, ncol, nlev)] = fr;
          }
        }
      }
    }
  }
}

}  // extern "C"
