/* Flux-reduction and array-utility kernels, native C++ tier.
 *
 * Extern C ABI of rte/kernels/api/mo_fluxes_broadband_kernels.F90,
 * mo_rte_util_array.F90 and the byband reducers of
 * rte/extensions/mo_fluxes_byband.F90.
 */
#include <cstring>

#include "rte_kernels.h"

namespace {
constexpr long I3(long c, long l, long g, long ncol, long nlev) {
  return c + ncol * (l + nlev * g);
}
}  // namespace

extern "C" {

void rte_sum_broadband(int ncol, int nlev, int ngpt,
                       const Float* spectral_flux, Float* broadband_flux) {
  std::memset(broadband_flux, 0, sizeof(Float) * (long)ncol * nlev);
  for (long gp = 0; gp < ngpt; ++gp)
    for (long l = 0; l < nlev; ++l)
      for (long c = 0; c < ncol; ++c)
        broadband_flux[c + (long)ncol * l] +=
            spectral_flux[I3(c, l, gp, ncol, nlev)];
}

void rte_net_broadband_full(int ncol, int nlev, int ngpt,
                            const Float* spectral_flux_dn,
                            const Float* spectral_flux_up,
                            Float* broadband_flux_net) {
  std::memset(broadband_flux_net, 0, sizeof(Float) * (long)ncol * nlev);
  for (long gp = 0; gp < ngpt; ++gp)
    for (long l = 0; l < nlev; ++l)
      for (long c = 0; c < ncol; ++c)
        broadband_flux_net[c + (long)ncol * l] +=
            spectral_flux_dn[I3(c, l, gp, ncol, nlev)] -
            spectral_flux_up[I3(c, l, gp, ncol, nlev)];
}

void rte_net_broadband_precalc(int ncol, int nlev,
                               const Float* broadband_flux_dn,
                               const Float* broadband_flux_up,
                               Float* broadband_flux_net) {
  const long n = (long)ncol * nlev;
  for (long i = 0; i < n; ++i)
    broadband_flux_net[i] = broadband_flux_dn[i] - broadband_flux_up[i];
}

void rte_sum_byband(int ncol, int nlev, int ngpt, int nbnd,
                    const int* band_lims, const Float* spectral_flux,
                    Float* byband_flux) {
  std::memset(byband_flux, 0, sizeof(Float) * (long)ncol * nlev * nbnd);
  for (int b = 0; b < nbnd; ++b)
    for (int gp = band_lims[2 * b] - 1; gp <= band_lims[2 * b + 1] - 1; ++gp)
      for (long l = 0; l < nlev; ++l)
        for (long c = 0; c < ncol; ++c)
          byband_flux[I3(c, l, b, ncol, nlev)] +=
              spectral_flux[I3(c, l, gp, ncol, nlev)];
}

void rte_net_byband_full(int ncol, int nlev, int ngpt, int nbnd,
                         const int* band_lims, const Float* spectral_flux_dn,
                         const Float* spectral_flux_up,
                         Float* byband_flux_net) {
  std::memset(byband_flux_net, 0, sizeof(Float) * (long)ncol * nlev * nbnd);
  for (int b = 0; b < nbnd; ++b)
    for (int gp = band_lims[2 * b] - 1; gp <= band_lims[2 * b + 1] - 1; ++gp)
      for (long l = 0; l < nlev; ++l)
        for (long c = 0; c < ncol; ++c)
          byband_flux_net[I3(c, l, b, ncol, nlev)] +=
              spectral_flux_dn[I3(c, l, gp, ncol, nlev)] -
              spectral_flux_up[I3(c, l, gp, ncol, nlev)];
}

void zero_array_1D(int ni, Float* a) { std::memset(a, 0, sizeof(Float) * ni); }
void zero_array_2D(int ni, int nj, Float* a) {
  std::memset(a, 0, sizeof(Float) * (long)ni * nj);
}
void zero_array_3D(int ni, int nj, int nk, Float* a) {
  std::memset(a, 0, sizeof(Float) * (long)ni * nj * nk);
}
void zero_array_4D(int ni, int nj, int nk, int nl, Float* a) {
  std::memset(a, 0, sizeof(Float) * (long)ni * nj * nk * nl);
}
void set_to_scalar_1D(int ni, Float* a, Float v) {
  for (long i = 0; i < ni; ++i) a[i] = v;
}
void set_to_scalar_2D(int ni, int nj, Float* a, Float v) {
  for (long i = 0; i < (long)ni * nj; ++i) a[i] = v;
}
void set_to_scalar_3D(int ni, int nj, int nk, Float* a, Float v) {
  for (long i = 0; i < (long)ni * nj * nk; ++i) a[i] = v;
}
void set_to_scalar_4D(int ni, int nj, int nk, int nl, Float* a, Float v) {
  for (long i = 0; i < (long)ni * nj * nk * nl; ++i) a[i] = v;
}

}  // extern "C"
