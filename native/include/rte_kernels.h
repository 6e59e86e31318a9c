/* RTE extern-kernel C ABI.
 *
 * Function names, argument order, and array-layout contract follow the
 * reference's extern kernel interface (rte/kernels/api/
 * mo_rte_solver_kernels.F90, mo_optical_props_kernels.F90,
 * mo_fluxes_broadband_kernels.F90, mo_rte_util_array.F90 and the byband
 * kernels of rte/extensions/mo_fluxes_byband.F90), so a host model built
 * against the reference's C headers can link this library instead.
 *
 * Array layout: Fortran order, columns fastest.  A field documented as
 * (ncol, nlay, ngpt) is stored with memory index
 *   icol + ncol * (ilay + nlay * igpt).
 * Index arguments (band limits) are 1-based as in the reference ABI.
 */
#pragma once

#include "rte_types.h"

#ifdef __cplusplus
extern "C" {
#endif

/* ------------------------- solvers ------------------------- */

void rte_lw_solver_noscat(
    int ncol, int nlay, int ngpt, Bool top_at_1, int nmus,
    const Float* Ds,            /* (ncol, ngpt, nmus) secants              */
    const Float* weights,       /* (nmus)                                  */
    const Float* tau,           /* (ncol, nlay, ngpt)                      */
    const Float* lay_source,    /* (ncol, nlay, ngpt)                      */
    const Float* lev_source,    /* (ncol, nlay+1, ngpt)                    */
    const Float* sfc_emis,      /* (ncol, ngpt)                            */
    const Float* sfc_src,       /* (ncol, ngpt)                            */
    const Float* inc_flux,      /* (ncol, ngpt)                            */
    Float* flux_up,             /* (ncol, nlay+1, ngpt)                    */
    Float* flux_dn,             /* (ncol, nlay+1, ngpt)                    */
    Bool do_broadband,
    Float* broadband_up,        /* (ncol, nlay+1)                          */
    Float* broadband_dn,        /* (ncol, nlay+1)                          */
    Bool do_Jacobians,
    const Float* sfc_srcJac,    /* (ncol, ngpt)                            */
    Float* flux_upJac,          /* (ncol, nlay+1)                          */
    Bool do_rescaling,
    const Float* ssa,           /* (ncol, nlay, ngpt)                      */
    const Float* g);            /* (ncol, nlay, ngpt)                      */

void rte_lw_solver_2stream(
    int ncol, int nlay, int ngpt, Bool top_at_1,
    const Float* tau, const Float* ssa, const Float* g,
    const Float* lay_source, const Float* lev_source,
    const Float* sfc_emis, const Float* sfc_src, const Float* inc_flux,
    Float* flux_up, Float* flux_dn);

void rte_sw_solver_noscat(
    int ncol, int nlay, int ngpt, Bool top_at_1,
    const Float* tau,           /* (ncol, nlay, ngpt)                      */
    const Float* mu0,           /* (ncol, nlay)                            */
    const Float* inc_flux_dir,  /* (ncol, ngpt)                            */
    Float* flux_dir);           /* (ncol, nlay+1, ngpt)                    */

void rte_sw_solver_2stream(
    int ncol, int nlay, int ngpt, Bool top_at_1,
    const Float* tau, const Float* ssa, const Float* g,
    const Float* mu0,           /* (ncol, nlay)                            */
    const Float* sfc_alb_dir,   /* (ncol, ngpt)                            */
    const Float* sfc_alb_dif,   /* (ncol, ngpt)                            */
    const Float* inc_flux_dir,  /* (ncol, ngpt)                            */
    Float* flux_up, Float* flux_dn, Float* flux_dir, /* (ncol,nlay+1,ngpt) */
    Bool has_dif_bc,
    const Float* inc_flux_dif,  /* (ncol, ngpt)                            */
    Bool do_broadband,
    Float* broadband_up, Float* broadband_dn, Float* broadband_dir);

/* -------------------- optical-props algebra -------------------- */

void rte_delta_scale_2str_k(int ncol, int nlay, int ngpt,
                            Float* tau, Float* ssa, Float* g);
void rte_delta_scale_2str_f_k(int ncol, int nlay, int ngpt,
                              Float* tau, Float* ssa, Float* g,
                              const Float* f);

void rte_increment_1scalar_by_1scalar(int ncol, int nlay, int ngpt,
                                      Float* tau1, const Float* tau2);
void rte_increment_1scalar_by_2stream(int ncol, int nlay, int ngpt,
                                      Float* tau1,
                                      const Float* tau2, const Float* ssa2);
void rte_increment_2stream_by_1scalar(int ncol, int nlay, int ngpt,
                                      Float* tau1, Float* ssa1,
                                      const Float* tau2);
void rte_increment_2stream_by_2stream(int ncol, int nlay, int ngpt,
                                      Float* tau1, Float* ssa1, Float* g1,
                                      const Float* tau2, const Float* ssa2,
                                      const Float* g2);

/* band -> g-point variants; gpt_lims is (2, nbnd), 1-based inclusive */
void rte_inc_1scalar_by_1scalar_bybnd(int ncol, int nlay, int ngpt,
                                      Float* tau1, const Float* tau2,
                                      int nbnd, const int* gpt_lims);
void rte_inc_1scalar_by_2stream_bybnd(int ncol, int nlay, int ngpt,
                                      Float* tau1,
                                      const Float* tau2, const Float* ssa2,
                                      int nbnd, const int* gpt_lims);
void rte_inc_2stream_by_1scalar_bybnd(int ncol, int nlay, int ngpt,
                                      Float* tau1, Float* ssa1,
                                      const Float* tau2,
                                      int nbnd, const int* gpt_lims);
void rte_inc_2stream_by_2stream_bybnd(int ncol, int nlay, int ngpt,
                                      Float* tau1, Float* ssa1, Float* g1,
                                      const Float* tau2, const Float* ssa2,
                                      const Float* g2,
                                      int nbnd, const int* gpt_lims);

/* column subsetting; colS 1-based as in the reference ABI */
void rte_extract_subset_dim1_3d(int ncol, int nlay, int ngpt,
                                const Float* array_in, int colS, int colE,
                                Float* array_out);
void rte_extract_subset_absorption_tau(int ncol, int nlay, int ngpt,
                                       const Float* tau_in,
                                       const Float* ssa_in,
                                       int colS, int colE, Float* tau_out);

/* ----------------------- flux reductions ----------------------- */

void rte_sum_broadband(int ncol, int nlev, int ngpt,
                       const Float* spectral_flux, Float* broadband_flux);
void rte_net_broadband_full(int ncol, int nlev, int ngpt,
                            const Float* spectral_flux_dn,
                            const Float* spectral_flux_up,
                            Float* broadband_flux_net);
void rte_net_broadband_precalc(int ncol, int nlev,
                               const Float* broadband_flux_dn,
                               const Float* broadband_flux_up,
                               Float* broadband_flux_net);
void rte_sum_byband(int ncol, int nlev, int ngpt, int nbnd,
                    const int* band_lims,   /* (2, nbnd), 1-based */
                    const Float* spectral_flux, Float* byband_flux);
void rte_net_byband_full(int ncol, int nlev, int ngpt, int nbnd,
                         const int* band_lims,
                         const Float* spectral_flux_dn,
                         const Float* spectral_flux_up,
                         Float* byband_flux_net);

/* ------------------------ array utils ------------------------ */

void zero_array_1D(int ni, Float* array);
void zero_array_2D(int ni, int nj, Float* array);
void zero_array_3D(int ni, int nj, int nk, Float* array);
void zero_array_4D(int ni, int nj, int nk, int nl, Float* array);
void set_to_scalar_1D(int ni, Float* array, Float value);
void set_to_scalar_2D(int ni, int nj, Float* array, Float value);
void set_to_scalar_3D(int ni, int nj, int nk, Float* array, Float value);
void set_to_scalar_4D(int ni, int nj, int nk, int nl, Float* array,
                      Float value);

#ifdef __cplusplus
}
#endif
