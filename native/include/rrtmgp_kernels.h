/* RRTMGP extern-kernel C ABI: correlated-k gas optics + cloud optics.
 *
 * Function names, argument order, and array-layout contract follow the
 * reference's extern kernel interface
 * (rrtmgp/kernels/api/mo_gas_optics_rrtmgp_kernels.F90:1-245,
 * api/mo_cloud_optics_rrtmgp_kernels.F90), so a host model built against
 * the reference's C headers can link this library instead.
 *
 * Array layout: Fortran order, first documented dimension fastest.
 * All index-valued arguments and outputs (jtemp, jpress, jeta, flavor,
 * band/minor g-point limits, kminor_start, idx_minor*, gpoint_bands) are
 * 1-based as in the reference ABI; idx_* of 0 means "none".
 */
#pragma once

#include "rte_types.h"

#ifdef __cplusplus
extern "C" {
#endif

/* Temperature / pressure / eta interpolation indices and weights
 * (reference kernels :37-170). */
void rrtmgp_interpolation(
    int ncol, int nlay, int ngas, int nflav, int neta, int npres, int ntemp,
    const int* flavor,          /* (2, nflav) 1-based gas indices          */
    const Float* press_ref_log, /* (npres) log(Pa), decreasing             */
    const Float* temp_ref,      /* (ntemp)                                 */
    Float press_ref_log_delta, Float temp_ref_min, Float temp_ref_delta,
    Float press_ref_trop_log,
    const Float* vmr_ref,       /* (2, ngas+1, ntemp)                      */
    const Float* play,          /* (ncol, nlay) [Pa]                       */
    const Float* tlay,          /* (ncol, nlay) [K]                        */
    const Float* col_gas,       /* (ncol, nlay, ngas+1), dry air at 0      */
    int* jtemp,                 /* (ncol, nlay) out, 1-based               */
    Float* fmajor,              /* (2, 2, 2, ncol, nlay, nflav) out        */
    Float* fminor,              /* (2, 2, ncol, nlay, nflav) out           */
    Float* col_mix,             /* (2, ncol, nlay, nflav) out              */
    Bool* tropo,                /* (ncol, nlay) out                        */
    int* jeta,                  /* (2, ncol, nlay, nflav) out, 1-based     */
    int* jpress);               /* (ncol, nlay) out, 1-based               */

/* Major + minor gas absorption optical depth
 * (reference kernels :176-501). tau is accumulated into (inout). */
void rrtmgp_compute_tau_absorption(
    int ncol, int nlay, int nbnd, int ngpt,
    int ngas, int nflav, int neta, int npres, int ntemp,
    int nminorlower, int nminorklower, int nminorupper, int nminorkupper,
    int idx_h2o,
    const int* gpoint_flavor,     /* (2, ngpt) 1-based                     */
    const int* band_lims_gpt,     /* (2, nbnd) 1-based inclusive           */
    const Float* kmajor,          /* (ntemp, neta, npres+1, ngpt)          */
    const Float* kminor_lower,    /* (ntemp, neta, nminorklower)           */
    const Float* kminor_upper,    /* (ntemp, neta, nminorkupper)           */
    const int* minor_limits_gpt_lower,   /* (2, nminorlower) 1-based       */
    const int* minor_limits_gpt_upper,
    const Bool* minor_scales_with_density_lower,  /* (nminorlower)         */
    const Bool* minor_scales_with_density_upper,
    const Bool* scale_by_complement_lower,
    const Bool* scale_by_complement_upper,
    const int* idx_minor_lower,          /* (nminorlower) into col_gas     */
    const int* idx_minor_upper,
    const int* idx_minor_scaling_lower,  /* (nminorlower), 0 = none        */
    const int* idx_minor_scaling_upper,
    const int* kminor_start_lower,       /* (nminorlower) 1-based          */
    const int* kminor_start_upper,
    const Bool* tropo,            /* (ncol, nlay)                          */
    const Float* col_mix,         /* (2, ncol, nlay, nflav)                */
    const Float* fmajor,          /* (2, 2, 2, ncol, nlay, nflav)          */
    const Float* fminor,          /* (2, 2, ncol, nlay, nflav)             */
    const Float* play, const Float* tlay,     /* (ncol, nlay)              */
    const Float* col_gas,         /* (ncol, nlay, ngas+1)                  */
    const int* jeta,              /* (2, ncol, nlay, nflav) 1-based        */
    const int* jtemp,             /* (ncol, nlay) 1-based                  */
    const int* jpress,            /* (ncol, nlay) 1-based                  */
    Float* tau);                  /* (ncol, nlay, ngpt) inout              */

/* Rayleigh scattering optical depth (reference kernels :506-565). */
void rrtmgp_compute_tau_rayleigh(
    int ncol, int nlay, int nbnd, int ngpt,
    int ngas, int nflav, int neta, int npres, int ntemp,
    const int* gpoint_flavor,     /* (2, ngpt) 1-based                     */
    const int* band_lims_gpt,     /* (2, nbnd) 1-based                     */
    const Float* krayl,           /* (ntemp, neta, ngpt, 2)                */
    int idx_h2o,
    const Float* col_dry,         /* (ncol, nlay)                          */
    const Float* col_gas,         /* (ncol, nlay, ngas+1)                  */
    const Float* fminor,          /* (2, 2, ncol, nlay, nflav)             */
    const int* jeta,              /* (2, ncol, nlay, nflav) 1-based        */
    const Bool* tropo,            /* (ncol, nlay)                          */
    const int* jtemp,             /* (ncol, nlay) 1-based                  */
    Float* tau_rayleigh);         /* (ncol, nlay, ngpt) out                */

/* Planck source functions (reference kernels :568-710). */
void rrtmgp_compute_Planck_source(
    int ncol, int nlay, int nbnd, int ngpt,
    int nflav, int neta, int npres, int ntemp, int nPlanckTemp,
    const Float* tlay,            /* (ncol, nlay)                          */
    const Float* tlev,            /* (ncol, nlay+1)                        */
    const Float* tsfc,            /* (ncol)                                */
    int sfc_lay,                  /* 1-based surface layer index           */
    const Float* fmajor,          /* (2, 2, 2, ncol, nlay, nflav)          */
    const int* jeta,              /* (2, ncol, nlay, nflav) 1-based        */
    const Bool* tropo,            /* (ncol, nlay)                          */
    const int* jtemp,             /* (ncol, nlay) 1-based                  */
    const int* jpress,            /* (ncol, nlay) 1-based                  */
    const int* gpoint_bands,      /* (ngpt) 1-based band per g-point       */
    const int* band_lims_gpt,     /* (2, nbnd) 1-based                     */
    const Float* pfracin,         /* (ntemp, neta, npres+1, ngpt)          */
    Float temp_ref_min, Float totplnk_delta,
    const Float* totplnk,         /* (nPlanckTemp, nbnd)                   */
    const int* gpoint_flavor,     /* (2, ngpt) 1-based                     */
    Float* sfc_src,               /* (ncol, ngpt) out                      */
    Float* lay_src,               /* (ncol, nlay, ngpt) out                */
    Float* lev_src,               /* (ncol, nlay+1, ngpt) out              */
    Float* sfc_source_Jac);       /* (ncol, ngpt) out                      */

/* Cloud optics: masked linear LUT interpolation by particle size
 * (reference api/mo_cloud_optics_rrtmgp_kernels.F90:24-65). */
void rrtmgp_compute_cld_from_table(
    int ncol, int nlay, int ngpt,
    const Bool* mask,             /* (ncol, nlay)                          */
    const Float* lwp,             /* (ncol, nlay)                          */
    const Float* re,              /* (ncol, nlay)                          */
    int nsteps, Float step_size, Float offset,
    const Float* tau_table,       /* (nsteps, ngpt)                        */
    const Float* ssa_table,       /* (nsteps, ngpt)                        */
    const Float* asy_table,       /* (nsteps, ngpt)                        */
    Float* tau,                   /* (ncol, nlay, ngpt) out                */
    Float* taussa,                /* (ncol, nlay, ngpt) out                */
    Float* taussag);              /* (ncol, nlay, ngpt) out                */

#ifdef __cplusplus
}
#endif
