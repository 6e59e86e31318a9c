/* C-compatible scalar types for the RTE extern-kernel ABI.
 *
 * Mirrors the type contract of the reference's generated header
 * (rte/kernels/api/rte_types.h.in): `Float` is the working precision
 * selected at compile time, `Bool` a C bool.  This library is compiled
 * twice (RTE_PRECISION = float | double) to serve both precisions.
 */
#pragma once

#include <stdbool.h>

#ifndef RTE_PRECISION
#define RTE_PRECISION float
#endif

typedef RTE_PRECISION Float;
typedef bool Bool;
