/* Minimal header-only GSL shim: just enough of the GSL API surface for
 * building the reference JURASSIC-GPU CPU binaries as a verification
 * oracle (the repo's own lib/gsl-2.5.tar.gz is stripped from the mount).
 * Math semantics match GSL's trivial wrappers exactly; see gsl_rng.h for
 * the one non-trivial piece (mt19937). */
#ifndef GSL_SHIM_MATH_H
#define GSL_SHIM_MATH_H

#include <math.h>

#define GSL_NAN (nan(""))
#define GSL_POSINF (INFINITY)
#define GSL_NEGINF (-INFINITY)

#define GSL_MAX(a, b) ((a) > (b) ? (a) : (b))
#define GSL_MIN(a, b) ((a) < (b) ? (a) : (b))

static inline double GSL_MAX_DBL(double a, double b) { return a > b ? a : b; }
static inline double GSL_MIN_DBL(double a, double b) { return a < b ? a : b; }

static inline int gsl_finite(const double x) { return isfinite(x); }
static inline double gsl_log1p(const double x) { return log1p(x); }
static inline double gsl_expm1(const double x) { return expm1(x); }
static inline double gsl_pow_2(const double x) { return x * x; }
static inline double gsl_pow_3(const double x) { return x * x * x; }

#ifndef M_PI
#define M_PI 3.14159265358979323846
#endif

#endif
