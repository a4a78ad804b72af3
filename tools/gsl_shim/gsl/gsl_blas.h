#ifndef GSL_SHIM_BLAS_H
#define GSL_SHIM_BLAS_H
#include <gsl/gsl_vector.h>
#endif
