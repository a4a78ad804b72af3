#ifndef GSL_SHIM_MATRIX_H
#define GSL_SHIM_MATRIX_H
#include <gsl/gsl_vector.h>
#endif
