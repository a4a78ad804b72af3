#ifndef GSL_SHIM_LINALG_H
#define GSL_SHIM_LINALG_H
#include <gsl/gsl_vector.h>
#endif
