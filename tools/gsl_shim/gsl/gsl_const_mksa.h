/* GSL 2.5 MKSA constants used by the reference (see gsl_math.h shim note). */
#ifndef GSL_SHIM_CONST_MKSA_H
#define GSL_SHIM_CONST_MKSA_H

#define GSL_CONST_MKSA_BOLTZMANN (1.3806504e-23)
#define GSL_CONST_MKSA_MOLAR_GAS (8.314472e0)

#endif
