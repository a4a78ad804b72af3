/* GSL 2.5 numeric constants used by the reference. */
#ifndef GSL_SHIM_CONST_NUM_H
#define GSL_SHIM_CONST_NUM_H

#define GSL_CONST_NUM_AVOGADRO (6.02214199e23)

#endif
