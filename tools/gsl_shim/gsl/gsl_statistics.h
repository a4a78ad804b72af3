#ifndef GSL_SHIM_STATISTICS_H
#define GSL_SHIM_STATISTICS_H
#include <stddef.h>

static inline size_t gsl_stats_min_index(const double data[], size_t stride,
                                         size_t n) {
  size_t imin = 0;
  for (size_t i = 1; i < n; i++)
    if (data[i * stride] < data[imin * stride]) imin = i;
  return imin;
}

#endif
