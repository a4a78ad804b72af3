/* Minimal mt19937 gsl_rng (GSL's default generator): used only by the
 * climatology CLI's optional RAND perturbations. Follows GSL's mt19937
 * (MT19937-2002 init, default seed 0 mapped to 4357). */
#ifndef GSL_SHIM_RNG_H
#define GSL_SHIM_RNG_H

#include <stdlib.h>

typedef struct {
  unsigned long mt[624];
  int mti;
} gsl_rng;

typedef int gsl_rng_type;
static const gsl_rng_type gsl_rng_mt19937 = 0;
#define gsl_rng_default (&gsl_rng_mt19937)

static inline void gsl_rng_env_setup(void) {}

static inline void gsl_shim_mt_set(gsl_rng *r, unsigned long s) {
  if (s == 0) s = 4357; /* GSL: mt19937 maps seed 0 to 4357 */
  r->mt[0] = s & 0xffffffffUL;
  for (r->mti = 1; r->mti < 624; r->mti++) {
    r->mt[r->mti] = (1812433253UL * (r->mt[r->mti - 1] ^
                                     (r->mt[r->mti - 1] >> 30)) +
                     (unsigned long)r->mti) & 0xffffffffUL;
  }
}

static inline gsl_rng *gsl_rng_alloc(const gsl_rng_type *T) {
  (void)T;
  gsl_rng *r = (gsl_rng *)malloc(sizeof(gsl_rng));
  gsl_shim_mt_set(r, 0);
  return r;
}
static inline void gsl_rng_free(gsl_rng *r) { free(r); }

static inline unsigned long gsl_shim_mt_get(gsl_rng *r) {
  const unsigned long UPPER = 0x80000000UL, LOWER = 0x7fffffffUL;
  unsigned long y;
  if (r->mti >= 624) {
    int kk;
    for (kk = 0; kk < 624 - 397; kk++) {
      y = (r->mt[kk] & UPPER) | (r->mt[kk + 1] & LOWER);
      r->mt[kk] = r->mt[kk + 397] ^ (y >> 1) ^ ((y & 1) ? 0x9908b0dfUL : 0);
    }
    for (; kk < 623; kk++) {
      y = (r->mt[kk] & UPPER) | (r->mt[kk + 1] & LOWER);
      r->mt[kk] = r->mt[kk + (397 - 624)] ^ (y >> 1) ^
                  ((y & 1) ? 0x9908b0dfUL : 0);
    }
    y = (r->mt[623] & UPPER) | (r->mt[0] & LOWER);
    r->mt[623] = r->mt[396] ^ (y >> 1) ^ ((y & 1) ? 0x9908b0dfUL : 0);
    r->mti = 0;
  }
  y = r->mt[r->mti++];
  y ^= (y >> 11);
  y ^= (y << 7) & 0x9d2c5680UL;
  y ^= (y << 15) & 0xefc60000UL;
  y ^= (y >> 18);
  return y;
}

static inline double gsl_rng_uniform_pos(gsl_rng *r) {
  double x;
  do {
    x = gsl_shim_mt_get(r) / 4294967296.0;
  } while (x == 0);
  return x;
}

#endif
