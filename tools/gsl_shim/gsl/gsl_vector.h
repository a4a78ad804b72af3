/* Minimal gsl_vector/gsl_matrix for the reference's Jacobian API
 * (kernel, jurassic.c:812-857) and matrix I/O. Header-only. */
#ifndef GSL_SHIM_VECTOR_H
#define GSL_SHIM_VECTOR_H

#include <stdlib.h>
#include <string.h>

typedef struct { size_t size; double *data; } gsl_vector;
typedef struct { size_t size1, size2; double *data; } gsl_matrix;

static inline gsl_vector *gsl_vector_alloc(size_t n) {
  gsl_vector *v = (gsl_vector *)malloc(sizeof(gsl_vector));
  v->size = n;
  v->data = (double *)calloc(n, sizeof(double));
  return v;
}
static inline void gsl_vector_free(gsl_vector *v) {
  if (v) { free(v->data); free(v); }
}
static inline double gsl_vector_get(const gsl_vector *v, size_t i) {
  return v->data[i];
}
static inline void gsl_vector_set(gsl_vector *v, size_t i, double x) {
  v->data[i] = x;
}
static inline void gsl_vector_memcpy(gsl_vector *dst, const gsl_vector *src) {
  memcpy(dst->data, src->data, src->size * sizeof(double));
}

static inline gsl_matrix *gsl_matrix_alloc(size_t n1, size_t n2) {
  gsl_matrix *m = (gsl_matrix *)malloc(sizeof(gsl_matrix));
  m->size1 = n1;
  m->size2 = n2;
  m->data = (double *)calloc(n1 * n2, sizeof(double));
  return m;
}
static inline void gsl_matrix_free(gsl_matrix *m) {
  if (m) { free(m->data); free(m); }
}
static inline double gsl_matrix_get(const gsl_matrix *m, size_t i, size_t j) {
  return m->data[i * m->size2 + j];
}
static inline void gsl_matrix_set(gsl_matrix *m, size_t i, size_t j,
                                  double x) {
  m->data[i * m->size2 + j] = x;
}
static inline void gsl_matrix_set_zero(gsl_matrix *m) {
  memset(m->data, 0, m->size1 * m->size2 * sizeof(double));
}

#endif
