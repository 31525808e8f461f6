/* Minimal GSL-compatible 1-D root-bracketing API (shim).
 * The reference uses only the bisection solver
 * (action/qft/quenchedschwingerrenormalisation.cc:7-64); the shim
 * implements exactly that: one bisection step per _iterate call.
 */
#ifndef GSLSHIM_ROOTS_H
#define GSLSHIM_ROOTS_H

#include "gsl_errno.h"
#include "gsl_integration.h" /* for gsl_function */

typedef struct {
  const char *name;
} gsl_root_fsolver_type;

extern const gsl_root_fsolver_type *gsl_root_fsolver_bisection;

typedef struct {
  const gsl_function *f;
  double x_lo, x_hi, root;
} gsl_root_fsolver;

gsl_root_fsolver *gsl_root_fsolver_alloc(const gsl_root_fsolver_type *T);
void gsl_root_fsolver_free(gsl_root_fsolver *s);
int gsl_root_fsolver_set(gsl_root_fsolver *s, gsl_function *f, double x_lo,
                         double x_hi);
int gsl_root_fsolver_iterate(gsl_root_fsolver *s);
double gsl_root_fsolver_root(const gsl_root_fsolver *s);
double gsl_root_fsolver_x_lower(const gsl_root_fsolver *s);
double gsl_root_fsolver_x_upper(const gsl_root_fsolver *s);
int gsl_root_test_interval(double x_lo, double x_hi, double epsabs,
                           double epsrel);

#endif
