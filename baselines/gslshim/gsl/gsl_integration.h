/* Minimal GSL-compatible adaptive-integration API (shim).
 *
 * The reference uses exactly two routines (common/auxilliary.cc:150-192):
 *   gsl_integration_qag  — adaptive integration of f on [a,b]
 *   gsl_integration_qawo — adaptive integration of f(x)*sin(w x) or
 *                          f(x)*cos(w x) on [a, a+L]
 * with epsabs=1e-15, epsrel=1e-12 and at most nmax=20 oscillations over
 * [-pi,pi]. Our backend (gslshim.cc) evaluates both with panel-doubling
 * composite Boole quadrature with Richardson-style convergence checks,
 * which reaches those tolerances for the smooth integrands involved.
 * The workspace/table structs only carry the parameters; no GSL code.
 */
#ifndef GSLSHIM_INTEGRATION_H
#define GSLSHIM_INTEGRATION_H

#include <cstddef>

struct gsl_function_struct {
  double (*function)(double x, void *params);
  void *params;
};
typedef struct gsl_function_struct gsl_function;

typedef struct {
  size_t limit;
} gsl_integration_workspace;

enum gsl_integration_qawo_enum { GSL_INTEG_COSINE = 0, GSL_INTEG_SINE = 1 };

/* key values for gsl_integration_qag (only the signature is needed) */
enum {
  GSL_INTEG_GAUSS15 = 1,
  GSL_INTEG_GAUSS21 = 2,
  GSL_INTEG_GAUSS31 = 3,
  GSL_INTEG_GAUSS41 = 4,
  GSL_INTEG_GAUSS51 = 5,
  GSL_INTEG_GAUSS61 = 6,
};

typedef struct {
  double omega;           /* frequency */
  double L;               /* interval length */
  int sine;               /* GSL_INTEG_SINE or GSL_INTEG_COSINE */
  size_t n;               /* bisection levels (capacity hint) */
} gsl_integration_qawo_table;

gsl_integration_workspace *gsl_integration_workspace_alloc(size_t n);
void gsl_integration_workspace_free(gsl_integration_workspace *w);

gsl_integration_qawo_table *
gsl_integration_qawo_table_alloc(double omega, double L,
                                 enum gsl_integration_qawo_enum sine,
                                 size_t n);
int gsl_integration_qawo_table_set(gsl_integration_qawo_table *t, double omega,
                                   double L,
                                   enum gsl_integration_qawo_enum sine);
void gsl_integration_qawo_table_free(gsl_integration_qawo_table *t);

int gsl_integration_qag(const gsl_function *f, double a, double b,
                        double epsabs, double epsrel, size_t limit, int key,
                        gsl_integration_workspace *workspace, double *result,
                        double *abserr);

int gsl_integration_qawo(gsl_function *f, double a, double epsabs,
                         double epsrel, size_t limit,
                         gsl_integration_workspace *workspace,
                         gsl_integration_qawo_table *wf, double *result,
                         double *abserr);

#endif
