/* Minimal GSL-compatible erf declaration (shim) — forwards to std::erf. */
#ifndef GSLSHIM_SF_ERF_H
#define GSLSHIM_SF_ERF_H

double gsl_sf_erf(double x);

#endif
