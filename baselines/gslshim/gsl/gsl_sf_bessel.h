/* Minimal GSL-compatible modified-Bessel declarations (shim).
 * Backed by our own implementations in gslshim.cc:
 *  - I0 via the standard power series / C++17 std::cyl_bessel_i,
 *  - scaled variants via the integral representation
 *      In_scaled(n,x) = (1/pi) * int_0^pi exp(x*(cos t - 1)) cos(n t) dt,
 *    evaluated with panel-doubling composite Boole quadrature to ~1e-15,
 *    which is stable for the full range the reference uses (x <= 2000,
 *    auxilliary.cc:45-58).
 */
#ifndef GSLSHIM_SF_BESSEL_H
#define GSLSHIM_SF_BESSEL_H

double gsl_sf_bessel_I0(double x);
double gsl_sf_bessel_I0_scaled(double x);
double gsl_sf_bessel_In_scaled(int n, double x);

#endif
