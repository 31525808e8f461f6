/* Minimal GSL-compatible error codes — enough to build the reference
 * (see /root/reference/src: only GSL_SUCCESS / GSL_CONTINUE are consumed,
 * via gsl_root_test_interval in quenchedschwingerrenormalisation.cc:50-60).
 *
 * This header is part of a small from-scratch shim that re-implements the
 * handful of GSL entry points the reference uses, so the reference C++ code
 * can be built and benchmarked on a machine without GSL. It contains no GSL
 * code; the numerical backends are our own (see gslshim.cc).
 */
#ifndef GSLSHIM_ERRNO_H
#define GSLSHIM_ERRNO_H

enum {
  GSL_SUCCESS = 0,
  GSL_FAILURE = -1,
  GSL_CONTINUE = -2,
  GSL_EMAXITER = 11,
  GSL_EBADTOL = 13,
  GSL_ETOL = 14,
};

#endif
