#!/bin/bash
# Build the actual reference (eikehmueller/mlmcpathintegral) from
# /root/reference without CMake-discoverable Eigen/GSL:
#   - Eigen: the headers bundled with the installed tensorflow wheel
#     (a stock upstream Eigen snapshot).
#   - GSL: baselines/gslshim — our from-scratch implementations of the
#     exact GSL entry points the reference calls (see gslshim.cc).
#   - MPI: not available in this image; built with the reference's own
#     serial fallback (USE_MPI undefined, mpi/mpi_wrapper.hh).
# Output: baselines/ref_build/{driver_qm,driver_qft,test_fastbessel,...}
set -euo pipefail

REF=/root/reference
HERE="$(cd "$(dirname "$0")" && pwd)"
BUILD="$HERE/ref_build"
EIGEN=/opt/venv/lib/python3.12/site-packages/tensorflow/include
SHIM="$HERE/gslshim"

mkdir -p "$BUILD/obj"

CXX=g++
# -march=haswell (AVX2+FMA): the bundled Eigen's AVX512-FP16 kernels do
# not parse under g++ 12, and the reference is scalar-dominated anyway.
CXXFLAGS="-O3 -std=c++17 -march=haswell -ffast-math -fno-finite-math-only \
  -I$REF/src -I$EIGEN -I$SHIM -w"

# Collect all library sources (same set CMake globs via subdirectories).
SRCS=$(find "$REF/src" -name '*.cc' \
  ! -name 'driver_*.cc' ! -name 'test_*.cc' | sort)

compile() {
  local src="$1"
  local obj="$BUILD/obj/$(echo "${src#$REF/src/}" | tr '/' '_').o"
  if [ ! -f "$obj" ] || [ "$src" -nt "$obj" ]; then
    echo "CXX ${src#$REF/}"
    $CXX $CXXFLAGS -c "$src" -o "$obj"
  fi
}

# Shim object
if [ ! -f "$BUILD/obj/gslshim.o" ] || [ "$SHIM/gslshim.cc" -nt "$BUILD/obj/gslshim.o" ]; then
  echo "CXX gslshim.cc"
  $CXX $CXXFLAGS -c "$SHIM/gslshim.cc" -o "$BUILD/obj/gslshim.o"
fi

# Parallel compile (2 cores)
N=0
for s in $SRCS; do
  compile "$s" &
  N=$((N+1))
  if [ $((N % 2)) -eq 0 ]; then wait; fi
done
wait

OBJS="$BUILD/obj/"*.o

for exe in driver_qm driver_qft test_fastbessel test_distribution test_schwinger_fillin_distribution; do
  if [ ! -f "$BUILD/$exe" ] || [ "$REF/src/$exe.cc" -nt "$BUILD/$exe" ]; then
    echo "LINK $exe"
    $CXX $CXXFLAGS "$REF/src/$exe.cc" $OBJS -o "$BUILD/$exe"
  fi
done

echo "done: binaries in $BUILD"
