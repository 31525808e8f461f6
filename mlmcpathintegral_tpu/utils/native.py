"""ctypes bindings for the native statistics engine (native/libmlmc_stats.so).

Loads the shared library, building it with ``make -C native`` on first use
if needed; all entry points have pure-Python/numpy fallbacks so the
framework works without a compiler.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_LIB_PATH = _NATIVE_DIR / "libmlmc_stats.so"
_lib = None
_load_attempted = False


def _load():
    global _lib, _load_attempted
    if _load_attempted:
        return _lib
    _load_attempted = True
    if not _LIB_PATH.exists():
        try:
            subprocess.run(["make", "-C", str(_NATIVE_DIR)], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.mlmc_stats_process.restype = ctypes.c_int
        lib.mlmc_stats_process.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64, ctypes.c_int,
            ctypes.POINTER(ctypes.c_double)]
        lib.mlmc_stats_binning.restype = ctypes.c_int
        lib.mlmc_stats_binning.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64, ctypes.c_int,
            ctypes.POINTER(ctypes.c_double)]
        lib.mlmc_fast_i0_scaled.restype = ctypes.c_double
        lib.mlmc_fast_i0_scaled.argtypes = [ctypes.c_double]
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def native_available() -> bool:
    return _load() is not None


def analyze_samples(samples, k_max: int = 20) -> dict:
    """Single-pass streaming analysis of a QoI sample series; returns
    {n, avg, variance, variance_error, tau_int, error, autocorr}.
    Uses the native engine when available."""
    samples = np.ascontiguousarray(samples, dtype=np.float64).ravel()
    lib = _load()
    if lib is not None:
        out = np.zeros(6 + k_max)
        rc = lib.mlmc_stats_process(
            samples.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            samples.size, k_max,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
        if rc == 0:
            return {"n": int(out[0]), "avg": out[1], "variance": out[2],
                    "variance_error": out[3], "tau_int": out[4],
                    "error": out[5], "autocorr": out[6:].copy(),
                    "native": True}
    return _analyze_python(samples, k_max)


def binning_analysis(samples, n_levels: int = 12) -> np.ndarray:
    """Naive error of 2^b-binned series per level b (plateau = true
    error) — an independent cross-check of the windowed tau_int."""
    samples = np.ascontiguousarray(samples, dtype=np.float64).ravel()
    lib = _load()
    if lib is not None:
        out = np.zeros(n_levels)
        rc = lib.mlmc_stats_binning(
            samples.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            samples.size, n_levels,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
        if rc == 0:
            return out
    errs = []
    buf = samples.copy()
    for b in range(n_levels):
        if buf.size < 2:
            errs.append(errs[-1] if errs else 0.0)
            continue
        errs.append(float(buf.std(ddof=1) / np.sqrt(buf.size)))
        m2 = buf.size // 2
        buf = 0.5 * (buf[:2 * m2:2] + buf[1:2 * m2:2])
    return np.asarray(errs)


def fast_i0_scaled_native(z: float) -> float:
    lib = _load()
    if lib is not None:
        return float(lib.mlmc_fast_i0_scaled(float(z)))
    from scipy import special as ssp
    return float(ssp.i0e(z))


def _analyze_python(samples: np.ndarray, k_max: int) -> dict:
    """Numpy fallback replicating the reference estimators."""
    n = samples.size
    avg = samples.mean()
    d = samples - avg
    C = np.empty(k_max)
    for k in range(k_max):
        C[k] = np.mean(samples[k:] * samples[:n - k]) - avg * avg
    var = n / (n - 1.0) * C[0]
    k = np.arange(1, k_max)
    tau = max(1.0, 1.0 + 2.0 * np.sum((1.0 - k / n) * C[1:]) / C[0]) \
        if C[0] > 0 else 1.0
    m2, m3, m4 = (samples**2).mean(), (samples**3).mean(), \
        (samples**4).mean()
    var_err = np.sqrt(max(
        (m4 - 4 * avg * m3 + 8 * avg**2 * m2 - m2**2 - 4 * avg**4) / n, 0.0))
    return {"n": n, "avg": float(avg), "variance": float(var),
            "variance_error": float(var_err), "tau_int": float(tau),
            "error": float(np.sqrt(tau * max(var, 0) / n)),
            "autocorr": C, "native": False}
