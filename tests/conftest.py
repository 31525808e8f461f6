"""Test configuration: run on a virtual 8-device CPU mesh with f64.

Correctness tests run against the reference's f64 semantics on CPU;
multi-"chip" sharding tests use the forced host-platform device count
(the analog of the reference's `mpirun -n N` checks, SURVEY.md §4).
Benchmarks (bench.py) run on real TPU hardware in f32 instead.

Note: the TPU plugin on this machine ignores JAX_PLATFORMS, so the CPU
backend is forced via ``jax_default_device`` after initialisation.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_default_device", jax.local_devices(backend="cpu")[0])

CPU_DEVICES = jax.local_devices(backend="cpu")
