"""Benchmark: effective samples/sec of the chain engine on TPU.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "detail": {...}}

Two benchmarks run (BASELINE.md configs 1 and 5's sampler core):
  * schwinger: overrelaxed heat-bath chain on the 8x8 beta=4 quenched
    Schwinger model measuring V chi_t — the headline metric
    (1/tau_int-weighted effective samples/sec/chip)
  * harmonic: batched HMC on the M=64 harmonic oscillator

``vs_baseline`` compares the headline against the reference-equivalent C++
single-chain implementation measured on this host's CPU
(baselines/baseline_schwinger.cc / baseline_hmc.cc — faithful standalone
re-implementations of the reference algorithms, since Eigen/GSL are not
installable here), scaled by the host core count, i.e. the aggregate
throughput of the MPI reference build on this machine.
"""

import json
import os
import time
from pathlib import Path

import jax


def _setup_backend() -> str:
    """Prefer the accelerator; fall back to a CPU-pinned run (still
    producing a JSON line) if the TPU plugin/tunnel is unhealthy."""
    if os.environ.get("BENCH_CPU"):
        jax.config.update("jax_default_device",
                          jax.local_devices(backend="cpu")[0])
        return "cpu-pinned"
    try:
        devs = jax.devices()
        if any("TPU" in str(d) or "tpu" in str(d).lower() for d in devs):
            return "tpu"
        return str(devs[0])
    except RuntimeError:
        try:
            jax.config.update("jax_default_device",
                              jax.local_devices(backend="cpu")[0])
        except RuntimeError:
            # plugin discovery itself is broken; restrict to cpu
            jax.config.update("jax_platforms", "cpu")
        return "cpu-fallback"


_BACKEND = _setup_backend()

# Persistent compilation cache: the MLMC kernels (nested scan/while programs)
# take tens of seconds to compile on first use; cache them across runs.
try:
    jax.config.update("jax_compilation_cache_dir",
                      str(Path(__file__).resolve().parent / ".jax_cache"))
    # the MLMC prepare phase is ~150 small programs of 0.1-3s each (total
    # ~60s on the chip); a 1s threshold would leave them all uncached
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.05)
except Exception:
    pass

import jax.numpy as jnp

REPO = Path(__file__).resolve().parent


def _load_baseline(name):
    f = REPO / "baselines" / name
    if f.exists():
        return json.loads(f.read_text())
    return None


def _ncores():
    f = REPO / "baselines" / "ncores.txt"
    return int(f.read_text()) if f.exists() else 1


def bench_harmonic():
    from mlmcpathintegral_tpu.lattice import Lattice1D
    from mlmcpathintegral_tpu.models import HarmonicOscillatorAction
    from mlmcpathintegral_tpu.qoi import qoi_x_squared
    from mlmcpathintegral_tpu.samplers import HMCSampler
    from mlmcpathintegral_tpu.utils import statistics as stats_mod
    from mlmcpathintegral_tpu.utils.statistics import Statistics

    M, C, NT = 64, 8192, 20
    dtype = jnp.float32
    lat = Lattice1D(M_lat=M, T_final=4.0)
    action = HarmonicOscillatorAction(lat, m0=1.0, mu2=1.0)
    # the fused Pallas trajectory is ~3x the XLA scan on the chip; Mosaic
    # needs the real TPU, so the CPU fallback keeps the scan path
    sampler = HMCSampler(action, nt=NT, dt=0.1, n_burnin=50, unroll=4,
                         use_pallas=(_BACKEND == "tpu"), block_chains=1024)
    qoi = qoi_x_squared(lat)
    stats = Statistics("Q", 40)

    key = jax.random.PRNGKey(0)
    k_prep, k_run = jax.random.split(key)
    sstate = sampler.prepare(k_prep, C, dtype)
    STEPS = 64

    @jax.jit
    def chunk(key, sstate, stats_state):
        def body(carry, k):
            ss, st = carry
            ss, acc = sampler.draw(k, ss)
            st = stats_mod.record(st, qoi(ss.x))
            return (ss, st), jnp.sum(acc)
        keys = jax.random.split(key, STEPS)
        (ss, st), acc = jax.lax.scan(body, (sstate, stats_state), keys)
        return ss, st, jnp.sum(acc)

    stats_state = stats.init(C, dtype)
    k_run, sub = jax.random.split(k_run)
    sstate, stats_state, _ = chunk(sub, sstate, stats_state)   # warm-up
    jax.block_until_ready(stats_state)
    stats_state = stats_mod.soft_reset(stats_state)

    n_chunks = 8
    t0 = time.monotonic()
    for _ in range(n_chunks):
        k_run, sub = jax.random.split(k_run)
        sstate, stats_state, _ = chunk(sub, sstate, stats_state)
    jax.block_until_ready(stats_state)
    wall = time.monotonic() - t0
    n_samples = n_chunks * STEPS * C
    tau = stats.tau_int(stats_state)
    eff = n_samples / wall / tau
    base = _load_baseline("baseline_cpu.json")
    vs = (eff / (base["eff_samples_per_sec"] * _ncores())
          if base else None)
    return {
        "bench": "hmc_harmonic", "M": M, "n_chains": C, "nt": NT,
        "samples_per_sec": round(n_samples / wall, 1),
        "tau_int": round(tau, 3),
        "avg_x2": round(stats.average(stats_state), 5),
        "oracle_x2": round(action.Xsquared_analytical(), 5),
        "eff_samples_per_sec": round(eff, 1),
        "vs_baseline": round(vs, 2) if vs else None,
    }


def bench_schwinger_pallas():
    """The same chain as bench_schwinger driven by the multi-step fused
    Pallas kernel (ops/pallas_schwinger.py::schwinger_sweep_chain): the
    link field stays in VMEM across all STEPS draws of a chunk and only
    the per-step topological sums reach HBM."""
    import numpy as np

    from mlmcpathintegral_tpu.lattice2d import CoarseningType, Lattice2D
    from mlmcpathintegral_tpu.models.qft.schwinger import (
        QuenchedSchwingerAction,
    )
    from mlmcpathintegral_tpu.samplers import OverrelaxedHeatBathSampler
    from mlmcpathintegral_tpu.utils import statistics as stats_mod
    from mlmcpathintegral_tpu.utils.statistics import Statistics

    Mt, Mx, BETA, C = 8, 8, 4.0, 4096
    dtype = jnp.float32
    lat = Lattice2D(Mt, Mx, CoarseningType.BOTH)
    action = QuenchedSchwingerAction(lat, beta=BETA)
    sampler = OverrelaxedHeatBathSampler(action, n_sweep_heatbath=1,
                                         n_sweep_overrelax=1, n_burnin=100,
                                         use_pallas=True)
    stats = Statistics("chit", 40)
    FOUR_PI2_INV = 1.0 / (4.0 * np.pi ** 2)

    key = jax.random.PRNGKey(1)
    k_prep, k_run = jax.random.split(key)
    sstate = sampler.prepare(k_prep, C, dtype)
    STEPS = 256

    @jax.jit
    def chunk(key, sstate, stats_state):
        sstate, qsum = sampler.draw_chain(key, sstate, STEPS)
        y = FOUR_PI2_INV * qsum * qsum          # [STEPS, C] QoI trace
        stats_state = jax.lax.scan(
            lambda st, yi: (stats_mod.record(st, yi), None),
            stats_state, y)[0]
        return sstate, stats_state

    stats_state = stats.init(C, dtype)
    k_run, sub = jax.random.split(k_run)
    sstate, stats_state = chunk(sub, sstate, stats_state)   # warm-up
    jax.block_until_ready(stats_state)
    stats_state = stats_mod.soft_reset(stats_state)

    n_chunks = 8
    t0 = time.monotonic()
    for _ in range(n_chunks):
        k_run, sub = jax.random.split(k_run)
        sstate, stats_state = chunk(sub, sstate, stats_state)
    jax.block_until_ready(stats_state)
    wall = time.monotonic() - t0
    n_samples = n_chunks * STEPS * C
    tau = stats.tau_int(stats_state)
    eff = n_samples / wall / tau
    base = _load_baseline("baseline_schwinger_cpu.json")
    vs = (eff / (base["eff_samples_per_sec"] * _ncores())
          if base else None)
    return {
        "bench": "schwinger_heatbath_pallas", "Mt": Mt, "Mx": Mx,
        "beta": BETA, "n_chains": C, "steps_per_launch": STEPS,
        "samples_per_sec": round(n_samples / wall, 1),
        "tau_int": round(tau, 3),
        "avg_chit": round(stats.average(stats_state), 5),
        "oracle_chit": round(action.chit_exact(), 5),
        "eff_samples_per_sec": round(eff, 1),
        "vs_baseline": round(vs, 2) if vs else None,
    }


def bench_schwinger(use_pallas: bool = False):
    from mlmcpathintegral_tpu.lattice2d import CoarseningType, Lattice2D
    from mlmcpathintegral_tpu.models.qft.schwinger import (
        QuenchedSchwingerAction,
    )
    from mlmcpathintegral_tpu.qoi import qoi_2d_susceptibility
    from mlmcpathintegral_tpu.samplers import OverrelaxedHeatBathSampler
    from mlmcpathintegral_tpu.utils import statistics as stats_mod
    from mlmcpathintegral_tpu.utils.statistics import Statistics

    Mt, Mx, BETA, C = 8, 8, 4.0, 4096
    dtype = jnp.float32
    lat = Lattice2D(Mt, Mx, CoarseningType.BOTH)
    action = QuenchedSchwingerAction(lat, beta=BETA)
    sampler = OverrelaxedHeatBathSampler(action, n_sweep_heatbath=1,
                                         n_sweep_overrelax=1, n_burnin=100,
                                         use_pallas=use_pallas)
    qoi = qoi_2d_susceptibility(action)
    stats = Statistics("chit", 40)

    key = jax.random.PRNGKey(1)
    k_prep, k_run = jax.random.split(key)
    sstate = sampler.prepare(k_prep, C, dtype)
    STEPS = 32

    @jax.jit
    def chunk(key, sstate, stats_state):
        def body(carry, k):
            ss, st = carry
            ss, _ = sampler.draw(k, ss)
            st = stats_mod.record(st, qoi(ss.x))
            return (ss, st), None
        keys = jax.random.split(key, STEPS)
        (ss, st), _ = jax.lax.scan(body, (sstate, stats_state), keys)
        return ss, st

    stats_state = stats.init(C, dtype)
    k_run, sub = jax.random.split(k_run)
    sstate, stats_state = chunk(sub, sstate, stats_state)   # warm-up
    jax.block_until_ready(stats_state)
    stats_state = stats_mod.soft_reset(stats_state)

    n_chunks = 8
    t0 = time.monotonic()
    for _ in range(n_chunks):
        k_run, sub = jax.random.split(k_run)
        sstate, stats_state = chunk(sub, sstate, stats_state)
    jax.block_until_ready(stats_state)
    wall = time.monotonic() - t0
    n_samples = n_chunks * STEPS * C
    tau = stats.tau_int(stats_state)
    eff = n_samples / wall / tau
    base = _load_baseline("baseline_schwinger_cpu.json")
    vs = (eff / (base["eff_samples_per_sec"] * _ncores())
          if base else None)
    return {
        "bench": ("schwinger_heatbath_pallas" if use_pallas
                  else "schwinger_heatbath"),
        "Mt": Mt, "Mx": Mx, "beta": BETA,
        "n_chains": C,
        "samples_per_sec": round(n_samples / wall, 1),
        "tau_int": round(tau, 3),
        "avg_chit": round(stats.average(stats_state), 5),
        "oracle_chit": round(action.chit_exact(), 5),
        "eff_samples_per_sec": round(eff, 1),
        "vs_baseline": round(vs, 2) if vs else None,
    }


def bench_schwinger_mlmc():
    """Full multilevel Schwinger susceptibility — the BASELINE.json
    north-star configuration: estimate vs analytic oracle + wall-clock."""
    from mlmcpathintegral_tpu.conditioned.schwinger import (
        make_schwinger_conditioned_fine_action,
    )
    from mlmcpathintegral_tpu.lattice2d import CoarseningType, Lattice2D
    from mlmcpathintegral_tpu.mc import MonteCarloMultiLevel
    from mlmcpathintegral_tpu.models.base import RenormalisationType
    from mlmcpathintegral_tpu.models.qft.schwinger import (
        QuenchedSchwingerAction,
    )
    from mlmcpathintegral_tpu.qoi import qoi_2d_susceptibility
    from mlmcpathintegral_tpu.samplers import QuenchedSchwingerClusterSampler

    lat = Lattice2D(8, 8, CoarseningType.BOTH)
    act = QuenchedSchwingerAction(
        lat, beta=4.0, renormalisation=RenormalisationType.NONPERTURBATIVE)
    C, N_SAMPLES = 1024, 100_000
    mc = MonteCarloMultiLevel(
        act, qoi_2d_susceptibility,
        coarse_sampler_factory=lambda a: QuenchedSchwingerClusterSampler(
            a, n_burnin=20, n_updates=5),
        conditioned_fine_action_factory=make_schwinger_conditioned_fine_action,
        n_level=2, n_burnin=100, n_samples=N_SAMPLES, chunk_size=64)
    mc.evaluate(jax.random.PRNGKey(2), n_chains=C, dtype=jnp.float32)
    num = mc.numerical_result()
    err = mc.statistical_error()
    oracle = act.chit_exact()
    return {
        "bench": "schwinger_mlmc", "Mt": 8, "Mx": 8, "beta": 4.0,
        "n_level": 2, "n_chains": C, "n_samples_per_level": N_SAMPLES,
        "chit": round(num, 5), "err": round(err, 5),
        "oracle_chit": round(oracle, 5),
        "sigma_dev": round(abs(num - oracle) / err, 2),
        "wall_s": round(mc.elapsed_s, 2),
        "timings": {k: round(v, 2) for k, v in mc.timings.items()},
        "samples_per_sec": round(2 * N_SAMPLES / mc.elapsed_s, 1),
        "sampling_samples_per_sec": round(
            2 * N_SAMPLES / max(mc.timings["sampling_s"], 1e-9), 1),
    }


def main():
    # the first benchmark in the process gets the clean device (the tunnel
    # penalises later dispatch streams) — run the fused-kernel headline
    # candidate first
    pal = None
    if _BACKEND == "tpu":          # Mosaic path needs the real chip
        try:
            pal = bench_schwinger_pallas()
        except Exception as e:     # never lose the headline to the variant
            pal = {"error": repr(e)[:200]}
    sch = bench_schwinger()
    har = bench_harmonic()
    mlmc = bench_schwinger_mlmc()
    best = sch
    if pal and "eff_samples_per_sec" in pal \
            and pal["eff_samples_per_sec"] > sch["eff_samples_per_sec"]:
        best = pal
    base = _load_baseline("baseline_schwinger_cpu.json")
    vs = (best["eff_samples_per_sec"] / (base["eff_samples_per_sec"]
                                         * _ncores()) if base else None)
    result = {
        "metric": "effective_samples_per_sec_per_chip",
        "value": best["eff_samples_per_sec"],
        "unit": "eff_samples/s",
        "vs_baseline": round(vs, 2) if vs else None,
        "detail": {
            "headline": best["bench"],
            "schwinger": sch,
            "schwinger_pallas": pal,
            "harmonic": har,
            "schwinger_mlmc": mlmc,
            "backend": _BACKEND,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
