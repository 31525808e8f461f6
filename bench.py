"""Benchmark: effective samples/sec of the batched HMC chain engine on the
harmonic oscillator (the reference's canonical single-level config,
BASELINE.md config 1).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

effective samples/sec = (chains x steps/sec) / tau_int — the 1/tau_int-
weighted throughput of statistically independent samples (BASELINE.json).
``vs_baseline`` compares against the reference-equivalent C++ single-chain
HMC measured on this host's CPU (baselines/baseline_hmc.cc, itself a
faithful re-implementation of src/sampler/hmcsampler.cc because Eigen/GSL
are unavailable to build the reference directly), scaled to all host cores
— i.e. the aggregate throughput of the MPI build on this machine.
"""

import json
import os
import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp

REPO = Path(__file__).resolve().parent


def main():
    from mlmcpathintegral_tpu.lattice import Lattice1D
    from mlmcpathintegral_tpu.models import HarmonicOscillatorAction
    from mlmcpathintegral_tpu.qoi import qoi_x_squared
    from mlmcpathintegral_tpu.samplers import HMCSampler
    from mlmcpathintegral_tpu.utils import statistics as stats_mod
    from mlmcpathintegral_tpu.utils.statistics import Statistics

    M, C, NT = 64, 8192, 20
    K_MAX = 40
    dtype = jnp.float32

    lat = Lattice1D(M_lat=M, T_final=4.0)
    action = HarmonicOscillatorAction(lat, m0=1.0, mu2=1.0)
    sampler = HMCSampler(action, nt=NT, dt=0.1, n_burnin=50)
    qoi = qoi_x_squared(lat)
    stats = Statistics("Q", K_MAX)

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
    # warm-up (compile + decorrelate)
    k_run, sub = jax.random.split(k_run)
    sstate, stats_state, _ = chunk(sub, sstate, stats_state)
    jax.block_until_ready(stats_state)
    stats_state = stats_mod.soft_reset(stats_state)

    n_chunks = 8
    t0 = time.monotonic()
    n_acc = 0
    for _ in range(n_chunks):
        k_run, sub = jax.random.split(k_run)
        sstate, stats_state, acc = chunk(sub, sstate, stats_state)
    jax.block_until_ready(stats_state)
    wall = time.monotonic() - t0

    n_samples = n_chunks * STEPS * C
    tau = stats.tau_int(stats_state)
    avg = stats.average(stats_state)
    sps = n_samples / wall
    eff = sps / tau

    # reference baseline: single-core C++ x all host cores
    vs_baseline = None
    base_file = REPO / "baselines" / "baseline_cpu.json"
    ncores_file = REPO / "baselines" / "ncores.txt"
    if base_file.exists():
        base = json.loads(base_file.read_text())
        ncores = int(ncores_file.read_text()) if ncores_file.exists() else 1
        ref_eff = base["eff_samples_per_sec"] * ncores
        vs_baseline = eff / ref_eff

    oracle = action.Xsquared_analytical()
    result = {
        "metric": "effective_samples_per_sec_per_chip",
        "value": round(eff, 1),
        "unit": "eff_samples/s",
        "vs_baseline": round(vs_baseline, 2) if vs_baseline else None,
        "detail": {
            "bench": "hmc_harmonic_singlelevel",
            "M": M, "n_chains": C, "nt": NT,
            "samples_per_sec": round(sps, 1),
            "tau_int": round(tau, 3),
            "avg_x2": round(avg, 5),
            "oracle_x2": round(oracle, 5),
            "dt_tuned": round(float(sstate.dt), 5),
            "backend": jax.default_backend(),
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
