"""One-off performance probe on the real TPU.

Sweeps the headline Schwinger heat-bath benchmark over chain counts and
breaks the MLMC bench into compile vs steady-state time, to pick the
bench.py operating point.  Run alone (the TPU tunnel is single-client).
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  str(Path(__file__).resolve().parent.parent / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.05)


def probe_schwinger(C):
    from mlmcpathintegral_tpu.lattice2d import CoarseningType, Lattice2D
    from mlmcpathintegral_tpu.models.qft.schwinger import (
        QuenchedSchwingerAction,
    )
    from mlmcpathintegral_tpu.qoi import qoi_2d_susceptibility
    from mlmcpathintegral_tpu.samplers import OverrelaxedHeatBathSampler
    from mlmcpathintegral_tpu.utils import statistics as stats_mod
    from mlmcpathintegral_tpu.utils.statistics import Statistics

    lat = Lattice2D(8, 8, CoarseningType.BOTH)
    action = QuenchedSchwingerAction(lat, beta=4.0)
    sampler = OverrelaxedHeatBathSampler(action, 1, 1, n_burnin=100)
    qoi = qoi_2d_susceptibility(action)
    stats = Statistics("chit", 40)
    key = jax.random.PRNGKey(1)
    k_prep, k_run = jax.random.split(key)
    t0 = time.monotonic()
    sstate = sampler.prepare(k_prep, C, jnp.float32)
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

    stats_state = stats.init(C, jnp.float32)
    k_run, sub = jax.random.split(k_run)
    sstate, stats_state = chunk(sub, sstate, stats_state)
    jax.block_until_ready(stats_state)
    t_compile = time.monotonic() - t0
    stats_state = stats_mod.soft_reset(stats_state)
    n_chunks = 8
    t0 = time.monotonic()
    for _ in range(n_chunks):
        k_run, sub = jax.random.split(k_run)
        sstate, stats_state = chunk(sub, sstate, stats_state)
    jax.block_until_ready(stats_state)
    wall = time.monotonic() - t0
    n = n_chunks * STEPS * C
    tau = stats.tau_int(stats_state)
    print(json.dumps({
        "probe": "schwinger_heatbath", "C": C,
        "prep_compile_s": round(t_compile, 2),
        "samples_per_sec": round(n / wall, 0),
        "tau_int": round(tau, 2),
        "eff_samples_per_sec": round(n / wall / tau, 0),
        "chit": round(stats.average(stats_state), 5),
    }), flush=True)


def probe_schwinger_pallas(C):
    """Fused Pallas sweep vs the XLA sweep on the headline config."""
    from mlmcpathintegral_tpu.lattice2d import CoarseningType, Lattice2D
    from mlmcpathintegral_tpu.models.qft.schwinger import (
        QuenchedSchwingerAction,
    )
    from mlmcpathintegral_tpu.ops.pallas_schwinger import schwinger_sweep
    from mlmcpathintegral_tpu.qoi import qoi_2d_susceptibility
    from mlmcpathintegral_tpu.utils import statistics as stats_mod
    from mlmcpathintegral_tpu.utils.statistics import Statistics

    Mt, Mx, BETA = 8, 8, 4.0
    lat = Lattice2D(Mt, Mx, CoarseningType.BOTH)
    action = QuenchedSchwingerAction(lat, beta=BETA)
    qoi = qoi_2d_susceptibility(action)
    stats = Statistics("chit", 40)
    STEPS = 32

    t0 = time.monotonic()
    theta = jax.random.uniform(jax.random.PRNGKey(3), (C, lat.nedges),
                               jnp.float32, -3.14159, 3.14159)

    @jax.jit
    def chunk(seed0, theta, stats_state):
        def body(carry, seed):
            th, st = carry
            th = schwinger_sweep(th, seed, beta=BETA, Mt=Mt, Mx=Mx,
                                 block_chains=min(C, 1024))
            st = stats_mod.record(st, qoi(th))
            return (th, st), None
        (th, st), _ = jax.lax.scan(body, (theta, stats_state),
                                   seed0 + jnp.arange(STEPS, dtype=jnp.int32))
        return th, st

    stats_state = stats.init(C, jnp.float32)
    for k in range(4):   # burn-in ~128 steps
        theta, stats_state = chunk(jnp.int32(1000 * k), theta, stats_state)
    jax.block_until_ready(stats_state)
    t_compile = time.monotonic() - t0
    stats_state = stats_mod.soft_reset(stats_state)
    n_chunks = 8
    t0 = time.monotonic()
    for k in range(n_chunks):
        theta, stats_state = chunk(jnp.int32(7777 + 100 * k), theta,
                                   stats_state)
    jax.block_until_ready(stats_state)
    wall = time.monotonic() - t0
    n = n_chunks * STEPS * C
    tau = stats.tau_int(stats_state)
    print(json.dumps({
        "probe": "schwinger_heatbath_pallas", "C": C,
        "prep_compile_s": round(t_compile, 2),
        "samples_per_sec": round(n / wall, 0),
        "tau_int": round(tau, 2),
        "eff_samples_per_sec": round(n / wall / tau, 0),
        "chit": round(stats.average(stats_state), 5),
    }), flush=True)


def probe_mlmc():
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
    t0 = time.monotonic()
    mc = MonteCarloMultiLevel(
        act, qoi_2d_susceptibility,
        coarse_sampler_factory=lambda a: QuenchedSchwingerClusterSampler(
            a, n_burnin=20, n_updates=5),
        conditioned_fine_action_factory=make_schwinger_conditioned_fine_action,
        n_level=2, n_burnin=100, n_samples=100_000, chunk_size=64)
    t_build = time.monotonic() - t0
    t0 = time.monotonic()
    mc.evaluate(jax.random.PRNGKey(2), n_chains=1024, dtype=jnp.float32)
    t_eval = time.monotonic() - t0
    print(json.dumps({
        "probe": "schwinger_mlmc", "build_s": round(t_build, 2),
        "eval_s": round(t_eval, 2),
        "timings": {k: round(v, 2) for k, v in mc.timings.items()},
        "cost_per_sample_us": [round(c, 3) for c in mc.cost_per_sample],
        "chit": round(mc.numerical_result(), 5),
        "err": round(mc.statistical_error(), 5),
    }), flush=True)


def probe_gff_pallas(C):
    """Fused Pallas GFF sweep compiled on the real chip, vs the phi^2
    oracle."""
    from mlmcpathintegral_tpu.lattice2d import CoarseningType, Lattice2D
    from mlmcpathintegral_tpu.models.qft.gff import GFFAction
    from mlmcpathintegral_tpu.ops.pallas_gff import gff_sweep
    from mlmcpathintegral_tpu.qoi import qoi_2d_phi_squared
    from mlmcpathintegral_tpu.utils import statistics as stats_mod
    from mlmcpathintegral_tpu.utils.statistics import Statistics

    Mt, Mx, MASS = 16, 16, 1.0
    lat = Lattice2D(Mt, Mx, CoarseningType.BOTH)
    act = GFFAction(lat, mass=MASS)
    qoi = qoi_2d_phi_squared(act)
    kappa = 4.0 + act.mu2
    stats = Statistics("phi2", 40)
    STEPS = 64
    t0 = time.monotonic()
    phi = jnp.zeros((C, lat.nvertices), jnp.float32)

    @jax.jit
    def chunk(seed0, phi, stats_state):
        def body(carry, seed):
            ph, st = carry
            ph = gff_sweep(ph, seed, kappa=kappa, Mt=Mt, Mx=Mx,
                           n_overrelax=1, n_heatbath=1,
                           block_chains=min(C, 1024))
            st = stats_mod.record(st, qoi(ph))
            return (ph, st), None
        (ph, st), _ = jax.lax.scan(body, (phi, stats_state),
                                   seed0 + jnp.arange(STEPS, dtype=jnp.int32))
        return ph, st

    stats_state = stats.init(C, jnp.float32)
    for k in range(2):
        phi, stats_state = chunk(jnp.int32(1000 * k), phi, stats_state)
    jax.block_until_ready(stats_state)
    t_compile = time.monotonic() - t0
    stats_state = stats_mod.soft_reset(stats_state)
    n_chunks = 8
    t0 = time.monotonic()
    for k in range(n_chunks):
        # stride > STEPS: chunk seed ranges must not overlap (each scan
        # step consumes seed0 + step_index)
        phi, stats_state = chunk(jnp.int32(5000 + 1000 * k), phi,
                                 stats_state)
    jax.block_until_ready(stats_state)
    wall = time.monotonic() - t0
    n = n_chunks * STEPS * C
    tau = stats.tau_int(stats_state)
    print(json.dumps({
        "probe": "gff_heatbath_pallas", "C": C, "Mt": Mt, "Mx": Mx,
        "prep_compile_s": round(t_compile, 2),
        "samples_per_sec": round(n / wall, 0),
        "tau_int": round(tau, 2),
        "eff_samples_per_sec": round(n / wall / tau, 0),
        "phi2": round(stats.average(stats_state), 5),
        "oracle_phi2": round(act.phi_squared_analytical(), 5),
    }), flush=True)


def probe_hmc_pallas(C):
    """Fused Pallas HMC trajectory (ops/pallas_hmc.py) on the harmonic
    bench config, compiled on the real chip."""
    from mlmcpathintegral_tpu.lattice import Lattice1D
    from mlmcpathintegral_tpu.models import HarmonicOscillatorAction
    from mlmcpathintegral_tpu.qoi import qoi_x_squared
    from mlmcpathintegral_tpu.samplers import HMCSampler
    from mlmcpathintegral_tpu.utils import statistics as stats_mod
    from mlmcpathintegral_tpu.utils.statistics import Statistics

    M, NT = 64, 20
    lat = Lattice1D(M_lat=M, T_final=4.0)
    action = HarmonicOscillatorAction(lat, m0=1.0, mu2=1.0)
    sampler = HMCSampler(action, nt=NT, dt=0.1, n_burnin=50,
                         use_pallas=True, block_chains=min(C, 1024))
    qoi = qoi_x_squared(lat)
    stats = Statistics("Q", 40)
    key = jax.random.PRNGKey(0)
    k_prep, k_run = jax.random.split(key)
    t0 = time.monotonic()
    sstate = sampler.prepare(k_prep, C, jnp.float32)
    STEPS = 64

    @jax.jit
    def chunk(key, sstate, stats_state):
        def body(carry, k):
            ss, st = carry
            ss, acc = sampler.draw(k, ss)
            st = stats_mod.record(st, qoi(ss.x))
            return (ss, st), None
        keys = jax.random.split(key, STEPS)
        (ss, st), _ = jax.lax.scan(body, (sstate, stats_state), keys)
        return ss, st

    stats_state = stats.init(C, jnp.float32)
    k_run, sub = jax.random.split(k_run)
    sstate, stats_state = chunk(sub, sstate, stats_state)
    jax.block_until_ready(stats_state)
    t_compile = time.monotonic() - t0
    stats_state = stats_mod.soft_reset(stats_state)
    n_chunks = 8
    t0 = time.monotonic()
    for _ in range(n_chunks):
        k_run, sub = jax.random.split(k_run)
        sstate, stats_state = chunk(sub, sstate, stats_state)
    jax.block_until_ready(stats_state)
    wall = time.monotonic() - t0
    n = n_chunks * STEPS * C
    tau = stats.tau_int(stats_state)
    print(json.dumps({
        "probe": "hmc_harmonic_pallas", "C": C,
        "prep_compile_s": round(t_compile, 2),
        "samples_per_sec": round(n / wall, 0),
        "tau_int": round(tau, 2),
        "eff_samples_per_sec": round(n / wall / tau, 0),
        "avg_x2": round(stats.average(stats_state), 5),
    }), flush=True)


def probe_verify_gff():
    """Compiled-on-chip vs XLA reference for the deterministic overrelax
    sweep and the raw neighbour-sum, at one- and two-sublane-tile Mt."""
    import functools

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from mlmcpathintegral_tpu.lattice2d import CoarseningType, Lattice2D
    from mlmcpathintegral_tpu.models.qft.gff import GFFAction
    from mlmcpathintegral_tpu.ops import pallas_gff

    for Mt, Mx in ((8, 8), (16, 16), (16, 8), (8, 16)):
        C = 256
        lat = Lattice2D(Mt, Mx, CoarseningType.BOTH)
        act = GFFAction(lat, mass=1.0)
        phi = jax.random.normal(jax.random.PRNGKey(5), (C, lat.nvertices),
                                jnp.float32)
        ref = act.overrelaxation_sweep(phi)
        out = pallas_gff.gff_sweep(phi, 0, kappa=4.0 + act.mu2, Mt=Mt,
                                   Mx=Mx, n_overrelax=1, n_heatbath=0,
                                   block_chains=C)
        err = float(jnp.max(jnp.abs(out - ref)))

        # raw neighbour sum through the same layout/rolls
        def nb_kernel(x_ref, o_ref, *, Mt):
            o_ref[:] = pallas_gff._nbsum(x_ref[:], Mt)

        g = phi.reshape(C, Mx, Mt).transpose(1, 2, 0)
        nb = pl.pallas_call(
            functools.partial(nb_kernel, Mt=Mt),
            out_shape=jax.ShapeDtypeStruct((Mx, Mt, C), jnp.float32),
        )(g)
        nb = nb.transpose(2, 0, 1).reshape(C, Mx * Mt)
        nb_ref = act._nbsum(phi)
        err_nb = float(jnp.max(jnp.abs(nb - nb_ref)))
        print(json.dumps({"probe": "verify_gff", "Mt": Mt, "Mx": Mx,
                          "overrelax_max_err": err,
                          "nbsum_max_err": err_nb}), flush=True)


def probe_verify_rng():
    """Compiled-on-chip vs interpret-mode CounterRng streams (identical by
    construction) + moments of the uniforms/normals."""
    import functools

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from mlmcpathintegral_tpu.ops.pallas_rng import CounterRng, element_ids

    shape = (8, 8, 512)

    def rng_kernel(seed_ref, u_ref, n_ref):
        elem = element_ids(shape, shape[-1], pl.program_id(0))
        rng = CounterRng(seed_ref[0].astype(jnp.uint32), elem)
        u_ref[:] = rng.uniform(jnp.float32)
        n_ref[:] = rng.normal(jnp.float32)

    def run(interpret):
        return pl.pallas_call(
            rng_kernel,
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=[pl.BlockSpec(shape, lambda i: (0, 0, 0),
                                    memory_space=pltpu.VMEM)] * 2,
            out_shape=[jax.ShapeDtypeStruct(shape, jnp.float32)] * 2,
            interpret=interpret,
        )(jnp.asarray([42], jnp.int32))

    u_c, n_c = run(False)
    u_i, n_i = run(True)
    import numpy as np
    u_c, n_c, u_i, n_i = map(np.asarray, (u_c, n_c, u_i, n_i))
    print(json.dumps({
        "probe": "verify_rng",
        "u_match": float(np.max(np.abs(u_c - u_i))),
        "n_match": float(np.max(np.abs(n_c - n_i))),
        "u_mean": round(float(u_c.mean()), 5),
        "u_var": round(float(u_c.var()), 5),
        "n_mean": round(float(n_c.mean()), 5),
        "n_var": round(float(n_c.var()), 5),
        "u_mean_interp": round(float(u_i.mean()), 5),
        "n_var_interp": round(float(n_i.var()), 5),
    }), flush=True)


if __name__ == "__main__":
    import os
    which = os.environ.get("PROBE", "all")
    if which in ("all", "xla"):
        for C in (2048, 4096, 8192):
            probe_schwinger(C)
    if which in ("all", "pallas"):
        for C in (4096, 16384):
            probe_schwinger_pallas(C)
    if which in ("all", "hmc_pallas"):
        probe_hmc_pallas(8192)
    if which in ("all", "gff"):
        probe_gff_pallas(4096)
    if which == "verify_gff":
        probe_verify_gff()
    if which == "verify_rng":
        probe_verify_rng()
    if which in ("all", "mlmc"):
        probe_mlmc()
