"""Fused QM two-level chain kernel vs the unfused path and oracles.

The kernel (ops/pallas_qm_twolevel.py) fuses the tau-subsampled coarse
HMC chain, the Gaussian conditional fill and the three-term
delayed-acceptance screen (twolevelmetropolisstep.cc:35-89 +
gaussianconditionedfineaction.cc:7-43) into one VMEM program; these
tests run it in interpret mode on CPU against the harmonic analytic
oracle and the unfused MonteCarloTwoLevel on the double well.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mlmcpathintegral_tpu.conditioned import make_conditioned_fine_action
from mlmcpathintegral_tpu.lattice import Lattice1D
from mlmcpathintegral_tpu.mc import MonteCarloTwoLevel
from mlmcpathintegral_tpu.models import (
    HarmonicOscillatorAction, QuarticOscillatorAction, RenormalisationType,
)
from mlmcpathintegral_tpu.qoi import qoi_x_squared
from mlmcpathintegral_tpu.samplers import HMCSampler


def _mc(action, *, use_pallas, n_samples, seed=0, n_chains=256,
        chunk_size=32, nt=20):
    mc = MonteCarloTwoLevel(
        action, qoi_x_squared,
        coarse_sampler_factory=lambda a: HMCSampler(
            a, nt=nt, dt=0.1, n_burnin=50),
        conditioned_fine_action_factory=make_conditioned_fine_action,
        n_burnin=64, n_samples=n_samples, chunk_size=chunk_size,
        n_autocorr_window=20, n_coarse_autocorr_window=20,
        n_fine_autocorr_window=20, n_delta_autocorr_window=20,
        use_pallas=use_pallas, pallas_interpret=True, block_chains=64)
    stats = mc.evaluate_difference(jax.random.PRNGKey(seed),
                                   n_chains=n_chains, dtype=jnp.float64)
    return mc, stats


def test_fused_spec_detection():
    lat = Lattice1D(M_lat=16, T_final=2.0)
    act = HarmonicOscillatorAction(lat, m0=1.0, mu2=1.0)
    mc, _ = None, None
    mc = MonteCarloTwoLevel(
        act, qoi_x_squared,
        coarse_sampler_factory=lambda a: HMCSampler(a, nt=4, dt=0.1),
        conditioned_fine_action_factory=make_conditioned_fine_action,
        use_pallas=True, pallas_interpret=True)
    assert mc._fused_params is not None


def test_fused_harmonic_matches_oracle():
    """Fused two-level fine estimate vs the analytic <x^2>."""
    lat = Lattice1D(M_lat=16, T_final=2.0)
    act = HarmonicOscillatorAction(lat, m0=1.0, mu2=1.0)
    mc, stats = _mc(act, use_pallas=True, n_samples=96 * 256, seed=2)
    avg = mc.stats_fine.average(stats["fine"])
    err = mc.stats_fine.error(stats["fine"])
    oracle = act.Xsquared_analytical()
    assert abs(avg - oracle) < 4.0 * err
    assert mc.p_accept > 0.5
    # diff estimator is consistent with fine - coarse on its own chain
    d = mc.stats_diff.average(stats["diff"])
    de = mc.stats_diff.error(stats["diff"])
    f = mc.stats_fine.average(stats["fine"])
    c = mc.stats_coarse.average(stats["coarse"])
    assert abs(d - (f - c)) < 4.0 * np.hypot(de, 1e-12)


def test_fused_quartic_matches_unfused():
    """Fused vs unfused double-well two-level: fine averages and the
    screen acceptance agree within combined statistical errors."""
    lat = Lattice1D(M_lat=16, T_final=2.0)
    act = QuarticOscillatorAction(lat, RenormalisationType.NONE,
                                  m0=1.0, mu2=1.0, lam=1.0, x0=1.0)
    mc_f, st_f = _mc(act, use_pallas=True, n_samples=96 * 256, seed=3)
    mc_u, st_u = _mc(act, use_pallas=False, n_samples=96 * 256, seed=4)
    af, ef = (mc_f.stats_fine.average(st_f["fine"]),
              mc_f.stats_fine.error(st_f["fine"]))
    au, eu = (mc_u.stats_fine.average(st_u["fine"]),
              mc_u.stats_fine.error(st_u["fine"]))
    assert abs(af - au) < 4.0 * np.hypot(ef, eu)
    assert mc_f.p_accept == pytest.approx(mc_u.p_accept, abs=0.05)
    df = mc_f.stats_diff.average(st_f["diff"])
    du = mc_u.stats_diff.average(st_u["diff"])
    ed = np.hypot(mc_f.stats_diff.error(st_f["diff"]),
                  mc_u.stats_diff.error(st_u["diff"]))
    assert abs(df - du) < 4.0 * ed


def test_kernel_deterministic():
    from mlmcpathintegral_tpu.ops.pallas_qm_twolevel import qm_twolevel_chain
    C, Mc = 64, 8
    key = jax.random.PRNGKey(7)
    fine = jax.random.normal(key, (2, C, Mc), jnp.float32)
    xc = fine[0]
    scache = jnp.zeros((2, C), jnp.float32)
    args = dict(m0=1.0, mu2=1.0, lam=1.0, x0=1.0, a_lat=0.25, nt=5,
                n_steps=4, t_sub=2, block_chains=64, interpret=True)
    out1 = qm_twolevel_chain(fine, xc, scache, 0.1,
                             jnp.asarray([3, 5], jnp.int32), **args)
    out2 = qm_twolevel_chain(fine, xc, scache, 0.1,
                             jnp.asarray([3, 5], jnp.int32), **args)
    for a, b in zip(out1, out2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
