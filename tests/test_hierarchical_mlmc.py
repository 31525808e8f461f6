"""Hierarchical sampler + full MLMC integration tests against oracles."""

import jax
import jax.numpy as jnp
import pytest

from mlmcpathintegral_tpu.conditioned import make_conditioned_fine_action
from mlmcpathintegral_tpu.lattice import Lattice1D
from mlmcpathintegral_tpu.mc import (
    MonteCarloMultiLevel, MonteCarloSingleLevel,
)
from mlmcpathintegral_tpu.models import (
    HarmonicOscillatorAction, RenormalisationType, RotorAction,
)
from mlmcpathintegral_tpu.qoi import qoi_susceptibility, qoi_x_squared
from mlmcpathintegral_tpu.samplers.cluster import ClusterSampler
from mlmcpathintegral_tpu.samplers.exact import ExactSampler
from mlmcpathintegral_tpu.samplers.hierarchical import HierarchicalSampler


def test_hierarchical_sampler_harmonic():
    lat = Lattice1D(32, 4.0)
    act = HarmonicOscillatorAction(lat, RenormalisationType.NONPERTURBATIVE,
                                   m0=1.0, mu2=1.0)
    sampler = HierarchicalSampler(
        act, coarse_sampler_factory=ExactSampler,
        conditioned_fine_action_factory=make_conditioned_fine_action,
        n_max_level=3)
    mc = MonteCarloSingleLevel(act, qoi_x_squared(lat), sampler,
                               n_burnin=100, n_samples=6000, chunk_size=100)
    _, stats = mc.evaluate(jax.random.PRNGKey(0), n_chains=64,
                           dtype=jnp.float64)
    num = mc.numerical_result(stats)
    err = mc.statistical_error(stats)
    oracle = act.Xsquared_analytical()
    assert abs(num - oracle) < 4 * err, (num, oracle, err)
    # the delayed-acceptance chain should be nearly independent:
    assert mc.stats_Q.tau_int(stats) < 2.0


def test_hierarchical_sampler_rotor_tau_int_reduction():
    """README fig. 3 (left) claim: hierarchical sampling keeps tau_int flat
    where plain HMC autocorrelates — here we just check the hierarchical
    chain's tau_int on chi_t is small."""
    lat = Lattice1D(64, 4.0)
    act = RotorAction(lat, RenormalisationType.PERTURBATIVE, m0=1.0)
    sampler = HierarchicalSampler(
        act,
        coarse_sampler_factory=lambda a: ClusterSampler(a, n_burnin=50,
                                                        n_updates=5),
        conditioned_fine_action_factory=make_conditioned_fine_action,
        n_max_level=4)
    mc = MonteCarloSingleLevel(act, qoi_susceptibility(lat), sampler,
                               n_burnin=100, n_samples=8000,
                               n_autocorr_window=40, chunk_size=100)
    _, stats = mc.evaluate(jax.random.PRNGKey(1), n_chains=64,
                           dtype=jnp.float64)
    num = mc.numerical_result(stats)
    err = mc.statistical_error(stats)
    oracle = act.chit_exact()
    assert abs(num - oracle) < 4 * err, (num, oracle, err)
    assert mc.stats_Q.tau_int(stats) < 3.0


def test_mlmc_harmonic_matches_oracle():
    lat = Lattice1D(32, 4.0)
    act = HarmonicOscillatorAction(lat, RenormalisationType.NONPERTURBATIVE,
                                   m0=1.0, mu2=1.0)
    mc = MonteCarloMultiLevel(
        act, qoi_x_squared,
        coarse_sampler_factory=ExactSampler,
        conditioned_fine_action_factory=make_conditioned_fine_action,
        n_level=3, n_burnin=200, n_samples=8000, chunk_size=100)
    mc.evaluate(jax.random.PRNGKey(2), n_chains=32, dtype=jnp.float64)
    num = mc.numerical_result()
    err = mc.statistical_error()
    oracle = act.Xsquared_analytical()
    assert abs(num - oracle) < 4 * err, (num, oracle, err)


def test_mlmc_adaptive_epsilon_mode():
    lat = Lattice1D(16, 4.0)
    act = HarmonicOscillatorAction(lat, RenormalisationType.NONPERTURBATIVE,
                                   m0=1.0, mu2=1.0)
    eps = 0.01
    mc = MonteCarloMultiLevel(
        act, qoi_x_squared,
        coarse_sampler_factory=ExactSampler,
        conditioned_fine_action_factory=make_conditioned_fine_action,
        n_level=2, epsilon=eps, n_burnin=100, chunk_size=100)
    mc.evaluate(jax.random.PRNGKey(3), n_chains=32, dtype=jnp.float64)
    num = mc.numerical_result()
    oracle = act.Xsquared_analytical()
    assert mc.statistical_error() < eps
    assert abs(num - oracle) < 4 * max(mc.statistical_error(), 1e-4)
