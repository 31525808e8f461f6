"""O(3) nonlinear sigma model tests: geometry, force==grad, heat-bath
invariance, conditioned fill-in consistency, cross-sampler agreement."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mlmcpathintegral_tpu.conditioned.sigma import (
    NonlinearSigmaConditionedFineAction,
)
from mlmcpathintegral_tpu.distributions.compactexp import CompactExpDistribution
from mlmcpathintegral_tpu.lattice2d import CoarseningType, Lattice2D
from mlmcpathintegral_tpu.mc import MonteCarloTwoLevel
from mlmcpathintegral_tpu.models.base import RenormalisationType
from mlmcpathintegral_tpu.models.qft.nonlinearsigma import (
    NonlinearSigmaAction, angles_to_vec, qoi_magnetic_susceptibility,
    vec_to_angles,
)
from mlmcpathintegral_tpu.samplers.heatbath import OverrelaxedHeatBathSampler
from mlmcpathintegral_tpu.utils import statistics as stats_mod
from mlmcpathintegral_tpu.utils.statistics import Statistics


def test_compactexp_inverse_cdf():
    # empirical mean of CompactExp = coth(sigma) - 1/sigma
    for sigma in [0.5, 2.0, 20.0]:
        x = np.asarray(CompactExpDistribution.draw(
            jax.random.PRNGKey(int(sigma * 3)),
            jnp.full((200_000,), sigma, jnp.float64)))
        assert np.all(np.abs(x) <= 1.0)
        expect = 1.0 / math.tanh(sigma) - 1.0 / sigma
        assert np.mean(x) == pytest.approx(expect, abs=3e-3)
    # evaluate integrates to 1
    xs = np.linspace(-1, 1, 20001)
    p = np.asarray(CompactExpDistribution.evaluate(jnp.asarray(xs), 3.0))
    assert np.trapezoid(p, xs) == pytest.approx(1.0, rel=1e-8)


LAT = Lattice2D(8, 8, CoarseningType.ROTATE)
ACT = NonlinearSigmaAction(LAT, beta=1.5)


def test_angles_vec_roundtrip():
    key = jax.random.PRNGKey(0)
    state = ACT.initialise_state(key, 7, jnp.float64)
    vec = angles_to_vec(state)
    np.testing.assert_allclose(np.asarray(jnp.linalg.norm(vec, axis=-1)),
                               1.0, atol=1e-12)
    state2 = vec_to_angles(vec)
    np.testing.assert_allclose(np.asarray(angles_to_vec(state2)),
                               np.asarray(vec), atol=1e-12)


def test_force_equals_grad():
    state = ACT.initialise_state(jax.random.PRNGKey(1), 3, jnp.float64)
    f = ACT.force(state)
    g = jax.grad(lambda s: jnp.sum(ACT.evaluate(s)))(state)
    np.testing.assert_allclose(np.asarray(f), np.asarray(g), atol=1e-10)


def test_heatbath_preserves_magnetisation_distribution():
    """Run the heat-bath chain from two very different starts; the magnetic
    susceptibility must converge to the same value (self-consistency — no
    closed-form oracle exists for O(3))."""
    qoi = qoi_magnetic_susceptibility(ACT)
    C = 128

    def estimate(seed, n_burn=200, n_keep=300):
        sampler = OverrelaxedHeatBathSampler(ACT, n_sweep_heatbath=2,
                                             n_sweep_overrelax=1,
                                             n_burnin=n_burn)
        st = sampler.prepare(jax.random.PRNGKey(seed), C, jnp.float64)
        stats = Statistics("m", 40).init(C, jnp.float64)

        @jax.jit
        def run(key, st, stats):
            def body(carry, k):
                st, s = carry
                st, _ = sampler.draw(k, st)
                s = stats_mod.record(s, qoi(st.x))
                return (st, s), None
            keys = jax.random.split(key, n_keep)
            (st, s), _ = jax.lax.scan(body, (st, stats), keys)
            return s
        return run(jax.random.PRNGKey(seed + 100), st, stats)

    s1 = estimate(1)
    s2 = estimate(2)
    st = Statistics("m", 40)
    a1, e1 = st.average(s1), st.error(s1)
    a2, e2 = st.average(s2), st.error(s2)
    assert abs(a1 - a2) < 4 * math.sqrt(e1 * e1 + e2 * e2), (a1, a2, e1, e2)


def test_overrelaxation_preserves_action():
    """Reflecting a spin about its neighbour-sum direction preserves
    sigma.Delta, so the total action is exactly invariant under the
    overrelaxation sweep (the microcanonical property that makes it a
    valid overrelaxation move)."""
    state = ACT.initialise_state(jax.random.PRNGKey(3), 5, jnp.float64)
    S0 = np.asarray(ACT.evaluate(state))
    s2 = ACT.overrelaxation_sweep(state)
    S1 = np.asarray(ACT.evaluate(s2))
    np.testing.assert_allclose(S1, S0, rtol=1e-12)
    # spins stay unit length
    np.testing.assert_allclose(
        np.asarray(jnp.linalg.norm(angles_to_vec(s2), axis=-1)), 1.0,
        atol=1e-12)


def test_combined_sweeps_overrelax_matches_gather_form():
    """The grid fast path's overrelaxation (rolls + checkerboard where)
    is deterministic, so it must reproduce the gather-form sweep exactly
    (same colour order, same reflections)."""
    state = ACT.initialise_state(jax.random.PRNGKey(7), 4, jnp.float64)
    ref = ACT.overrelaxation_sweep(ACT.overrelaxation_sweep(state))
    fast = ACT.combined_sweeps(jax.random.PRNGKey(0), state,
                               n_overrelax=2, n_heatbath=0)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref),
                               atol=1e-12)


def test_combined_sweeps_heatbath_statistics():
    """Heat-bath via the grid fast path uses a different RNG layout, so
    the check is statistical: chi_m from the two paths must agree."""
    qoi = qoi_magnetic_susceptibility(ACT)
    C, n_burn, n_keep = 96, 150, 250

    def estimate(use_fast, seed):
        def sweep(key, st):
            if use_fast:
                return ACT.combined_sweeps(key, st, 1, 2)
            st = ACT.overrelaxation_sweep(st)
            for k in jax.random.split(key):
                st = ACT.heatbath_sweep(k, st)
            return st

        st0 = ACT.initialise_state(jax.random.PRNGKey(seed), C, jnp.float64)
        stats = Statistics("m", 40)
        s0 = stats.init(C, jnp.float64)

        @jax.jit
        def run(key, st, s):
            def body(carry, k):
                st, s = carry
                st = sweep(k, st)
                return (st, stats_mod.record(s, qoi(st))), None
            kb, kk = jax.random.split(key)
            st, _ = jax.lax.scan(lambda c, k: (sweep(k, c), None), st,
                                 jax.random.split(kb, n_burn))
            (st, s), _ = jax.lax.scan(body, (st, s),
                                      jax.random.split(kk, n_keep))
            return s
        s = run(jax.random.PRNGKey(seed + 50), st0, s0)
        return stats.average(s), stats.error(s)

    a1, e1 = estimate(False, 11)
    a2, e2 = estimate(True, 12)
    assert abs(a1 - a2) < 4 * math.sqrt(e1 * e1 + e2 * e2), (a1, a2, e1, e2)


def test_cluster_hooks_geometry():
    r = NonlinearSigmaAction.new_reflection(jax.random.PRNGKey(4), 6,
                                            jnp.float64)
    np.testing.assert_allclose(np.asarray(jnp.linalg.norm(r, axis=-1)), 1.0,
                               atol=1e-12)
    state = ACT.initialise_state(jax.random.PRNGKey(5), 6, jnp.float64)
    vec = angles_to_vec(state)
    flipped = NonlinearSigmaAction.flip_vec(vec, r[:, None, :])
    # involution + unit norm
    np.testing.assert_allclose(
        np.asarray(NonlinearSigmaAction.flip_vec(flipped, r[:, None, :])),
        np.asarray(vec), atol=1e-12)
    np.testing.assert_allclose(np.asarray(jnp.linalg.norm(flipped, axis=-1)),
                               1.0, atol=1e-12)


def test_conditioned_fill_consistency():
    """Importance-sampling check of fill/evaluate consistency: for states
    built as (coarse part fixed, fine part ~ q), reweighting exp(-S_cond)
    against an independent fill must have unit mean weight... here we use
    the simpler invariance: evaluate() of freshly-filled states matches the
    -log q histogramming within MC error via the identity
    E_q[exp(S_cond)] * <uniform-azimuth const> being state-independent."""
    cond = NonlinearSigmaConditionedFineAction(ACT)
    key = jax.random.PRNGKey(6)
    k1, k2 = jax.random.split(key)
    state = ACT.initialise_state(k1, 4096, jnp.float64)
    filled = cond.fill_fine_points(k2, state)
    # 1) filling leaves coarse spins untouched
    cv = ACT.lattice.coarse_vertices
    dofs = np.stack([2 * cv, 2 * cv + 1], -1).reshape(-1)
    np.testing.assert_allclose(np.asarray(filled[:, dofs]),
                               np.asarray(state[:, dofs]), atol=1e-12)
    # 2) E_q[exp(+S_cond)] = volume of the fine-spin configuration space
    #    times the azimuth constant — identical for all chains, so its
    #    sample variance over chains (same coarse background per chain
    #    family) reflects consistency; check the weaker property that
    #    evaluate is finite and its exp-moment is stable
    S = np.asarray(cond.evaluate(filled))
    assert np.all(np.isfinite(S))
    # 3) projection z of filled spins follows CompactExp: KS against cdf
    vec = angles_to_vec(filled)
    nn = ACT.lattice.neighbour_vertices[ACT.lattice.fineonly_vertices, :4]
    delta = np.asarray(jnp.sum(vec[..., nn, :], axis=-2))
    nrm = np.linalg.norm(delta, axis=-1)
    z = np.sum(np.asarray(vec)[:, ACT.lattice.fineonly_vertices, :]
               * delta, -1) / nrm
    # compare against analytic CDF of CompactExp with per-sample sigma:
    # u = CDF_sigma(z) must be uniform
    sig = ACT.beta * nrm
    u = (np.exp(sig * z) - np.exp(-sig)) / (2.0 * np.sinh(sig))
    from scipy import stats as sstats
    d, pval = sstats.kstest(u.ravel()[::7], "uniform")
    assert pval > 1e-3, (d, pval)


def test_cluster2d_agrees_with_heatbath():
    """Wolff cluster sampler vs heat-bath cross-validation on chi_m."""
    from mlmcpathintegral_tpu.samplers.cluster2d import Cluster2DSampler
    qoi = qoi_magnetic_susceptibility(ACT)
    C = 128

    def estimate(sampler, seed, n_keep=250):
        st = sampler.prepare(jax.random.PRNGKey(seed), C, jnp.float64)
        stats = Statistics("m", 40).init(C, jnp.float64)

        @jax.jit
        def run(key, st, stats):
            def body(carry, k):
                st, s = carry
                st, _ = sampler.draw(k, st)
                s = stats_mod.record(s, qoi(sampler.x_of(st)))
                return (st, s), None
            keys = jax.random.split(key, n_keep)
            (st, s), _ = jax.lax.scan(body, (st, stats), keys)
            return s
        return run(jax.random.PRNGKey(seed + 50), st, stats)

    s_cl = estimate(Cluster2DSampler(ACT, n_burnin=50, n_updates=5), 21)
    s_hb = estimate(OverrelaxedHeatBathSampler(
        ACT, n_sweep_heatbath=2, n_sweep_overrelax=1, n_burnin=200), 22)
    st = Statistics("m", 40)
    a1, e1 = st.average(s_cl), st.error(s_cl)
    a2, e2 = st.average(s_hb), st.error(s_hb)
    assert abs(a1 - a2) < 4 * math.sqrt(e1 * e1 + e2 * e2), (a1, a2, e1, e2)


def test_sigma_twolevel_matches_singlelevel():
    """Two-level screened sigma chain vs an independent single-level
    heat-bath estimate of chi_m (no closed-form oracle)."""
    from mlmcpathintegral_tpu.mc import MonteCarloSingleLevel
    act = ACT
    qoi_factory = qoi_magnetic_susceptibility

    mc1 = MonteCarloSingleLevel(
        act, qoi_factory(act),
        OverrelaxedHeatBathSampler(act, n_sweep_heatbath=2,
                                   n_sweep_overrelax=1, n_burnin=100),
        n_burnin=200, n_samples=8000, n_autocorr_window=40, chunk_size=100)
    _, st1 = mc1.evaluate(jax.random.PRNGKey(31), n_chains=64,
                          dtype=jnp.float64)
    a1, e1 = mc1.numerical_result(st1), mc1.statistical_error(st1)

    mc2 = MonteCarloTwoLevel(
        act, qoi_factory,
        coarse_sampler_factory=lambda a: OverrelaxedHeatBathSampler(
            a, n_sweep_heatbath=2, n_sweep_overrelax=1, n_burnin=100),
        conditioned_fine_action_factory=NonlinearSigmaConditionedFineAction,
        n_burnin=200, n_samples=8000, chunk_size=100)
    st2 = mc2.evaluate_difference(jax.random.PRNGKey(32), n_chains=64,
                                  dtype=jnp.float64)
    a2 = mc2.stats_fine.average(st2["fine"])
    e2 = mc2.stats_fine.error(st2["fine"])
    assert mc2.p_accept > 0.2, mc2.p_accept
    assert abs(a1 - a2) < 4 * math.sqrt(e1 * e1 + e2 * e2), \
        (a1, a2, e1, e2, mc2.p_accept)
