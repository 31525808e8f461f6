"""GFF action tests: stencil vs dense, spectral sampler exactness,
Gibbs-smoothed coarse action consistency, conditioned fill-in, and the
two-level method against the <phi^2> spectral oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mlmcpathintegral_tpu.conditioned.gff import GFFConditionedFineAction
from mlmcpathintegral_tpu.lattice2d import CoarseningType, Lattice2D
from mlmcpathintegral_tpu.mc import MonteCarloTwoLevel
from mlmcpathintegral_tpu.models.qft import GFFAction
from mlmcpathintegral_tpu.samplers.exact import ExactSampler


def qoi_phi_squared(action):
    def evaluate(phi):
        return jnp.mean(phi * phi, axis=-1)
    return evaluate


def test_evaluate_matches_dense_precision():
    lat = Lattice2D(6, 4, CoarseningType.ROTATE)
    act = GFFAction(lat, mass=1.5)
    phi = jax.random.normal(jax.random.PRNGKey(0), (3, lat.nvertices),
                            jnp.float64)
    Q = act._Q_precision
    expect = 0.5 * np.einsum("ci,ij,cj->c", np.asarray(phi), Q,
                             np.asarray(phi))
    np.testing.assert_allclose(np.asarray(act.evaluate(phi)), expect,
                               rtol=1e-12)


def test_force_equals_grad():
    lat = Lattice2D(4, 4, CoarseningType.BOTH)
    act = GFFAction(lat, mass=2.0)
    phi = jax.random.normal(jax.random.PRNGKey(1), (2, lat.nvertices),
                            jnp.float64)
    f = act.force(phi)
    g = jax.grad(lambda p: jnp.sum(act.evaluate(p)))(phi)
    np.testing.assert_allclose(np.asarray(f), np.asarray(g), rtol=1e-12)


def test_spectral_exact_draw_covariance():
    lat = Lattice2D(4, 4, CoarseningType.BOTH)
    act = GFFAction(lat, mass=4.0)
    phi = act.exact_draw(jax.random.PRNGKey(2), 200_000, jnp.float64)
    cov = np.cov(np.asarray(phi).T)
    expect = np.linalg.inv(act._Q_precision)
    np.testing.assert_allclose(cov, expect, atol=4e-3)


def test_rotated_dense_exact_draw_covariance():
    lat = Lattice2D(4, 4, CoarseningType.ROTATE, coarsening_level=1)
    act = GFFAction(lat, mass=4.0)
    phi = act.exact_draw(jax.random.PRNGKey(3), 200_000, jnp.float64)
    cov = np.cov(np.asarray(phi).T)
    expect = np.linalg.inv(act._Q_precision)
    np.testing.assert_allclose(cov, expect, atol=4e-3)


def test_smoothed_draw_covariance_matches_Q_hat():
    """The Gibbs-smoothed exact draw must have covariance Q_hat^-1 — the
    draw/evaluate consistency at the heart of the smoothed coarse action."""
    lat = Lattice2D(4, 4, CoarseningType.BOTH)
    act = GFFAction(lat, mass=4.0, n_gibbs_smooth=2, omega=1.0)
    phi = act.exact_draw(jax.random.PRNGKey(4), 300_000, jnp.float64)
    cov = np.cov(np.asarray(phi).T)
    expect = np.linalg.inv(act._Q_hat)
    np.testing.assert_allclose(cov, expect, atol=4e-3)


def test_phi_squared_analytical_vs_exact_draw():
    lat = Lattice2D(8, 8, CoarseningType.ROTATE)
    act = GFFAction(lat, mass=1.0)
    phi = act.exact_draw(jax.random.PRNGKey(5), 100_000, jnp.float64)
    phi2 = float(jnp.mean(phi * phi))
    assert phi2 == pytest.approx(act.phi_squared_analytical(), rel=2e-2)


def test_heatbath_sweep_preserves_distribution():
    lat = Lattice2D(6, 6, CoarseningType.BOTH)
    act = GFFAction(lat, mass=2.0)
    key = jax.random.PRNGKey(6)
    phi = act.exact_draw(key, 50_000, jnp.float64)
    for k in range(3):
        phi = act.heatbath_sweep(jax.random.fold_in(key, k), phi)
    phi2 = float(jnp.mean(phi * phi))
    assert phi2 == pytest.approx(act.phi_squared_analytical(), rel=2e-2)


def test_overrelaxation_preserves_distribution():
    lat = Lattice2D(6, 6, CoarseningType.BOTH)
    act = GFFAction(lat, mass=2.0)
    phi = act.exact_draw(jax.random.PRNGKey(7), 50_000, jnp.float64)
    phi = act.overrelaxation_sweep(phi)
    phi2 = float(jnp.mean(phi * phi))
    assert phi2 == pytest.approx(act.phi_squared_analytical(), rel=2e-2)


def test_smoothed_heatbath_targets_Q_hat():
    """The heat-bath sweep of a Gibbs-smoothed action must sample
    N(0, Q_hat^-1) — with the plain 5-point stencil sweep (what the
    reference uses even for its smoothed coarse action, gffaction.cc:33-42)
    the chain converges to the UNsmoothed distribution instead and the
    two-level acceptance ratio is computed against a different proposal
    density (the bias is visible in the reference's own gff_twolevel
    baseline log: fine <phi^2> 0.302 vs analytical 0.338)."""
    lat = Lattice2D(6, 6, CoarseningType.BOTH)
    act = GFFAction(lat, mass=4.0, n_gibbs_smooth=2, omega=1.0)
    expect = np.trace(np.linalg.inv(act._Q_hat)) / lat.nvertices
    naive = np.trace(np.linalg.inv(act._Q_precision)) / lat.nvertices
    assert abs(expect - naive) > 0.05 * abs(expect)  # test discriminates
    key = jax.random.PRNGKey(10)
    phi = jnp.zeros((20_000, lat.nvertices), jnp.float64)  # cold start
    for k in range(8):
        phi = act.heatbath_sweep(jax.random.fold_in(key, k), phi)
    phi2 = float(jnp.mean(phi * phi))
    assert phi2 == pytest.approx(expect, rel=2e-2)
    assert phi2 != pytest.approx(naive, rel=2e-2)


def test_smoothed_overrelaxation_preserves_Q_hat():
    lat = Lattice2D(6, 6, CoarseningType.BOTH)
    act = GFFAction(lat, mass=4.0, n_gibbs_smooth=2, omega=1.0)
    phi = act.exact_draw(jax.random.PRNGKey(11), 20_000, jnp.float64)
    phi = act.overrelaxation_sweep(phi)
    expect = np.trace(np.linalg.inv(act._Q_hat)) / lat.nvertices
    phi2 = float(jnp.mean(phi * phi))
    assert phi2 == pytest.approx(expect, rel=2e-2)


def test_prolongate_restrict_roundtrip():
    lat = Lattice2D(8, 8, CoarseningType.ROTATE)
    act = GFFAction(lat, mass=1.0)
    key = jax.random.PRNGKey(8)
    phic = jax.random.normal(key, (3, lat.coarse_lattice().nvertices),
                             jnp.float64)
    phif = jnp.zeros((3, lat.nvertices), jnp.float64)
    phif = act.prolongate(phic, phif)
    np.testing.assert_allclose(np.asarray(act.restrict(phif)),
                               np.asarray(phic))


def test_conditioned_fill_requires_rotate():
    lat = Lattice2D(8, 8, CoarseningType.BOTH)
    act = GFFAction(lat, mass=1.0)
    with pytest.raises(ValueError):
        GFFConditionedFineAction(act)


def test_twolevel_gff_phi_squared():
    """Two-level GFF with hierarchical fill-in vs the spectral <phi^2>
    oracle (BASELINE.md config 4)."""
    lat = Lattice2D(8, 8, CoarseningType.ROTATE)
    act = GFFAction(lat, mass=1.0)
    mc = MonteCarloTwoLevel(
        act, qoi_phi_squared,
        coarse_sampler_factory=ExactSampler,
        conditioned_fine_action_factory=GFFConditionedFineAction,
        n_burnin=100, n_samples=20000, chunk_size=100)
    stats = mc.evaluate_difference(jax.random.PRNGKey(9), n_chains=64,
                                   dtype=jnp.float64)
    fine_avg = mc.stats_fine.average(stats["fine"])
    fine_err = mc.stats_fine.error(stats["fine"])
    oracle = act.phi_squared_analytical()
    assert mc.p_accept > 0.5
    assert abs(fine_avg - oracle) < 4 * fine_err, \
        (fine_avg, oracle, fine_err, mc.p_accept)
    # variance reduction on the difference
    assert (mc.stats_diff.variance(stats["diff"])
            < 0.5 * mc.stats_fine.variance(stats["fine"]))
