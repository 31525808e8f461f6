"""Fused Pallas two-level Schwinger kernel vs the XLA reference path.

Deterministic pieces (parity-component geometry, action values, the
conditioned-action evaluate) are bit-compared against the model /
conditioned XLA implementations; the in-kernel special functions are
compared against scipy; the full fused chain (interpret mode) is driven
against BOTH analytic oracles: E[Q_fine] = V chi_t(beta, P) because the
delayed-acceptance chain targets the fine Gibbs measure, and
E[Q_coarse] = V chi_t(beta_c, P/4) for the coarse heat-bath chain.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy import special as ssp

from mlmcpathintegral_tpu.conditioned.schwinger import (
    QuenchedSchwingerConditionedFineAction,
)
from mlmcpathintegral_tpu.lattice2d import CoarseningType, Lattice2D
from mlmcpathintegral_tpu.models.qft.schwinger import (
    QuenchedSchwingerAction, chit_analytical,
)
from mlmcpathintegral_tpu.ops import pallas_schwinger_twolevel as tl

PI = math.pi


def _random_links(key, C, lat, dtype=jnp.float32):
    return jax.random.uniform(key, (C, lat.nedges), dtype, -PI, PI)


def _setup(Mt=8, Mx=8, beta=4.0, C=16):
    lat = Lattice2D(Mt, Mx, CoarseningType.BOTH)
    act = QuenchedSchwingerAction(lat, beta=beta)
    theta = _random_links(jax.random.PRNGKey(0), C, lat)
    return lat, act, theta


def test_split_merge_roundtrip():
    lat, act, theta = _setup()
    g = theta.reshape(theta.shape[0], lat.Mx_lat, lat.Mt_lat, 2)
    comps = tl.split_parity(g)
    back = tl.merge_parity(comps)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(g))


def test_s_fine_and_qoi_match_action():
    lat, act, theta = _setup()
    g = theta.reshape(theta.shape[0], lat.Mx_lat, lat.Mt_lat, 2)
    comps = tuple(tl.split_parity(g))
    sf = tl.s_fine(comps, act.beta, tl.jnp_sh)
    np.testing.assert_allclose(np.asarray(sf),
                               np.asarray(act.evaluate(theta)),
                               rtol=2e-6)
    from mlmcpathintegral_tpu.utils.special import mod_2pi
    q_ref = jnp.sum(mod_2pi(act.plaquette_angles(theta)), axis=(-2, -1))
    q = tl.q_topological(comps, tl.jnp_sh)
    np.testing.assert_allclose(np.asarray(q), np.asarray(q_ref),
                               rtol=0, atol=1e-4)


def test_restrict_matches_action():
    lat, act, theta = _setup()
    C = theta.shape[0]
    g = theta.reshape(C, lat.Mx_lat, lat.Mt_lat, 2)
    comps = tuple(tl.split_parity(g))
    Tc, Xc = tl.restrict_comps(comps)
    coarse = jnp.stack([Tc, Xc], axis=0).transpose(3, 1, 2, 0) \
        .reshape(C, lat.nedges // 4)
    np.testing.assert_allclose(np.asarray(coarse),
                               np.asarray(act.restrict(theta)),
                               rtol=0, atol=2e-6)


def test_s_coarse_matches_coarse_action():
    lat, act, theta = _setup()
    cact = act.coarse_action()
    clat = cact.lattice
    C = theta.shape[0]
    theta_c = _random_links(jax.random.PRNGKey(3), C, clat)
    gc = theta_c.reshape(C, clat.Mx_lat, clat.Mt_lat, 2) \
        .transpose(3, 1, 2, 0)
    sc = tl.s_coarse(gc[0], gc[1], cact.beta, tl.jnp_sh)
    np.testing.assert_allclose(np.asarray(sc),
                               np.asarray(cact.evaluate(theta_c)),
                               rtol=2e-6)
    from mlmcpathintegral_tpu.utils.special import mod_2pi
    qc_ref = jnp.sum(mod_2pi(cact.plaquette_angles(theta_c)),
                     axis=(-2, -1))
    qc = tl.q_coarse(gc[0], gc[1], tl.jnp_sh)
    np.testing.assert_allclose(np.asarray(qc), np.asarray(qc_ref),
                               rtol=0, atol=1e-4)


def test_s_cond_matches_conditioned_evaluate():
    lat, act, theta = _setup()
    cond = QuenchedSchwingerConditionedFineAction(act)
    g = theta.reshape(theta.shape[0], lat.Mx_lat, lat.Mt_lat, 2)
    comps = tuple(tl.split_parity(g))
    alphas = tuple(float(a) for a in cond.bessel.alphaZ[1:])
    sq = tl.s_cond(comps, act.beta, alphas, tl.jnp_sh)
    np.testing.assert_allclose(np.asarray(sq),
                               np.asarray(cond.evaluate(theta)),
                               rtol=3e-5, atol=3e-4)


def test_kernel_special_functions():
    x = jnp.linspace(-4.0, 4.0, 401, dtype=jnp.float64)
    np.testing.assert_allclose(np.asarray(tl.kernel_erf(x)),
                               ssp.erf(np.asarray(x)), atol=2e-7)
    z = jnp.concatenate([jnp.linspace(0.0, 3.74, 100),
                         jnp.linspace(3.76, 40.0, 100)]).astype(jnp.float64)
    ref = np.log(ssp.i0e(np.asarray(z))) + np.asarray(z)
    got = np.asarray(tl.kernel_log_i0(z))
    np.testing.assert_allclose(got, ref, rtol=5e-7, atol=5e-7)


@pytest.mark.parametrize("beta", [4.0, 1.0, 0.25])
def test_bessel_fill_draw_density(beta):
    """The truncated in-kernel BesselProduct draw must match the
    distribution's own evaluate: accepted lanes are exactly q-distributed
    (KS test against the numerically-integrated CDF).  Small beta guards
    the envelope side-selection fix (both pieces comparable there)."""
    from mlmcpathintegral_tpu.distributions.besselproduct import (
        BesselProductDistribution,
    )
    from mlmcpathintegral_tpu.ops.pallas_rng import CounterRng

    bp = BesselProductDistribution(beta)
    x_p, x_m = 0.7, -1.3
    N = 4096
    shape = (1, N)
    site = jnp.zeros(shape, jnp.uint32)
    chain = jnp.arange(N, dtype=jnp.uint32)[None, :]
    rng = CounterRng(jnp.uint32(99), site, chain, jnp.uint32(7))
    x, ok = tl._bessel_draw(
        rng, jnp.full(shape, x_p, jnp.float32),
        jnp.full(shape, x_m, jnp.float32), beta,
        bp.log_I0_twobeta, bp.sigma_beta, 16, jnp.float32)
    ok = np.asarray(ok)[0]
    x = np.asarray(x)[0][ok]
    assert ok.mean() > 0.999, f"fill failure rate too high: {1-ok.mean()}"

    # numeric CDF of p(t | x_p, x_m) on [-pi+x_p, pi+x_p) shifted frame
    ts = np.linspace(-PI, PI, 4001)
    dens = np.asarray(bp.evaluate(jnp.asarray(ts + 0.0), x_p, x_m))
    # evaluate at absolute angle: wrap samples into [-pi, pi)
    xs = np.mod(x + PI, 2 * PI) - PI
    cdf = np.cumsum(dens)
    cdf /= cdf[-1]
    emp = np.searchsorted(np.sort(xs), ts) / len(xs)
    ks = np.max(np.abs(emp - cdf))
    assert ks < 2.0 / math.sqrt(len(xs)), ks


@pytest.mark.parametrize("BETA", [4.0, 16.0])
def test_fill_distribution_matches_xla_fill(BETA):
    """Given the SAME coarse sample on every lane, the kernel fill and the
    XLA conditioned fill must produce the same trial distribution —
    compared through the scalar projections S_cond and S_fine.  BETA=16
    exercises the large-beta Gaussian-mixture branch."""
    Mt, Mx, C = 8, 8, 2048
    lat = Lattice2D(Mt, Mx, CoarseningType.BOTH)
    act = QuenchedSchwingerAction(lat, beta=BETA)
    cact = act.coarse_action()
    cond = QuenchedSchwingerConditionedFineAction(act)

    key = jax.random.PRNGKey(9)
    k1, k2, k3 = jax.random.split(key, 3)
    theta_c1 = _random_links(k1, 1, cact.lattice)
    theta_c = jnp.broadcast_to(theta_c1, (C, theta_c1.shape[1]))

    # XLA fill
    base = act.prolongate(theta_c, jnp.zeros((C, lat.nedges), jnp.float32))
    trial_xla = cond.fill_fine_points(k2, base)
    sq_xla = np.asarray(cond.evaluate(trial_xla))
    sf_xla = np.asarray(act.evaluate(trial_xla))

    # kernel fill (pure-jnp roll flavour)
    from mlmcpathintegral_tpu.ops.pallas_rng import CounterRng
    Mxc, Mtc = Mx // 2, Mt // 2
    gc = theta_c.reshape(C, Mxc, Mtc, 2).transpose(3, 1, 2, 0)
    site, chain = jnp.meshgrid(
        jnp.arange(Mxc * Mtc, dtype=jnp.uint32),
        jnp.arange(C, dtype=jnp.uint32), indexing="ij")
    site = site.reshape(Mxc, Mtc, C)
    chain = chain.reshape(Mxc, Mtc, C)
    rng = CounterRng(jnp.uint32(123), site, chain, jnp.uint32(77))
    exact = BETA <= 8.0
    if exact:
        alphas = tuple(float(a) for a in cond.bessel.alphaZ[1:])
        li0, sb = cond.bessel.log_I0_twobeta, cond.bessel.sigma_beta
    else:
        alphas, li0, sb = (), 0.0, 1.0
    trial, ok = tl.prolongate_fill(
        rng, gc[0], gc[1], BETA, li0, sb, 8, 16, tl.jnp_sh, jnp.float32,
        exact=exact)
    ok = np.asarray(ok)
    # beta=16: the STEP-3 ExpCos rejection at tau ~ 2 beta fails ~1% of
    # chains within k_rej=8 rounds (force-reject, exact; the screen just
    # loses ~1% acceptance)
    assert ok.mean() > 0.97
    if exact:
        sq_k = np.asarray(tl.s_cond(trial, BETA, alphas, tl.jnp_sh))[ok]
    else:
        sq_k = np.asarray(tl.s_cond_approx(trial, BETA, tl.jnp_sh))[ok]
    sf_k = np.asarray(tl.s_fine(trial, BETA, tl.jnp_sh))[ok]

    for a, b in ((sq_xla, sq_k), (sf_xla, sf_k)):
        se = math.sqrt(a.var() / len(a) + b.var() / len(b))
        assert abs(a.mean() - b.mean()) < 4 * se, (a.mean(), b.mean(), se)
        # variances within 10%
        assert abs(a.std() - b.std()) / a.std() < 0.1, (a.std(), b.std())


@pytest.mark.parametrize("BETA", [2.0, 16.0])
def test_fused_chain_matches_oracles(BETA):
    """Drive the fused two-level kernel (interpret mode) and check the
    stationary distribution against BOTH analytic oracles.  BETA=16
    exercises the large-beta Gaussian-mixture fill branch
    (quenchedschwingerconditionedfineaction.hh:37-44)."""
    Mt, Mx, C = 4, 4, 512
    lat = Lattice2D(Mt, Mx, CoarseningType.BOTH)
    act = QuenchedSchwingerAction(lat, beta=BETA)
    cact = act.coarse_action()
    cond = QuenchedSchwingerConditionedFineAction(act)

    key = jax.random.PRNGKey(5)
    k1, k2, k3 = jax.random.split(key, 3)
    theta_c = _random_links(k1, C, cact.lattice)
    theta_f = act.prolongate(theta_c, _random_links(k2, C, lat))
    theta_f = cond.fill_fine_points(k3, theta_f)
    s_f = act.evaluate(theta_f)
    s_q = cond.evaluate(theta_f)

    def chunk(theta_f, theta_c, s_f, s_q, seed, n_steps):
        return tl.schwinger_twolevel_chain(
            theta_f, theta_c, s_f, s_q, seed,
            beta=BETA, beta_c=cact.beta, Mt=Mt, Mx=Mx,
            n_steps=n_steps, t_sub=2, block_chains=C, interpret=True)

    # burn-in
    theta_f, theta_c, s_f, s_q, *_ = chunk(theta_f, theta_c, s_f, s_q,
                                           (11, 13), 50)
    ys, accs = [], []
    theta_f, theta_c, s_f, s_q, y, qc, ec, acc = chunk(
        theta_f, theta_c, s_f, s_q, (17, 19), 200)
    ys.append(np.asarray(y))
    accs.append(np.asarray(acc))
    y = np.concatenate(ys, axis=0)
    acc = np.concatenate(accs, axis=0)

    p_acc = acc.mean()
    assert 0.3 < p_acc <= 1.0, p_acc

    # cache consistency: the carried caches must equal fresh evaluations
    np.testing.assert_allclose(np.asarray(s_f),
                               np.asarray(act.evaluate(theta_f)),
                               rtol=0, atol=2e-3)
    np.testing.assert_allclose(np.asarray(s_q),
                               np.asarray(cond.evaluate(theta_f)),
                               rtol=0, atol=2e-3)

    # E[Y] = V chi_t(fine) - V chi_t(coarse); at strong coupling on the
    # tiny test lattice (beta=16, 4x4) chi_t is ~1e-15 and the quadrature
    # oracle is pure noise — the chain is then validated by the
    # acceptance + cache-consistency checks above and the beta=16 fill
    # distribution test below
    oracle = (chit_analytical(BETA, Mt * Mx)
              - chit_analytical(cact.beta, Mt * Mx // 4))
    est = y.mean()
    # effective error with a generous tau_int allowance
    err = y.std() / math.sqrt(y.size / (2 * 20.0))
    if abs(oracle) > 1e-4 or err > 1e-6:
        assert abs(est - oracle) < 4 * err, (est, err, oracle, p_acc)


def test_fill_force_reject_rate_negligible():
    """The truncated fill's force-reject probability is weakly
    staple-dependent, so a non-negligible rate biases the screened chain
    (measured -0.09% at 16x16 beta=8 with the old (8, 16) rounds at 7%
    per-chain failure — docs/screen_bias.csv).  Pin the default round
    counts to a per-chain failure rate < 1e-3 at the worst case of the
    exact branch (beta = 8)."""
    import math

    from mlmcpathintegral_tpu.distributions.besselproduct import (
        BesselProductDistribution,
    )
    from mlmcpathintegral_tpu.models.base import RenormalisationType
    from mlmcpathintegral_tpu.ops.pallas_rng import CounterRng, element_ids
    from mlmcpathintegral_tpu.samplers.heatbath import (
        OverrelaxedHeatBathSampler,
    )

    beta, M, C = 8.0, 16, 1024
    lat = Lattice2D(M, M, CoarseningType.BOTH)
    act = QuenchedSchwingerAction(
        lat, beta=beta, renormalisation=RenormalisationType.NONPERTURBATIVE)
    cact = act.coarse_action()
    s = OverrelaxedHeatBathSampler(cact, n_burnin=200)
    st = s.prepare(jax.random.PRNGKey(0), C, jnp.float32)
    xc = s.x_of(st)
    bp = BesselProductDistribution(beta)
    Mtc = M // 2
    gc = xc.reshape(C, Mtc, Mtc, 2).transpose(3, 1, 2, 0)
    site, chain = element_ids((Mtc, Mtc, C), C, jnp.uint32(0))
    import inspect

    sig = inspect.signature(tl.schwinger_twolevel_chain)
    k_fill = sig.parameters["k_rej_fill"].default
    k_bessel = sig.parameters["k_rej_bessel"].default
    fails = []
    for step in range(4):
        rng = CounterRng(jnp.uint32(123), site, chain, jnp.uint32(77),
                         step=jnp.uint32(step))
        _, ok = tl.prolongate_fill(
            rng, gc[0], gc[1], beta, bp.log_I0_twobeta, bp.sigma_beta,
            k_fill, k_bessel, tl.jnp_sh, jnp.float32, exact=True)
        fails.append(1.0 - np.asarray(ok, np.float64).mean())
    rate = float(np.mean(fails))
    assert rate < 1e-3, (rate, k_fill, k_bessel)
