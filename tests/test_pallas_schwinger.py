"""Fused Pallas Schwinger sweep vs the XLA reference implementation
(interpret mode on CPU; the compiled path runs in bench.py on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from mlmcpathintegral_tpu.lattice2d import CoarseningType, Lattice2D
from mlmcpathintegral_tpu.models.qft.schwinger import QuenchedSchwingerAction
from mlmcpathintegral_tpu.ops.pallas_schwinger import schwinger_sweep
from mlmcpathintegral_tpu.qoi import qoi_2d_susceptibility


def test_overrelax_matches_xla_sweep():
    """With heat-bath off the kernel is deterministic and must reproduce
    the XLA overrelaxation sweep exactly (same group order, same math)."""
    Mt, Mx, C = 8, 8, 128
    lat = Lattice2D(Mt, Mx, CoarseningType.BOTH)
    act = QuenchedSchwingerAction(lat, beta=3.0)
    theta = jax.random.uniform(jax.random.PRNGKey(0), (C, lat.nedges),
                               jnp.float32, -np.pi, np.pi)
    ref = act.overrelaxation_sweep(theta)
    out = schwinger_sweep(theta, 0, beta=3.0, Mt=Mt, Mx=Mx,
                          n_overrelax=1, n_heatbath=0,
                          block_chains=C, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0, atol=2e-6)


def test_heatbath_chain_matches_oracle():
    """A chain driven by the fused kernel must reproduce the analytic
    susceptibility (driver_qft.cc-style consistency check)."""
    Mt, Mx, BETA, C = 4, 4, 2.0, 1024
    lat = Lattice2D(Mt, Mx, CoarseningType.BOTH)
    act = QuenchedSchwingerAction(lat, beta=BETA)
    qoi = qoi_2d_susceptibility(act)
    theta = jax.random.uniform(jax.random.PRNGKey(1), (C, lat.nedges),
                               jnp.float32, -np.pi, np.pi)

    def step(theta, seed):
        return schwinger_sweep(theta, seed, beta=BETA, Mt=Mt, Mx=Mx,
                               block_chains=C, interpret=True)

    for k in range(60):                      # burn-in
        theta = step(theta, k)
    vals = []
    for k in range(60, 260):
        theta = step(theta, k)
        vals.append(np.asarray(qoi(theta)))
    vals = np.concatenate(vals)
    est, err = vals.mean(), vals.std() / np.sqrt(len(vals) / (2 * 25.0))
    oracle = act.chit_exact()
    assert abs(est - oracle) < 4 * err, (est, err, oracle)


def test_chain_kernel_matches_stepwise():
    """The multi-step fused kernel (links resident in VMEM, one launch)
    must bit-match n_steps single-step launches with the same seed pair
    and step_offset = 0..n-1, and its QoI trace must equal the
    susceptibility reduction of the intermediate states."""
    from mlmcpathintegral_tpu.ops.pallas_schwinger import (
        schwinger_sweep_chain,
    )
    from mlmcpathintegral_tpu.utils.special import mod_2pi

    Mt, Mx, BETA, C, N = 4, 4, 2.0, 128, 3
    lat = Lattice2D(Mt, Mx, CoarseningType.BOTH)
    act = QuenchedSchwingerAction(lat, beta=BETA)
    theta0 = jax.random.uniform(jax.random.PRNGKey(3), (C, lat.nedges),
                                jnp.float32, -np.pi, np.pi)
    seed = jnp.asarray([17, -5], jnp.int32)

    theta_c, qsum = schwinger_sweep_chain(
        theta0, seed, beta=BETA, Mt=Mt, Mx=Mx, n_steps=N,
        block_chains=C, interpret=True)

    theta = theta0
    for s in range(N):
        theta = schwinger_sweep(theta, seed, beta=BETA, Mt=Mt, Mx=Mx,
                                block_chains=C, step_offset=s,
                                interpret=True)
        q = jnp.sum(mod_2pi(act.plaquette_angles(theta)), axis=(-2, -1))
        np.testing.assert_allclose(np.asarray(qsum[s]), np.asarray(q),
                                   rtol=0, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(theta_c), np.asarray(theta))


def test_draw_chain_sampler_oracle():
    """OverrelaxedHeatBathSampler.draw_chain fallback path (scan of
    draw) reproduces the analytic susceptibility from its QoI trace."""
    from mlmcpathintegral_tpu.samplers import OverrelaxedHeatBathSampler

    Mt, Mx, BETA, C = 4, 4, 2.0, 512
    lat = Lattice2D(Mt, Mx, CoarseningType.BOTH)
    act = QuenchedSchwingerAction(lat, beta=BETA)
    smp = OverrelaxedHeatBathSampler(act, n_burnin=50)
    key = jax.random.PRNGKey(4)
    st = smp.prepare(key, C, jnp.float32)
    st, qsum = smp.draw_chain(jax.random.fold_in(key, 1), st, 200)
    y = np.asarray(qsum) ** 2 / (4 * np.pi ** 2)
    est = y.mean()
    err = y.std() / np.sqrt(y.size / (2 * 25.0))
    oracle = act.chit_exact()
    assert abs(est - oracle) < 4 * err, (est, err, oracle)


def test_element_capacity_guard():
    """Only configurations whose per-lane ids would wrap uint32 are
    rejected; 128x64 (8192 sites — beyond the old 4096-site packed-id
    cap) is accepted by the two-lane scheme."""
    import pytest

    from mlmcpathintegral_tpu.ops.pallas_rng import check_element_capacity

    check_element_capacity(128 * 128, 1 << 20)      # fine now
    with pytest.raises(ValueError, match="counter RNG supports"):
        check_element_capacity(1 << 32, 1)
    with pytest.raises(ValueError, match="counter RNG supports"):
        check_element_capacity(1, 1 << 32)


def test_rng_stream_distinctness():
    """Two-lane streams: elements that collided under the old packed
    32-bit id (site + 2^20*chain mod 2^32) must now produce distinct
    bit streams; identical (site, chain) must reproduce exactly."""
    from mlmcpathintegral_tpu.ops.pallas_rng import CounterRng

    # sites beyond the old 4096 cap, chains beyond 2^20, plus aliasing
    # pairs under the old packing: (site, chain) and (site + 4096, chain)
    sites = jnp.asarray([0, 1, 4095, 4096, 8191, 16383, 2**20],
                        jnp.uint32)
    chains = jnp.asarray([0, 1, 2**20, 2**21, 5, 7, 11], jnp.uint32)
    seed = jnp.uint32(12345)
    seed2 = jnp.uint32(777)

    def stream(s, c):
        rng = CounterRng(seed, s, c, seed2)
        return np.asarray(jnp.stack([rng.bits() for _ in range(4)]))

    seen = {}
    for s in np.asarray(sites):
        for c in np.asarray(chains):
            key = tuple(stream(jnp.uint32(s), jnp.uint32(c)))
            assert key not in seen, (s, c, seen[key])
            seen[key] = (int(s), int(c))

    # reproducibility: same (seed, site, chain) -> same stream
    a = stream(jnp.uint32(4096), jnp.uint32(3))
    b = stream(jnp.uint32(4096), jnp.uint32(3))
    np.testing.assert_array_equal(a, b)
