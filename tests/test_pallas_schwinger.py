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


def test_element_capacity_guard():
    """Lattices whose (site, chain) ids would wrap the 32-bit RNG stream
    space must be rejected, not silently correlated."""
    import pytest

    theta = jnp.zeros((128, 128 * 64 * 2), jnp.float32)
    with pytest.raises(ValueError, match="counter RNG supports"):
        schwinger_sweep(theta, 0, beta=1.0, Mt=128, Mx=64,
                        block_chains=128, interpret=True)
