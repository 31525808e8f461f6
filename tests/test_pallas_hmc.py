"""Pallas fused HMC trajectory vs the reference jnp implementation
(interpret mode on CPU; the compiled path runs in bench.py on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mlmcpathintegral_tpu.lattice import Lattice1D
from mlmcpathintegral_tpu.models import (
    HarmonicOscillatorAction, QuarticOscillatorAction, RotorAction,
)
from mlmcpathintegral_tpu.ops.pallas_hmc import hmc_trajectory


def _reference_trajectory(action, x, p, u, dt, nt):
    """The jnp leapfrog from samplers/hmc.py, inlined."""
    T_cur = 0.5 * jnp.sum(p * p, axis=-1)
    S_cur = action.evaluate(x)
    xt = x
    p = p - 0.5 * dt * action.force(xt)
    xt = xt + dt * p
    for _ in range(nt - 1):
        p = p - dt * action.force(xt)
        xt = xt + dt * p
    p = p - 0.5 * dt * action.force(xt)
    dH = (action.evaluate(xt) - S_cur) + (0.5 * jnp.sum(p * p, -1) - T_cur)
    accept = jnp.logical_or(dH < 0.0, u < jnp.exp(-dH))
    return jnp.where(accept[:, None], xt, x), accept


CASES = [
    ("harmonic",
     HarmonicOscillatorAction(Lattice1D(16, 4.0), m0=1.0, mu2=1.3),
     dict(m0=1.0, mu2=1.3)),
    ("quartic",
     QuarticOscillatorAction(Lattice1D(16, 4.0), m0=0.8, mu2=-1.0,
                             lam=1.0, x0=0.2),
     dict(m0=0.8, mu2=-1.0, lam=1.0, x0=0.2)),
    ("rotor",
     RotorAction(Lattice1D(16, 4.0), m0=1.2),
     dict(m0=1.2)),
]


@pytest.mark.parametrize("kind,action,params", CASES,
                         ids=[c[0] for c in CASES])
def test_pallas_trajectory_matches_reference(kind, action, params):
    key = jax.random.PRNGKey(0)
    C, M = 8, 16
    kx, kp, ku = jax.random.split(key, 3)
    x = jax.random.normal(kx, (C, M), jnp.float32)
    p = jax.random.normal(kp, (C, M), jnp.float32)
    u = jax.random.uniform(ku, (C,), jnp.float32)
    dt, nt = 0.08, 10

    x_ref, acc_ref = _reference_trajectory(action, x, p, u, dt, nt)
    x_pl, acc_pl = hmc_trajectory(x, p, u, dt, kind=kind,
                                  a_lat=action.a_lat, nt=nt,
                                  block_chains=C, interpret=True,
                                  **params)
    np.testing.assert_array_equal(np.asarray(acc_pl), np.asarray(acc_ref))
    np.testing.assert_allclose(np.asarray(x_pl), np.asarray(x_ref),
                               rtol=2e-5, atol=2e-5)
