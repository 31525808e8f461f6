"""Vectorised 1-D Wolff cluster update vs the sequential walk spec.

The masked-run update (samplers/cluster.py::_vector_cluster_update) must
sample the same distribution as the bidirectional walk transcription of
clustersampler.cc:92-132.  Checks: chi_t oracle agreement for both, and
cross-sampler agreement of mean/variance of the susceptibility.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mlmcpathintegral_tpu.lattice import Lattice1D
from mlmcpathintegral_tpu.models.rotor import RotorAction
from mlmcpathintegral_tpu.qoi import qoi_susceptibility
from mlmcpathintegral_tpu.samplers.cluster import ClusterSampler


def _run(vectorised: bool, seed: int, M=16, C=512, steps=300):
    lat = Lattice1D(M_lat=M, T_final=4.0)
    act = RotorAction(lat, m0=0.25)
    s = ClusterSampler(act, n_burnin=100, n_updates=5,
                       vectorised=vectorised)
    qoi = qoi_susceptibility(act)
    state = s.prepare(jax.random.PRNGKey(seed), C, jnp.float64)

    @jax.jit
    def chunk(key, state):
        def body(carry, k):
            st, acc = carry
            st, _ = s.draw(k, st)
            return (st, acc + qoi(st.x)), None
        keys = jax.random.split(key, steps)
        (state, acc), _ = jax.lax.scan(body, (state, jnp.zeros(C)), keys)
        return state, acc / steps

    _, q = chunk(jax.random.PRNGKey(seed + 1000), state)
    return np.asarray(q), act.chit_exact()


def test_vectorised_matches_oracle():
    q, oracle = _run(vectorised=True, seed=0)
    err = q.std(ddof=1) / np.sqrt(q.size)
    assert abs(q.mean() - oracle) < 4 * err
    assert err < 0.05 * oracle


def test_walk_and_vectorised_agree():
    qv, oracle = _run(vectorised=True, seed=1)
    qw, _ = _run(vectorised=False, seed=2)
    ev = qv.std(ddof=1) / np.sqrt(qv.size)
    ew = qw.std(ddof=1) / np.sqrt(qw.size)
    assert abs(qv.mean() - qw.mean()) < 4 * np.hypot(ev, ew)
    # second moment agreement (distribution, not just mean)
    v_v, v_w = (qv ** 2).mean(), (qw ** 2).mean()
    e2 = np.hypot((qv ** 2).std(ddof=1), (qw ** 2).std(ddof=1)) \
        / np.sqrt(qv.size)
    assert abs(v_v - v_w) < 4 * e2


@pytest.mark.parametrize("m0", [0.25, 1.0])
def test_vectorised_larger_lattice(m0):
    lat = Lattice1D(M_lat=64, T_final=4.0)
    act = RotorAction(lat, m0=m0)
    s = ClusterSampler(act, n_burnin=100, n_updates=10, vectorised=True)
    qoi = qoi_susceptibility(act)
    C = 256
    state = s.prepare(jax.random.PRNGKey(3), C, jnp.float64)

    @jax.jit
    def chunk(key, state):
        def body(carry, k):
            st, acc = carry
            st, _ = s.draw(k, st)
            return (st, acc + qoi(st.x)), None
        keys = jax.random.split(key, 200)
        (state, acc), _ = jax.lax.scan(body, (state, jnp.zeros(C)), keys)
        return state, acc / 200

    _, q = chunk(jax.random.PRNGKey(4), state)
    q = np.asarray(q)
    err = q.std(ddof=1) / np.sqrt(q.size)
    assert abs(q.mean() - act.chit_exact()) < 4 * err
