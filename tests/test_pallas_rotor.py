"""Fused Pallas rotor kernel vs the XLA checkerboard sweep and the
analytic susceptibility oracle (interpret mode on CPU)."""

import math

import jax
import jax.numpy as jnp
import numpy as np

from mlmcpathintegral_tpu.lattice import Lattice1D
from mlmcpathintegral_tpu.models.rotor import RotorAction
from mlmcpathintegral_tpu.ops.pallas_rotor import (
    rotor_sweep, rotor_sweep_chain,
)
from mlmcpathintegral_tpu.samplers.heatbath import OverrelaxedHeatBathSampler
from mlmcpathintegral_tpu.utils.special import mod_2pi

PI = math.pi


def test_overrelax_matches_xla_sweep():
    """With heat-bath off the kernel is deterministic and must reproduce
    the XLA checkerboard overrelaxation sweep (the ExpCos shift identity
    2 x0 - x == x_m + x_p - x mod 2 pi)."""
    M, C = 32, 128
    lat = Lattice1D(M_lat=M, T_final=4.0)
    act = RotorAction(lat, m0=0.25)
    x = jax.random.uniform(jax.random.PRNGKey(0), (C, M), jnp.float32,
                           -PI, PI)
    sampler = OverrelaxedHeatBathSampler(act, n_sweep_heatbath=1,
                                         n_sweep_overrelax=1)
    ref = sampler._half_sweep_overrelax(x, 0)
    ref = sampler._half_sweep_overrelax(ref, 1)
    out = rotor_sweep(x, 0, kappa=act.m0 / act.a_lat, M=M,
                      n_overrelax=1, n_heatbath=0,
                      block_chains=C, interpret=True)
    d = mod_2pi(out - ref)
    # the XLA path goes through atan2 (2 x0 - x), the kernel through the
    # shift identity (x_m + x_p - x): algebraically equal mod 2 pi, but
    # atan2 of near-cancelling sums amplifies f32 round-off to ~1e-4
    np.testing.assert_allclose(np.asarray(d), 0.0, rtol=0, atol=5e-4)


def test_winding_trace_matches_qoi():
    """The chained kernel's winding-sum trace must equal the QoI
    reduction of the evolved states."""
    M, C, STEPS = 16, 128, 5
    lat = Lattice1D(M_lat=M, T_final=4.0)
    act = RotorAction(lat, m0=0.25)
    x = jax.random.uniform(jax.random.PRNGKey(1), (C, M), jnp.float32,
                           -PI, PI)
    x1, wsum = rotor_sweep_chain(x, (3, 7), kappa=act.m0 / act.a_lat,
                                 M=M, n_steps=STEPS, block_chains=C,
                                 interpret=True)
    w_final = np.asarray(
        jnp.sum(mod_2pi(x1 - jnp.roll(x1, 1, axis=-1)), axis=-1))
    np.testing.assert_allclose(np.asarray(wsum)[-1], w_final,
                               rtol=0, atol=1e-4)


def test_heatbath_chain_matches_oracle():
    """A rotor chain driven by the fused kernel must reproduce the
    analytic topological susceptibility (driver_qm-style check)."""
    M, C = 16, 1024
    lat = Lattice1D(M_lat=M, T_final=4.0)
    act = RotorAction(lat, m0=0.25)
    x = jax.random.uniform(jax.random.PRNGKey(2), (C, M), jnp.float32,
                           -PI, PI)
    kappa = act.m0 / act.a_lat

    x, _ = rotor_sweep_chain(x, (1, 5), kappa=kappa, M=M, n_steps=80,
                             n_overrelax=2, block_chains=C,
                             interpret=True)                  # burn-in
    x, wsum = rotor_sweep_chain(x, (2, 9), kappa=kappa, M=M, n_steps=300,
                                n_overrelax=2, block_chains=C,
                                interpret=True)
    chit = (np.asarray(wsum) / (2 * PI)) ** 2 / lat.T_final
    est = chit.mean()
    err = chit.std() / math.sqrt(chit.size / (2 * 15.0))
    oracle = act.chit_exact()
    assert abs(est - oracle) < 4 * err, (est, err, oracle)


def test_sampler_rotor_pallas_gating():
    lat = Lattice1D(M_lat=16, T_final=4.0)
    act = RotorAction(lat, m0=0.25)
    s = OverrelaxedHeatBathSampler(act, use_pallas=True)
    assert s._pallas_kind == "rotor"


def test_cluster_chain_kernel_matches_oracle_and_xla():
    """Fused Wolff-cluster chain (VERDICT r4 item 8) vs the chi_t oracle
    and the XLA vectorised sampler on the same model."""
    import numpy as np

    from mlmcpathintegral_tpu.ops.pallas_rotor import rotor_cluster_chain
    from mlmcpathintegral_tpu.qoi import qoi_susceptibility
    from mlmcpathintegral_tpu.samplers.cluster import ClusterSampler

    lat = Lattice1D(M_lat=32, T_final=4.0)
    act = RotorAction(lat, m0=0.25)
    C, M = 256, 32
    kappa2 = 2.0 * act.m0 / act.a_lat
    x0 = act.initialise_state(jax.random.PRNGKey(0), C, jnp.float32)
    x, _ = rotor_cluster_chain(x0, (3, 5), kappa2=kappa2, M=M,
                               n_steps=30, n_updates=5,
                               block_chains=128, interpret=True)
    x, wsum = rotor_cluster_chain(x, (7, 11), kappa2=kappa2, M=M,
                                  n_steps=300, n_updates=5,
                                  block_chains=128, interpret=True)
    chit = np.asarray((wsum / (2 * np.pi)) ** 2 / lat.T_final)
    est = chit.mean()
    err = chit.std() / np.sqrt(chit.size / 3.0)   # ~tau-deflated
    oracle = act.chit_exact()
    assert abs(est - oracle) < 5 * err, (est, err, oracle)

    # the sampler facade drives the same kernel
    s = ClusterSampler(act, n_burnin=10, n_updates=5, use_pallas=True,
                       pallas_interpret=True, block_chains=128)
    st = s.prepare(jax.random.PRNGKey(1), C, jnp.float32)
    st2, w2 = s.draw_chain(jax.random.PRNGKey(2), st, 50)
    assert st2.x.shape == (C, M) and w2.shape == (50, C)

    # cross-check against the XLA vectorised sampler
    s_x = ClusterSampler(act, n_burnin=30, n_updates=5, vectorised=True)
    stx = s_x.prepare(jax.random.PRNGKey(4), C, jnp.float32)
    q = qoi_susceptibility(act)

    def body(st, k):
        st, _ = s_x.draw(k, st)
        return st, q(st.x)
    _, tr = jax.lax.scan(body, stx, jax.random.split(
        jax.random.PRNGKey(5), 300))
    tr = np.asarray(tr)
    est2 = tr.mean()
    err2 = tr.std() / np.sqrt(tr.size / 3.0)
    assert abs(est - est2) < 5 * np.hypot(err, err2), (est, est2)
