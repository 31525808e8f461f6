"""Fused-Pallas MonteCarloMultiLevel (Schwinger) vs the analytic oracle
and the generic XLA path (interpret mode on CPU)."""

import jax
import jax.numpy as jnp

from mlmcpathintegral_tpu.conditioned.schwinger import (
    make_schwinger_conditioned_fine_action,
)
from mlmcpathintegral_tpu.lattice2d import CoarseningType, Lattice2D
from mlmcpathintegral_tpu.mc import MonteCarloMultiLevel
from mlmcpathintegral_tpu.models.qft.schwinger import QuenchedSchwingerAction
from mlmcpathintegral_tpu.qoi import qoi_2d_susceptibility
from mlmcpathintegral_tpu.samplers import OverrelaxedHeatBathSampler


def test_fused_mlmc_matches_oracle():
    lat = Lattice2D(8, 8, CoarseningType.BOTH)
    act = QuenchedSchwingerAction(lat, beta=4.0)
    mc = MonteCarloMultiLevel(
        act, qoi_2d_susceptibility,
        coarse_sampler_factory=lambda a: OverrelaxedHeatBathSampler(
            a, n_burnin=50),
        conditioned_fine_action_factory=make_schwinger_conditioned_fine_action,
        n_level=2, n_burnin=200, n_samples=6000, chunk_size=25,
        use_pallas=True, pallas_interpret=True)
    assert mc._fused_level(0) and mc._fused_coarsest()
    mc.evaluate(jax.random.PRNGKey(7), n_chains=256, dtype=jnp.float32)
    num = mc.numerical_result()
    err = mc.statistical_error()
    oracle = act.chit_exact()
    assert abs(num - oracle) < 4 * err, (num, err, oracle)
    # the adaptive subsampling rate must have been learned (> initial 2
    # would mean a slow coarse sampler; heat bath at 4x4 decorrelates
    # fast, so it should stay small but defined)
    assert all(1 <= t <= mc.t_max for t in mc._t_sub)
