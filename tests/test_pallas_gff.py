"""Fused Pallas GFF sweep vs the XLA reference implementation (interpret
mode on CPU; the compiled path is exercised by tools/perf_probe.py on
TPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from mlmcpathintegral_tpu.lattice2d import CoarseningType, Lattice2D
from mlmcpathintegral_tpu.models.qft.gff import GFFAction
from mlmcpathintegral_tpu.ops.pallas_gff import gff_sweep
from mlmcpathintegral_tpu.qoi import qoi_2d_phi_squared


def test_overrelax_matches_xla_sweep():
    """Overrelaxation is deterministic: the kernel must reproduce the XLA
    red/black sweep exactly."""
    Mt, Mx, C = 8, 8, 128
    lat = Lattice2D(Mt, Mx, CoarseningType.BOTH)
    act = GFFAction(lat, mass=1.5)
    phi = jax.random.normal(jax.random.PRNGKey(0), (C, lat.nvertices),
                            jnp.float32)
    ref = act.overrelaxation_sweep(phi)
    out = gff_sweep(phi, 0, kappa=4.0 + act.mu2, Mt=Mt, Mx=Mx,
                    n_overrelax=1, n_heatbath=0, block_chains=C,
                    interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0, atol=2e-6)


def test_heatbath_chain_matches_phi_squared():
    """A chain driven by the fused kernel must reproduce the spectral-sum
    <phi^2> oracle (driver_qft.cc-style consistency check)."""
    Mt, Mx, MASS, C = 8, 8, 1.0, 512
    lat = Lattice2D(Mt, Mx, CoarseningType.BOTH)
    act = GFFAction(lat, mass=MASS)
    qoi = qoi_2d_phi_squared(act)
    phi = jnp.zeros((C, lat.nvertices), jnp.float32)
    kappa = 4.0 + act.mu2

    def step(phi, seed):
        return gff_sweep(phi, seed, kappa=kappa, Mt=Mt, Mx=Mx,
                         n_overrelax=1, n_heatbath=1, block_chains=C,
                         interpret=True)

    for k in range(40):                      # burn-in
        phi = step(phi, k)
    vals = []
    for k in range(40, 240):
        phi = step(phi, k)
        vals.append(np.asarray(qoi(phi)))
    vals = np.concatenate(vals)
    est = vals.mean()
    err = vals.std() / np.sqrt(len(vals) / (2 * 5.0))   # tau <~ 5
    oracle = act.phi_squared_analytical()
    assert abs(est - oracle) < 4 * err, (est, err, oracle)


def test_sampler_pallas_gating():
    """use_pallas must be accepted for the plain GFF and rejected for the
    Gibbs-smoothed variant and non-sweep actions."""
    import pytest

    from mlmcpathintegral_tpu.samplers import OverrelaxedHeatBathSampler

    lat = Lattice2D(8, 8, CoarseningType.BOTH)
    OverrelaxedHeatBathSampler(GFFAction(lat, mass=1.0), use_pallas=True)
    with pytest.raises(ValueError, match="use_pallas"):
        OverrelaxedHeatBathSampler(
            GFFAction(lat, mass=1.0, n_gibbs_smooth=2), use_pallas=True)
