"""Spatially-sharded GFF sweep with halo exchange vs the dense sweep."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mlmcpathintegral_tpu.lattice2d import CoarseningType, Lattice2D
from mlmcpathintegral_tpu.models.qft import GFFAction
from mlmcpathintegral_tpu.parallel import chain_mesh
from mlmcpathintegral_tpu.parallel.spatial import (
    gff_heatbath_sweep_noise, make_sharded_gff_sweep,
)


def _mesh(n):
    devices = jax.local_devices(backend="cpu")
    if len(devices) < n:
        pytest.skip(f"needs {n} virtual CPU devices")
    return chain_mesh(n, devices=devices, axis_name="space")


def test_sharded_sweep_matches_dense():
    lat = Lattice2D(8, 8, CoarseningType.BOTH)
    act = GFFAction(lat, mass=2.0)
    mesh = _mesh(4)
    sweep = make_sharded_gff_sweep(act, mesh, axis="space")
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    phi = jax.random.normal(k1, (6, lat.nvertices), jnp.float64)
    xi = jax.random.normal(k2, (6, lat.nvertices), jnp.float64)
    dense = gff_heatbath_sweep_noise(act, phi, xi)
    sharded = sweep(phi, xi)
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(dense),
                               rtol=1e-13, atol=1e-13)


def test_sharded_sweep_preserves_distribution():
    lat = Lattice2D(8, 16, CoarseningType.BOTH)
    act = GFFAction(lat, mass=2.0)
    mesh = _mesh(8)
    sweep = make_sharded_gff_sweep(act, mesh, axis="space")
    key = jax.random.PRNGKey(1)
    phi = act.exact_draw(key, 20_000, jnp.float64)
    for i in range(3):
        xi = jax.random.normal(jax.random.fold_in(key, i), phi.shape,
                               jnp.float64)
        phi = sweep(phi, xi)
    phi2 = float(jnp.mean(phi * phi))
    assert phi2 == pytest.approx(act.phi_squared_analytical(), rel=2e-2)


def test_invalid_configs():
    lat = Lattice2D(8, 8, CoarseningType.ROTATE, coarsening_level=1)
    act = GFFAction(lat, mass=1.0)
    with pytest.raises(ValueError, match="unrotated"):
        make_sharded_gff_sweep(act, _mesh(2), axis="space")
    lat2 = Lattice2D(8, 6, CoarseningType.BOTH)
    with pytest.raises(ValueError, match="multiple"):
        make_sharded_gff_sweep(GFFAction(lat2, mass=1.0), _mesh(4),
                               axis="space")
