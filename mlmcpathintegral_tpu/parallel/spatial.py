"""Spatial (lattice-axis) sharding with halo exchange — scaling beyond the
reference.

The reference never decomposes the lattice across ranks (SURVEY.md §2.1);
its scaling axes are independent chains and the multigrid hierarchy.  On
TPU the 5-point-stencil sweeps shard naturally: the spatial rows of a
[C, Mx, Mt] field are distributed over a 1-D ``space`` mesh axis with
``shard_map``, and each red/black half-sweep exchanges one halo row with
each neighbouring device via ``jax.lax.ppermute`` over ICI.

This module implements the sharded GFF checkerboard heat-bath sweep.  The
update is *bit-identical* to the single-device sweep given the same noise
(tested on the virtual CPU mesh), because the checkerboard sweep only ever
reads frozen opposite-colour values — the decomposition changes data
movement, not math.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def gff_heatbath_sweep_noise(action, phi, xi):
    """Single-device reference: red/black heat-bath sweep of the 5-point
    stencil driven by externally supplied noise xi [C, N] (same math as
    GFFAction.heatbath_sweep, deterministic given xi)."""
    kappa = 4.0 + action.mu2
    sigma = 1.0 / math.sqrt(kappa)
    for colour in action._colour_masks:
        delta = action._nbsum(phi)[..., colour]
        phi = phi.at[..., colour].set(delta / kappa
                                      + sigma * xi[..., colour])
    return phi


def make_sharded_gff_sweep(action, mesh: Mesh, axis: str = "space",
                           chain_axis: str | None = None):
    """Build a jitted sharded sweep: phi [C, N] with the spatial rows
    sharded over ``axis`` (and, if ``chain_axis`` is given, the chain axis
    sharded over that mesh axis too — a 2-D dp x sp layout).  Requires an
    unrotated lattice whose Mx is a multiple of 2 * mesh size (even rows
    per shard keep the global checkerboard parity aligned across shards)."""
    lat = action.lattice
    if lat.rotated:
        raise ValueError("spatial sharding needs an unrotated lattice")
    Mt, Mx = lat.Mt_lat, lat.Mx_lat
    n_dev = mesh.shape[axis]
    if Mx % (2 * n_dev):
        raise ValueError(f"Mx={Mx} must be a multiple of 2*{n_dev}")
    kappa = 4.0 + action.mu2
    sigma = 1.0 / math.sqrt(kappa)
    fwd = [(i, (i + 1) % n_dev) for i in range(n_dev)]
    bwd = [(i, (i - 1) % n_dev) for i in range(n_dev)]

    def local_sweep(phi_loc, xi_loc):
        """phi_loc, xi_loc: [C, Mx_loc, Mt] local row blocks."""
        for parity in (0, 1):
            # halo rows from the neighbouring shards (ICI ppermute)
            top = jax.lax.ppermute(phi_loc[:, -1:, :], axis, fwd)
            bot = jax.lax.ppermute(phi_loc[:, :1, :], axis, bwd)
            ext = jnp.concatenate([top, phi_loc, bot], axis=1)
            up = ext[:, :-2, :]       # row j-1
            down = ext[:, 2:, :]      # row j+1
            left = jnp.roll(phi_loc, 1, axis=-1)
            right = jnp.roll(phi_loc, -1, axis=-1)
            delta = up + down + left + right
            new = delta / kappa + sigma * xi_loc
            # global checkerboard: colour = (i + j_global) % 2; the shard
            # offset is even (Mx_loc even), so local j parity is global
            i_idx = jax.lax.broadcasted_iota(jnp.int32, phi_loc.shape[1:],
                                             1)
            j_idx = jax.lax.broadcasted_iota(jnp.int32, phi_loc.shape[1:],
                                             0)
            mask = ((i_idx + j_idx) % 2 == parity)[None, :, :]
            phi_loc = jnp.where(mask, new, phi_loc)
        return phi_loc

    spec = P(chain_axis, axis, None)
    sweep = jax.shard_map(local_sweep, mesh=mesh,
                          in_specs=(spec, spec), out_specs=spec)

    @jax.jit
    def sharded_sweep(phi, xi):
        """phi, xi: [C, N] flat states; returns the swept [C, N]."""
        C = phi.shape[0]
        phi_g = phi.reshape(C, Mx, Mt)
        xi_g = xi.reshape(C, Mx, Mt)
        out = sweep(phi_g, xi_g)
        return out.reshape(C, Mx * Mt)

    return sharded_sweep
