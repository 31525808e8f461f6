"""Pallas TPU kernel: fused red/black overrelax + heat-bath sweeps for the
2-D Gaussian Free Field.

The GFF chain's hot loop is the checkerboard sweep (gffaction.cc:33-78):
per colour, phi_ell ~ N(Delta/(4+mu2), 1/(4+mu2)) with Delta the 4-point
neighbour sum (heat bath), or the deterministic reflection
phi -> 2 Delta/(4+mu2) - phi (overrelaxation).  This kernel fuses all
sweeps of one draw into a single VMEM program with the counter-based
in-kernel RNG (ops/pallas_rng.py): one HBM round trip per draw.

Layout: [Mx, Mt, C_block] — t-axis on sublanes, chains on lanes; the
i-shift is a sublane roll, the j-shift a major-axis roll.  Plain
(unsmoothed, unrotated) 5-point GFF only; the Gibbs-smoothed effective
action keeps the XLA path.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mlmcpathintegral_tpu.ops.pallas_rng import (
    CounterRng, check_element_capacity, element_ids,
)


def _nbsum(phi, Mt):
    """4-point neighbour sum for phi [Mx, Mt, C]."""
    up = jnp.roll(phi, 1, axis=0)
    down = jnp.roll(phi, -1, axis=0)
    left = pltpu.roll(phi, 1, axis=1)
    right = pltpu.roll(phi, Mt - 1, axis=1)
    return up + down + left + right


def _colour_mask(shape, colour):
    """(i + j) % 2 == colour for [Mx, Mt, C] grids (gff._colour_masks;
    colour 0 = red)."""
    j_idx = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    i_idx = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    return ((i_idx + j_idx) % 2) == colour


def _sweep_kernel(seed_ref, phi_ref, out_ref, *, kappa, Mt,
                  n_overrelax, n_heatbath, block_chains):
    dtype = phi_ref.dtype
    phi = phi_ref[:]
    sigma = 1.0 / math.sqrt(kappa)
    site, chain = element_ids(phi.shape, block_chains, pl.program_id(0))
    rng = CounterRng(seed_ref[0].astype(jnp.uint32), site, chain,
                     seed_ref[1].astype(jnp.uint32))

    for _ in range(n_overrelax):
        for colour in (0, 1):
            new = 2.0 * _nbsum(phi, Mt) / kappa - phi
            phi = jnp.where(_colour_mask(phi.shape, colour), new, phi)
    for _ in range(n_heatbath):
        for colour in (0, 1):
            new = _nbsum(phi, Mt) / kappa + sigma * rng.normal(dtype)
            phi = jnp.where(_colour_mask(phi.shape, colour), new, phi)
    out_ref[:] = phi


@functools.partial(jax.jit, static_argnames=(
    "kappa", "Mt", "Mx", "n_overrelax", "n_heatbath", "block_chains",
    "interpret"))
def gff_sweep(phi, seed, *, kappa, Mt, Mx, n_overrelax=0, n_heatbath=1,
              block_chains=128, interpret=False):
    """Fused GFF sweeps on all chains.

    phi: [C, Mx*Mt] flat fields (vertex layout ell = Mt*j + i);
    seed: int32 scalar or (2,)-vector (two words for production-length
    chains, see pallas_rng.CounterRng).  Returns the swept phi.
    """
    C = phi.shape[0]
    if C % block_chains:
        raise ValueError(f"n_chains {C} must be a multiple of "
                         f"block_chains {block_chains}")
    check_element_capacity(Mx * Mt, C)
    g = phi.reshape(C, Mx, Mt).transpose(1, 2, 0)   # [Mx, Mt, C]
    seed_arr = jnp.atleast_1d(jnp.asarray(seed, jnp.int32))
    if seed_arr.shape[0] == 1:
        seed_arr = jnp.concatenate([seed_arr,
                                    jnp.zeros((1,), jnp.int32)])
    kernel = functools.partial(
        _sweep_kernel, kappa=float(kappa), Mt=int(Mt),
        n_overrelax=int(n_overrelax), n_heatbath=int(n_heatbath),
        block_chains=int(block_chains))
    out = pl.pallas_call(
        kernel,
        grid=(C // block_chains,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((Mx, Mt, block_chains), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Mx, Mt, block_chains), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mx, Mt, C), phi.dtype),
        interpret=interpret,
    )(seed_arr, g)
    return out.transpose(2, 0, 1).reshape(C, Mx * Mt)
