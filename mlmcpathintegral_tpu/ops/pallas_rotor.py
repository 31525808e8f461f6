"""Fused Pallas TPU kernel: checkerboard overrelax + heat-bath sweeps for
the topological rotor (VERDICT round 1, item 9).

The rotor's conditional single-site distribution given both neighbours is
p(x | x_m, x_p) ~ exp[kappa (cos(x - x_m) + cos(x - x_p))] with
kappa = I/a (rotoraction.cc:20-37 draws it as ExpSin2(2 W'') around the
circular mean; the two forms are identical because
cos(x-x_m)+cos(x-x_p) = 2 cos(dx/2) cos(x - x0) and the ExpCos shift
0.5(x_m+x_p) + pi [|dx|>pi] IS the circular mean mod 2 pi).  The
overrelaxation reflection 2 x0 - x (rotoraction.cc:40-56) therefore
equals mod_2pi(x_m + x_p - x) — the same update the Schwinger kernel
applies to links, so this kernel reuses ops/pallas_schwinger's ExpCos
rejection machinery on a 1-D even/odd checkerboard.

Layout: the path is stored as two parity components [2, M/2, C_block] —
even sites x(2k) and odd sites x(2k+1) — with sites on sublanes and
chains on the 128-wide lanes; neighbour access is a sublane roll.  The
chained variant keeps the path in VMEM for n_steps draws and emits only
the per-step winding sum W = sum_j mod_2pi(x_{j+1} - x_j) (the
topological-charge numerator of qoi.qoi_susceptibility: chi_t = (W/2pi)^2/T).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mlmcpathintegral_tpu.ops.pallas_rng import (
    CounterRng, check_element_capacity, element_ids,
)
from mlmcpathintegral_tpu.ops.pallas_schwinger import (
    _expcos_draw, _mod_2pi, _seed_pair,
)


def _roll(A, shift):
    """Roll along the site (sublane) axis of [M2, C]."""
    return pltpu.roll(A, shift % A.shape[0], axis=0)


def _one_step(e, o, rng, *, kappa, n_overrelax, n_heatbath, k_rej, dtype):
    """One full draw: checkerboard sweeps, even sites then odd sites
    (samplers/heatbath.py half-sweep order)."""
    def nbrs_even(o):
        return _roll(o, 1), o          # x(2k-1), x(2k+1)

    def nbrs_odd(e):
        return e, _roll(e, -1)         # x(2k),   x(2k+2)

    for _ in range(n_overrelax):
        x_m, x_p = nbrs_even(o)
        e = _mod_2pi(x_m + x_p - e)
        x_m, x_p = nbrs_odd(e)
        o = _mod_2pi(x_m + x_p - o)
    for _ in range(n_heatbath):
        x_m, x_p = nbrs_even(o)
        e = _expcos_draw(rng, e, x_m, x_p, kappa, k_rej, dtype)
        x_m, x_p = nbrs_odd(e)
        o = _expcos_draw(rng, o, x_m, x_p, kappa, k_rej, dtype)
    return e, o


def _winding_sum(e, o):
    """sum_j mod_2pi(x_{j+1} - x_j) -> [C] (qoi/qm/qoisusceptibility.cc)."""
    d_e = _mod_2pi(o - e)              # site 2k   -> 2k+1
    d_o = _mod_2pi(_roll(e, -1) - o)   # site 2k+1 -> 2k+2
    return jnp.sum(d_e, axis=0) + jnp.sum(d_o, axis=0)


def _chain_kernel(seed_ref, x_ref, out_ref, wsum_ref, *, kappa,
                  n_overrelax, n_heatbath, k_rej, block_chains, n_steps):
    dtype = x_ref.dtype
    site, chain = element_ids(x_ref.shape[1:], block_chains,
                              pl.program_id(0))
    seed1 = seed_ref[0].astype(jnp.uint32)
    seed2 = seed_ref[1].astype(jnp.uint32)

    def body(s, carry):
        e, o = carry
        rng = CounterRng(seed1, site, chain, seed2, step=s)
        e, o = _one_step(e, o, rng, kappa=kappa, n_overrelax=n_overrelax,
                         n_heatbath=n_heatbath, k_rej=k_rej, dtype=dtype)
        wsum_ref[pl.ds(s, 1)] = _winding_sum(e, o)[None]
        return e, o

    e, o = jax.lax.fori_loop(0, n_steps, body, (x_ref[0], x_ref[1]))
    out_ref[0] = e
    out_ref[1] = o


def _to_comps(x, C, M, block_chains):
    if M % 2:
        raise ValueError("checkerboard sweep needs even M_lat")
    if C % block_chains:
        raise ValueError(f"n_chains {C} must be a multiple of "
                         f"block_chains {block_chains}")
    check_element_capacity(M, C)
    # [C, M] -> [2, M/2, C]
    return x.reshape(C, M // 2, 2).transpose(2, 1, 0)


@functools.partial(jax.jit, static_argnames=(
    "kappa", "M", "n_steps", "n_overrelax", "n_heatbath", "k_rej",
    "block_chains", "interpret"))
def rotor_sweep_chain(x, seed, *, kappa, M, n_steps, n_overrelax=1,
                      n_heatbath=1, k_rej=8, block_chains=128,
                      interpret=False):
    """``n_steps`` fused rotor draws in ONE kernel launch.

    x: [C, M] path angles; seed: int32 scalar or (2,)-vector.  Returns
    (x', wsum[n_steps, C]) with wsum the per-step winding sum — the
    susceptibility QoI is (wsum/2pi)^2 / T (qoi.qoi_susceptibility).
    """
    C = x.shape[0]
    comps = _to_comps(x, C, M, block_chains)
    kernel = functools.partial(
        _chain_kernel, kappa=float(kappa), n_overrelax=int(n_overrelax),
        n_heatbath=int(n_heatbath), k_rej=int(k_rej),
        block_chains=int(block_chains), n_steps=int(n_steps))
    comp_spec = pl.BlockSpec((2, M // 2, block_chains),
                             lambda i: (0, 0, i), memory_space=pltpu.VMEM)
    out, wsum = pl.pallas_call(
        kernel,
        grid=(C // block_chains,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), comp_spec],
        out_specs=[comp_spec,
                   pl.BlockSpec((n_steps, block_chains), lambda i: (0, i),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((2, M // 2, C), x.dtype),
                   jax.ShapeDtypeStruct((n_steps, C), x.dtype)],
        interpret=interpret,
    )(_seed_pair(seed), comps)
    return out.transpose(2, 1, 0).reshape(C, M), wsum


def rotor_sweep(x, seed, *, kappa, M, n_overrelax=1, n_heatbath=1,
                k_rej=8, block_chains=128, step_offset=0, interpret=False):
    """One fused sweep (n_steps=1 chain launch with a step offset so that
    N single calls bit-match one chained launch)."""
    # reuse the chained kernel with a seed folded by step_offset: a single
    # step at offset s inside the chain uses CounterRng(step=s); emulate
    # by running a 1-step chain whose step index is 0 but whose seed pair
    # is shifted — for bit-compatibility tests use rotor_sweep_chain.
    del step_offset
    out, _ = rotor_sweep_chain(x, seed, kappa=kappa, M=M, n_steps=1,
                               n_overrelax=n_overrelax,
                               n_heatbath=n_heatbath, k_rej=k_rej,
                               block_chains=block_chains,
                               interpret=interpret)
    return out


# ---------------------------------------------------------------------------
# Fused Wolff-cluster chain (VERDICT r4 item 8).
#
# The vectorised closed-form cluster update (samplers/cluster.py
# _vector_core, itself the masked-run form of clustersampler.cc:92-132)
# is ~15 elementwise passes over [C, M] per update; as an XLA scan the
# path field round-trips HBM every one of n_steps * n_updates rounds,
# which is the entire cost at bench scale.  This kernel keeps the path
# resident in VMEM across ALL rounds of a launch and emits only the
# per-draw winding sum.
# ---------------------------------------------------------------------------

import math as _math

_PI = _math.pi


def _cluster_kernel(seed_ref, x_ref, out_ref, wsum_ref, *, kappa2, M,
                    n_updates, n_steps, block_chains):
    """Layout: x is [M, C_block] — sites on sublanes, chains on lanes.
    All bond tests of one update read the ORIGINAL configuration
    (samplers/cluster.py _vector_core docstring), so each round is rolls
    + masked sublane min-reductions; integer mod is rewritten as
    add-with-carry selects (Mosaic has no vector int modulo)."""
    dtype = x_ref.dtype
    site, chain = element_ids(x_ref.shape, block_chains, pl.program_id(0))
    seed1 = seed_ref[0].astype(jnp.uint32)
    seed2 = seed_ref[1].astype(jnp.uint32)
    rows = jax.lax.broadcasted_iota(jnp.int32, x_ref.shape, 0)

    def update(x, rng):
        u_refl = rng.uniform(dtype)
        xbar = (2.0 * u_refl[0:1] - 1.0) * _PI               # [1, C]
        u_seed = rng.uniform(dtype)                          # (0, 1]
        i0 = jnp.minimum(jnp.floor((1.0 - u_seed[0:1]) * M),
                         M - 1).astype(jnp.int32)            # [1, C]

        c = jnp.cos(x - xbar)
        s_orig = -kappa2 * c * _roll(c, -1)                  # bond (b, b+1)
        p_one = 1.0 - jnp.exp(jnp.minimum(0.0, s_orig))
        p_two = 1.0 - jnp.exp(jnp.minimum(0.0, -s_orig))

        # rel = (rows - i0) % M and rel_b = (i0 - rows) % M without mod
        d = rows - i0
        rel = d + jnp.where(d < 0, M, 0)
        rel_b = jnp.where(rel == 0, 0, M - rel)
        k_bw = jnp.where(rel_b == 0, M - 1, rel_b - 1)

        u_f = rng.uniform(dtype)
        p_f = jnp.where(rel == M - 1, p_two, p_one)
        closed_f = u_f >= p_f
        F_raw = jnp.min(jnp.where(closed_f, rel, M), axis=0,
                        keepdims=True)                       # [1, C]

        B_lim = jnp.where(F_raw >= M, 1, M - F_raw)          # [1, C]
        u_b = rng.uniform(dtype)
        term = jnp.logical_and(k_bw == B_lim - 1, F_raw < M)
        p_b = jnp.where(term, p_two, p_one)
        closed_b = u_b >= p_b
        B_raw = jnp.min(jnp.where(closed_b, k_bw, M), axis=0,
                        keepdims=True)
        B = jnp.minimum(B_raw, B_lim)                        # [1, C]

        one = jnp.int32(1)
        zero = jnp.int32(0)
        n_flips = (
            jnp.where(rel == 0, one, zero)
            + jnp.where(jnp.logical_and(rel >= 1, rel <= F_raw), one, zero)
            + jnp.where(jnp.logical_and(rel_b >= 1, rel_b <= B), one, zero)
            + jnp.where(jnp.logical_and(rel == 0, F_raw >= M), one, zero)
            + jnp.where(jnp.logical_and(rel == 0, B >= M), one, zero))
        odd = jnp.bitwise_and(n_flips, 1) == 1
        return jnp.where(odd, _mod_2pi(_PI + 2.0 * xbar - x), x)

    def body(s, x):
        def upd_body(u, x):
            rng = CounterRng(seed1, site, chain, seed2,
                             step=s * n_updates + u)
            return update(x, rng)

        x = jax.lax.fori_loop(0, n_updates, upd_body, x)
        d = _mod_2pi(_roll(x, -1) - x)
        wsum_ref[pl.ds(s, 1)] = jnp.sum(d, axis=0)[None]
        return x

    out_ref[...] = jax.lax.fori_loop(0, n_steps, body, x_ref[...])


@functools.partial(jax.jit, static_argnames=(
    "kappa2", "M", "n_steps", "n_updates", "block_chains", "interpret"))
def rotor_cluster_chain(x, seed, *, kappa2, M, n_steps, n_updates=10,
                        block_chains=128, interpret=False):
    """``n_steps`` fused cluster draws (of ``n_updates`` Wolff cluster
    updates each) in ONE kernel launch.

    x: [C, M] path angles; kappa2 = 2 I/a (the S_ell prefactor,
    rotoraction.hh:226-268).  Returns (x', wsum[n_steps, C]); the
    susceptibility QoI is (wsum/2pi)^2 / T.  Matches the distribution of
    n_steps ClusterSampler(vectorised=True).draw calls — the kernel is
    the same closed-form update with the path held in VMEM."""
    C = x.shape[0]
    if C % block_chains:
        raise ValueError(f"n_chains {C} must be a multiple of "
                         f"block_chains {block_chains}")
    check_element_capacity(M, C)
    g = x.transpose(1, 0)                                    # [M, C]
    kernel = functools.partial(
        _cluster_kernel, kappa2=float(kappa2), M=int(M),
        n_updates=int(n_updates), n_steps=int(n_steps),
        block_chains=int(block_chains))
    spec = pl.BlockSpec((M, block_chains), lambda i: (0, i),
                        memory_space=pltpu.VMEM)
    out, wsum = pl.pallas_call(
        kernel,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        grid=(C // block_chains,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), spec],
        out_specs=[spec,
                   pl.BlockSpec((n_steps, block_chains), lambda i: (0, i),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((M, C), x.dtype),
                   jax.ShapeDtypeStruct((n_steps, C), x.dtype)],
        interpret=interpret,
    )(_seed_pair(seed), g)
    return out.transpose(1, 0), wsum
