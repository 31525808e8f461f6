"""Pallas TPU kernel: fully fused overrelax + heat-bath sweep for the
quenched Schwinger model.

The headline benchmark's hot loop is the link sweep
(quenchedschwingeraction.cc:25-66): per step, 4 overrelaxation
quarter-sweeps and 4 heat-bath quarter-sweeps with ExpCos rejection draws
over [n_chains, Mx, Mt, 2] link angles.  Under XLA each quarter-sweep is a
separate fusion with its own HBM round trip and the rejection loop is a
`lax.while_loop` barrier.  This kernel runs the ENTIRE step — all 8
quarter-sweeps plus K unrolled rejection rounds with on-core PRNG — in
VMEM: one HBM read of theta and one write per draw.

Layout: links live as [2, Mx, Mt, C_block] inside the kernel — the lattice
t-axis on sublanes, the chain axis on the 128-wide lanes.  The i-shift of
the staple stencil is a sublane roll; the j-shift is a vreg-level roll on a
major axis.  RNG = a counter-based hash generator (double murmur3
finalizer over (element id, step seed, static draw counter)) in plain
vector ops, so the SAME bit stream runs under interpret mode on CPU and
compiled on TPU; Box-Muller supplies the Gaussian envelope.

The rejection draw is truncated at ``k_rej`` rounds; stragglers keep the
current link (the exact identity-mixture argument of
distributions/rejection.py).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TWO_PI = 2.0 * math.pi
PI = math.pi
FOURPI2_INV = 1.0 / (4.0 * math.pi * math.pi)


def _mod_2pi(x):
    """[-pi, pi) wrap (utils.special.mod_2pi)."""
    return x - TWO_PI * jnp.floor(0.5 * (x + PI) / PI)


def _sh(A, di, dj, Mt):
    """A(i+di, j+dj) for A of shape [Mx, Mt, C] (axis 0 = j, axis 1 = i)."""
    out = A
    if di:
        out = pltpu.roll(out, (-di) % Mt, axis=1)
    if dj:
        out = jnp.roll(out, -dj, axis=0)
    return out


def _staples(T, X, mu, Mt):
    """(theta_p, theta_m) for direction mu (models/qft/schwinger.py
    staple_angles_mu; quenchedschwingeraction.cc:25-44)."""
    def sh(A, di, dj):
        return _sh(A, di, dj, Mt)
    if mu == 0:
        tp = _mod_2pi(sh(T, 0, 1) + X - sh(X, 1, 0))
        tm = _mod_2pi(sh(T, 0, -1) + sh(X, 1, -1) - sh(X, 0, -1))
    else:
        tp = _mod_2pi(T + sh(X, 1, 0) - sh(T, 0, 1))
        tm = _mod_2pi(sh(T, -1, 1) + sh(X, -1, 0) - sh(T, -1, 0))
    return tp, tm


from mlmcpathintegral_tpu.ops.pallas_rng import (
    CounterRng, check_element_capacity, element_ids,
)


def _parity_mask(shape, axis, parity):
    idx = jax.lax.broadcasted_iota(jnp.int32, shape, axis)
    return (idx % 2) == parity


def _expcos_rejection(rng, tau, k_rej, dtype):
    """Draw the centred variable x ~ exp(tau cos x) on [-pi, pi) by a
    mixed-envelope rejection: uniform proposals for small tau, a TIGHT
    Gaussian envelope (sigma^2 = pi^2/(4 tau); valid because
    cos x - 1 + 2 x^2/pi^2 <= 0 on [-pi, pi]) otherwise.  Per-round
    acceptance >= 0.64 for ALL tau — the reference's looser envelope
    (sigma^2 = 2 pi^2/tau, expcosdistribution.hh:50-66) accepts only
    ~23% per round at large tau and ~tau^(1/2) at small tau.
    Returns (x, accepted_mask)."""
    use_uni = tau < 0.45
    sigma = 0.5 * PI / jnp.sqrt(jnp.maximum(tau, 1e-12))
    x = jnp.zeros_like(tau)
    acc = jnp.zeros(tau.shape, jnp.bool_)
    for _ in range(k_rej):
        # 3 words per round, not 4: u2 doubles as the uniform-branch
        # proposal and the Box-Muller angle — each site consumes exactly
        # one of the two branches, so the reuse is exact (per-site the
        # consumed values are independent); the RNG is ~40% of this
        # inner loop, the hottest in the framework
        u1 = rng.uniform(dtype)
        u2 = rng.uniform(dtype)
        prop_u = PI * (2.0 * u2 - 1.0)
        prop_g = sigma * (jnp.sqrt(-2.0 * jnp.log(u1))
                          * jnp.cos(TWO_PI * u2))
        prop = jnp.where(use_uni, prop_u, prop_g)
        u = rng.uniform(dtype)
        log_ratio = tau * (jnp.cos(prop) - 1.0) + jnp.where(
            use_uni, 0.0, 2.0 * tau * prop * prop / (PI * PI))
        ok = jnp.logical_and(jnp.logical_and(-PI <= prop, prop < PI),
                             jnp.log(u) <= log_ratio)
        x = jnp.where(jnp.logical_and(ok, ~acc), prop, x)
        acc = jnp.logical_or(acc, ok)
    return x, acc


def _expcos_draw(rng, cur, tp, tm, beta, k_rej, dtype):
    """Heat-bath draw from p(x) ~ exp[beta(cos(x-tp)+cos(x-tm))], rejection
    truncated at k_rej rounds; lanes that never accept keep ``cur`` (exact
    identity-mixture, distributions/rejection.py)."""
    dx = tm - tp
    tau = 2.0 * beta * jnp.abs(jnp.cos(0.5 * dx))
    shift = 0.5 * (tp + tm) + jnp.where(jnp.abs(dx) > PI, PI, 0.0)
    x, acc = _expcos_rejection(rng, tau, k_rej, dtype)
    out = _mod_2pi(x + shift)
    return jnp.where(acc, out, cur)


def _group_update(T, X, mu, parity, new_of, Mt):
    """Apply ``new_of(cur, tp, tm)`` to the (mu, parity) link group."""
    tp, tm = _staples(T, X, mu, Mt)
    cur = T if mu == 0 else X
    new = new_of(cur, tp, tm)
    if mu == 0:   # temporal links grouped by j parity (axis 0)
        mask = _parity_mask(cur.shape, 0, parity)
        return jnp.where(mask, new, T), X
    mask = _parity_mask(cur.shape, 1, parity)   # i parity (axis 1)
    return T, jnp.where(mask, new, X)


def _one_step(T, X, rng, *, beta, Mt, n_overrelax, n_heatbath, k_rej,
              dtype):
    """One full draw: n_overrelax + n_heatbath coloured sweeps."""
    groups = [(0, 0), (0, 1), (1, 0), (1, 1)]

    def overrelax(cur, tp, tm):
        return _mod_2pi(tp + tm - cur)

    def heatbath(cur, tp, tm):
        return _expcos_draw(rng, cur, tp, tm, beta, k_rej, dtype)

    for _ in range(n_overrelax):
        for mu, parity in groups:
            T, X = _group_update(T, X, mu, parity, overrelax, Mt)
    for _ in range(n_heatbath):
        for mu, parity in groups:
            T, X = _group_update(T, X, mu, parity, heatbath, Mt)
    return T, X


def _sweep_kernel(seed_ref, theta_ref, out_ref, *, beta, Mt,
                  n_overrelax, n_heatbath, k_rej, block_chains,
                  step_offset=0):
    dtype = theta_ref.dtype
    T = theta_ref[0]
    X = theta_ref[1]

    # unique (site, chain) lane ids per (j, i, global chain) element
    site, chain = element_ids(T.shape, block_chains, pl.program_id(0))
    rng = CounterRng(seed_ref[0].astype(jnp.uint32), site, chain,
                     seed_ref[1].astype(jnp.uint32),
                     step=jnp.uint32(step_offset))
    T, X = _one_step(T, X, rng, beta=beta, Mt=Mt, n_overrelax=n_overrelax,
                     n_heatbath=n_heatbath, k_rej=k_rej, dtype=dtype)
    out_ref[0] = T
    out_ref[1] = X


def _chain_kernel(seed_ref, theta_ref, out_ref, qsum_ref, *maybe_esum,
                  beta, Mt, n_overrelax, n_heatbath, k_rej, block_chains,
                  n_steps):
    """n_steps consecutive draws with the link field resident in VMEM;
    per step only the topological sum Q = sum_P mod_2pi(theta_P) (the
    susceptibility QoI's reduction, qoi2dsusceptibility.cc:6-28) leaves
    the core — one HBM round trip of theta per n_steps draws instead of
    per draw.  With the optional esum output, the per-sweep plaquette
    energy sum_P cos(theta_P) is emitted too — the chain's SLOW mode,
    used by the MLMC t_sub clock (VERDICT r4 item 5)."""
    esum_ref = maybe_esum[0] if maybe_esum else None
    dtype = theta_ref.dtype
    site, chain = element_ids(theta_ref.shape[1:], block_chains,
                              pl.program_id(0))
    seed1 = seed_ref[0].astype(jnp.uint32)
    seed2 = seed_ref[1].astype(jnp.uint32)

    def body(s, carry):
        T, X = carry
        rng = CounterRng(seed1, site, chain, seed2, step=s)
        T, X = _one_step(T, X, rng, beta=beta, Mt=Mt,
                         n_overrelax=n_overrelax, n_heatbath=n_heatbath,
                         k_rej=k_rej, dtype=dtype)
        plaq = _mod_2pi(T + _sh(X, 1, 0, Mt) - _sh(T, 0, 1, Mt) - X)
        qsum_ref[pl.ds(s, 1)] = jnp.sum(plaq, axis=(0, 1))[None]
        if esum_ref is not None:
            esum_ref[pl.ds(s, 1)] = jnp.sum(jnp.cos(plaq),
                                            axis=(0, 1))[None]
        return T, X

    T, X = jax.lax.fori_loop(0, n_steps, body,
                             (theta_ref[0], theta_ref[1]))
    out_ref[0] = T
    out_ref[1] = X


def _to_grid(theta, C, Mt, Mx, block_chains):
    if C % block_chains:
        raise ValueError(f"n_chains {C} must be a multiple of "
                         f"block_chains {block_chains}")
    check_element_capacity(Mx * Mt, C)
    # [C, Mx, Mt, 2] -> [2, Mx, Mt, C]: lanes = chains, sublanes = t-axis
    return theta.reshape(C, Mx, Mt, 2).transpose(3, 1, 2, 0)


def _seed_pair(seed):
    seed_arr = jnp.atleast_1d(jnp.asarray(seed, jnp.int32))
    if seed_arr.shape[0] == 1:
        seed_arr = jnp.concatenate([seed_arr,
                                    jnp.zeros((1,), jnp.int32)])
    return seed_arr


@functools.partial(jax.jit, static_argnames=(
    "beta", "Mt", "Mx", "n_overrelax", "n_heatbath", "k_rej",
    "block_chains", "step_offset", "interpret"))
def schwinger_sweep(theta, seed, *, beta, Mt, Mx, n_overrelax=1,
                    n_heatbath=1, k_rej=6, block_chains=128,
                    step_offset=0, interpret=False):
    """One fused overrelax+heat-bath step on all chains.

    theta: [C, Mx*Mt*2] flat link angles (the action's state layout);
    seed: int32 scalar or (2,)-vector — per-step randomness (pass two
    words for production-length chains, see pallas_rng.CounterRng).
    ``step_offset`` selects the per-step stream of the chained kernel:
    schwinger_sweep_chain(n_steps=N) bit-matches N calls with
    step_offset=0..N-1.  Returns the new theta.
    """
    C = theta.shape[0]
    g = _to_grid(theta, C, Mt, Mx, block_chains)
    kernel = functools.partial(
        _sweep_kernel, beta=float(beta), Mt=int(Mt),
        n_overrelax=int(n_overrelax), n_heatbath=int(n_heatbath),
        k_rej=int(k_rej), block_chains=int(block_chains),
        step_offset=int(step_offset))
    out = pl.pallas_call(
        kernel,
        grid=(C // block_chains,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((2, Mx, Mt, block_chains),
                         lambda i: (0, 0, 0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((2, Mx, Mt, block_chains),
                               lambda i: (0, 0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, Mx, Mt, C), theta.dtype),
        interpret=interpret,
    )(_seed_pair(seed), g)
    return out.transpose(3, 1, 2, 0).reshape(C, Mx * Mt * 2)


@functools.partial(jax.jit, static_argnames=(
    "beta", "Mt", "Mx", "n_steps", "n_overrelax", "n_heatbath", "k_rej",
    "block_chains", "with_energy", "interpret"))
def schwinger_sweep_chain(theta, seed, *, beta, Mt, Mx, n_steps,
                          n_overrelax=1, n_heatbath=1, k_rej=6,
                          block_chains=128, with_energy=False,
                          interpret=False):
    """``n_steps`` consecutive fused draws in ONE kernel launch.

    The link field stays in VMEM across all steps; per step only the
    [C]-vector topological sum Q = sum_P mod_2pi(theta_P) is written out,
    so HBM traffic per draw drops from 2 field round trips to ~C floats.
    Returns (theta', qsum) with qsum of shape [n_steps, C] — the
    susceptibility QoI is qsum^2/(4 pi^2) (qoi.qoi_2d_susceptibility).
    With ``with_energy`` additionally returns esum [n_steps, C], the
    per-sweep plaquette energy sum_P cos(theta_P) — the configuration's
    slow mode, which the MLMC subsample clock measures so t_sub cannot
    silently under-decorrelate a mode the QoI misses (VERDICT r4 item 5).

    Bit-compatible decomposition: equals n_steps schwinger_sweep calls
    with the same seed pair and step_offset = 0..n_steps-1.
    """
    C = theta.shape[0]
    g = _to_grid(theta, C, Mt, Mx, block_chains)
    kernel = functools.partial(
        _chain_kernel, beta=float(beta), Mt=int(Mt),
        n_overrelax=int(n_overrelax), n_heatbath=int(n_heatbath),
        k_rej=int(k_rej), block_chains=int(block_chains),
        n_steps=int(n_steps))
    trace_spec = pl.BlockSpec((n_steps, block_chains), lambda i: (0, i),
                              memory_space=pltpu.VMEM)
    trace_shape = jax.ShapeDtypeStruct((n_steps, C), theta.dtype)
    outs = pl.pallas_call(
        kernel,
        # see pallas_schwinger_twolevel: lift the 16 MB scoped-VMEM cap
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        grid=(C // block_chains,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((2, Mx, Mt, block_chains),
                         lambda i: (0, 0, 0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((2, Mx, Mt, block_chains),
                         lambda i: (0, 0, 0, i), memory_space=pltpu.VMEM),
            trace_spec,
        ] + ([trace_spec] if with_energy else []),
        out_shape=[
            jax.ShapeDtypeStruct((2, Mx, Mt, C), theta.dtype),
            trace_shape,
        ] + ([trace_shape] if with_energy else []),
        interpret=interpret,
    )(_seed_pair(seed), g)
    theta_out = outs[0].transpose(3, 1, 2, 0).reshape(C, Mx * Mt * 2)
    if with_energy:
        return theta_out, outs[1], outs[2]
    return theta_out, outs[1]
