"""Pallas TPU kernel: fully fused QM two-level Metropolis chain.

The QM two-level method (twolevelmetropolisstep.cc:35-89 driven by
montecarlotwolevel.cc:38-94) alternates tau-subsampled coarse HMC
trajectories (hmcsampler.cc:22-69) with the delayed-acceptance screen:
prolongate the coarse path, fill the odd sites from the Gaussian
conditional N(Wminimum, 1/Wcurvature)
(gaussianconditionedfineaction.cc:7-43), and accept on the three-term
dS.  Unfused, every HMC trajectory is its own kernel launch with
host-side (threefry) noise and the screen another handful — at M=64 the
method is launch- and RNG-bound, not FLOP-bound.

This kernel runs a WHOLE chunk of the chain in VMEM: n_steps x (t_sub
leapfrog trajectories + fill + screen) with the counter RNG drawing all
noise in-kernel, one HBM round trip per chunk.  The fine path is stored
as separate even/odd site planes [Mc, C] (prolongation writes the even
plane, the fill the odd plane — no interleaved scatter), so the fine
action is evaluated on the same [Mc, C] tiles as the coarse one.

Per-trajectory traces of the coarse QoI and the coarse action energy
feed the host-side t_sub clock (max of tau_QoI and tau_slow, the
slow-mode rule of mc/twolevel.py) and the coarse-sampler statistics.

Supported fine actions: harmonic / quartic oscillator — one code path;
lam = 0 reduces the quartic formulas (incl. the Wminimum fixed-point
iteration, quarticoscillatoraction.hh:170-200) exactly to the harmonic
ones.
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


def _roll(x, shift):
    return pltpu.roll(x, shift % x.shape[0], axis=0)


def _coarse_force(x, *, m0, mu2, lam, x0, a):
    c = 2.0 + a * a * mu2
    xs = x - x0
    return ((m0 / a) * (c * x - _roll(x, 1) - _roll(x, -1))
            + a * lam * xs * xs * xs)


def _coarse_action(x, *, m0, mu2, lam, x0, a):
    """S = a/2 sum [ m0 (dx/a)^2 + m0 mu2 x^2 + lam/2 (x-x0)^4 ]; [1, C]."""
    dx = x - _roll(x, 1)
    xs2 = (x - x0) * (x - x0)
    s = m0 * (dx * dx / (a * a) + mu2 * x * x) + 0.5 * lam * xs2 * xs2
    return 0.5 * a * jnp.sum(s, axis=0, keepdims=True)


def _fine_action(xe, xo, *, m0, mu2, lam, x0, a):
    """Same action on the split even/odd planes: site 2j has neighbour
    pair (xo_{j-1}, xo_j); site 2j+1 the pair (xe_j, xe_{j+1})."""
    d1 = xo - xe                      # dx at odd sites
    d2 = _roll(xo, 1) - xe           # dx entering even site j (from 2j-1)
    xe2, xo2 = xe * xe, xo * xo
    qe = (xe - x0) * (xe - x0)
    qo = (xo - x0) * (xo - x0)
    s = (m0 * ((d1 * d1 + d2 * d2) / (a * a) + mu2 * (xe2 + xo2))
         + 0.5 * lam * (qe * qe + qo * qo))
    return 0.5 * a * jnp.sum(s, axis=0, keepdims=True)


def _w_min_curv(x_m, x_p, *, m0, mu2, lam, x0, a):
    """Wminimum (4-step fixed point) and Wcurvature of the single-site
    conditioned action at fine spacing ``a``
    (quarticoscillatoraction.hh:170-200; lam=0 -> harmonic closed form)."""
    xbar = 0.5 * (x_m + x_p)
    rho = 1.0 / (1.0 + 0.5 * a * a * mu2)
    cc = 0.5 * a * a * lam / m0
    x = xbar
    for _ in range(4):
        xs = x - x0
        x = rho * (xbar - cc * xs * xs * xs)
    # curvature at xbar, matching getWcurvature
    # (quarticoscillatoraction.hh:170-180)
    xs = xbar - x0
    curv = (2.0 / a + a * mu2) * m0 + 3.0 * lam * a * xs * xs
    return x, curv


def _qm_twolevel_kernel(seed_ref, dt_ref, fine_ref, coarse_ref, scache_ref,
                        fine_out, coarse_out, scache_out,
                        qf_ref, qc_ref, cs_ref, ec_ref, acc_ref, *,
                        m0, mu2, lam, x0, a, nt, n_steps, t_sub,
                        block_chains, with_traces):
    dtype = fine_ref.dtype
    Mc = coarse_ref.shape[0]
    M = 2 * Mc
    cp = dict(m0=m0, mu2=mu2, lam=lam, x0=x0, a=2.0 * a)   # coarse spacing
    fp = dict(m0=m0, mu2=mu2, lam=lam, x0=x0, a=a)
    site, chain = element_ids((Mc, block_chains), block_chains,
                              pl.program_id(0))
    seed1 = seed_ref[0].astype(jnp.uint32)
    seed2 = seed_ref[1].astype(jnp.uint32)
    dt = dt_ref[0]
    inv_M = 1.0 / M
    inv_Mc = 1.0 / Mc

    # per-chain quantities stay rank-2 [1, C] (Mosaic layout inference,
    # see ops/pallas_schwinger_twolevel.py NOTE on ranks)
    def body(s, carry):
        xe, xo, xc, S_f, S_q = carry
        base = s * (t_sub + 1)

        # ---- t_sub coarse HMC trajectories (hmcsampler.cc:22-69) ----
        def traj_body(t, xc):
            rng = CounterRng(seed1, site, chain, seed2, step=base + t)
            p = rng.normal(dtype)
            T_cur = 0.5 * jnp.sum(p * p, axis=0, keepdims=True)
            S_cur = _coarse_action(xc, **cp)
            xt = xc
            p = p - (0.5 * dt) * _coarse_force(xt, **cp)
            xt = xt + dt * p
            for _ in range(nt - 1):
                p = p - dt * _coarse_force(xt, **cp)
                xt = xt + dt * p
            p = p - (0.5 * dt) * _coarse_force(xt, **cp)
            S_new = _coarse_action(xt, **cp)
            dH = (S_new - S_cur) + (0.5 * jnp.sum(p * p, axis=0,
                                                  keepdims=True) - T_cur)
            u = rng.uniform(dtype)[0:1]
            accept = jnp.logical_or(dH < 0.0, u < jnp.exp(-dH))
            xc = jnp.where(accept, xt, xc)
            if with_traces:
                # clock traces: coarse QoI x^2 (the reference's subsample
                # rule) and the coarse action energy (slow-mode check)
                cs_ref[pl.ds(s * t_sub + t, 1)] = \
                    inv_Mc * jnp.sum(xc * xc, axis=0, keepdims=True)
                ec_ref[pl.ds(s * t_sub + t, 1)] = \
                    jnp.where(accept, S_new, S_cur)
            return xc

        xc = jax.lax.fori_loop(0, t_sub, traj_body, xc)

        # ---- trial: prolongate + Gaussian conditional fill ----
        rng = CounterRng(seed1, site, chain, seed2, step=base + t_sub)
        wmin, curv = _w_min_curv(xc, _roll(xc, -1), **fp)
        xo_t = wmin + rng.normal(dtype) * jax.lax.rsqrt(curv)
        log_curv = jnp.log(curv)
        S_q_trial = jnp.sum(0.5 * curv * (xo_t - wmin) * (xo_t - wmin)
                            - 0.5 * log_curv, axis=0, keepdims=True)
        S_f_trial = _fine_action(xc, xo_t, **fp)

        # ---- three-term dS (twolevelmetropolisstep.cc:35-89) ----
        dS_coarse = (_coarse_action(xe, **cp)[0:1]
                     - _coarse_action(xc, **cp)[0:1])
        dS = (S_f_trial - S_f) + dS_coarse + (S_q - S_q_trial)
        u_acc = rng.uniform(dtype)[0:1]
        accept = jnp.logical_or(dS < 0.0, u_acc < jnp.exp(-dS))

        xe = jnp.where(accept, xc, xe)
        xo = jnp.where(accept, xo_t, xo)
        S_f = jnp.where(accept, S_f_trial, S_f)
        S_q = jnp.where(accept, S_q_trial, S_q)

        # ---- emit QoI traces ----
        qf_ref[pl.ds(s, 1)] = inv_M * (jnp.sum(xe * xe, axis=0,
                                               keepdims=True)
                                       + jnp.sum(xo * xo, axis=0,
                                                 keepdims=True))
        qc_ref[pl.ds(s, 1)] = inv_Mc * jnp.sum(xc * xc, axis=0,
                                               keepdims=True)
        acc_ref[pl.ds(s, 1)] = accept.astype(dtype)
        return xe, xo, xc, S_f, S_q

    carry = (fine_ref[0], fine_ref[1], coarse_ref[:],
             scache_ref[pl.ds(0, 1)], scache_ref[pl.ds(1, 1)])
    if not with_traces:
        # dummy [1, C] trace outputs still need defined contents
        cs_ref[:] = jnp.zeros_like(cs_ref)
        ec_ref[:] = jnp.zeros_like(ec_ref)
    xe, xo, xc, S_f, S_q = jax.lax.fori_loop(0, n_steps, body, carry)
    fine_out[0] = xe
    fine_out[1] = xo
    coarse_out[:] = xc
    scache_out[pl.ds(0, 1)] = S_f
    scache_out[pl.ds(1, 1)] = S_q


@functools.partial(jax.jit, static_argnames=(
    "m0", "mu2", "lam", "x0", "a_lat", "nt", "n_steps", "t_sub",
    "block_chains", "interpret", "with_traces"))
def qm_twolevel_chain(fine, x_coarse, s_cache, dt, seed, *,
                      m0, mu2, lam=0.0, x0=0.0, a_lat, nt, n_steps,
                      t_sub, block_chains=512, interpret=False,
                      with_traces=True):
    """Run n_steps of the fused QM two-level chain on all chains.

    fine:     [2, C, Mc] even/odd site planes of the current fine path
    x_coarse: [C, Mc] coarse HMC chain state
    s_cache:  [2, C] cached (S_fine, S_cond) of the current fine path
    dt:       scalar HMC step size (traced; autotuned on host)
    seed:     (2,) int32

    Returns (fine, x_coarse, s_cache, qf [n_steps, C], qc [n_steps, C],
    cs [n_steps*t_sub, C], ec [n_steps*t_sub, C], acc [n_steps, C])
    where cs/ec are the per-trajectory coarse QoI / energy clock traces.
    With ``with_traces=False`` the clock traces are skipped (returned as
    [1, C] dummies) — the sampling phase only needs them during the
    burn-in/clock chunks, and at large t_sub they dominate the kernel's
    VMEM footprint.
    """
    _, C, Mc = fine.shape
    if C % block_chains:
        raise ValueError(f"n_chains {C} must be a multiple of "
                         f"block_chains {block_chains}")
    check_element_capacity(Mc, C)
    fT = fine.transpose(0, 2, 1)               # [2, Mc, C]
    xcT = x_coarse.T                           # [Mc, C]
    seed_arr = jnp.asarray(seed, jnp.int32)
    dt_arr = jnp.asarray([dt], fine.dtype)
    kernel = functools.partial(
        _qm_twolevel_kernel, m0=float(m0), mu2=float(mu2), lam=float(lam),
        x0=float(x0), a=float(a_lat), nt=int(nt), n_steps=int(n_steps),
        t_sub=int(t_sub), block_chains=int(block_chains),
        with_traces=bool(with_traces))
    blk = block_chains
    n_traj = n_steps * t_sub if with_traces else 1
    fine_spec = pl.BlockSpec((2, Mc, blk), lambda i: (0, 0, i),
                             memory_space=pltpu.VMEM)
    coarse_spec = pl.BlockSpec((Mc, blk), lambda i: (0, i),
                               memory_space=pltpu.VMEM)
    scache_spec = pl.BlockSpec((2, blk), lambda i: (0, i),
                               memory_space=pltpu.VMEM)
    step_spec = pl.BlockSpec((n_steps, blk), lambda i: (0, i),
                             memory_space=pltpu.VMEM)
    traj_spec = pl.BlockSpec((n_traj, blk), lambda i: (0, i),
                             memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(C // blk,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  fine_spec, coarse_spec, scache_spec],
        out_specs=[fine_spec, coarse_spec, scache_spec,
                   step_spec, step_spec, traj_spec, traj_spec, step_spec],
        out_shape=[
            jax.ShapeDtypeStruct((2, Mc, C), fine.dtype),
            jax.ShapeDtypeStruct((Mc, C), fine.dtype),
            jax.ShapeDtypeStruct((2, C), fine.dtype),
            jax.ShapeDtypeStruct((n_steps, C), fine.dtype),
            jax.ShapeDtypeStruct((n_steps, C), fine.dtype),
            jax.ShapeDtypeStruct((n_traj, C), fine.dtype),
            jax.ShapeDtypeStruct((n_traj, C), fine.dtype),
            jax.ShapeDtypeStruct((n_steps, C), fine.dtype),
        ],
        interpret=interpret,
    )(seed_arr, dt_arr, fT, xcT, s_cache)
    f, xc, sc, qf, qc, cs, ec, acc = out
    return (f.transpose(0, 2, 1), xc.T, sc, qf, qc, cs, ec, acc)
