"""Pallas TPU kernel: fully fused HMC trajectory for 1-D QM actions.

The hot loop of the single-level method is the leapfrog trajectory
(hmcsampler.cc:22-69): nt+1 force evaluations over [n_chains, M] states.
Under ``lax.scan`` each step round-trips the state through HBM, making the
sampler bandwidth-bound (~21 HBM passes per draw at nt=20).  This kernel
runs the *entire* trajectory plus the Metropolis test in VMEM: one HBM
read of (x, p, u) and one write of (x_new, accept) per draw.

Layout: states are transposed to [M, C_block] inside the kernel so the
lattice axis sits on sublanes and the chain axis fills the 128-wide lanes;
the nearest-neighbour stencil is a sublane ``pltpu.roll``.

Supported actions (static ``kind``):
  * ``harmonic``: F = (m0/a)((2 + a^2 mu2) x - x_- - x_+), S = a m0/2
    [ (dx/a)^2 + mu2 x^2 ]  (harmonicoscillatoraction.cc:8-35)
  * ``quartic``:  adds a lambda/4 (x-x0)^4 potential
    (quarticoscillatoraction.cc:3-52)
  * ``rotor``:    F = (I/a)(sin(x - x_-) + sin(x - x_+)),
    S = (I/a) sum (1 - cos dx)  (rotoraction.cc:8-81)
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _roll(x, shift):
    # pltpu.roll needs a non-negative shift; the lattice size is static
    return pltpu.roll(x, shift % x.shape[0], axis=0)


def _force_and_action(kind, params):
    a = params["a_lat"]
    m0 = params["m0"]

    if kind == "harmonic":
        mu2 = params["mu2"]
        c = 2.0 + a * a * mu2

        def force(x):
            return (m0 / a) * (c * x - _roll(x, 1) - _roll(x, -1))

        def action(x):
            dx = x - _roll(x, 1)
            s = dx * dx / (a * a) + mu2 * x * x
            return 0.5 * a * m0 * jnp.sum(s, axis=0, keepdims=True)

    elif kind == "quartic":
        mu2 = params["mu2"]
        lam = params["lam"]
        x0 = params["x0"]
        c = 2.0 + a * a * mu2

        def force(x):
            xs = x - x0
            return ((m0 / a) * (c * x - _roll(x, 1) - _roll(x, -1))
                    + a * lam * xs * xs * xs)

        def action(x):
            dx = x - _roll(x, 1)
            xs2 = (x - x0) * (x - x0)
            s = m0 * (dx * dx / (a * a) + mu2 * x * x) \
                + 0.5 * lam * xs2 * xs2
            return 0.5 * a * jnp.sum(s, axis=0, keepdims=True)

    elif kind == "rotor":
        def force(x):
            return (m0 / a) * (jnp.sin(x - _roll(x, 1))
                               + jnp.sin(x - _roll(x, -1)))

        def action(x):
            dx = x - _roll(x, 1)
            return (m0 / a) * jnp.sum(1.0 - jnp.cos(dx), axis=0,
                                      keepdims=True)
    else:
        raise ValueError(f"unknown action kind '{kind}'")
    return force, action


def _trajectory_kernel(x_ref, p_ref, u_ref, dt_ref, xout_ref, acc_ref,
                       *, kind, params, nt):
    force, action = _force_and_action(kind, params)
    dt = dt_ref[0]
    x = x_ref[:]
    p = p_ref[:]
    T_cur = 0.5 * jnp.sum(p * p, axis=0, keepdims=True)
    S_cur = action(x)

    xt = x
    p = p - (0.5 * dt) * force(xt)
    xt = xt + dt * p
    for _ in range(nt - 1):
        p = p - dt * force(xt)
        xt = xt + dt * p
    p = p - (0.5 * dt) * force(xt)

    T_new = 0.5 * jnp.sum(p * p, axis=0, keepdims=True)
    dH = (action(xt) - S_cur) + (T_new - T_cur)          # [1, BC]
    accept = jnp.logical_or(dH < 0.0, u_ref[:] < jnp.exp(-dH))
    xout_ref[:] = jnp.where(accept, xt, x)
    acc_ref[:] = accept


def action_kernel_params(action):
    """(kind, params) for actions supported by the fused kernel, or
    (None, None)."""
    from mlmcpathintegral_tpu.models.harmonic import HarmonicOscillatorAction
    from mlmcpathintegral_tpu.models.quartic import QuarticOscillatorAction
    from mlmcpathintegral_tpu.models.rotor import RotorAction
    if type(action) is HarmonicOscillatorAction:
        return "harmonic", dict(m0=action.m0, mu2=action.mu2,
                                a_lat=action.a_lat)
    if type(action) is QuarticOscillatorAction:
        return "quartic", dict(m0=action.m0, mu2=action.mu2,
                               lam=action.lam, x0=action.x0,
                               a_lat=action.a_lat)
    if type(action) is RotorAction:
        return "rotor", dict(m0=action.m0, a_lat=action.a_lat)
    return None, None


@functools.partial(jax.jit, static_argnames=("kind", "nt", "block_chains",
                                             "interpret", "m0", "mu2",
                                             "lam", "x0", "a_lat"))
def hmc_trajectory(x, p, u, dt, *, kind, m0, mu2=0.0, lam=0.0, x0=0.0,
                   a_lat, nt, block_chains=512, interpret=False):
    """One fused HMC trajectory + Metropolis test on all chains.

    x, p: [C, M]; u: [C] uniforms; dt: scalar.
    Returns (x_new [C, M], accept [C] bool).
    """
    C, M = x.shape
    if C % block_chains:
        raise ValueError(f"n_chains {C} must be a multiple of "
                         f"block_chains {block_chains}")
    params = {"m0": float(m0), "mu2": float(mu2), "lam": float(lam),
              "x0": float(x0), "a_lat": float(a_lat)}
    xT = x.T                      # [M, C]
    pT = p.T
    uB = u[None, :]               # [1, C]
    dt_arr = jnp.asarray([dt], x.dtype)

    kernel = functools.partial(_trajectory_kernel, kind=kind, params=params,
                               nt=int(nt))
    grid = (C // block_chains,)
    xout, acc = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((M, block_chains), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((M, block_chains), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_chains), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((M, block_chains), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_chains), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((M, C), x.dtype),
            jax.ShapeDtypeStruct((1, C), jnp.bool_),
        ],
        interpret=interpret,
    )(xT, pT, uB, dt_arr)
    return xout.T, acc[0]
