"""Wolff single-cluster sampler for 1-D cluster actions (rotor).

Reference parity: src/sampler/clustersampler.{hh,cc}; the 1-D specialised
bidirectional walk (clustersampler.cc:92-132) is reproduced exactly as a
bounded ``lax.scan``: from a random seed the cluster grows site by site to
the right until a bond fails (or the walk wraps to the seed), then to the
left until a bond fails (or the walk reaches the last forward site) —
including the reference's boundary behaviour when the cluster wraps the full
circle.  Each scan step is a cheap [n_chains] vector op, so thousands of
chains walk their clusters in lockstep.

The action must provide the ClusterAction hooks (rotoraction.hh:226-268):
``new_reflection(key, n_chains, dtype)``, ``S_ell(x_i, x_j, xbar)``,
``flip(x, xbar)``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from mlmcpathintegral_tpu.samplers.base import Sampler, default_dtype


class ClusterState(NamedTuple):
    x: jnp.ndarray   # [C, M]


class ClusterSampler(Sampler):

    def __init__(self, action, n_burnin: int = 100, n_updates: int = 10):
        super().__init__(action)
        self.n_burnin = int(n_burnin)
        self.n_updates = int(n_updates)

    def init(self, key, n_chains, dtype=None):
        dtype = dtype or default_dtype()
        return ClusterState(x=self.action.initialise_state(key, n_chains,
                                                           dtype))

    # -- single 1-D cluster update (clustersampler.cc:92-132) ------------------

    def _single_cluster_update(self, key, x):
        act = self.action
        C, M = x.shape
        k_refl, k_seed, k_fwd, k_bwd = jax.random.split(key, 4)
        xbar = act.new_reflection(k_refl, C, x.dtype)          # [C]
        i0 = jax.random.randint(k_seed, (C,), 0, M)            # [C]

        chain = jnp.arange(C)
        # flip the seed site
        x = x.at[chain, i0].set(act.flip(x[chain, i0], xbar))

        def walk(x, key, start, direction, stop_at, extra_guard):
            """Sequential bonded walk. From position i, bond to
            i+direction; flip the neighbour if bonded; stop on first
            unbonded link or when the next position hits ``stop_at``.
            ``extra_guard(step)`` bounds the trip count. Returns
            (x, last_position_reached)."""
            def body(carry, k):
                x, pos, active, last = carry
                nxt = (pos + direction) % M
                s_ell = act.S_ell(x[chain, pos], x[chain, nxt], xbar)
                p_connect = 1.0 - jnp.exp(jnp.minimum(0.0, -s_ell))
                u = jax.random.uniform(k, (C,), x.dtype)
                bonded = jnp.logical_and(active, u < p_connect)
                flipped = act.flip(x[chain, nxt], xbar)
                x = x.at[chain, nxt].set(
                    jnp.where(bonded, flipped, x[chain, nxt]))
                # the reference records the position *before* the final
                # advance as i_last (clustersampler.cc:103-113)
                last = jnp.where(active, pos, last)
                pos = jnp.where(bonded, nxt, pos)
                active = jnp.logical_and(bonded, nxt != stop_at)
                return (x, pos, active, last), None

            keys = jax.random.split(key, M)
            active0 = jnp.ones((C,), bool)
            (x, pos, _, last), _ = jax.lax.scan(
                body, (x, start, active0, start), keys)
            return x, pos, last

        # forward walk: stop when wrapping back to the seed
        x, i_p, i_last_p = walk(x, k_fwd, i0, +1, i0, None)
        # backward walk: stop when reaching the last forward position
        x, _, _ = walk(x, k_bwd, i0, -1, i_last_p, None)
        return x

    def draw(self, key, state: ClusterState):
        x = state.x
        if self.n_updates == 1:
            x = self._single_cluster_update(key, x)
        else:
            def body(x, k):
                return self._single_cluster_update(k, x), None
            keys = jax.random.split(key, self.n_updates)
            x, _ = jax.lax.scan(body, x, keys)
        accept = jnp.ones(x.shape[:-1], bool)
        return ClusterState(x=x), accept

    def prepare(self, key, n_chains, dtype=None):
        return super().prepare(key, n_chains, dtype, self.n_burnin)
