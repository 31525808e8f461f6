"""Sampler protocol: pure batched kernels (key, state) -> (state, accept).

The reference's ``Sampler : MCMCStep`` OO hierarchy
(src/sampler/sampler.hh:20-43, src/montecarlo/mcmcstep.hh:21-72) becomes a
family of objects whose ``draw`` is a pure function over a batched sampler
state pytree (a NamedTuple whose leading axis is the chain batch).  Accept /
reject bookkeeping (n_total, n_accepted, p_accept) is returned per draw as a
boolean [n_chains] array and accumulated by the Monte-Carlo drivers inside
their scan carries — the functional analog of MCMCStep's counters.
"""

from __future__ import annotations

import abc

import jax.numpy as jnp


def default_dtype():
    """float64 when jax x64 is enabled, else float32."""
    return jnp.zeros(0).dtype


class Sampler(abc.ABC):
    """Batched sampler over an action."""

    def __init__(self, action):
        self.action = action

    @abc.abstractmethod
    def init(self, key, n_chains: int, dtype=None):
        """Fresh sampler state pytree with an ``x: [n_chains, ndof]`` leaf."""

    @abc.abstractmethod
    def draw(self, key, state):
        """One draw on all chains: (state, accept[n_chains] bool)."""

    def set_state(self, state, x):
        """Replace the current position (MCMCStep::set_state).  Samplers with
        cached action values must override to refresh their caches."""
        return state._replace(x=x)

    def x_of(self, state):
        """Current position [n_chains, ndof] of a sampler state."""
        return state.x

    def prepare(self, key, n_chains: int, dtype=None, n_burnin: int = 0):
        """Initialise + burn in (the work the reference does in sampler
        constructors, e.g. hmcsampler.hh:95-109)."""
        import jax
        k_init, k_burn = jax.random.split(key)
        state = self.init(k_init, n_chains, dtype)
        if n_burnin > 0:
            def body(s, k):
                s, _ = self.draw(k, s)
                return s, None
            keys = jax.random.split(k_burn, n_burnin)
            state, _ = jax.lax.scan(body, state, keys)
        return state
