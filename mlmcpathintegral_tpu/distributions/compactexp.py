"""CompactExp distribution: p(x) = sigma e^{sigma x} / (2 sinh sigma) on
[-1, 1] — exact inverse-CDF sampling.

Reference parity: src/distribution/compactexpdistribution.{hh,cc}.  Used by
the O(3) sigma-model heat bath for the spin projection onto the
neighbour-sum direction (nonlinearsigmaaction.cc:60).

The inverse transform x = sigma^-1 log[u e^sigma + (1-u) e^-sigma] is
rewritten as x = 1 + sigma^-1 log[u + (1-u) e^{-2 sigma}] for numerical
stability at large sigma.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


class CompactExpDistribution:

    @staticmethod
    def draw(key, sigma, shape=None, dtype=None):
        sigma = jnp.asarray(sigma)
        if shape is None:
            shape = sigma.shape
        if dtype is None:
            dtype = sigma.dtype
        sig = jnp.broadcast_to(sigma, shape).astype(dtype)
        u = jax.random.uniform(key, shape, dtype)
        return 1.0 + jnp.log(u + (1.0 - u) * jnp.exp(-2.0 * sig)) / sig

    @staticmethod
    def log_evaluate(x, sigma):
        """log p(x; sigma) = log sigma + sigma x - log(2 sinh sigma),
        stable for large sigma via 2 sinh(s) = e^s (1 - e^{-2s})."""
        return (jnp.log(sigma) + sigma * x - sigma
                - jnp.log1p(-jnp.exp(-2.0 * sigma)))

    @staticmethod
    def evaluate(x, sigma):
        return jnp.exp(CompactExpDistribution.log_evaluate(x, sigma))
