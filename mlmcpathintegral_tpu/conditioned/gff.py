"""GFF conditioned fine action.

Reference parity: src/action/qft/gffconditionedfineaction.{hh,cc}.  Fill
the fine-only vertices from the exact single-site conditional of the
5-point stencil, phi ~ N(Delta/(4+mu2), 1/(4+mu2)); evaluate is the sum of
the matching Gaussian energies (the constant -1/2 log kappa normalisation is
site-independent and cancels in all two-level Delta-S differences, so the
reference omits it and so do we).

The reference fills the fine-only vertices *sequentially*
(gffconditionedfineaction.cc:7-25), which is only self-consistent when all
4 nearest neighbours of every fine-only vertex are coarse vertices — true
exactly for the CoarsenRotate hierarchy it is used with.  This
implementation vectorises the fill over all fine-only vertices at once and
asserts that independence property at construction.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from mlmcpathintegral_tpu.conditioned.base import ConditionedFineAction


class GFFConditionedFineAction(ConditionedFineAction):

    def __init__(self, action):
        super().__init__(action)
        lat = action.lattice
        self.mu2 = action.mu2
        self._fineonly = lat.fineonly_vertices
        self._nn_fine = lat.neighbour_vertices[self._fineonly, :4]
        coarse = np.zeros(lat.nvertices, bool)
        coarse[lat.coarse_vertices] = True
        if not coarse[self._nn_fine].all():
            raise ValueError(
                "GFF conditioned fill-in needs every fine-only vertex to "
                "have only coarse nearest neighbours (use CoarsenRotate, "
                "cf. gffconditionedfineaction.cc:7-25)")

    def fill_fine_points(self, key, phi):
        kappa = 4.0 + self.mu2
        sigma = 1.0 / math.sqrt(kappa)
        delta = jnp.sum(phi[..., self._nn_fine], axis=-1)
        xi = jax.random.normal(key, delta.shape, phi.dtype)
        return phi.at[..., self._fineonly].set(sigma * (xi + sigma * delta))

    def evaluate(self, phi):
        kappa = 4.0 + self.mu2
        delta = jnp.sum(phi[..., self._nn_fine], axis=-1)
        dphi = phi[..., self._fineonly] - delta / kappa
        return 0.5 * kappa * jnp.sum(dphi * dphi, axis=-1)
