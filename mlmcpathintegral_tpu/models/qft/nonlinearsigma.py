"""O(3) non-linear sigma model on a 2-D lattice.

S[sigma] = -beta/2 sum_n sigma_n . Delta_n, where Delta_n is the sum of the
4 nearest-neighbour unit spins; states store the spherical angles
(theta, phi) per vertex as a flat [C, 2*N] array.

Reference parity: src/action/qft/nonlinearsigmaaction.{hh,cc},
nonlinearsigmarenormalisation.hh, qoi2dmagneticsusceptibility.cc.
Requires the CoarsenRotate hierarchy (nonlinearsigmaaction.hh:143-151);
multilevel is not supported for this model, matching driver_qft.cc:406-411.

TPU-first: the heat-bath/overrelaxation updates are vectorised over
red/black vertex colour groups (each spin's conditional depends only on its
4 nearest neighbours, which always have the opposite colour on both the
rotated and unrotated members of the rotate hierarchy); the Eigen vector
geometry (perpendicular-vector choice, axis-angle rotation) becomes batched
3-vector algebra with a Rodrigues rotation.
"""

from __future__ import annotations

import math
from functools import cached_property

import jax
import jax.numpy as jnp
import numpy as np

from mlmcpathintegral_tpu.distributions.compactexp import CompactExpDistribution
from mlmcpathintegral_tpu.lattice2d import CoarseningType, Lattice2D
from mlmcpathintegral_tpu.models.base import Action, RenormalisationType


def angles_to_vec(state):
    """[..., 2N] (theta, phi) pairs -> [..., N, 3] unit vectors."""
    ang = state.reshape(*state.shape[:-1], -1, 2)
    theta, phi = ang[..., 0], ang[..., 1]
    st = jnp.sin(theta)
    return jnp.stack([st * jnp.cos(phi), st * jnp.sin(phi),
                      jnp.cos(theta)], axis=-1)


def vec_to_angles(vec):
    """[..., N, 3] -> [..., 2N] (theta, phi); matches the reference's
    atan2-based conversion (nonlinearsigmaaction.cc:69-72)."""
    phi = jnp.arctan2(vec[..., 1], vec[..., 0])
    theta = jnp.arctan2(
        jnp.sqrt(vec[..., 0] ** 2 + vec[..., 1] ** 2), vec[..., 2])
    out = jnp.stack([theta, phi], axis=-1)
    return out.reshape(*out.shape[:-2], -1)


class NonlinearSigmaAction(Action):

    def __init__(self, lattice: Lattice2D, beta: float,
                 renormalisation: RenormalisationType =
                 RenormalisationType.NONE):
        if lattice.coarsening_type is not CoarseningType.ROTATE:
            raise ValueError("sigma model needs CoarsenRotate "
                             "(nonlinearsigmaaction.hh:143-151)")
        self.lattice = lattice
        self.beta = float(beta)
        self.renormalisation = renormalisation

    @property
    def ndof(self) -> int:
        return 2 * self.lattice.nvertices

    # -- geometry helpers ------------------------------------------------------

    @cached_property
    def _nn(self) -> np.ndarray:
        return self.lattice.neighbour_vertices[:, :4]

    @cached_property
    def _colour_masks(self):
        ell = np.arange(self.lattice.nvertices)
        i, j = self.lattice.vertex_lin2cart(ell)
        red = (i % 2 == 0) if self.lattice.rotated else ((i + j) % 2 == 0)
        return np.flatnonzero(red), np.flatnonzero(~red)

    def delta_neighbours(self, vec):
        """Sum of the 4 nearest-neighbour spins: [..., N, 3]."""
        return jnp.sum(vec[..., self._nn, :], axis=-2)

    # -- action ----------------------------------------------------------------

    def evaluate(self, state):
        vec = angles_to_vec(state)
        delta = self.delta_neighbours(vec)
        return -0.5 * self.beta * jnp.sum(vec * delta, axis=(-2, -1))

    def force(self, state):
        """dS/d(theta, phi) (nonlinearsigmaaction.cc:96-116); equals
        grad(evaluate)."""
        ang = state.reshape(*state.shape[:-1], -1, 2)
        theta, phi = ang[..., 0], ang[..., 1]
        delta = self.delta_neighbours(angles_to_vec(state))
        ct, st = jnp.cos(theta), jnp.sin(theta)
        cp, sp = jnp.cos(phi), jnp.sin(phi)
        dS_dtheta = -self.beta * ((delta[..., 0] * cp
                                   + delta[..., 1] * sp) * ct
                                  - delta[..., 2] * st)
        dS_dphi = -self.beta * (-delta[..., 0] * sp
                                + delta[..., 1] * cp) * st
        out = jnp.stack([dS_dtheta, dS_dphi], axis=-1)
        return out.reshape(*state.shape)

    def initialise_state(self, key, n_chains, dtype=None):
        """Random unit spins (the reference draws uniformly in a shell then
        normalises through the angle conversion,
        nonlinearsigmaaction.cc:142-163; a direct Gaussian-normalised draw
        gives the same uniform distribution on the sphere)."""
        if dtype is None:
            dtype = jnp.zeros(0).dtype
        N = self.lattice.nvertices
        v = jax.random.normal(key, (n_chains, N, 3), dtype)
        v = v / jnp.linalg.norm(v, axis=-1, keepdims=True)
        return vec_to_angles(v)

    # -- heat bath / overrelaxation --------------------------------------------

    @staticmethod
    def _perp(delta_hat):
        """Batched 'best perpendicular' unit vector
        (nonlinearsigmaaction.cc:36-59): zero the absolutely-smallest
        component and rotate the other two."""
        a = jnp.abs(delta_hat)
        idx = jnp.argmin(a, axis=-1)
        amin = jnp.take_along_axis(a, idx[..., None], axis=-1)[..., 0]
        rho_inv = 1.0 / jnp.sqrt(jnp.maximum(1.0 - amin * amin, 1e-30))
        d0, d1, d2 = delta_hat[..., 0], delta_hat[..., 1], delta_hat[..., 2]
        z = jnp.zeros_like(d0)
        p0 = jnp.stack([z, -d2 * rho_inv, +d1 * rho_inv], axis=-1)
        p1 = jnp.stack([-d2 * rho_inv, z, +d0 * rho_inv], axis=-1)
        p2 = jnp.stack([+d1 * rho_inv, -d0 * rho_inv, z], axis=-1)
        sel = jax.nn.one_hot(idx, 3, dtype=delta_hat.dtype)
        return (sel[..., 0:1] * p0 + sel[..., 1:2] * p1
                + sel[..., 2:3] * p2)

    @staticmethod
    def _rodrigues(v, axis, angle):
        """Rotate v around the unit vector axis by angle."""
        c = jnp.cos(angle)[..., None]
        s = jnp.sin(angle)[..., None]
        dot = jnp.sum(axis * v, axis=-1, keepdims=True)
        return v * c + jnp.cross(axis, v) * s + axis * dot * (1.0 - c)

    def _heatbath_colour(self, key, vec, colour):
        """Exact conditional redraw of the spins of one colour group
        (nonlinearsigmaaction.cc:24-73)."""
        delta = self.delta_neighbours(vec)[..., colour, :]
        nrm = jnp.linalg.norm(delta, axis=-1)
        delta_hat = delta / jnp.maximum(nrm, 1e-30)[..., None]
        k1, k2 = jax.random.split(key)
        sig_par = CompactExpDistribution.draw(k1, self.beta * nrm)
        sig_perp = jnp.sqrt(jnp.maximum(1.0 - sig_par * sig_par, 0.0))
        perp = self._perp(delta_hat)
        new = sig_par[..., None] * delta_hat + sig_perp[..., None] * perp
        az = jax.random.uniform(k2, nrm.shape, vec.dtype,
                                -math.pi, math.pi)
        new = self._rodrigues(new, delta_hat, az)
        return vec.at[..., colour, :].set(new)

    def heatbath_sweep(self, key, state):
        vec = angles_to_vec(state)
        for colour, k in zip(self._colour_masks, jax.random.split(key)):
            vec = self._heatbath_colour(k, vec, colour)
        return vec_to_angles(vec)

    def overrelaxation_sweep(self, state):
        """Reflect each spin about the neighbour-sum direction
        (nonlinearsigmaaction.cc:76-94)."""
        vec = angles_to_vec(state)
        for colour in self._colour_masks:
            delta = self.delta_neighbours(vec)[..., colour, :]
            delta_hat = delta / jnp.maximum(
                jnp.linalg.norm(delta, axis=-1), 1e-30)[..., None]
            s = vec[..., colour, :]
            dot = jnp.sum(s * delta_hat, axis=-1, keepdims=True)
            vec = vec.at[..., colour, :].set(2.0 * dot * delta_hat - s)
        return vec_to_angles(vec)

    # -- cluster hooks (nonlinearsigmaaction.cc:166-210) -----------------------

    @staticmethod
    def new_reflection(key, n_chains, dtype=None):
        """Uniform random unit reflection vector per chain: [C, 3]."""
        if dtype is None:
            dtype = jnp.zeros(0).dtype
        v = jax.random.normal(key, (n_chains, 3), dtype)
        return v / jnp.linalg.norm(v, axis=-1, keepdims=True)

    def S_ell_vec(self, vec_i, vec_j, r):
        """Bond energy -2 beta (r.sigma_i)(r.sigma_j); r: [..., 3]."""
        return (-2.0 * self.beta * jnp.sum(r * vec_i, axis=-1)
                * jnp.sum(r * vec_j, axis=-1))

    @staticmethod
    def flip_vec(vec, r):
        """sigma -> sigma - 2 (sigma.r) r."""
        return vec - 2.0 * jnp.sum(vec * r, axis=-1, keepdims=True) * r

    # -- multigrid -------------------------------------------------------------

    def _dof_map(self, vertex_idx):
        """(theta, phi) dof indices of the given vertices."""
        return np.stack([2 * vertex_idx, 2 * vertex_idx + 1],
                        axis=-1).reshape(-1)

    def prolongate(self, state_coarse, state_fine):
        lat = self.lattice
        src = self._dof_map(lat.fine2coarse)
        dst = self._dof_map(lat.coarse_vertices)
        return state_fine.at[..., dst].set(state_coarse[..., src])

    def restrict(self, state_fine):
        lat = self.lattice
        clat = lat.coarse_lattice()
        inv = np.empty(clat.nvertices, dtype=np.int64)
        inv[lat.fine2coarse] = lat.coarse_vertices
        return state_fine[..., self._dof_map(inv)]

    def coarse_action(self) -> "NonlinearSigmaAction":
        """beta^c = beta - log(2)/(4 pi) for perturbative renormalisation
        (nonlinearsigmarenormalisation.hh:58-76)."""
        if self.renormalisation is RenormalisationType.PERTURBATIVE:
            beta_c = self.beta - 0.5 * math.log(2.0) / (2.0 * math.pi)
        elif self.renormalisation is RenormalisationType.NONPERTURBATIVE:
            raise NotImplementedError(
                "nonperturbative renormalisation not implemented for the "
                "sigma model (matches reference)")
        else:
            beta_c = self.beta
        return NonlinearSigmaAction(self.lattice.coarse_lattice(), beta_c,
                                    self.renormalisation)

    def info_string(self):
        return f"NonlinearSigma({self.lattice}, beta={self.beta})"


def qoi_magnetic_susceptibility(action):
    """|sum_n sigma_n|^2 / N (qoi2dmagneticsusceptibility.cc:6-21)."""
    def evaluate(state):
        vec = angles_to_vec(state)
        mu = jnp.sum(vec, axis=-2)
        return jnp.sum(mu * mu, axis=-1) / (action.lattice.nvertices)
    return evaluate
