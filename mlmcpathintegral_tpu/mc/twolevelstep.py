"""Two-level Metropolis(-Hastings) step — the delayed-acceptance screen.

Reference parity: src/montecarlo/twolevelmetropolisstep.{hh,cc}.  Given a
coarse proposal theta_coarse, build the fine trial
theta' = prolongate(theta_coarse) + conditioned fill-in, and accept with

  dS = [S_f(theta') - S_f(theta)]                      (fine action ratio)
     + [S_c(restrict(theta)) - S_c(theta_coarse)]      (coarse action ratio)
     + [S_cond(theta) - S_cond(theta')]                (proposal q ratio)

(twolevelmetropolisstep.cc:35-89; derivation in the .hh header).  The fine
and conditioned action values of the current state are cached in the kernel
state exactly as the reference caches them (twolevelmetropolisstep.hh:104-108).

Everything is batched over chains: one call screens all chains in a single
fused XLA program.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class TwoLevelState(NamedTuple):
    theta: jnp.ndarray    # [C, M_fine] current fine state
    S_fine: jnp.ndarray   # [C] cached fine action of theta
    S_cond: jnp.ndarray   # [C] cached conditioned action of theta


class TwoLevelMetropolisStep:

    def __init__(self, coarse_action, fine_action, conditioned_fine_action):
        self.coarse_action = coarse_action
        self.fine_action = fine_action
        self.conditioned_fine_action = conditioned_fine_action

    def init(self, theta_fine) -> TwoLevelState:
        """Build state with caches from a full fine state [C, M_fine]."""
        return TwoLevelState(
            theta=theta_fine,
            S_fine=self.fine_action.evaluate(theta_fine),
            S_cond=self.conditioned_fine_action.evaluate(theta_fine))

    def set_state(self, state: TwoLevelState, theta_fine) -> TwoLevelState:
        """Reset the current fine state + caches
        (twolevelmetropolisstep.cc:91-97)."""
        return self.init(theta_fine)

    def draw(self, key, state: TwoLevelState, theta_coarse):
        """One screening step on all chains; theta_coarse: [C, M_coarse].
        Returns (state, accept[C])."""
        k_fill, k_acc = jax.random.split(key)
        # trial: coarse dofs prolongated, fine dofs filled in
        theta_prime = self.fine_action.prolongate(theta_coarse, state.theta)
        theta_prime = self.conditioned_fine_action.fill_fine_points(
            k_fill, theta_prime)

        S_fine_prime = self.fine_action.evaluate(theta_prime)
        dS_fine = S_fine_prime - state.S_fine

        theta_C = self.fine_action.restrict(state.theta)
        dS_coarse = (self.coarse_action.evaluate(theta_C)
                     - self.coarse_action.evaluate(theta_coarse))

        S_cond_prime = self.conditioned_fine_action.evaluate(theta_prime)
        dS_trial = state.S_cond - S_cond_prime

        dS = dS_fine + dS_coarse + dS_trial
        u = jax.random.uniform(k_acc, dS.shape, dS.dtype)
        accept = jnp.logical_or(dS < 0.0, u < jnp.exp(-dS))

        theta = jnp.where(accept[..., None], theta_prime, state.theta)
        S_fine = jnp.where(accept, S_fine_prime, state.S_fine)
        S_cond = jnp.where(accept, S_cond_prime, state.S_cond)
        return TwoLevelState(theta, S_fine, S_cond), accept
