"""Overrelaxed heat-bath sampler with checkerboard sweeps.

Reference parity: src/sampler/overrelaxedheatbathsampler.{hh,cc} —
n_sweep_overrelax overrelaxation sweeps followed by n_sweep_heatbath
heat-bath sweeps, delegating the per-site update to the action
(overrelaxedheatbathsampler.cc:8-31).

TPU-first design: the reference sweeps sites sequentially in random or
lexicographic order; a sequential sweep is poison on SIMD hardware.  Here a
sweep is *checkerboarded*: all even sites update simultaneously conditioned
on the odd sites, then all odd sites (each half-sweep is an exact product of
independent conditional draws, so the invariant distribution is unchanged —
only the deterministic site ordering differs from the reference; cf.
SURVEY.md §7.5).  Each half-sweep is one fused XLA kernel over
[n_chains, M/2] sites.

For actions whose per-vertex update spans several dofs (O(3) sigma model),
the action supplies its own colouring via ``heatbath_colour_groups``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from mlmcpathintegral_tpu.samplers.base import Sampler, default_dtype


class HeatBathState(NamedTuple):
    x: jnp.ndarray   # [C, ndof]


class OverrelaxedHeatBathSampler(Sampler):
    """1-D checkerboard overrelaxed heat bath for QM actions.

    The action must provide ``heatbath_site(key, x_m, x_p)`` and
    ``overrelax_site(x, x_m, x_p)`` (base.QMAction API).
    """

    def __init__(self, action, n_sweep_heatbath: int = 1,
                 n_sweep_overrelax: int = 1, n_burnin: int = 100,
                 use_pallas: bool = False):
        super().__init__(action)
        #: actions providing whole-lattice coloured sweeps (2-D QFT models)
        #: are used directly; otherwise the generic 1-D even/odd site sweep
        #: drives the action's heatbath_site/overrelax_site
        self._action_sweeps = hasattr(action, "heatbath_sweep")
        if not self._action_sweeps and action.lattice.M_lat % 2:
            raise ValueError("checkerboard sweep needs even M_lat")
        self.n_sweep_heatbath = int(n_sweep_heatbath)
        self.n_sweep_overrelax = int(n_sweep_overrelax)
        self.n_burnin = int(n_burnin)
        #: fused Pallas step (ops/pallas_schwinger.py / ops/pallas_gff.py) —
        #: supported for the quenched Schwinger action and the plain
        #: (unsmoothed, unrotated) GFF
        self.use_pallas = bool(use_pallas)
        self._pallas_kind = None
        if use_pallas:
            from mlmcpathintegral_tpu.models.qft.gff import GFFAction
            from mlmcpathintegral_tpu.models.qft.schwinger import (
                QuenchedSchwingerAction,
            )
            from mlmcpathintegral_tpu.models.rotor import RotorAction
            if type(action) is QuenchedSchwingerAction:
                self._pallas_kind = "schwinger"
            elif (type(action) is GFFAction and action.n_gibbs_smooth == 0
                  and not action.lattice.rotated):
                self._pallas_kind = "gff"
            elif type(action) is RotorAction:
                self._pallas_kind = "rotor"
            else:
                raise ValueError("use_pallas requires the quenched "
                                 "Schwinger action, the plain GFF or the "
                                 "rotor")

    def init(self, key, n_chains, dtype=None):
        dtype = dtype or default_dtype()
        return HeatBathState(x=self.action.initialise_state(key, n_chains,
                                                            dtype))

    # -- half-sweeps -----------------------------------------------------------

    def _half_sweep_heatbath(self, key, x, parity: int):
        """Update all sites of one parity from their conditional
        distribution given the (frozen) other parity."""
        x_m = jnp.roll(x, 1, axis=-1)[..., parity::2]
        x_p = jnp.roll(x, -1, axis=-1)[..., parity::2]
        new = self.action.heatbath_site(key, x_m, x_p,
                                        x_cur=x[..., parity::2])
        return x.at[..., parity::2].set(new)

    def _half_sweep_overrelax(self, x, parity: int):
        x_m = jnp.roll(x, 1, axis=-1)[..., parity::2]
        x_p = jnp.roll(x, -1, axis=-1)[..., parity::2]
        new = self.action.overrelax_site(x[..., parity::2], x_m, x_p)
        return x.at[..., parity::2].set(new)

    # -- draw ------------------------------------------------------------------

    def draw(self, key, state: HeatBathState):
        x = state.x
        if self.use_pallas:
            lat = self.action.lattice
            # two 32-bit words of per-step entropy (see pallas_rng)
            seed = jax.random.randint(key, (2,), -2**31, 2**31 - 1,
                                      dtype=jnp.int32)
            block = self._pallas_block(x)
            if self._pallas_kind == "schwinger":
                from mlmcpathintegral_tpu.ops.pallas_schwinger import (
                    schwinger_sweep,
                )
                x = schwinger_sweep(
                    x, seed, beta=self.action.beta,
                    Mt=lat.Mt_lat, Mx=lat.Mx_lat,
                    n_overrelax=self.n_sweep_overrelax,
                    n_heatbath=self.n_sweep_heatbath,
                    block_chains=block)
            elif self._pallas_kind == "rotor":
                from mlmcpathintegral_tpu.ops.pallas_rotor import (
                    rotor_sweep,
                )
                x = rotor_sweep(
                    x, seed, kappa=self.action.m0 / self.action.a_lat,
                    M=lat.M_lat,
                    n_overrelax=self.n_sweep_overrelax,
                    n_heatbath=self.n_sweep_heatbath,
                    block_chains=block)
            else:
                from mlmcpathintegral_tpu.ops.pallas_gff import gff_sweep
                x = gff_sweep(
                    x, seed, kappa=4.0 + self.action.mu2,
                    Mt=lat.Mt_lat, Mx=lat.Mx_lat,
                    n_overrelax=self.n_sweep_overrelax,
                    n_heatbath=self.n_sweep_heatbath,
                    block_chains=block)
            accept = jnp.ones(x.shape[:-1], bool)
            return HeatBathState(x=x), accept
        if self._action_sweeps:
            combined = getattr(self.action, "combined_sweeps", None)
            if combined is not None:
                x = combined(key, x, self.n_sweep_overrelax,
                             self.n_sweep_heatbath)
            else:
                for _ in range(self.n_sweep_overrelax):
                    x = self.action.overrelaxation_sweep(x)
                for _ in range(self.n_sweep_heatbath):
                    key, sub = jax.random.split(key)
                    x = self.action.heatbath_sweep(sub, x)
        else:
            for _ in range(self.n_sweep_overrelax):
                x = self._half_sweep_overrelax(x, 0)
                x = self._half_sweep_overrelax(x, 1)
            for _ in range(self.n_sweep_heatbath):
                k0, k1, key = jax.random.split(key, 3)
                x = self._half_sweep_heatbath(k0, x, 0)
                x = self._half_sweep_heatbath(k1, x, 1)
        accept = jnp.ones(x.shape[:-1], bool)   # heat bath always accepts
        return HeatBathState(x=x), accept

    def _pallas_block(self, x):
        """Largest power-of-two chain block whose per-block state stays
        well inside VMEM alongside the kernel's temporaries (the sweep
        kernels keep ~4-6 field-sized temporaries live)."""
        ndof = x.shape[-1]
        block = 1024
        while block * ndof > (1 << 20) and block > 8:
            block //= 2
        while x.shape[0] % block:
            block //= 2
        return block

    def draw_chain(self, key, state: HeatBathState, n_steps: int):
        """``n_steps`` consecutive draws, returning ``(state', qsum)``
        with qsum[s, c] = sum_P mod_2pi(theta_P) after step s — the
        topological sum whose square / 4 pi^2 is the susceptibility QoI
        (qoi.qoi_2d_susceptibility).  On the Pallas Schwinger path this
        is ONE fused kernel launch: the link field stays in VMEM across
        all steps and only the [n_steps, C] QoI trace reaches HBM.
        Elsewhere it falls back to a scan of draw() (gauge actions only).
        """
        from mlmcpathintegral_tpu.utils.special import mod_2pi
        x = state.x
        if self.use_pallas and self._pallas_kind == "rotor":
            from mlmcpathintegral_tpu.ops.pallas_rotor import (
                rotor_sweep_chain,
            )
            seed = jax.random.randint(key, (2,), -2**31, 2**31 - 1,
                                      dtype=jnp.int32)
            x, wsum = rotor_sweep_chain(
                x, seed, kappa=self.action.m0 / self.action.a_lat,
                M=self.action.lattice.M_lat, n_steps=n_steps,
                n_overrelax=self.n_sweep_overrelax,
                n_heatbath=self.n_sweep_heatbath,
                block_chains=self._pallas_block(x))
            return HeatBathState(x=x), wsum
        if self.use_pallas and self._pallas_kind == "schwinger":
            from mlmcpathintegral_tpu.ops.pallas_schwinger import (
                schwinger_sweep_chain,
            )
            lat = self.action.lattice
            seed = jax.random.randint(key, (2,), -2**31, 2**31 - 1,
                                      dtype=jnp.int32)
            x, qsum = schwinger_sweep_chain(
                x, seed, beta=self.action.beta,
                Mt=lat.Mt_lat, Mx=lat.Mx_lat, n_steps=n_steps,
                n_overrelax=self.n_sweep_overrelax,
                n_heatbath=self.n_sweep_heatbath,
                block_chains=self._pallas_block(x))
            return HeatBathState(x=x), qsum

        def body(ss, k):
            ss, _ = self.draw(k, ss)
            q = jnp.sum(mod_2pi(self.action.plaquette_angles(ss.x)),
                        axis=(-2, -1))
            return ss, q
        state, qsum = jax.lax.scan(body, state,
                                   jax.random.split(key, n_steps))
        return state, qsum

    def prepare(self, key, n_chains, dtype=None):
        return super().prepare(key, n_chains, dtype, self.n_burnin)
