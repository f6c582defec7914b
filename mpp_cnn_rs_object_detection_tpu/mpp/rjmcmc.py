"""RJMCMC simulated-annealing sampler as a ``lax.scan`` — vmappable chains.

Re-derivation of the reference single-chain Python loop
(``models/mpp/rjmcmc_sampler/rjmcmc.py:83-164``): per step choose a kernel
from the mixture, sample a perturbation, compute the exact ΔU (full masked
energy recompute of the fixed-capacity state — no incremental graph needed),
accept with log-Green ratio ``-ΔU/T + log q_back - log q_fwd``, anneal
``T *= alpha_t``. The scan compiles to one XLA program; ``jax.vmap`` runs
thousands of independent chains (one per tile and/or per restart) in a single
device launch — replacing the reference's one-process-per-tile ``Pool.map``
(``mpp_model.py:250-262``).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional, Tuple

import flax
import jax
import jax.numpy as jnp
import numpy as np

from mpp_cnn_rs_object_detection_tpu.mpp.combinators import EnergyCombiner
from mpp_cnn_rs_object_detection_tpu.mpp.energies import (
    EnergyMaps,
    EnergySpec,
    total_energy,
)
from mpp_cnn_rs_object_detection_tpu.mpp.kernels import (
    KernelData,
    Proposal,
    apply_proposal,
    sample_proposal,
)
from mpp_cnn_rs_object_detection_tpu.mpp.state import PointsState

Array = jnp.ndarray
EPS = 1e-16


@dataclass(frozen=True)
class RJMCMCParams:
    """Static chain configuration (reference ``sample_rjmcmc.py:38-102`` and
    the ``rjmcmc_params`` config block, e.g. ``model_configs/mpp/mpp_hrcM.json``)."""

    n_steps: int = 30_000
    t0: float = 1.0
    t_target: float = 0.0
    alpha_t: Optional[float] = 0.999
    n_samples: int = 1
    samples_interval: int = 128

    @property
    def total_steps(self) -> int:
        return self.n_steps + (self.n_samples + 1) * self.samples_interval

    def resolved_alpha(self) -> float:
        """Auto annealing factor: reach t_target (+eps) in n_steps
        (reference ``sample_rjmcmc.py:64-70``)."""
        if self.alpha_t is not None:
            return self.alpha_t
        t_end = max(self.t_target, 1e-6)
        return float(np.exp(np.log(t_end / self.t0) / self.n_steps))


@flax.struct.dataclass
class ChainStats:
    accepted: Array      # (8,) accepted moves per kernel
    proposed: Array      # (8,) proposals per kernel
    final_energy: Array  # scalar
    final_n_points: Array
    final_temperature: Array


def make_step_fn(maps: EnergyMaps, spec: EnergySpec, comb: EnergyCombiner,
                 kd: KernelData, alpha_t: float, t_target: float):
    """Build the scan body; all tile data is closed over (device-resident)."""

    def step(carry, key):
        state, energy, temp = carry
        k_kernel, k_prop, k_accept = jax.random.split(key, 3)
        kernel_idx = jax.random.categorical(k_kernel, jnp.log(kd.p_kernels))
        prop = sample_proposal(k_prop, kernel_idx, state, kd)

        new_state = apply_proposal(state, prop)
        new_energy = total_energy(new_state, maps, spec, comb)
        delta = new_energy - energy

        log_alpha = -delta / temp + prop.log_back - prop.log_fwd
        accept = jnp.log(jax.random.uniform(k_accept) + EPS) < log_alpha

        state = jax.tree_util.tree_map(
            lambda a, b: jnp.where(accept, a, b), new_state, state
        )
        energy = jnp.where(accept, new_energy, energy)
        temp = jnp.where(temp > t_target, temp * alpha_t, temp)
        return (state, energy, temp), (accept, kernel_idx)

    return step


@partial(jax.jit, static_argnames=("spec", "n_steps", "alpha_t", "t0", "t_target"))
def run_chain(key, init_state: PointsState, maps: EnergyMaps, spec: EnergySpec,
              comb: EnergyCombiner, kd: KernelData, n_steps: int,
              t0: float = 1.0, alpha_t: float = 0.999, t_target: float = 0.0
              ) -> Tuple[PointsState, ChainStats]:
    """Run one annealed chain for ``n_steps`` moves."""
    step = make_step_fn(maps, spec, comb, kd, alpha_t, t_target)
    u0 = total_energy(init_state, maps, spec, comb)
    keys = jax.random.split(key, n_steps)
    (state, energy, temp), (accepts, kernel_ids) = jax.lax.scan(
        step, (init_state, u0, jnp.asarray(t0, jnp.float32)), keys
    )
    onehot = jax.nn.one_hot(kernel_ids, 8, dtype=jnp.float32)
    stats = ChainStats(
        accepted=jnp.sum(onehot * accepts[:, None].astype(jnp.float32), axis=0),
        proposed=jnp.sum(onehot, axis=0),
        final_energy=energy,
        final_n_points=state.n_points,
        final_temperature=temp,
    )
    return state, stats


def run_chains_batch(key, init_states: PointsState, maps: EnergyMaps,
                     spec: EnergySpec, comb: EnergyCombiner, kd: KernelData,
                     n_steps: int, t0: float = 1.0, alpha_t: float = 0.999,
                     t_target: float = 0.0):
    """vmap over B chains sharing the same tile maps: ``init_states`` is a
    PointsState with a leading batch axis."""
    batch = init_states.xy.shape[0]
    keys = jax.random.split(key, batch)
    return jax.vmap(
        lambda k, s: run_chain(
            k, s, maps, spec, comb, kd, n_steps, t0, alpha_t, t_target
        )
    )(keys, init_states)


def papangelou(state: PointsState, maps: EnergyMaps, spec: EnergySpec,
               comb: EnergyCombiner) -> Array:
    """Per-slot papangelou intensity exp(-ΔU of toggling the point).

    For an alive point u: exp(-(U(x) - U(x \\ u))) — the detection confidence
    score used at merge/export time (reference
    ``point_set/energy_point_set.py:helpers`` ``papangelou`` and
    ``mpp_model.py:303``). Dead slots get 0.
    """
    base = total_energy(state, maps, spec, comb)

    def energy_without(slot):
        removed = state.replace(alive=state.alive.at[slot].set(False))
        return total_energy(removed, maps, spec, comb)

    u_without = jax.vmap(energy_without)(jnp.arange(state.capacity))
    delta = base - u_without  # energy contribution of each point
    return jnp.where(state.alive, jnp.exp(-delta), 0.0)
