"""Perturbation sampling for energy-weight training (negatives vs GT).

Rebuild of reference ``models/mpp/perturbation_sampler.py:15-211``:
gaussian jitter / add / remove presets (LIGHT..STRONG) and kernel-driven
perturbations (apply n random RJMCMC proposals from GT without the MH test).
All sampling is vectorised over the fixed-capacity state — one call produces a
whole batch of perturbed configurations.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from mpp_cnn_rs_object_detection_tpu.mpp.kernels import (
    KernelData,
    apply_proposal,
    sample_proposal,
)
from mpp_cnn_rs_object_detection_tpu.mpp.state import PointsState

PERTURBATION_LIGHT = {
    "move_proba": 0.1,
    "param_shift_proba": (0.1, 0.1, 0.1),
    "position_sigma": 1.0,
    "param_sigmas": (0.02, 0.02, 0.02),
    "point_number_sigma": 0.1,
    "no_addition": True,
}
PERTURBATION_MEDIUM = {
    "move_proba": 0.5,
    "param_shift_proba": (0.5, 0.5, 0.5),
    "position_sigma": 5.0,
    "param_sigmas": (0.1, 0.1, 0.1),
    "point_number_sigma": 1.0,
}
PERTURBATION_STRONG = {
    "move_proba": 0.9,
    "param_shift_proba": (0.9, 0.9, 0.9),
    "position_sigma": 20.0,
    "param_sigmas": (0.5, 0.5, 0.5),
    "point_number_sigma": 10.0,
}
PRESETS = {
    "light": PERTURBATION_LIGHT,
    "medium": PERTURBATION_MEDIUM,
    "strong": PERTURBATION_STRONG,
}


def sample_perturbed_state(key, gt: PointsState, kd: KernelData,
                           shape_hw, preset: Dict) -> PointsState:
    """One gaussian-perturbed configuration (jit/vmap-friendly).

    Mirrors ``sample_perturbations``: drop/add points by a gaussian count
    shift, jitter positions with prob ``move_proba``, jitter each mark with
    prob ``param_shift_proba[i]`` and sigma ``param_sigmas[i] * range``.
    Additions are uniform rectangles claiming free slots.
    """
    k_n, k_drop, k_add, k_move, k_pos, k_parm, k_pshift = jax.random.split(key, 7)
    kcap = gt.capacity
    n0 = gt.n_points

    # --- target point count
    n_target = jnp.clip(
        jnp.round(n0 + preset["point_number_sigma"] * jax.random.normal(k_n)),
        0,
        kcap,
    ).astype(jnp.int32)
    if preset.get("no_addition"):
        n_target = jnp.minimum(n_target, n0)

    # --- removals: keep a random subset of alive points of size ~n_target
    drop_scores = jax.random.uniform(k_drop, (kcap,))
    drop_scores = jnp.where(gt.alive, drop_scores, -1.0)  # dead slots last
    order = jnp.argsort(-drop_scores)  # alive first, random order
    rank = jnp.zeros((kcap,), jnp.int32).at[order].set(jnp.arange(kcap, dtype=jnp.int32))
    alive = gt.alive & (rank < n_target)

    # --- additions: fill free slots up to n_target with uniform rectangles
    n_alive = jnp.sum(alive)
    n_add = jnp.maximum(n_target - n_alive, 0)
    free_rank = jnp.cumsum(~alive) - 1  # rank among free slots
    add_mask = (~alive) & (free_rank < n_add)
    h, w = shape_hw
    rand_xy = jax.random.uniform(
        k_add, (kcap, 2), minval=0.0,
        maxval=jnp.array([h - 1, w - 1], jnp.float32),
    )
    k_add2 = jax.random.fold_in(k_add, 1)
    rand_marks = kd.map_vmin + jax.random.uniform(k_add2, (kcap, 3)) * (
        kd.map_vmax - kd.map_vmin
    )
    xy = jnp.where(add_mask[:, None], rand_xy, gt.xy)
    marks = jnp.where(add_mask[:, None], rand_marks, gt.marks)
    alive = alive | add_mask

    # --- position jitter
    do_move = jax.random.uniform(k_move, (kcap,)) < preset["move_proba"]
    shift = preset["position_sigma"] * jax.random.normal(k_pos, (kcap, 2))
    moved = jnp.clip(
        jnp.trunc(xy + shift),
        jnp.zeros((2,)),
        jnp.array([h - 1, w - 1], jnp.float32),
    )
    xy = jnp.where((do_move & alive)[:, None], moved, xy)

    # --- mark jitter (cyclic wrap for angle, clip otherwise)
    sigmas = jnp.asarray(preset["param_sigmas"]) * (kd.map_vmax - kd.map_vmin)
    do_shift = jax.random.uniform(k_pshift, (kcap, 3)) < jnp.asarray(
        preset["param_shift_proba"]
    )
    deltas = sigmas * jax.random.normal(k_parm, (kcap, 3))
    new_vals = marks + deltas
    rng_ = kd.map_vmax - kd.map_vmin
    wrapped = ((new_vals - kd.map_vmin) % rng_) + kd.map_vmin
    clipped = jnp.clip(new_vals, kd.map_vmin, kd.map_vmax)
    new_marks = jnp.where(kd.map_cyclic, wrapped, clipped)
    marks = jnp.where(do_shift & alive[:, None], new_marks, marks)

    return gt.replace(xy=xy, marks=marks, alive=alive)


def sample_kernel_perturbed_state(key, gt: PointsState, kd: KernelData,
                                  n_moves: int) -> PointsState:
    """Apply ``n_moves`` random kernel proposals from GT, always accepted
    (reference ``sample_kernel_perturbations``: iter_per_point * n moves,
    no Metropolis test)."""

    def body(state, k):
        k1, k2 = jax.random.split(k)
        kernel_idx = jax.random.categorical(k1, jnp.log(kd.p_kernels))
        prop = sample_proposal(k2, kernel_idx, state, kd)
        return apply_proposal(state, prop), None

    keys = jax.random.split(key, n_moves)
    final, _ = jax.lax.scan(body, gt, keys)
    return final


def sample_perturbed_batch(key, gt: PointsState, kd: KernelData, shape_hw,
                           preset: Dict, n_samples: int) -> PointsState:
    """(n_samples,)-batched gaussian perturbations of one GT config.

    Sequential over samples: a vmapped ``lax.switch`` evaluates every branch
    with operands broadcast over the batch axis, which materialises the
    (3, H, W, C) kernel mark-distributions once PER SAMPLE (16G HBM at
    B=8 x S=16). Sampling is prep-work, not the hot loop.
    """
    keys = jax.random.split(key, n_samples)
    return jax.lax.map(
        lambda k: sample_perturbed_state(k, gt, kd, shape_hw, preset), keys
    )


def sample_kernel_perturbed_batch(key, gt: PointsState, kd: KernelData,
                                  n_moves: int, n_samples: int) -> PointsState:
    # sequential over samples — same broadcast-under-vmap reason as above
    keys = jax.random.split(key, n_samples)
    return jax.lax.map(
        lambda k: sample_kernel_perturbed_state(k, gt, kd, n_moves), keys
    )
