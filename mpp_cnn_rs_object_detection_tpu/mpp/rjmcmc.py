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
    apply_proposal,
    sample_proposal,
)
from mpp_cnn_rs_object_detection_tpu.mpp.state import PointsState

Array = jnp.ndarray
EPS = 1e-16


@dataclass(frozen=True)
class RJMCMCParams:
    """Static chain configuration (reference ``sample_rjmcmc.py:38-102`` and
    the ``rjmcmc_params`` config block, e.g. ``model_configs/mpp/mpp_hrcM.json``).

    ``alpha_t`` accepts a float, ``None``, or the string ``"auto"`` (reference
    ``sample_rjmcmc.py:62-64``: reach ``t_target`` from ``t0`` in ``burn_in``
    steps, then anneal on toward 0). ``iter_multiplier`` scales ``n_steps`` and
    ``samples_interval`` while taking the matching root of ``alpha_t`` so the
    temperature schedule covers the same range at finer granularity
    (reference ``sample_rjmcmc.py:58-61``)."""

    n_steps: int = 30_000
    t0: float = 1.0
    t_target: float = 0.0
    alpha_t: Optional[object] = 0.999
    n_samples: int = 1
    samples_interval: int = 128
    iter_multiplier: Optional[float] = None

    @property
    def burn_in(self) -> int:
        m = self.iter_multiplier or 1
        return int(self.n_steps * m)

    @property
    def resolved_interval(self) -> int:
        m = self.iter_multiplier or 1
        return max(1, int(self.samples_interval * m))

    @property
    def total_steps(self) -> int:
        return self.burn_in + (self.n_samples + 1) * self.resolved_interval

    def resolved_alpha(self) -> float:
        """Annealing factor per move, with 'auto'/None resolving to the factor
        that reaches t_target (+eps) in burn_in steps
        (reference ``sample_rjmcmc.py:62-64``)."""
        alpha = self.alpha_t
        if alpha in (None, "auto"):
            t_end = max(self.t_target, 1e-6)
            return float(np.exp(np.log(t_end / self.t0) / self.burn_in))
        alpha = float(alpha)
        if self.iter_multiplier:
            alpha = float(np.power(alpha, 1.0 / self.iter_multiplier))
        return alpha

    def resolved_t_target(self) -> float:
        """'auto' alpha anneals past t_target toward 0
        (reference ``sample_rjmcmc.py:62-64`` sets target_temperature = 0)."""
        return 0.0 if self.alpha_t in (None, "auto") else self.t_target


@flax.struct.dataclass
class EnergyCache:
    """Pair/unary energy bookkeeping carried through the scan.

    The expensive pair computations (rotated-rect intersection) are O(K^2) on
    a full recompute; a single RJMCMC move touches ONE slot, so only that row
    (+ symmetric column) changes — O(K) heavy work per step, with the per-row
    reductions left as cheap masked elementwise max/min. This is the
    vectorized analog of the reference's incremental EnergyGraph
    (``point_set/energy_graph.py:46-104``), without object bookkeeping.
    """

    dist: Array     # (K, K) center distances
    overlap: Array  # (K, K) intersection / min-area ratios
    align: Array    # (K, K) 1 - |cos dangle| - rewarding
    pos_e: Array    # (K,) position energy
    mark_e: Array   # (K, 3) per-mark energy map gathers
    polys: Array    # (K, 4, 2) rectangle corners (stale at dead slots — masked)
    areas: Array    # (K,) rectangle areas


def _pair_row(state: PointsState, spec: EnergySpec, slot: Array,
              polys: Array, areas: Array) -> Tuple[Array, Array, Array]:
    """dist/overlap/align of ``slot`` against all K points (O(K) heavy ops)."""
    from mpp_cnn_rs_object_detection_tpu.ops.geometry import (
        quad_intersection_area_matrix,
    )

    xy_s = state.xy[slot]
    dist_row = jnp.linalg.norm(state.xy - xy_s[None, :], axis=-1)
    poly_s = polys[slot]
    inter_row = quad_intersection_area_matrix(poly_s[None], polys)[0]
    min_area = jnp.minimum(areas, areas[slot])
    overlap_row = inter_row / (min_area + 1e-6)
    dangle = state.marks[slot, 2] - state.marks[:, 2]
    align_row = 1.0 - jnp.abs(jnp.cos(dangle)) - float(spec.rewarding_align)
    return dist_row, overlap_row, align_row


def _unary_row(state: PointsState, maps: EnergyMaps, spec: EnergySpec,
               slot: Array) -> Tuple[Array, Array]:
    if spec.data_term != "cnn":
        from mpp_cnn_rs_object_detection_tpu.mpp.classic_energies import (
            ContrastConfig,
            contrast_energy_point,
            gradient_energy_point,
        )

        if spec.data_term == "contrast":
            cfg = spec.contrast or ContrastConfig()
            val = contrast_energy_point(
                maps.image, state.xy[slot], state.marks[slot], cfg
            )
        else:
            val = gradient_energy_point(
                maps.image, state.xy[slot], state.marks[slot]
            )
        return val, jnp.zeros((3,), jnp.float32)

    from mpp_cnn_rs_object_detection_tpu.mpp.energies import (
        mark_lookup_interp,
        position_lookup,
    )

    h, w = maps.position.shape
    pos = position_lookup(maps.position, state.xy[slot], h, w)
    mark = mark_lookup_interp(
        maps.mark_maps, state.xy[slot], state.marks[slot],
        maps.map_vmin, maps.map_vmax, maps.map_cyclic, h, w,
    )
    return pos, mark


def build_cache(state: PointsState, maps: EnergyMaps, spec: EnergySpec,
                safe_dist: bool = False) -> EnergyCache:
    """Full O(K^2) cache build (once per chain).

    ``safe_dist``: compute distances as ``sqrt(sum(d^2) + 1e-12)`` instead of
    ``jnp.linalg.norm``. The norm's jacobian at the zero diagonal is NaN, and
    under ``jax.grad`` (the detection polish, ``mpp/polish.py``) that NaN
    survives the zero cotangent of the boolean distance masks (0 * NaN). The
    +1e-12 shifts distances by < 1e-6 px; chain paths keep the exact norm.
    """
    from mpp_cnn_rs_object_detection_tpu.ops.geometry import (
        marks_to_poly,
        quad_intersection_area_matrix,
        rect_area,
    )

    polys = marks_to_poly(
        state.xy, state.marks[:, 0], state.marks[:, 1], state.marks[:, 2]
    )
    areas = rect_area(state.marks[:, 0], state.marks[:, 1])
    diff = state.xy[:, None, :] - state.xy[None, :, :]
    if safe_dist:
        dist = jnp.sqrt(jnp.sum(diff * diff, axis=-1) + 1e-12)
    else:
        dist = jnp.linalg.norm(diff, axis=-1)
    inter = quad_intersection_area_matrix(polys, polys)
    min_area = jnp.minimum(areas[:, None], areas[None, :])
    overlap = inter / (min_area + 1e-6)
    dangle = state.marks[:, None, 2] - state.marks[None, :, 2]
    align = 1.0 - jnp.abs(jnp.cos(dangle)) - float(spec.rewarding_align)

    if spec.data_term == "cnn":
        from mpp_cnn_rs_object_detection_tpu.mpp.energies import (
            mark_lookup_interp,
            position_lookup,
        )

        h, w = maps.position.shape
        pos_e = position_lookup(maps.position, state.xy, h, w)
        mark_e = mark_lookup_interp(
            maps.mark_maps, state.xy, state.marks,
            maps.map_vmin, maps.map_vmax, maps.map_cyclic, h, w,
        )
    else:
        from mpp_cnn_rs_object_detection_tpu.mpp.energies import data_columns

        pos_e = data_columns(state, maps, spec)[0]
        mark_e = jnp.zeros((state.capacity, 3), jnp.float32)
    return EnergyCache(
        dist=dist, overlap=overlap, align=align, pos_e=pos_e, mark_e=mark_e,
        polys=polys, areas=areas,
    )


def update_cache(state: PointsState, maps: EnergyMaps, spec: EnergySpec,
                 cache: EnergyCache, slot: Array) -> EnergyCache:
    """Refresh row+column ``slot`` after a birth/move of that slot.

    Only the touched slot's polygon/area is rebuilt — the other K-1 corner
    sets ride in the cache (one move changes one rectangle, so recomputing
    every poly's sin/cos per step, as a naive row update would, is pure
    waste)."""
    from mpp_cnn_rs_object_detection_tpu.ops.geometry import (
        marks_to_poly,
        rect_area,
    )

    poly_s = marks_to_poly(
        state.xy[slot][None], state.marks[slot, 0][None],
        state.marks[slot, 1][None], state.marks[slot, 2][None],
    )[0]
    area_s = rect_area(state.marks[slot, 0], state.marks[slot, 1])
    polys = cache.polys.at[slot].set(poly_s)
    areas = cache.areas.at[slot].set(area_s)
    dist_row, ov_row, al_row = _pair_row(state, spec, slot, polys, areas)
    pos_s, mark_s = _unary_row(state, maps, spec, slot)
    return EnergyCache(
        dist=cache.dist.at[slot, :].set(dist_row).at[:, slot].set(dist_row),
        overlap=cache.overlap.at[slot, :].set(ov_row).at[:, slot].set(ov_row),
        align=cache.align.at[slot, :].set(al_row).at[:, slot].set(al_row),
        pos_e=cache.pos_e.at[slot].set(pos_s),
        mark_e=cache.mark_e.at[slot].set(mark_s),
        polys=polys,
        areas=areas,
    )


def energy_from_cache(state: PointsState, maps: EnergyMaps, spec: EnergySpec,
                      comb: EnergyCombiner, cache: EnergyCache) -> Array:
    """U(config) from cached matrices — O(K^2) cheap elementwise only.
    Bit-identical to ``energies.total_energy`` (validated in tests)."""
    k = state.capacity
    eye = jnp.eye(k, dtype=bool)
    alive_pair = state.alive[:, None] & state.alive[None, :] & ~eye

    ov_mask = alive_pair & (cache.dist <= spec.overlap_max_dist)
    has_ov = jnp.any(ov_mask, axis=1)
    overlap_red = jnp.where(
        has_ov, jnp.max(jnp.where(ov_mask, cache.overlap, -jnp.inf), axis=1), 0.0
    )
    al_mask = alive_pair & (cache.dist <= spec.align_max_dist)
    has_al = jnp.any(al_mask, axis=1)
    if spec.rewarding_align:
        align_red = jnp.min(jnp.where(al_mask, cache.align, jnp.inf), axis=1)
    else:
        align_red = jnp.max(jnp.where(al_mask, cache.align, -jnp.inf), axis=1)
    align_red = jnp.where(has_al, align_red, 0.0)

    area_prior = jnp.maximum(
        0.0,
        jnp.maximum(maps.min_area - cache.areas, cache.areas - maps.max_area),
    )

    cols = [cache.pos_e]
    if spec.data_term == "cnn":
        if spec.shape_mode == "mean":
            cols.append(jnp.mean(cache.mark_e, axis=-1))
        else:
            cols.extend(
                [cache.mark_e[:, 0], cache.mark_e[:, 1], cache.mark_e[:, 2]]
            )
    cols.extend([overlap_red, align_red, area_prior])
    if spec.use_ratio_prior:
        cols.append(jnp.abs(maps.target_ratio - state.marks[:, 1]))
    vec = jnp.stack(cols, axis=-1)
    vec = jnp.where(state.alive[:, None], vec, 0.0)
    per_point = comb(vec)
    return jnp.sum(jnp.where(state.alive, per_point, 0.0))


@flax.struct.dataclass
class ChainStats:
    accepted: Array      # (8,) accepted moves per kernel
    proposed: Array      # (8,) proposals per kernel
    final_energy: Array  # scalar
    final_n_points: Array
    final_temperature: Array


def make_step_fn(maps: EnergyMaps, spec: EnergySpec, comb: EnergyCombiner,
                 kd: KernelData, alpha_t: float, t_target: float):
    """Build the scan body; all tile data is closed over (device-resident).

    A step costs O(K) rotated-rect intersections (the changed row of the
    carried EnergyCache) + O(K^2) cheap masked reductions — the vectorized
    equivalent of the reference's incremental ΔU (``energy_graph.py:139-225``),
    but recomputed-exact rather than lazily cached."""

    def step(carry, key):
        state, cache, energy, temp = carry
        k_kernel, k_prop, k_accept = jax.random.split(key, 3)
        kernel_idx = jax.random.categorical(k_kernel, jnp.log(kd.p_kernels))
        prop = sample_proposal(k_prop, kernel_idx, state, kd)

        new_state = apply_proposal(state, prop)
        slot = jnp.clip(prop.slot, 0, state.capacity - 1)
        slot2 = jnp.clip(prop.slot2, 0, state.capacity - 1)
        new_cache = update_cache(new_state, maps, spec, cache, slot)
        # second slot (split/merge); idempotent when slot2 == slot
        new_cache = update_cache(new_state, maps, spec, new_cache, slot2)
        new_energy = energy_from_cache(new_state, maps, spec, comb, new_cache)
        delta = new_energy - energy

        log_alpha = -delta / temp + prop.log_back - prop.log_fwd
        accept = jnp.log(jax.random.uniform(k_accept) + EPS) < log_alpha

        state = jax.tree_util.tree_map(
            lambda a, b: jnp.where(accept, a, b), new_state, state
        )
        cache = jax.tree_util.tree_map(
            lambda a, b: jnp.where(accept, a, b), new_cache, cache
        )
        energy = jnp.where(accept, new_energy, energy)
        temp = jnp.where(temp > t_target, temp * alpha_t, temp)
        return (state, cache, energy, temp), (accept, kernel_idx)

    return step


@partial(jax.jit, static_argnames=("spec", "n_steps", "alpha_t", "t0",
                                   "t_target", "n_samples", "samples_interval",
                                   "burn_in"))
def run_chain(key, init_state: PointsState, maps: EnergyMaps, spec: EnergySpec,
              comb: EnergyCombiner, kd: KernelData, n_steps: int,
              t0: float = 1.0, alpha_t: float = 0.999, t_target: float = 0.0,
              n_samples: int = 0, samples_interval: int = 1,
              burn_in: int = 0, step_offset=0):
    """Run one annealed chain for ``n_steps`` moves.

    With ``n_samples > 0``, additionally collect post-burn-in states: the
    state is recorded whenever the global step ``step_offset + i`` satisfies
    ``step >= burn_in and step % samples_interval == 0`` (the reference
    sampling rule, ``sample_rjmcmc.py:90-102``), into a rolling buffer keeping
    the LAST ``n_samples`` states. Returns ``(state, stats)`` or
    ``(state, stats, samples, n_collected)`` where ``samples`` is a
    PointsState with leading axis ``n_samples`` (rolled oldest-first) and
    ``n_collected`` counts sampling events in this launch (``step_offset``
    lets segmented launches keep one global schedule)."""
    step = make_step_fn(maps, spec, comb, kd, alpha_t, t_target)
    cache0 = build_cache(init_state, maps, spec)
    u0 = energy_from_cache(init_state, maps, spec, comb, cache0)
    keys = jax.random.split(key, n_steps)
    carry0 = (init_state, cache0, u0, jnp.asarray(t0, jnp.float32))
    n_kernels = kd.p_kernels.shape[0]

    if n_samples == 0:
        (state, _, energy, temp), (accepts, kernel_ids) = jax.lax.scan(
            step, carry0, keys
        )
    else:
        buf0 = jax.tree_util.tree_map(
            lambda x: jnp.zeros((n_samples,) + x.shape, x.dtype), init_state
        )

        def step_sampling(carry, xs):
            inner, buf, n_coll = carry
            k, i = xs
            inner, out = step(inner, k)
            g = step_offset + i
            take = (g >= burn_in) & (g % samples_interval == 0)
            pos = n_coll % n_samples
            buf = jax.tree_util.tree_map(
                lambda b, s: jnp.where(
                    take,
                    jax.lax.dynamic_update_index_in_dim(b, s, pos, 0),
                    b,
                ),
                buf,
                inner[0],
            )
            return (inner, buf, n_coll + take.astype(jnp.int32)), out

        ((state, _, energy, temp), buf, n_coll), (accepts, kernel_ids) = (
            jax.lax.scan(
                step_sampling,
                (carry0, buf0, jnp.asarray(0, jnp.int32)),
                (keys, jnp.arange(n_steps)),
            )
        )
        # roll so the buffer reads oldest -> newest
        samples = jax.tree_util.tree_map(
            lambda b: jnp.roll(b, -(n_coll % n_samples), axis=0), buf
        )

    onehot = jax.nn.one_hot(kernel_ids, n_kernels, dtype=jnp.float32)
    stats = ChainStats(
        accepted=jnp.sum(onehot * accepts[:, None].astype(jnp.float32), axis=0),
        proposed=jnp.sum(onehot, axis=0),
        final_energy=energy,
        final_n_points=state.n_points,
        final_temperature=temp,
    )
    if n_samples == 0:
        return state, stats
    return state, stats, samples, n_coll


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


@partial(jax.jit, static_argnames=("spec",))
def papangelou(state: PointsState, maps: EnergyMaps, spec: EnergySpec,
               comb: EnergyCombiner) -> Array:
    """Per-slot papangelou intensity exp(-(U(x) - U(x \\ u))) — the detection
    confidence (reference ``energy_point_set.py:102-116``, ``mpp_model.py:303``).

    Removing u only changes a neighbor i's reduced pair term when u was its
    arg-extremum, so per-row TOP-2 statistics give every leave-one-out energy
    vector in O(K^2) total — a naive vmap of full recomputes materialises
    O(K^3) intermediates and OOMs scene-level configurations.
    """
    from mpp_cnn_rs_object_detection_tpu.mpp.combinators import combine as _combine
    from mpp_cnn_rs_object_detection_tpu.mpp.energies import data_columns
    from mpp_cnn_rs_object_detection_tpu.ops.geometry import (
        marks_to_poly,
        quad_intersection_area_matrix,
        rect_area,
    )

    k = state.capacity
    eye = jnp.eye(k, dtype=bool)
    alive_pair = state.alive[:, None] & state.alive[None, :] & ~eye
    diff = state.xy[:, None, :] - state.xy[None, :, :]
    dist = jnp.linalg.norm(diff, axis=-1)

    polys = marks_to_poly(
        state.xy, state.marks[:, 0], state.marks[:, 1], state.marks[:, 2]
    )
    areas = rect_area(state.marks[:, 0], state.marks[:, 1])
    # candidate-major all-pairs clipping: no lane padding, so scene-level K
    # fits without the row-chunking the old (K, K, 24, 2) layout needed
    inter = quad_intersection_area_matrix(polys, polys)
    overlap = inter / (jnp.minimum(areas[:, None], areas[None, :]) + 1e-6)
    dangle = state.marks[:, None, 2] - state.marks[None, :, 2]
    align = 1.0 - jnp.abs(jnp.cos(dangle)) - float(spec.rewarding_align)

    def top2(values, mask, take_max: bool):
        sign = 1.0 if take_max else -1.0
        v = jnp.where(mask, sign * values, -jnp.inf)
        t1 = jnp.max(v, axis=1)
        a1 = jnp.argmax(v, axis=1)
        v2 = v.at[jnp.arange(k), a1].set(-jnp.inf)
        t2 = jnp.max(v2, axis=1)
        return sign * t1, a1, sign * t2

    ov_mask = alive_pair & (dist <= spec.overlap_max_dist)
    al_mask = alive_pair & (dist <= spec.align_max_dist)
    ov_n = jnp.sum(ov_mask, axis=1)
    al_n = jnp.sum(al_mask, axis=1)
    ov1, ov_arg, ov2 = top2(overlap, ov_mask, take_max=True)
    al1, al_arg, al2 = top2(align, al_mask, take_max=not spec.rewarding_align)

    ov_red = jnp.where(ov_n > 0, ov1, 0.0)
    al_red = jnp.where(al_n > 0, al1, 0.0)

    # unary columns (shared between x and all leave-one-out configs)
    dcols = data_columns(state, maps, spec)
    area = rect_area(state.marks[:, 0], state.marks[:, 1])
    area_prior = jnp.maximum(
        0.0, jnp.maximum(maps.min_area - area, area - maps.max_area)
    )

    def vec_of(ov_col, al_col):
        cols = list(dcols) + [ov_col, al_col, area_prior]
        if spec.use_ratio_prior:
            cols.append(jnp.abs(maps.target_ratio - state.marks[:, 1]))
        return jnp.stack(cols, axis=-1)

    base_vec = jnp.where(state.alive[:, None], vec_of(ov_red, al_red), 0.0)
    base_pp = jnp.where(state.alive, _combine(comb, base_vec), 0.0)  # (K,)
    base_total = jnp.sum(base_pp)

    # leave-one-out reduced terms: (K_removed, K_row) matrices from top-2
    rm = jnp.arange(k)
    ov_without = jnp.where(
        ov_arg[None, :] == rm[:, None],
        jnp.where(ov_n[None, :] > 1, ov2[None, :], 0.0),
        ov_red[None, :],
    )
    al_without = jnp.where(
        al_arg[None, :] == rm[:, None],
        jnp.where(al_n[None, :] > 1, al2[None, :], 0.0),
        al_red[None, :],
    )

    def energy_without(u):
        vec = vec_of(ov_without[u], al_without[u])
        alive_wo = state.alive.at[u].set(False)
        pp = jnp.where(alive_wo, _combine(comb, vec), 0.0)
        return jnp.sum(pp)

    u_without = jax.vmap(energy_without)(rm)
    delta = base_total - u_without
    return jnp.where(state.alive, jnp.exp(-delta), 0.0)
