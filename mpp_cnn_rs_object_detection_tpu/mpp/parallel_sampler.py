"""Cell-parallel RJMCMC: many non-interacting MH moves per scan step.

The reference chain is strictly sequential (one move per Python-loop step,
``rjmcmc.py:83-164``); its only scale-out is one process per tile. This module
implements the jittered cell-parallel sampler sketched in SURVEY.md §2.9/§7.2
(sampler v2):

  - the tile is partitioned into CELL x CELL cells (CELL >= 2 * the 32 px max
    interaction radius); every superstep picks a random grid offset and
    activates every second cell in each dimension, so simultaneously-updated
    cells are >= CELL px apart — their proposals cannot interact (pair
    energies vanish beyond 32 px) and moves are confined to their cell;
  - each active cell proposes ONE MH move (birth / death / translate /
    transform with cell-local densities) and accepts it independently with its
    own Green ratio; because the cells are non-interacting, the composite
    update satisfies detailed balance for the same posterior;
  - per-proposal ΔU and the accepted row updates reuse the EnergyCache, so a
    superstep costs one vmapped batch of O(K) row computations instead of M
    sequential scan iterations — M-fold fewer device steps per move.

The kernel family differs from the sequential mixture (cell-uniform birth
positions, moves clipped to cells); equilibrium statistics are validated
against the sequential sampler in tests.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mpp_cnn_rs_object_detection_tpu.mpp.combinators import EnergyCombiner
from mpp_cnn_rs_object_detection_tpu.mpp.energies import EnergyMaps, EnergySpec
from mpp_cnn_rs_object_detection_tpu.mpp.kernels import (
    EPS,
    KernelData,
    _class_to_value,
    _log,
    _normal_logpdf,
)
from mpp_cnn_rs_object_detection_tpu.mpp.rjmcmc import (
    ChainStats,
    EnergyCache,
    build_cache,
    energy_from_cache,
)
from mpp_cnn_rs_object_detection_tpu.mpp.state import PointsState

Array = jnp.ndarray
CELL = 64  # >= 2 * max interaction radius (32 px)

# per-cell move mixture
P_BIRTH, P_DEATH, P_TRL, P_TRF = 0.25, 0.25, 0.25, 0.25


def _cell_proposal(key, state: PointsState, kd: KernelData, maps: EnergyMaps,
                   cell_density: Array, y0: Array, x0: Array,
                   free_slot: Array, free_ok: Array):
    """One MH proposal confined to the cell [y0, y0+CELL) x [x0, x0+CELL).

    ``cell_density`` is the detection map zero-padded by CELL on each side;
    births sample their pixel from the cell's window of it (the cell-local
    analog of the reference's data-driven birth)."""
    h, w = kd.log_birth_density.shape
    k_type, k_slot, k_pos, k_marks, k_delta, k_param = jax.random.split(key, 6)

    # valid in-image extent of this cell
    ylo = jnp.clip(y0, 0, h)
    xlo = jnp.clip(x0, 0, w)
    yhi = jnp.clip(y0 + CELL, 0, h)
    xhi = jnp.clip(x0 + CELL, 0, w)
    area = jnp.maximum((yhi - ylo) * (xhi - xlo), 0).astype(jnp.float32)
    cell_ok = area > 0

    # points inside the cell
    in_cell = (
        state.alive
        & (state.xy[:, 0] >= ylo) & (state.xy[:, 0] < yhi)
        & (state.xy[:, 1] >= xlo) & (state.xy[:, 1] < xhi)
    )
    n_cell = jnp.sum(in_cell).astype(jnp.float32)
    logits = jnp.where(in_cell, 0.0, -jnp.inf)
    cell_slot = jnp.where(
        n_cell > 0, jax.random.categorical(k_slot, logits), -1
    )
    safe_slot = jnp.maximum(cell_slot, 0)

    # cell-local intensity: Lambda * |cell| / |image|
    lam_cell = kd.intensity * area / float(h * w)

    move_t = jax.random.uniform(k_type)
    is_birth = move_t < P_BIRTH
    is_death = (move_t >= P_BIRTH) & (move_t < P_BIRTH + P_DEATH)
    is_trl = (move_t >= P_BIRTH + P_DEATH) & (move_t < P_BIRTH + P_DEATH + P_TRL)

    # ---- birth: position ~ cell-windowed detection density, data marks
    win = jax.lax.dynamic_slice(
        cell_density, (y0 + CELL, x0 + CELL), (CELL, CELL)
    )
    win_sum = jnp.sum(win)
    win_prob = win / (win_sum + EPS)
    cell_idx = jax.random.categorical(k_pos, _log(win_prob).ravel())
    py = (y0 + cell_idx // CELL).astype(jnp.float32)
    px = (x0 + cell_idx % CELL).astype(jnp.float32)
    byi = jnp.clip(py.astype(jnp.int32), 0, h - 1)
    bxi = jnp.clip(px.astype(jnp.int32), 0, w - 1)
    log_q_pos = _log(win_prob.ravel()[cell_idx]) + _log(area)
    rows = kd.mark_dists[:, byi, bxi, :]  # (3, C)
    mkeys = jax.random.split(k_marks, 3)
    cls = jnp.stack(
        [jax.random.categorical(mkeys[m], _log(rows[m])) for m in range(3)]
    )
    birth_marks = jnp.stack([_class_to_value(kd, m, cls[m]) for m in range(3)])
    log_q_marks = sum(_log(rows[m][cls[m]]) for m in range(3))
    n_classes = kd.mark_dists.shape[-1]
    log_q_birth = log_q_pos + log_q_marks + 3 * jnp.log(float(n_classes))
    birth_fwd = _log(jnp.asarray(P_BIRTH)) + log_q_birth - _log(lam_cell)
    birth_back = _log(jnp.asarray(P_DEATH)) - _log(n_cell + 1.0)
    birth_valid = win_sum > 1e-12

    # ---- death: uniform among cell points
    death_fwd = _log(jnp.asarray(P_DEATH)) - _log(n_cell)
    dyi, dxi = (
        jnp.clip(state.xy[safe_slot, 0].astype(jnp.int32), 0, h - 1),
        jnp.clip(state.xy[safe_slot, 1].astype(jnp.int32), 0, w - 1),
    )
    drows = kd.mark_dists[:, dyi, dxi, :]
    from mpp_cnn_rs_object_detection_tpu.mpp.kernels import _value_to_class

    dcls = jnp.stack(
        [_value_to_class(kd, m, state.marks[safe_slot, m]) for m in range(3)]
    )
    dwin_y = jnp.clip(dyi - y0, 0, CELL - 1)
    dwin_x = jnp.clip(dxi - x0, 0, CELL - 1)
    log_q_death = (
        _log(win_prob[dwin_y, dwin_x]) + _log(area)
        + sum(_log(drows[m][dcls[m]]) for m in range(3))
        + 3 * jnp.log(float(n_classes))
    )
    death_back = _log(jnp.asarray(P_BIRTH)) + log_q_death - _log(lam_cell)

    # ---- translate: gaussian, clipped to the cell (stays non-interacting)
    delta = kd.sigma_trl * jax.random.normal(k_delta, (2,))
    trl_xy = jnp.clip(
        jnp.trunc(state.xy[safe_slot] + delta),
        jnp.stack([ylo, xlo]).astype(jnp.float32),
        jnp.stack([yhi - 1, xhi - 1]).astype(jnp.float32),
    )
    trl_logp = (
        _log(jnp.asarray(P_TRL))
        + jnp.sum(_normal_logpdf(delta, kd.sigma_trl))
        - _log(n_cell)
    )

    # ---- transform: gaussian on one mark (cyclic wrap / clip)
    pid = jax.random.randint(k_param, (), 0, 3)
    sigma = kd.sigma_trf[pid]
    mdelta = sigma * jax.random.normal(jax.random.fold_in(k_delta, 1))
    old = state.marks[safe_slot, pid]
    rng_ = kd.map_vmax[pid] - kd.map_vmin[pid]
    new_val = jnp.where(
        kd.map_cyclic[pid],
        ((old + mdelta) % rng_) + kd.map_vmin[pid],
        jnp.clip(old + mdelta, kd.map_vmin[pid], kd.map_vmax[pid]),
    )
    trf_marks = state.marks[safe_slot].at[pid].set(new_val)
    trf_logp = (
        _log(jnp.asarray(P_TRF))
        + _normal_logpdf(mdelta, sigma)
        - _log(n_cell)
    )

    # ---- assemble
    birth_ok = cell_ok & free_ok & birth_valid
    pick_ok = cell_slot >= 0

    kind = jnp.where(
        is_birth,
        jnp.where(birth_ok, 1, 0),
        jnp.where(pick_ok, jnp.where(is_death, 2, 3), 0),
    )
    slot = jnp.where(is_birth, free_slot, safe_slot)
    xy = jnp.where(
        is_birth,
        jnp.stack([py, px]),
        jnp.where(is_trl & ~is_death, trl_xy, state.xy[safe_slot]),
    )
    marks = jnp.where(
        is_birth,
        birth_marks,
        jnp.where(
            is_trl | is_death, state.marks[safe_slot], trf_marks
        ),
    )
    log_fwd = jnp.where(
        is_birth, birth_fwd,
        jnp.where(is_death, death_fwd, jnp.where(is_trl, trl_logp, trf_logp)),
    )
    log_back = jnp.where(
        is_birth, birth_back,
        jnp.where(is_death, death_back, jnp.where(is_trl, trl_logp, trf_logp)),
    )
    return kind, slot, xy, marks, log_fwd, log_back


def _apply_one(state: PointsState, kind, slot, xy, marks) -> PointsState:
    slot = jnp.clip(slot, 0, state.capacity - 1)
    write = (kind == 1) | (kind == 3)
    new_xy = jnp.where(write, state.xy.at[slot].set(xy), state.xy)
    new_marks = jnp.where(write, state.marks.at[slot].set(marks), state.marks)
    new_alive = jnp.where(
        kind == 1,
        state.alive.at[slot].set(True),
        jnp.where(kind == 2, state.alive.at[slot].set(False), state.alive),
    )
    return state.replace(xy=new_xy, marks=new_marks, alive=new_alive)


def make_parallel_step(maps: EnergyMaps, spec: EnergySpec, comb: EnergyCombiner,
                       kd: KernelData, alpha_t: float, t_target: float,
                       n_cells: int):
    """Superstep over ``n_cells`` x ``n_cells`` active cells."""
    h, w = kd.log_birth_density.shape
    # detection density padded by CELL so jittered cell windows always slice
    cell_density = jnp.pad(
        jnp.exp(kd.log_birth_density), ((CELL, CELL), (CELL, CELL))
    )

    def step(carry, key):
        state, cache, energy, temp = carry
        k_off, k_cells, k_acc = jax.random.split(key, 3)

        off = jax.random.randint(k_off, (2,), -CELL, CELL)
        ids = jnp.arange(n_cells)
        y0s = off[0] + 2 * CELL * (ids[:, None].repeat(n_cells, 1)).ravel()
        x0s = off[1] + 2 * CELL * (ids[None, :].repeat(n_cells, 0)).ravel()
        m = y0s.shape[0]

        # distinct free slots for potential births: the r-th cell gets the
        # r-th free slot (rank via cumsum of dead mask)
        dead_rank = jnp.cumsum(~state.alive) - 1  # rank of each dead slot
        cell_ids = jnp.arange(m)

        def free_slot_for(r):
            match = (~state.alive) & (dead_rank == r)
            return (
                jnp.where(jnp.any(match), jnp.argmax(match), 0),
                jnp.any(match),
            )

        free_slots, free_oks = jax.vmap(free_slot_for)(cell_ids)

        keys = jax.random.split(k_cells, m)
        kinds, slots, xys, markss, log_fwds, log_backs = jax.vmap(
            lambda k, y0, x0, fs, fo: _cell_proposal(
                k, state, kd, maps, cell_density, y0, x0, fs, fo
            )
        )(keys, y0s, x0s, free_slots, free_oks)

        # per-proposal ΔU (exact; proposals are pairwise non-interacting)
        def delta_of(kind, slot, xy, marks):
            st_i = _apply_one(state, kind, slot, xy, marks)
            ca_i = _row_updated(st_i, cache, jnp.clip(slot, 0, state.capacity - 1))
            u_i = energy_from_cache(st_i, maps, spec, comb, ca_i)
            return u_i - energy

        deltas = jax.vmap(delta_of)(kinds, slots, xys, markss)
        deltas = jnp.where(kinds == 0, 0.0, deltas)

        log_alpha = -deltas / temp + log_backs - log_fwds
        accept = (
            (jnp.log(jax.random.uniform(k_acc, (m,)) + EPS) < log_alpha)
            & (kinds != 0)
        )

        # apply accepted proposals sequentially (they touch disjoint slots)
        def body(i, sc):
            st, ca = sc
            st2 = _apply_one(st, kinds[i], slots[i], xys[i], markss[i])
            ca2 = _row_updated(st2, ca, jnp.clip(slots[i], 0, st.capacity - 1))
            return jax.tree_util.tree_map(
                lambda a, b: jnp.where(accept[i], a, b), (st2, ca2), (st, ca)
            )

        state, cache = jax.lax.fori_loop(0, m, body, (state, cache))
        energy = energy + jnp.sum(jnp.where(accept, deltas, 0.0))
        temp = jnp.where(temp > t_target, temp * alpha_t, temp)
        stats = (jnp.sum(accept), jnp.sum(kinds != 0))
        return (state, cache, energy, temp), stats

    def _row_updated(st: PointsState, cache: EnergyCache, slot) -> EnergyCache:
        from mpp_cnn_rs_object_detection_tpu.mpp.rjmcmc import update_cache

        return update_cache(st, maps, spec, cache, slot)

    return step


@partial(
    jax.jit,
    static_argnames=("spec", "n_supersteps", "alpha_t", "t0", "t_target"),
)
def run_parallel_chain(key, init_state: PointsState, maps: EnergyMaps,
                       spec: EnergySpec, comb: EnergyCombiner, kd: KernelData,
                       n_supersteps: int, t0: float = 1.0,
                       alpha_t: float = 0.999, t_target: float = 0.0
                       ) -> Tuple[PointsState, ChainStats]:
    """Anneal with cell-parallel supersteps; one superstep proposes up to
    (H/(2*CELL)+1)^2 simultaneous moves."""
    h, w = kd.log_birth_density.shape
    n_cells = max(h, w) // (2 * CELL) + 1
    step = make_parallel_step(maps, spec, comb, kd, alpha_t, t_target, n_cells)
    cache0 = build_cache(init_state, maps, spec)
    u0 = energy_from_cache(init_state, maps, spec, comb, cache0)
    keys = jax.random.split(key, n_supersteps)
    (state, _, energy, temp), (acc, prop) = jax.lax.scan(
        step, (init_state, cache0, u0, jnp.asarray(t0, jnp.float32)), keys
    )
    n_kernels = kd.p_kernels.shape[0]
    stats = ChainStats(
        accepted=jnp.zeros((n_kernels,)).at[0].set(
            jnp.sum(acc).astype(jnp.float32)
        ),
        proposed=jnp.zeros((n_kernels,)).at[0].set(
            jnp.sum(prop).astype(jnp.float32)
        ),
        final_energy=energy,
        final_n_points=state.n_points,
        final_temperature=temp,
    )
    return state, stats
