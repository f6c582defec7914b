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

import flax
import jax
import jax.numpy as jnp
import numpy as np

from mpp_cnn_rs_object_detection_tpu.mpp.combinators import EnergyCombiner
from mpp_cnn_rs_object_detection_tpu.mpp.energies import EnergyMaps, EnergySpec
from mpp_cnn_rs_object_detection_tpu.mpp.kernels import (
    EPS,
    MERGE_RADIUS,
    KernelData,
    _class_to_value,
    _clip_marks,
    _log,
    _normal_logpdf,
    _split_logpdf,
)
from mpp_cnn_rs_object_detection_tpu.mpp.rjmcmc import (
    ChainStats,
    EnergyCache,
    build_cache,
    energy_from_cache,
)
from mpp_cnn_rs_object_detection_tpu.mpp.state import PointsState

Array = jnp.ndarray
# Active cells are CELL x CELL squares spaced 2*CELL apart (random phase), so
# two simultaneous proposals sit in distinct active cells and are separated by
# a >= CELL-wide inactive strip: any interaction distance <= CELL is provably
# untouched by another concurrent move (pair terms use `dist <= radius`, and
# inter-cell distances are strictly > CELL). CELL therefore only needs to
# cover the max interaction radius (32 px, `EnergySpec.overlap_max_dist`) —
# verified at chain build time. Halving CELL from 64 quadruples the active
# cells per superstep (~3x fewer supersteps for the same move budget).
CELL = 32  # >= max interaction radius (32 px)

# per-cell move mixture
P_BIRTH, P_DEATH, P_TRL, P_TRF = 0.25, 0.25, 0.25, 0.25
# within the translation / mark-transform families: gaussian 1/3, data 2/3
# — the reference mixture's 1:2 weighting of data-driven moves
# (``make_kernels.py:113-137``: data_translation_weight 2.0 vs gaussian 1.0,
# same for transformations). ``data_moves=False`` restores the round-3
# gaussian-only superstep (config ``rjmcmc_params.superstep_data_moves``).
P_DATA_SUB = 2.0 / 3.0


@flax.struct.dataclass
class MapView:
    """A (possibly row-sharded) device-local view of the sampling maps.

    ``cell_density``: rows ``[row0_cd, row0_cd + R)`` of the normalised
    detection map, zero-padded by CELL along x (columns shift by +CELL).
    ``mark_dists``: (3, R_md, W, C) rows ``[row0_md, ...)`` of the mark
    distributions. ``position``/``mark_maps``: same row window of the energy
    maps (for candidate unary gathers). A single-device view covers all rows
    (``row0_cd = -CELL`` for the both-sides-padded density, others 0); a
    sharded view covers the device's band ± a CELL halo exchanged over ICI."""

    cell_density: Array
    mark_dists: Array
    position: Array
    mark_maps: Array
    row0_cd: Array
    row0_md: Array


def make_local_view(kd: KernelData, maps: EnergyMaps) -> MapView:
    """Whole-image view (single-device path)."""
    return MapView(
        cell_density=jnp.pad(
            jnp.exp(kd.log_birth_density), ((CELL, CELL), (CELL, CELL))
        ),
        mark_dists=kd.mark_dists,
        position=maps.position,
        mark_maps=maps.mark_maps,
        row0_cd=jnp.asarray(-CELL, jnp.int32),
        row0_md=jnp.asarray(0, jnp.int32),
    )


def _cell_proposal(key, state: PointsState, kd: KernelData, view: MapView,
                   h: int, w: int, y0: Array, x0: Array,
                   free_slot: Array, free_ok: Array,
                   data_moves: bool = True, split_merge: bool = False):
    """One MH proposal confined to the cell [y0, y0+CELL) x [x0, x0+CELL).

    Births sample their pixel from the cell's window of the detection
    density (the cell-local analog of the reference's data-driven birth);
    all map reads go through ``view`` so the same code runs on whole-image
    and row-sharded blocks.

    With ``data_moves`` (default), translations and mark transforms are a
    gaussian/data mixture weighted 1:2 like the reference's kernel tree
    (``transform_kernels.py:61-225``, ``make_kernels.py:113-137``): data
    translation resamples the position from the local ``WINDOW``-sized
    patch of the detection density (clipped to the cell so simultaneous
    proposals stay non-interacting) and data transform resamples ONE mark
    from its per-pixel shapenet distribution."""
    (k_type, k_slot, k_pos, k_marks, k_delta, k_param,
     k_sub, k_dsub, k_data) = jax.random.split(key, 9)

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
    # With the optional split/merge pair enabled (reference
    # ``split_and_merge_kernels.py:14-178``; config
    # ``rjmcmc_params.superstep_split_merge``), the four base families scale
    # 0.25 -> 0.2 and split/merge take 0.1 each. Only the RATIO of paired
    # family probabilities enters the Green factors (birth/death equal,
    # split/merge equal), so the existing fwd/back terms are unchanged.
    pb = 0.2 if split_merge else P_BIRTH
    is_birth = move_t < pb
    is_death = (move_t >= pb) & (move_t < 2 * pb)
    is_trl = (move_t >= 2 * pb) & (move_t < 3 * pb)
    is_split = split_merge & (move_t >= 4 * pb) & (move_t < 4 * pb + 0.1)
    is_merge = split_merge & (move_t >= 4 * pb + 0.1)

    # ---- birth: position ~ cell-windowed detection density, data marks
    win = jax.lax.dynamic_slice(
        view.cell_density, (y0 - view.row0_cd, x0 + CELL), (CELL, CELL)
    )
    win_sum = jnp.sum(win)
    win_prob = win / (win_sum + EPS)
    cell_idx = jax.random.categorical(k_pos, _log(win_prob).ravel())
    # continuous birth position: pixel draw + U[0,1)^2 in-pixel jitter (the
    # per-unit-area density is still the pixel's mass, so the Green ratio is
    # unchanged); byi/bxi truncate back to the sampled pixel
    jitter = jax.random.uniform(k_sub, (2,))
    py = (y0 + cell_idx // CELL).astype(jnp.float32) + jitter[0]
    px = (x0 + cell_idx % CELL).astype(jnp.float32) + jitter[1]
    byi = jnp.clip(py.astype(jnp.int32), 0, h - 1)
    bxi = jnp.clip(px.astype(jnp.int32), 0, w - 1)
    byi_l = jnp.clip(byi - view.row0_md, 0, view.mark_dists.shape[1] - 1)
    log_q_pos = _log(win_prob.ravel()[cell_idx]) + _log(area)
    rows = view.mark_dists[:, byi_l, bxi, :]  # (3, C)
    mkeys = jax.random.split(k_marks, 3)
    cls = jnp.stack(
        [jax.random.categorical(mkeys[m], _log(rows[m])) for m in range(3)]
    )
    # continuous marks: bin draw + U[0,1) in-bin jitter (per-unit-value
    # density unchanged; mirrors the in-pixel position jitter above)
    n_cls_b = view.mark_dists.shape[-1]
    steps_b = (kd.map_vmax - kd.map_vmin) / n_cls_b
    mjit = jax.random.uniform(jax.random.fold_in(k_marks, 7), (3,))
    birth_marks = jnp.stack(
        [_class_to_value(kd, m, cls[m]) + mjit[m] * steps_b[m]
         for m in range(3)]
    )
    log_q_marks = sum(_log(rows[m][cls[m]]) for m in range(3))
    n_classes = view.mark_dists.shape[-1]
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
    dyi_l = jnp.clip(dyi - view.row0_md, 0, view.mark_dists.shape[1] - 1)
    drows = view.mark_dists[:, dyi_l, dxi, :]
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

    # ---- translate: gaussian, clipped to the cell (stays non-interacting);
    # continuous — no pixel truncation
    delta = kd.sigma_trl * jax.random.normal(k_delta, (2,))
    g_trl_xy = jnp.clip(
        state.xy[safe_slot] + delta,
        jnp.stack([ylo, xlo]).astype(jnp.float32),
        jnp.stack([yhi - 1, xhi - 1]).astype(jnp.float32),
    )
    g_trl_logp = (
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
    g_trf_marks = state.marks[safe_slot].at[pid].set(new_val)
    g_trf_logp = (
        _log(jnp.asarray(P_TRF))
        + _normal_logpdf(mdelta, sigma)
        - _log(n_cell)
    )

    if data_moves:
        from mpp_cnn_rs_object_detection_tpu.mpp.kernels import (
            MAX_DELTA,
            WINDOW,
        )

        k_dtrl, k_dtrf, k_djit = jax.random.split(k_data, 3)
        sub_u = jax.random.uniform(k_dsub, (2,))
        use_data_trl = sub_u[0] < P_DATA_SUB
        use_data_trf = sub_u[1] < P_DATA_SUB

        # ---- data translation: resample the pixel from the WINDOW-sized
        # patch of the detection density around the point, zero outside the
        # cell (confinement) — the cell-local analog of the reference's
        # DataDrivenTranslationKernel (``transform_kernels.py:61-116``)
        win_pad = jnp.pad(win, MAX_DELTA)
        wloc = jax.lax.dynamic_slice(
            win_pad, (dwin_y, dwin_x), (WINDOW, WINDOW)
        )
        wsum = jnp.sum(wloc)
        wprob = wloc / (wsum + EPS)
        widx = jax.random.categorical(k_dtrl, _log(wprob).ravel())
        ddi, ddj = widx // WINDOW, widx % WINDOW
        new_wy = jnp.clip(dwin_y + ddi - MAX_DELTA, 0, CELL - 1)
        new_wx = jnp.clip(dwin_x + ddj - MAX_DELTA, 0, CELL - 1)
        djit = jax.random.uniform(k_djit, (3,))
        d_trl_xy = jnp.stack(
            [(y0 + new_wy).astype(jnp.float32) + djit[0],
             (x0 + new_wx).astype(jnp.float32) + djit[1]]
        )
        d_trl_fwd = _log(wprob.ravel()[widx]) - _log(n_cell)
        # backward: window centred at the NEW pixel, same cell clipping
        wloc_b = jax.lax.dynamic_slice(
            win_pad, (new_wy, new_wx), (WINDOW, WINDOW)
        )
        wprob_b = wloc_b / (jnp.sum(wloc_b) + EPS)
        d_trl_back = (
            _log(wprob_b[dwin_y - new_wy + MAX_DELTA,
                         dwin_x - new_wx + MAX_DELTA])
            - _log(n_cell)
        )
        d_trl_valid = wsum > 1e-12

        # ---- data mark transform: resample ONE mark from its per-pixel
        # shapenet distribution (``transform_kernels.py:163-225``); reuses
        # the death section's row/class gathers at the point's pixel
        row_d = drows[pid]
        new_cls_d = jax.random.categorical(k_dtrf, _log(row_d))
        step_d = (kd.map_vmax[pid] - kd.map_vmin[pid]) / n_classes
        d_val = _class_to_value(kd, pid, new_cls_d) + djit[2] * step_d
        d_trf_marks = state.marks[safe_slot].at[pid].set(d_val)
        d_trf_fwd = _log(row_d[new_cls_d]) - _log(n_cell)
        d_trf_back = _log(row_d[dcls[pid]]) - _log(n_cell)

        pick_data_trl = use_data_trl & d_trl_valid
        trl_xy = jnp.where(pick_data_trl, d_trl_xy, g_trl_xy)
        trl_fwd = jnp.where(pick_data_trl, d_trl_fwd, g_trl_logp)
        trl_back = jnp.where(pick_data_trl, d_trl_back, g_trl_logp)
        # a data translation from a zero-density window is invalid -> noop
        trl_ok = ~use_data_trl | d_trl_valid
        trf_marks = jnp.where(use_data_trf, d_trf_marks, g_trf_marks)
        trf_fwd = jnp.where(use_data_trf, d_trf_fwd, g_trf_logp)
        trf_back = jnp.where(use_data_trf, d_trf_back, g_trf_logp)
    else:
        trl_xy, trl_fwd, trl_back = g_trl_xy, g_trl_logp, g_trl_logp
        trf_marks, trf_fwd, trf_back = g_trf_marks, g_trf_logp, g_trf_logp
        trl_ok = jnp.asarray(True)

    # ---- assemble
    birth_ok = cell_ok & free_ok & birth_valid
    pick_ok = cell_slot >= 0

    kind = jnp.where(
        is_birth,
        jnp.where(birth_ok, 1, 0),
        jnp.where(
            pick_ok,
            jnp.where(is_death, 2, jnp.where(is_trl & ~trl_ok, 0, 3)),
            0,
        ),
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
        jnp.where(is_death, death_fwd, jnp.where(is_trl, trl_fwd, trf_fwd)),
    )
    log_back = jnp.where(
        is_birth, birth_back,
        jnp.where(is_death, death_back, jnp.where(is_trl, trl_back, trf_back)),
    )
    slot2 = jnp.asarray(-1, jnp.int32)
    xy2 = jnp.zeros((2,), jnp.float32)
    marks2 = jnp.zeros((3,), jnp.float32)
    if not split_merge:
        return kind, slot, xy, marks, log_fwd, log_back, slot2, xy2, marks2

    # ---- split/merge (cell-confined variants of the reference pair,
    # ``split_and_merge_kernels.py:14-178``; same displacement density as
    # the sequential kernels, ``mpp.kernels._split_kernel/_merge_kernel``,
    # with cell-local counts n_cell replacing the global n and both
    # children/the partner constrained to the cell so simultaneous cell
    # proposals stay non-interacting — the same clipping argument the
    # translation move documents above).
    k_sm1 = jax.random.fold_in(key, 1001)
    k_sm2 = jax.random.fold_in(key, 1002)
    k_sm3 = jax.random.fold_in(key, 1003)
    k_sm4 = jax.random.fold_in(key, 1004)

    cell_lo = jnp.stack([ylo, xlo]).astype(jnp.float32)
    cell_hi = jnp.stack([yhi - 1, xhi - 1]).astype(jnp.float32)
    p0 = state.xy[safe_slot]
    m0 = state.marks[safe_slot]

    # split: children at p0 -/+ delta (uniform positive-quadrant disk of
    # radius MERGE_RADIUS x per-mark gaussians), clipped into the cell
    rho = MERGE_RADIUS * jnp.sqrt(jax.random.uniform(k_sm1))
    theta = jax.random.uniform(k_sm2, maxval=jnp.pi / 2)
    pos_delta = rho * jnp.array([jnp.cos(theta), jnp.sin(theta)])
    sm_sigmas = 0.1 * (kd.map_vmax - kd.map_vmin)
    shape_delta = sm_sigmas * jax.random.normal(k_sm3, (3,))
    sp_xy_a = jnp.clip(p0 - pos_delta, cell_lo, cell_hi)
    sp_xy_b = jnp.clip(p0 + pos_delta, cell_lo, cell_hi)
    sp_marks_a = _clip_marks(kd, m0 - shape_delta)
    sp_marks_b = _clip_marks(kd, m0 + shape_delta)
    sp_fwd = (
        _log(jnp.asarray(0.1)) - _log(n_cell)
        + _split_logpdf(kd, pos_delta, shape_delta) - _log(lam_cell)
    )
    # backward merge picks either child then its sibling; neighbour counts
    # over the post-split in-cell set (in-cell points minus the parent,
    # plus the sibling — mirrored from the sequential kernel's formula)
    others_mask = in_cell & (jnp.arange(state.capacity) != safe_slot)
    d_a = jnp.linalg.norm(state.xy - sp_xy_a[None, :], axis=-1)
    d_b = jnp.linalg.norm(state.xy - sp_xy_b[None, :], axis=-1)
    nn_a = jnp.sum(others_mask & (d_a <= MERGE_RADIUS)) + 1
    nn_b = jnp.sum(others_mask & (d_b <= MERGE_RADIUS)) + 1
    sp_back = _log(jnp.asarray(0.1)) + _log(
        (1.0 / (n_cell + 1.0)) * (1.0 / nn_a + 1.0 / nn_b)
    )
    split_ok = pick_ok & free_ok & cell_ok

    # merge: partner uniform among in-cell points within MERGE_RADIUS
    d0 = jnp.linalg.norm(state.xy - p0[None, :], axis=-1)
    mg_mask = others_mask & (d0 <= MERGE_RADIUS)
    n_nb = jnp.sum(mg_mask)
    nb_slot = jnp.where(
        n_nb > 0,
        jax.random.categorical(k_sm4, jnp.where(mg_mask, 0.0, -jnp.inf)),
        safe_slot,
    )
    p1 = state.xy[nb_slot]
    m1 = state.marks[nb_slot]
    mg_xy = jnp.clip((p0 + p1) / 2.0, cell_lo, cell_hi)
    mg_marks = _clip_marks(kd, (m0 + m1) / 2.0)
    mg_fwd = (
        _log(jnp.asarray(0.1)) - _log(n_cell)
        - _log(n_nb.astype(jnp.float32))
    )
    mg_back = (
        _log(jnp.asarray(0.1)) - _log(n_cell - 1.0)
        + _split_logpdf(kd, (p0 - p1) / 2.0, (m0 - m1) / 2.0)
        - _log(lam_cell)
    )
    merge_ok = pick_ok & (n_nb > 0) & (n_cell >= 2)

    sm = is_split | is_merge
    kind = jnp.where(
        is_split, jnp.where(split_ok, 4, 0),
        jnp.where(is_merge, jnp.where(merge_ok, 5, 0), kind),
    )
    slot = jnp.where(sm, safe_slot, slot)
    xy = jnp.where(is_split, sp_xy_a, jnp.where(is_merge, mg_xy, xy))
    marks = jnp.where(is_split, sp_marks_a,
                      jnp.where(is_merge, mg_marks, marks))
    log_fwd = jnp.where(is_split, sp_fwd, jnp.where(is_merge, mg_fwd, log_fwd))
    log_back = jnp.where(is_split, sp_back,
                         jnp.where(is_merge, mg_back, log_back))
    slot2 = jnp.where(is_split, free_slot,
                      jnp.where(is_merge, nb_slot, slot2)).astype(jnp.int32)
    xy2 = jnp.where(is_split, sp_xy_b, xy2)
    marks2 = jnp.where(is_split, sp_marks_b, marks2)
    return kind, slot, xy, marks, log_fwd, log_back, slot2, xy2, marks2


def _type_probs(data_moves: bool) -> np.ndarray:
    """Global move-type mixture for the switched superstep: birth, death,
    gaussian-trl, data-trl, gaussian-trf, data-trf. Same marginals as the
    per-cell draws (data moves at the reference's 2:1 weighting)."""
    if data_moves:
        return np.array([
            P_BIRTH, P_DEATH,
            P_TRL * (1 - P_DATA_SUB), P_TRL * P_DATA_SUB,
            P_TRF * (1 - P_DATA_SUB), P_TRF * P_DATA_SUB,
        ])
    return np.array([P_BIRTH, P_DEATH, P_TRL, 0.0, P_TRF, 0.0])


def _cell_proposal_switched(key, move_type, state: PointsState,
                            kd: KernelData, view: MapView, h: int, w: int,
                            y0: Array, x0: Array, free_slot: Array,
                            free_ok: Array):
    """One MH proposal confined to the cell, with the MOVE TYPE drawn once
    per superstep (a scalar shared by all cells) instead of per cell.

    Statistically this is the same mixture: a superstep is now one of six
    composite kernels (all-birth, all-death, ...), each a product of
    non-interacting per-cell kernels, mixed with ``_type_probs`` — each
    composite satisfies detailed balance with its reverse type, and the
    per-cell Green ratios below carry the exact same P(type) factors as the
    per-cell-draw variant. The payoff is compute: ``lax.switch`` executes
    ONE branch per superstep, where the per-cell draw traced every move
    family for every cell — the superstep is dispatch-bound on this
    hardware (~15 us/op, HBM util ~1%), so dead branches were the single
    largest cost."""
    (k_slot, k_pos, k_marks, k_delta, k_param,
     k_sub, k_data) = jax.random.split(key, 7)

    # ---- common prelude (every branch needs the cell extent + slot draw)
    ylo = jnp.clip(y0, 0, h)
    xlo = jnp.clip(x0, 0, w)
    yhi = jnp.clip(y0 + CELL, 0, h)
    xhi = jnp.clip(x0 + CELL, 0, w)
    area = jnp.maximum((yhi - ylo) * (xhi - xlo), 0).astype(jnp.float32)
    cell_ok = area > 0
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
    pick_ok = cell_slot >= 0
    lam_cell = kd.intensity * area / float(h * w)
    win = jax.lax.dynamic_slice(
        view.cell_density, (y0 - view.row0_cd, x0 + CELL), (CELL, CELL)
    )
    win_sum = jnp.sum(win)
    win_prob = win / (win_sum + EPS)
    n_classes = view.mark_dists.shape[-1]
    cur_xy = state.xy[safe_slot]
    cur_marks = state.marks[safe_slot]

    def _point_pixel():
        dyi = jnp.clip(cur_xy[0].astype(jnp.int32), 0, h - 1)
        dxi = jnp.clip(cur_xy[1].astype(jnp.int32), 0, w - 1)
        dyi_l = jnp.clip(dyi - view.row0_md, 0, view.mark_dists.shape[1] - 1)
        return dyi, dxi, dyi_l

    def birth(_):
        cell_idx = jax.random.categorical(k_pos, _log(win_prob).ravel())
        jitter = jax.random.uniform(k_sub, (5,))
        py = (y0 + cell_idx // CELL).astype(jnp.float32) + jitter[0]
        px = (x0 + cell_idx % CELL).astype(jnp.float32) + jitter[1]
        byi = jnp.clip(py.astype(jnp.int32), 0, h - 1)
        bxi = jnp.clip(px.astype(jnp.int32), 0, w - 1)
        byi_l = jnp.clip(byi - view.row0_md, 0, view.mark_dists.shape[1] - 1)
        rows = view.mark_dists[:, byi_l, bxi, :]
        mkeys = jax.random.split(k_marks, 3)
        cls = jnp.stack([
            jax.random.categorical(mkeys[m], _log(rows[m])) for m in range(3)
        ])
        steps_b = (kd.map_vmax - kd.map_vmin) / n_classes
        marks = jnp.stack([
            _class_to_value(kd, m, cls[m]) + jitter[2 + m] * steps_b[m]
            for m in range(3)
        ])
        log_q = (
            _log(win_prob.ravel()[cell_idx]) + _log(area)
            + sum(_log(rows[m][cls[m]]) for m in range(3))
            + 3 * jnp.log(float(n_classes))
        )
        fwd = _log(jnp.asarray(P_BIRTH)) + log_q - _log(lam_cell)
        back = _log(jnp.asarray(P_DEATH)) - _log(n_cell + 1.0)
        ok = cell_ok & free_ok & (win_sum > 1e-12)
        return (jnp.where(ok, 1, 0).astype(jnp.int32), free_slot,
                jnp.stack([py, px]), marks, fwd, back)

    def death(_):
        from mpp_cnn_rs_object_detection_tpu.mpp.kernels import (
            _value_to_class,
        )

        dyi, dxi, dyi_l = _point_pixel()
        drows = view.mark_dists[:, dyi_l, dxi, :]
        dcls = jnp.stack([
            _value_to_class(kd, m, cur_marks[m]) for m in range(3)
        ])
        dwin_y = jnp.clip(dyi - y0, 0, CELL - 1)
        dwin_x = jnp.clip(dxi - x0, 0, CELL - 1)
        fwd = _log(jnp.asarray(P_DEATH)) - _log(n_cell)
        log_q = (
            _log(win_prob[dwin_y, dwin_x]) + _log(area)
            + sum(_log(drows[m][dcls[m]]) for m in range(3))
            + 3 * jnp.log(float(n_classes))
        )
        back = _log(jnp.asarray(P_BIRTH)) + log_q - _log(lam_cell)
        return (jnp.where(pick_ok, 2, 0).astype(jnp.int32), safe_slot,
                cur_xy, cur_marks, fwd, back)

    def gauss_trl(_):
        delta = kd.sigma_trl * jax.random.normal(k_delta, (2,))
        xy = jnp.clip(
            cur_xy + delta,
            jnp.stack([ylo, xlo]).astype(jnp.float32),
            jnp.stack([yhi - 1, xhi - 1]).astype(jnp.float32),
        )
        logp = jnp.sum(_normal_logpdf(delta, kd.sigma_trl)) - _log(n_cell)
        return (jnp.where(pick_ok, 3, 0).astype(jnp.int32), safe_slot, xy,
                cur_marks, logp, logp)

    def data_trl(_):
        from mpp_cnn_rs_object_detection_tpu.mpp.kernels import (
            MAX_DELTA,
            WINDOW,
        )

        dyi, dxi, _ = _point_pixel()
        dwin_y = jnp.clip(dyi - y0, 0, CELL - 1)
        dwin_x = jnp.clip(dxi - x0, 0, CELL - 1)
        win_pad = jnp.pad(win, MAX_DELTA)
        wloc = jax.lax.dynamic_slice(
            win_pad, (dwin_y, dwin_x), (WINDOW, WINDOW)
        )
        wsum = jnp.sum(wloc)
        wprob = wloc / (wsum + EPS)
        widx = jax.random.categorical(k_data, _log(wprob).ravel())
        ddi, ddj = widx // WINDOW, widx % WINDOW
        new_wy = jnp.clip(dwin_y + ddi - MAX_DELTA, 0, CELL - 1)
        new_wx = jnp.clip(dwin_x + ddj - MAX_DELTA, 0, CELL - 1)
        djit = jax.random.uniform(k_sub, (2,))
        xy = jnp.stack([
            (y0 + new_wy).astype(jnp.float32) + djit[0],
            (x0 + new_wx).astype(jnp.float32) + djit[1],
        ])
        fwd = _log(wprob.ravel()[widx]) - _log(n_cell)
        wloc_b = jax.lax.dynamic_slice(
            win_pad, (new_wy, new_wx), (WINDOW, WINDOW)
        )
        wprob_b = wloc_b / (jnp.sum(wloc_b) + EPS)
        back = (
            _log(wprob_b[dwin_y - new_wy + MAX_DELTA,
                         dwin_x - new_wx + MAX_DELTA])
            - _log(n_cell)
        )
        ok = pick_ok & (wsum > 1e-12)
        return (jnp.where(ok, 3, 0).astype(jnp.int32), safe_slot, xy,
                cur_marks, fwd, back)

    def gauss_trf(_):
        pid = jax.random.randint(k_param, (), 0, 3)
        sigma = kd.sigma_trf[pid]
        mdelta = sigma * jax.random.normal(k_delta)
        old = cur_marks[pid]
        rng_ = kd.map_vmax[pid] - kd.map_vmin[pid]
        new_val = jnp.where(
            kd.map_cyclic[pid],
            ((old + mdelta) % rng_) + kd.map_vmin[pid],
            jnp.clip(old + mdelta, kd.map_vmin[pid], kd.map_vmax[pid]),
        )
        marks = cur_marks.at[pid].set(new_val)
        logp = _normal_logpdf(mdelta, sigma) - _log(n_cell)
        return (jnp.where(pick_ok, 3, 0).astype(jnp.int32), safe_slot,
                cur_xy, marks, logp, logp)

    def data_trf(_):
        from mpp_cnn_rs_object_detection_tpu.mpp.kernels import (
            _value_to_class,
        )

        pid = jax.random.randint(k_param, (), 0, 3)
        dyi, dxi, dyi_l = _point_pixel()
        row = view.mark_dists[pid, dyi_l, dxi, :]
        new_cls = jax.random.categorical(k_data, _log(row))
        step_t = (kd.map_vmax[pid] - kd.map_vmin[pid]) / n_classes
        new_val = (
            _class_to_value(kd, pid, new_cls)
            + jax.random.uniform(k_sub) * step_t
        )
        old_cls = _value_to_class(kd, pid, cur_marks[pid])
        marks = cur_marks.at[pid].set(new_val)
        fwd = _log(row[new_cls]) - _log(n_cell)
        back = _log(row[old_cls]) - _log(n_cell)
        return (jnp.where(pick_ok, 3, 0).astype(jnp.int32), safe_slot,
                cur_xy, marks, fwd, back)

    kind, slot, xy, marks, fwd, back = jax.lax.switch(
        move_type, [birth, death, gauss_trl, data_trl, gauss_trf, data_trf],
        0,
    )
    # guard the degenerate lanes exactly like the per-cell variant
    kind = jnp.where(cell_ok, kind, 0)
    # switched variant carries no split/merge (non-default path; the pair is
    # available through the per-cell draws only)
    return (kind, slot, xy, marks, fwd, back,
            jnp.asarray(-1, jnp.int32), jnp.zeros((2,), jnp.float32),
            jnp.zeros((3,), jnp.float32))


def _unary_at(maps: EnergyMaps, spec: EnergySpec, xy: Array, marks: Array,
              view: MapView = None, hw=None):
    """Unary data columns for one candidate point at (xy, marks) — the
    point-wise analog of ``energies.data_columns``. With ``view`` the gathers
    read the device-local row blocks (sharded maps); ``maps`` still supplies
    the replicated mapping scalars."""
    if spec.data_term != "cnn":
        from mpp_cnn_rs_object_detection_tpu.mpp.classic_energies import (
            ContrastConfig,
            contrast_energy_point,
            gradient_energy_point,
        )

        if spec.data_term == "contrast":
            cfg = spec.contrast or ContrastConfig()
            val = contrast_energy_point(maps.image, xy, marks, cfg)
        else:
            val = gradient_energy_point(maps.image, xy, marks)
        return val, jnp.zeros((3,), jnp.float32)
    if view is None:
        position, mark_maps = maps.position, maps.mark_maps
        row0 = 0
        h, w = maps.position.shape
    else:
        position, mark_maps = view.position, view.mark_maps
        row0 = view.row0_md
        h, w = hw
    from mpp_cnn_rs_object_detection_tpu.mpp.energies import (
        mark_lookup_interp,
        position_lookup,
    )

    pos = position_lookup(position, xy, h, w, row0=row0)
    mark = mark_lookup_interp(
        mark_maps, xy, marks, maps.map_vmin, maps.map_vmax, maps.map_cyclic,
        h, w, row0=row0,
    )
    return pos, mark


def _vec_cols(spec: EnergySpec, maps: EnergyMaps, pos, mark3, ov, al, area,
              ratio_mark):
    """Assemble a per-point energy vector in ``energy_from_cache`` column
    order (works for (K,)-shaped columns or scalars)."""
    area_prior = jnp.maximum(
        0.0, jnp.maximum(maps.min_area - area, area - maps.max_area)
    )
    cols = [pos]
    if spec.data_term == "cnn":
        if spec.shape_mode == "mean":
            cols.append(jnp.mean(mark3, axis=-1))
        else:
            cols.extend([mark3[..., 0], mark3[..., 1], mark3[..., 2]])
    cols.extend([ov, al, area_prior])
    if spec.use_ratio_prior:
        cols.append(jnp.abs(maps.target_ratio - ratio_mark))
    return jnp.stack(cols, axis=-1)


def superstep_deltas(state: PointsState, cache: EnergyCache, maps: EnergyMaps,
                     spec: EnergySpec, comb: EnergyCombiner,
                     kinds, slots, xys, markss, view: MapView = None,
                     hw=None, slots2=None, xys2=None, markss2=None):
    """Exact ΔU of ``m`` single-slot proposals against the SAME base state,
    in O(m*K) — no per-candidate cache copies.

    The naive route (apply + refresh cache row + full ``energy_from_cache``)
    materialises m copies of the (K, K) pair matrices: multi-GB at scene-level
    K. Instead, per-point TOP-2 statistics of the masked overlap/align rows
    (computed once per superstep) give every neighbour's leave-one-out reduced
    term in O(1); inserting the candidate's fresh pair row then yields each
    neighbour's new reduced term, and only the touched columns of its energy
    vector are re-combined. Exactness is pinned against the brute-force delta
    in tests. Valid for the parallel sampler's kinds (birth=1 / death=2 /
    single-slot move=3).

    With ``slots2``/``xys2``/``markss2`` (the split/merge pair: split=4
    modifies ``slot`` and births ``slot2``; merge=5 modifies ``slot`` and
    kills ``slot2``) the same scheme generalises to two-slot proposals via
    TOP-3 statistics: removing up to two columns of a neighbour's masked row
    falls through t1->t2->t3, and up to two fresh values (plus the
    children's mutual pair term) are inserted. Single-slot lanes in the
    batch keep their exact deltas (``slot2 < 0`` disables the second-slot
    terms)."""
    from mpp_cnn_rs_object_detection_tpu.mpp.combinators import (
        combine as _combine,
    )
    from mpp_cnn_rs_object_detection_tpu.ops.geometry import (
        marks_to_poly,
        quad_intersection_area_matrix,
        rect_area,
    )

    k = state.capacity
    eye = jnp.eye(k, dtype=bool)
    alive = state.alive
    alive_pair = alive[:, None] & alive[None, :] & ~eye
    ov_mask = alive_pair & (cache.dist <= spec.overlap_max_dist)
    al_mask = alive_pair & (cache.dist <= spec.align_max_dist)

    def top2s(values, mask, sign):
        v = jnp.where(mask, sign * values, -jnp.inf)
        t1 = jnp.max(v, axis=1)
        a1 = jnp.argmax(v, axis=1)
        t2 = jnp.max(v.at[jnp.arange(k), a1].set(-jnp.inf), axis=1)
        return t1, a1, t2  # sign-domain; -inf where no masked entry

    ov_sign = 1.0
    al_sign = -1.0 if spec.rewarding_align else 1.0
    ov1, ov_a, ov2 = top2s(cache.overlap, ov_mask, ov_sign)
    al1, al_a, al2 = top2s(cache.align, al_mask, al_sign)
    ov_n = jnp.sum(ov_mask, axis=1)
    al_n = jnp.sum(al_mask, axis=1)

    idx = jnp.arange(k)
    ov_red = jnp.where(ov_n > 0, ov_sign * ov1, 0.0)
    al_red = jnp.where(al_n > 0, al_sign * al1, 0.0)
    base_vec = _vec_cols(
        spec, maps, cache.pos_e, cache.mark_e, ov_red, al_red, cache.areas,
        state.marks[:, 1],
    )
    pp_raw = _combine(comb, base_vec)  # (K,) valid where alive
    # column indices of the pair-reduced terms in the vector layout
    n_data = 1 if spec.data_term != "cnn" else (
        2 if spec.shape_mode == "mean" else 4
    )
    ov_col, al_col = n_data, n_data + 1

    def delta_one(kind, slot, xy, marks):
        s = jnp.clip(slot, 0, k - 1)
        alive_s_new = kind != 2  # death clears; birth/move leave s alive

        poly_s = marks_to_poly(
            xy[None], marks[0][None], marks[1][None], marks[2][None]
        )[0]
        area_s = rect_area(marks[0], marks[1])
        dist_row = jnp.linalg.norm(state.xy - xy[None, :], axis=-1)
        inter_row = quad_intersection_area_matrix(poly_s[None], cache.polys)[0]
        ov_row = inter_row / (jnp.minimum(cache.areas, area_s) + 1e-6)
        al_row = (
            1.0
            - jnp.abs(jnp.cos(marks[2] - state.marks[:, 2]))
            - float(spec.rewarding_align)
        )
        others = alive & (idx != s)
        ov_new_mask = alive_s_new & others & (dist_row <= spec.overlap_max_dist)
        al_new_mask = alive_s_new & others & (dist_row <= spec.align_max_dist)

        def neighbour_red(t1, a1, t2, n, old_col, new_mask, new_vals, sign):
            ext_wo = jnp.where((a1 == s) & old_col, t2, t1)
            n_wo = n - old_col
            ext_new = jnp.maximum(
                ext_wo, jnp.where(new_mask, sign * new_vals, -jnp.inf)
            )
            n_new = n_wo + new_mask
            return jnp.where(n_new > 0, sign * ext_new, 0.0)

        ov_red_new = neighbour_red(
            ov1, ov_a, ov2, ov_n, ov_mask[:, s], ov_new_mask, ov_row, ov_sign
        )
        al_red_new = neighbour_red(
            al1, al_a, al2, al_n, al_mask[:, s], al_new_mask, al_row, al_sign
        )
        vec_new = base_vec.at[:, ov_col].set(ov_red_new)
        vec_new = vec_new.at[:, al_col].set(al_red_new)
        pp_new = _combine(comb, vec_new)
        d_others = jnp.sum(jnp.where(others, pp_new - pp_raw, 0.0))

        # the candidate slot itself
        ov_s_n = jnp.sum(ov_new_mask)
        al_s_n = jnp.sum(al_new_mask)
        ov_s = jnp.where(
            ov_s_n > 0,
            ov_sign * jnp.max(
                jnp.where(ov_new_mask, ov_sign * ov_row, -jnp.inf)
            ),
            0.0,
        )
        al_s = jnp.where(
            al_s_n > 0,
            al_sign * jnp.max(
                jnp.where(al_new_mask, al_sign * al_row, -jnp.inf)
            ),
            0.0,
        )
        pos_s, mark_s = _unary_at(maps, spec, xy, marks, view=view, hw=hw)
        vec_s = _vec_cols(spec, maps, pos_s, mark_s, ov_s, al_s, area_s,
                          marks[1])
        pp_s_new = jnp.where(
            alive_s_new, _combine(comb, vec_s[None])[0], 0.0
        )
        pp_s_old = jnp.where(alive[s], pp_raw[s], 0.0)
        return pp_s_new - pp_s_old + d_others

    if slots2 is None:
        deltas = jax.vmap(delta_one)(kinds, slots, xys, markss)
        return jnp.where(kinds == 0, 0.0, deltas)

    # ---- two-slot path (split/merge enabled): TOP-3 leave-two-out
    def top3s(values, mask, sign):
        v = jnp.where(mask, sign * values, -jnp.inf)
        t1 = jnp.max(v, axis=1)
        a1 = jnp.argmax(v, axis=1)
        v2 = v.at[jnp.arange(k), a1].set(-jnp.inf)
        t2 = jnp.max(v2, axis=1)
        a2 = jnp.argmax(v2, axis=1)
        t3 = jnp.max(v2.at[jnp.arange(k), a2].set(-jnp.inf), axis=1)
        return t1, a1, t2, a2, t3

    ov1_, ova1, ov2_, ova2, ov3_ = top3s(cache.overlap, ov_mask, ov_sign)
    al1_, ala1, al2_, ala2, al3_ = top3s(cache.align, al_mask, al_sign)

    def pair_terms(xy_c, marks_c):
        poly_c = marks_to_poly(
            xy_c[None], marks_c[0][None], marks_c[1][None], marks_c[2][None]
        )[0]
        area_c = rect_area(marks_c[0], marks_c[1])
        dist_row = jnp.linalg.norm(state.xy - xy_c[None, :], axis=-1)
        inter = quad_intersection_area_matrix(poly_c[None], cache.polys)[0]
        ov_row = inter / (jnp.minimum(cache.areas, area_c) + 1e-6)
        al_row = (
            1.0 - jnp.abs(jnp.cos(marks_c[2] - state.marks[:, 2]))
            - float(spec.rewarding_align)
        )
        return poly_c, area_c, dist_row, ov_row, al_row

    def delta_two(kind, slot, xy, marks, slot2, xy2, marks2):
        s = jnp.clip(slot, 0, k - 1)
        has2 = (kind == 4) | (kind == 5)
        s2 = jnp.clip(slot2, 0, k - 1)
        alive_s_new = kind != 2
        alive_s2_new = kind == 4

        _, area_s, dist_s, ovr_s, alr_s = pair_terms(xy, marks)
        poly2, area_s2, dist_s2, ovr_s2, alr_s2 = pair_terms(xy2, marks2)

        others = alive & (idx != s) & ~(has2 & (idx == s2))
        ovm_s = alive_s_new & others & (dist_s <= spec.overlap_max_dist)
        alm_s = alive_s_new & others & (dist_s <= spec.align_max_dist)
        ovm_s2 = alive_s2_new & others & (dist_s2 <= spec.overlap_max_dist)
        alm_s2 = alive_s2_new & others & (dist_s2 <= spec.align_max_dist)

        colS_ov = ov_mask[:, s]
        colS_al = al_mask[:, s]
        colS2_ov = has2 & ov_mask[:, s2]
        colS2_al = has2 & al_mask[:, s2]

        def red2(t1, a1, t2, a2, t3, n, colS, colS2, newS, valS,
                 newS2, valS2, sign):
            rm1 = ((a1 == s) & colS) | ((a1 == s2) & colS2)
            rm2 = ((a2 == s) & colS) | ((a2 == s2) & colS2)
            ext_wo = jnp.where(rm1, jnp.where(rm2, t3, t2), t1)
            n_wo = n - colS - colS2
            ext_new = jnp.maximum(
                ext_wo, jnp.where(newS, sign * valS, -jnp.inf)
            )
            ext_new = jnp.maximum(
                ext_new, jnp.where(newS2, sign * valS2, -jnp.inf)
            )
            n_new = n_wo + newS + newS2
            return jnp.where(n_new > 0, sign * ext_new, 0.0)

        ov_red_new = red2(ov1_, ova1, ov2_, ova2, ov3_, ov_n,
                          colS_ov, colS2_ov, ovm_s, ovr_s, ovm_s2, ovr_s2,
                          ov_sign)
        al_red_new = red2(al1_, ala1, al2_, ala2, al3_, al_n,
                          colS_al, colS2_al, alm_s, alr_s, alm_s2, alr_s2,
                          al_sign)
        vec_new = base_vec.at[:, ov_col].set(ov_red_new)
        vec_new = vec_new.at[:, al_col].set(al_red_new)
        pp_new = _combine(comb, vec_new)
        d_others = jnp.sum(jnp.where(others, pp_new - pp_raw, 0.0))

        # mutual pair term between the two children (split only)
        d_ab = jnp.linalg.norm(xy - xy2)
        poly_a = marks_to_poly(
            xy[None], marks[0][None], marks[1][None], marks[2][None]
        )[0]
        inter_ab = quad_intersection_area_matrix(poly_a[None], poly2[None])[
            0, 0
        ]
        ov_ab = inter_ab / (jnp.minimum(area_s, area_s2) + 1e-6)
        al_ab = (
            1.0 - jnp.abs(jnp.cos(marks[2] - marks2[2]))
            - float(spec.rewarding_align)
        )
        mut = alive_s_new & alive_s2_new
        mut_ov = mut & (d_ab <= spec.overlap_max_dist)
        mut_al = mut & (d_ab <= spec.align_max_dist)

        def cand_red(new_mask, vals, mut_ok, mut_val, sign):
            ext = jnp.max(
                jnp.where(new_mask, sign * vals, -jnp.inf), initial=-jnp.inf
            )
            ext = jnp.maximum(
                ext, jnp.where(mut_ok, sign * mut_val, -jnp.inf)
            )
            n_c = jnp.sum(new_mask) + mut_ok
            return jnp.where(n_c > 0, sign * ext, 0.0)

        ov_s = cand_red(ovm_s, ovr_s, mut_ov, ov_ab, ov_sign)
        al_s = cand_red(alm_s, alr_s, mut_al, al_ab, al_sign)
        pos_s, mark_s = _unary_at(maps, spec, xy, marks, view=view, hw=hw)
        vec_s = _vec_cols(spec, maps, pos_s, mark_s, ov_s, al_s, area_s,
                          marks[1])
        pp_s_new = jnp.where(
            alive_s_new, _combine(comb, vec_s[None])[0], 0.0
        )

        ov_s2 = cand_red(ovm_s2, ovr_s2, mut_ov, ov_ab, ov_sign)
        al_s2 = cand_red(alm_s2, alr_s2, mut_al, al_ab, al_sign)
        pos_s2, mark_s2 = _unary_at(maps, spec, xy2, marks2, view=view,
                                    hw=hw)
        vec_s2 = _vec_cols(spec, maps, pos_s2, mark_s2, ov_s2, al_s2,
                           area_s2, marks2[1])
        pp_s2_new = jnp.where(
            alive_s2_new, _combine(comb, vec_s2[None])[0], 0.0
        )

        pp_old = (
            jnp.where(alive[s], pp_raw[s], 0.0)
            + jnp.where(has2 & alive[s2], pp_raw[s2], 0.0)
        )
        return pp_s_new + pp_s2_new - pp_old + d_others

    deltas = jax.vmap(delta_two)(kinds, slots, xys, markss,
                                 slots2, xys2, markss2)
    return jnp.where(kinds == 0, 0.0, deltas)


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


def _apply_batch(state: PointsState, cache: EnergyCache, spec: EnergySpec,
                 kinds, slots, xys, markss, pos_us, mark_us, accept,
                 slots2=None, xys2=None, markss2=None, pos_us2=None,
                 mark_us2=None) -> Tuple[PointsState, EnergyCache]:
    """Apply ALL accepted proposals of a superstep in one batched scatter.

    Accepted proposals touch pairwise-distinct slots (cells are disjoint;
    births draw distinct free slots by rank) and are non-interacting, so the
    batched write is exactly the sequential application: every cache row is
    computed against the post-update state, and row/column scatters of two
    updated slots agree on their shared entry. Replaces a fori_loop whose
    per-iteration masked select copied the whole O(K^2) cache m times per
    superstep — the dominant cost of the exact-scene chain at scene-level K.
    """
    from mpp_cnn_rs_object_detection_tpu.ops.geometry import (
        marks_to_poly,
        quad_intersection_area_matrix,
        rect_area,
    )

    k = state.capacity
    safe = jnp.clip(slots, 0, k - 1)
    # out-of-range target => update dropped; non-accepted lanes route to K
    tgt = jnp.where(accept, safe, k)
    write_geom = accept & (
        (kinds == 1) | (kinds == 3) | (kinds == 4) | (kinds == 5)
    )
    tgt_geom = jnp.where(write_geom, safe, k)

    new_xy = state.xy.at[tgt_geom].set(xys, mode="drop")
    new_marks = state.marks.at[tgt_geom].set(markss, mode="drop")
    tgt_birth = jnp.where(accept & (kinds == 1), safe, k)
    tgt_death = jnp.where(accept & (kinds == 2), safe, k)
    new_alive = (
        state.alive.at[tgt_birth].set(True, mode="drop")
        .at[tgt_death].set(False, mode="drop")
    )

    polys_new = marks_to_poly(xys, markss[:, 0], markss[:, 1], markss[:, 2])
    areas_new = rect_area(markss[:, 0], markss[:, 1])
    polys = cache.polys.at[tgt_geom].set(polys_new, mode="drop")
    areas = cache.areas.at[tgt_geom].set(areas_new, mode="drop")

    if slots2 is not None:
        # second slot of split (4: birth at slot2) / merge (5: slot2 dies)
        safe2 = jnp.clip(slots2, 0, k - 1)
        tgt2_geom = jnp.where(accept & (kinds == 4), safe2, k)
        tgt2_death = jnp.where(accept & (kinds == 5), safe2, k)
        new_xy = new_xy.at[tgt2_geom].set(xys2, mode="drop")
        new_marks = new_marks.at[tgt2_geom].set(markss2, mode="drop")
        new_alive = (
            new_alive.at[tgt2_geom].set(True, mode="drop")
            .at[tgt2_death].set(False, mode="drop")
        )
        polys2_new = marks_to_poly(
            xys2, markss2[:, 0], markss2[:, 1], markss2[:, 2]
        )
        areas2_new = rect_area(markss2[:, 0], markss2[:, 1])
        polys = polys.at[tgt2_geom].set(polys2_new, mode="drop")
        areas = areas.at[tgt2_geom].set(areas2_new, mode="drop")

    state2 = state.replace(xy=new_xy, marks=new_marks, alive=new_alive)

    # batched pair rows of every touched slot vs the FINAL state: (m, K)
    xy_u = state2.xy[safe]
    dist_rows = jnp.linalg.norm(
        state2.xy[None, :, :] - xy_u[:, None, :], axis=-1
    )
    inter = quad_intersection_area_matrix(polys[safe], polys)
    min_area = jnp.minimum(areas[None, :], areas[safe][:, None])
    overlap_rows = inter / (min_area + 1e-6)
    dangle = state2.marks[safe, 2][:, None] - state2.marks[None, :, 2]
    align_rows = 1.0 - jnp.abs(jnp.cos(dangle)) - float(spec.rewarding_align)

    def set_row_col(mat, rows, at):
        mat = mat.at[at, :].set(rows, mode="drop")
        return mat.at[:, at].set(rows.T, mode="drop")

    dist_m = set_row_col(cache.dist, dist_rows, tgt)
    ov_m = set_row_col(cache.overlap, overlap_rows, tgt)
    al_m = set_row_col(cache.align, align_rows, tgt)
    pos_m = cache.pos_e.at[tgt].set(pos_us, mode="drop")
    mark_m = cache.mark_e.at[tgt].set(mark_us, mode="drop")

    if slots2 is not None:
        # refresh the second slot's rows for split births (vs the SAME
        # final state, so the (s, s2) entry agrees between both scatters);
        # a merged-away slot needs no refresh — its entries are dead-masked
        tgt2 = jnp.where(accept & (kinds == 4), safe2, k)
        xy_u2 = state2.xy[safe2]
        dist_rows2 = jnp.linalg.norm(
            state2.xy[None, :, :] - xy_u2[:, None, :], axis=-1
        )
        inter2 = quad_intersection_area_matrix(polys[safe2], polys)
        min_area2 = jnp.minimum(areas[None, :], areas[safe2][:, None])
        overlap_rows2 = inter2 / (min_area2 + 1e-6)
        dangle2 = state2.marks[safe2, 2][:, None] - state2.marks[None, :, 2]
        align_rows2 = (
            1.0 - jnp.abs(jnp.cos(dangle2)) - float(spec.rewarding_align)
        )
        dist_m = set_row_col(dist_m, dist_rows2, tgt2)
        ov_m = set_row_col(ov_m, overlap_rows2, tgt2)
        al_m = set_row_col(al_m, align_rows2, tgt2)
        pos_m = pos_m.at[tgt2].set(pos_us2, mode="drop")
        mark_m = mark_m.at[tgt2].set(mark_us2, mode="drop")

    cache2 = EnergyCache(
        dist=dist_m,
        overlap=ov_m,
        align=al_m,
        pos_e=pos_m,
        mark_e=mark_m,
        polys=polys,
        areas=areas,
    )
    return state2, cache2


def make_parallel_step(maps: EnergyMaps, spec: EnergySpec, comb: EnergyCombiner,
                       kd: KernelData, alpha_t: float, t_target: float,
                       n_cells: int, view: MapView = None, hw=None,
                       axis_name: str = None, n_bands: int = 1,
                       data_moves: bool = True, move_switch: bool = False,
                       split_merge: bool = False):
    """Superstep over ``n_cells`` x ``n_cells`` active cells.

    With ``axis_name`` set the step runs inside ``shard_map`` over ``n_bands``
    row bands: every device evaluates the global cell grid against its local
    ``view`` but only trusts ("owns") cells whose clipped midpoint row falls
    in its band; the per-cell records (proposal + ΔU + unary + accept) are
    psum-combined over the mesh and every device applies the identical
    accepted set to its replicated state/cache — cross-band pair energies are
    EXACT because the state is global, while the O(H*W) maps stay sharded."""
    # correctness precondition for simultaneous cell moves (see CELL above)
    assert CELL >= max(spec.overlap_max_dist, spec.align_max_dist), (
        f"CELL={CELL} < interaction radius "
        f"{max(spec.overlap_max_dist, spec.align_max_dist)}: concurrent cell "
        "proposals would interact"
    )
    h, w = hw if hw is not None else kd.log_birth_density.shape
    if view is None:
        view = make_local_view(kd, maps)
    band_h = h // n_bands

    type_logp = jnp.asarray(np.log(_type_probs(data_moves) + 1e-30))

    def step(carry, key):
        state, cache, energy, temp = carry
        k_off, k_cells, k_acc, k_mtype = jax.random.split(key, 4)

        off = jax.random.randint(k_off, (2,), -CELL, CELL)
        ids = jnp.arange(n_cells)
        y0s = off[0] + 2 * CELL * (ids[:, None].repeat(n_cells, 1)).ravel()
        x0s = off[1] + 2 * CELL * (ids[None, :].repeat(n_cells, 0)).ravel()
        m = y0s.shape[0]

        if axis_name is None:
            owned = jnp.ones((m,), bool)
        else:
            mid = jnp.clip(y0s + CELL // 2, 0, h - 1)
            owned = (mid // band_h) == jax.lax.axis_index(axis_name)

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
        if move_switch:
            # ONE move type per superstep: lax.switch executes one branch
            # (the superstep is dispatch-bound; per-cell type draws traced
            # every family for every cell)
            mtype = jax.random.categorical(k_mtype, type_logp)
            (kinds, slots, xys, markss, log_fwds, log_backs,
             slots2, xys2, markss2) = jax.vmap(
                lambda k, y0, x0, fs, fo: _cell_proposal_switched(
                    k, mtype, state, kd, view, h, w, y0, x0, fs, fo,
                )
            )(keys, y0s, x0s, free_slots, free_oks)
        else:
            (kinds, slots, xys, markss, log_fwds, log_backs,
             slots2, xys2, markss2) = jax.vmap(
                lambda k, y0, x0, fs, fo: _cell_proposal(
                    k, state, kd, view, h, w, y0, x0, fs, fo,
                    data_moves=data_moves, split_merge=split_merge,
                )
            )(keys, y0s, x0s, free_slots, free_oks)

        # per-proposal ΔU (exact; proposals are pairwise non-interacting);
        # top-2 incremental form — O(m*K), no per-candidate cache copies
        # (top-3 when the split/merge pair is enabled)
        sm_kw = (
            dict(slots2=slots2, xys2=xys2, markss2=markss2)
            if split_merge else {}
        )
        deltas = superstep_deltas(
            state, cache, maps, spec, comb, kinds, slots, xys, markss,
            view=view, hw=(h, w), **sm_kw,
        )
        pos_us, mark_us = jax.vmap(
            lambda xy, mk: _unary_at(maps, spec, xy, mk, view=view, hw=(h, w))
        )(xys, markss)
        if split_merge:
            pos_us2, mark_us2 = jax.vmap(
                lambda xy, mk: _unary_at(maps, spec, xy, mk, view=view,
                                         hw=(h, w))
            )(xys2, markss2)

        log_alpha = -deltas / temp + log_backs - log_fwds
        accept = (
            (jnp.log(jax.random.uniform(k_acc, (m,)) + EPS) < log_alpha)
            & (kinds != 0)
            & owned
        )

        if axis_name is not None:
            # combine per-cell records over the mesh: each lane has exactly
            # one owner, so a masked psum reconstructs the global record set
            def merge(x, is_bool=False):
                mask = owned.reshape((m,) + (1,) * (x.ndim - 1))
                y = jnp.where(mask, x.astype(jnp.int32) if is_bool else x, 0)
                y = jax.lax.psum(y, axis_name)
                return y.astype(bool) if is_bool else y

            kinds, slots = merge(kinds), merge(slots)
            xys, markss = merge(xys), merge(markss)
            deltas = merge(deltas)
            pos_us, mark_us = merge(pos_us), merge(mark_us)
            accept = merge(accept, is_bool=True)
            if split_merge:
                # slot2 is -1 on inactive lanes; psum of masked (-1 -> 0)
                # would corrupt it, so shift to 0-based before the merge
                slots2 = merge(slots2 + 1) - 1
                xys2, markss2 = merge(xys2), merge(markss2)
                pos_us2, mark_us2 = merge(pos_us2), merge(mark_us2)

        # apply all accepted proposals in one batched scatter (they touch
        # pairwise-distinct slots and cannot interact)
        apply_kw = (
            dict(slots2=slots2, xys2=xys2, markss2=markss2,
                 pos_us2=pos_us2, mark_us2=mark_us2)
            if split_merge else {}
        )
        state, cache = _apply_batch(
            state, cache, spec, kinds, slots, xys, markss, pos_us, mark_us,
            accept, **apply_kw,
        )
        energy = energy + jnp.sum(jnp.where(accept, deltas, 0.0))
        temp = jnp.where(temp > t_target, temp * alpha_t, temp)
        stats = (jnp.sum(accept), jnp.sum(kinds != 0))
        return (state, cache, energy, temp), stats

    return step


@partial(
    jax.jit,
    static_argnames=("spec", "n_supersteps", "alpha_t", "t_target",
                     "data_moves", "move_switch", "split_merge"),
)
def run_parallel_chain(key, init_state: PointsState, maps: EnergyMaps,
                       spec: EnergySpec, comb: EnergyCombiner, kd: KernelData,
                       n_supersteps: int, t0: float = 1.0,
                       alpha_t: float = 0.999, t_target: float = 0.0,
                       data_moves: bool = True, move_switch: bool = False,
                       split_merge: bool = False
                       ) -> Tuple[PointsState, ChainStats]:
    """Anneal with cell-parallel supersteps; one superstep proposes up to
    (H/(2*CELL)+1)^2 simultaneous moves."""
    h, w = kd.log_birth_density.shape
    n_cells = max(h, w) // (2 * CELL) + 1
    step = make_parallel_step(maps, spec, comb, kd, alpha_t, t_target, n_cells,
                              data_moves=data_moves, move_switch=move_switch,
                              split_merge=split_merge)
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
