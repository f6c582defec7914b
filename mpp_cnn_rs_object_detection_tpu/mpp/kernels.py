"""RJMCMC proposal kernels as pure jittable functions.

Re-derivation of the reference's 8-kernel mixture
(``models/mpp/rjmcmc_sampler/kernels/``): every kernel produces a standardized
``Proposal`` (birth / death / move of one slot + forward/backward log
densities for the Green ratio), selected per step with ``lax.switch`` — so a
step costs ONE energy evaluation regardless of kernel, and the whole sampler
vmaps over thousands of chains.

Kernel mixture and densities (reference formulas):
  - Birth:  q_fwd = p_birth * q(u) / intensity ; q_back = p_death / (n+1)
            (``base_kernels.py:55-66``)
  - Death:  q_fwd = p_death / n ; q_back = p_birth * q(u_rm) / intensity
            (``base_kernels.py:100-115``)
  - Gaussian translation (sigma=2): N(delta) / n, symmetric
            (``transform_kernels.py:17-58``)
  - Data translation: local (2*max_delta+1)^2 window of the normalised
    detection map, renormalised (``transform_kernels.py:61-116``)
  - Gaussian mark transform (sigma=0.1*range, cyclic wrap for angle),
    symmetric (``transform_kernels.py:119-160``)
  - Data mark transform: per-pixel shapenet distribution row
            (``transform_kernels.py:163-225``)
  - Data-driven birth density q(u) = det_norm[x,y] * prod_m dist_m[x,y,cls_m]
    * (H*W*C^3); uniform birth density q(u) = 1
            (``shape_samplers.py:78-150``)
"""

from __future__ import annotations

from typing import Tuple

import flax
import jax
import jax.numpy as jnp
import numpy as np

from mpp_cnn_rs_object_detection_tpu.mpp.state import PointsState

Array = jnp.ndarray
EPS = 1e-16
MAX_DELTA = 8  # data-translation window half-size (reference make_kernels.py:124)
WINDOW = 2 * MAX_DELTA + 1

# proposal kinds
NOOP, BIRTH, DEATH, MOVE, SPLIT, MERGE = 0, 1, 2, 3, 4, 5

# kernel indices in the mixture
K_UNIF_BIRTH, K_UNIF_DEATH, K_DATA_BIRTH, K_DATA_DEATH = 0, 1, 2, 3
K_GAUSS_TRL, K_DATA_TRL, K_GAUSS_TRF, K_DATA_TRF = 4, 5, 6, 7
K_SPLIT, K_MERGE = 8, 9

MERGE_RADIUS = 16.0  # reference make_kernels.py:142
SPLIT_SHAPE_SIGMA = 0.1

BASE_KERNEL_WEIGHTS = {
    "bd_weight": 1.0,
    "uniform_bd_weight": 1.0,
    "data_bd_weight": 2.0,
    "ms_weight": 1.0,
    "translation_weight": 1.0,
    "gaussian_translation_weight": 1.0,
    "data_translation_weight": 2.0,
    "transformation_weight": 1.0,
    "gaussian_transformation_weight": 1.0,
    "data_transformation_weight": 2.0,
}


@flax.struct.dataclass
class Proposal:
    """A standardized move. ``slot2/xy2/marks2`` are only active for
    SPLIT (second new point claims a free slot) and MERGE (second removed
    slot); other kernels set slot2 = slot."""

    kind: Array      # int32 scalar: NOOP/BIRTH/DEATH/MOVE/SPLIT/MERGE
    slot: Array      # int32 scalar
    xy: Array        # (2,) f32
    marks: Array     # (3,) f32
    slot2: Array     # int32 scalar
    xy2: Array       # (2,) f32
    marks2: Array    # (3,) f32
    log_fwd: Array   # f32
    log_back: Array  # f32


@flax.struct.dataclass
class KernelData:
    """Device-resident sampling inputs for one tile."""

    birth_cdf: Array        # (H*W,) inclusive cumsum of normalised det map
    log_birth_density: Array  # (H, W) log of normalised det map
    mark_dists: Array       # (3, H, W, C) normalised mark distributions
    padded_density: Array   # (H + 2*MAX_DELTA, W + 2*MAX_DELTA) zero-padded
    map_vmin: Array         # (3,)
    map_vmax: Array         # (3,)
    map_cyclic: Array       # (3,) bool
    p_kernels: Array        # (8,) kernel mixture probabilities
    log_norm_const: Array   # log(H * W * C^3)
    intensity: Array        # scalar point-process intensity
    sigma_trl: Array        # scalar (2.0)
    sigma_trf: Array        # (3,) = 0.1 * mark range


def kernel_probabilities(weights=None, use_split_merge: bool = False
                         ) -> np.ndarray:
    """The kernel mixture from the decision tree (``make_kernels.py:50-177``):
    8 kernels, or 10 with the split/merge pair enabled."""
    w = dict(BASE_KERNEL_WEIGHTS, **(weights or {}))
    if use_split_merge:
        top = np.array(
            [w["bd_weight"], w["ms_weight"], w["translation_weight"],
             w["transformation_weight"]]
        )
        p_bd, p_ms, p_trl, p_trf = top / top.sum()
    else:
        top = np.array(
            [w["bd_weight"], w["translation_weight"], w["transformation_weight"]]
        )
        p_bd, p_trl, p_trf = top / top.sum()
        p_ms = 0.0
    bd = np.array([w["uniform_bd_weight"], w["data_bd_weight"]])
    p_bd_unif, p_bd_data = bd / bd.sum()
    trl = np.array([w["gaussian_translation_weight"], w["data_translation_weight"]])
    p_trl_g, p_trl_d = trl / trl.sum()
    trf = np.array([w["gaussian_transformation_weight"], w["data_transformation_weight"]])
    p_trf_g, p_trf_d = trf / trf.sum()
    p = [
        0.5 * p_bd * p_bd_unif,
        0.5 * p_bd * p_bd_unif,
        0.5 * p_bd * p_bd_data,
        0.5 * p_bd * p_bd_data,
        p_trl * p_trl_g,
        p_trl * p_trl_d,
        p_trf * p_trf_g,
        p_trf * p_trf_d,
    ]
    if use_split_merge:
        p += [0.5 * p_ms, 0.5 * p_ms]
    p = np.array(p)
    assert abs(p.sum() - 1.0) < 1e-8
    return p


def make_kernel_data(detection_map: np.ndarray, mark_dist_maps, mappings,
                     intensity: float, kernel_weights=None,
                     use_split_merge: bool = False) -> KernelData:
    """Constructor (mirrors ``make_kernels``).

    The heavy per-map passes (stack, per-pixel normalisation, cumsum, pad)
    run as device ops: at flagship scale the mark maps are ~400 MB, and a
    1-core host spent most of the scene "prep" stage on these numpy passes.
    ``mark_dist_maps`` may be a list of 3 (H, W, C) arrays (numpy or device)
    or an already-stacked (3, H, W, C) device array (see
    ``energies.stack_param_dists`` — lets the exact-scene path transfer the
    maps once and share them with ``EnergyMaps``)."""
    det = jnp.maximum(jnp.asarray(detection_map, jnp.float32), 0.0)
    norm = det / jnp.maximum(det.sum(), 1e-30)
    if isinstance(mark_dist_maps, (list, tuple)):
        dists = jnp.stack(
            [jnp.asarray(m, jnp.float32) for m in mark_dist_maps]
        )  # (3,H,W,C)
    else:
        dists = jnp.asarray(mark_dist_maps, jnp.float32)
    dists = dists / jnp.maximum(dists.sum(axis=-1, keepdims=True), 1e-30)
    h, w = det.shape
    c = dists.shape[-1]
    return KernelData(
        birth_cdf=jnp.cumsum(norm.ravel()),
        log_birth_density=jnp.log(norm + EPS),
        mark_dists=dists,
        padded_density=jnp.pad(norm, MAX_DELTA, mode="constant"),
        map_vmin=jnp.array([m.v_min for m in mappings], jnp.float32),
        map_vmax=jnp.array([m.v_max for m in mappings], jnp.float32),
        map_cyclic=jnp.array([m.is_cyclic for m in mappings], bool),
        p_kernels=jnp.asarray(
            kernel_probabilities(kernel_weights, use_split_merge), jnp.float32
        ),
        log_norm_const=jnp.asarray(np.log(float(h * w * c ** 3)), jnp.float32),
        intensity=jnp.asarray(float(intensity), jnp.float32),
        sigma_trl=jnp.asarray(2.0, jnp.float32),
        sigma_trf=jnp.asarray(
            [0.1 * (m.v_max - m.v_min) for m in mappings], jnp.float32
        ),
    )


# ------------------------------------------------------------------- helpers


def _log(x):
    return jnp.log(x + EPS)


def _random_alive_slot(key, alive: Array) -> Array:
    """Uniform choice among alive slots (-1 if none)."""
    logits = jnp.where(alive, 0.0, -jnp.inf)
    idx = jax.random.categorical(key, logits)
    return jnp.where(jnp.any(alive), idx, -1)


def _class_to_value(kd: KernelData, mark_idx, cls) -> Array:
    n_cls = kd.mark_dists.shape[-1]
    step = (kd.map_vmax[mark_idx] - kd.map_vmin[mark_idx]) / n_cls
    return kd.map_vmin[mark_idx] + cls.astype(jnp.float32) * step


def _value_to_class(kd: KernelData, mark_idx, value) -> Array:
    n_cls = kd.mark_dists.shape[-1]
    rng = kd.map_vmax[mark_idx] - kd.map_vmin[mark_idx]
    val = jnp.where(
        kd.map_cyclic[mark_idx],
        ((value - kd.map_vmin[mark_idx]) % rng) + kd.map_vmin[mark_idx],
        value,
    )
    cls = jnp.floor((val - kd.map_vmin[mark_idx]) / (rng / n_cls)).astype(jnp.int32)
    return jnp.clip(cls, 0, n_cls - 1)


def _pixel_of(state: PointsState, kd: KernelData, slot) -> Tuple[Array, Array]:
    h, w = kd.log_birth_density.shape
    xi = jnp.clip(state.xy[slot, 0].astype(jnp.int32), 0, h - 1)
    yi = jnp.clip(state.xy[slot, 1].astype(jnp.int32), 0, w - 1)
    return xi, yi


def _normal_logpdf(x, sigma):
    return -0.5 * (x / sigma) ** 2 - jnp.log(sigma * jnp.sqrt(2.0 * jnp.pi))


def _mk_prop(kind, slot, xy, marks, log_fwd, log_back,
             slot2=None, xy2=None, marks2=None) -> Proposal:
    return Proposal(
        kind=jnp.int32(kind),
        slot=jnp.asarray(slot, jnp.int32),
        xy=jnp.asarray(xy, jnp.float32),
        marks=jnp.asarray(marks, jnp.float32),
        slot2=jnp.asarray(slot if slot2 is None else slot2, jnp.int32),
        xy2=jnp.asarray(xy if xy2 is None else xy2, jnp.float32),
        marks2=jnp.asarray(marks if marks2 is None else marks2, jnp.float32),
        log_fwd=log_fwd,
        log_back=log_back,
    )


def _noop(log_p: Array) -> Proposal:
    return _mk_prop(
        NOOP, 0, jnp.zeros((2,), jnp.float32), jnp.ones((3,), jnp.float32),
        log_p, log_p,
    )


def _select_prop(cond, a: Proposal, b: Proposal) -> Proposal:
    return jax.tree_util.tree_map(lambda x, y: jnp.where(cond, x, y), a, b)


# ------------------------------------------------------------------- kernels


def _birth_common(key, state: PointsState, kd: KernelData, p_half: Array,
                  data_driven: bool) -> Proposal:
    h, w = kd.log_birth_density.shape
    k_pos, k_marks, k_sub = jax.random.split(key, 3)
    # positions are CONTINUOUS (the point process lives on R^2, and the
    # bilinear energy lookups make sub-pixel positions meaningful); pixel
    # draws get a U[0,1)^2 in-pixel jitter. The per-unit-area proposal
    # density is unchanged (the pixel's mass spread over its unit square),
    # so every Green ratio below is untouched. The reference truncates to
    # the pixel grid (its integer map gather can't resolve finer).
    jitter = jax.random.uniform(k_sub, (5,))
    if data_driven:
        u = jax.random.uniform(k_pos)
        idx = jnp.searchsorted(kd.birth_cdf, u, side="left")
        idx = jnp.clip(idx, 0, h * w - 1)
        xi, yi = idx // w, idx % w
        keys = jax.random.split(k_marks, 3)
        rows = kd.mark_dists[:, xi, yi, :]  # (3, C)
        cls = jnp.stack(
            [jax.random.categorical(keys[m], _log(rows[m])) for m in range(3)]
        )
        # marks are CONTINUOUS too: bin draw + U[0,1) in-bin jitter (the
        # bin's mass spread over its width — per-unit-value density
        # unchanged, same argument as the position jitter above)
        n_cls = kd.mark_dists.shape[-1]
        steps = (kd.map_vmax - kd.map_vmin) / n_cls
        marks = jnp.stack(
            [_class_to_value(kd, m, cls[m]) + jitter[2 + m] * steps[m]
             for m in range(3)]
        )
        log_q = (
            kd.log_birth_density[xi, yi]
            + sum(_log(rows[m][cls[m]]) for m in range(3))
            + kd.log_norm_const
        )
    else:
        k_px, k_py = jax.random.split(k_pos)
        xi = jax.random.randint(k_px, (), 0, h)
        yi = jax.random.randint(k_py, (), 0, w)
        keys = jax.random.split(k_marks, 3)
        marks = jnp.stack(
            [
                jax.random.uniform(
                    keys[m], minval=kd.map_vmin[m], maxval=kd.map_vmax[m]
                )
                for m in range(3)
            ]
        )
        log_q = _log(jnp.asarray(1.0))
    n = state.n_points
    slot = jnp.argmin(state.alive)
    full = jnp.all(state.alive)
    prop = _mk_prop(
        BIRTH, slot, jnp.array([xi, yi], jnp.float32) + jitter[:2], marks,
        _log(p_half) + log_q - _log(kd.intensity),
        _log(p_half) - _log((n + 1).astype(jnp.float32)),
    )
    # capacity overflow: reject the move by construction (no-op)
    return _select_prop(full, _noop(_log(p_half)), prop)


def _death_common(key, state: PointsState, kd: KernelData, p_half: Array,
                  data_driven: bool) -> Proposal:
    n = state.n_points
    slot = _random_alive_slot(key, state.alive)
    safe_slot = jnp.maximum(slot, 0)
    if data_driven:
        xi, yi = _pixel_of(state, kd, safe_slot)
        cls = jnp.stack(
            [_value_to_class(kd, m, state.marks[safe_slot, m]) for m in range(3)]
        )
        rows = kd.mark_dists[:, xi, yi, :]
        log_q = (
            kd.log_birth_density[xi, yi]
            + sum(_log(rows[m][cls[m]]) for m in range(3))
            + kd.log_norm_const
        )
    else:
        log_q = _log(jnp.asarray(1.0))
    prop = _mk_prop(
        DEATH, safe_slot, state.xy[safe_slot], state.marks[safe_slot],
        _log(p_half) - _log(n.astype(jnp.float32)),
        _log(p_half) + log_q - _log(kd.intensity),
    )
    return _select_prop(slot < 0, _noop(_log(p_half)), prop)


def _gaussian_translation(key, state: PointsState, kd: KernelData,
                          p_kernel: Array) -> Proposal:
    h, w = kd.log_birth_density.shape
    n = state.n_points
    k_slot, k_delta = jax.random.split(key)
    slot = _random_alive_slot(k_slot, state.alive)
    safe_slot = jnp.maximum(slot, 0)
    delta = kd.sigma_trl * jax.random.normal(k_delta, (2,))
    # continuous translation (no pixel truncation): the symmetric gaussian
    # density is then exact for both directions
    new_xy = jnp.clip(
        state.xy[safe_slot] + delta,
        jnp.zeros((2,)),
        jnp.array([h - 1, w - 1], jnp.float32),
    )
    log_density = jnp.sum(_normal_logpdf(delta, kd.sigma_trl))
    log_p = _log(p_kernel) + log_density - _log(n.astype(jnp.float32))
    prop = _mk_prop(
        MOVE, safe_slot, new_xy, state.marks[safe_slot], log_p, log_p,
    )
    return _select_prop(slot < 0, _noop(_log(p_kernel)), prop)


def _window_logprobs(kd: KernelData, xi, yi) -> Array:
    """(WINDOW, WINDOW) renormalised local density window centred at (xi, yi).

    ``padded_density`` is zero-padded by MAX_DELTA so the slice at (xi, yi)
    is exactly the reference's clipped window (zeros never sampled)."""
    win = jax.lax.dynamic_slice(
        kd.padded_density, (xi, yi), (WINDOW, WINDOW)
    )
    return _log(win / (jnp.sum(win) + EPS))


def _data_translation(key, state: PointsState, kd: KernelData,
                      p_kernel: Array) -> Proposal:
    n = state.n_points
    k_slot, k_cell, k_sub = jax.random.split(key, 3)
    slot = _random_alive_slot(k_slot, state.alive)
    safe_slot = jnp.maximum(slot, 0)
    xi, yi = _pixel_of(state, kd, safe_slot)
    logw = _window_logprobs(kd, xi, yi)
    cell = jax.random.categorical(k_cell, logw.ravel())
    di, dj = cell // WINDOW, cell % WINDOW
    new_x = xi + di - MAX_DELTA
    new_y = yi + dj - MAX_DELTA
    log_fwd = _log(p_kernel) + logw[di, dj] - _log(n.astype(jnp.float32))
    # backward: window centred at the new pixel, density of the old pixel.
    # The in-pixel jitter has unit density, so pixel masses are the exact
    # per-unit-area densities in both directions.
    logw_b = _window_logprobs(kd, new_x, new_y)
    bi = xi - new_x + MAX_DELTA
    bj = yi - new_y + MAX_DELTA
    log_back = _log(p_kernel) + logw_b[bi, bj] - _log(n.astype(jnp.float32))
    prop = _mk_prop(
        MOVE, safe_slot,
        jnp.array([new_x, new_y], jnp.float32)
        + jax.random.uniform(k_sub, (2,)),
        state.marks[safe_slot], log_fwd, log_back,
    )
    return _select_prop(slot < 0, _noop(_log(p_kernel)), prop)


def _gaussian_transform(key, state: PointsState, kd: KernelData,
                        p_kernel: Array) -> Proposal:
    n = state.n_points
    k_slot, k_param, k_delta = jax.random.split(key, 3)
    slot = _random_alive_slot(k_slot, state.alive)
    safe_slot = jnp.maximum(slot, 0)
    pid = jax.random.randint(k_param, (), 0, 3)
    sigma = kd.sigma_trf[pid]
    delta = sigma * jax.random.normal(k_delta)
    old = state.marks[safe_slot, pid]
    rng = kd.map_vmax[pid] - kd.map_vmin[pid]
    new_val = jnp.where(
        kd.map_cyclic[pid],
        ((old + delta) % rng) + kd.map_vmin[pid],
        jnp.clip(old + delta, kd.map_vmin[pid], kd.map_vmax[pid]),
    )
    new_marks = state.marks[safe_slot].at[pid].set(new_val)
    log_p = (
        _log(p_kernel) + _normal_logpdf(delta, sigma) - _log(n.astype(jnp.float32))
    )
    prop = _mk_prop(
        MOVE, safe_slot, state.xy[safe_slot], new_marks, log_p, log_p,
    )
    return _select_prop(slot < 0, _noop(_log(p_kernel)), prop)


def _data_transform(key, state: PointsState, kd: KernelData,
                    p_kernel: Array) -> Proposal:
    n = state.n_points
    k_slot, k_param, k_cls, k_sub = jax.random.split(key, 4)
    slot = _random_alive_slot(k_slot, state.alive)
    safe_slot = jnp.maximum(slot, 0)
    pid = jax.random.randint(k_param, (), 0, 3)
    xi, yi = _pixel_of(state, kd, safe_slot)
    row = kd.mark_dists[pid, xi, yi, :]
    new_cls = jax.random.categorical(k_cls, _log(row))
    # continuous mark: bin draw + U[0,1) in-bin jitter (density per unit
    # value unchanged; the reverse density reads the old value's floor bin)
    n_cls_t = kd.mark_dists.shape[-1]
    step_t = (kd.map_vmax[pid] - kd.map_vmin[pid]) / n_cls_t
    new_val = (
        _class_to_value(kd, pid, new_cls)
        + jax.random.uniform(k_sub) * step_t
    )
    old_cls = _value_to_class(kd, pid, state.marks[safe_slot, pid])
    new_marks = state.marks[safe_slot].at[pid].set(new_val)
    nf = n.astype(jnp.float32)
    prop = _mk_prop(
        MOVE, safe_slot, state.xy[safe_slot], new_marks,
        _log(p_kernel) + _log(row[new_cls]) - _log(nf),
        _log(p_kernel) + _log(row[old_cls]) - _log(nf),
    )
    return _select_prop(slot < 0, _noop(_log(p_kernel)), prop)


def _clip_marks(kd: KernelData, marks: Array) -> Array:
    """Mapping clip: cyclic wrap for angle, min/max clamp otherwise
    (reference ``mappings.py`` ValueMapping.clip)."""
    rng = kd.map_vmax - kd.map_vmin
    wrapped = ((marks - kd.map_vmin) % rng) + kd.map_vmin
    clamped = jnp.clip(marks, kd.map_vmin, kd.map_vmax)
    return jnp.where(kd.map_cyclic, wrapped, clamped)


def _count_neighbors(state: PointsState, xy: Array, radius: float,
                     exclude_slot: Array) -> Array:
    """#alive points within ``radius`` of ``xy`` (excluding one slot)."""
    d = jnp.linalg.norm(state.xy - xy[None, :], axis=-1)
    mask = state.alive & (d <= radius)
    mask = mask.at[jnp.clip(exclude_slot, 0, state.capacity - 1)].set(
        jnp.where(exclude_slot >= 0, False, mask[jnp.clip(exclude_slot, 0, state.capacity - 1)])
    )
    return jnp.sum(mask)


def _split_logpdf(kd: KernelData, pos_delta: Array, shape_delta: Array) -> Array:
    """log density of a split displacement (reference
    ``split_and_merge_kernels.py:32-36``: uniform disk x per-mark gaussians)."""
    sigmas = SPLIT_SHAPE_SIGMA * (kd.map_vmax - kd.map_vmin)
    lp = -jnp.log(jnp.pi * MERGE_RADIUS**2)
    lp = lp + jnp.sum(_normal_logpdf(shape_delta, sigmas))
    return lp


def _split_kernel(key, state: PointsState, kd: KernelData, p_split: Array,
                  p_merge: Array) -> Proposal:
    """Split one point into two at +/- delta (reference ``SplitKernel``)."""
    h, w = kd.log_birth_density.shape
    n = state.n_points
    k_slot, k_rad, k_ang, k_shape = jax.random.split(key, 4)
    slot = _random_alive_slot(k_slot, state.alive)
    safe_slot = jnp.maximum(slot, 0)
    free_slot = jnp.argmin(state.alive)
    full = jnp.all(state.alive)

    # uniform on the positive-quadrant disk of radius MERGE_RADIUS
    rho = MERGE_RADIUS * jnp.sqrt(jax.random.uniform(k_rad))
    theta = jax.random.uniform(k_ang, maxval=jnp.pi / 2)
    pos_delta = rho * jnp.array([jnp.cos(theta), jnp.sin(theta)])
    sigmas = SPLIT_SHAPE_SIGMA * (kd.map_vmax - kd.map_vmin)
    shape_delta = sigmas * jax.random.normal(k_shape, (3,))

    p0 = state.xy[safe_slot]
    m0 = state.marks[safe_slot]
    lo = jnp.zeros((2,))
    hi = jnp.array([h - 1, w - 1], jnp.float32)
    xy_a = jnp.clip(p0 - pos_delta, lo, hi)
    xy_b = jnp.clip(p0 + pos_delta, lo, hi)
    marks_a = _clip_marks(kd, m0 - shape_delta)
    marks_b = _clip_marks(kd, m0 + shape_delta)

    nf = n.astype(jnp.float32)
    log_fwd = (
        _log(p_split) - _log(nf) + _split_logpdf(kd, pos_delta, shape_delta)
        - _log(kd.intensity)
    )
    # backward = merge picking either new point then its sibling
    nn_a = _count_neighbors(state, xy_a, MERGE_RADIUS, exclude_slot=safe_slot) + 1
    nn_b = _count_neighbors(state, xy_b, MERGE_RADIUS, exclude_slot=safe_slot) + 1
    log_back = _log(p_merge) + _log(
        (1.0 / (nf + 1.0)) * (1.0 / nn_a + 1.0 / nn_b)
    )
    prop = _mk_prop(
        SPLIT, safe_slot, xy_a, marks_a, log_fwd, log_back,
        slot2=free_slot, xy2=xy_b, marks2=marks_b,
    )
    return _select_prop((slot < 0) | full, _noop(_log(p_split)), prop)


def _merge_kernel(key, state: PointsState, kd: KernelData, p_split: Array,
                  p_merge: Array) -> Proposal:
    """Merge a point with a neighbor within MERGE_RADIUS into their average
    (reference ``MergeKernel``)."""
    h, w = kd.log_birth_density.shape
    n = state.n_points
    k_slot, k_nb = jax.random.split(key)
    slot = _random_alive_slot(k_slot, state.alive)
    safe_slot = jnp.maximum(slot, 0)
    d = jnp.linalg.norm(state.xy - state.xy[safe_slot][None, :], axis=-1)
    nb_mask = state.alive & (d <= MERGE_RADIUS)
    nb_mask = nb_mask.at[safe_slot].set(False)
    n_nb = jnp.sum(nb_mask)
    nb_logits = jnp.where(nb_mask, 0.0, -jnp.inf)
    nb_slot = jax.random.categorical(k_nb, nb_logits)
    nb_slot = jnp.where(n_nb > 0, nb_slot, safe_slot)

    p0, p1 = state.xy[safe_slot], state.xy[nb_slot]
    m0, m1 = state.marks[safe_slot], state.marks[nb_slot]
    lo = jnp.zeros((2,))
    hi = jnp.array([h - 1, w - 1], jnp.float32)
    xy_new = jnp.clip((p0 + p1) / 2.0, lo, hi)
    marks_new = _clip_marks(kd, (m0 + m1) / 2.0)

    nf = n.astype(jnp.float32)
    log_fwd = _log(p_merge) - _log(nf) - _log(n_nb.astype(jnp.float32))
    pos_delta = (p0 - p1) / 2.0
    shape_delta = (m0 - m1) / 2.0
    log_back = (
        _log(p_split) - _log(nf - 1.0)
        + _split_logpdf(kd, pos_delta, shape_delta) - _log(kd.intensity)
    )
    prop = _mk_prop(
        MERGE, safe_slot, xy_new, marks_new, log_fwd, log_back,
        slot2=nb_slot,
        xy2=state.xy[nb_slot], marks2=state.marks[nb_slot],
    )
    invalid = (slot < 0) | (n < 2) | (n_nb == 0)
    return _select_prop(invalid, _noop(_log(p_merge)), prop)


def sample_proposal(key, kernel_idx: Array, state: PointsState,
                    kd: KernelData) -> Proposal:
    """Dispatch to the chosen kernel (one branch traced per step via switch)."""
    p = kd.p_kernels
    branches = [
        lambda k: _birth_common(k, state, kd, p[K_UNIF_BIRTH], data_driven=False),
        lambda k: _death_common(k, state, kd, p[K_UNIF_DEATH], data_driven=False),
        lambda k: _birth_common(k, state, kd, p[K_DATA_BIRTH], data_driven=True),
        lambda k: _death_common(k, state, kd, p[K_DATA_DEATH], data_driven=True),
        lambda k: _gaussian_translation(k, state, kd, p[K_GAUSS_TRL]),
        lambda k: _data_translation(k, state, kd, p[K_DATA_TRL]),
        lambda k: _gaussian_transform(k, state, kd, p[K_GAUSS_TRF]),
        lambda k: _data_transform(k, state, kd, p[K_DATA_TRF]),
    ]
    if kd.p_kernels.shape[0] == 10:
        branches += [
            lambda k: _split_kernel(k, state, kd, p[K_SPLIT], p[K_MERGE]),
            lambda k: _merge_kernel(k, state, kd, p[K_SPLIT], p[K_MERGE]),
        ]
    return jax.lax.switch(kernel_idx, branches, key)


def apply_proposal(state: PointsState, prop: Proposal) -> PointsState:
    """Apply a proposal (no-op safe: kind == NOOP leaves the state intact)."""
    slot = jnp.clip(prop.slot, 0, state.capacity - 1)
    slot2 = jnp.clip(prop.slot2, 0, state.capacity - 1)
    write1 = (prop.kind == BIRTH) | (prop.kind == MOVE) | \
        (prop.kind == SPLIT) | (prop.kind == MERGE)
    write2 = prop.kind == SPLIT
    new_xy = jnp.where(write1, state.xy.at[slot].set(prop.xy), state.xy)
    new_xy = jnp.where(write2, new_xy.at[slot2].set(prop.xy2), new_xy)
    new_marks = jnp.where(
        write1, state.marks.at[slot].set(prop.marks), state.marks
    )
    new_marks = jnp.where(
        write2, new_marks.at[slot2].set(prop.marks2), new_marks
    )
    new_alive = jnp.where(
        (prop.kind == BIRTH) | (prop.kind == SPLIT),
        state.alive.at[slot].set(True),
        jnp.where(prop.kind == DEATH, state.alive.at[slot].set(False), state.alive),
    )
    new_alive = jnp.where(
        prop.kind == SPLIT, new_alive.at[slot2].set(True), new_alive
    )
    new_alive = jnp.where(
        prop.kind == MERGE, new_alive.at[slot2].set(False), new_alive
    )
    return state.replace(xy=new_xy, marks=new_marks, alive=new_alive)
