"""Vectorised MPP energies: per-point energy vectors from dense masked math.

Replaces the reference's incremental ``EnergyGraph`` (per-point lists of lazily
cached energy objects, ``models/mpp/point_set/energy_graph.py:20-291``) with
pure functions of a ``PointsState``: unary energies are map gathers, pair
energies are (K, K) matrices masked by alive x alive and interaction radius,
reduced per row (max / min as each term dictates,
``energies/prior_energies.py:20-46``). A perturbation's ΔU is just
``total - total`` of two states — exact, no bookkeeping, fully vmappable.

Term formulas (reference ``energies/data_energies.py``, ``prior_energies.py``):
  - PositionEnergy   = -2 * (detection_map[x, y] - threshold)
  - Shape/MarkEnergy = gather of remapped per-pixel mark distributions
  - OverlapEnergy    = max_j area(P_i ∩ P_j) / (min(area_i, area_j) + 1e-6)
  - AlignmentEnergy  = min/max_j 1 - |cos(angle_i - angle_j)| - rewarding
  - AreaPrior        = max(0, min_area - A, A - max_area)
  - RatioPrior       = |target_ratio - ratio|
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, List, Optional, Tuple

import flax
import jax
import jax.numpy as jnp
import numpy as np

from mpp_cnn_rs_object_detection_tpu.mpp.classic_energies import (
    ContrastConfig,
    contrast_energy_points,
    gradient_energy_points,
)
from mpp_cnn_rs_object_detection_tpu.mpp.state import PointsState
from mpp_cnn_rs_object_detection_tpu.ops.geometry import (
    marks_to_poly,
    quad_intersection_area_matrix,
    rect_area,
)

Array = jnp.ndarray


@dataclass(frozen=True)
class EnergySpec:
    """Static description of which energy columns exist (hashable, safe to
    close over under jit). Mirrors the reference's EnergySetup choice of terms
    (``energy_setup_legacy.py:40-46``, ``energy_setup_no_calibration.py``,
    ``energy_setup_contrast.py``)."""

    names: Tuple[str, ...]
    shape_mode: str = "mean"  # 'mean' (legacy ShapeEnergy) | 'separate' (3 marks)
    use_ratio_prior: bool = False
    rewarding_align: bool = True
    overlap_max_dist: float = 32.0
    align_max_dist: float = 16.0
    # data term: 'cnn' (detection + mark maps), 'contrast' or 'gradient'
    # (CNN-free, reference classics.py; maps.image carries the pixels /
    # precomputed gradient)
    data_term: str = "cnn"
    contrast: Optional["ContrastConfig"] = None

    @property
    def n_energies(self) -> int:
        return len(self.names)

    def index(self, name: str) -> int:
        return self.names.index(name)


LEGACY_SPEC = EnergySpec(
    names=(
        "PositionEnergy",
        "ShapeEnergy",
        "RectangleOverlapEnergy",
        "ShapeAlignmentEnergy",
        "AreaPriorEnergy",
    ),
    shape_mode="mean",
)

NO_CALIBRATION_SPEC = EnergySpec(
    names=(
        "PositionEnergy",
        "SizeEnergy",
        "RatioEnergy",
        "AngleEnergy",
        "OverlapPriorEnergy",
        "AlignmentPriorEnergy",
        "AreaPriorEnergy",
        "RatioPriorEnergy",
    ),
    shape_mode="separate",
    use_ratio_prior=True,
)


@flax.struct.dataclass
class EnergyMaps:
    """Device-resident per-tile energy inputs (the ImageWMaps compiled form)."""

    position: Array    # (H, W)  = -2 * (detection_map - threshold)
    mark_maps: Array   # (3, H, W, C) per-mark energy maps (already remapped)
    map_vmin: Array    # (3,) mark mapping v_min
    map_vmax: Array    # (3,)
    map_cyclic: Array  # (3,) bool
    min_area: Array    # scalar
    max_area: Array    # scalar
    target_ratio: Array  # scalar (RatioPrior; unused in legacy spec)
    image: Array       # (H, W, 3) pixels or gradient field; (1,1,3) if unused


def stack_param_dists(param_dist_maps, pad_hw=None) -> "jnp.ndarray":
    """Stack the 3 (H, W, C) mark maps into one (3, H, W, C) device array,
    optionally zero-padding H/W (scene shape buckets). One host->device
    transfer shared by ``EnergyMaps`` and ``KernelData`` construction — at
    flagship scale the maps are ~400 MB, so the exact-scene path calls this
    once and threads the device array through both constructors."""
    d = jnp.stack([jnp.asarray(m, jnp.float32) for m in param_dist_maps])
    if pad_hw is not None and (pad_hw[0] or pad_hw[1]):
        d = jnp.pad(d, ((0, 0), (0, pad_hw[0]), (0, pad_hw[1]), (0, 0)))
    return d


def make_energy_maps(detection_map: np.ndarray, mark_energy_maps,
                     threshold: float, min_area: float, max_area: float,
                     mappings, target_ratio: float = 0.0,
                     image: Optional[np.ndarray] = None) -> EnergyMaps:
    """Constructor from CNN inference artifacts (device-side passes).

    ``mark_energy_maps`` are the already-remapped (H, W, C) per-mark maps:
    legacy calibration ``-2*sigmoid(coef*p + icpt) + 1``
    (``energy_setup_legacy.py:144-150``) or plain ``-p`` (no-calibration).
    A list of 3 (H, W, C) arrays or a stacked (3, H, W, C) array.
    """
    if isinstance(mark_energy_maps, (list, tuple)):
        mark_maps = jnp.stack(
            [jnp.asarray(m, jnp.float32) for m in mark_energy_maps]
        )
    else:
        mark_maps = jnp.asarray(mark_energy_maps, jnp.float32)
    return EnergyMaps(
        position=-2.0 * (jnp.asarray(detection_map, jnp.float32) - threshold),
        mark_maps=mark_maps,
        map_vmin=jnp.array([m.v_min for m in mappings], jnp.float32),
        map_vmax=jnp.array([m.v_max for m in mappings], jnp.float32),
        map_cyclic=jnp.array([m.is_cyclic for m in mappings], bool),
        min_area=jnp.asarray(min_area, jnp.float32),
        max_area=jnp.asarray(max_area, jnp.float32),
        target_ratio=jnp.asarray(target_ratio, jnp.float32),
        image=(
            jnp.asarray(image, jnp.float32)
            if image is not None
            else jnp.zeros((1, 1, 3), jnp.float32)
        ),
    )


def bilinear_weights(x: Array, y: Array, h: int, w: int, row0=0,
                     n_rows: Optional[int] = None):
    """Shared sub-pixel gather setup: continuous (x, y) -> 4 corner index
    pairs + weights. ``row0``/``n_rows`` support row-sharded local map blocks
    (the halo strips cover the +1 row). Integer coordinates reproduce the
    exact pixel value, so this strictly generalises the reference's
    integer lookup (``data_energies.py:18-22``) while giving the sampler a
    sub-pixel energy gradient toward map peaks (the reference's integer
    gather leaves a flat plateau the chain random-walks on, costing ~0.7 px
    of position noise per detection)."""
    n_rows = h if n_rows is None else n_rows
    x = jnp.clip(x, 0.0, h - 1.0) - row0
    y = jnp.clip(y, 0.0, w - 1.0)
    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    fx = x - x0f
    fy = y - y0f
    x0 = jnp.clip(x0f.astype(jnp.int32), 0, n_rows - 1)
    x1 = jnp.clip(x0 + 1, 0, n_rows - 1)
    y0 = jnp.clip(y0f.astype(jnp.int32), 0, w - 1)
    y1 = jnp.clip(y0 + 1, 0, w - 1)
    wts = ((1 - fx) * (1 - fy), (1 - fx) * fy, fx * (1 - fy), fx * fy)
    return ((x0, y0), (x0, y1), (x1, y0), (x1, y1)), wts


def position_lookup(position: Array, xy: Array, h: int, w: int, row0=0) -> Array:
    """Bilinear detection-energy lookup at continuous centers.

    ``xy`` is (..., 2); ``position`` may be a row-sharded local block whose
    global first row is ``row0``."""
    idx, wts = bilinear_weights(xy[..., 0], xy[..., 1], h, w, row0,
                                position.shape[0])
    return sum(wt * position[i, j] for (i, j), wt in zip(idx, wts))


def mark_lookup(mark_maps: Array, xy: Array, cls: Array, h: int, w: int,
                row0=0) -> Array:
    """Bilinear per-mark energy lookup: (..., 3) values at (xy, class)."""
    idx, wts = bilinear_weights(xy[..., 0], xy[..., 1], h, w, row0,
                                mark_maps.shape[1])
    out = []
    for m in range(3):
        c = cls[..., m]
        out.append(sum(wt * mark_maps[m, i, j, c]
                       for (i, j), wt in zip(idx, wts)))
    return jnp.stack(out, axis=-1)


def mark_lookup_interp(mark_maps: Array, xy: Array, marks: Array,
                       vmin: Array, vmax: Array, cyclic: Array,
                       h: int, w: int, row0=0) -> Array:
    """Tri-linear per-mark energy lookup: bilinear in space AND linear in the
    mark value, with bin k anchored at its CENTER ``vmin + (k+0.5)*step``
    (cyclic wrap for the angle mark).

    The reference gathers the floor bin (``mappings.py:54-61`` +
    ``data_energies.py:33-45``), making the mark energy piecewise-constant
    over each bin: any size in [6, 7) px scores identically, so the chain's
    marks random-walk inside the bin and the overlap prior drags them to the
    small edge — measured −5% median size vs matched GT on the val sample
    (−0.5 bin ≈ the left-edge decode bias). Interpolating between adjacent
    bin centers restores an in-bin gradient toward the distribution peak;
    values exactly at a bin center reproduce the reference's gather."""
    idx, wts = bilinear_weights(xy[..., 0], xy[..., 1], h, w, row0,
                                mark_maps.shape[1])
    n_cls = mark_maps.shape[-1]
    rng = vmax - vmin
    step = rng / n_cls
    val = jnp.where(cyclic, ((marks - vmin) % rng) + vmin, marks)
    u = (val - vmin) / step - 0.5  # continuous bin-center coordinate
    k0 = jnp.floor(u).astype(jnp.int32)
    t = u - k0
    k0c = jnp.where(cyclic, jnp.mod(k0, n_cls), jnp.clip(k0, 0, n_cls - 1))
    k1c = jnp.where(
        cyclic, jnp.mod(k0 + 1, n_cls), jnp.clip(k0 + 1, 0, n_cls - 1)
    )
    out = []
    for m in range(3):
        v0 = sum(wt * mark_maps[m, i, j, k0c[..., m]]
                 for (i, j), wt in zip(idx, wts))
        v1 = sum(wt * mark_maps[m, i, j, k1c[..., m]]
                 for (i, j), wt in zip(idx, wts))
        out.append((1.0 - t[..., m]) * v0 + t[..., m] * v1)
    return jnp.stack(out, axis=-1)


def data_columns(state: PointsState, maps: EnergyMaps, spec: EnergySpec):
    """The data-term columns of the per-point energy vector."""
    if spec.data_term == "cnn":
        h, w = maps.position.shape
        pos = position_lookup(maps.position, state.xy, h, w)
        mark_e = _gather_mark_energies(state, maps)
        if spec.shape_mode == "mean":
            return [pos, jnp.mean(mark_e, axis=-1)]
        return [pos, mark_e[:, 0], mark_e[:, 1], mark_e[:, 2]]
    if spec.data_term == "contrast":
        cfg = spec.contrast or ContrastConfig()
        return [contrast_energy_points(maps.image, state.xy, state.marks, cfg)]
    if spec.data_term == "gradient":
        return [gradient_energy_points(maps.image, state.xy, state.marks)]
    raise ValueError(spec.data_term)


def marks_to_class(marks: Array, maps: EnergyMaps) -> Array:
    """(..., 3) mark values -> (..., 3) int32 bin ids (``mappings.py:113-129``)."""
    n_cls = maps.mark_maps.shape[-1]
    rng = maps.map_vmax - maps.map_vmin
    val = jnp.where(
        maps.map_cyclic,
        ((marks - maps.map_vmin) % rng) + maps.map_vmin,
        marks,
    )
    step = rng / n_cls
    cls = jnp.floor((val - maps.map_vmin) / step).astype(jnp.int32)
    return jnp.clip(cls, 0, n_cls - 1)


def _gather_mark_energies(state: PointsState, maps: EnergyMaps) -> Array:
    """(K, 3): each point's per-mark energy at its center+mark (tri-linear)."""
    h, w = maps.position.shape
    return mark_lookup_interp(
        maps.mark_maps, state.xy, state.marks,
        maps.map_vmin, maps.map_vmax, maps.map_cyclic, h, w,
    )


def pair_terms(state: PointsState, spec: EnergySpec) -> Tuple[Array, Array]:
    """Reduced pair energies: (overlap (K,), alignment (K,)).

    Dense (K, K) computation; masked entries contribute the reduce-identity,
    and a point with no interacting neighbor gets 0 for that term (the
    reference initialises each point's vector to 0 and only fills computed
    interactions, ``energy_graph.py:160-175``).
    """
    k = state.capacity
    diff = state.xy[:, None, :] - state.xy[None, :, :]
    dist = jnp.linalg.norm(diff, axis=-1)
    eye = jnp.eye(k, dtype=bool)
    alive_pair = state.alive[:, None] & state.alive[None, :] & ~eye

    # --- overlap: convex quad intersection / min area
    polys = marks_to_poly(
        state.xy, state.marks[:, 0], state.marks[:, 1], state.marks[:, 2]
    )  # (K, 4, 2)
    # TPU-layout-friendly all-pairs clipping: candidate axis major, so
    # nothing with a tiny minor dim gets lane-padded (the naive double-vmap
    # costs ~5x memory in padding at K=256)
    inter = quad_intersection_area_matrix(polys, polys)  # (K, K)
    areas = rect_area(state.marks[:, 0], state.marks[:, 1])  # (K,)
    min_area = jnp.minimum(areas[:, None], areas[None, :])
    overlap = inter / (min_area + 1e-6)
    ov_mask = alive_pair & (dist <= spec.overlap_max_dist)
    has_ov = jnp.any(ov_mask, axis=1)
    overlap_red = jnp.where(
        has_ov, jnp.max(jnp.where(ov_mask, overlap, -jnp.inf), axis=1), 0.0
    )

    # --- alignment: 1 - |cos dangle| - rewarding, reduce min (rewarding) / max
    dangle = state.marks[:, None, 2] - state.marks[None, :, 2]
    align = 1.0 - jnp.abs(jnp.cos(dangle)) - float(spec.rewarding_align)
    al_mask = alive_pair & (dist <= spec.align_max_dist)
    has_al = jnp.any(al_mask, axis=1)
    if spec.rewarding_align:
        align_red = jnp.min(jnp.where(al_mask, align, jnp.inf), axis=1)
    else:
        align_red = jnp.max(jnp.where(al_mask, align, -jnp.inf), axis=1)
    align_red = jnp.where(has_al, align_red, 0.0)

    return overlap_red, align_red


def energy_vectors(state: PointsState, maps: EnergyMaps, spec: EnergySpec) -> Array:
    """(K, n_energies) per-point energy vector (0 rows at dead slots)."""
    overlap_red, align_red = pair_terms(state, spec)
    area = rect_area(state.marks[:, 0], state.marks[:, 1])
    area_prior = jnp.maximum(
        0.0, jnp.maximum(maps.min_area - area, area - maps.max_area)
    )

    cols = list(data_columns(state, maps, spec))
    cols.extend([overlap_red, align_red, area_prior])
    if spec.use_ratio_prior:
        cols.append(jnp.abs(maps.target_ratio - state.marks[:, 1]))

    vec = jnp.stack(cols, axis=-1)
    assert vec.shape[-1] == spec.n_energies, (vec.shape, spec.names)
    return jnp.where(state.alive[:, None], vec, 0.0)


def total_energy(state: PointsState, maps: EnergyMaps, spec: EnergySpec,
                 combine: Callable[[Array], Array]) -> Array:
    """U(config) = sum over alive points of ``combine(energy_vector)``.

    ``combine`` maps (K, n_energies) -> (K,) per-point scalars (see
    ``combinators.py``); dead slots are zeroed before summing.
    """
    vec = energy_vectors(state, maps, spec)
    per_point = combine(vec)
    return jnp.sum(jnp.where(state.alive, per_point, 0.0))
