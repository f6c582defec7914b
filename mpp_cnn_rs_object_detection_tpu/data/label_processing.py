"""CNN training targets: pointing-vector fields and per-pixel mark classes.

Rebuild of reference ``models/position_net/data_loaders.py:23-124`` and
``models/shape_net/data_loaders.py:34-118``. The reference computes an EDT
(``scipy.ndimage.distance_transform_edt``) then a watershed over it seeded at
object centers -- for point seeds that is exactly the nearest-center (Voronoi)
assignment, so we compute nearest-center index + distance directly with a
KD-tree: same targets, no skimage dependency, and trivially batchable.

Rectangle masks for the ShapeNet 'shapes' mode are painted analytically
(rotate pixel coords into the rectangle frame) instead of rasterising a
polygon with skimage.draw.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple, Union

import numpy as np
from scipy.spatial import cKDTree

from mpp_cnn_rs_object_detection_tpu.data.dataset import LabelProcessor
from mpp_cnn_rs_object_detection_tpu.ops.mappings import ValueMapping, values_to_class_id


def nearest_center_fields(shape_hw: Tuple[int, int], centers: np.ndarray):
    """Per-pixel (nearest-center index, distance-to-nearest-center).

    Equivalent to EDT + watershed-over-EDT with point seeds
    (reference ``position_net/data_loaders.py:33,62-72``).
    """
    h, w = shape_hw
    if len(centers) == 0:
        return (np.zeros((h, w), dtype=np.int64),
                np.full((h, w), np.inf, dtype=np.float64))
    grid = np.stack(np.mgrid[:h, :w], axis=-1).reshape(-1, 2)
    tree = cKDTree(np.asarray(centers, dtype=np.float64))
    dist, idx = tree.query(grid)
    return idx.reshape(h, w), dist.reshape(h, w)


def _center_bin_map(shape_hw, centers) -> np.ndarray:
    m = np.zeros(shape_hw, dtype=bool)
    for c in centers:
        if 0 <= c[0] < shape_hw[0] and 0 <= c[1] < shape_hw[1]:
            m[int(c[0]), int(c[1])] = True
        else:
            logging.info(f"point ({c}) out of bounds in patch of shape {shape_hw}")
    return m


@dataclass
class PosLabelProcessor(LabelProcessor):
    """Targets for PosNet: unit vectors to the nearest center + validity mask.

    mode 'vec'/'uvec' as in the reference; 'dist' blob targets kept for parity.
    """

    max_distance: Union[str, float]
    mode: str = "uvec"
    n_classes: Optional[int] = None
    sigma_dil: Optional[float] = None

    def process(self, patch, centers, params, idx):
        shape_hw = patch.shape[:2]
        centers = np.asarray(centers).reshape(-1, 2)
        center_bin = _center_bin_map(shape_hw, centers)
        nearest_idx, distance = nearest_center_fields(shape_hw, centers)

        sigma_dil = 0.6 if self.sigma_dil is None else self.sigma_dil
        with np.errstate(over="ignore"):
            center_bin_dil = np.exp(
                -0.5 * np.square(np.where(np.isinf(distance), 1e6, distance) / sigma_dil)
            )
        center_bin_dil[center_bin_dil < 1e-5] = 0

        if self.max_distance == "auto":
            # auto size map: mean of watershed-painted (a, b) params
            if len(centers) > 0:
                a_map = np.asarray(params)[:, 0][nearest_idx]
                b_map = np.asarray(params)[:, 1][nearest_idx]
                size_map = (a_map + b_map) / 2
            else:
                size_map = np.zeros(shape_hw)
        else:
            size_map = None

        if self.mode in ("vec", "uvec"):
            if len(centers) == 0:
                pointy = np.zeros(shape_hw + (2,))
                norm = np.zeros(shape_hw)
                mask = np.ones(shape_hw, dtype=bool)
            else:
                target_center = centers[nearest_idx]  # (H, W, 2)
                coor = np.stack(np.mgrid[: shape_hw[0], : shape_hw[1]], axis=-1)
                pointy = target_center - coor
                norm = np.linalg.norm(pointy, axis=-1) + 1e-8
                if self.mode == "uvec":
                    pointy = pointy / norm[..., None]
                    pointy[np.isnan(pointy)] = 0
                if size_map is not None:
                    mask = norm > size_map
                else:
                    mask = norm > self.max_distance
            pointy = np.where(mask[..., None], 0.0, pointy)

            label = {
                "pointing_map": pointy.astype(np.float32),  # (H, W, 2)
                "mask": (~mask).astype(np.float32),
                "center_binary_map": center_bin,
                "center_binary_map_dil": center_bin_dil.astype(np.float32),
                "distance_map": np.where(np.isinf(distance), 1e6, distance).astype(
                    np.float32
                ),
            }
        elif self.mode == "dist":
            sigma = (size_map / 4) if size_map is not None else self.max_distance / 2
            blob = np.exp(-0.5 * np.square(distance / np.maximum(sigma, 1e-8)))
            blob[blob < 1e-3] = 0
            blob_class = (blob * (self.n_classes - 1)).astype(np.int64)
            label = {
                "blob_map": blob.astype(np.float32),
                "blob_map_class": blob_class,
                "center_binary_map": center_bin,
                "center_binary_map_dil": center_bin_dil.astype(np.float32),
                "distance_map": np.where(np.isinf(distance), 1e6, distance).astype(
                    np.float32
                ),
            }
        else:
            raise ValueError(self.mode)

        return patch.astype(np.float32), label


def rect_mask(shape_hw: Tuple[int, int], center, a: float, b: float, angle: float
              ) -> np.ndarray:
    """Boolean mask of pixels inside the rectangle built by
    ``rect_to_poly(center, short=a, long=b, angle)`` (analytic point-in-rect)."""
    h, w = shape_hw
    gy, gx = np.mgrid[:h, :w]
    dy = gy - center[0]
    dx = gx - center[1]
    # rotate into the rectangle frame: R(angle)^T . (p - c)
    cos, sin = np.cos(angle), np.sin(angle)
    local_u = cos * dy + sin * dx
    local_v = -sin * dy + cos * dx
    return (np.abs(local_u) <= a / 2) & (np.abs(local_v) <= b / 2)


@dataclass
class ShapeLabelProcessor(LabelProcessor):
    """Targets for ShapeNet: per-pixel mark class maps + a loss mask.

    ``mask_mode='shapes'`` paints classes inside each GT rectangle;
    ``mask_mode='gaussian'`` uses nearest-center classes weighted by a gaussian
    of the distance (sigma = size/4 when ``mask_sigma='auto'``).
    ``class_perturbation`` optionally jitters classes (label smoothing noise,
    reference ``shape_net/data_loaders.py:49-58``).
    """

    mappings: List[ValueMapping]
    mask_mode: str = "shapes"
    mask_sigma: Union[None, float, str] = None
    mask_cutoff_dist: Optional[float] = None
    class_perturbation: Optional[Dict[int, float]] = None
    rng: Optional[np.random.Generator] = None

    def process(self, patch, centers, params, idx):
        shape_hw = patch.shape[:2]
        centers = np.asarray(centers).reshape(-1, 2)
        params = np.asarray(params).reshape(-1, 3)
        n_points = len(centers)
        n_feat = len(self.mappings)

        # (a, b, w) -> (size, ratio, angle) classes
        params_sra = [
            ((a + b) / 2, a / b, w % np.pi) for a, b, w in params
        ]
        classes = values_to_class_id(params_sra, self.mappings)
        classes = [np.atleast_1d(np.asarray(c)).astype(np.int64) for c in classes]

        if self.class_perturbation is not None and n_points > 0:
            rng = self.rng if self.rng is not None else np.random.default_rng()
            offsets = list(self.class_perturbation.keys())
            probs = list(self.class_perturbation.values())
            for k in range(n_points):
                for i in range(n_feat):
                    pert = rng.choice(offsets, p=probs)
                    c = classes[i][k] + pert
                    if self.mappings[i].is_cyclic:
                        classes[i][k] = c % self.mappings[i].n_classes
                    else:
                        classes[i][k] = int(np.clip(c, 0, self.mappings[i].n_classes - 1))

        center_bin = _center_bin_map(shape_hw, centers)
        nearest_idx, distance = nearest_center_fields(shape_hw, centers)

        if self.mask_mode == "gaussian":
            value_class_map = [
                (classes[i][nearest_idx] if n_points > 0 else np.zeros(shape_hw, int))
                for i in range(n_feat)
            ]
            if n_points > 0:
                size_map = self.mappings[0].class_to_value(value_class_map[0])
                if self.mask_sigma == "auto":
                    sigma = np.maximum(size_map / 4, 1e-8)
                    loss_mask = np.exp(-0.5 * np.square(distance / sigma))
                    loss_mask[loss_mask < 1e-3] = 0
                else:
                    loss_mask = np.exp(-0.5 * np.square(distance / self.mask_sigma))
                    loss_mask[distance >= self.mask_cutoff_dist] = 0
                loss_mask = loss_mask / np.sum(loss_mask)
            else:
                loss_mask = np.zeros(shape_hw)
        elif self.mask_mode == "shapes":
            value_class_map = [np.zeros(shape_hw, dtype=np.int64) for _ in range(n_feat)]
            loss_mask = np.zeros(shape_hw, dtype=np.float64)
            for k in range(n_points):
                a, b, w = params[k]
                obj = rect_mask(shape_hw, centers[k], a, b, w)
                loss_mask += obj
                for i in range(n_feat):
                    value_class_map[i][obj] = classes[i][k]
            if n_points == 0 or np.sum(loss_mask) == 0:
                loss_mask = np.zeros(shape_hw)
            else:
                loss_mask = loss_mask / np.sum(loss_mask)
        else:
            raise ValueError(self.mask_mode)

        label = {
            "value_class_map": [v.astype(np.int32) for v in value_class_map],
            "center_binary_map": center_bin,
            "distance_map": np.where(np.isinf(distance), 1e6, distance).astype(
                np.float32
            ),
            "loss_mask": loss_mask.astype(np.float32),
        }
        return patch.astype(np.float32), label
