"""ImageWMaps: the CNN -> MPP inter-stage data contract (host-side numpy).

Rebuild of reference ``models/mpp/custom_types/image_w_maps.py:11-23`` and
``models/mpp/data_loaders.py:30-332``: image + detection map + per-mark
distribution maps + mappings + labels, with crop / overlap-aware split and
scene-coordinate merge. GT configs are (N, 2) centers + (N, 3) ``(size, ratio,
angle)`` mark arrays (no Rectangle objects — the SoA convention of the whole
TPU rebuild).
"""

from __future__ import annotations

import logging
import os
import pickle
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np
from PIL import Image

from mpp_cnn_rs_object_detection_tpu.ops.mappings import ValueMapping
from mpp_cnn_rs_object_detection_tpu.ops.nms import nms_distance
from mpp_cnn_rs_object_detection_tpu.utils.config import (
    get_dataset_base_path,
    get_inference_path,
)

PARAM_NAMES = ["size", "ratio", "angle"]


@dataclass
class ImageWMaps:
    image: np.ndarray                 # (H, W, 3)
    name: str
    shape: Tuple[int, int]
    detection_map: np.ndarray         # (H, W)
    param_dist_maps: List[np.ndarray]  # 3 x (H, W, C)
    mappings: List[ValueMapping]
    labels: Dict[str, np.ndarray]
    gt_centers: np.ndarray            # (N, 2)
    gt_marks: np.ndarray              # (N, 3) size/ratio/angle
    param_names: List[str] = field(default_factory=lambda: list(PARAM_NAMES))
    crop_data: Optional[Dict] = None


def labels_to_marks(labels: Dict) -> Tuple[np.ndarray, np.ndarray]:
    """annotation dict -> (centers (N,2), marks (N,3)); the (a, b, w) ->
    (size, ratio, angle) conversion of reference ``data_loaders.py:252-260``."""
    centers = np.asarray(labels["centers"], np.float32).reshape(-1, 2)
    params = np.asarray(labels["parameters"], np.float32).reshape(-1, 3)
    if len(params) == 0:
        return centers, np.zeros((0, 3), np.float32)
    a, b, w = params[:, 0], params[:, 1], params[:, 2]
    marks = np.stack([(a + b) / 2.0, a / b, w % np.pi], axis=-1)
    return centers, marks.astype(np.float32)


def load_image_w_maps(patch_id, dataset: str, subset: str, position_model: str,
                      shape_model: str) -> ImageWMaps:
    """Assemble from the posnet/shapenet result pickles
    (reference ``data_loaders.py:30-71``)."""
    patch_id = int(patch_id)
    base = os.path.join(get_dataset_base_path(), dataset, subset)
    image = np.asarray(
        Image.open(os.path.join(base, "images", f"{patch_id:04}.png")),
        dtype=np.float32,
    )[..., :3]
    if image.max() > 1.0:
        image = image / 255.0
    with open(os.path.join(base, "annotations", f"{patch_id:04}.pkl"), "rb") as f:
        labels = pickle.load(f)

    # position_model may be a list: the detection maps are max-combined
    # pixelwise (checkpoint/model ensembling — decorrelated misses on a small
    # train set make the union map measurably higher-recall than any member)
    pos_models = (
        position_model if isinstance(position_model, (list, tuple))
        else [position_model]
    )
    shape_dir = get_inference_path(shape_model, dataset, subset)
    detection_map = None
    for pm in pos_models:
        pos_dir = get_inference_path(pm, dataset, subset)
        with open(os.path.join(pos_dir, f"{patch_id:04}_results.pkl"), "rb") as f:
            m = pickle.load(f)["detection_map"]
        detection_map = m if detection_map is None else np.maximum(detection_map, m)
    with open(os.path.join(shape_dir, f"{patch_id:04}_results.pkl"), "rb") as f:
        shp = pickle.load(f)
    param_dist_maps = [np.moveaxis(p[0], 0, -1) for p in shp["output"]]
    mappings = shp["mappings"]

    centers, marks = labels_to_marks(labels)
    return ImageWMaps(
        image=image,
        name=f"{patch_id:04}",
        shape=image.shape[:2],
        detection_map=detection_map,
        param_dist_maps=param_dist_maps,
        mappings=mappings,
        labels=labels,
        gt_centers=centers,
        gt_marks=marks,
    )


def crop_image_w_maps(data: ImageWMaps, tl_anchor: np.ndarray,
                      patch_size: int) -> ImageWMaps:
    """Crop + label reassignment (reference ``data_loaders.py:74-119``)."""
    tl = np.asarray(tl_anchor, int)
    s = np.s_[tl[0] : tl[0] + patch_size, tl[1] : tl[1] + patch_size]
    image_crop = data.image[s]
    shape = image_crop.shape[:2]

    keep, new_centers = [], []
    centers = np.asarray(data.labels["centers"]).reshape(-1, 2)
    for j, c in enumerate(centers):
        nc = c - tl
        if np.all(nc >= 0) and np.all(nc < np.array(shape)):
            keep.append(j)
            new_centers.append(nc)
    keep = np.array(keep, int)
    labels = {
        "centers": np.array(new_centers).reshape(-1, 2),
        "parameters": np.asarray(data.labels["parameters"]).reshape(-1, 3)[keep],
        "categories": np.asarray(data.labels["categories"])[keep]
        if len(np.asarray(data.labels["categories"]).shape)
        else np.array([]),
        "difficult": np.asarray(data.labels["difficult"])[keep]
        if len(np.asarray(data.labels["difficult"]).shape)
        else np.array([]),
    }
    centers2, marks2 = labels_to_marks(labels)
    return ImageWMaps(
        image=image_crop,
        name=data.name,
        shape=shape,
        detection_map=data.detection_map[s],
        param_dist_maps=[p[s] for p in data.param_dist_maps],
        mappings=data.mappings,
        labels=labels,
        gt_centers=centers2,
        gt_marks=marks2,
        crop_data={"tl_anchor": tl},
    )


def split_image(data: ImageWMaps, target_size: int, min_overlap: int
                ) -> List[ImageWMaps]:
    """Overlap-aware tiling (reference ``data_loaders.py:263-317``). All tiles
    share (target_size, target_size) shape so results stack for one vmapped
    device launch."""
    shape = data.image.shape[:2]
    n_x = int(np.ceil(shape[0] / (target_size - min_overlap)))
    n_y = int(np.ceil(shape[1] / (target_size - min_overlap)))
    if n_x <= 1 and n_y <= 1 and shape[0] == target_size and shape[1] == target_size:
        if data.crop_data is None:
            data.crop_data = {"tl_anchor": np.zeros(2, int)}
        return [data]
    x_anchors = np.linspace(0, max(shape[0] - target_size, 0), num=max(n_x, 1), dtype=int)
    y_anchors = np.linspace(0, max(shape[1] - target_size, 0), num=max(n_y, 1), dtype=int)
    patches = []
    for x in x_anchors:
        for y in y_anchors:
            p = crop_image_w_maps(data, np.array([x, y]), target_size)
            p.name = data.name + f"_p{x:04}-{y:04}"
            patches.append(p)
    logging.info(
        f"split image {data.name} {shape} into {len(patches)} "
        f"{target_size}px patches"
    )
    return patches


def merge_patch_results(patch_list: List[ImageWMaps],
                        centers_list: List[np.ndarray],
                        marks_list: List[np.ndarray],
                        scores_list: List[np.ndarray],
                        distance: float = 3.0):
    """Offset per-patch detections to scene coordinates and dedup within
    ``distance`` keeping the max-papangelou one (reference
    ``data_loaders.py:122-161``). Returns (centers, marks, scores)."""
    all_c, all_m, all_s = [], [], []
    for patch, c, m, s in zip(patch_list, centers_list, marks_list, scores_list):
        if len(c) == 0:
            continue
        anchor = patch.crop_data["tl_anchor"]
        all_c.append(np.asarray(c) + np.asarray(anchor)[None])
        all_m.append(np.asarray(m))
        all_s.append(np.asarray(s))
    if not all_c:
        return (np.zeros((0, 2)), np.zeros((0, 3)), np.zeros((0,)))
    centers = np.concatenate(all_c)
    marks = np.concatenate(all_m)
    scores = np.concatenate(all_s)
    _, _, keep = nms_distance(centers, scores, threshold=distance, return_index=True)
    return centers[keep], marks[keep], scores[keep]
