"""Greedy NMS (IoU boxes and center-distance), host-side numpy.

Rebuild of reference ``utils/nms.py:6-109``. These run on small candidate sets
during export/init (the hot detection path on TPU uses the vectorised map ops
instead), so a vectorised-inner-loop numpy implementation is appropriate.
"""

from __future__ import annotations

import numpy as np


def iou_matrix(boxes_a: np.ndarray, boxes_b: np.ndarray) -> np.ndarray:
    """All-pairs IoU of [x1, y1, x2, y2] boxes, inclusive-pixel convention
    (+1 on extents, as the devkit's voc_eval measures overlap)."""
    a = np.asarray(boxes_a, np.float64).reshape(-1, 4)
    b = np.asarray(boxes_b, np.float64).reshape(-1, 4)
    lo = np.maximum(a[:, None, :2], b[None, :, :2])
    hi = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(hi - lo + 1.0, 0.0, None)
    inter = wh[..., 0] * wh[..., 1]
    area_a = (a[:, 2] - a[:, 0] + 1) * (a[:, 3] - a[:, 1] + 1)
    area_b = (b[:, 2] - b[:, 0] + 1) * (b[:, 3] - b[:, 1] + 1)
    return inter / (area_a[:, None] + area_b[None, :] - inter)


def nms(bounding_boxes, confidence_score, threshold, return_index=False):
    """Greedy IoU NMS over [x1, y1, x2, y2] boxes (highest score first).

    One all-pairs IoU matrix up front, then a single suppression sweep in
    score order — a candidate is kept iff no already-kept box overlaps it
    with IoU >= threshold. Equivalent to the classic iterative formulation
    on the small candidate sets this runs on (export / chain init)."""
    if len(bounding_boxes) == 0:
        return ([], [], []) if return_index else ([], [])

    score = np.asarray(confidence_score, dtype=np.float64)
    iou = iou_matrix(bounding_boxes, bounding_boxes)
    order = np.argsort(-score, kind="stable")
    kept = np.zeros(len(score), dtype=bool)
    for i in order:
        kept[i] = not np.any(iou[i, kept] >= threshold)
    picked_index = [int(i) for i in order if kept[i]]

    picked_boxes = [bounding_boxes[i] for i in picked_index]
    picked_score = [confidence_score[i] for i in picked_index]
    if return_index:
        return picked_boxes, picked_score, picked_index
    return picked_boxes, picked_score


def nms_distance(centers, confidence_score, threshold, return_index=False):
    """Greedy NMS keeping the highest-score center and dropping any other
    center closer than ``threshold`` (reference ``utils/nms.py:68-109``).

    KD-tree accelerated: the reference's O(n^2) greedy loop takes minutes on
    the dense candidate sets a low min_confidence produces (it even warns
    about it, ``pos_net_model.py:380-385``); radius queries make it
    ~O(n log n) with identical results."""
    if len(centers) == 0:
        return ([], [], []) if return_index else ([], [])

    from scipy.spatial import cKDTree

    centers = np.asarray(centers)
    score = np.asarray(confidence_score, dtype=np.float64)
    tree = cKDTree(centers.astype(np.float64))
    order = np.argsort(-score, kind="stable")
    suppressed = np.zeros(len(centers), dtype=bool)
    picked_centers, picked_score, picked_index = [], [], []
    for index in order:
        if suppressed[index]:
            continue
        picked_index.append(int(index))
        picked_centers.append(centers[index])
        picked_score.append(confidence_score[index])
        # strictly-greater threshold: drop neighbors with dist <= threshold
        for j in tree.query_ball_point(centers[index], r=threshold):
            suppressed[j] = True

    if return_index:
        return picked_centers, picked_score, picked_index
    return picked_centers, picked_score
