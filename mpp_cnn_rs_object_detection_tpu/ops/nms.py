"""Greedy NMS (IoU boxes and center-distance), host-side numpy.

Rebuild of reference ``utils/nms.py:6-109``. These run on small candidate sets
during export/init (the hot detection path on TPU uses the vectorised map ops
instead), so a vectorised-inner-loop numpy implementation is appropriate.
"""

from __future__ import annotations

import numpy as np


def nms(bounding_boxes, confidence_score, threshold, return_index=False):
    """Greedy IoU NMS over [x1, y1, x2, y2] boxes (highest score first)."""
    if len(bounding_boxes) == 0:
        return ([], [], []) if return_index else ([], [])

    boxes = np.asarray(bounding_boxes, dtype=np.float64)
    score = np.asarray(confidence_score, dtype=np.float64)
    start_x, start_y, end_x, end_y = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    areas = (end_x - start_x + 1) * (end_y - start_y + 1)

    order = np.argsort(score)
    picked_boxes, picked_score, picked_index = [], [], []
    while order.size > 0:
        index = order[-1]
        picked_index.append(index)
        picked_boxes.append(bounding_boxes[index])
        picked_score.append(confidence_score[index])

        x1 = np.maximum(start_x[index], start_x[order[:-1]])
        x2 = np.minimum(end_x[index], end_x[order[:-1]])
        y1 = np.maximum(start_y[index], start_y[order[:-1]])
        y2 = np.minimum(end_y[index], end_y[order[:-1]])
        w = np.maximum(0.0, x2 - x1 + 1)
        h = np.maximum(0.0, y2 - y1 + 1)
        intersection = w * h
        ratio = intersection / (areas[index] + areas[order[:-1]] - intersection)
        order = order[np.where(ratio < threshold)]

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
