"""Visualisation helpers: box/rectangle overlays, detection figures, GIFs.

Rebuild of reference ``utils/display/boxes.py`` + ``base/shapes/rectangle.py``
``show_rectangles`` + ``utils/files.py:8-11`` ``make_gif`` (the ImageMagick
shell-out is replaced by PIL animated-GIF writing). cv2 draws the overlays.
"""

from __future__ import annotations

import glob
import os
from typing import List, Optional, Sequence, Tuple, Union

import cv2
import numpy as np

from mpp_cnn_rs_object_detection_tpu.ops.geometry import (
    rect_to_poly_np,
    sra_to_wla,
)


def _to_u8(image: np.ndarray) -> np.ndarray:
    img = np.asarray(image)
    if img.dtype != np.uint8:
        img = (np.clip(img, 0, 1) * 255).astype(np.uint8)
    if img.ndim == 2:
        img = np.stack([img] * 3, axis=-1)
    return np.ascontiguousarray(img[..., :3])


def _score_colors(scores, max_score: float = 1.0):
    """plasma-like colormap without matplotlib: score -> BGR-ish RGB tuple."""
    colors = []
    for s in scores:
        t = float(np.clip(s / max(max_score, 1e-8), 0, 1))
        r = int(255 * min(1.0, 0.05 + 1.5 * t))
        g = int(255 * max(0.0, 1.7 * (t - 0.4)))
        b = int(255 * max(0.0, 1.0 - 1.4 * t))
        colors.append((r, g, b))
    return colors


def bboxes_over_image(image: np.ndarray, boxes: Sequence,
                      scores: Optional[Sequence] = None,
                      color: Union[str, Tuple] = (0, 255, 0),
                      thickness: int = 1, max_score: float = 1.0) -> np.ndarray:
    """Axis-aligned (x1, y1, x2, y2) boxes over an image
    (reference ``bboxes_over_image_cv2``)."""
    img = _to_u8(image)
    if isinstance(color, str):
        assert scores is not None
        colors = _score_colors(scores, max_score)
    else:
        colors = [tuple(int(c) for c in np.ravel(color)[:3])] * len(boxes)
        if np.max(colors) <= 1:
            colors = [tuple(int(255 * c) for c in cc) for cc in colors]
    for b, c in zip(boxes, colors):
        x1, y1, x2, y2 = [int(v) for v in b]
        cv2.rectangle(img, (x1, y1), (x2, y2), c, thickness)
    return img


def rectangles_over_image(image: np.ndarray, centers: np.ndarray,
                          params: np.ndarray, scores: Optional[Sequence] = None,
                          param_type: str = "wla",
                          color: Union[str, Tuple] = (0, 255, 0),
                          thickness: int = 1, max_score: float = 1.0
                          ) -> np.ndarray:
    """Oriented rectangles over an image (reference ``_pred_to_image2`` /
    ``show_rectangles``). ``params`` is (N, 3) — (a, b, w) if ``wla`` else
    (size, ratio, angle)."""
    img = _to_u8(image)
    centers = np.asarray(centers).reshape(-1, 2)
    params = np.asarray(params).reshape(-1, 3)
    if isinstance(color, str):
        assert scores is not None
        colors = _score_colors(scores, max_score)
    else:
        cc = tuple(int(c) for c in np.ravel(color)[:3])
        if max(cc, default=0) <= 1:
            cc = tuple(int(255 * c) for c in cc)
        colors = [cc] * len(centers)
    if param_type == "sra":
        b_long = 2.0 * params[:, 0] / (1.0 + params[:, 1])
        wla = np.stack([b_long * params[:, 1], b_long, params[:, 2]], axis=-1)
    else:
        wla = params
    polys = rect_to_poly_np(centers, wla[:, 0], wla[:, 1], wla[:, 2])
    for poly, col in zip(polys, colors):
        # poly is (4, 2) in (row, col); cv2 wants (x=col, y=row)
        pts = np.flip(poly, axis=-1).astype(np.int32).reshape(-1, 1, 2)
        cv2.polylines(img, [pts], isClosed=True, color=col, thickness=thickness)
    return img


def save_image(path: str, image: np.ndarray):
    cv2.imwrite(path, cv2.cvtColor(_to_u8(image), cv2.COLOR_RGB2BGR))


def make_gif(folder: str, pattern: str, output_name: str,
             duration_ms: int = 400):
    """Animated GIF from matching frames (reference shells to ImageMagick,
    ``utils/files.py:8-11``)."""
    from PIL import Image

    frames = [
        Image.open(f) for f in sorted(glob.glob(os.path.join(folder, pattern)))
    ]
    if not frames:
        return None
    out = os.path.join(folder, output_name)
    frames[0].save(
        out, save_all=True, append_images=frames[1:], duration=duration_ms,
        loop=0,
    )
    return out


def detection_comparison_figure(image: np.ndarray, det_centers, det_params,
                                det_scores, gt_centers, gt_params,
                                max_score: float = 1.0) -> np.ndarray:
    """Side-by-side detections (score-colored) vs GT (green)."""
    left = rectangles_over_image(
        image, det_centers, det_params, scores=det_scores, color="plasma",
        max_score=max_score,
    )
    right = rectangles_over_image(image, gt_centers, gt_params, color=(0, 255, 0))
    return np.concatenate([left, right], axis=1)
