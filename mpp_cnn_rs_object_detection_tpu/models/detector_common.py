"""Shared machinery for the baseline detectors (Faster R-CNN / BBAVectors
capability-parity models, SURVEY.md C29/C30).

The reference wraps torchvision's ``fasterrcnn_resnet50_fpn`` (HBB,
``models/fasterRCNN/``) and vendors BBAVectors (OBB ResNet101+CTRBOX heads,
``models/BBAVectors-Oriented-Object-Detection/``). Neither torch stack is
TPU-native, so the rebuild provides the same *capabilities* (train / infer /
eval / DOTA export for HBB and OBB vehicle detection) with compact anchor-free
center-point detectors on the shared flax U-Net trunk: a gaussian center
heatmap + per-pixel box regression, decoded with a max-pool peak NMS — the
CTRBOX/CenterNet formulation BBAVectors itself builds on.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from mpp_cnn_rs_object_detection_tpu.data.dataset import LabelProcessor
from mpp_cnn_rs_object_detection_tpu.models.unet import UNet


class CenterDetector(nn.Module):
    """U-Net trunk + heads: center heatmap (1), box params (n_box), all at
    full resolution (small objects; no output stride)."""

    hidden_dims: Tuple[int, ...]
    n_box: int = 2  # (w, h) for HBB; (a, b, sin, cos) for OBB
    dtype: any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        trunk = UNet(self.hidden_dims, dtype=self.dtype)(x, train)
        hm = nn.Conv(1, (1, 1), dtype=jnp.float32)(trunk)[..., 0]
        box = nn.Conv(self.n_box, (1, 1), dtype=jnp.float32)(trunk)
        return hm, box


def gaussian_heatmap(shape_hw, centers, sigmas) -> np.ndarray:
    """Splat gaussians at centers (CenterNet-style target)."""
    h, w = shape_hw
    hm = np.zeros((h, w), np.float32)
    gy, gx = np.mgrid[:h, :w]
    for c, s in zip(centers, sigmas):
        g = np.exp(-((gy - c[0]) ** 2 + (gx - c[1]) ** 2) / (2 * max(s, 1.0) ** 2))
        hm = np.maximum(hm, g)
    return hm


class CenterLabelProcessor(LabelProcessor):
    """(patch, centers, params) -> heatmap + box regression targets.

    ``oriented=False``: targets (w, h) of the axis-aligned bounding box of the
    rotated rect (what the reference's patch_processor.py:9-50 feeds
    torchvision). ``oriented=True``: targets (a, b, sin 2w, cos 2w)."""

    def __init__(self, oriented: bool):
        self.oriented = oriented

    def process(self, patch, centers, params, idx):
        shape_hw = patch.shape[:2]
        centers = np.asarray(centers).reshape(-1, 2)
        params = np.asarray(params).reshape(-1, 3)
        n_box = 4 if self.oriented else 2
        box_t = np.zeros(shape_hw + (n_box,), np.float32)
        box_mask = np.zeros(shape_hw, np.float32)
        sigmas = (params[:, 0] + params[:, 1]) / 8.0 if len(params) else []
        hm = gaussian_heatmap(shape_hw, centers, sigmas)
        for c, p in zip(centers, params):
            ci, cj = int(np.clip(c[0], 0, shape_hw[0] - 1)), int(
                np.clip(c[1], 0, shape_hw[1] - 1)
            )
            a, b, wangle = p
            if self.oriented:
                box_t[ci, cj] = [a, b, np.sin(2 * wangle), np.cos(2 * wangle)]
            else:
                # AABB extents of the rotated rect
                cw = abs(b * np.cos(wangle)) + abs(a * np.sin(wangle))
                ch = abs(b * np.sin(wangle)) + abs(a * np.cos(wangle))
                box_t[ci, cj] = [ch, cw]
            box_mask[ci, cj] = 1.0
        return patch.astype(np.float32), {
            "heatmap": hm,
            "box": box_t,
            "box_mask": box_mask,
        }


def center_focal_loss(pred_logit, target_hm, alpha=2.0, beta=4.0):
    """CenterNet penalty-reduced focal loss."""
    p = jax.nn.sigmoid(pred_logit)
    pos = target_hm >= 0.999
    pos_loss = -jnp.log(p + 1e-6) * (1 - p) ** alpha * pos
    neg_loss = (
        -jnp.log(1 - p + 1e-6) * p**alpha * (1 - target_hm) ** beta * (~pos)
    )
    n_pos = jnp.maximum(jnp.sum(pos), 1.0)
    return (jnp.sum(pos_loss) + jnp.sum(neg_loss)) / n_pos


def detector_loss(hm_logit, box_pred, y, box_weight: float = 0.1
                  ) -> Dict[str, jnp.ndarray]:
    hm_loss = center_focal_loss(hm_logit, y["heatmap"])
    mask = y["box_mask"][..., None]
    box_loss = jnp.sum(jnp.abs(box_pred - y["box"]) * mask) / jnp.maximum(
        jnp.sum(mask), 1.0
    )
    return {
        "hm_loss": hm_loss,
        "box_loss": box_loss,
        "loss": hm_loss + box_weight * box_loss,
    }


def decode_peaks(heatmap: np.ndarray, box: np.ndarray, k: int = 200,
                 min_score: float = 0.1, pool: int = 3):
    """Max-pool peak NMS + top-K (CenterNet/CTRBOX decode, host numpy)."""
    h, w = heatmap.shape
    pad = pool // 2
    padded = np.pad(heatmap, pad, constant_values=-1)
    stacked = np.stack(
        [
            padded[dy : dy + h, dx : dx + w]
            for dy in range(pool)
            for dx in range(pool)
        ]
    )
    is_peak = heatmap >= stacked.max(0)
    scores = np.where(is_peak, heatmap, 0.0).ravel()
    order = np.argsort(-scores)[:k]
    keep = order[scores[order] > min_score]
    cy, cx = np.unravel_index(keep, (h, w))
    return np.stack([cy, cx], -1), scores[keep], box[cy, cx]
