"""Two-stage Faster R-CNN in flax: ResNet-FPN + RPN + ROIAlign + box head.

Architecture parity with the reference baseline — torchvision's
``fasterrcnn_resnet50_fpn`` with a 2-class predictor
(``models/fasterRCNN/faster_rcnn_model.py:40-57``) — re-designed for XLA's
static-shape world:

  - anchors per FPN level with (scales x ratios) at every location;
  - proposals: top-K per level (static K) -> decode -> clip -> one masked
    greedy NMS of fixed iteration count (no dynamic-length tensors);
  - ROIAlign: 7x7 bilinear sampling from the level chosen by the FPN
    assignment rule, gathered per box with ``vmap`` — XLA turns the whole
    batch into one fused gather;
  - training replaces torchvision's random 256-anchor / 128-ROI *sampling*
    with exact per-example *weighting* of the same match sets (uniform
    expectation, but deterministic and shape-static — the TPU-native move).

Boxes are (y1, x1, y2, x2) in pixels (row/col, the repo convention).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from mpp_cnn_rs_object_detection_tpu.models.backbones import FPN, ResNet

Array = jnp.ndarray


# ------------------------------------------------------------------ anchors


def make_anchors(fm_shapes: Sequence[Tuple[int, int]], strides: Sequence[int],
                 sizes: Sequence[float], ratios: Sequence[float]
                 ) -> List[np.ndarray]:
    """Per-level (H*W*A, 4) anchor boxes; level i uses ``sizes[i]`` at all
    ``ratios`` (torchvision AnchorGenerator semantics)."""
    out = []
    for (h, w), stride, size in zip(fm_shapes, strides, sizes):
        ys = (np.arange(h) + 0.5) * stride
        xs = (np.arange(w) + 0.5) * stride
        cy, cx = np.meshgrid(ys, xs, indexing="ij")
        boxes = []
        for r in ratios:
            ah = size * np.sqrt(r)
            aw = size / np.sqrt(r)
            boxes.append(
                np.stack(
                    [cy - ah / 2, cx - aw / 2, cy + ah / 2, cx + aw / 2],
                    axis=-1,
                )
            )
        out.append(np.stack(boxes, axis=2).reshape(-1, 4).astype(np.float32))
    return out


def decode_boxes(anchors: Array, deltas: Array) -> Array:
    """(dy, dx, dh, dw) deltas -> boxes (standard R-CNN parameterisation)."""
    ah = anchors[:, 2] - anchors[:, 0]
    aw = anchors[:, 3] - anchors[:, 1]
    ay = (anchors[:, 0] + anchors[:, 2]) / 2
    ax = (anchors[:, 1] + anchors[:, 3]) / 2
    cy = ay + deltas[:, 0] * ah
    cx = ax + deltas[:, 1] * aw
    h = ah * jnp.exp(jnp.clip(deltas[:, 2], -4.0, 4.0))
    w = aw * jnp.exp(jnp.clip(deltas[:, 3], -4.0, 4.0))
    return jnp.stack([cy - h / 2, cx - w / 2, cy + h / 2, cx + w / 2], axis=-1)


def encode_boxes(anchors: Array, boxes: Array) -> Array:
    ah = jnp.maximum(anchors[:, 2] - anchors[:, 0], 1e-6)
    aw = jnp.maximum(anchors[:, 3] - anchors[:, 1], 1e-6)
    ay = (anchors[:, 0] + anchors[:, 2]) / 2
    ax = (anchors[:, 1] + anchors[:, 3]) / 2
    bh = jnp.maximum(boxes[:, 2] - boxes[:, 0], 1e-6)
    bw = jnp.maximum(boxes[:, 3] - boxes[:, 1], 1e-6)
    by = (boxes[:, 0] + boxes[:, 2]) / 2
    bx = (boxes[:, 1] + boxes[:, 3]) / 2
    return jnp.stack(
        [(by - ay) / ah, (bx - ax) / aw, jnp.log(bh / ah), jnp.log(bw / aw)],
        axis=-1,
    )


def box_iou(a: Array, b: Array) -> Array:
    """(Na, Nb) IoU of (y1, x1, y2, x2) boxes."""
    lo = jnp.maximum(a[:, None, :2], b[None, :, :2])
    hi = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.clip(hi - lo, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    area_a = jnp.clip(a[:, 2] - a[:, 0], 0) * jnp.clip(a[:, 3] - a[:, 1], 0)
    area_b = jnp.clip(b[:, 2] - b[:, 0], 0) * jnp.clip(b[:, 3] - b[:, 1], 0)
    return inter / jnp.maximum(area_a[:, None] + area_b[None, :] - inter, 1e-9)


def masked_nms(boxes: Array, scores: Array, valid: Array, iou_thresh: float,
               top_n: int) -> Tuple[Array, Array]:
    """Greedy NMS with static shapes: returns (keep_idx (top_n,), keep_valid).

    One pass over score order; suppression via the precomputed IoU matrix.
    """
    n = boxes.shape[0]
    iou = box_iou(boxes, boxes)
    order = jnp.argsort(-jnp.where(valid, scores, -jnp.inf))

    def body(i, kept):
        idx = order[i]
        sup = jnp.any(kept & (iou[idx] >= iou_thresh) & (jnp.arange(n) != idx))
        keep_i = valid[idx] & ~sup
        return kept.at[idx].set(keep_i)

    kept = jax.lax.fori_loop(0, n, body, jnp.zeros((n,), bool))
    keep_scores = jnp.where(kept, scores, -jnp.inf)
    top_idx = jnp.argsort(-keep_scores)[:top_n]
    return top_idx, kept[top_idx]


# ---------------------------------------------------------------- ROIAlign


def roi_align(feats: Sequence[Array], boxes: Array, strides: Sequence[int],
              out_size: int = 7, canonical: float = 224.0) -> Array:
    """(N, out, out, C) bilinear ROI features; level by the FPN rule
    k = floor(k0 + log2(sqrt(area)/canonical)), clipped to available levels."""
    n_levels = len(feats)
    area = jnp.clip(boxes[:, 2] - boxes[:, 0], 1.0) * jnp.clip(
        boxes[:, 3] - boxes[:, 1], 1.0
    )
    k = jnp.floor(jnp.log2(jnp.sqrt(area) / canonical + 1e-9)) + (n_levels - 1)
    k = jnp.clip(k, 0, n_levels - 1).astype(jnp.int32)

    def sample_level(feat, stride, box):
        h, w = feat.shape[:2]
        ys = jnp.linspace(box[0], box[2], out_size + 1)
        xs = jnp.linspace(box[1], box[3], out_size + 1)
        cy = (ys[:-1] + ys[1:]) / 2 / stride - 0.5
        cx = (xs[:-1] + xs[1:]) / 2 / stride - 0.5
        y0 = jnp.clip(jnp.floor(cy).astype(jnp.int32), 0, h - 1)
        x0 = jnp.clip(jnp.floor(cx).astype(jnp.int32), 0, w - 1)
        y1 = jnp.clip(y0 + 1, 0, h - 1)
        x1 = jnp.clip(x0 + 1, 0, w - 1)
        fy = jnp.clip(cy - y0, 0.0, 1.0)[:, None, None]
        fx = jnp.clip(cx - x0, 0.0, 1.0)[None, :, None]
        g = lambda yy, xx: feat[yy[:, None], xx[None, :]]  # noqa: E731
        return (
            g(y0, x0) * (1 - fy) * (1 - fx)
            + g(y0, x1) * (1 - fy) * fx
            + g(y1, x0) * fy * (1 - fx)
            + g(y1, x1) * fy * fx
        )

    def one_box(box, lvl):
        pooled = [sample_level(feats[i], strides[i], box)
                  for i in range(n_levels)]
        return jax.lax.switch(lvl, [lambda p=p: p for p in pooled])

    return jax.vmap(one_box)(boxes, k)


# ------------------------------------------------------------------ module


class RPNHead(nn.Module):
    n_anchors: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats):
        conv = nn.Conv(feats[0].shape[-1], (3, 3), dtype=self.dtype,
                       name="rpn_conv")
        cls = nn.Conv(self.n_anchors, (1, 1), dtype=self.dtype,
                      name="rpn_cls")
        reg = nn.Conv(self.n_anchors * 4, (1, 1), dtype=self.dtype,
                      name="rpn_reg")
        logits, deltas = [], []
        for f in feats:
            t = nn.relu(conv(f))
            logits.append(cls(t).reshape(f.shape[0], -1))
            deltas.append(reg(t).reshape(f.shape[0], -1, 4))
        return jnp.concatenate(logits, 1), jnp.concatenate(deltas, 1)


class BoxHead(nn.Module):
    hidden: int = 1024
    n_classes: int = 2  # background + vehicle
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, rois):  # (N, s, s, C)
        x = rois.reshape(rois.shape[0], -1)
        x = nn.relu(nn.Dense(self.hidden, dtype=self.dtype)(x))
        x = nn.relu(nn.Dense(self.hidden, dtype=self.dtype)(x))
        cls = nn.Dense(self.n_classes, dtype=jnp.float32)(x)
        reg = nn.Dense(4, dtype=jnp.float32)(x)  # class-agnostic refinement
        return cls, reg


class FasterRCNN(nn.Module):
    """Backbone + FPN + RPN + ROI heads; ``__call__`` returns the raw
    per-level features and RPN outputs (proposal/ROI logic lives in the pure
    functions below so it can be jitted with static config)."""

    depth: int = 50
    width: int = 64
    fpn_channels: int = 256
    n_ratios: int = 3
    box_hidden: int = 1024
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.backbone = ResNet(depth=self.depth, width=self.width,
                               dtype=self.dtype)
        self.fpn = FPN(out_channels=self.fpn_channels, dtype=self.dtype)
        self.rpn = RPNHead(n_anchors=self.n_ratios, dtype=self.dtype)
        self.box_head = BoxHead(hidden=self.box_hidden, dtype=self.dtype)

    def features(self, x, train: bool):
        return self.fpn(self.backbone(x, train=train))

    def __call__(self, x, train: bool = False):
        feats = self.features(x, train)
        rpn_logits, rpn_deltas = self.rpn(feats)
        return feats, rpn_logits, rpn_deltas

    def roi_predict(self, rois):
        return self.box_head(rois)

    def init_all(self, x, train: bool = False):
        """Init-time method touching every submodule (``init`` on
        ``__call__`` alone would never create the ROI head params)."""
        out = self(x, train)
        dummy_rois = jnp.zeros((1, 7, 7, self.fpn_channels), jnp.float32)
        self.box_head(dummy_rois)
        return out


# --------------------------------------------------------------- functional


def smooth_l1(x: Array, beta: float = 1.0 / 9.0) -> Array:
    ax = jnp.abs(x)
    return jnp.where(ax < beta, 0.5 * ax**2 / beta, ax - 0.5 * beta)


def rpn_targets(anchors: Array, gt: Array, gt_valid: Array,
                pos_iou: float = 0.7, neg_iou: float = 0.3):
    """Anchor labels (1 pos / 0 neg / -1 ignore) + matched GT boxes."""
    iou = box_iou(anchors, gt)
    iou = jnp.where(gt_valid[None, :], iou, -1.0)
    best = jnp.max(iou, axis=1)
    arg = jnp.argmax(iou, axis=1)
    labels = jnp.where(best >= pos_iou, 1, jnp.where(best < neg_iou, 0, -1))
    # every valid gt claims its best anchor (ties broadcast like torchvision)
    best_per_gt = jnp.max(iou, axis=0)  # (M,)
    claims = (iou >= best_per_gt[None, :] - 1e-6) & gt_valid[None, :] & (
        best_per_gt[None, :] > 0
    )
    labels = jnp.where(jnp.any(claims, axis=1), 1, labels)
    matched = gt[arg]
    return labels, matched


def rpn_loss(logits: Array, deltas: Array, anchors: Array, gt: Array,
             gt_valid: Array, n_sample: float = 256.0,
             pos_iou: float = 0.7, neg_iou: float = 0.3):
    labels, matched = rpn_targets(anchors, gt, gt_valid,
                                  pos_iou=pos_iou, neg_iou=neg_iou)
    pos = labels == 1
    neg = labels == 0
    n_pos = jnp.maximum(jnp.sum(pos), 1.0)
    n_neg = jnp.maximum(jnp.sum(neg), 1.0)
    # exact weighting standing in for torchvision's 1:1 sampling of 256
    w_pos = jnp.where(pos, 0.5 * n_sample / n_pos, 0.0)
    w_neg = jnp.where(neg, 0.5 * n_sample / n_neg, 0.0)
    w = jnp.minimum(w_pos + w_neg, n_sample)
    bce = optax_sigmoid_ce(logits, pos.astype(jnp.float32))
    cls_loss = jnp.sum(w * bce) / n_sample
    t = encode_boxes(anchors, matched)
    reg = jnp.sum(
        jnp.where(pos[:, None], smooth_l1(deltas - t), 0.0)
    ) / jnp.maximum(jnp.sum(pos) * 4.0, 1.0)
    return cls_loss, reg


def optax_sigmoid_ce(logits, labels):
    return jnp.maximum(logits, 0) - logits * labels + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )


def select_proposals(rpn_logits: Array, rpn_deltas: Array,
                     anchors_per_level: List[Array], hw: Tuple[int, int],
                     pre_nms_top_n: int, post_nms_top_n: int,
                     nms_thresh: float = 0.7, min_size: float = 1.0):
    """Static-shape proposal selection for ONE image."""
    start = 0
    cand_boxes, cand_scores = [], []
    for anc in anchors_per_level:
        n = anc.shape[0]
        lg = rpn_logits[start : start + n]
        dl = rpn_deltas[start : start + n]
        k = min(pre_nms_top_n, n)
        top = jnp.argsort(-lg)[:k]
        boxes = decode_boxes(jnp.asarray(anc)[top], dl[top])
        boxes = jnp.stack(
            [
                jnp.clip(boxes[:, 0], 0, hw[0]),
                jnp.clip(boxes[:, 1], 0, hw[1]),
                jnp.clip(boxes[:, 2], 0, hw[0]),
                jnp.clip(boxes[:, 3], 0, hw[1]),
            ],
            axis=-1,
        )
        cand_boxes.append(boxes)
        cand_scores.append(lg[top])
        start += n
    boxes = jnp.concatenate(cand_boxes)
    scores = jnp.concatenate(cand_scores)
    ok = (
        (boxes[:, 2] - boxes[:, 0] >= min_size)
        & (boxes[:, 3] - boxes[:, 1] >= min_size)
    )
    # pre-truncate the NMS pool: the greedy pass is a sequential fori_loop,
    # so bound its length independently of the anchor count
    pool = min(boxes.shape[0], max(4 * post_nms_top_n, 64))
    top = jnp.argsort(-jnp.where(ok, scores, -jnp.inf))[:pool]
    boxes, scores, ok = boxes[top], scores[top], ok[top]
    keep_idx, keep_valid = masked_nms(
        boxes, scores, ok, nms_thresh, post_nms_top_n
    )
    return boxes[keep_idx], scores[keep_idx], keep_valid


def roi_targets(proposals: Array, valid: Array, gt: Array, gt_valid: Array,
                pos_iou: float = 0.5):
    iou = box_iou(proposals, gt)
    iou = jnp.where(gt_valid[None, :], iou, -1.0)
    best = jnp.max(iou, axis=1)
    arg = jnp.argmax(iou, axis=1)
    pos = (best >= pos_iou) & valid
    labels = pos.astype(jnp.int32)  # 0 background, 1 vehicle
    return labels, gt[arg], pos


def roi_loss(cls_logits: Array, reg: Array, proposals: Array, labels: Array,
             matched: Array, pos: Array, valid: Array,
             n_sample: float = 128.0):
    n_pos = jnp.maximum(jnp.sum(pos), 1.0)
    n_neg = jnp.maximum(jnp.sum(valid & ~pos), 1.0)
    w = jnp.where(
        pos, 0.25 * n_sample / n_pos,
        jnp.where(valid, 0.75 * n_sample / n_neg, 0.0),
    )
    logp = jax.nn.log_softmax(cls_logits, axis=-1)
    ce = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    cls_loss = jnp.sum(w * ce) / n_sample
    t = encode_boxes(proposals, matched)
    reg_loss = jnp.sum(
        jnp.where(pos[:, None], smooth_l1(reg - t), 0.0)
    ) / jnp.maximum(n_pos * 4.0, 1.0)
    return cls_loss, reg_loss
