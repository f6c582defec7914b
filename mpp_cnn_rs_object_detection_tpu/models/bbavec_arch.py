"""CTRBOX (BBAVectors) oriented detector in flax.

Architecture parity with the reference's vendored detector
(``models/BBAVectors-Oriented-Object-Detection``): ResNet backbone
(``bbav_models/ctrbox_net.py:8-24``, resnet101 in the paper; depth is
configurable here), CombinationModule decoder back to stride
``down_ratio``, and four heads (``ctrbox_net.py:25-45``):

  - ``hm``       (1)  center heatmap, sigmoid + focal loss;
  - ``wh``       (10) BBA vectors: t/r/b/l offsets (8) + external w, h (2);
  - ``reg``      (2)  sub-pixel center offset;
  - ``cls_theta``(1)  orientation class: 1 = rotated box decode from the
                      vectors, 0 = horizontal decode from external w/h
                      (``decoder.py:72-88``).

Losses (``loss.py``): focal on hm, smooth-L1 on wh/reg gathered at GT
centers, BCE on cls_theta. The decoder mirrors ``DecDecoder.ctdet_decode``:
3x3 max-pool NMS, top-K, vector -> quad decode with the cls_theta gate.
Targets are built on-device from padded (centers, params) arrays — no host
gaussian painting loops (``datasets/base.py`` analog).
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from mpp_cnn_rs_object_detection_tpu.models.backbones import (
    CombinationModule,
    ResNet,
)

Array = jnp.ndarray

HEADS = {"hm": 1, "wh": 10, "reg": 2, "cls_theta": 1}


class CTRBOX(nn.Module):
    depth: int = 101
    width: int = 64
    head_conv: int = 256
    down_ratio: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, Array]:
        feats = ResNet(depth=self.depth, width=self.width,
                       dtype=self.dtype)(x, train=train)
        c2, c3, c4, c5 = feats
        y = CombinationModule(c4.shape[-1], dtype=self.dtype)(c5, c4, train)
        y = CombinationModule(c3.shape[-1], dtype=self.dtype)(y, c3, train)
        y = CombinationModule(c2.shape[-1], dtype=self.dtype)(y, c2, train)
        out = {}
        for head, ch in HEADS.items():
            t = nn.Conv(self.head_conv, (3, 3), dtype=self.dtype)(y)
            t = nn.relu(t)
            k = 7 if head == "hm" else 3
            t = nn.Conv(ch, (k, k),
                        bias_init=nn.initializers.constant(
                            -2.19 if head == "hm" else 0.0
                        ),
                        dtype=jnp.float32)(t)
            out[head] = t
        return out


# ------------------------------------------------------------------ targets


def ctrbox_targets(centers: Array, params: Array, valid: Array,
                   hw: Tuple[int, int], down_ratio: int = 4):
    """Device-side target maps from padded GT arrays.

    ``params`` are (a, b, w) = (short, long, angle). The BBA vectors point
    from the center to the midpoints of the four sides in the order
    t/r/b/l of the ROTATED box (reference ``datasets/DOTA_devkit``-derived
    target builder); external (w, h) are the axis-aligned extents."""
    fh, fw = hw[0] // down_ratio, hw[1] // down_ratio
    m = centers.shape[0]
    c_ds = centers / down_ratio  # (row, col) at feature stride
    ci = jnp.clip(jnp.floor(c_ds).astype(jnp.int32),
                  jnp.zeros(2, jnp.int32),
                  jnp.asarray([fh - 1, fw - 1]))
    reg_t = (c_ds - ci).astype(jnp.float32)

    a, b, w = params[:, 0], params[:, 1], params[:, 2]
    # rect_to_poly frame: long axis b along angle direction (row-axis based)
    cos, sin = jnp.cos(w), jnp.sin(w)
    # side-midpoint offsets in (row, col): head/tail along the long axis,
    # flanks along the short axis
    head = jnp.stack([cos * b / 2, sin * b / 2], -1)
    flank = jnp.stack([-sin * a / 2, cos * a / 2], -1)
    tt, bb = -head, head
    ll, rr = -flank, flank
    wh_vec = jnp.concatenate([tt, rr, bb, ll], axis=-1)  # (M, 8)
    ext_w = jnp.abs(b * sin) + jnp.abs(a * cos)  # col extent
    ext_h = jnp.abs(b * cos) + jnp.abs(a * sin)  # row extent
    wh_t = jnp.concatenate(
        [wh_vec / down_ratio,
         jnp.stack([ext_w, ext_h], -1) / down_ratio], axis=-1
    )  # (M, 10)
    # orientation class: near-horizontal boxes use the hbb decode
    # (reference datasets/base.py: iou(obb, hbb) > 0.95 -> cls_theta 0)
    near_horiz = (jnp.abs(jnp.cos(2 * w)) > 0.99) | (b / jnp.maximum(a, 1e-6)
                                                     < 1.05)
    cls_t = jnp.where(near_horiz, 0.0, 1.0)

    # gaussian heatmap: radius from the downsampled extents (umich gaussian)
    gy, gx = jnp.meshgrid(jnp.arange(fh), jnp.arange(fw), indexing="ij")
    radius = jnp.maximum(
        2.0, jnp.minimum(ext_w, ext_h) / (2.0 * down_ratio)
    )
    sig = jnp.maximum(radius / 3.0, 1e-3)
    d2 = (
        (gy[None] - c_ds[:, 0, None, None]) ** 2
        + (gx[None] - c_ds[:, 1, None, None]) ** 2
    )
    g = jnp.exp(-d2 / (2 * sig[:, None, None] ** 2))
    g = jnp.where(valid[:, None, None], g, 0.0)
    hm = jnp.max(g, axis=0)

    ind = ci[:, 0] * fw + ci[:, 1]  # flat feature index per object
    return {
        "hm": hm.astype(jnp.float32),
        "ind": ind.astype(jnp.int32),
        "ind_mask": valid,
        "wh": wh_t.astype(jnp.float32),
        "reg": reg_t,
        "cls_theta": cls_t.astype(jnp.float32),
    }


# ------------------------------------------------------------------- losses


def focal_loss(pred_logits: Array, gt: Array) -> Array:
    """CornerNet-style focal loss on the heatmap (reference ``loss.py``
    FocalLoss)."""
    p = jax.nn.sigmoid(pred_logits)
    pos = gt >= 0.999
    neg_w = jnp.power(1.0 - gt, 4.0)
    pos_loss = jnp.log(jnp.clip(p, 1e-6)) * (1 - p) ** 2
    neg_loss = jnp.log(jnp.clip(1 - p, 1e-6)) * p**2 * neg_w
    n_pos = jnp.maximum(jnp.sum(pos), 1.0)
    return -(jnp.sum(jnp.where(pos, pos_loss, neg_loss))) / n_pos


def _gather_map(feat: Array, ind: Array) -> Array:
    """(H, W, C) map + (M,) flat indices -> (M, C)."""
    flat = feat.reshape(-1, feat.shape[-1])
    return flat[ind]


def ctrbox_loss(outs: Dict[str, Array], targets: Dict[str, Array]
                ) -> Dict[str, Array]:
    """Per-sample loss (vmapped over the batch by the caller)."""
    mask = targets["ind_mask"].astype(jnp.float32)
    n = jnp.maximum(jnp.sum(mask), 1.0)

    hm_l = focal_loss(outs["hm"][..., 0], targets["hm"])
    wh_p = _gather_map(outs["wh"], targets["ind"])
    wh_d = jnp.abs(wh_p - targets["wh"])
    wh_l = jnp.sum(
        jnp.where(wh_d < 1.0, 0.5 * wh_d**2, wh_d - 0.5) * mask[:, None]
    ) / (n * 10.0)
    reg_p = _gather_map(outs["reg"], targets["ind"])
    reg_d = jnp.abs(reg_p - targets["reg"])
    reg_l = jnp.sum(
        jnp.where(reg_d < 1.0, 0.5 * reg_d**2, reg_d - 0.5) * mask[:, None]
    ) / (n * 2.0)
    th_p = outs["cls_theta"][..., 0]
    th_gathered = _gather_map(outs["cls_theta"], targets["ind"])[:, 0]
    th_bce = (
        jnp.maximum(th_gathered, 0)
        - th_gathered * targets["cls_theta"]
        + jnp.log1p(jnp.exp(-jnp.abs(th_gathered)))
    )
    th_l = jnp.sum(th_bce * mask) / n
    del th_p
    loss = hm_l + wh_l + reg_l + th_l
    return {"loss": loss, "hm_loss": hm_l, "wh_loss": wh_l,
            "off_loss": reg_l, "cls_theta_loss": th_l}


# ------------------------------------------------------------------ decoder


def ctrbox_decode(outs: Dict[str, Array], k: int = 500,
                  down_ratio: int = 4):
    """``DecDecoder.ctdet_decode`` (reference ``decoder.py:50-100``):
    3x3 max-pool NMS on the heatmap, top-K, BBA-vector -> quad decode gated
    by cls_theta. Returns (scores (K,), quads (K, 4, 2) in image (row, col)
    pixels, centers (K, 2))."""
    hm = jax.nn.sigmoid(outs["hm"][..., 0])
    hmax = jax.lax.reduce_window(
        hm, -jnp.inf, jax.lax.max, (3, 3), (1, 1), "SAME"
    )
    hm_nms = jnp.where(hmax == hm, hm, 0.0)
    fh, fw = hm.shape
    flat = hm_nms.ravel()
    k = min(k, flat.shape[0])
    scores, inds = jax.lax.top_k(flat, k)
    ys = (inds // fw).astype(jnp.float32)
    xs = (inds % fw).astype(jnp.float32)
    reg = outs["reg"].reshape(-1, 2)[inds]
    ys = ys + reg[:, 0]
    xs = xs + reg[:, 1]
    wh = outs["wh"].reshape(-1, 10)[inds]
    theta = jax.nn.sigmoid(outs["cls_theta"].reshape(-1)[inds])
    rot = (theta > 0.8)[:, None]

    c = jnp.stack([ys, xs], -1)  # (K, 2) row/col at feature stride
    tt = jnp.where(rot, c + wh[:, 0:2], c - jnp.stack(
        [wh[:, 9] / 2, jnp.zeros_like(ys)], -1))
    rr = jnp.where(rot, c + wh[:, 2:4], c + jnp.stack(
        [jnp.zeros_like(ys), wh[:, 8] / 2], -1))
    bb = jnp.where(rot, c + wh[:, 4:6], c + jnp.stack(
        [wh[:, 9] / 2, jnp.zeros_like(ys)], -1))
    ll = jnp.where(rot, c + wh[:, 6:8], c - jnp.stack(
        [jnp.zeros_like(ys), wh[:, 8] / 2], -1))
    # side midpoints -> corners: corner_i = midpoint_i + midpoint_{i+1} - c
    corners = jnp.stack(
        [tt + rr - c, rr + bb - c, bb + ll - c, ll + tt - c], axis=1
    )
    return scores, corners * down_ratio, c * down_ratio
