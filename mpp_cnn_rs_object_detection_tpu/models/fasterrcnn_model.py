"""Baseline detectors: true two-stage Faster R-CNN (HBB) and CTRBOX
BBAVectors (OBB).

Architecture parity with the reference baselines — torchvision
``fasterrcnn_resnet50_fpn`` + 2-class head
(``models/fasterRCNN/faster_rcnn_model.py:40-376``) and the vendored CTRBOX
(``models/BBAVectors-Oriented-Object-Detection/ctrbox_net.py:8-60``,
``decoder.py``, ``loss.py``) — with the same train / infer / eval / DOTA
export surface. Both train through the device-resident pipeline
(``data/device_pipeline.py``): per-batch GT targets are built on-device from
padded (centers, params) arrays.
"""

from __future__ import annotations

import logging
import os
import pickle
import re
from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from PIL import Image

from mpp_cnn_rs_object_detection_tpu.metrics.dota_eval import dota_eval
from mpp_cnn_rs_object_detection_tpu.metrics.dota_writer import DOTAResultsTranslator
from mpp_cnn_rs_object_detection_tpu.models.base import BaseModel, PatchBasedTrainer
from mpp_cnn_rs_object_detection_tpu.models.bbavec_arch import (
    CTRBOX,
    ctrbox_decode,
    ctrbox_loss,
    ctrbox_targets,
)
from mpp_cnn_rs_object_detection_tpu.models.fasterrcnn_arch import (
    FasterRCNN,
    box_iou,
    decode_boxes,
    make_anchors,
    masked_nms,
    roi_align,
    roi_loss,
    roi_targets,
    rpn_loss,
    select_proposals,
)
from mpp_cnn_rs_object_detection_tpu.models.train_utils import (
    TrainState,
    latest_checkpoint,
    load_checkpoint,
    make_device_epoch_fns,
    save_checkpoint,
)
from mpp_cnn_rs_object_detection_tpu.ops.geometry import rect_to_poly_np
from mpp_cnn_rs_object_detection_tpu.ops.nms import nms
from mpp_cnn_rs_object_detection_tpu.utils.config import (
    fetch_data_paths,
    get_inference_path,
    startup_config,
)
from mpp_cnn_rs_object_detection_tpu.utils.files import make_if_not_exist

_ID_RE = re.compile(r"[^0-9]*([0-9]+).*\.png")

FPN_STRIDES = (4, 8, 16, 32, 64)


def hbb_from_marks(centers, params):
    """Axis-aligned (y1, x1, y2, x2) hulls of rotated rects (the reference's
    HBB conversion for Faster R-CNN, ``patch_processor.py:9-50``)."""
    a, b, w = params[..., 0], params[..., 1], params[..., 2]
    ch = jnp.abs(b * jnp.cos(w)) + jnp.abs(a * jnp.sin(w))
    cw = jnp.abs(b * jnp.sin(w)) + jnp.abs(a * jnp.cos(w))
    return jnp.stack(
        [
            centers[..., 0] - ch / 2,
            centers[..., 1] - cw / 2,
            centers[..., 0] + ch / 2,
            centers[..., 1] + cw / 2,
        ],
        axis=-1,
    )


class _DetectorBase(BaseModel, PatchBasedTrainer):
    MODEL_TYPE = "fasterrcnn"

    def __init__(self, config: Dict, overwrite: bool = False, load: bool = False,
                 train: bool = True, dataset: Optional[str] = None,
                 reuse_data: bool = False):
        self.config, self.logger, self.save_path = startup_config(
            config, self.MODEL_TYPE, load_model=load, overwrite=overwrite
        )
        self.dataset = dataset or self.config["data_loader"]["dataset"]
        self.temp_dataset = f"temp_{self.config['model_name']}"
        self.n_epochs = self.config["trainer"]["n_epochs"]
        self.batch_size = self.config["trainer"]["batch_size"]
        self.rng = np.random.default_rng(42)
        self.patch_size = self.config["data_loader"]["patch_maker_params"][
            "patch_size"
        ]
        self._build_net()

        key = jax.random.PRNGKey(0)
        variables = self._init_variables(key)
        loss_cfg = self.config.get("loss", {})
        # From-scratch two-stage training on tiny datasets diverges under a
        # flat Adam LR (round-4 post-mortem: losses oscillated then froze
        # into a constant-score predictor). Warmup + cosine decay + global
        # gradient clipping; the reference sidesteps this by fine-tuning
        # pretrained torchvision weights (faster_rcnn_model.py:40-60), which
        # this zero-egress image cannot download.
        peak_lr = loss_cfg.get("learning_rate", 1e-3)
        n_train = self.config["data_loader"]["patch_maker_params"].get(
            "n_patches", 2048
        )
        total_steps = max(1, (n_train // self.batch_size) * self.n_epochs)
        schedule = optax.warmup_cosine_decay_schedule(
            init_value=peak_lr * 0.05,
            peak_value=peak_lr,
            warmup_steps=max(1, total_steps // 20),
            decay_steps=total_steps,
            end_value=peak_lr * 0.01,
        )
        self.tx = optax.chain(
            optax.clip_by_global_norm(loss_cfg.get("grad_clip", 1.0)),
            optax.adam(schedule),
        )
        self.state = TrainState.create(
            {"params": variables["params"],
             "batch_stats": variables["batch_stats"]},
            self.tx,
        )
        self.last_epoch = 0
        if load:
            ckpt = latest_checkpoint(self.save_path)
            if ckpt is not None:
                self.state, self.last_epoch = load_checkpoint(ckpt, self.state)
                logging.info(f"restored {ckpt} (epoch {self.last_epoch})")
            elif not train:
                # inference from random init silently emits garbage AP rows
                # (observed risk after a weights-deleting snapshot): fail
                # loudly instead — the reference likewise hard-fails when no
                # state_dict exists (base/base_model.py:35-49)
                raise FileNotFoundError(
                    f"no model.msgpack / checkpoint_*.msgpack under "
                    f"{self.save_path}; train before infer/eval"
                )

        self._build_steps()
        if train:
            self.__init_data_device__()

    # hooks ----------------------------------------------------------------

    def _build_net(self):
        raise NotImplementedError

    def _init_variables(self, key):
        raise NotImplementedError

    def _build_steps(self):
        raise NotImplementedError

    def train(self):
        self._train_device()

    def save(self):
        save_checkpoint(
            self.save_path, self.state, self.n_epochs, name="model.msgpack"
        )

    def eval(self):
        dota_eval(
            model_dir=self.save_path, dataset=self.dataset, subset="val",
            det_type="obb" if self.ORIENTED else "hbb",
        )

    def data_preview(self):
        pass

    # shared DOTA/pickle export -------------------------------------------

    def _export_gt(self, trlt, patch_id, labels):
        gt_centers = np.asarray(labels["centers"]).reshape(-1, 2)
        gt_params = np.asarray(labels["parameters"]).reshape(-1, 3)
        if self.ORIENTED:
            gt_poly = rect_to_poly_np(
                gt_centers, gt_params[:, 0], gt_params[:, 1], gt_params[:, 2]
            ).reshape(-1, 4, 2)
            trlt.add_gt(
                image_id=patch_id, polygons=gt_poly,
                difficulty=labels["difficult"],
                categories=["vehicle"] * len(gt_poly),
            )
        else:
            boxes = np.asarray(
                hbb_from_marks(jnp.asarray(gt_centers), jnp.asarray(gt_params))
            ) if len(gt_centers) else np.zeros((0, 4))
            gt_poly = np.stack(
                [
                    boxes[:, [1, 0]], boxes[:, [3, 0]],
                    boxes[:, [3, 2]], boxes[:, [1, 2]],
                ],
                axis=1,
            ) if len(boxes) else np.zeros((0, 4, 2))
            trlt.add_gt(
                image_id=patch_id, polygons=gt_poly,
                difficulty=labels["difficult"], flip_coor=False,
                categories=["vehicle"] * len(gt_poly),
            )

    def _replay_export(self, trlt, patch_id, annotation_file, out_pkl):
        """Resume support: a skipped image must still reach the freshly
        rewritten DOTA translation, or its GT and detections silently
        vanish from the eval (round-4 post-mortem: a crash-resume left an
        empty det export and scored a finished arm 0.0)."""
        with open(annotation_file, "rb") as f:
            labels = pickle.load(f)
        with open(out_pkl, "rb") as f:
            prev = pickle.load(f)
        self._export_gt(trlt, patch_id, labels)
        scores = np.asarray(prev["detection_score"]).reshape(-1)
        det = np.asarray(prev["detection"])
        if str(prev.get("detection_type")) == "poly":
            trlt.add_detections(
                image_id=patch_id, scores=scores,
                polygons=det.reshape(-1, 4, 2), flip_coor=True,
                class_names=["vehicle"] * len(scores),
            )
        else:
            trlt.add_detections(
                image_id=patch_id, scores=scores,
                bbox=det.reshape(-1, 4), flip_coor=False,
                class_names=["vehicle"] * len(scores),
            )


class FasterRCNNModel(_DetectorBase):
    """Two-stage HBB detector: ResNet-FPN + RPN + ROIAlign + box head
    (reference C29)."""

    ORIENTED = False
    MODEL_TYPE = "fasterrcnn"

    def _build_net(self):
        mc = self.config.get("model", {})
        self.net = FasterRCNN(
            depth=mc.get("depth", 50),
            width=mc.get("width", 64),
            fpn_channels=mc.get("fpn_channels", 256),
            box_hidden=mc.get("box_hidden", 1024),
            dtype=jnp.bfloat16
            if mc.get("dtype", "bfloat16") == "bfloat16"
            else jnp.float32,
        )
        self.anchor_sizes = tuple(
            mc.get("anchor_sizes", (8, 16, 32, 64, 128))
        )
        self.anchor_ratios = tuple(mc.get("anchor_ratios", (0.5, 1.0, 2.0)))
        self.post_nms_train = mc.get("post_nms_train", 64)
        self.post_nms_infer = mc.get("post_nms_infer", 256)
        self.pre_nms = mc.get("pre_nms", 512)
        self._anchor_cache = {}

    def _anchors_for(self, hw):
        if hw not in self._anchor_cache:
            fm = [(-(-hw[0] // s), -(-hw[1] // s)) for s in FPN_STRIDES]
            self._anchor_cache[hw] = make_anchors(
                fm, FPN_STRIDES, self.anchor_sizes, self.anchor_ratios
            )
        return self._anchor_cache[hw]

    def _init_variables(self, key):
        return self.net.init(
            key, jnp.zeros((1, 64, 64, 3), jnp.float32), train=False,
            method=FasterRCNN.init_all,
        )

    def _two_stage_loss(self, params, batch_stats, x, gt, gt_valid, train):
        hw = (x.shape[1], x.shape[2])
        anchors = self._anchors_for(hw)
        anchors_all = jnp.concatenate([jnp.asarray(a) for a in anchors])
        out, mutated = self.net.apply(
            {"params": params, "batch_stats": batch_stats},
            x, train=train,
            mutable=["batch_stats"] if train else [],
        )
        feats, rpn_logits, rpn_deltas = out

        # tiny-object matching: at gsd50 vehicles are ~5x9 px, so the
        # torchvision default pos_iou=0.7 leaves only the one claimed
        # best-anchor per GT positive — configurable for small-object runs
        mc = self.config.get("model", {})
        pos_iou = mc.get("rpn_pos_iou", 0.7)
        neg_iou = mc.get("rpn_neg_iou", 0.3)
        rpn_c, rpn_r = jax.vmap(
            lambda lg, dl, g, gv: rpn_loss(lg, dl, anchors_all, g, gv,
                                           pos_iou=pos_iou, neg_iou=neg_iou)
        )(rpn_logits, rpn_deltas,
          gt, gt_valid)

        def roi_one(i):
            props, _, valid = select_proposals(
                rpn_logits[i], rpn_deltas[i], anchors, hw,
                self.pre_nms, self.post_nms_train,
            )
            props = jax.lax.stop_gradient(props)
            labels, matched, pos = roi_targets(props, valid, gt[i],
                                               gt_valid[i])
            feats_i = [f[i] for f in feats[:4]]
            rois = roi_align(feats_i, props, FPN_STRIDES[:4])
            cls, reg = self.net.apply(
                {"params": params, "batch_stats": batch_stats},
                rois.astype(jnp.float32),
                method=FasterRCNN.roi_predict,
            )
            return roi_loss(cls, reg, props, labels, matched, pos, valid)

        roi_c, roi_r = jax.vmap(roi_one)(jnp.arange(x.shape[0]))
        loss = (
            jnp.mean(rpn_c) + jnp.mean(rpn_r)
            + jnp.mean(roi_c) + jnp.mean(roi_r)
        )
        metrics = {
            "loss": loss,
            "rpn_cls": jnp.mean(rpn_c), "rpn_reg": jnp.mean(rpn_r),
            "roi_cls": jnp.mean(roi_c), "roi_reg": jnp.mean(roi_r),
        }
        new_stats = mutated["batch_stats"] if train else batch_stats
        return loss, (metrics, new_stats)

    def _build_steps(self):
        def target_fn(cen, par, val):
            boxes = hbb_from_marks(cen, par)
            return {"gt": jnp.where(val[:, None], boxes, 0.0),
                    "gt_valid": val}

        def apply_loss(params, batch_stats, batch, train):
            x, y = batch
            return self._two_stage_loss(
                params, batch_stats, x, y["gt"], y["gt_valid"], train
            )

        self.device_train_epoch, self.device_eval_epoch = (
            make_device_epoch_fns(apply_loss, self.tx, target_fn)
        )

    # ------------------------------------------------------------- inference

    def _detect(self, image: np.ndarray, min_confidence: float):
        h, w = image.shape[:2]
        ph = (64 - h % 64) % 64
        pw = (64 - w % 64) % 64
        padded = jnp.asarray(np.pad(image, ((0, ph), (0, pw), (0, 0))))
        hw = (h + ph, w + pw)
        anchors = self._anchors_for(hw)

        @partial(jax.jit, static_argnames=())
        def fwd(params, batch_stats, img):
            feats, rpn_logits, rpn_deltas = self.net.apply(
                {"params": params, "batch_stats": batch_stats},
                img[None], train=False,
            )
            props, _, valid = select_proposals(
                rpn_logits[0], rpn_deltas[0], anchors, hw,
                self.pre_nms, self.post_nms_infer,
            )
            rois = roi_align([f[0] for f in feats[:4]], props,
                             FPN_STRIDES[:4])
            cls, reg = self.net.apply(
                {"params": params, "batch_stats": batch_stats},
                rois.astype(jnp.float32),
                method=FasterRCNN.roi_predict,
            )
            scores = jax.nn.softmax(cls, -1)[:, 1]
            boxes = decode_boxes(props, reg)
            return boxes, jnp.where(valid, scores, 0.0)

        boxes, scores = fwd(
            self.state.params, self.state.batch_stats, padded
        )
        boxes = np.asarray(boxes)
        scores = np.asarray(scores)
        keep = scores >= min_confidence
        boxes, scores = boxes[keep], scores[keep]
        if len(boxes):
            iou_t = self.config.get("model", {}).get("iou_threshold", 0.5)
            _, _, kidx = nms(
                boxes[:, [1, 0, 3, 2]], scores, iou_t, return_index=True
            )
            boxes, scores = boxes[kidx], scores[kidx]
        return boxes, scores

    def infer(self, subset: str = "val", overwrite: bool = True,
              min_confidence: float = 0.25, **kwargs):
        # config override: AP is threshold-free, so quick-budget runs export
        # at a low floor rather than dropping every weakly-scored detection
        min_confidence = self.config.get("inference", {}).get(
            "min_confidence", min_confidence
        )
        results_dir = get_inference_path(
            model_name=os.path.split(self.save_path)[1],
            dataset=self.dataset, subset=subset,
        )
        make_if_not_exist(results_dir, recursive=True)
        trlt = DOTAResultsTranslator(
            self.dataset, subset, results_dir, "hbb", all_classes=["vehicle"]
        )
        paths = fetch_data_paths(self.dataset, subset=subset, metadata=False)
        for pf, af in zip(paths["images"], paths["annotations"]):
            patch_id = int(_ID_RE.match(os.path.split(pf)[1]).group(1))
            out_pkl = os.path.join(results_dir, f"{patch_id:04}_results.pkl")
            if os.path.exists(out_pkl) and not overwrite:
                self._replay_export(trlt, patch_id, af, out_pkl)
                continue
            img = np.asarray(Image.open(pf), np.float32)[..., :3] / 255.0
            with open(af, "rb") as f:
                labels = pickle.load(f)
            boxes, scores = self._detect(img, min_confidence)
            self._export_gt(trlt, patch_id, labels)
            det_xyxy = boxes[:, [1, 0, 3, 2]] if len(boxes) else np.zeros(
                (0, 4)
            )
            trlt.add_detections(
                image_id=patch_id, scores=scores, bbox=det_xyxy,
                flip_coor=False, class_names=["vehicle"] * len(scores),
            )
            with open(out_pkl, "wb") as f:
                pickle.dump(
                    {
                        "detection": det_xyxy,
                        "detection_type": "bbox",
                        "detection_score": scores,
                        "detection_center": (boxes[:, :2] + boxes[:, 2:]) / 2
                        if len(boxes)
                        else np.zeros((0, 2)),
                    },
                    f,
                )
        trlt.save()
        logging.info("saved DOTA translations")


class BBAVecModel(_DetectorBase):
    """CTRBOX oriented detector (reference C30)."""

    ORIENTED = True
    MODEL_TYPE = "bbavec"

    def _build_net(self):
        mc = self.config.get("model", {})
        self.down_ratio = mc.get("down_ratio", 4)
        self.net = CTRBOX(
            depth=mc.get("depth", 101),
            width=mc.get("width", 64),
            head_conv=mc.get("head_conv", 256),
            down_ratio=self.down_ratio,
            dtype=jnp.bfloat16
            if mc.get("dtype", "bfloat16") == "bfloat16"
            else jnp.float32,
        )

    def _init_variables(self, key):
        return self.net.init(
            key, jnp.zeros((1, 64, 64, 3), jnp.float32), train=False
        )

    def _build_steps(self):
        p = self.patch_size
        dr = self.down_ratio

        def target_fn(cen, par, val):
            return ctrbox_targets(cen, par, val, (p, p), down_ratio=dr)

        def apply_loss(params, batch_stats, batch, train):
            x, y = batch
            outs, mutated = self.net.apply(
                {"params": params, "batch_stats": batch_stats},
                x, train=train,
                mutable=["batch_stats"] if train else [],
            )
            losses = jax.vmap(ctrbox_loss)(
                outs, y
            )
            metrics = {k: jnp.mean(v) for k, v in losses.items()}
            new_stats = mutated["batch_stats"] if train else batch_stats
            return metrics["loss"], (metrics, new_stats)

        self.device_train_epoch, self.device_eval_epoch = (
            make_device_epoch_fns(apply_loss, self.tx, target_fn)
        )

    # ------------------------------------------------------------- inference

    def _detect(self, image: np.ndarray, min_confidence: float, k: int = 500):
        h, w = image.shape[:2]
        mult = 32
        ph = (mult - h % mult) % mult
        pw = (mult - w % mult) % mult
        padded = jnp.asarray(np.pad(image, ((0, ph), (0, pw), (0, 0))))

        @partial(jax.jit, static_argnames=())
        def fwd(params, batch_stats, img):
            outs = self.net.apply(
                {"params": params, "batch_stats": batch_stats},
                img[None], train=False,
            )
            outs1 = {kk: v[0] for kk, v in outs.items()}
            return ctrbox_decode(outs1, k=k, down_ratio=self.down_ratio)

        scores, quads, centers = fwd(
            self.state.params, self.state.batch_stats, padded
        )
        scores = np.asarray(scores)
        quads = np.asarray(quads)
        centers = np.asarray(centers)
        keep = scores >= min_confidence
        scores, quads, centers = scores[keep], quads[keep], centers[keep]
        if len(scores):
            # rotated NMS via the native polygon IoU (reference nms.py uses
            # the devkit's poly IoU)
            from mpp_cnn_rs_object_detection_tpu.metrics.polyiou import (
                poly_iou_matrix,
            )

            iou = poly_iou_matrix(quads, quads)
            order = np.argsort(-scores, kind="stable")
            kept = np.zeros(len(scores), bool)
            for i in order:
                kept[i] = not np.any(iou[i, kept] >= 0.1)
            scores, quads, centers = scores[kept], quads[kept], centers[kept]
        return scores, quads, centers

    def infer(self, subset: str = "val", overwrite: bool = True,
              min_confidence: float = 0.2, **kwargs):
        min_confidence = self.config.get("inference", {}).get(
            "min_confidence", min_confidence
        )
        results_dir = get_inference_path(
            model_name=os.path.split(self.save_path)[1],
            dataset=self.dataset, subset=subset,
        )
        make_if_not_exist(results_dir, recursive=True)
        trlt = DOTAResultsTranslator(
            self.dataset, subset, results_dir, "obb", all_classes=["vehicle"]
        )
        paths = fetch_data_paths(self.dataset, subset=subset, metadata=False)
        for pf, af in zip(paths["images"], paths["annotations"]):
            patch_id = int(_ID_RE.match(os.path.split(pf)[1]).group(1))
            out_pkl = os.path.join(results_dir, f"{patch_id:04}_results.pkl")
            if os.path.exists(out_pkl) and not overwrite:
                self._replay_export(trlt, patch_id, af, out_pkl)
                continue
            img = np.asarray(Image.open(pf), np.float32)[..., :3] / 255.0
            with open(af, "rb") as f:
                labels = pickle.load(f)
            scores, quads, centers = self._detect(img, min_confidence)
            self._export_gt(trlt, patch_id, labels)
            trlt.add_detections(
                image_id=patch_id, scores=scores, polygons=quads,
                flip_coor=True, class_names=["vehicle"] * len(scores),
            )
            with open(out_pkl, "wb") as f:
                pickle.dump(
                    {
                        "detection": quads,
                        "detection_type": "poly",
                        "detection_score": scores,
                        "detection_center": centers,
                    },
                    f,
                )
        trlt.save()
        logging.info("saved DOTA translations")
