"""Baseline detector models: HBB ('fasterrcnn') and OBB ('bbavec') parity.

Capability rebuild of reference ``models/fasterRCNN/faster_rcnn_model.py:40-376``
(torchvision Faster R-CNN on HBB boxes derived from the rotated rects) and
``models/BBAVectors-Oriented-Object-Detection/bbavec_model.py:32-314``
(CTRBOX oriented detector): same train / infer / eval / DOTA-export surface,
implemented as TPU-native center-point detectors (see ``detector_common.py``).
"""

from __future__ import annotations

import logging
import os
import pickle
import re
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from PIL import Image

from mpp_cnn_rs_object_detection_tpu.metrics.dota_eval import dota_eval
from mpp_cnn_rs_object_detection_tpu.metrics.dota_writer import DOTAResultsTranslator
from mpp_cnn_rs_object_detection_tpu.models.base import BaseModel, PatchBasedTrainer
from mpp_cnn_rs_object_detection_tpu.models.detector_common import (
    CenterDetector,
    CenterLabelProcessor,
    decode_peaks,
    detector_loss,
)
from mpp_cnn_rs_object_detection_tpu.models.train_utils import (
    TrainState,
    latest_checkpoint,
    load_checkpoint,
    make_eval_epoch_fn,
    make_train_epoch_fn,
    mean_metrics,
    save_checkpoint,
    stack_batches,
)
from mpp_cnn_rs_object_detection_tpu.ops.geometry import rect_to_poly_np
from mpp_cnn_rs_object_detection_tpu.ops.nms import nms, nms_distance
from mpp_cnn_rs_object_detection_tpu.utils.config import (
    fetch_data_paths,
    get_inference_path,
    startup_config,
)
from mpp_cnn_rs_object_detection_tpu.utils.files import make_if_not_exist

_ID_RE = re.compile(r"[^0-9]*([0-9]+).*\.png")


class _CenterDetectorModel(BaseModel, PatchBasedTrainer):
    ORIENTED = False
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

        net_dtype = (
            jnp.bfloat16
            if self.config["model"].get("dtype", "bfloat16") == "bfloat16"
            else jnp.float32
        )
        self.net = CenterDetector(
            hidden_dims=tuple(self.config["model"]["hidden_dims"]),
            n_box=4 if self.ORIENTED else 2,
            dtype=net_dtype,
        )
        key = jax.random.PRNGKey(0)
        variables = self.net.init(key, jnp.zeros((1, 64, 64, 3)), train=False)
        loss_cfg = self.config.get("loss", {})
        self.tx = optax.adam(loss_cfg.get("learning_rate", 1e-3))
        self.state = TrainState.create(
            {"params": variables["params"], "batch_stats": variables["batch_stats"]},
            self.tx,
        )
        self.last_epoch = 0
        if load:
            ckpt = latest_checkpoint(self.save_path)
            if ckpt is not None:
                self.state, self.last_epoch = load_checkpoint(ckpt, self.state)
                logging.info(f"restored {ckpt} (epoch {self.last_epoch})")

        net = self.net
        box_weight = loss_cfg.get("box_weight", 0.1)

        def apply_loss(params, batch_stats, batch, train_flag):
            x, y = batch
            (hm, box), mutated = net.apply(
                {"params": params, "batch_stats": batch_stats},
                x,
                train=train_flag,
                mutable=["batch_stats"] if train_flag else [],
            )
            loss_dict = detector_loss(hm, box, y, box_weight=box_weight)
            new_stats = mutated["batch_stats"] if train_flag else batch_stats
            return loss_dict["loss"], (loss_dict, new_stats)

        self.train_epoch_fn = make_train_epoch_fn(apply_loss, self.tx)
        self.eval_epoch_fn = make_eval_epoch_fn(apply_loss)

        self.rng = np.random.default_rng(42)
        self.error_densities = None
        lp = CenterLabelProcessor(oriented=self.ORIENTED)
        self.label_processor_train = lp
        self.label_processor_val = lp
        if train:
            self.__init_data__(reuse_data=reuse_data)

    # ----------------------------------------------------------------- train

    def train(self):
        from mpp_cnn_rs_object_detection_tpu.data.patch_making import (
            make_patch_dataset,
        )

        for epoch in range(self.last_epoch, self.n_epochs):
            tb = stack_batches(self.train_loader)
            self.state, tm = self.train_epoch_fn(self.state, tb)
            vb = stack_batches(self.val_loader)
            vm = self.eval_epoch_fn(self.state, vb)
            t = {k: float(np.mean(np.asarray(v))) for k, v in tm.items()}
            v = {k: float(np.mean(np.asarray(x))) for k, x in vm.items()}
            print(
                f"[{epoch:04}] "
                + " ".join(f"{k}: {x:.4f}" for k, x in t.items())
                + " | val "
                + " ".join(f"{k}: {x:.4f}" for k, x in v.items())
            )
            self.logger.update_train_val(epoch, t, v)
            # rolling checkpoint every epoch: wall-clock timeouts on slow
            # hosts must not lose progress (reference: every 4 epochs)
            save_checkpoint(self.save_path, self.state, epoch + 1)
            if (
                epoch % self.dataset_update_interval == 0
                and epoch != 0
            ):
                make_patch_dataset(
                    new_dataset=self.temp_dataset,
                    source_dataset=self.dataset,
                    config=self.config,
                    make_val=False,
                    rng=self.rng,
                )
                self.data_train.update_files()
        save_checkpoint(
            self.save_path, self.state, self.n_epochs, name="model.msgpack"
        )
        self.clean()

    # ----------------------------------------------------------------- infer

    def infer_on_image(self, image: np.ndarray):
        h, w = image.shape[:2]
        ph = (64 - h % 64) % 64
        pw = (64 - w % 64) % 64
        padded = np.pad(image, ((0, ph), (0, pw), (0, 0)))

        @jax.jit
        def fwd(params, batch_stats, img):
            hm, box = self.net.apply(
                {"params": params, "batch_stats": batch_stats},
                img[None],
                train=False,
            )
            return jax.nn.sigmoid(hm[0]), box[0]

        hm, box = fwd(self.state.params, self.state.batch_stats, jnp.asarray(padded))
        return np.asarray(hm)[:h, :w], np.asarray(box)[:h, :w]

    def infer(self, subset: str = "val", overwrite: bool = True,
              min_confidence: float = 0.15, **kwargs):
        results_dir = get_inference_path(
            model_name=os.path.split(self.save_path)[1],
            dataset=self.dataset, subset=subset,
        )
        make_if_not_exist(results_dir, recursive=True)
        det_type = "obb" if self.ORIENTED else "hbb"
        dota_trlt = DOTAResultsTranslator(
            self.dataset, subset, results_dir, det_type, all_classes=["vehicle"]
        )
        paths = fetch_data_paths(self.dataset, subset=subset, metadata=False)
        for pf, af in zip(paths["images"], paths["annotations"]):
            patch_id = int(_ID_RE.match(os.path.split(pf)[1]).group(1))
            out_pkl = os.path.join(results_dir, f"{patch_id:04}_results.pkl")
            if os.path.exists(out_pkl) and not overwrite:
                continue
            img = np.asarray(Image.open(pf), np.float32)[..., :3] / 255.0
            with open(af, "rb") as f:
                labels = pickle.load(f)
            hm, box = self.infer_on_image(img)
            centers, scores, boxes = decode_peaks(
                hm, box, k=400, min_score=min_confidence
            )
            centers, scores, keep = nms_distance(
                centers, scores, threshold=3, return_index=True
            )
            centers = np.asarray(centers).reshape(-1, 2)
            scores = np.asarray(scores)
            boxes = boxes[keep] if len(keep) else boxes[:0]

            self._export(
                dota_trlt, patch_id, labels, centers, scores, boxes, results_dir
            )
        dota_trlt.save()
        logging.info("saved DOTA translations")

    def _export(self, trlt, patch_id, labels, centers, scores, boxes,
                results_dir):
        gt_centers = np.asarray(labels["centers"]).reshape(-1, 2)
        gt_params = np.asarray(labels["parameters"]).reshape(-1, 3)
        if self.ORIENTED:
            a, b = boxes[:, 0], boxes[:, 1]
            angle = 0.5 * np.arctan2(boxes[:, 2], boxes[:, 3]) % np.pi
            det_poly = rect_to_poly_np(centers, a, b, angle).reshape(-1, 4, 2)
            gt_poly = rect_to_poly_np(
                gt_centers, gt_params[:, 0], gt_params[:, 1], gt_params[:, 2]
            ).reshape(-1, 4, 2)
            trlt.add_gt(
                image_id=patch_id, polygons=gt_poly,
                difficulty=labels["difficult"],
                categories=["vehicle"] * len(gt_poly),
            )
            trlt.add_detections(
                image_id=patch_id, scores=scores, polygons=det_poly,
                flip_coor=True, class_names=["vehicle"] * len(scores),
            )
            res = {
                "detection": det_poly,
                "detection_type": "poly",
                "detection_center": centers,
                "detection_score": scores,
                "detection_params": np.stack([a, b, angle], -1)
                if len(centers)
                else np.zeros((0, 3)),
            }
        else:
            hh, ww = boxes[:, 0] / 2, boxes[:, 1] / 2
            det_boxes = np.stack(
                [
                    centers[:, 1] - ww, centers[:, 0] - hh,
                    centers[:, 1] + ww, centers[:, 0] + hh,
                ],
                -1,
            ) if len(centers) else np.zeros((0, 4))
            gt_boxes = []
            for c, p in zip(gt_centers, gt_params):
                a, b, wangle = p
                cw = abs(b * np.cos(wangle)) + abs(a * np.sin(wangle))
                ch = abs(b * np.sin(wangle)) + abs(a * np.cos(wangle))
                gt_boxes.append(
                    [c[1] - cw / 2, c[0] - ch / 2, c[1] + cw / 2, c[0] + ch / 2]
                )
            gt_boxes = np.asarray(gt_boxes).reshape(-1, 4)
            gt_poly = np.array(
                [
                    [[b[0], b[1]], [b[2], b[1]], [b[2], b[3]], [b[0], b[3]]]
                    for b in gt_boxes
                ]
            ).reshape(-1, 4, 2)
            trlt.add_gt(
                image_id=patch_id, polygons=gt_poly,
                difficulty=labels["difficult"], flip_coor=False,
                categories=["vehicle"] * len(gt_poly),
            )
            trlt.add_detections(
                image_id=patch_id, scores=scores, bbox=det_boxes,
                flip_coor=False, class_names=["vehicle"] * len(scores),
            )
            res = {
                "detection": det_boxes,
                "detection_type": "bbox",
                "detection_center": centers,
                "detection_score": scores,
            }
        with open(
            os.path.join(results_dir, f"{patch_id:04}_results.pkl"), "wb"
        ) as f:
            pickle.dump(res, f)

    def eval(self):
        dota_eval(
            model_dir=self.save_path, dataset=self.dataset, subset="val",
            det_type="obb" if self.ORIENTED else "hbb",
        )

    def data_preview(self):
        pass


class FasterRCNNModel(_CenterDetectorModel):
    """HBB baseline (reference C29 capability parity)."""

    ORIENTED = False
    MODEL_TYPE = "fasterrcnn"


class BBAVecModel(_CenterDetectorModel):
    """OBB baseline (reference C30 capability parity); regresses
    (a, b, sin 2w, cos 2w) at centers — the double-angle encoding avoids the
    pi-periodicity discontinuity BBAVectors handles with cls_theta."""

    ORIENTED = True
    MODEL_TYPE = "bbavec"
