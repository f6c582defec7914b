"""PosNet: pointing-vector CNN producing the MPP detection map.

Rebuild of reference ``models/position_net/pos_net_model.py:39-434`` on
JAX/flax: jitted data-parallel train step, divergence-classifier head trained
jointly, error-density hard mining, periodic patch-set regeneration, and
whole-image inference emitting the ``NNNN_results.pkl`` contract
(``detection/detection_score/detection_type/detection_map``) the MPP layer
consumes, plus DOTA HBB export.
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

from mpp_cnn_rs_object_detection_tpu.data.label_processing import PosLabelProcessor
from mpp_cnn_rs_object_detection_tpu.data.patch_making import make_patch_dataset
from mpp_cnn_rs_object_detection_tpu.metrics.dota_eval import dota_eval
from mpp_cnn_rs_object_detection_tpu.metrics.dota_writer import DOTAResultsTranslator
from mpp_cnn_rs_object_detection_tpu.models.base import BaseModel, PatchBasedTrainer
from mpp_cnn_rs_object_detection_tpu.models.train_utils import (
    TrainState,
    latest_checkpoint,
    load_checkpoint,
    make_eval_epoch_fn,
    make_eval_step,
    make_train_epoch_fn,
    make_train_step,
    mean_metrics,
    save_checkpoint,
    stack_batches,
    update_metrics,
)
from mpp_cnn_rs_object_detection_tpu.models.unet import (
    DivClassifier,
    PosNet,
    infer_pad_hw,
)
from mpp_cnn_rs_object_detection_tpu.models.losses import pointing_vector_loss
from mpp_cnn_rs_object_detection_tpu.ops.divergence import (
    divergence_map_from_vector_field,
)
from mpp_cnn_rs_object_detection_tpu.ops.nms import nms_distance
from mpp_cnn_rs_object_detection_tpu.utils.config import (
    fetch_data_paths,
    get_dataset_base_path,
    get_inference_path,
    maybe_yield_device,
    startup_config,
)
from mpp_cnn_rs_object_detection_tpu.utils.files import make_if_not_exist

PATCH_SIZE = 512
_ID_RE = re.compile(r"[^0-9]*([0-9]+).*\.png")


def _save_png(path: str, array: np.ndarray):
    arr = np.clip(np.asarray(array), 0.0, 1.0)
    if arr.ndim == 2:
        arr = np.stack([arr] * 3, axis=-1)
    Image.fromarray((arr * 255).astype(np.uint8)).save(path)


class PosNetModel(BaseModel, PatchBasedTrainer):
    def __init__(self, config: Dict, overwrite: bool = False, load: bool = False,
                 train: bool = True, dataset: Optional[str] = None,
                 reuse_data: bool = False):
        self.config, self.logger, self.save_path = startup_config(
            config, "posnet", load_model=load, overwrite=overwrite
        )
        self.dataset = dataset or self.config["data_loader"]["dataset"]
        self.temp_dataset = f"temp_{self.config['model_name']}"
        self.n_epochs = self.config["trainer"]["n_epochs"]
        self.batch_size = self.config["trainer"]["batch_size"]
        self.figure_interval = self.config["trainer"].get("figure_interval", 4)
        self.error_update_interval = self.config["data_loader"].get(
            "error_update_interval"
        )

        loss_cfg = self.config["loss"]
        self.max_distance = loss_cfg["max_distance"]
        self.target_mode = loss_cfg.get("target_mode", "uvec")
        self.learn_mask = loss_cfg["learn_mask"]
        self.use_div_clf = bool(self.config.get("div_clf_model"))
        self.depth = len(self.config["model"]["hidden_dims"]) - 1

        self.use_device_pipeline = bool(
            self.config["data_loader"].get("device_pipeline")
        )
        net_dtype = (
            jnp.bfloat16
            if self.config["model"].get("dtype", "bfloat16") == "bfloat16"
            else jnp.float32
        )
        self.net = PosNet(
            hidden_dims=self.config["model"]["hidden_dims"],
            out_channels=3 if self.learn_mask else 2,
            dtype=net_dtype,
        )
        self.div_clf = DivClassifier() if self.use_div_clf else None

        key = jax.random.PRNGKey(0)
        dummy = jnp.zeros((1, 64, 64, 3), jnp.float32)
        variables = self.net.init(key, dummy, train=False)
        params = {"net": variables["params"]}
        if self.div_clf is not None:
            params["div"] = self.div_clf.init(key, jnp.zeros((1, 64, 64, 3)))[
                "params"
            ]
        self.tx = optax.adam(loss_cfg.get("learning_rate", 1e-3))
        self.state = TrainState.create(
            {"params": params, "batch_stats": variables["batch_stats"]}, self.tx
        )
        self.last_epoch = 0
        if load:
            ckpt = latest_checkpoint(self.save_path)
            if ckpt is not None:
                self.state, self.last_epoch = load_checkpoint(ckpt, self.state)
                logging.info(f"restored {ckpt} (epoch {self.last_epoch})")

        self._build_steps(loss_cfg)
        self._infer_fn_cache = {}

        self.rng = np.random.default_rng(42)
        self.error_densities = None
        label_processor = PosLabelProcessor(
            max_distance=self.max_distance,
            mode=self.target_mode,
            n_classes=loss_cfg.get("n_classes"),
            sigma_dil=loss_cfg.get("bin_map_dil"),
        )
        self.label_processor_train = label_processor
        self.label_processor_val = label_processor

        if train:
            if self.use_device_pipeline:
                self.__init_data_device__()
            else:
                self.__init_data__(reuse_data=reuse_data)

    # ------------------------------------------------------------------ steps

    def _build_steps(self, loss_cfg):
        net, div_clf = self.net, self.div_clf
        learn_mask = self.learn_mask
        kwargs = dict(
            learn_mask=learn_mask,
            compute_mask=loss_cfg.get("compute_relevant", True),
            balanced_mask_loss=loss_cfg.get("balanced_mask_loss", True),
            focal_loss=bool(loss_cfg.get("focal_loss")),
            vec_loss_on_prod=bool(loss_cfg.get("vec_loss_on_prod")),
        )

        def apply_loss(params, batch_stats, batch, train):
            x, y = batch
            out, mutated = net.apply(
                {"params": params["net"], "batch_stats": batch_stats},
                x,
                train=train,
                mutable=["batch_stats"] if train else [],
            )
            if train and div_clf is not None:
                vec_and_mask = jnp.concatenate(
                    [out[..., :2], jax.nn.sigmoid(out[..., 2:3])], axis=-1
                )
                div_score = div_clf.apply({"params": params["div"]}, vec_and_mask)
                center_bin = y["center_binary_map_dil"]
            else:
                div_score, center_bin = None, None
            loss_dict = pointing_vector_loss(
                out,
                y["pointing_map"],
                target_mask=y["mask"] if learn_mask else None,
                div_score=div_score,
                center_bin_map=center_bin,
                **kwargs,
            )
            new_stats = (
                mutated["batch_stats"] if train else batch_stats
            )
            return loss_dict["loss"], (loss_dict, new_stats)

        self.train_step = make_train_step(apply_loss, self.tx)
        self.eval_step = make_eval_step(apply_loss)
        self.train_epoch_fn = make_train_epoch_fn(apply_loss, self.tx)
        self.eval_epoch_fn = make_eval_epoch_fn(apply_loss)

        if self.use_device_pipeline:
            from mpp_cnn_rs_object_detection_tpu.data.device_pipeline import (
                pos_targets,
            )
            from mpp_cnn_rs_object_detection_tpu.models.train_utils import (
                make_device_epoch_fns,
            )

            p = self.config["data_loader"]["patch_maker_params"]["patch_size"]
            max_d = self.max_distance
            sig = loss_cfg.get("bin_map_dil") or 0.6

            def target_fn(cen, par, val):
                return pos_targets(cen, par, val, p, max_d, sigma_dil=sig)

            self.device_train_epoch, self.device_eval_epoch = (
                make_device_epoch_fns(apply_loss, self.tx, target_fn)
            )

    # ------------------------------------------------------------------ train

    def train_epoch(self, loader):
        # one device dispatch per epoch: scan over stacked batches
        batches = stack_batches(loader)
        if batches is None:
            return {"loss": [0.0]}
        self.state, metrics = self.train_epoch_fn(self.state, batches)
        return {k: list(np.asarray(v)) for k, v in metrics.items()}

    def val_epoch(self, loader):
        batches = stack_batches(loader)
        if batches is None:
            return {"loss": [0.0]}
        metrics = self.eval_epoch_fn(self.state, batches)
        return {k: list(np.asarray(v)) for k, v in metrics.items()}

    def train(self):
        if self.use_device_pipeline:
            # hard mining (error densities) stays a host-pipeline feature;
            # the device path covers the shipped configs (no
            # error_update_interval)
            self._train_device()
            return
        rescale_fac = 1 / 8
        for epoch in range(self.last_epoch, self.n_epochs):
            train_metrics = mean_metrics(self.train_epoch(self.train_loader))
            val_metrics = mean_metrics(self.val_epoch(self.val_loader))
            print(
                f"[{epoch:04}] "
                + " ".join(f"{k}: {v:.4f}" for k, v in train_metrics.items())
                + " | val "
                + " ".join(f"{k}: {v:.4f}" for k, v in val_metrics.items())
            )
            self.logger.update_train_val(epoch, train_metrics, val_metrics)
            # rolling checkpoint every epoch: wall-clock timeouts on slow
            # hosts must not lose progress (reference: every 4 epochs)
            save_checkpoint(self.save_path, self.state, epoch + 1)
            maybe_yield_device(f"epoch {epoch} checkpoint")

            if epoch % self.dataset_update_interval == 0 and epoch != 0:
                if (
                    self.error_update_interval is not None
                    and epoch % self.error_update_interval == 0
                ):
                    logging.info("computing error densities for hard mining")
                    self.error_densities = self.compute_errors(
                        rescale_fac=rescale_fac
                    )
                make_patch_dataset(
                    new_dataset=self.temp_dataset,
                    source_dataset=self.dataset,
                    config=self.config,
                    make_val=False,
                    sampling_densities=self.error_densities,
                    densities_rescale_fac=rescale_fac,
                    d_sampler_weight=0.5,
                    rng=self.rng,
                )
                self.data_train.update_files()
        self.save()
        self.clean()

    def save(self):
        save_checkpoint(
            self.save_path, self.state, self.n_epochs, name="model.msgpack"
        )

    # ------------------------------------------------------------------ infer

    def _forward(self, padded_hw):
        """Cached jitted forward for one padded (H, W)."""
        if padded_hw not in self._infer_fn_cache:
            net = self.net

            @jax.jit
            def fwd(params, batch_stats, img):
                out = net.apply(
                    {"params": params, "batch_stats": batch_stats},
                    img[None],
                    train=False,
                )[0]
                mask = jax.nn.sigmoid(out[..., 2])
                vec = out[..., :2]
                return mask, vec

            self._infer_fn_cache[padded_hw] = fwd
        return self._infer_fn_cache[padded_hw]

    def infer_on_image(self, image: np.ndarray):
        """Whole-image forward -> (mask (H,W), vec (H,W,2)); pads H,W to
        multiples of 64 (2^depth and shape-bucketing for the jit cache), with a
        512-tile fallback for very large scenes (reference
        ``pos_net_model.py:177-232``)."""
        h, w = image.shape[:2]

        def infer_chunk(img):
            th, tw = infer_pad_hw(*img.shape[:2])
            padded = np.pad(img, ((0, th - img.shape[0]),
                                  (0, tw - img.shape[1]), (0, 0)))
            fwd = self._forward(padded.shape[:2])
            mask, vec = fwd(
                self.state.params["net"], self.state.batch_stats, jnp.asarray(padded)
            )
            mask, vec = np.asarray(mask), np.asarray(vec)
            return mask[: img.shape[0], : img.shape[1]], vec[
                : img.shape[0], : img.shape[1]
            ]

        if max(h, w) <= 2 * PATCH_SIZE:
            return infer_chunk(image)
        mask = np.empty((h, w), np.float32)
        vec = np.empty((h, w, 2), np.float32)
        for i in range(0, h, PATCH_SIZE):
            for j in range(0, w, PATCH_SIZE):
                s = np.s_[i : min(i + PATCH_SIZE, h), j : min(j + PATCH_SIZE, w)]
                m, v = infer_chunk(image[s])
                mask[s], vec[s] = m, v
        return mask, vec

    def vec2detection_map(self, vector_map: np.ndarray, mask: np.ndarray,
                          skip_sigmoid: bool = False) -> np.ndarray:
        """Detection map from (vec, mask): div-classifier head if trained, else
        ``clip(-div/2, 0, 1) * mask`` (reference ``pos_net_model.py:338-349``)."""
        if self.div_clf is not None:
            vec_and_mask = jnp.concatenate(
                [jnp.asarray(vector_map), jnp.asarray(mask)[..., None]], axis=-1
            )
            score = self.div_clf.apply(
                {"params": self.state.params["div"]}, vec_and_mask[None]
            )[0]
            if skip_sigmoid:
                return np.asarray(score)
            return np.asarray(jax.nn.sigmoid(score))
        if jax.default_backend() == "tpu":
            from mpp_cnn_rs_object_detection_tpu.ops.pallas_kernels import (
                detection_map_fused,
            )

            try:
                return np.asarray(
                    detection_map_fused(
                        jnp.asarray(vector_map), jnp.asarray(mask),
                        mask_is_logit=False,
                    )
                )
            except Exception as e:  # pragma: no cover - pallas unavailable
                logging.warning(f"pallas detection kernel failed ({e}); jnp path")
        div = np.asarray(
            divergence_map_from_vector_field(jnp.asarray(vector_map), normalize=True)
        )
        return np.clip(-div / 2, 0, 1) * mask

    def detection_map_on_image(self, image: np.ndarray) -> np.ndarray:
        """Detection map for one image; with ``inference.tta`` true, the mean
        over the 8 dihedral symmetries (``ops/dihedral.py``) — each variant is
        a full forward + div, pulled back to the original frame. Extension
        (no reference equivalent); default off."""
        if not bool(self.config.get("inference", {}).get("tta", False)):
            mask, vec = self.infer_on_image(image)
            return self.vec2detection_map(vec, mask)
        from mpp_cnn_rs_object_detection_tpu.ops.dihedral import (
            tta_scalar_map,
        )

        def one(img_t):
            mask, vec = self.infer_on_image(np.ascontiguousarray(img_t))
            return self.vec2detection_map(vec, mask)

        return tta_scalar_map(one, image)

    def compute_errors(self, rescale_fac: float = 1.0):
        """|target_mask - predicted_mask| per train image -> density PNGs for
        the DensitySampler (reference ``pos_net_model.py:234-269``)."""
        model_name = os.path.split(self.save_path)[1]
        densities_dir = os.path.join(
            get_dataset_base_path(), "error_maps", self.dataset, "train", model_name
        )
        make_if_not_exist(densities_dir, recursive=True)
        densities_files = []
        paths_dict = fetch_data_paths(self.dataset, "train", metadata=False)
        for pf, lf in zip(paths_dict["images"], paths_dict["annotations"]):
            img = np.asarray(Image.open(pf), dtype=np.float32)[..., :3] / 255.0
            with open(lf, "rb") as f:
                labels_dict = pickle.load(f)
            _, label = self.label_processor_train.process(
                img, labels_dict["centers"], labels_dict["parameters"], idx=0
            )
            mask, _ = self.infer_on_image(img)
            error = np.abs(label["mask"] - mask)
            if rescale_fac != 1:
                h, w = error.shape
                nh, nw = max(1, int(h * rescale_fac)), max(1, int(w * rescale_fac))
                error = np.asarray(
                    Image.fromarray((error * 255).astype(np.uint8)).resize(
                        (nw, nh), Image.BILINEAR
                    ),
                    dtype=np.float32,
                ) / 255.0
            path_id = _ID_RE.match(os.path.split(pf)[1]).group(1)
            file = os.path.join(densities_dir, f"{path_id}.png")
            _save_png(file, error)
            densities_files.append(file)
        return densities_files

    def infer(self, subset: str, min_confidence: float = 0.1, overwrite=True,
              **kwargs):
        results_dir = get_inference_path(
            model_name=os.path.split(self.save_path)[1],
            dataset=self.dataset,
            subset=subset,
        )
        make_if_not_exist(results_dir, recursive=True)
        dota_trlt = DOTAResultsTranslator(
            self.dataset, subset, results_dir, "hbb", all_classes=["vehicle"]
        )
        paths_dict = fetch_data_paths(self.dataset, subset=subset, metadata=False)

        for pf, af in zip(paths_dict["images"], paths_dict["annotations"]):
            patch_id = int(_ID_RE.match(os.path.split(pf)[1]).group(1))
            out_pkl = os.path.join(results_dir, f"{patch_id:04}_results.pkl")
            replay = os.path.exists(out_pkl) and not overwrite
            with open(af, "rb") as f:
                labels_dict = pickle.load(f)
            centers = labels_dict["centers"]

            if replay:
                # resume: replay the existing result pickle into the freshly
                # rewritten DOTA translation — skipping entirely would drop
                # this image's GT and detections from the eval
                logging.info(f"{out_pkl} exists, replaying into translations")
                with open(out_pkl, "rb") as f:
                    prev = pickle.load(f)
                detection_map = prev["detection_map"]
                det_centers = np.asarray(prev["detection"]).reshape(-1, 2)
                det_scores = np.asarray(prev["detection_score"]).reshape(-1)
            else:
                img = np.asarray(
                    Image.open(pf), dtype=np.float32
                )[..., :3] / 255.0
                detection_map = self.detection_map_on_image(img)
                det_centers = np.array(
                    np.where(detection_map > min_confidence)
                ).T
                det_scores = detection_map[
                    det_centers[:, 0], det_centers[:, 1]
                ]
            nms_centers, nms_scores = nms_distance(
                det_centers, det_scores, threshold=6
            )

            s1, s2 = 6, 6
            nms_boxes = np.array(
                [[c[1] - s1, c[0] - s1, c[1] + s2, c[0] + s2] for c in nms_centers]
            ).reshape(-1, 4)
            gt_boxes = np.array(
                [[c[1] - s1, c[0] - s1, c[1] + s2, c[0] + s2] for c in centers]
            ).reshape(-1, 4)
            gt_poly = np.array(
                [
                    [[b[0], b[1]], [b[2], b[1]], [b[2], b[3]], [b[0], b[3]]]
                    for b in gt_boxes
                ]
            )

            dota_trlt.add_gt(
                image_id=patch_id,
                polygons=gt_poly,
                difficulty=labels_dict["difficult"],
                flip_coor=False,
                categories=["vehicle"] * len(gt_poly),
            )
            dota_trlt.add_detections(
                image_id=patch_id,
                scores=nms_scores,
                bbox=nms_boxes,
                flip_coor=False,
                class_names=["vehicle"] * len(nms_scores),
            )
            if not replay:
                with open(out_pkl, "wb") as f:
                    pickle.dump(
                        {
                            "detection": det_centers,
                            "detection_score": det_scores,
                            "detection_type": "center",
                            "detection_map": detection_map,
                        },
                        f,
                    )
                _save_png(
                    os.path.join(
                        results_dir, f"{patch_id:04}_detection_map.png"
                    ),
                    detection_map,
                )
        dota_trlt.save()
        logging.info("saved DOTA translations")

    def eval(self):
        dota_eval(
            model_dir=self.save_path,
            dataset=self.dataset,
            subset="val",
            det_type="hbb",
        )

    def data_preview(self):
        samples_dir = os.path.join(self.save_path, "data_samples_train")
        make_if_not_exist(samples_dir)
        for i, (x, y) in enumerate(self.train_loader):
            for j in range(min(len(x), 8)):
                _save_png(
                    os.path.join(samples_dir, f"sample_b{i:02}_{j:04}_raw.png"), x[j]
                )
                _save_png(
                    os.path.join(samples_dir, f"sample_b{i:02}_{j:04}_mask.png"),
                    y["mask"][j],
                )
            break
