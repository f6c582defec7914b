"""ShapeNet: per-pixel mark-distribution CNN (size/ratio/angle, 32 bins each).

Rebuild of reference ``models/shape_net/shape_net_model.py:36-393`` on
JAX/flax. Inference emits per-pixel softmax distributions; combined with the
PosNet detection map it outputs rectangles and writes the ``NNNN_results.pkl``
contract consumed by ``load_image_w_maps`` — ``output`` is a list of three
(1, C, H, W) arrays plus ``mappings`` (reference ``shape_net_model.py:353-381``,
``models/mpp/data_loaders.py:52-56``).
"""

from __future__ import annotations

import logging
import os
import pickle
import re
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from PIL import Image

from mpp_cnn_rs_object_detection_tpu.data.label_processing import ShapeLabelProcessor
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
from mpp_cnn_rs_object_detection_tpu.models.unet import ShapeNet, infer_pad_hw
from mpp_cnn_rs_object_detection_tpu.models.losses import pixel_ce_loss
from mpp_cnn_rs_object_detection_tpu.ops.geometry import (
    rect_to_poly_np,
    sra_to_wla,
)
from mpp_cnn_rs_object_detection_tpu.ops.mappings import (
    ValueMapping,
    default_mappings,
)
from mpp_cnn_rs_object_detection_tpu.ops.nms import nms_distance
from mpp_cnn_rs_object_detection_tpu.utils.config import (
    fetch_data_paths,
    get_inference_path,
    maybe_yield_device,
    startup_config,
)
from mpp_cnn_rs_object_detection_tpu.utils.files import make_if_not_exist

PATCH_SIZE = 512
_ID_RE = re.compile(r"[^0-9]*([0-9]+).*\.png")


class ShapeNetModel(BaseModel, PatchBasedTrainer):
    def __init__(self, config: Dict, overwrite: bool = False, load: bool = False,
                 train: bool = True, dataset: Optional[str] = None,
                 reuse_data: bool = False):
        self.config, self.logger, self.save_path = startup_config(
            config, "shapenet", load_model=load, overwrite=overwrite
        )
        self.dataset = dataset or self.config["data_loader"]["dataset"]
        self.temp_dataset = f"temp_{self.config['model_name']}"
        self.n_epochs = self.config["trainer"]["n_epochs"]
        self.batch_size = self.config["trainer"]["batch_size"]
        self.n_classes = self.config["trainer"].get("n_classes", 32)
        self.depth = len(self.config["model"]["hidden_dims"]) - 1

        map_cfg = self.config.get("mappings", {})
        self.mappings: List[ValueMapping] = default_mappings(
            n_classes=self.n_classes,
            size_min=map_cfg.get("size_mapping_min", 0.0),
            size_max=map_cfg.get("size_mapping_max", 32.0),
        )

        self.use_device_pipeline = bool(
            self.config["data_loader"].get("device_pipeline")
        )
        net_dtype = (
            jnp.bfloat16
            if self.config["model"].get("dtype", "bfloat16") == "bfloat16"
            else jnp.float32
        )
        self.net = ShapeNet(
            hidden_dims=self.config["model"]["hidden_dims"],
            out_features=3,
            n_classes=self.n_classes,
            dtype=net_dtype,
        )
        key = jax.random.PRNGKey(0)
        variables = self.net.init(key, jnp.zeros((1, 64, 64, 3)), train=False)
        loss_cfg = self.config["loss"]
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

        self._build_steps(loss_cfg)
        self._infer_fn_cache = {}

        self.rng = np.random.default_rng(42)
        self.error_densities = None
        label_processor = ShapeLabelProcessor(
            mappings=self.mappings,
            mask_mode=loss_cfg.get("mask_mode", "shapes"),
            mask_sigma=loss_cfg.get("mask_sigma"),
            mask_cutoff_dist=loss_cfg.get("mask_cutoff_dist"),
            class_perturbation=loss_cfg.get("class_perturbation"),
            rng=self.rng,
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
        net = self.net
        focal = bool(loss_cfg.get("focal_loss"))
        focal_args = loss_cfg.get("focal_loss_args", {}) or {}

        def apply_loss(params, batch_stats, batch, train):
            x, y = batch
            outs, mutated = net.apply(
                {"params": params, "batch_stats": batch_stats},
                x,
                train=train,
                mutable=["batch_stats"] if train else [],
            )
            loss_dict = pixel_ce_loss(
                outs,
                y["value_class_map"],
                y["loss_mask"],
                focal_loss=focal,
                focal_alpha=focal_args.get("alpha", 0.5),
                focal_gamma=focal_args.get("gamma", 2.0),
                label_smoothing_sigma=float(
                    loss_cfg.get("label_smoothing_sigma", 0.0)
                ),
            )
            new_stats = mutated["batch_stats"] if train else batch_stats
            return loss_dict["loss"], (loss_dict, new_stats)

        self.train_step = make_train_step(apply_loss, self.tx)
        self.eval_step = make_eval_step(apply_loss)
        self.train_epoch_fn = make_train_epoch_fn(apply_loss, self.tx)
        self.eval_epoch_fn = make_eval_epoch_fn(apply_loss)

        if self.use_device_pipeline:
            from mpp_cnn_rs_object_detection_tpu.data.device_pipeline import (
                shape_targets,
            )
            from mpp_cnn_rs_object_detection_tpu.models.train_utils import (
                make_device_epoch_fns,
            )

            p = self.config["data_loader"]["patch_maker_params"]["patch_size"]
            mappings = self.mappings
            mask_mode = loss_cfg.get("mask_mode", "shapes")
            mask_sigma = loss_cfg.get("mask_sigma") or "auto"

            def target_fn(cen, par, val):
                return shape_targets(cen, par, val, p, mappings,
                                     mask_mode=mask_mode,
                                     mask_sigma=mask_sigma)

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
            self._train_device()
            return
        from mpp_cnn_rs_object_detection_tpu.data.patch_making import (
            make_patch_dataset,
        )

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
                make_patch_dataset(
                    new_dataset=self.temp_dataset,
                    source_dataset=self.dataset,
                    config=self.config,
                    make_val=False,
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
        if padded_hw not in self._infer_fn_cache:
            net = self.net

            @jax.jit
            def fwd(params, batch_stats, img):
                outs = net.apply(
                    {"params": params, "batch_stats": batch_stats},
                    img[None],
                    train=False,
                )
                return [jax.nn.softmax(o, axis=-1)[0] for o in outs]

            self._infer_fn_cache[padded_hw] = fwd
        return self._infer_fn_cache[padded_hw]

    def infer_on_image(self, image: np.ndarray) -> List[np.ndarray]:
        """Whole-image forward -> list of 3 (H, W, C) softmax maps."""
        h, w = image.shape[:2]

        def infer_chunk(img):
            th, tw = infer_pad_hw(*img.shape[:2])
            padded = np.pad(img, ((0, th - img.shape[0]),
                                  (0, tw - img.shape[1]), (0, 0)))
            fwd = self._forward(padded.shape[:2])
            outs = fwd(self.state.params, self.state.batch_stats, jnp.asarray(padded))
            return [np.asarray(o)[: img.shape[0], : img.shape[1]] for o in outs]

        if max(h, w) <= 2 * PATCH_SIZE:
            return infer_chunk(image)
        outs = [np.empty((h, w, self.n_classes), np.float32) for _ in range(3)]
        for i in range(0, h, PATCH_SIZE):
            for j in range(0, w, PATCH_SIZE):
                s = np.s_[i : min(i + PATCH_SIZE, h), j : min(j + PATCH_SIZE, w)]
                chunk = infer_chunk(image[s])
                for o, c in zip(outs, chunk):
                    o[s] = c
        return outs

    def dist_maps_on_image(self, image: np.ndarray) -> List[np.ndarray]:
        """Per-pixel mark distributions for one image; with ``inference.tta``
        true, averaged over the 8 dihedral symmetries — size/ratio maps pull
        back spatially, the cyclic angle map additionally permutes its bins by
        the group action on [0, pi) (``ops/dihedral.py``). Extension; default
        off."""
        if not bool(self.config.get("inference", {}).get("tta", False)):
            return self.infer_on_image(image)
        from mpp_cnn_rs_object_detection_tpu.ops.dihedral import (
            tta_dist_maps,
        )

        cyclic = tuple(
            bool(getattr(m, "is_cyclic", False)) for m in self.mappings
        )
        return tta_dist_maps(
            lambda x: self.infer_on_image(np.ascontiguousarray(x)),
            image,
            cyclic=cyclic,
        )

    def infer(self, subset: str, overwrite=True, min_confidence=0.5, **kwargs):
        from mpp_cnn_rs_object_detection_tpu.models.posnet_model import PosNetModel
        from mpp_cnn_rs_object_detection_tpu.utils.config import (
            resolve_model_config_path,
        )
        import json

        pos_model_name = self.config["inference"]["pos_model"]
        with open(resolve_model_config_path(pos_model_name)) as f:
            pos_config = json.load(f)
        pos_model = PosNetModel(
            pos_config, load=True, train=False, dataset=self.dataset
        )

        results_dir = get_inference_path(
            model_name=os.path.split(self.save_path)[1],
            dataset=self.dataset,
            subset=subset,
        )
        make_if_not_exist(results_dir, recursive=True)
        dota_trlt = DOTAResultsTranslator(
            self.dataset, subset, results_dir, "obb", all_classes=["vehicle"]
        )
        paths_dict = fetch_data_paths(self.dataset, subset=subset, metadata=False)

        for pf, af in zip(paths_dict["images"], paths_dict["annotations"]):
            patch_id = int(_ID_RE.match(os.path.split(pf)[1]).group(1))
            out_pkl = os.path.join(results_dir, f"{patch_id:04}_results.pkl")
            with open(af, "rb") as f:
                labels_dict = pickle.load(f)
            centers, params = labels_dict["centers"], labels_dict["parameters"]
            if os.path.exists(out_pkl) and not overwrite:
                # resume: replay the existing result pickle into the freshly
                # rewritten DOTA translation — skipping entirely would drop
                # this image's GT and detections from the eval
                with open(out_pkl, "rb") as f:
                    prev = pickle.load(f)
                params = np.asarray(params).reshape(-1, 3)
                gt_as_poly = rect_to_poly_np(
                    centers, params[:, 0], params[:, 1], params[:, 2]
                )
                dota_trlt.add_gt(
                    image_id=patch_id, polygons=gt_as_poly,
                    difficulty=labels_dict["difficult"],
                    categories=["vehicle"] * len(gt_as_poly),
                )
                prev_scores = np.asarray(
                    prev["detection_score"]
                ).reshape(-1)
                dota_trlt.add_detections(
                    image_id=patch_id, scores=prev_scores,
                    polygons=np.asarray(prev["detection"]).reshape(-1, 4, 2),
                    flip_coor=True,
                    class_names=["vehicle"] * len(prev_scores),
                )
                continue
            img = np.asarray(Image.open(pf), dtype=np.float32)[..., :3] / 255.0

            # posnet centers
            detection_map = pos_model.detection_map_on_image(img)
            det_centers = np.array(np.where(detection_map > min_confidence)).T
            det_scores = detection_map[det_centers[:, 0], det_centers[:, 1]]
            pred_centers, pred_scores = nms_distance(
                det_centers, det_scores, threshold=6
            )

            # shapenet marks at centers (argmax of per-pixel distributions)
            dist_maps = self.dist_maps_on_image(img)  # 3 x (H, W, C)
            pred_params = []
            for c in pred_centers:
                sra = [
                    # bin-center decode (unbiased inverse of floor encode)
                    float(m.class_to_center_value(np.argmax(d[c[0], c[1]])))
                    for m, d in zip(self.mappings, dist_maps)
                ]
                pred_params.append(sra_to_wla(*sra))
            pred_params = np.array(pred_params).reshape(-1, 3)

            detection_as_poly = rect_to_poly_np(
                pred_centers, pred_params[:, 0], pred_params[:, 1],
                pred_params[:, 2],
            )
            params = np.asarray(params).reshape(-1, 3)
            gt_as_poly = rect_to_poly_np(
                centers, params[:, 0], params[:, 1], params[:, 2]
            )
            dota_trlt.add_gt(
                image_id=patch_id,
                polygons=gt_as_poly,
                difficulty=labels_dict["difficult"],
                categories=["vehicle"] * len(gt_as_poly),
            )
            dota_trlt.add_detections(
                image_id=patch_id,
                scores=pred_scores,
                polygons=detection_as_poly,
                flip_coor=True,
                class_names=["vehicle"] * len(pred_scores),
            )

            # channel-first (1, C, H, W) output arrays: the ImageWMaps contract
            output = [np.moveaxis(d, -1, 0)[None] for d in dist_maps]
            with open(out_pkl, "wb") as f:
                pickle.dump(
                    {
                        "detection": detection_as_poly,
                        "detection_type": "poly",
                        "detection_center": pred_centers,
                        "detection_score": pred_scores,
                        "detection_params": pred_params,
                        "pos_model": pos_model_name,
                        "mappings": self.mappings,
                        "output": output,
                    },
                    f,
                )
        dota_trlt.save()
        logging.info("saved DOTA translations")

    def eval(self):
        dota_eval(
            model_dir=self.save_path,
            dataset=self.dataset,
            subset="val",
            det_type="obb",
        )

    def data_preview(self):
        samples_dir = os.path.join(self.save_path, "data_samples_train")
        make_if_not_exist(samples_dir)
        for i, (x, y) in enumerate(self.train_loader):
            for j in range(min(len(x), 8)):
                arr = np.clip(x[j], 0, 1)
                Image.fromarray((arr * 255).astype(np.uint8)).save(
                    os.path.join(samples_dir, f"sample_b{i:02}_{j:04}_raw.png")
                )
            break
