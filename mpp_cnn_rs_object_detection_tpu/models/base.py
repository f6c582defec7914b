"""BaseModel interface + the patch-based CNN trainer skeleton.

Rebuild of reference ``base/base_model.py:10-49`` (train/infer/eval/data_preview
interface) and ``utils/training.py:83-131`` (PatchBasedTrainer: temp patch
dataset + loaders + periodic regeneration). The torch DataLoader machinery is
replaced by the numpy ``BatchLoader`` feeding jitted steps.
"""

from __future__ import annotations

import os
import shutil
from abc import ABC, abstractmethod
from typing import Any, Dict, Optional

import numpy as np

from mpp_cnn_rs_object_detection_tpu.data.augmentation import DataAugment
from mpp_cnn_rs_object_detection_tpu.data.dataset import BatchLoader, ImageDataset
from mpp_cnn_rs_object_detection_tpu.data.patch_making import make_patch_dataset
from mpp_cnn_rs_object_detection_tpu.utils.config import (
    get_dataset_base_path,
    maybe_yield_device,
)


class BaseModel(ABC):
    @abstractmethod
    def train(self):
        ...

    @abstractmethod
    def infer(self, subset: str, **kwargs):
        ...

    @abstractmethod
    def eval(self):
        ...

    def data_preview(self):
        raise NotImplementedError

    def infereval(self, subset: str = "val", **kwargs):
        self.infer(subset=subset, **kwargs)
        self.eval()


class PatchBasedTrainer:
    """Mixin managing the temp patch dataset + loaders for CNN training."""

    temp_dataset: str
    dataset: str
    config: Dict[str, Any]
    rng: np.random.Generator
    label_processor_train: Any
    label_processor_val: Any
    batch_size: int

    def __init_data__(self, reuse_data: bool = False):
        if not reuse_data:
            make_patch_dataset(
                new_dataset=self.temp_dataset,
                source_dataset=self.dataset,
                config=self.config,
                make_val=True,
                rng=self.rng,
            )
        self.dataset_update_interval = self.config["data_loader"][
            "dataset_update_interval"
        ]

        aug_params = self.config["data_loader"].get("augment_params")
        augmenter = (
            DataAugment(rng=self.rng, dataset=self.dataset, subset="train", **aug_params)
            if aug_params
            else None
        )

        self.data_train = ImageDataset(
            dataset=self.temp_dataset, subset="train", rng=self.rng,
            augmenter=augmenter, label_processor=self.label_processor_train,
        )
        self.data_val = ImageDataset(
            dataset=self.temp_dataset, subset="val", rng=self.rng,
            label_processor=self.label_processor_val,
        )
        self.train_loader = BatchLoader(
            self.data_train, batch_size=self.batch_size, shuffle=True, rng=self.rng
        )
        self.val_loader = BatchLoader(
            self.data_val, batch_size=self.batch_size, shuffle=False
        )

    def clean(self):
        path = os.path.join(get_dataset_base_path(), self.temp_dataset)
        if os.path.exists(path):
            shutil.rmtree(path)

    # ------------------------------------------------- device-resident path

    def __init_data_device__(self):
        """Device-pipeline variant of ``__init_data__``: patch stacks live as
        device arrays, augmentation + targets run on-device
        (``data/device_pipeline.py``); enabled by
        ``data_loader.device_pipeline`` in the config."""
        self.dataset_update_interval = self.config["data_loader"][
            "dataset_update_interval"
        ]
        self._regen_device_stacks(make_val=True)

    def _regen_device_stacks(self, make_val: bool = False):
        import jax.numpy as jnp

        from mpp_cnn_rs_object_detection_tpu.data.device_pipeline import (
            build_patch_stack,
        )

        pm = self.config["data_loader"]["patch_maker_params"]
        common = dict(
            patch_size=pm["patch_size"],
            unf_weight=pm.get("unf_sampler_weight", 0.33),
            obj_weight=pm.get("obj_sampler_weight", 0.66),
            sigma=pm.get("obj_sampler_sigma") or 0.0,
            max_objects=pm.get("max_objects", 128),
            rng=self.rng,
        )
        stack = build_patch_stack(
            self.dataset, "train", n_patches=pm["n_patches"],
            copy_paste=pm.get("copy_paste"), **common
        )
        self._train_stack_dev = tuple(
            jnp.asarray(x)
            for x in (stack.images, stack.centers, stack.params, stack.valid)
        )
        if make_val:
            vstack = build_patch_stack(
                self.dataset, "val",
                n_patches=max(pm.get("val_patches", pm["n_patches"] // 2), 64),
                **common,
            )
            self._val_stack_dev = tuple(
                jnp.asarray(x)
                for x in (vstack.images, vstack.centers, vstack.params,
                          vstack.valid)
            )

    def _train_device(self, epoch_hook=None):
        """Shared epoch loop over device-resident stacks (one dispatch per
        epoch; host does permutation + logging only)."""
        import jax

        from mpp_cnn_rs_object_detection_tpu.models.train_utils import (
            mean_metrics,
            save_checkpoint,
        )

        b = self.batch_size
        base_key = jax.random.PRNGKey(1234)
        for epoch in range(self.last_epoch, self.n_epochs):
            n = int(self._train_stack_dev[0].shape[0])
            perm = self.rng.permutation(n)[: (n // b) * b].reshape(-1, b)
            self.state, metrics = self.device_train_epoch(
                self.state, *self._train_stack_dev, perm.astype(np.int32),
                jax.random.fold_in(base_key, epoch),
            )
            train_metrics = mean_metrics(
                {k: list(np.asarray(v)) for k, v in metrics.items()}
            )
            vn = int(self._val_stack_dev[0].shape[0])
            vidx = np.arange((vn // b) * b, dtype=np.int32).reshape(-1, b)
            vmetrics = self.device_eval_epoch(
                self.state, *self._val_stack_dev, vidx
            )
            val_metrics = mean_metrics(
                {k: list(np.asarray(v)) for k, v in vmetrics.items()}
            )
            print(
                f"[{epoch:04}] "
                + " ".join(f"{k}: {v:.4f}" for k, v in train_metrics.items())
                + " | val "
                + " ".join(f"{k}: {v:.4f}" for k, v in val_metrics.items()),
                flush=True,
            )
            self.logger.update_train_val(epoch, train_metrics, val_metrics)
            save_checkpoint(self.save_path, self.state, epoch + 1)
            if epoch_hook is not None:
                epoch_hook(epoch)
            # after the hook: a yield here resumes at epoch+1, so the hook
            # for the just-checkpointed epoch must already have run
            maybe_yield_device(f"epoch {epoch} checkpoint")
            if (
                epoch % self.dataset_update_interval == 0
                and epoch != 0
                and epoch != self.n_epochs - 1
            ):
                self._regen_device_stacks()
        self.save()
