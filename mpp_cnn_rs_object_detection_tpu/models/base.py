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
from mpp_cnn_rs_object_detection_tpu.utils.config import get_dataset_base_path


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
