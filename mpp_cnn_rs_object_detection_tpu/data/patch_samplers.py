"""Training-patch samplers: where to crop patches from source images.

Rebuild of reference ``data/patch_samplers.py:14-199``:
  - UniformSampler: images weighted by pixel area, uniform patch centers;
  - ObjectSampler: images weighted by object count, centers jittered around a
    random object;
  - DensitySampler: centers drawn from an error-density map (hard-example
    mining, fed by PosNet's ``compute_errors``);
  - MixedSampler: weighted mixture of the above.
"""

from __future__ import annotations

import json
import os
import re
from abc import abstractmethod
from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np
from PIL import Image

from mpp_cnn_rs_object_detection_tpu.ops.sampler2d import sample_point_2d


def _read_meta(meta_files, key):
    """One metadata field per image, as a float array."""
    vals = []
    for mf in meta_files:
        with open(mf, "r") as f:
            vals.append(json.load(f)[key])
    return np.asarray(vals, np.float64)


def _floor_one_density(raw: np.ndarray, n_patches: int) -> np.ndarray:
    """Per-image sampling density proportional to ``raw``, floored so every
    image receives at least ~one of the ``n_patches`` samples in expectation
    (the reference's guarantee that no source image is starved)."""
    expected = raw / raw.sum() * (n_patches - len(raw)) + 1.0
    return expected / expected.sum()


class PatchSampler:
    sample_density_per_image: Optional[np.ndarray] = None
    n_images: Optional[int] = None

    @abstractmethod
    def initialise(self, patch_files, label_files, meta_files):
        ...

    def sample_image(self) -> int:
        return int(self.rng.choice(np.arange(self.n_images),
                                   p=self.sample_density_per_image))

    @abstractmethod
    def sample_patch_center(self, image_id, shape, centers):
        ...

    def __len__(self):
        return self.n_patches


@dataclass
class UniformSampler(PatchSampler):
    n_patches: int
    patch_size: int
    rng: np.random.Generator

    def initialise(self, patch_files, label_files, meta_files):
        self.n_images = len(meta_files)
        assert self.n_images <= self.n_patches
        areas = np.prod(_read_meta(meta_files, "shape"), axis=-1)
        self.sample_density_per_image = _floor_one_density(
            areas, self.n_patches
        )

    def sample_patch_center(self, image_id, shape, centers):
        return self.rng.integers((0, 0), shape)


@dataclass
class ObjectSampler(PatchSampler):
    n_patches: int
    patch_size: int
    rng: np.random.Generator
    sigma: float = 0.0

    def initialise(self, patch_files, label_files, meta_files):
        self.n_images = len(patch_files)
        self.sample_density_per_image = _floor_one_density(
            _read_meta(meta_files, "n_objects"), self.n_patches
        )

    def sample_patch_center(self, image_id, shape, centers):
        if len(centers) > 0:
            anchor = np.asarray(centers)[self.rng.integers(len(centers))].astype(int)
            if self.sigma != 0:
                anchor = self.rng.normal(anchor, self.sigma).astype(int)
            return np.clip(anchor, (0, 0), shape)
        return self.rng.integers((0, 0), shape)


@dataclass
class DensitySampler(PatchSampler):
    n_patches: int
    patch_size: int
    rng: np.random.Generator
    density_files: List[str]
    rescale_fac: float = 1.0

    def __post_init__(self):
        self.density_files = sorted(self.density_files)

    def initialise(self, patch_files, label_files, meta_files):
        self.n_images = len(patch_files)
        assert len(self.density_files) == len(patch_files)
        sums = []
        for df in self.density_files:
            density = np.asarray(Image.open(df), dtype=np.float64)[..., 0]
            sums.append(density.sum())
        sums = np.array(sums)
        self.sample_density_per_image = sums / sums.sum()
        id_re = re.compile(r"[^0-9]*([0-9]+).*\.png")
        for df, pf in zip(self.density_files, patch_files):
            id_df = id_re.match(os.path.split(df)[1]).group(1)
            id_pf = id_re.match(os.path.split(pf)[1]).group(1)
            assert id_df == id_pf, f"density/image id mismatch: {df} vs {pf}"

    def sample_patch_center(self, image_id, shape, centers):
        density = np.asarray(Image.open(self.density_files[image_id]),
                             dtype=np.float64)[..., 0]
        if self.rescale_fac == 1.0:
            assert np.all(np.asarray(shape[:2]) == density.shape)
        if density.max() == 0:
            center = self.rng.integers((0, 0), shape)
        else:
            center = sample_point_2d(
                img_shape=density.shape[:2], density=density, rng=self.rng
            ).squeeze()
        center = (center / self.rescale_fac).astype(int)
        return np.clip(center, (0, 0), shape)


@dataclass
class MixedSampler(PatchSampler):
    n_patches: int
    samplers: List[PatchSampler]
    weights: List[float]
    rng: np.random.Generator

    def __post_init__(self):
        self.weights = np.array(self.weights, dtype=np.float64)
        self.weights = self.weights / self.weights.sum()

    def add_sampler(self, sampler: PatchSampler, weight: float):
        self.samplers.append(sampler)
        self.weights = np.concatenate([self.weights * (1 - weight), [weight]])
        self.weights = self.weights / self.weights.sum()

    def initialise(self, patch_files, label_files, meta_files):
        self.n_images = len(patch_files)
        for s in self.samplers:
            s.initialise(patch_files, label_files, meta_files)
        mixed = np.sum(
            [w * s.sample_density_per_image for s, w in zip(self.samplers, self.weights)],
            axis=0,
        )
        self.sample_density_per_image = mixed / mixed.sum()

    def sample_patch_center(self, image_id, shape, centers):
        sampler = self.samplers[self.rng.choice(len(self.samplers), p=self.weights)]
        return sampler.sample_patch_center(image_id=image_id, shape=shape, centers=centers)
