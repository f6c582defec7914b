"""Training-time augmentation without albumentations.

Rebuild of reference ``data/augmentation.py:21-122``: the geometric part
(rot90 / flips, with keypoint (x, y, angle) updates so rotations update the
rectangle angle mark) is reimplemented exactly and unit-tested; the photometric
families of the 'medium'/'strong' pipelines (histogram matching, CLAHE, RGB
shift, blur, gaussian noise, brightness/contrast, channel shuffle/dropout,
shadow, fog, downscale, to-gray) are reimplemented on numpy/cv2.

Coordinate convention: centers are (row, col); angles follow ``polygon_to_abw``
(measured from the +row axis toward the +col axis, mod pi).
"""

from __future__ import annotations

import glob
import os
from dataclasses import dataclass
from typing import Optional

import cv2
import numpy as np

from mpp_cnn_rs_object_detection_tpu.utils.config import get_dataset_base_path


def rot90_points(centers: np.ndarray, angles: np.ndarray, shape_hw, k: int):
    """Rotate (row, col) points and rectangle angles with np.rot90(image, k).

    np.rot90 maps (r, c) -> (W-1-c, r) for k=1 on an (H, W) image.
    """
    k = k % 4
    h, w = shape_hw
    r, c = centers[..., 0].astype(float), centers[..., 1].astype(float)
    a = angles.astype(float)
    for _ in range(k):
        r, c = (w - 1 - c), r
        h, w = w, h
        a = a - np.pi / 2
    return np.stack([r, c], axis=-1), a % np.pi


def flip_points(centers: np.ndarray, angles: np.ndarray, shape_hw, axis: int):
    """Flip (row, col) points and angles across image axis 0 (vertical) or 1."""
    h, w = shape_hw
    out = centers.astype(float).copy()
    if axis == 0:
        out[..., 0] = h - 1 - out[..., 0]
        new_angles = (np.pi - angles) % np.pi
    else:
        out[..., 1] = w - 1 - out[..., 1]
        new_angles = (-angles) % np.pi
    return out, new_angles


def _histogram_match(image: np.ndarray, reference: np.ndarray, blend: float):
    """Per-channel histogram matching (skimage-free) blended with the input."""
    out = np.empty_like(image)
    for ch in range(image.shape[2]):
        src = image[..., ch].ravel()
        ref = reference[..., ch].ravel()
        src_sorted = np.sort(src)
        ref_sorted = np.sort(ref)
        quantiles = np.searchsorted(src_sorted, src, side="left") / max(
            len(src_sorted) - 1, 1
        )
        matched = np.interp(quantiles, np.linspace(0, 1, len(ref_sorted)), ref_sorted)
        out[..., ch] = matched.reshape(image.shape[:2])
    return np.clip((1 - blend) * image + blend * out, 0, 1)


def _clahe(image: np.ndarray):
    lab = cv2.cvtColor((image * 255).astype(np.uint8), cv2.COLOR_RGB2LAB)
    clahe = cv2.createCLAHE(clipLimit=2.0, tileGridSize=(8, 8))
    lab[..., 0] = clahe.apply(lab[..., 0])
    return cv2.cvtColor(lab, cv2.COLOR_LAB2RGB).astype(np.float32) / 255.0


def _random_shadow(image: np.ndarray, rng: np.random.Generator):
    h, w = image.shape[:2]
    n_vert = rng.integers(3, 6)
    poly = np.stack(
        [rng.integers(0, w, n_vert), rng.integers(0, h, n_vert)], axis=-1
    ).astype(np.int32)
    mask = np.zeros((h, w), dtype=np.uint8)
    cv2.fillPoly(mask, [poly], 1)
    factor = rng.uniform(0.4, 0.8)
    out = image.copy()
    out[mask > 0] *= factor
    return out


def _random_fog(image: np.ndarray, rng: np.random.Generator):
    intensity = rng.uniform(0.05, 0.3)
    fog = rng.uniform(0.7, 1.0)
    return np.clip(image * (1 - intensity) + fog * intensity, 0, 1)


@dataclass
class DataAugment:
    rng: np.random.Generator
    dataset: str
    subset: str
    hist_match_images: bool = False
    aug_level: str = "medium"

    def __post_init__(self):
        self.hist_match_images_paths = None
        if self.hist_match_images:
            self.hist_match_images_paths = glob.glob(
                os.path.join(
                    get_dataset_base_path(), self.dataset, self.subset, "images/*.png"
                )
            )
            assert len(self.hist_match_images_paths) > 0
        assert self.aug_level in ("medium", "strong")

    # --- photometric ops -------------------------------------------------

    def _photometric(self, img: np.ndarray) -> np.ndarray:
        rng = self.rng
        strong = self.aug_level == "strong"

        if self.hist_match_images_paths is not None and rng.random() < 0.5:
            from mpp_cnn_rs_object_detection_tpu.data.dataset import load_image

            ref = load_image(
                self.hist_match_images_paths[rng.integers(len(self.hist_match_images_paths))]
            )
            img = _histogram_match(img, ref, blend=rng.uniform(0.1, 0.75))

        if strong:
            if rng.random() < 0.5:
                img = _random_shadow(img, rng)
            if rng.random() < 0.5:
                img = _random_fog(img, rng)
            if rng.random() < 0.5:
                if rng.random() < 0.5:
                    img = img[..., rng.permutation(3)]  # channel shuffle
                else:  # channel dropout
                    ch = rng.integers(3)
                    img = img.copy()
                    img[..., ch] = 0
            if rng.random() < 0.5:  # brightness / contrast
                alpha = 1.0 + rng.uniform(-0.2, 0.2)
                beta = rng.uniform(-0.2, 0.2)
                img = np.clip(alpha * img + beta, 0, 1)

        r = rng.random()
        if r < 0.33:
            img = _clahe(img)
        elif r < 0.66:  # RGB shift
            shift = rng.uniform(-0.08, 0.08, size=3)
            img = np.clip(img + shift, 0, 1)
        elif strong and r < 0.76:  # to gray
            gray = img.mean(axis=-1, keepdims=True)
            img = np.repeat(gray, 3, axis=-1)

        if strong and rng.random() < 0.5:  # downscale
            h, w = img.shape[:2]
            small = cv2.resize(img, (int(w * 0.9), int(h * 0.9)),
                               interpolation=cv2.INTER_AREA)
            img = cv2.resize(small, (w, h), interpolation=cv2.INTER_LINEAR)

        if rng.random() < 0.2:  # blur
            img = cv2.blur(img, (3, 3))

        noise_sigma = rng.uniform(0.0, 0.03)
        img = np.clip(img + rng.normal(0, noise_sigma, img.shape), 0, 1)
        return img.astype(np.float32)

    # --- main entry ------------------------------------------------------

    def transform(self, patch: np.ndarray, centers: np.ndarray, params: np.ndarray):
        n_points = len(centers)
        img = np.asarray(patch, dtype=np.float32)
        centers = np.asarray(centers, dtype=float).reshape(-1, 2)
        params = np.asarray(params, dtype=float).reshape(-1, 3)
        angles = params[:, 2] if n_points > 0 else np.zeros(0)

        # geometric: random rot90 + flips (update centers and angle marks)
        k = int(self.rng.integers(4))
        if k:
            shape_hw = img.shape[:2]
            img = np.rot90(img, k)
            if n_points:
                centers, angles = rot90_points(centers, angles, shape_hw, k)
        if self.rng.random() < 0.5:
            img = img[::-1]
            if n_points:
                centers, angles = flip_points(centers, angles, img.shape[:2], axis=0)
        if self.rng.random() < 0.5:
            img = img[:, ::-1]
            if n_points:
                centers, angles = flip_points(centers, angles, img.shape[:2], axis=1)
        img = np.ascontiguousarray(img)

        img = self._photometric(img)

        if n_points == 0:
            return img, np.array([]), np.array([]), None
        new_centers = centers.astype(int)
        new_params = np.stack([params[:, 0], params[:, 1], angles % np.pi], axis=-1)
        return img, new_centers, new_params, None
