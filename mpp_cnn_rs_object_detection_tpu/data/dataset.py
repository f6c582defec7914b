"""Dataset IO and host-side input pipeline.

Rebuild of reference ``data/image_dataset.py:14-66`` and ``utils/images.py:4-24``
without torch DataLoaders: items are numpy (patch, label-dict) pairs produced by
a ``LabelProcessor``, and ``BatchLoader`` stacks them into NHWC numpy batches
ready to feed a jitted train step (host work overlaps device compute via a
thread pool; all tensors stay numpy until the device transfer).

Dataset-on-disk format (identical to the reference, SURVEY.md C6):
``<root>/<dataset>/<subset>/{images/NNNN.png, annotations/NNNN.pkl,
metadata/NNNN.json}`` with annotation dict keys
``centers (N,2) int, parameters (N,3) float (a,b,angle), categories, difficult``.
"""

from __future__ import annotations

import pickle
from abc import abstractmethod
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, List, Optional, Tuple

import numpy as np
from PIL import Image

from mpp_cnn_rs_object_detection_tpu.utils.config import fetch_data_paths


def load_image(path: str) -> np.ndarray:
    """PNG -> float32 RGB in [0, 1] (drops alpha)."""
    arr = np.asarray(Image.open(path), dtype=np.float32)
    if arr.max() > 1.0:
        arr = arr / 255.0
    return arr[..., :3]


def load_annotation(path: str) -> dict:
    with open(path, "rb") as f:
        return pickle.load(f)


def save_annotation(path: str, centers, parameters, categories, difficult):
    with open(path, "wb") as f:
        pickle.dump(
            {
                "centers": np.asarray(centers),
                "parameters": np.asarray(parameters),
                "categories": np.asarray(categories),
                "difficult": np.asarray(difficult),
            },
            f,
        )


def extract_patch(image: np.ndarray, center_anchor: np.ndarray, patch_size: int):
    """Crop a patch centred at ``center_anchor`` with zero-padding at borders.

    Returns (patch, tl_anchor, centers_offset) exactly as the reference
    (``utils/images.py:4-24``) so label reassignment matches.
    """
    center_anchor = np.asarray(center_anchor)
    assert center_anchor.shape == (2,)
    tl_anchor = center_anchor - patch_size // 2
    shape = np.array(image.shape[:2])
    centers_offset = np.zeros((2,), dtype=int)

    # border handling is a VIRTUAL zero-pad of patch_size//2 per padded dim
    # (the reference np.pad's full-image copy cost ~30 ms/scene-sized call
    # and dominated patch-regen profiles); tl_anchor/centers_offset keep the
    # reference's padded-frame semantics exactly
    src_tl = np.array(tl_anchor)  # top-left in ORIGINAL image coords
    for d in (0, 1):
        if tl_anchor[d] < 0 or tl_anchor[d] + patch_size >= shape[d]:
            centers_offset[d] = patch_size // 2
            tl_anchor[d] = tl_anchor[d] + patch_size // 2

    y0, x0 = int(src_tl[0]), int(src_tl[1])
    cy0, cx0 = max(y0, 0), max(x0, 0)
    cy1 = min(y0 + patch_size, int(shape[0]))
    cx1 = min(x0 + patch_size, int(shape[1]))
    if cy0 >= cy1 or cx0 >= cx1:
        patch = np.zeros((patch_size, patch_size) + image.shape[2:],
                         image.dtype)
    elif cy1 - cy0 == patch_size and cx1 - cx0 == patch_size:
        patch = image[cy0:cy1, cx0:cx1]
    else:
        patch = np.zeros((patch_size, patch_size) + image.shape[2:],
                         image.dtype)
        patch[cy0 - y0 : cy1 - y0, cx0 - x0 : cx1 - x0] = image[
            cy0:cy1, cx0:cx1
        ]
    return patch, tl_anchor, centers_offset


class LabelProcessor:
    """(patch, centers, params) -> (patch NHW C-last float32, label dict of numpy)."""

    @abstractmethod
    def process(self, patch: np.ndarray, centers: np.ndarray, params: np.ndarray,
                idx: int) -> Tuple[np.ndarray, Dict[str, np.ndarray]]:
        ...


class ImageDataset:
    """One file = one item; supports patch-set regeneration via ``update_files``."""

    def __init__(self, dataset: str, subset: str, rng: Optional[np.random.Generator],
                 label_processor: LabelProcessor, augmenter=None, rgb: bool = True,
                 cache: bool = True):
        self.dataset = dataset
        self.subset = subset
        self.paths = fetch_data_paths(self.dataset, self.subset, metadata=False)
        self.rng = np.random.default_rng() if rng is None else rng
        self.augmenter = augmenter
        self.rgb = rgb
        self.label_processor = label_processor
        # PNG decode dominates per-item cost (~15 ms vs ~7 ms for
        # augment+labels); cache decoded patches between epochs (cleared when
        # the patch set regenerates)
        self.cache_enabled = cache
        self._cache = {}

    def update_files(self):
        self.paths = fetch_data_paths(self.dataset, self.subset, metadata=False)
        self._cache.clear()

    def __len__(self):
        return len(self.paths["images"])

    def _load_raw(self, item):
        if self.cache_enabled and item in self._cache:
            return self._cache[item]
        patch = load_image(self.paths["images"][item])
        labels_dict = load_annotation(self.paths["annotations"][item])
        if self.cache_enabled:
            self._cache[item] = (patch, labels_dict)
        return patch, labels_dict

    def __getitem__(self, item):
        patch, labels_dict = self._load_raw(item)
        centers, params = labels_dict["centers"], labels_dict["parameters"]

        if self.augmenter is not None:
            patch, centers, params, _ = self.augmenter.transform(patch, centers, params)

        return self.label_processor.process(
            patch=patch, centers=centers, params=params, idx=item
        )


class PatchDataset:
    """On-the-fly patch extraction from whole source images (reference
    ``data/patch_dataset.py:14-92``): each ``__getitem__`` samples an
    (image, patch-center) pair through a ``PatchSampler``, crops with border
    padding, reassigns labels, optionally augments, and runs the label
    processor — no materialised temp dataset. Decoded source images are
    cached (the sources are few and reused across items)."""

    def __init__(self, patch_size: int, dataset: str, subset: str,
                 rng: Optional[np.random.Generator],
                 label_processor: LabelProcessor, patch_sampler,
                 augmenter=None, rgb: bool = True):
        self.patch_size = patch_size
        self.paths = fetch_data_paths(dataset, subset)
        self.rng = np.random.default_rng() if rng is None else rng
        self.label_processor = label_processor
        self.augmenter = augmenter
        self.rgb = rgb
        self.patch_sampler = patch_sampler
        self.patch_sampler.initialise(
            self.paths["images"], self.paths["annotations"],
            self.paths["metadata"],
        )
        self._cache: Dict[int, tuple] = {}

    def __len__(self):
        return len(self.patch_sampler)

    def _source(self, image_id: int):
        if image_id not in self._cache:
            image = load_image(self.paths["images"][image_id])
            if not self.rgb:
                image = image[..., :1]
            labels = load_annotation(self.paths["annotations"][image_id])
            self._cache[image_id] = (image, labels)
        return self._cache[image_id]

    def __getitem__(self, item):
        image_id = self.patch_sampler.sample_image()
        image, labels_dict = self._source(image_id)
        centers = np.asarray(labels_dict["centers"]).reshape(-1, 2)
        params = np.asarray(labels_dict["parameters"]).reshape(-1, 3)
        anchor = self.patch_sampler.sample_patch_center(
            image_id=image_id, shape=np.array(image.shape[:2]),
            centers=centers,
        )
        patch, tl, off = extract_patch(image, anchor, self.patch_size)
        if len(centers):
            rel = centers + off - tl
            keep = np.all((rel >= 0) & (rel < self.patch_size), axis=1)
            p_centers, p_params = rel[keep], params[keep]
        else:
            p_centers = np.zeros((0, 2))
            p_params = np.zeros((0, 3))
        if self.augmenter is not None:
            patch, p_centers, p_params, _ = self.augmenter.transform(
                patch, p_centers, p_params
            )
        return self.label_processor.process(
            patch=patch, centers=p_centers, params=p_params, idx=item
        )


class BatchLoader:
    """Batches an ImageDataset into stacked numpy arrays.

    Replaces ``torch.utils.data.DataLoader(num_workers=8)`` (reference
    ``utils/training.py:125-129``) with a thread pool: label processing is
    numpy (GIL-released BLAS) and the jitted train step runs async on device,
    so threads are enough to hide host latency.
    """

    def __init__(self, dataset: ImageDataset, batch_size: int, shuffle: bool = True,
                 rng: Optional[np.random.Generator] = None, num_workers: int = 8,
                 drop_last: bool = True):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.rng = np.random.default_rng() if rng is None else rng
        self.num_workers = num_workers
        self.drop_last = drop_last

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def __iter__(self) -> Iterator[Tuple[np.ndarray, Dict[str, np.ndarray]]]:
        order = np.arange(len(self.dataset))
        if self.shuffle:
            self.rng.shuffle(order)
        n_batches = len(self)
        with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
            for b in range(n_batches):
                idx = order[b * self.batch_size : (b + 1) * self.batch_size]
                items = list(pool.map(self.dataset.__getitem__, idx))
                yield _collate(items)


def _collate(items: List[Tuple[np.ndarray, Dict[str, np.ndarray]]]):
    patches = np.stack([it[0] for it in items], axis=0)
    keys = items[0][1].keys()
    labels = {}
    for k in keys:
        v0 = items[0][1][k]
        if isinstance(v0, list):
            labels[k] = [
                np.stack([it[1][k][i] for it in items], axis=0) for i in range(len(v0))
            ]
        else:
            labels[k] = np.stack([it[1][k] for it in items], axis=0)
    return patches, labels
