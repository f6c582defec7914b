"""Synthetic rectangle datasets for sanity experiments and tests.

Rebuild of reference ``data/make_synth_data.py:16-101``: random non-overlapping
rectangles on a noisy background written in the standard dataset format; uses
our analytic rect geometry instead of shapely/skimage.
"""

from __future__ import annotations

import json
import os
import pickle
from typing import List, Tuple

import numpy as np
from numpy.random import Generator
from PIL import Image

from mpp_cnn_rs_object_detection_tpu.data.label_processing import rect_mask
from mpp_cnn_rs_object_detection_tpu.ops.geometry import (
    convex_quad_intersection_area,
    marks_to_poly,
    polygon_to_abw,
    sra_to_wla,
)
from mpp_cnn_rs_object_detection_tpu.utils.config import get_dataset_base_path
from mpp_cnn_rs_object_detection_tpu.utils.files import NumpyEncoder, make_if_not_exist


def make_synth(rng: Generator, shape: Tuple[int, int], n_rect: int, noise: float):
    """Random non-overlapping rectangles painted on a noisy gray background.

    Returns (image (H, W, 3) float, list of (x, y, size, ratio, angle) tuples).
    """
    cand = [
        dict(
            x=int(rng.integers(0, shape[0])),
            y=int(rng.integers(0, shape[1])),
            size=float(rng.normal(8, 1.0)),
            ratio=float(np.clip(rng.normal(0.5, 0.1), 0.1, 1)),
            angle=float(rng.uniform(0, np.pi)),
        )
        for _ in range(n_rect)
    ]
    polys = [
        np.asarray(marks_to_poly(np.array([c["x"], c["y"]], float),
                                 c["size"], c["ratio"], c["angle"]))
        for c in cand
    ]
    valid: List[dict] = []
    valid_polys: List[np.ndarray] = []
    for c, p in zip(cand, polys):
        inter = sum(
            float(convex_quad_intersection_area(p, vp)) for vp in valid_polys
        )
        if inter == 0:
            valid.append(c)
            valid_polys.append(p)

    image = np.ones(shape + (3,)) * 0.5
    for c in valid:
        a, b, w = sra_to_wla(c["size"], c["ratio"], c["angle"])
        # poly_coord quirk: drawn rect uses (length, width, angle + pi/2)
        mask = rect_mask(shape, (c["x"], c["y"]), b, a, c["angle"] + np.pi / 2)
        image[mask] = rng.choice([0, 1.0]) + rng.normal(0, 0.1)
    image = np.clip(image, 0, 1)
    image = np.clip(image + rng.normal(0, noise, size=image.shape), 0, 1)
    return image, valid, valid_polys


def make_synth_dataset(name: str = "synth_01", n_items: int = 32,
                       shape: Tuple[int, int] = (256, 256), n_rect: int = 230,
                       noise: float = 0.02, seed: int = 0, base_dir: str = None):
    dest_base = base_dir if base_dir is not None else get_dataset_base_path()
    save_dir = os.path.join(dest_base, name)
    make_if_not_exist(save_dir, recursive=True)

    rng = np.random.default_rng(seed)
    for ss in ["train", "val"]:
        subset_dir = os.path.join(save_dir, ss)
        make_if_not_exist(subset_dir)
        make_if_not_exist(
            [os.path.join(subset_dir, s) for s in ["images", "annotations", "metadata"]]
        )
        for image_id in range(n_items):
            image, rects, polys = make_synth(rng, shape, n_rect, noise=noise)
            centers = np.array([[r["x"], r["y"]] for r in rects])
            parameters = np.array([polygon_to_abw(p) for p in polys])
            categories = np.array(["vehicle"] * len(rects))
            difficult = np.array([False] * len(rects))

            Image.fromarray((image * 255).astype(np.uint8)).save(
                os.path.join(subset_dir, "images", f"{image_id:04}.png")
            )
            with open(
                os.path.join(subset_dir, "annotations", f"{image_id:04}.pkl"), "wb"
            ) as f:
                pickle.dump(
                    {
                        "centers": centers,
                        "parameters": parameters,
                        "categories": categories,
                        "difficult": difficult,
                    },
                    f,
                )
            with open(
                os.path.join(subset_dir, "metadata", f"{image_id:04}.json"), "w"
            ) as f:
                json.dump(
                    {"shape": list(image.shape), "n_objects": len(rects)},
                    f, cls=NumpyEncoder, indent=1,
                )
    return save_dir
