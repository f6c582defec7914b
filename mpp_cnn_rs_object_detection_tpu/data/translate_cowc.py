"""COWC car dataset -> custom dataset format (centers only, fixed 4x4 marks).

Rebuild of reference ``data/translation/translate_COWC.py`` (171 LoC): images
come with 'Annotated_Cars' PNG masks whose non-zero pixels are car centers;
images are rescaled from 0.15 m/px to the target GSD, centers scaled along,
parameters fixed to (4, 4, 0) — cars are small near-squares at 0.5 m/px.
"""

from __future__ import annotations

import glob
import json
import logging
import os
import pickle
import re
from typing import Dict

import numpy as np
from PIL import Image

from mpp_cnn_rs_object_detection_tpu.utils.config import get_dataset_base_path
from mpp_cnn_rs_object_detection_tpu.utils.files import (
    NumpyEncoder,
    find_existing_path,
    make_if_not_exist,
)

COWC_GSD = 0.15


def fetch_cowc_paths(data_path: str):
    """(image, annotation) file pairs: ``X.png`` + ``X_Annotated_Cars.png``."""
    png_files = sorted(glob.glob(os.path.join(data_path, "*", "*.png")))
    ann_re = re.compile(r"(.*)_Annotated_Cars\.png")
    skip_re = re.compile(r"(.*)_Annotated_(Cars|Negatives)\.png")
    annotations = [s for s in png_files if ann_re.match(s)]
    images = [s for s in png_files if not skip_re.match(s)]
    assert len(images) == len(annotations), (len(images), len(annotations))
    return list(zip(images, annotations))


def _prepare_one(image_id: int, path_image: str, path_label: str,
                 save_folder: str, scale: float) -> Dict:
    image = np.asarray(Image.open(path_image), dtype=np.float32)[..., :3]
    if image.max() > 1.0:
        image = image / 255.0
    annot = np.asarray(Image.open(path_label))
    centers = np.array(np.where(np.any(annot > 0, axis=-1))).T

    h, w = image.shape[:2]
    nh, nw = max(1, int(h * scale)), max(1, int(w * scale))
    image_r = np.asarray(
        Image.fromarray((image * 255).astype(np.uint8)).resize(
            (nw, nh), Image.BILINEAR
        ),
        dtype=np.float32,
    ) / 255.0
    centers = (centers * scale).astype(int)

    parameters = np.array([[4.0, 4.0, 0.0]] * len(centers)).reshape(-1, 3)
    categories = np.array(["vehicle"] * len(centers))
    difficult = np.zeros(len(centers), dtype=bool)

    Image.fromarray((image_r * 255).astype(np.uint8)).save(
        os.path.join(save_folder, "images", f"{image_id:04}.png")
    )
    with open(
        os.path.join(save_folder, "annotations", f"{image_id:04}.pkl"), "wb"
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
    meta = {
        "source_image": path_image,
        "original_gsd": COWC_GSD,
        "scale": scale,
        "shape": list(image_r.shape),
        "n_objects": int(len(centers)),
    }
    with open(
        os.path.join(save_folder, "metadata", f"{image_id:04}.json"), "w"
    ) as f:
        json.dump(meta, f, cls=NumpyEncoder, indent=1)
    return meta


def translate_cowc(config: Dict):
    """config keys: ``cowc_path`` (raw data candidates; the reference's
    ``cowc_base_path``/``name`` spellings are accepted too, so its
    ``translate_COWC_config.json`` works unchanged), ``dataset_name``,
    ``target_gsd`` (default 0.5), ``val_fraction`` (default 0.25)."""
    path_cfg = config.get("cowc_path", config.get("cowc_base_path"))
    raw = find_existing_path(
        path_cfg if isinstance(path_cfg, list) else [path_cfg]
    )
    name = config.get("dataset_name", config.get("name", "COWC_gsd50"))
    target_gsd = config.get("target_gsd", 0.5)
    val_fraction = config.get("val_fraction", 0.25)
    scale = COWC_GSD / target_gsd

    pairs = fetch_cowc_paths(raw)
    rng = np.random.default_rng(config.get("seed", 0))
    order = rng.permutation(len(pairs))
    n_val = max(1, int(len(pairs) * val_fraction))
    subsets = {"val": order[:n_val], "train": order[n_val:]}

    base = get_dataset_base_path()
    for subset, idx in subsets.items():
        folder = os.path.join(base, name, subset)
        make_if_not_exist(
            [os.path.join(folder, d) for d in ["images", "annotations", "metadata"]],
            recursive=True,
        )
        for local_id, i in enumerate(idx):
            meta = _prepare_one(local_id, pairs[i][0], pairs[i][1], folder, scale)
            logging.info(f"[{name}/{subset}] {local_id:04}: {meta['n_objects']} cars")
    logging.info(f"COWC translated to {os.path.join(base, name)}")
