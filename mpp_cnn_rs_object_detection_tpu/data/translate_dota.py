"""Raw DOTA v2 -> custom dataset format translator.

Rebuild of reference ``data/translation/translate_DOTA.py:285-325``: reads DOTA
images + 8-coordinate polygon label txts + per-image meta (gsd/source/date),
filters by category / GSD / source, rescales to the target GSD (0.5 m/px),
converts polygons to (a, b, angle) via ``polygon_to_abw`` and writes
``images/NNNN.png``, ``annotations/NNNN.pkl``, ``metadata/NNNN.json``.

Uses cv2 for the anti-aliased rescale (skimage-free).
"""

from __future__ import annotations

import glob
import json
import os
import pickle
import re
import shutil
from typing import Any, Dict, List

import cv2
import numpy as np
import pandas as pd
from PIL import Image

from mpp_cnn_rs_object_detection_tpu.ops.geometry import polygon_to_abw
from mpp_cnn_rs_object_detection_tpu.utils.config import get_dataset_base_path
from mpp_cnn_rs_object_detection_tpu.utils.files import (
    NumpyEncoder,
    find_existing_path,
    make_if_not_exist,
)

SCALE_ACCEPTABLE_DELTA = 1e-2

ALL_CATEGORIES = [
    "large-vehicle", "roundabout", "plane", "tennis-court", "helipad", "airport",
    "small-vehicle", "baseball-diamond", "harbor", "bridge", "swimming-pool",
    "storage-tank", "helicopter", "container-crane", "soccer-ball-field",
    "basketball-court", "ship", "ground-track-field",
]


def parse_label_file(label_file: str) -> pd.DataFrame:
    return pd.read_csv(
        label_file, sep=" ",
        names=["x1", "y1", "x2", "y2", "x3", "y3", "x4", "y4", "category", "difficult"],
    )


def fetch_dota_paths(base_path: str, subset: str) -> pd.DataFrame:
    assert subset in ["train", "val", "test"]
    images_df = pd.DataFrame(
        glob.glob(os.path.join(base_path, subset, "images", "P*.png")), columns=["path"]
    )
    images_df["id"] = images_df["path"].str.extract(r"P([0-9]+).png").astype(int)

    if subset == "test":
        return images_df.rename(columns={"path": "path_image"})

    labels_df = pd.DataFrame(
        glob.glob(os.path.join(base_path, subset, f"DOTA-v2.0_{subset}", "P*.txt")),
        columns=["path"],
    )
    labels_df["id"] = labels_df["path"].str.extract(r"P([0-9]+).txt").astype(int)

    metas_df = pd.DataFrame(
        glob.glob(os.path.join(base_path, subset, "meta", "P*.txt")),
        columns=["path_meta"],
    )
    metas_df["id"] = metas_df["path_meta"].str.extract(r"P([0-9]+).txt").astype(int)

    df = pd.merge(images_df, labels_df, on="id", suffixes=("_image", "_label"))
    df = pd.merge(df, metas_df, on="id")

    date_parser = re.compile(r"acquisition dates?:([^\n]*)")
    source_parser = re.compile(r"imagesource:([^\n]*)")
    gsd_parser = re.compile(r"gsd:([^\n]*)")

    def _extract(path_meta: str):
        with open(path_meta, "r") as f:
            text = f.readlines()
        date = date_parser.match(text[0]).group(1)
        source = source_parser.match(text[1]).group(1)
        gsd = gsd_parser.match(text[2]).group(1)
        try:
            gsd = float(gsd)
        except ValueError:
            gsd = None
        try:
            date = str(pd.to_datetime(date))
        except Exception:
            date = None
        source = None if source == "None" else source
        return date, source, gsd

    df["date"], df["source"], df["gsd"] = zip(*df["path_meta"].map(_extract))
    return df


def extract_image_and_boxes(image_file: str, label_file: str,
                            target_categories: List[str]):
    label = parse_label_file(label_file)
    image = np.asarray(Image.open(image_file)) / 255

    label_subset = label[np.isin(label.category, target_categories)]
    all_boxes = np.stack(
        (
            label_subset[["y1", "y2", "y3", "y4"]].values,
            label_subset[["x1", "x2", "x3", "x4"]].values,
        ),
        axis=-1,
    )
    centers = np.mean(all_boxes, axis=1).astype(int)
    return (
        image,
        all_boxes,
        centers,
        label_subset.category.to_numpy(),
        label_subset.difficult.to_numpy(),
    )


def prepare_one_image(image_id: int, path_image: str, path_label: str,
                      target_categories: List[str], save_folder: str, n_objects: int,
                      scale: float, info: dict):
    image, polygons, centers, categories, difficult = extract_image_and_boxes(
        path_image, path_label, target_categories
    )

    shutil.copy(path_label, os.path.join(save_folder, "raw_annotations", f"{image_id:04}.txt"))
    shutil.copy(path_image, os.path.join(save_folder, "raw_images", f"{image_id:04}.png"))

    if abs(1 - scale) > SCALE_ACCEPTABLE_DELTA:
        assert scale <= 1
        h, w = image.shape[:2]
        image = cv2.resize(
            image.astype(np.float32),
            (int(round(w * scale)), int(round(h * scale))),
            interpolation=cv2.INTER_AREA,
        )
        polygons = polygons * scale
        centers = (centers * scale).astype(int)

    parameters = np.array([polygon_to_abw(p) for p in polygons])

    if len(centers) == 0:
        centers = np.array([])
        parameters = np.array([])
        categories = np.array([])
        difficult = np.array([])

    image = np.clip(image[..., :3], 0, 1)
    Image.fromarray((image * 255).astype(np.uint8)).save(
        os.path.join(save_folder, "images", f"{image_id:04}.png")
    )
    with open(os.path.join(save_folder, "annotations", f"{image_id:04}.pkl"), "wb") as f:
        pickle.dump(
            {"centers": centers, "parameters": parameters,
             "categories": categories, "difficult": difficult},
            f,
        )
    with open(os.path.join(save_folder, "metadata", f"{image_id:04}.json"), "w") as f:
        json.dump(
            {"shape": list(image.shape), "n_objects": n_objects, "scale": scale, **info},
            f, cls=NumpyEncoder, indent=1,
        )


def make_dataset(subset: str, data_path: str, save_dir: str, categories: List[str],
                 target_gsd: float, prune_empty: bool, drop_rate: float,
                 rng_seed: int, banned_sources: List[str] = None):
    assert subset in ["train", "val"]

    df = fetch_dota_paths(data_path, subset=subset)

    counts = []
    for p in df.path_label:
        labels = parse_label_file(p)
        counts.append(int(np.sum(np.isin(labels.category, categories))))
    df["n_objects"] = counts

    if banned_sources is not None:
        df = df[~df.source.isin(banned_sources)]
    df = df[df.gsd <= target_gsd]
    df["scale"] = df.gsd / target_gsd
    if prune_empty:
        df = df[df["n_objects"] > 0]

    rng = np.random.default_rng(rng_seed)
    if drop_rate > 0:
        assert drop_rate < 1.0
        keep = rng.choice(
            range(len(df)), size=int(len(df) * (1 - drop_rate)), replace=False
        )
        df = df.iloc[np.sort(keep)]

    df.to_pickle(os.path.join(save_dir, "df_paths_and_meta.pkl"))

    for _, row in df.iterrows():
        prepare_one_image(
            image_id=row["id"],
            path_image=row["path_image"],
            path_label=row["path_label"],
            target_categories=categories,
            save_folder=save_dir,
            scale=row["scale"],
            n_objects=row["n_objects"],
            info={
                "original_gsd": row["gsd"],
                "source": row["source"],
                "date": str(row["date"]),
            },
        )


def translate_dota(config: Dict[str, Any]):
    source_base = find_existing_path(config["dota_base_path"])
    dest_base = get_dataset_base_path()
    save_dir = os.path.join(dest_base, config["name"])
    make_if_not_exist(save_dir)
    with open(os.path.join(save_dir, "config.json"), "w") as f:
        json.dump(config, f, indent=1)

    drop_rate = config.get("drop_rate", {ss: 0.0 for ss in config["subsets"]})
    sub_folders = [
        "raw_images", "images", "raw_annotations", "annotations", "metadata",
        "images_w_annotations",
    ]
    for ss in config["subsets"]:
        subset_dir = os.path.join(save_dir, ss)
        make_if_not_exist(subset_dir)
        make_if_not_exist([os.path.join(subset_dir, s) for s in sub_folders])
        make_dataset(
            subset=ss,
            save_dir=subset_dir,
            data_path=source_base,
            categories=config["categories"],
            target_gsd=config["target_gsd"],
            banned_sources=config["banned_sources"],
            prune_empty=bool(config["prune_empty"]),
            drop_rate=drop_rate[ss],
            rng_seed=0,
        )
