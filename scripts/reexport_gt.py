#!/usr/bin/env python
"""Rewrite the DOTA GT txt files of existing inference results and re-run
the AP eval — detections untouched.

Rationale: ``dota_writer.py`` used to truncate GT coordinates to integers
(reference quirk, ``dota_results_translator.py:38``), which caps even the
oracle at ~0.28 AP@0.75 on ~5-px vehicles. Re-exporting only the GT from
the dataset annotations rescores every existing run against exact geometry
without re-running any chain/CNN.

Usage: python scripts/reexport_gt.py <model_name> [<model_name> ...]
       [--dataset DOTA_gsd50] [--subset val]
"""

import argparse
import glob
import os
import pickle
import re
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mpp_cnn_rs_object_detection_tpu.metrics.dota_eval import dota_eval  # noqa: E402
from mpp_cnn_rs_object_detection_tpu.metrics.dota_writer import (  # noqa: E402
    DOTAResultsTranslator,
)
from mpp_cnn_rs_object_detection_tpu.ops.geometry import rect_to_poly_np  # noqa: E402
from mpp_cnn_rs_object_detection_tpu.utils.config import (  # noqa: E402
    fetch_data_paths,
    get_inference_path,
)

_ID_RE = re.compile(r"[^0-9]*([0-9]+).*\.(png|pkl)")


def reexport(model_name: str, dataset: str, subset: str) -> None:
    results_dir = get_inference_path(model_name, dataset, subset)
    paths = fetch_data_paths(dataset, subset=subset, metadata=False)
    for postfix in ("", "-SV"):
        root = os.path.join(results_dir, "dota" + postfix)
        if not os.path.isdir(root):
            continue
        # det_type from the existing det lines (hbb rows have 4 coords)
        det_files = glob.glob(os.path.join(root, "det", "*.txt"))
        det_type = "obb"
        for df in det_files:
            with open(df) as f:
                first = f.readline().split()
            if first and len(first) == 6:
                det_type = "hbb"
            break
        trlt = DOTAResultsTranslator(
            dataset, subset, results_dir, det_type,
            all_classes=["vehicle"], postfix=postfix,
        )
        for af in paths["annotations"]:
            patch_id = int(_ID_RE.match(os.path.split(af)[1]).group(1))
            with open(af, "rb") as f:
                labels = pickle.load(f)
            centers = np.asarray(labels["centers"]).reshape(-1, 2)
            params = np.asarray(labels["parameters"]).reshape(-1, 3)
            difficulty = np.asarray(labels["difficult"]).reshape(-1)
            categories = np.asarray(labels["categories"]).reshape(-1)
            if postfix == "-SV":
                difficulty = [
                    bool(d) or c == "large-vehicle"
                    for d, c in zip(difficulty, categories)
                ]
            polys = rect_to_poly_np(
                centers, params[:, 0], params[:, 1], params[:, 2]
            )
            trlt.add_gt(
                image_id=patch_id, polygons=polys, difficulty=difficulty,
                categories=["vehicle"] * len(polys),
            )
        # only rewrite gt + imageSet; keep the existing det files
        with open(trlt.image_set_file, "w") as f:
            f.write("\n".join(trlt.image_set))
        print(f"re-exported GT for {model_name} dota{postfix} ({det_type})")
        dota_eval(
            model_dir=model_name, dataset=dataset, subset=subset,
            det_type=det_type, postfix=postfix,
        )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("models", nargs="+")
    ap.add_argument("--dataset", default="DOTA_gsd50")
    ap.add_argument("--subset", default="val")
    args = ap.parse_args()
    for m in args.models:
        reexport(m, args.dataset, args.subset)


if __name__ == "__main__":
    main()
