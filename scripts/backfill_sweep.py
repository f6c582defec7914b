"""Offline AP sweep of inference.backfill_threshold (at fixed score blend w)
on saved MPP artifacts — replicates the product blend+backfill logic from
``mpp/mpp_model.py:infer`` on CPU against existing result pickles.

Usage: python scripts/backfill_sweep.py [run_name] [blend_w]
"""
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, "/root/repo")
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from scipy.ndimage import maximum_filter  # noqa: E402
from scipy.spatial import cKDTree  # noqa: E402

from mpp_cnn_rs_object_detection_tpu.metrics.dota_eval import voc_eval  # noqa: E402
from mpp_cnn_rs_object_detection_tpu.metrics.dota_writer import (  # noqa: E402
    DOTAResultsTranslator,
)
from mpp_cnn_rs_object_detection_tpu.ops.geometry import rect_to_poly_np  # noqa: E402
from mpp_cnn_rs_object_detection_tpu.ops.mappings import ValueMapping  # noqa: E402

RUN = sys.argv[1] if len(sys.argv) > 1 else "mpp_log_r3"
BLEND_W = float(sys.argv[2]) if len(sys.argv) > 2 else 4.0
BASE = "/root/repo/workspace/data/inference/DOTA_gsd50/val"
ANN = "/root/reference/data_sample/DOTA_gsd50/val/annotations"
IDS = [2781, 2789, 2794]
POS = ["pos_r2", "pos_quick"]
SHAPE = "shape_r2"
MAX_SCORE = 4.0


def det_map_for(iid):
    maps = []
    for p in POS:
        with open(f"{BASE}/{p}/{iid:04d}_results.pkl", "rb") as f:
            maps.append(np.asarray(pickle.load(f)["detection_map"]))
    return np.maximum.reduce(maps)


def shape_maps_for(iid):
    with open(f"{BASE}/{SHAPE}/{iid:04d}_results.pkl", "rb") as f:
        res = pickle.load(f)
    # output: list of 3 x (1, C, H, W) distributions + mappings
    dists = [np.moveaxis(np.asarray(o)[0], 0, -1) for o in res["output"]]
    return dists, res["mappings"]


def build_variant(iid, bf_thr):
    """(centers, polys, scores01) after blend + backfill at bf_thr."""
    with open(f"{BASE}/{RUN}/{iid:04d}_results.pkl", "rb") as f:
        res = pickle.load(f)
    c = np.asarray(res["detection_center"], np.float32).reshape(-1, 2)
    s = np.asarray(res["detection_score"], np.float64).reshape(-1)
    marks = np.asarray(res["detection_marks"], np.float32).reshape(-1, 3)
    dm = det_map_for(iid)
    ij = np.clip(np.round(c).astype(int), 0, np.array(dm.shape) - 1)
    mval = dm[ij[:, 0], ij[:, 1]].astype(np.float64)
    s01 = (s / MAX_SCORE + BLEND_W * mval) / (1.0 + BLEND_W)

    if bf_thr > 0.0:
        peaks = (dm == maximum_filter(dm, size=5)) & (dm >= bf_thr)
        pc = np.argwhere(peaks).astype(np.float32)
        if len(pc) and len(c):
            dmin, _ = cKDTree(c).query(pc, k=1)
            pc = pc[dmin > 4.0]
        if len(pc):
            dists, mappings = shape_maps_for(iid)
            ijb = pc.astype(int)
            marks_bf = np.stack(
                [
                    m.class_to_value(
                        np.argmax(d[ijb[:, 0], ijb[:, 1]], axis=-1)
                    )
                    for m, d in zip(mappings, dists)
                ],
                axis=-1,
            ).astype(np.float32)
            s_bf = 0.2 * dm[ijb[:, 0], ijb[:, 1]] / (1.0 + BLEND_W)
            c = np.concatenate([c, pc])
            marks = np.concatenate([marks, marks_bf])
            s01 = np.concatenate([s01, s_bf])

    b_long = 2.0 * marks[:, 0] / (1.0 + marks[:, 1])
    polys = rect_to_poly_np(
        c, b_long * marks[:, 1], b_long, marks[:, 2]
    )
    return polys, s01


def eval_variant(name, bf_thr):
    out = f"/tmp/bfsweep_{RUN}_{name}"
    os.system(f"rm -rf {out}")
    per_img = {iid: build_variant(iid, bf_thr) for iid in IDS}
    rows = []
    for sv in ("", "-SV"):
        trl = DOTAResultsTranslator(
            "DOTA_gsd50", "val", out, "obb", ["vehicle"], postfix=sv
        )
        for iid in IDS:
            with open(f"{ANN}/{iid}.pkl", "rb") as f:
                ann = pickle.load(f)
            gt_c = np.asarray(ann["centers"], np.float32)
            gt_p = np.asarray(ann["parameters"], np.float32)
            gt_poly = rect_to_poly_np(
                gt_c, gt_p[:, 0], gt_p[:, 1], gt_p[:, 2]
            )
            difficult = np.asarray(ann["difficult"]).reshape(-1)
            cats = np.asarray(ann["categories"]).reshape(-1)
            diff = (
                [bool(d) or cc == "large-vehicle"
                 for d, cc in zip(difficult, cats)]
                if sv else difficult
            )
            trl.add_gt(iid, diff, gt_poly, ["vehicle"] * len(gt_poly))
            polys, s01 = per_img[iid]
            trl.add_detections(
                iid, s01, ["vehicle"] * len(polys), polygons=polys
            )
        trl.save()
        d = os.path.join(out, "dota" + sv)
        aps = []
        for iou in (0.25, 0.5):
            _, _, ap = voc_eval(
                os.path.join(d, "det", "{:s}.txt"),
                os.path.join(d, "gt", "{:s}.txt"),
                os.path.join(d, "imageSet.txt"),
                "vehicle", ovthresh=iou, use_07_metric=False,
                det_type="obb",
            )
            aps.append(ap)
        rows.append(
            f"{'SV' if sv else 'OB'} @0.25={aps[0]:.4f} @0.50={aps[1]:.4f}"
        )
    print(f"bf={name:5s} w={BLEND_W:g}  " + "  ".join(rows), flush=True)


if __name__ == "__main__":
    for thr in (0.0, 0.15, 0.2, 0.25, 0.3, 0.4):
        eval_variant(f"{thr:.2f}", thr)
