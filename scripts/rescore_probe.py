"""Offline AP probe: re-rank saved MPP detections by alternative scores and
re-evaluate with the devkit evaluator (pure CPU, uses existing artifacts)."""
import os, pickle, sys
import numpy as np
sys.path.insert(0, "/root/repo")
import jax; jax.config.update("jax_platforms", "cpu")
from mpp_cnn_rs_object_detection_tpu.metrics.dota_eval import voc_eval
from mpp_cnn_rs_object_detection_tpu.metrics.dota_writer import DOTAResultsTranslator
from mpp_cnn_rs_object_detection_tpu.ops.geometry import rect_to_poly_np

RUN = sys.argv[1] if len(sys.argv) > 1 else "mpp_log_r3"
BASE = "/root/repo/workspace/data/inference/DOTA_gsd50/val"
ANN = "/root/reference/data_sample/DOTA_gsd50/val/annotations"
IDS = [2781, 2789, 2794]
POS = ["pos_r2", "pos_quick"]

def det_map_for(iid):
    maps = []
    for p in POS:
        with open(f"{BASE}/{p}/{iid:04d}_results.pkl", "rb") as f:
            maps.append(np.asarray(pickle.load(f)["detection_map"]))
    return np.maximum.reduce(maps)

variants = {}
for iid in IDS:
    with open(f"{BASE}/{RUN}/{iid:04d}_results.pkl", "rb") as f:
        res = pickle.load(f)
    c = np.asarray(res["detection_center"], np.float32).reshape(-1, 2)
    s = np.asarray(res["detection_score"], np.float64).reshape(-1)
    dm = det_map_for(iid)
    ij = np.clip(np.round(c).astype(int), 0, np.array(dm.shape) - 1)
    mval = dm[ij[:, 0], ij[:, 1]].astype(np.float64)
    s01 = s / 4.0
    variants.setdefault("papangelou", {})[iid] = s01
    variants.setdefault("map", {})[iid] = mval
    variants.setdefault("pap_x_map", {})[iid] = s01 * mval
    variants.setdefault("pap_plus_map", {})[iid] = (s01 + mval) / 2.0
    variants.setdefault("pap_plus_2map", {})[iid] = (s01 + 2 * mval) / 3.0
    variants.setdefault("pap_plus_4map", {})[iid] = (s01 + 4 * mval) / 5.0
    variants.setdefault("map_tiebreak_pap", {})[iid] = (8 * mval + s01) / 9.0
    variants.setdefault("geo_mean", {})[iid] = np.sqrt(np.clip(s01,0,None) * mval)

for name, scores_by_img in variants.items():
    out = f"/tmp/rescore_{RUN}_{name}"
    os.system(f"rm -rf {out}")
    for sv in ("", "-SV"):
        trl = DOTAResultsTranslator("DOTA_gsd50", "val", out, "obb",
                                    ["vehicle"], postfix=sv)
        for iid in IDS:
            with open(f"{ANN}/{iid}.pkl", "rb") as f:
                ann = pickle.load(f)
            gt_c = np.asarray(ann["centers"], np.float32)
            gt_p = np.asarray(ann["parameters"], np.float32)
            gt_poly = rect_to_poly_np(gt_c, gt_p[:, 0], gt_p[:, 1], gt_p[:, 2])
            difficult = np.asarray(ann["difficult"]).reshape(-1)
            cats = np.asarray(ann["categories"]).reshape(-1)
            diff = ([bool(d) or cc == "large-vehicle" for d, cc in zip(difficult, cats)]
                    if sv else difficult)
            trl.add_gt(iid, diff, gt_poly, ["vehicle"] * len(gt_poly))
            with open(f"{BASE}/{RUN}/{iid:04d}_results.pkl", "rb") as f:
                res = pickle.load(f)
            polys = np.asarray(res["detection"])
            trl.add_detections(iid, scores_by_img[name][...] if False else scores_by_img[iid],
                               ["vehicle"] * len(polys), polygons=polys)
        trl.save()
    row = []
    for sv in ("", "-SV"):
        d = os.path.join(out, "dota" + sv)
        aps = []
        for iou in (0.25, 0.5):
            _, _, ap = voc_eval(
                os.path.join(d, "det", "{:s}.txt"),
                os.path.join(d, "gt", "{:s}.txt"),
                os.path.join(d, "imageSet.txt"),
                "vehicle", ovthresh=iou, use_07_metric=False, det_type="obb")
            aps.append(ap)
        row.append(f"{'SV' if sv else 'OB'} @0.25={aps[0]:.4f} @0.50={aps[1]:.4f}")
    print(f"{name:14s} " + "  ".join(row))
