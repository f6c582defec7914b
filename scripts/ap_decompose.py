"""Decompose the AP@0.5 gap: position error vs mark error vs bin quantization.

Matches each val GT rectangle to the nearest detection center and reports
IoU under counterfactual substitutions (GT marks at detected centers, etc.).
Runs on CPU; uses the repo's own polyiou + geometry.
"""
import pickle, sys, numpy as np
sys.path.insert(0, "/root/repo")
import jax; jax.config.update("jax_platforms", "cpu")
from mpp_cnn_rs_object_detection_tpu.metrics.polyiou import poly_iou
from mpp_cnn_rs_object_detection_tpu.ops.geometry import rect_to_poly_np, sra_to_wla
from mpp_cnn_rs_object_detection_tpu.ops.mappings import ValueMapping

DATA = "/root/reference/data_sample/DOTA_gsd50/val"
RUN = sys.argv[1] if len(sys.argv) > 1 else "mpp_log_r2"
IDS = ["2781", "2789", "2794"]

def polys_of(centers, marks):
    # marks = (size, ratio, angle) -> (short, long, angle) -> poly
    c = np.asarray(centers, np.float32).reshape(-1, 2)
    m = np.asarray(marks, np.float32).reshape(-1, 3)
    s, l, a = sra_to_wla(m[:, 0], m[:, 1], m[:, 2])
    return np.asarray(rect_to_poly_np(c, s, l, a))

def params_to_marks(params):
    a, b, w = params[:, 0], params[:, 1], params[:, 2]
    return np.stack([(a + b) / 2.0, a / np.maximum(b, 1e-6), np.mod(w, np.pi)], -1)

tot = dict(n=0, found3=0, found6=0)
ious = {k: [] for k in ["det", "pos_only", "marks_only", "quant_gt", "quant16_gt"]}
for iid in IDS:
    ann = pickle.load(open(f"{DATA}/annotations/{iid}.pkl", "rb"))
    gt_c = np.asarray(ann["centers"], np.float32)
    gt_p = np.asarray(ann["parameters"], np.float32)
    gt_m = params_to_marks(gt_p)
    res = pickle.load(open(f"/root/repo/workspace/data/inference/DOTA_gsd50/val/{RUN}/{iid}_results.pkl", "rb"))
    det_c = np.asarray(res["detection_center"], np.float32)
    det_m = np.asarray(res["detection_marks"], np.float32)
    maps = res["mappings"]
    gt_poly = polys_of(gt_c, gt_m)
    det_poly = polys_of(det_c, det_m)
    # bin-quantized GT marks (32 bins, the shapenet resolution)
    qm = np.stack([np.asarray(m.class_to_value(m.value_to_class(gt_m[:, i])))
                   for i, m in enumerate(maps)], -1)
    q_poly = polys_of(gt_c, qm)
    # 16-bin quantization for comparison
    q16 = []
    for i, m in enumerate(maps):
        m2 = ValueMapping(n_classes=16, v_min=m.v_min, v_max=m.v_max, is_cyclic=m.is_cyclic)
        q16.append(np.asarray(m2.class_to_value(m2.value_to_class(gt_m[:, i]))))
    q16_poly = polys_of(gt_c, np.stack(q16, -1))
    d = np.linalg.norm(gt_c[:, None, :] - det_c[None, :, :], axis=-1)
    j = d.argmin(1)
    dm = d[np.arange(len(gt_c)), j]
    tot["n"] += len(gt_c); tot["found3"] += int((dm < 3).sum()); tot["found6"] += int((dm < 6).sum())
    for gi, di in enumerate(j):
        if dm[gi] >= 6: continue
        g = gt_poly[gi]
        ious["det"].append(poly_iou(det_poly[di], g))
        ious["pos_only"].append(poly_iou(polys_of(det_c[di:di+1], gt_m[gi:gi+1])[0], g))
        ious["marks_only"].append(poly_iou(polys_of(gt_c[gi:gi+1], det_m[di:di+1])[0], g))
        ious["quant_gt"].append(poly_iou(q_poly[gi], g))
        ious["quant16_gt"].append(poly_iou(q16_poly[gi], g))

print(f"run={RUN} GT n={tot['n']} matched<3px={tot['found3']} <6px={tot['found6']}")
for k, v in ious.items():
    v = np.asarray(v)
    if not len(v): continue
    print(f"  {k:11s}: mean IoU {v.mean():.3f}  frac>=0.5 {np.mean(v>=0.5):.3f}  frac>=0.75 {np.mean(v>=0.75):.3f}")
