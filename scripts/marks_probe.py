"""Counterfactual marks probe: at matched detection centers, compare the
chain's marks vs shapenet posterior-MEAN marks (circular mean for angle)
vs posterior-argmax — measures whether a distribution-decoded mark set
beats the energy-optimal chain marks (guides a `marks_mode` option)."""
import pickle, sys, numpy as np
sys.path.insert(0, "/root/repo")
import jax; jax.config.update("jax_platforms", "cpu")
from mpp_cnn_rs_object_detection_tpu.metrics.polyiou import poly_iou
from mpp_cnn_rs_object_detection_tpu.ops.geometry import rect_to_poly_np, sra_to_wla

DATA = "/root/reference/data_sample/DOTA_gsd50/val"
RUN = sys.argv[1] if len(sys.argv) > 1 else "mpp_log_r8"
SHAPE = sys.argv[2] if len(sys.argv) > 2 else "shape_r2cp"
IDS = ["2781", "2789", "2794"]

def polys_of(centers, marks):
    c = np.asarray(centers, np.float32).reshape(-1, 2)
    m = np.asarray(marks, np.float32).reshape(-1, 3)
    s, l, a = sra_to_wla(m[:, 0], m[:, 1], m[:, 2])
    return np.asarray(rect_to_poly_np(c, s, l, a))

def params_to_marks(params):
    a, b, w = params[:, 0], params[:, 1], params[:, 2]
    return np.stack([(a + b) / 2.0, a / np.maximum(b, 1e-6), np.mod(w, np.pi)], -1)

ious = {k: [] for k in ["det", "pmean", "pargmax"]}
for iid in IDS:
    ann = pickle.load(open(f"{DATA}/annotations/{iid}.pkl", "rb"))
    gt_c = np.asarray(ann["centers"], np.float32)
    gt_m = params_to_marks(np.asarray(ann["parameters"], np.float32))
    res = pickle.load(open(f"/root/repo/workspace/data/inference/DOTA_gsd50/val/{RUN}/{iid}_results.pkl", "rb"))
    det_c = np.asarray(res["detection_center"], np.float32)
    det_m = np.asarray(res["detection_marks"], np.float32)
    maps = res["mappings"]
    shp = pickle.load(open(f"/root/repo/workspace/data/inference/DOTA_gsd50/val/{SHAPE}/{iid}_results.pkl", "rb"))
    dists = [np.moveaxis(p[0], 0, -1) for p in shp["output"]]  # 3 x (H,W,C)
    ij = np.clip(det_c.astype(int), 0, np.array(dists[0].shape[:2]) - 1)
    pmean, pargmax = [], []
    for i, (m, d) in enumerate(zip(maps, dists)):
        probs = d[ij[:, 0], ij[:, 1]].astype(np.float64)  # (N, C)
        cv = np.asarray(m.class_to_center_value(np.arange(probs.shape[-1]))).astype(np.float64)
        if getattr(m, "is_cyclic", False):
            z = (probs * np.exp(2j * cv)).sum(-1)
            pmean.append((np.angle(z) / 2.0) % np.pi)
        else:
            pmean.append((probs * cv).sum(-1) / np.maximum(probs.sum(-1), 1e-9))
        pargmax.append(cv[np.argmax(probs, -1)])
    pmean = np.stack(pmean, -1).astype(np.float32)
    pargmax = np.stack(pargmax, -1).astype(np.float32)
    gt_poly = polys_of(gt_c, gt_m)
    d = np.linalg.norm(gt_c[:, None, :] - det_c[None, :, :], axis=-1)
    j = d.argmin(1); dm = d[np.arange(len(gt_c)), j]
    for gi, di in enumerate(j):
        if dm[gi] >= 6: continue
        g = gt_poly[gi]
        ious["det"].append(poly_iou(polys_of(det_c[di:di+1], det_m[di:di+1])[0], g))
        ious["pmean"].append(poly_iou(polys_of(det_c[di:di+1], pmean[di:di+1])[0], g))
        ious["pargmax"].append(poly_iou(polys_of(det_c[di:di+1], pargmax[di:di+1])[0], g))
for k, v in ious.items():
    v = np.asarray(v)
    print(f"  {k:8s}: mean IoU {v.mean():.3f}  frac>=0.5 {np.mean(v>=0.5):.3f}  frac>=0.75 {np.mean(v>=0.75):.3f}")

# local 3-bin parabolic/weighted decode around the mode (sub-bin offset
# without the global-mean blur over multimodal distributions)
ious2 = {"local3": []}
for iid in IDS:
    ann = pickle.load(open(f"{DATA}/annotations/{iid}.pkl", "rb"))
    gt_c = np.asarray(ann["centers"], np.float32)
    gt_m = params_to_marks(np.asarray(ann["parameters"], np.float32))
    res = pickle.load(open(f"/root/repo/workspace/data/inference/DOTA_gsd50/val/{RUN}/{iid}_results.pkl", "rb"))
    det_c = np.asarray(res["detection_center"], np.float32)
    maps = res["mappings"]
    shp = pickle.load(open(f"/root/repo/workspace/data/inference/DOTA_gsd50/val/{SHAPE}/{iid}_results.pkl", "rb"))
    dists = [np.moveaxis(p[0], 0, -1) for p in shp["output"]]
    ij = np.clip(det_c.astype(int), 0, np.array(dists[0].shape[:2]) - 1)
    loc3 = []
    for i, (m, d) in enumerate(zip(maps, dists)):
        probs = d[ij[:, 0], ij[:, 1]].astype(np.float64)
        C = probs.shape[-1]
        cv = np.asarray(m.class_to_center_value(np.arange(C))).astype(np.float64)
        step = (m.v_max - m.v_min) / C
        k = np.argmax(probs, -1)
        if getattr(m, "is_cyclic", False):
            km, kp = (k - 1) % C, (k + 1) % C
        else:
            km, kp = np.maximum(k - 1, 0), np.minimum(k + 1, C - 1)
        n = np.arange(len(k))
        pm_, p0, pp = probs[n, km], probs[n, k], probs[n, kp]
        off = (pp - pm_) / np.maximum(pm_ + p0 + pp, 1e-9)  # in [-1, 1]
        val = cv[k] + off * step
        if getattr(m, "is_cyclic", False):
            val = np.mod(val, np.pi)
        loc3.append(val)
    loc3 = np.stack(loc3, -1).astype(np.float32)
    gt_poly = polys_of(gt_c, gt_m)
    d = np.linalg.norm(gt_c[:, None, :] - det_c[None, :, :], axis=-1)
    j = d.argmin(1); dm = d[np.arange(len(gt_c)), j]
    for gi, di in enumerate(j):
        if dm[gi] >= 6: continue
        ious2["local3"].append(poly_iou(polys_of(det_c[di:di+1], loc3[di:di+1])[0], gt_poly[gi]))
for k, v in ious2.items():
    v = np.asarray(v)
    print(f"  {k:8s}: mean IoU {v.mean():.3f}  frac>=0.5 {np.mean(v>=0.5):.3f}  frac>=0.75 {np.mean(v>=0.75):.3f}")
