"""Where does recall die? Compare GT coverage of (a) posnet detection-map
peaks, (b) MPP detections, per val image."""
import pickle, sys, numpy as np
sys.path.insert(0, "/root/repo")
import jax; jax.config.update("jax_platforms", "cpu")

DATA = "/root/reference/data_sample/DOTA_gsd50/val"
POS = sys.argv[1] if len(sys.argv) > 1 else "pos_r2"
MPP = sys.argv[2] if len(sys.argv) > 2 else "mpp_log_r2"
IDS = ["2781", "2789", "2794"]
for iid in IDS:
    ann = pickle.load(open(f"{DATA}/annotations/{iid}.pkl", "rb"))
    gt_c = np.asarray(ann["centers"], np.float32)
    pos = pickle.load(open(f"/root/repo/workspace/data/inference/DOTA_gsd50/val/{POS}/{iid}_results.pkl", "rb"))
    det_map = np.asarray(pos["detection"] if pos.get("detection_type") != "point" else pos["detection"])
    keys = list(pos.keys())
    dm = pos.get("detection")
    # detection map value AT each GT center (rounded)
    if dm is not None and dm.ndim == 2:
        ij = np.clip(np.round(gt_c).astype(int), 0, np.array(dm.shape) - 1)
        vals = dm[ij[:, 0], ij[:, 1]]
        # local max within 3px window
        win = 3
        loc = [dm[max(0,i-win):i+win+1, max(0,j-win):j+win+1].max() for i, j in ij]
        loc = np.asarray(loc)
        print(f"{iid}: GT={len(gt_c)} map>0.2 near GT: {np.mean(loc>0.2):.2f}  >0.5: {np.mean(loc>0.5):.2f}  >0.6465: {np.mean(loc>0.6465):.2f}")
    else:
        print(iid, "keys", keys, "det type", pos.get("detection_type"))
    mp = pickle.load(open(f"/root/repo/workspace/data/inference/DOTA_gsd50/val/{MPP}/{iid}_results.pkl", "rb"))
    det_c = np.asarray(mp["detection_center"], np.float32)
    d = np.linalg.norm(gt_c[:, None, :] - det_c[None, :, :], axis=-1).min(1) if len(det_c) else np.full(len(gt_c), 1e9)
    print(f"       MPP dets={len(det_c)}  GT matched<3px {np.mean(d<3):.2f}  <6px {np.mean(d<6):.2f}")
