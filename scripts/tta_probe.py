"""Does dihedral TTA lift posnet map recall? CPU probe on crops of the val
images around dense GT."""
import json, pickle, sys, numpy as np
sys.path.insert(0, "/root/repo")
import jax; jax.config.update("jax_platforms", "cpu")
from mpp_cnn_rs_object_detection_tpu.models.posnet_model import PosNetModel
import imageio.v2 as imageio

cfg = json.load(open("workspace/models_storage/posnet/pos_r2/config.json"))
model = PosNetModel(cfg, load=True)

def det_map(img):
    mask, vec = model.infer_on_image(img)
    return model.vec2detection_map(vec, mask)

def tta_maps(img):
    """yield (map, name) for 8 dihedral transforms, inverse-applied."""
    for k in range(4):
        for flip in (False, True):
            t = np.rot90(img, k, axes=(0, 1))
            if flip: t = t[:, ::-1]
            m = det_map(np.ascontiguousarray(t))
            if flip: m = m[:, ::-1]
            m = np.rot90(m, -k, axes=(0, 1))
            yield m, f"rot{k*90}{'f' if flip else ''}"

for iid, (y0, x0) in [("2781", (80, 300)), ("2794", (300, 300))]:
    ann = pickle.load(open(f"/root/reference/data_sample/DOTA_gsd50/val/annotations/{iid}.pkl","rb"))
    img = imageio.imread(f"/root/reference/data_sample/DOTA_gsd50/val/images/{iid}.png")[..., :3].astype(np.float32)/255.
    H = W = 256
    crop = img[y0:y0+H, x0:x0+W]
    gt = np.asarray(ann["centers"], np.float32)
    sel = (gt[:,0]>=y0+4)&(gt[:,0]<y0+H-4)&(gt[:,1]>=x0+4)&(gt[:,1]<x0+W-4)
    g = gt[sel] - np.array([y0, x0])
    ij = np.round(g).astype(int)
    def cov(dm):
        loc = np.asarray([dm[max(0,i-3):i+4, max(0,j-3):j+4].max() for i,j in ij])
        return (loc>0.6465).mean()
    acc = None
    print(f"== {iid} crop GT={len(g)}")
    for m, name in tta_maps(crop):
        acc = m if acc is None else np.maximum(acc, m)
        print(f"  {name}: cov {cov(m):.2f}  union-so-far {cov(acc):.2f}")
