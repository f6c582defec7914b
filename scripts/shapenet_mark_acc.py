#!/usr/bin/env python
"""Mark-prediction accuracy of a ShapeNet checkpoint on val patches.

Model-selection probe: per-mark argmax accuracy (and within-1-bin accuracy)
at GT center pixels over a val patch stack. Val cross-entropy keeps rising
with training on the 3-image sample (confidence memorisation), but AP depends
on the *argmax* marks — this measures that directly.

Usage: MPP_PLATFORM=cpu python scripts/shapenet_mark_acc.py ck1.msgpack [ck2 ...]
"""

import sys

import numpy as np

sys.path.insert(0, "/root/repo")


def main(paths):
    import jax
    import jax.numpy as jnp
    from flax.serialization import msgpack_restore

    from mpp_cnn_rs_object_detection_tpu.data.device_pipeline import (
        build_patch_stack,
    )
    from mpp_cnn_rs_object_detection_tpu.models.unet import ShapeNet
    from mpp_cnn_rs_object_detection_tpu.ops.geometry import wla_to_sra
    from mpp_cnn_rs_object_detection_tpu.ops.mappings import default_mappings

    p = 128
    stack = build_patch_stack(
        "DOTA_gsd50", "val", n_patches=256, patch_size=p,
        unf_weight=0.1, obj_weight=0.9, sigma=6.0, max_objects=208,
        rng=np.random.default_rng(7),
    )
    mappings = default_mappings(32, 0, 32)

    net = ShapeNet(hidden_dims=[32, 64, 128, 256], n_classes=32)
    imgs = jnp.asarray(stack.images, jnp.float32) / 255.0

    @jax.jit
    def fwd(variables, xb):
        outs = net.apply(variables, xb, train=False)
        return [jnp.argmax(o, axis=-1) for o in outs]

    for path in paths:
        with open(path, "rb") as f:
            raw = msgpack_restore(f.read())
        state = raw.get("params", raw)
        params = state["net"] if "net" in state else state
        bstats = raw.get("batch_stats", {})
        variables = {"params": params, "batch_stats": bstats}

        accs, near = [[], [], []], [[], [], []]
        B = 32
        for i in range(0, imgs.shape[0], B):
            am = fwd(variables, imgs[i:i + B])
            am = [np.asarray(a) for a in am]
            for k in range(am[0].shape[0]):
                j = i + k
                val = stack.valid[j]
                if not val.any():
                    continue
                cen = stack.centers[j][val].astype(int)
                inb = ((cen[:, 0] >= 0) & (cen[:, 0] < p)
                       & (cen[:, 1] >= 0) & (cen[:, 1] < p))
                cen = cen[inb]
                par = stack.params[j][val][inb]  # (n, 3) = (a, b, w)
                if not len(cen):
                    continue
                sra = np.asarray(wla_to_sra(
                    jnp.asarray(par[:, 0]), jnp.asarray(par[:, 1]),
                    jnp.asarray(par[:, 2]),
                )).T  # (n, 3) size, ratio, angle
                for m in range(3):
                    true_cls = np.clip(
                        ((sra[:, m] - mappings[m].v_min)
                         / (mappings[m].v_max - mappings[m].v_min) * 32)
                        .astype(int), 0, 31,
                    )
                    pred = am[m][k][cen[:, 0], cen[:, 1]]
                    d = np.abs(pred - true_cls)
                    if m == 2:  # cyclic angle
                        d = np.minimum(d, 32 - d)
                    accs[m].extend((d == 0).tolist())
                    near[m].extend((d <= 1).tolist())
        print(path)
        for m, nm in enumerate(["size ", "ratio", "angle"]):
            print(f"  {nm}: acc {np.mean(accs[m]):.3f}  "
                  f"within-1 {np.mean(near[m]):.3f}  (n={len(accs[m])})")


if __name__ == "__main__":
    main(sys.argv[1:])
