#!/usr/bin/env python
"""Diagnose the shapenet ratio-mark failure (round-5, VERDICT r4 item 5).

Questions:
  1. Does the model beat predicting the train-split modal bin (a prior)?
  2. Is there a systematic signed bias per mark (like the documented -5%
     size bias of the reference's left-edge decode)?
  3. How concentrated is the GT bin distribution per mark?

Usage: MPP_PLATFORM=cpu python scripts/ratio_diag.py ck.msgpack
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
    mappings = default_mappings(32, 0, 32)

    def collect(subset, seed):
        stack = build_patch_stack(
            "DOTA_gsd50", subset, n_patches=256, patch_size=p,
            unf_weight=0.1, obj_weight=0.9, sigma=6.0, max_objects=208,
            rng=np.random.default_rng(seed),
        )
        rows = []  # (patch_idx, cy, cx, cls_size, cls_ratio, cls_angle)
        for j in range(stack.images.shape[0]):
            val = stack.valid[j]
            if not val.any():
                continue
            cen = stack.centers[j][val].astype(int)
            inb = ((cen[:, 0] >= 0) & (cen[:, 0] < p)
                   & (cen[:, 1] >= 0) & (cen[:, 1] < p))
            cen = cen[inb]
            par = stack.params[j][val][inb]
            if not len(cen):
                continue
            sra = np.asarray(wla_to_sra(
                jnp.asarray(par[:, 0]), jnp.asarray(par[:, 1]),
                jnp.asarray(par[:, 2]))).T
            cls = np.stack([
                np.clip(((sra[:, m] - mappings[m].v_min)
                         / (mappings[m].v_max - mappings[m].v_min) * 32)
                        .astype(int), 0, 31)
                for m in range(3)
            ], -1)
            for c, k in zip(cen, cls):
                rows.append((j, c[0], c[1], k[0], k[1], k[2]))
        return stack, np.asarray(rows)

    train_stack, train_rows = collect("train", 3)
    val_stack, val_rows = collect("val", 7)
    names = ["size ", "ratio", "angle"]
    print("GT bin concentration (train):")
    modal = []
    for m in range(3):
        cnt = np.bincount(train_rows[:, 3 + m], minlength=32)
        top = np.argsort(cnt)[::-1][:3]
        modal.append(top[0])
        print(f"  {names[m]}: modal bin {top[0]} "
              f"({cnt[top[0]] / cnt.sum():.3f}), top3 share "
              f"{cnt[top].sum() / cnt.sum():.3f}")
    print("prior (train-modal) accuracy on val:")
    for m in range(3):
        d = np.abs(val_rows[:, 3 + m] - modal[m])
        if m == 2:
            d = np.minimum(d, 32 - d)
        print(f"  {names[m]}: acc {(d == 0).mean():.3f} "
              f"within-1 {(d <= 1).mean():.3f}")

    if not paths:
        return
    net = ShapeNet(hidden_dims=[32, 64, 128, 256], n_classes=32)
    with open(paths[0], "rb") as f:
        raw = msgpack_restore(f.read())
    state = raw.get("params", raw)
    params = state["net"] if "net" in state else state
    variables = {"params": params, "batch_stats": raw.get("batch_stats", {})}
    imgs = jnp.asarray(val_stack.images, jnp.float32) / 255.0

    @jax.jit
    def fwd(xb):
        outs = net.apply(variables, xb, train=False)
        return [jnp.argmax(o, axis=-1) for o in outs]

    preds = {m: [] for m in range(3)}
    trues = {m: [] for m in range(3)}
    B = 32
    am_all = []
    for i in range(0, imgs.shape[0], B):
        am_all.append([np.asarray(a) for a in fwd(imgs[i:i + B])])
    for (j, cy, cx, k0, k1, k2) in val_rows:
        blk, off = divmod(j, B)
        for m, k in enumerate((k0, k1, k2)):
            preds[m].append(am_all[blk][m][off, cy, cx])
            trues[m].append(k)
    print(f"model ({paths[0]}) on val, signed bin error:")
    for m in range(3):
        pr, tr = np.asarray(preds[m]), np.asarray(trues[m])
        err = pr.astype(int) - tr.astype(int)
        if m == 2:
            err = (err + 16) % 32 - 16
        print(f"  {names[m]}: mean {err.mean():+.2f} median "
              f"{np.median(err):+.1f} |err| {np.abs(err).mean():.2f} "
              f"acc {(err == 0).mean():.3f}")


if __name__ == "__main__":
    main(sys.argv[1:])
