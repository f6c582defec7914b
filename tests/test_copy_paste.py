"""Copy-paste augmentation: geometry, collisions, label conventions."""

import numpy as np
import pytest

from mpp_cnn_rs_object_detection_tpu.data.copy_paste import (
    PasteObject,
    _abw_poly,
    _quad_intersects,
    build_paste_bank,
    paste_objects,
)
from mpp_cnn_rs_object_detection_tpu.data.label_processing import rect_mask


def _bright_rect_image(h, w, center, a, b, angle):
    img = np.zeros((h, w, 3), np.float32)
    img[rect_mask((h, w), center, a, b, angle)] = 1.0
    return img


def test_abw_poly_matches_rect_mask():
    """The collision polygon and the pixel mask describe the same rect."""
    c, a, b, t = (30.0, 40.0), 8.0, 18.0, 0.7
    mask = rect_mask((64, 80), c, a, b, t)
    poly = _abw_poly(c, a, b, t)
    ys, xs = np.nonzero(mask)
    # every mask pixel center lies inside the (slightly inflated) polygon
    big = _abw_poly(c, a + 2.1, b + 2.1, t)
    for p in np.stack([ys, xs], -1)[:: max(1, len(ys) // 50)]:
        assert _quad_intersects(
            big, np.asarray([p, p + [0, 1e-3], p + [1e-3, 1e-3], p + [1e-3, 0]])
        )
    # polygon extents match the mask's bounding box to ~1px
    np.testing.assert_allclose(
        [poly[:, 0].min(), poly[:, 0].max(), poly[:, 1].min(), poly[:, 1].max()],
        [ys.min(), ys.max(), xs.min(), xs.max()], atol=1.5,
    )


def test_quad_intersects():
    a = _abw_poly((10.0, 10.0), 6.0, 6.0, 0.0)
    assert _quad_intersects(a, _abw_poly((12.0, 12.0), 6.0, 6.0, 0.5))
    assert not _quad_intersects(a, _abw_poly((30.0, 30.0), 6.0, 6.0, 0.5))


@pytest.mark.parametrize("src_angle", [0.0, 0.4, 1.2])
def test_pasted_pixels_match_annotation(src_angle, tmp_path):
    """End-to-end sign check: harvest a bright rect, paste it, and verify the
    pasted bright pixels coincide with rect_mask at the APPENDED annotation's
    (center, a, b, angle) — pins the cv2 rotation-direction convention."""
    import pickle

    from PIL import Image

    a, b = 8.0, 18.0
    img = _bright_rect_image(96, 96, (48.0, 48.0), a, b, src_angle)
    ipath, apath = tmp_path / "0000.png", tmp_path / "0000.pkl"
    Image.fromarray((img * 255).astype(np.uint8)).save(ipath)
    with open(apath, "wb") as f:
        pickle.dump(
            {"centers": np.array([[48.0, 48.0]]),
             "parameters": np.array([[a, b, src_angle]]),
             "categories": np.array([0]),
             "difficult": np.array([False])}, f,
        )
    bank = build_paste_bank([str(ipath)], [str(apath)])
    assert len(bank) == 1

    hits = 0
    for seed in range(6):
        rng = np.random.default_rng(seed)
        patch = np.zeros((128, 128, 3), np.float32)
        out, c2, p2, k2, d2 = paste_objects(
            patch, np.zeros((0, 2)), np.zeros((0, 3)), np.zeros(0, np.int64),
            np.zeros(0, bool), bank, rng, n_paste=1,
        )
        if len(c2) == 0:
            continue
        hits += 1
        (cy, cx), (pa, pb, pt) = c2[0], p2[0]
        inside = rect_mask((128, 128), (cy, cx), pa - 2, pb - 2, pt)
        outside = ~rect_mask((128, 128), (cy, cx), pa + 8, pb + 8, pt)
        assert out[inside].mean() > 0.75, (
            f"pasted content not at annotated pose (seed {seed}): "
            f"inside-mean {out[inside].mean():.2f}"
        )
        assert out[outside].max() < 0.2
        assert not d2[-1] and k2[-1] == 0
    assert hits >= 4  # empty 128px patch: placement must usually succeed


def test_paste_avoids_existing_objects():
    rng = np.random.default_rng(0)
    bank = [PasteObject(crop=np.ones((20, 20, 3), np.float32), a=6.0, b=10.0,
                        angle=0.3, category=1)]
    # one existing GT in the middle
    centers = np.array([[32.0, 32.0]])
    params = np.array([[10.0, 20.0, 0.1]])
    out, c2, p2, k2, d2 = paste_objects(
        np.zeros((64, 64, 3), np.float32), centers, params,
        np.array([0]), np.array([False]), bank, rng, n_paste=8,
    )
    # originals preserved, pastes appended
    np.testing.assert_allclose(c2[0], centers[0])
    gt_poly = _abw_poly(centers[0], 1.25 * 10, 1.25 * 20, 0.1)
    for c, (pa, pb, pt) in zip(c2[1:], p2[1:]):
        assert not _quad_intersects(_abw_poly(c, pa, pb, pt), gt_poly)
    # pasted objects also avoid each other
    polys = [_abw_poly(c, pa, pb, pt) for c, (pa, pb, pt) in zip(c2[1:], p2[1:])]
    for i in range(len(polys)):
        for j in range(i + 1, len(polys)):
            assert not _quad_intersects(polys[i], polys[j])


def test_string_categories_roundtrip(tmp_path):
    """Real DOTA pickles store categories as strings ('small-vehicle');
    the bank and pasted annotations must keep them opaque (regression:
    int(cat) crashed the flagship copy-paste run on real data)."""
    import pickle

    from PIL import Image

    a, b = 8.0, 18.0
    img = _bright_rect_image(96, 96, (48.0, 48.0), a, b, 0.4)
    ipath, apath = tmp_path / "0000.png", tmp_path / "0000.pkl"
    Image.fromarray((img * 255).astype(np.uint8)).save(ipath)
    with open(apath, "wb") as f:
        pickle.dump(
            {"centers": np.array([[48.0, 48.0]]),
             "parameters": np.array([[a, b, 0.4]]),
             "categories": np.array(["small-vehicle"]),
             "difficult": np.array([False])}, f,
        )
    bank = build_paste_bank([str(ipath)], [str(apath)])
    assert len(bank) == 1 and bank[0].category == "small-vehicle"
    out, c2, p2, k2, d2 = paste_objects(
        np.zeros((128, 128, 3), np.float32),
        np.array([[20.0, 20.0]]), np.array([[6.0, 12.0, 0.1]]),
        np.array(["large-vehicle"]), np.array([False]),
        bank, np.random.default_rng(0), n_paste=2,
    )
    assert k2[0] == "large-vehicle"
    assert all(k == "small-vehicle" for k in k2[1:])
    assert len(k2) == len(c2) == len(p2) == len(d2)


def test_make_patch_dataset_with_copy_paste(tmp_path, monkeypatch):
    """Config-plumbed path: patches written with extra pasted annotations."""
    import json
    import os
    import pickle

    from PIL import Image

    from mpp_cnn_rs_object_detection_tpu.data.patch_making import (
        make_patch_dataset,
    )

    data_root = tmp_path / "datasets"
    src = data_root / "src" / "train"
    for d in ("images", "annotations", "metadata"):
        os.makedirs(src / d)
    with open(tmp_path / "paths_config.json", "w") as f:
        json.dump({"dataset_path": [str(data_root)],
                   "model_path": [str(tmp_path)]}, f)
    monkeypatch.chdir(tmp_path)
    rng = np.random.default_rng(0)
    img = rng.uniform(0.2, 0.4, (96, 96, 3)).astype(np.float32)
    img[rect_mask((96, 96), (40.0, 40.0), 8.0, 16.0, 0.5)] = 0.9
    Image.fromarray((img * 255).astype(np.uint8)).save(
        src / "images" / "0000.png"
    )
    with open(src / "annotations" / "0000.pkl", "wb") as f:
        pickle.dump(
            {"centers": np.array([[40.0, 40.0]]),
             "parameters": np.array([[8.0, 16.0, 0.5]]),
             "categories": np.array([0]),
             "difficult": np.array([False])}, f,
        )
    with open(src / "metadata" / "0000.json", "w") as f:
        json.dump({"shape": [96, 96, 3], "n_objects": 1}, f)

    config = {"data_loader": {"patch_maker_params": {
        "n_patches": 12, "patch_size": 48,
        "unf_sampler_weight": 1, "obj_sampler_weight": 1,
        "copy_paste": {"p": 1.0, "n_range": [2, 3]},
    }}}
    make_patch_dataset("patched", "src", config,
                       np.random.default_rng(1), multiprocess=False)
    ann_dir = data_root / "patched" / "train" / "annotations"
    n_objs = []
    for fn in os.listdir(ann_dir):
        with open(ann_dir / fn, "rb") as f:
            n_objs.append(len(pickle.load(f)["centers"]))
    # pasting must have added objects beyond the single source GT per patch
    assert sum(n_objs) > len(n_objs)


def test_build_patch_stack_with_copy_paste(tmp_path, monkeypatch):
    """Device-pipeline path: stacks gain pasted objects and stay in capacity."""
    import json
    import os
    import pickle

    from PIL import Image

    from mpp_cnn_rs_object_detection_tpu.data.device_pipeline import (
        build_patch_stack,
    )

    data_root = tmp_path / "datasets"
    src = data_root / "src" / "train"
    for d in ("images", "annotations", "metadata"):
        os.makedirs(src / d)
    with open(tmp_path / "paths_config.json", "w") as f:
        json.dump({"dataset_path": [str(data_root)],
                   "model_path": [str(tmp_path)]}, f)
    monkeypatch.chdir(tmp_path)

    rng = np.random.default_rng(0)
    img = rng.uniform(0.2, 0.4, (96, 96, 3)).astype(np.float32)
    img[rect_mask((96, 96), (40.0, 40.0), 8.0, 16.0, 0.5)] = 0.9
    Image.fromarray((img * 255).astype(np.uint8)).save(
        src / "images" / "0000.png"
    )
    with open(src / "annotations" / "0000.pkl", "wb") as f:
        pickle.dump(
            {"centers": np.array([[40.0, 40.0]]),
             "parameters": np.array([[8.0, 16.0, 0.5]]),
             "categories": np.array([0]),
             "difficult": np.array([False])}, f,
        )
    with open(src / "metadata" / "0000.json", "w") as f:
        json.dump({"shape": [96, 96, 3], "n_objects": 1}, f)

    common = dict(patch_size=48, rng=np.random.default_rng(1), max_objects=8)
    plain = build_patch_stack("src", "train", n_patches=10, **common)
    common["rng"] = np.random.default_rng(1)
    pasted = build_patch_stack(
        "src", "train", n_patches=10,
        copy_paste={"p": 1.0, "n_range": [2, 3]}, **common
    )
    assert pasted.valid.sum() > plain.valid.sum()
    assert pasted.valid.shape == (10, 8)
    # pasted params stay in the source object's scale range
    pv = pasted.params[pasted.valid]
    assert np.all(pv[:, 0] > 0) and np.all(pv[:, 1] <= 16.0 * 1.15 + 1e-6)


def test_quad_intersects_any_matches_pairwise():
    """Batched SAT == per-pair SAT on random rotated quads."""
    import numpy as np

    from mpp_cnn_rs_object_detection_tpu.data.copy_paste import (
        _quad_intersects_any,
    )

    rng = np.random.default_rng(7)
    for _ in range(50):
        p = _abw_poly(rng.uniform(0, 40, 2), rng.uniform(2, 12),
                      rng.uniform(2, 12), rng.uniform(0, np.pi))
        qs = np.stack([
            _abw_poly(rng.uniform(0, 40, 2), rng.uniform(2, 12),
                      rng.uniform(2, 12), rng.uniform(0, np.pi))
            for _ in range(rng.integers(1, 20))
        ])
        expected = any(_quad_intersects(p, q) for q in qs)
        assert _quad_intersects_any(p, qs) == expected
    assert not _quad_intersects_any(p, np.zeros((0, 4, 2)))
