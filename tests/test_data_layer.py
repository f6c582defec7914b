"""Tests for label processing, augmentation geometry, synth data and patch pipeline."""

import json
import os
import pickle

import cv2
import numpy as np
import pytest
from scipy.ndimage import distance_transform_edt

from mpp_cnn_rs_object_detection_tpu.data.augmentation import (
    DataAugment,
    flip_points,
    rot90_points,
)
from mpp_cnn_rs_object_detection_tpu.data.dataset import (
    BatchLoader,
    ImageDataset,
    extract_patch,
)
from mpp_cnn_rs_object_detection_tpu.data.label_processing import (
    PosLabelProcessor,
    ShapeLabelProcessor,
    nearest_center_fields,
    rect_mask,
)
from mpp_cnn_rs_object_detection_tpu.data.patch_making import make_patch_dataset
from mpp_cnn_rs_object_detection_tpu.data.synth import make_synth, make_synth_dataset
from mpp_cnn_rs_object_detection_tpu.ops.geometry import rect_to_poly
from mpp_cnn_rs_object_detection_tpu.ops.mappings import default_mappings


def test_nearest_center_distance_matches_edt():
    rng = np.random.default_rng(0)
    centers = rng.integers(0, 64, (10, 2))
    bin_map = np.zeros((64, 64))
    bin_map[centers[:, 0], centers[:, 1]] = 1
    ref_dist = distance_transform_edt(1 - bin_map)
    idx, dist = nearest_center_fields((64, 64), centers)
    np.testing.assert_allclose(dist, ref_dist, atol=1e-9)
    # index really is the nearest center
    gy, gx = np.mgrid[:64, :64]
    d_all = np.sqrt(
        (gy[..., None] - centers[:, 0]) ** 2 + (gx[..., None] - centers[:, 1]) ** 2
    )
    np.testing.assert_allclose(dist, np.min(d_all, axis=-1))


def test_pos_label_processor_uvec():
    patch = np.zeros((32, 32, 3), dtype=np.float32)
    centers = np.array([[10, 10], [25, 5]])
    params = np.array([[4.0, 8.0, 0.3], [3.0, 6.0, 1.0]])
    proc = PosLabelProcessor(max_distance=8, mode="uvec")
    x, y = proc.process(patch, centers, params, 0)
    vec = y["pointing_map"]
    assert vec.shape == (32, 32, 2)
    # at a pixel near a center, the vector points at the center with unit norm
    p = (12, 10)
    expected = (centers[0] - np.array(p)).astype(float)
    expected /= np.linalg.norm(expected)
    np.testing.assert_allclose(vec[p], expected, atol=1e-5)
    # mask: 1 within max_distance, 0 outside
    assert y["mask"][10, 10] == 1
    assert y["mask"][10, 17] == 1  # dist 7 < 8
    assert y["mask"][0, 31] == 0
    # vectors zeroed outside mask
    assert np.all(vec[y["mask"] == 0] == 0)
    assert y["center_binary_map"][10, 10] and y["center_binary_map"].sum() == 2


def test_pos_label_processor_empty():
    patch = np.zeros((16, 16, 3), dtype=np.float32)
    proc = PosLabelProcessor(max_distance=8, mode="uvec")
    _, y = proc.process(patch, np.array([]), np.array([]), 0)
    assert np.all(y["pointing_map"] == 0)
    assert np.all(y["mask"] == 0)  # no valid region


def test_rect_mask_matches_cv2_rasterisation():
    rng = np.random.default_rng(1)
    for _ in range(20):
        c = rng.uniform(10, 50, 2)
        a = rng.uniform(3, 10)
        b = a + rng.uniform(1, 10)
        w = rng.uniform(0, np.pi)
        ours = rect_mask((64, 64), c, a, b, w)
        poly = np.asarray(rect_to_poly(c, a, b, w))  # (4,2) in (row, col)
        golden = np.zeros((64, 64), dtype=np.uint8)
        cv2.fillPoly(golden, [poly[:, ::-1].round().astype(np.int32)], 1)
        # rasterisations differ at edges only
        disagreement = np.mean(ours != golden.astype(bool))
        assert disagreement < 0.02, disagreement


def test_shape_label_processor_shapes_mode():
    maps = default_mappings()
    patch = np.zeros((64, 64, 3), dtype=np.float32)
    centers = np.array([[30, 30]])
    params = np.array([[4.0, 10.0, 0.5]])  # a, b, w
    proc = ShapeLabelProcessor(mappings=maps, mask_mode="shapes")
    _, y = proc.process(patch, centers, params, 0)
    s = (4.0 + 10.0) / 2
    r = 4.0 / 10.0
    assert y["value_class_map"][0][30, 30] == maps[0].value_to_class(s)
    assert y["value_class_map"][1][30, 30] == maps[1].value_to_class(r)
    assert y["value_class_map"][2][30, 30] == maps[2].value_to_class(0.5)
    np.testing.assert_allclose(y["loss_mask"].sum(), 1.0, rtol=1e-5)
    assert y["loss_mask"][30, 30] > 0
    assert y["loss_mask"][0, 0] == 0


def test_rot90_points_follow_image():
    img = np.zeros((20, 30))
    pt = np.array([[3, 7]])
    img[3, 7] = 1
    for k in range(4):
        rot = np.rot90(img, k)
        new_pt, _ = rot90_points(pt, np.array([0.4]), img.shape, k)
        r, c = new_pt[0].astype(int)
        assert rot[r, c] == 1, (k, new_pt)


def test_flip_points_follow_image():
    img = np.zeros((20, 30))
    img[3, 7] = 1
    for axis in (0, 1):
        flipped = np.flip(img, axis)
        new_pt, _ = flip_points(np.array([[3, 7]]), np.array([0.4]), img.shape, axis)
        r, c = new_pt[0].astype(int)
        assert flipped[r, c] == 1


def test_rot90_angle_consistency_via_mask():
    # rotate image with a painted rectangle; repaint with transformed marks
    shape = (40, 40)
    c = np.array([[17.0, 23.0]])
    a, b, w = 5.0, 12.0, 0.7
    mask_img = rect_mask(shape, c[0], a, b, w).astype(float)
    rot = np.rot90(mask_img, 1)
    new_c, new_w = rot90_points(c, np.array([w]), shape, 1)
    repainted = rect_mask(rot.shape, new_c[0], a, b, new_w[0]).astype(float)
    agreement = np.mean((rot > 0.5) == (repainted > 0.5))
    assert agreement > 0.98, agreement


def test_extract_patch_border_padding():
    img = np.arange(100 * 80 * 3, dtype=float).reshape(100, 80, 3)
    patch, tl, off = extract_patch(img, np.array([2, 2]), 32)
    assert patch.shape == (32, 32, 3)
    # center pixel value preserved
    r = 2 - tl[0] + off[0]
    c = 2 - tl[1] + off[1]
    np.testing.assert_allclose(patch[r, c], img[2, 2])


@pytest.fixture
def synth_env(tmp_path, monkeypatch):
    data_root = tmp_path / "datasets"
    data_root.mkdir()
    (tmp_path / "models").mkdir()
    with open(tmp_path / "paths_config.json", "w") as f:
        json.dump(
            {"dataset_path": [str(data_root)], "model_path": [str(tmp_path / "models")]},
            f,
        )
    monkeypatch.chdir(tmp_path)
    make_synth_dataset(name="synthtest", n_items=3, shape=(96, 96), n_rect=30, seed=0)
    return tmp_path


def test_synth_dataset_format_and_pipeline(synth_env):
    root = synth_env / "datasets" / "synthtest"
    assert sorted(os.listdir(root)) == ["train", "val"]
    with open(root / "train" / "annotations" / "0000.pkl", "rb") as f:
        ann = pickle.load(f)
    assert set(ann.keys()) == {"centers", "parameters", "categories", "difficult"}
    assert ann["parameters"].shape[1] == 3
    assert np.all(ann["parameters"][:, 0] <= ann["parameters"][:, 1])  # a <= b

    # patch making + dataset + loader end to end
    config = {
        "data_loader": {
            "patch_maker_params": {
                "patch_size": 32,
                "n_patches": 8,
                "unf_sampler_weight": 0.5,
                "obj_sampler_weight": 0.5,
                "obj_sampler_sigma": 2,
            }
        }
    }
    rng = np.random.default_rng(0)
    make_patch_dataset(
        new_dataset="patches", source_dataset="synthtest", config=config, rng=rng,
        make_val=True, multiprocess=False,
    )
    ds = ImageDataset(
        dataset="patches", subset="train", rng=rng,
        label_processor=PosLabelProcessor(max_distance=8, mode="uvec"),
        augmenter=DataAugment(rng=rng, dataset="patches", subset="train",
                              aug_level="medium"),
    )
    assert len(ds) == 8
    loader = BatchLoader(ds, batch_size=4, rng=rng, num_workers=2)
    batches = list(loader)
    assert len(batches) == 2
    x, y = batches[0]
    assert x.shape == (4, 32, 32, 3)
    assert y["pointing_map"].shape == (4, 32, 32, 2)
    assert x.dtype == np.float32


def test_make_synth_rectangles_disjoint():
    rng = np.random.default_rng(5)
    _, rects, polys = make_synth(rng, (64, 64), 40, noise=0.01)
    from mpp_cnn_rs_object_detection_tpu.ops.geometry import (
        convex_quad_intersection_area,
    )

    for i in range(len(polys)):
        for j in range(i + 1, len(polys)):
            assert float(convex_quad_intersection_area(polys[i], polys[j])) == 0.0


def test_on_the_fly_patch_dataset(synth_env):
    """PatchDataset crops + reassigns labels per item without a materialised
    temp dataset (reference data/patch_dataset.py:14-92)."""
    from mpp_cnn_rs_object_detection_tpu.data.dataset import (
        BatchLoader,
        PatchDataset,
    )
    from mpp_cnn_rs_object_detection_tpu.data.label_processing import (
        PosLabelProcessor,
    )
    from mpp_cnn_rs_object_detection_tpu.data.patch_samplers import (
        ObjectSampler,
    )

    rng = np.random.default_rng(0)
    ds = PatchDataset(
        patch_size=32, dataset="synthtest", subset="train", rng=rng,
        label_processor=PosLabelProcessor(max_distance=6.0, mode="uvec"),
        patch_sampler=ObjectSampler(n_patches=8, patch_size=32, rng=rng,
                                    sigma=3.0),
    )
    assert len(ds) == 8
    patch, label = ds[0]
    assert patch.shape == (32, 32, 3)
    assert label["pointing_map"].shape == (32, 32, 2)
    x, y = next(iter(BatchLoader(ds, batch_size=4, rng=rng)))
    assert x.shape == (4, 32, 32, 3)
    assert y["mask"].shape == (4, 32, 32)


def test_translate_cowc_reference_config_keys(synth_env):
    """COWC translator end-to-end on fabricated raw data, driven by a config
    using the REFERENCE's key spellings (``cowc_base_path``/``name``,
    reference ``translate_COWC_config.json``)."""
    from PIL import Image

    from mpp_cnn_rs_object_detection_tpu.data.translate_cowc import (
        translate_cowc,
    )

    raw = synth_env / "cowc_raw" / "Utah"
    raw.mkdir(parents=True)
    rng = np.random.default_rng(3)
    for i in range(3):
        img = (rng.uniform(0, 255, (60, 80, 3))).astype(np.uint8)
        ann = np.zeros((60, 80, 3), np.uint8)
        for r, c in [(10, 12), (30, 40), (50, 70)]:
            ann[r, c] = (255, 0, 0)
        Image.fromarray(img).save(raw / f"img{i}.png")
        Image.fromarray(ann).save(raw / f"img{i}_Annotated_Cars.png")
        # negatives masks must be skipped, not treated as images
        Image.fromarray(ann * 0).save(raw / f"img{i}_Annotated_Negatives.png")

    translate_cowc(
        {
            "name": "COWC_t",
            "cowc_base_path": [str(synth_env / "cowc_raw")],
            "target_gsd": 0.5,
            "val_fraction": 0.34,
            "seed": 0,
        }
    )
    root = synth_env / "datasets" / "COWC_t"
    assert sorted(os.listdir(root)) == ["train", "val"]
    n_train = len(os.listdir(root / "train" / "images"))
    n_val = len(os.listdir(root / "val" / "images"))
    assert n_train == 2 and n_val == 1
    with open(root / "train" / "annotations" / "0000.pkl", "rb") as f:
        ann = pickle.load(f)
    # 0.15 -> 0.5 m/px shrinks by 0.3: 3 centers, scaled into the new frame
    assert ann["centers"].shape == (3, 2)
    assert (ann["parameters"] == [4.0, 4.0, 0.0]).all()
    img = np.asarray(Image.open(root / "train" / "images" / "0000.png"))
    assert img.shape == (18, 24, 3)
    assert (ann["centers"] >= 0).all()
    assert (ann["centers"][:, 0] < 18).all() and (ann["centers"][:, 1] < 24).all()


def test_extract_patch_matches_pad_reference():
    """The clipped-slice fast path == the reference full-image np.pad
    implementation (reference utils/images.py:4-24) for interior, border,
    and patch-larger-than-image anchors."""
    rng = np.random.default_rng(11)

    def ref_extract(image, center_anchor, patch_size):
        center_anchor = np.asarray(center_anchor)
        tl = center_anchor - patch_size // 2
        shape = np.array(image.shape[:2])
        off = np.zeros((2,), dtype=int)
        if tl[0] < 0 or tl[0] + patch_size >= shape[0]:
            image = np.pad(image, ((patch_size // 2, patch_size // 2),
                                   (0, 0), (0, 0)), "constant")
            off[0] = patch_size // 2
            tl[0] += patch_size // 2
        if tl[1] < 0 or tl[1] + patch_size >= shape[1]:
            image = np.pad(image, ((0, 0), (patch_size // 2, patch_size // 2),
                                   (0, 0)), "constant")
            off[1] = patch_size // 2
            tl[1] += patch_size // 2
        return image[tl[0]: tl[0] + patch_size,
                     tl[1]: tl[1] + patch_size], tl, off

    for h, w, p in [(64, 80, 32), (40, 40, 48), (100, 60, 128), (57, 91, 16)]:
        img = rng.random((h, w, 3)).astype(np.float32)
        for _ in range(20):
            anchor = np.array([rng.integers(0, h), rng.integers(0, w)])
            got, tl_g, off_g = extract_patch(img, anchor, p)
            want, tl_w, off_w = ref_extract(img, anchor, p)
            assert got.shape == want.shape
            np.testing.assert_array_equal(got, want)
            np.testing.assert_array_equal(tl_g, tl_w)
            np.testing.assert_array_equal(off_g, off_w)
