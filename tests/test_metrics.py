"""Tests for polyiou (C++ + fallback), DOTA writer, and the AP evaluator."""

import json
import os

import cv2
import numpy as np
import pytest

from mpp_cnn_rs_object_detection_tpu.metrics import (
    DOTAResultsTranslator,
    poly_iou,
    poly_iou_batch,
    poly_iou_matrix,
    precision_recall_curve_on_detection_map,
    voc_eval,
)
from mpp_cnn_rs_object_detection_tpu.metrics.dota_eval import voc_ap
from mpp_cnn_rs_object_detection_tpu.metrics.polyiou import (
    _get_lib,
    _np_intersection_area,
)
from mpp_cnn_rs_object_detection_tpu.ops.geometry import marks_to_poly


def _random_polys(seed, n):
    rng = np.random.default_rng(seed)
    xy = rng.uniform(0, 60, (n, 2))
    size = rng.uniform(2, 20, n)
    ratio = rng.uniform(0.1, 1.0, n)
    angle = rng.uniform(0, np.pi, n)
    return np.asarray(marks_to_poly(xy, size, ratio, angle)).astype(np.float64)


def _cv2_iou(a, b):
    inter, _ = cv2.intersectConvexConvex(
        a.astype(np.float32).reshape(-1, 1, 2), b.astype(np.float32).reshape(-1, 1, 2)
    )
    area_a = cv2.contourArea(a.astype(np.float32))
    area_b = cv2.contourArea(b.astype(np.float32))
    union = area_a + area_b - inter
    return inter / union if union > 0 else 0.0


def test_cpp_library_builds():
    assert _get_lib() is not None, "C++ polyiou failed to build"


def test_poly_iou_vs_opencv():
    polys = _random_polys(0, 60)
    for i in range(0, 60, 2):
        a, b = polys[i], polys[i + 1]
        ours = poly_iou(a, b)
        golden = _cv2_iou(a, b)
        assert abs(ours - golden) < 1e-3, (i, ours, golden)


def test_numpy_fallback_matches_cpp():
    polys = _random_polys(1, 40)
    for i in range(0, 40, 2):
        a, b = polys[i], polys[i + 1]
        cpp = poly_iou(a, b)
        np_inter = _np_intersection_area(a, b)
        area = lambda p: cv2.contourArea(p.astype(np.float32))
        np_iou = np_inter / (area(a) + area(b) - np_inter + 1e-12)
        assert abs(cpp - np_iou) < 1e-6


def test_poly_iou_batch_and_matrix():
    polys = _random_polys(2, 10)
    batch = poly_iou_batch(polys[0], polys)
    assert batch.shape == (10,)
    assert abs(batch[0] - 1.0) < 1e-6
    mat = poly_iou_matrix(polys[:4], polys)
    assert mat.shape == (4, 10)
    np.testing.assert_allclose(mat[0], batch, atol=1e-9)


def test_voc_ap_known_values():
    # perfect detector: AP = 1
    assert voc_ap(np.array([0.5, 1.0]), np.array([1.0, 1.0])) == 1.0
    # constant precision 0.5 up to full recall
    ap = voc_ap(np.array([0.5, 1.0]), np.array([0.5, 0.5]))
    assert abs(ap - 0.5) < 1e-9


@pytest.fixture
def eval_setup(tmp_path):
    """Write a small gt/det set with known matching structure."""
    gt_dir = tmp_path / "gt"
    det_dir = tmp_path / "det"
    gt_dir.mkdir()
    det_dir.mkdir()

    def square(cx, cy, s=10):
        h = s / 2
        return np.array(
            [[cx - h, cy - h], [cx + h, cy - h], [cx + h, cy + h], [cx - h, cy + h]]
        )

    # image 0000: 2 gts (one difficult), image 0001: 1 gt
    def gt_line(p, cat="vehicle", diff=0):
        return " ".join(str(int(v)) for v in p.ravel()) + f" {cat} {diff}"

    (gt_dir / "0000.txt").write_text(
        "\n".join([gt_line(square(20, 20)), gt_line(square(50, 50), diff=1)])
    )
    (gt_dir / "0001.txt").write_text(gt_line(square(30, 30)))

    def det_line(img, score, p):
        return f"{img} {score} " + " ".join(f"{v:.1f}" for v in p.ravel())

    # det1 matches gt0/img0 (tp), det2 matches difficult gt (ignored),
    # det3 off in the void (fp), det4 matches gt/img1 (tp)
    (det_dir / "vehicle.txt").write_text(
        "\n".join(
            [
                det_line("0000", 0.9, square(21, 21)),
                det_line("0000", 0.8, square(50, 50)),
                det_line("0000", 0.7, square(200, 200)),
                det_line("0001", 0.6, square(31, 31)),
            ]
        )
    )
    (tmp_path / "imageSet.txt").write_text("0000\n0001")
    return tmp_path


def test_voc_eval_matching(eval_setup):
    rec, prec, ap = voc_eval(
        detpath=str(eval_setup / "det" / "{:s}.txt"),
        annopath=str(eval_setup / "gt" / "{:s}.txt"),
        imagesetfile=str(eval_setup / "imageSet.txt"),
        classname="vehicle",
        ovthresh=0.5,
    )
    # npos = 2 (difficult excluded); tp sequence: [1, ignored, fp, 1]
    assert rec[-1] == 1.0
    # final precision = 2 tp / 3 counted dets
    np.testing.assert_allclose(prec[-1], 2 / 3, atol=1e-9)
    # AP: P=1 until recall 0.5, then 2/3 at recall 1 -> 0.5*1 + 0.5*2/3
    np.testing.assert_allclose(ap, 0.5 + 0.5 * 2 / 3, atol=1e-9)


def test_dota_writer_roundtrip(tmp_path):
    trlt = DOTAResultsTranslator(
        "ds", "val", str(tmp_path), det_type="obb", all_classes=["vehicle"]
    )
    poly = np.array([[1.0, 2.0], [1.0, 10.0], [8.0, 10.0], [8.0, 2.0]])
    trlt.add_gt(
        image_id=7, polygons=np.array([poly]), difficulty=[0], categories=["vehicle"]
    )
    trlt.add_detections(
        image_id=7, scores=[0.5], polygons=np.array([poly]), flip_coor=True,
        class_names=["vehicle"],
    )
    trlt.save()

    gt_lines = (tmp_path / "dota" / "gt" / "0007.txt").read_text().splitlines()
    parts = gt_lines[0].split(" ")
    assert parts[8] == "vehicle" and parts[9] == "0"
    # flip_coor swaps (row, col) -> (x=col, y=row); GT keeps sub-pixel
    # precision (the reference's int truncation is a fixed quirk)
    assert parts[0] == "2.0" and parts[1] == "1.0"
    det_lines = (tmp_path / "dota" / "det" / "vehicle.txt").read_text().splitlines()
    assert det_lines[0].startswith("0007 0.5 2.0 1.0")
    assert (tmp_path / "dota" / "imageSet.txt").read_text() == "0007"


def test_pr_curve_on_detection_map():
    det = np.zeros((32, 32))
    det[10, 10] = 0.9
    det[20, 20] = 0.8  # false positive
    labels = {"centers": np.array([[10, 10]])}
    thr, m = precision_recall_curve_on_detection_map(
        det, labels, num_thresholds=11, dilation=1
    )
    # at threshold 0.85 only the tp pixel fires
    i = np.argmin(np.abs(thr - 0.85))
    assert m["precision"][i] == 1.0
    assert m["recall"][i] > 0


def _referee_voc_eval(gt_by_img, det_list, ovthresh, use_07=False):
    """Independent re-statement of the devkit voc_eval matching rules
    (``DOTA_devkit/dota_evaluation_task1.py``): dets in descending score;
    each det matches its argmax-IoU GT **including difficult ones**; above
    threshold a difficult match is ignored (neither tp nor fp), a fresh
    non-difficult match is tp, a re-match is fp; below threshold is fp.
    Shares only the (OpenCV-golden-tested) IoU primitive with the product
    evaluator — the matching logic here is written from the rules."""
    from mpp_cnn_rs_object_detection_tpu.metrics.dota_eval import voc_ap
    from mpp_cnn_rs_object_detection_tpu.metrics.polyiou import poly_iou

    npos = sum(
        int(not d) for recs in gt_by_img.values() for (_, d) in recs
    )
    matched = {img: set() for img in gt_by_img}
    tp, fp = [], []
    for img, score, poly in sorted(det_list, key=lambda r: -r[1]):
        recs = gt_by_img.get(img, [])
        ious = [poly_iou(poly, g) for (g, _) in recs]
        best = int(np.argmax(ious)) if ious else -1
        if best >= 0 and ious[best] > ovthresh:
            g_poly, g_diff = recs[best]
            if g_diff:
                continue  # ignored: no tp, no fp
            if best in matched[img]:
                fp.append(1.0); tp.append(0.0)
            else:
                matched[img].add(best)
                tp.append(1.0); fp.append(0.0)
        else:
            fp.append(1.0); tp.append(0.0)
    tp_c, fp_c = np.cumsum(tp), np.cumsum(fp)
    rec = tp_c / max(npos, 1)
    prec = tp_c / np.maximum(tp_c + fp_c, 1e-300)
    return voc_ap(rec, prec, use_07)


def _rand_quad(rng, cx, cy, s, ratio, angle):
    from mpp_cnn_rs_object_detection_tpu.ops.geometry import rect_to_poly_np

    return rect_to_poly_np(
        np.array([[cy, cx]], np.float64), np.array([s * ratio]),
        np.array([s]), np.array([angle]),
    )[0]


def test_voc_eval_matches_independent_referee(tmp_path):
    """Randomized golden check of the evaluator's matching semantics —
    duplicates, difficult gating via the argmax (devkit tie-break), misses —
    against an independently-written referee (VERDICT: evaluator parity)."""
    rng = np.random.default_rng(11)
    gt_dir = tmp_path / "gt"; det_dir = tmp_path / "det"
    gt_dir.mkdir(); det_dir.mkdir()
    images = ["0000", "0001", "0002"]
    gt_by_img = {}
    det_list = []
    det_lines = []
    for img in images:
        n_gt = int(rng.integers(3, 8))
        recs = []
        lines = []
        for g in range(n_gt):
            cx, cy = rng.uniform(20, 200, 2)
            poly = _rand_quad(rng, cx, cy, rng.uniform(8, 16),
                              rng.uniform(1.2, 2.5), rng.uniform(0, np.pi))
            diff = bool(rng.random() < 0.25)
            recs.append((poly, diff))
            lines.append(
                " ".join(str(int(v)) for v in poly.ravel())
                + f" vehicle {int(diff)}"
            )
            # noisy matching det + occasional duplicate
            for _ in range(1 + int(rng.random() < 0.4)):
                jit = rng.normal(0, 2.0, poly.shape)
                # round to the det-file precision so the referee and the
                # file-parsing evaluator see identical coordinates
                dpoly = np.round(poly + jit, 1)
                score = float(rng.random())
                det_list.append((img, score, dpoly))
                det_lines.append(
                    f"{img} {score} "
                    + " ".join(f"{v:.1f}" for v in dpoly.ravel())
                )
        # pure false positives
        for _ in range(2):
            cx, cy = rng.uniform(300, 400, 2)
            dpoly = _rand_quad(rng, cx, cy, 10, 1.5, 0.3)
            score = float(rng.random())
            det_list.append((img, score, dpoly))
            det_lines.append(
                f"{img} {score} "
                + " ".join(f"{v:.1f}" for v in dpoly.ravel())
            )
        gt_by_img[img] = recs
        (gt_dir / f"{img}.txt").write_text("\n".join(lines))
    (det_dir / "vehicle.txt").write_text("\n".join(det_lines))
    (tmp_path / "imageSet.txt").write_text("\n".join(images))

    # gt files round-trip through int coords; referee must see the same ints
    gt_by_img_int = {
        img: [(np.asarray(p, np.float64).astype(int).astype(np.float64), d)
              for (p, d) in recs]
        for img, recs in gt_by_img.items()
    }
    for iou_t in (0.25, 0.5, 0.75):
        _, _, ap = voc_eval(
            detpath=str(det_dir / "{:s}.txt"),
            annopath=str(gt_dir / "{:s}.txt"),
            imagesetfile=str(tmp_path / "imageSet.txt"),
            classname="vehicle",
            ovthresh=iou_t,
        )
        ap_ref = _referee_voc_eval(gt_by_img_int, det_list, iou_t)
        np.testing.assert_allclose(ap, ap_ref, atol=1e-9,
                                   err_msg=f"IoU {iou_t}")
