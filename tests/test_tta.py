"""Dihedral TTA (ops/dihedral.py): spatial round-trips, the angle-bin
permutation pinned against the polygon machinery, and ensemble behaviour on
an equivariant fake model."""

import numpy as np
import pytest

from mpp_cnn_rs_object_detection_tpu.ops.dihedral import (
    D4_ELEMENTS,
    angle_gather_indices,
    inverse_transform_map,
    transform_image,
    transform_points,
    tta_dist_maps,
    tta_scalar_map,
)
from mpp_cnn_rs_object_detection_tpu.ops.geometry import (
    polygon_to_abw,
    rect_to_poly_np,
)

RNG = np.random.default_rng(7)


@pytest.mark.parametrize("k,flip", D4_ELEMENTS)
def test_spatial_roundtrip(k, flip):
    a = RNG.normal(size=(6, 9, 3)).astype(np.float32)
    t = transform_image(a, k, flip)
    back = inverse_transform_map(t, k, flip)
    np.testing.assert_array_equal(back, a)
    # point mapping matches the array mapping: out[T(p)] == in[p]
    scalar = RNG.normal(size=(6, 9))
    ts = transform_image(scalar, k, flip)
    pts = np.stack(np.meshgrid(np.arange(6), np.arange(9), indexing="ij"),
                   axis=-1).reshape(-1, 2)
    tp = transform_points(pts, 6, 9, k, flip).astype(int)
    np.testing.assert_array_equal(
        ts[tp[:, 0], tp[:, 1]], scalar[pts[:, 0], pts[:, 1]]
    )


@pytest.mark.parametrize("k,flip", D4_ELEMENTS)
def test_angle_permutation_matches_polygon_transform(k, flip):
    """For every original-frame angle bin i, a rectangle at that bin's center
    angle, transformed by (k, flip) as POINTS, must land (via polygon_to_abw)
    in exactly the transformed-frame bin the gather reads."""
    C = 32
    h = w = 97
    gather = angle_gather_indices(C, k, flip)
    step = np.pi / C
    for i in range(C):
        angle = (i + 0.5) * step
        poly = rect_to_poly_np(
            np.array([[48.0, 48.0]]), np.array([6.0]), np.array([14.0]),
            np.array([angle]),
        )[0]
        tpoly = transform_points(poly, h, w, k, flip)
        _, _, t_angle = polygon_to_abw(tpoly)
        j = int(t_angle / step) % C
        assert gather[i] == j, (i, j, gather[i], t_angle)


@pytest.mark.parametrize("k,flip", D4_ELEMENTS)
def test_angle_gather_is_permutation(k, flip):
    g = angle_gather_indices(32, k, flip)
    assert sorted(g.tolist()) == list(range(32))


def test_tta_scalar_equivariant_model_is_identity():
    """A D4-equivariant 'model' (3x3 box filter of the first channel) gives
    the same map through every group element, so the TTA mean equals the
    direct output exactly."""
    img = RNG.random((12, 17, 3)).astype(np.float32)

    def model(x):
        c = np.pad(x[..., 0], 1, mode="edge")
        out = np.zeros(x.shape[:2], np.float32)
        for dy in (0, 1, 2):
            for dx in (0, 1, 2):
                out += c[dy:dy + x.shape[0], dx:dx + x.shape[1]]
        return out / 9.0

    np.testing.assert_allclose(
        tta_scalar_map(model, img), model(img), rtol=1e-5, atol=1e-6
    )


def test_tta_dist_maps_shapes_and_normalisation():
    """Distributions stay normalised and non-cyclic maps are plain spatial
    means; the cyclic map keeps per-pixel mass 1 under the bin gather."""
    img = RNG.random((8, 10, 3)).astype(np.float32)
    C = 8

    def model(x):
        h, w = x.shape[:2]
        logits = RNG.random((h, w, C))  # content-independent noise
        d = logits / logits.sum(-1, keepdims=True)
        return [d, d, d]

    outs = tta_dist_maps(model, img, cyclic=(False, False, True))
    assert [o.shape for o in outs] == [(8, 10, C)] * 3
    for o in outs:
        np.testing.assert_allclose(o.sum(-1), 1.0, atol=1e-5)


def test_tta_dist_constant_angle_model_roundtrip():
    """A model that always answers 'angle bin b in MY frame' must, after TTA
    pullback of a single element (k, flip), place that mass on the original
    bin i with gather[i] == b — i.e. the inverse action applied to b."""
    img = np.zeros((6, 6, 3), np.float32)
    C = 8
    b = 3

    def model(x):
        h, w = x.shape[:2]
        d = np.zeros((h, w, C), np.float32)
        d[..., b] = 1.0
        return [d, d, d]

    for k, flip in D4_ELEMENTS:
        outs = tta_dist_maps(
            model, img, cyclic=(False, False, True), elements=[(k, flip)]
        )
        gather = angle_gather_indices(C, k, flip)
        expect = np.zeros(C)
        expect[gather == b] = 1.0
        np.testing.assert_array_equal(outs[2][0, 0], expect)
        # non-cyclic maps keep the mass on b
        np.testing.assert_array_equal(
            outs[0][0, 0], np.eye(C)[b].astype(np.float32)
        )
