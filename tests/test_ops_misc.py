"""Tests for mappings, divergence, 2D samplers and NMS."""

import jax
import jax.numpy as jnp
import numpy as np

from mpp_cnn_rs_object_detection_tpu.ops import (
    ValueMapping,
    divergence_map_from_vector_field,
    gradient_1d,
    nms_distance,
    sample_point_2d,
)
from mpp_cnn_rs_object_detection_tpu.ops.mappings import (
    default_mappings,
    output_vector_to_value,
    values_to_class_id,
)
from mpp_cnn_rs_object_detection_tpu.ops.sampler2d import (
    categorical_from_rows,
    density_cdf,
    sample_from_cdf,
)


def _ref_value_to_class(mapping, value):
    # literal transcription of the reference's argwhere formulation
    fm = mapping.feature_mapping
    return int(np.max(np.argwhere(np.greater_equal(value, fm))))


def test_value_mapping_classes_match_argwhere_formulation():
    for m in default_mappings():
        rng = np.random.default_rng(0)
        vals = rng.uniform(m.v_min, m.v_max, 200)
        ours = m.value_to_class(vals)
        ref = np.array([_ref_value_to_class(m, v) for v in vals])
        np.testing.assert_array_equal(ours, ref)
        # jnp path agrees
        ours_j = np.asarray(m.value_to_class(jnp.asarray(vals)))
        np.testing.assert_array_equal(ours_j, ref)


def test_value_mapping_roundtrip_and_edges():
    m = ValueMapping(32, 0.0, 32.0)
    assert m.value_to_class(0.0) == 0
    assert m.value_to_class(31.999) == 31
    assert m.value_to_class(32.0) == 31  # clipped, not an error
    np.testing.assert_allclose(m.class_to_value(np.arange(32)), m.feature_mapping)
    cyc = ValueMapping(32, 0.0, np.pi, is_cyclic=True)
    np.testing.assert_allclose(cyc.clip(np.pi + 0.1), 0.1, atol=1e-9)


def test_values_to_class_id_tuple_list():
    maps = default_mappings()
    vals = [(4.0, 0.5, 1.0), (10.0, 0.9, 3.0)]
    out = values_to_class_id(vals, maps)
    assert len(out) == 3
    assert out[0][0] == maps[0].value_to_class(4.0)
    assert out[2][1] == maps[2].value_to_class(3.0)


def test_output_vector_to_value():
    maps = default_mappings()
    rng = np.random.default_rng(1)
    outputs = [rng.random((1, 32, 8, 8)) for _ in range(3)]
    vals = output_vector_to_value(outputs, maps)
    for v, o, m in zip(vals, outputs, maps):
        assert v.shape == (1, 8, 8)
        np.testing.assert_allclose(v, m.class_to_value(np.argmax(o, axis=1)))


def test_gradient_matches_numpy():
    rng = np.random.default_rng(2)
    f = rng.standard_normal((16, 24))
    for axis in (0, 1):
        for sp in (1.0, 0.5):
            ours = np.asarray(gradient_1d(jnp.asarray(f), axis=axis, spacing=sp))
            ref = np.gradient(f, sp, axis=axis)
            np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_divergence_matches_reference_numpy():
    # reference utils/math_utils.py:29-42 re-derived in numpy
    rng = np.random.default_rng(3)
    vf = rng.standard_normal((32, 32, 2))

    size = vf.shape[0]
    sp = np.diff(np.linspace(0, size, size))[0]
    norm = np.linalg.norm(vf, axis=-1)
    nv = vf / np.stack((norm, norm), axis=-1)
    nv[np.isnan(nv)] = 0
    ref = np.gradient(nv[..., 0], sp, axis=0) + np.gradient(nv[..., 1], sp, axis=1)

    ours = np.asarray(divergence_map_from_vector_field(jnp.asarray(vf), normalize=True))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_sample_point_2d_respects_density():
    rng = np.random.default_rng(4)
    density = np.zeros((10, 10))
    density[3, 7] = 1.0
    pts = sample_point_2d((10, 10), size=1, density=density, rng=rng)
    assert pts.shape == (1, 2)
    assert tuple(pts[0]) == (3, 7)


def test_sample_from_cdf_distribution():
    density = np.zeros((4, 4), dtype=np.float32)
    density[1, 2] = 3.0
    density[3, 0] = 1.0
    cdf = density_cdf(jnp.asarray(density))
    pts = np.asarray(sample_from_cdf(jax.random.PRNGKey(0), cdf, (4, 4), 4000))
    uniq, counts = np.unique(pts, axis=0, return_counts=True)
    assert set(map(tuple, uniq)) == {(1, 2), (3, 0)}
    frac = counts[np.all(uniq == [1, 2], axis=1)][0] / 4000
    assert abs(frac - 0.75) < 0.05


def test_categorical_from_rows():
    probs = jnp.asarray(np.tile(np.array([[0.0, 0.0, 1.0, 0.0]]), (100, 1)))
    cls = np.asarray(categorical_from_rows(jax.random.PRNGKey(1), probs))
    assert np.all(cls == 2)


def test_nms_distance_keeps_best():
    centers = np.array([[0, 0], [0, 2], [50, 50]])
    scores = np.array([0.5, 0.9, 0.7])
    kept, ks = nms_distance(centers, scores, threshold=6)
    kept = np.array(kept)
    assert len(kept) == 2
    assert [0, 2] in kept.tolist() and [50, 50] in kept.tolist()
    assert 0.9 in ks and 0.7 in ks
