"""Sub-pixel energy lookups + detection-center refinement."""

import jax.numpy as jnp
import numpy as np

from mpp_cnn_rs_object_detection_tpu.mpp.energies import (
    mark_lookup,
    position_lookup,
)
from mpp_cnn_rs_object_detection_tpu.mpp.refine import snap_centers_to_map


def test_position_lookup_integer_coords_exact():
    rng = np.random.default_rng(0)
    m = jnp.asarray(rng.random((16, 24)), jnp.float32)
    xy = jnp.asarray([[3.0, 5.0], [0.0, 0.0], [15.0, 23.0]])
    got = np.asarray(position_lookup(m, xy, 16, 24))
    want = np.asarray([m[3, 5], m[0, 0], m[15, 23]])
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_position_lookup_midpoint_average():
    m = jnp.zeros((4, 4), jnp.float32).at[1, 1].set(1.0).at[2, 1].set(3.0)
    v = float(position_lookup(m, jnp.asarray([1.5, 1.0]), 4, 4))
    assert abs(v - 2.0) < 1e-6
    # clipped outside-the-map coordinates degrade to the edge pixel
    v_edge = float(position_lookup(m, jnp.asarray([-2.0, 1.0]), 4, 4))
    assert abs(v_edge - float(m[0, 1])) < 1e-6


def test_position_lookup_rowsharded_view_matches_global():
    rng = np.random.default_rng(1)
    m = jnp.asarray(rng.random((32, 8)), jnp.float32)
    xy = jnp.asarray([[17.3, 2.6], [20.0, 7.0], [24.9, 0.1]])
    # local block = rows 16..32 with row0 = 16
    local = m[16:]
    got = np.asarray(position_lookup(local, xy, 32, 8, row0=16))
    want = np.asarray(position_lookup(m, xy, 32, 8))
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_mark_lookup_interpolates_per_class():
    rng = np.random.default_rng(2)
    mm = jnp.asarray(rng.random((3, 8, 8, 4)), jnp.float32)
    xy = jnp.asarray([2.5, 3.0])
    cls = jnp.asarray([1, 2, 0])
    got = np.asarray(mark_lookup(mm, xy, cls, 8, 8))
    want = np.asarray(
        [0.5 * (mm[m, 2, 3, c] + mm[m, 3, 3, c])
         for m, c in enumerate([1, 2, 0])]
    )
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_snap_centers_moves_to_blob_centroid():
    h = w = 32
    gy, gx = np.mgrid[:h, :w].astype(np.float32)
    true_c = (10.4, 20.6)
    dm = np.exp(-((gy - true_c[0]) ** 2 + (gx - true_c[1]) ** 2) / 2.0)
    start = np.asarray([[9.0, 22.0]], np.float32)
    snapped = snap_centers_to_map(start, dm)
    d_before = np.hypot(*(start[0] - true_c))
    d_after = np.hypot(*(snapped[0] - true_c))
    assert d_after < d_before
    assert d_after < 0.7


def test_snap_centers_shift_cap_and_flat_map():
    dm = np.zeros((16, 16), np.float32)
    dm[12, 12] = 1.0
    start = np.asarray([[10.0, 10.0]], np.float32)
    snapped = snap_centers_to_map(start, dm, radius=3, max_shift=1.5)
    assert np.hypot(*(snapped[0] - start[0])) <= 1.5 + 1e-6
    # zero response window: untouched
    flat = snap_centers_to_map(np.asarray([[3.0, 3.0]]), np.zeros((16, 16)))
    np.testing.assert_allclose(flat, [[3.0, 3.0]])
