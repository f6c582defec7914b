"""Gradient polish of final detections (mpp/polish.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from mpp_cnn_rs_object_detection_tpu.mpp.combinators import sum_combiner
from mpp_cnn_rs_object_detection_tpu.mpp.energies import (
    EnergySpec,
    make_energy_maps,
)
from mpp_cnn_rs_object_detection_tpu.mpp.polish import polish_state
from mpp_cnn_rs_object_detection_tpu.mpp.rjmcmc import (
    build_cache,
    energy_from_cache,
)
from mpp_cnn_rs_object_detection_tpu.mpp.state import state_from_arrays
from mpp_cnn_rs_object_detection_tpu.ops.mappings import default_mappings

H = W = 64
C = 8
NAMES = ("position", "size", "ratio", "angle", "overlap", "align", "area")
SPEC = EnergySpec(names=NAMES, shape_mode="separate", rewarding_align=False)


def blob_map(centers, sigma=2.0):
    gy, gx = np.mgrid[:H, :W]
    m = np.zeros((H, W))
    for c in centers:
        m += np.exp(-((gy - c[0]) ** 2 + (gx - c[1]) ** 2) / (2 * sigma**2))
    return np.clip(m, 0, 1)


@pytest.fixture(scope="module")
def setup():
    mappings = default_mappings(n_classes=C, size_min=0, size_max=16)
    centers = [(16.0, 16.0), (40.0, 40.0), (16.0, 48.0)]
    det = blob_map(centers)
    # mark maps ramp up with class id -> the tri-linear lookup has an in-bin
    # gradient toward larger mark values everywhere (interpolation is local:
    # only ADJACENT bin centers contribute a gradient, so a ramp — not an
    # isolated far-away peak — is the right monotone-movement probe)
    ramp = np.arange(1, C + 1, dtype=np.float32)
    dist = np.broadcast_to(ramp / ramp.sum(), (H, W, C)).astype(np.float32)
    mark_energy = [-dist, -dist, -dist]
    maps = make_energy_maps(
        detection_map=det, mark_energy_maps=mark_energy, threshold=0.5,
        min_area=4.0, max_area=200.0, mappings=mappings,
    )
    return maps, mappings, np.asarray(centers, np.float32)


def _energy(state, maps):
    comb = sum_combiner(NAMES)
    cache = build_cache(state, maps, SPEC)
    return float(energy_from_cache(state, maps, SPEC, comb, cache))


def test_polish_decreases_energy_and_recentres(setup):
    maps, mappings, centers = setup
    # start 1.5 px off every blob center, marks mid-range
    xy0 = centers + np.asarray([[1.5, -1.5], [-1.5, 1.5], [1.5, 1.5]],
                               np.float32)
    marks0 = np.tile(np.asarray([[6.0, 0.5, 0.8]], np.float32), (3, 1))
    state = state_from_arrays(xy0, marks0, capacity=8)
    comb = sum_combiner(NAMES)

    out, (u0, u1) = polish_state(state, maps, SPEC, comb, n_steps=80)
    assert np.isfinite(float(u0)) and np.isfinite(float(u1))
    assert float(u1) <= float(u0) + 1e-5
    # recompute through the untouched (non-safe-dist) energy path too
    assert _energy(out, maps) <= _energy(state, maps) + 1e-4

    xy1 = np.asarray(out.xy)[:3]
    d0 = np.linalg.norm(xy0 - centers, axis=1)
    d1 = np.linalg.norm(xy1 - centers, axis=1)
    assert (d1 < d0 - 0.5).all(), (d0, d1)

    # marks ride the ramp's gradient toward larger values
    m1 = np.asarray(out.marks)[:3]
    assert (m1[:, 0] > marks0[:, 0] + 0.2).all(), m1[:, 0]

    # dead slots and the alive mask are untouched
    assert np.array_equal(np.asarray(out.alive), np.asarray(state.alive))
    assert np.isfinite(np.asarray(out.xy)).all()
    assert np.isfinite(np.asarray(out.marks)).all()


def test_polish_reported_energy_matches_returned_state(setup):
    """u_post must be the ACTUAL energy of the returned state (regression:
    best-iterate tracking once paired u(t) with the t+1 coordinates)."""
    maps, mappings, centers = setup
    xy0 = centers + np.asarray([[1.5, -1.5], [-1.5, 1.5], [1.5, 1.5]],
                               np.float32)
    marks0 = np.tile(np.asarray([[6.0, 0.5, 0.8]], np.float32), (3, 1))
    state = state_from_arrays(xy0, marks0, capacity=8)
    comb = sum_combiner(NAMES)
    for n in (1, 3, 17):
        out, (u0, u1) = polish_state(state, maps, SPEC, comb, n_steps=n)
        # recompute with safe_dist (the energy polish itself descends)
        cache = build_cache(out, maps, SPEC, safe_dist=True)
        u_actual = float(energy_from_cache(out, maps, SPEC, comb, cache))
        assert abs(u_actual - float(u1)) < 1e-3, (n, u_actual, float(u1))


def test_polish_handles_overlapping_and_identical_rects(setup):
    """Degenerate geometry (identical quads on the cache diagonal and a
    duplicated detection pair) must not NaN the gradients."""
    maps, mappings, centers = setup
    xy0 = np.asarray([[16.0, 16.0], [16.0, 16.0], [40.0, 40.0]], np.float32)
    marks0 = np.tile(np.asarray([[6.0, 0.5, 0.8]], np.float32), (3, 1))
    state = state_from_arrays(xy0, marks0, capacity=4)
    comb = sum_combiner(NAMES)
    out, (u0, u1) = polish_state(state, maps, SPEC, comb, n_steps=40)
    assert np.isfinite(np.asarray(out.xy)).all()
    assert np.isfinite(np.asarray(out.marks)).all()
    assert float(u1) <= float(u0) + 1e-5


def test_polish_respects_bounds(setup):
    maps, mappings, _ = setup
    # a point at the map corner with extreme marks stays in-range
    xy0 = np.asarray([[0.5, 0.5]], np.float32)
    marks0 = np.asarray([[15.9, 0.99, 3.1]], np.float32)
    state = state_from_arrays(xy0, marks0, capacity=2)
    comb = sum_combiner(NAMES)
    out, _ = polish_state(state, maps, SPEC, comb, n_steps=30)
    xy1 = np.asarray(out.xy)[0]
    m1 = np.asarray(out.marks)[0]
    assert 0.0 <= xy1[0] <= H - 1 and 0.0 <= xy1[1] <= W - 1
    assert 0.0 < m1[0] <= 16.0          # size within mapping range
    assert 0.0 < m1[1] <= 1.0           # ratio
    assert 0.0 <= m1[2] <= np.pi + 1e-6  # angle wrapped
