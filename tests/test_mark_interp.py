"""Tri-linear mark-energy lookup + bin-center decode semantics.

The reference gathers the floor bin of each mark (piecewise-constant energy
over bins, ``data_energies.py:33-45``) and decodes class ids at bin LEFT
edges (``mappings.py:62-74``) — a systematic −step/2 bias. The rebuild
interpolates between bin centers (``energies.mark_lookup_interp``) and
decodes at centers (``ValueMapping.class_to_center_value``)."""

import jax.numpy as jnp
import numpy as np

from mpp_cnn_rs_object_detection_tpu.mpp.energies import (
    make_energy_maps,
    mark_lookup,
    mark_lookup_interp,
    marks_to_class,
)
from mpp_cnn_rs_object_detection_tpu.ops.mappings import default_mappings

H = W = 8
C = 8


def _setup():
    mappings = default_mappings(n_classes=C, size_min=0, size_max=16)
    rng = np.random.default_rng(0)
    det = rng.random((H, W)).astype(np.float32)
    mark_energy = [rng.random((H, W, C)).astype(np.float32) for _ in range(3)]
    maps = make_energy_maps(
        detection_map=det, mark_energy_maps=mark_energy, threshold=0.5,
        min_area=1.0, max_area=400.0, mappings=mappings,
    )
    return maps, mappings


def _interp(maps, xy, marks):
    return np.asarray(
        mark_lookup_interp(
            maps.mark_maps, jnp.asarray(xy, jnp.float32),
            jnp.asarray(marks, jnp.float32),
            maps.map_vmin, maps.map_vmax, maps.map_cyclic, H, W,
        )
    )


def test_interp_equals_gather_at_bin_centers():
    maps, mappings = _setup()
    steps = np.array([m.get_step() for m in mappings])
    vmin = np.array([m.v_min for m in mappings])
    # marks exactly at bin centers, integer pixel positions
    for k in (0, 2, 5, C - 1):
        marks = (vmin + (k + 0.5) * steps)[None, :]
        xy = np.array([[3.0, 4.0]])
        got = _interp(maps, xy, marks)
        cls = np.asarray(marks_to_class(jnp.asarray(marks, jnp.float32), maps))
        assert np.all(cls == k)
        want = np.asarray(
            mark_lookup(maps.mark_maps, jnp.asarray(xy, jnp.float32),
                        jnp.asarray(cls), H, W)
        )
        np.testing.assert_allclose(got, want, rtol=1e-5)


def test_interp_linear_between_centers():
    maps, mappings = _setup()
    steps = np.array([m.get_step() for m in mappings])
    vmin = np.array([m.v_min for m in mappings])
    xy = np.array([[2.0, 6.0]])
    lo = (vmin + (3 + 0.5) * steps)[None, :]
    hi = (vmin + (4 + 0.5) * steps)[None, :]
    mid = (lo + hi) / 2
    v_lo, v_hi, v_mid = _interp(maps, xy, lo), _interp(maps, xy, hi), _interp(
        maps, xy, mid
    )
    np.testing.assert_allclose(v_mid, (v_lo + v_hi) / 2, rtol=1e-5)


def test_interp_cyclic_wrap_for_angle():
    maps, mappings = _setup()
    ang = mappings[2]
    assert ang.is_cyclic
    step = ang.get_step()
    xy = np.array([[5.0, 5.0]])
    # halfway between the last bin center and the first (wrapping past pi)
    last_c = ang.v_min + (C - 0.5) * step
    wrap_val = (last_c + step / 2.0) % (ang.v_max - ang.v_min)
    marks = np.array([[8.0, 0.5, wrap_val]])
    got = _interp(maps, xy, marks)[0, 2]
    m_last = np.array([[8.0, 0.5, last_c]])
    m_first = np.array([[8.0, 0.5, ang.v_min + 0.5 * step]])
    want = (_interp(maps, xy, m_last)[0, 2] + _interp(maps, xy, m_first)[0, 2]) / 2
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_interp_clamps_at_ends_non_cyclic():
    maps, mappings = _setup()
    size = mappings[0]
    xy = np.array([[1.0, 1.0]])
    below = np.array([[size.v_min, 0.5, 0.3]])
    first_center = np.array([[size.v_min + 0.5 * size.get_step(), 0.5, 0.3]])
    np.testing.assert_allclose(
        _interp(maps, xy, below)[0, 0], _interp(maps, xy, first_center)[0, 0],
        rtol=1e-5,
    )


def test_class_to_center_value_round_trip():
    _, mappings = _setup()
    for m in mappings:
        ks = np.arange(C)
        centers = m.class_to_center_value(ks)
        # center decode re-encodes to the same class (floor mid-bin)
        np.testing.assert_array_equal(m.value_to_class(centers), ks)
        # and sits exactly step/2 above the reference's left-edge decode
        np.testing.assert_allclose(
            centers - m.class_to_value(ks), m.get_step() / 2.0, rtol=1e-6
        )
