"""Device-pipeline parity: on-device targets/augmentation must match the
host label processors (``data/label_processing.py``) and the tested host
dihedral formulas (``data/augmentation.py``)."""

import numpy as np
import pytest

from mpp_cnn_rs_object_detection_tpu.data.augmentation import (
    flip_points,
    rot90_points,
)
from mpp_cnn_rs_object_detection_tpu.data.device_pipeline import (
    augment_batch,
    dihedral_image,
    dihedral_points,
    pos_targets,
    shape_targets,
)
from mpp_cnn_rs_object_detection_tpu.data.label_processing import (
    PosLabelProcessor,
    ShapeLabelProcessor,
)
from mpp_cnn_rs_object_detection_tpu.ops.mappings import default_mappings

import jax
import jax.numpy as jnp

P = 48
M = 8


def _random_case(rng, n_obj):
    centers = rng.uniform(2, P - 2, size=(n_obj, 2))
    a = rng.uniform(3, 6, n_obj)
    b = rng.uniform(6, 12, n_obj)
    w = rng.uniform(0, np.pi, n_obj)
    params = np.stack([a, b, w], -1)
    cen_pad = np.zeros((M, 2), np.float32)
    par_pad = np.zeros((M, 3), np.float32)
    val = np.zeros((M,), bool)
    cen_pad[:n_obj] = centers
    par_pad[:n_obj] = params
    val[:n_obj] = True
    return centers, params, cen_pad, par_pad, val


@pytest.mark.parametrize("n_obj", [0, 1, 5])
@pytest.mark.parametrize("max_distance", [8.0, "auto"])
def test_pos_targets_match_host(n_obj, max_distance):
    rng = np.random.default_rng(n_obj + 7)
    centers, params, cen_pad, par_pad, val = _random_case(rng, n_obj)
    host = PosLabelProcessor(max_distance=max_distance, mode="uvec",
                             sigma_dil=0.6)
    patch = rng.random((P, P, 3)).astype(np.float32)
    _, label = host.process(patch, centers, params, 0)
    dev = jax.jit(
        lambda c, p, v: pos_targets(c, p, v, P, max_distance, sigma_dil=0.6)
    )(cen_pad, par_pad, val)
    np.testing.assert_allclose(
        np.asarray(dev["pointing_map"]), label["pointing_map"],
        atol=2e-5,
    )
    np.testing.assert_allclose(np.asarray(dev["mask"]), label["mask"],
                               atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(dev["center_binary_map_dil"]),
        label["center_binary_map_dil"], atol=1e-4,
    )


@pytest.mark.parametrize("n_obj", [0, 1, 5])
@pytest.mark.parametrize("mask_mode", ["shapes", "gaussian"])
def test_shape_targets_match_host(n_obj, mask_mode):
    rng = np.random.default_rng(n_obj + 3)
    centers, params, cen_pad, par_pad, val = _random_case(rng, n_obj)
    mappings = default_mappings(n_classes=16, size_min=0, size_max=16)
    host = ShapeLabelProcessor(mappings=mappings, mask_mode=mask_mode,
                               mask_sigma="auto")
    patch = rng.random((P, P, 3)).astype(np.float32)
    _, label = host.process(patch, centers, params, 0)
    dev = jax.jit(
        lambda c, p, v: shape_targets(c, p, v, P, mappings,
                                      mask_mode=mask_mode)
    )(cen_pad, par_pad, val)
    np.testing.assert_allclose(
        np.asarray(dev["loss_mask"]), label["loss_mask"], atol=1e-6
    )
    weight = label["loss_mask"] > 0  # classes only matter where loss counts
    for i in range(3):
        host_map = np.asarray(label["value_class_map"][i])
        dev_map = np.asarray(dev["value_class_map"][i])
        np.testing.assert_array_equal(dev_map[weight], host_map[weight])


def test_dihedral_points_match_host_formulas():
    rng = np.random.default_rng(0)
    centers = rng.uniform(0, P - 1, size=(6, 2))
    angles = rng.uniform(0, np.pi, 6)
    for k in range(4):
        for f0 in (False, True):
            for f1 in (False, True):
                hc, ha = rot90_points(centers, angles, (P, P), k)
                if f0:
                    hc, ha = flip_points(hc, ha, (P, P), axis=0)
                if f1:
                    hc, ha = flip_points(hc, ha, (P, P), axis=1)
                dc, da = jax.jit(
                    lambda c, a, kk=k, ff0=f0, ff1=f1: dihedral_points(
                        c, a, P, jnp.asarray(kk), jnp.asarray(ff0),
                        jnp.asarray(ff1),
                    )
                )(centers, angles)
                np.testing.assert_allclose(np.asarray(dc), hc, atol=1e-4)
                np.testing.assert_allclose(
                    np.asarray(da), ha % np.pi, atol=1e-4
                )


def test_dihedral_image_consistent_with_points():
    """A pixel painted at a center must land where the transformed center
    says it lands."""
    rng = np.random.default_rng(1)
    c = np.array([[11.0, 30.0]])
    img = np.zeros((P, P, 3), np.float32)
    img[11, 30] = 1.0
    for k in range(4):
        for f0 in (False, True):
            for f1 in (False, True):
                out = np.asarray(
                    dihedral_image(jnp.asarray(img), jnp.asarray(k),
                                   jnp.asarray(f0), jnp.asarray(f1))
                )
                tc, _ = dihedral_points(
                    jnp.asarray(c), jnp.zeros(1), P, jnp.asarray(k),
                    jnp.asarray(f0), jnp.asarray(f1),
                )
                r, cc = np.asarray(tc)[0].astype(int)
                assert out[r, cc, 0] == 1.0


def test_augment_batch_shapes_and_range():
    rng = np.random.default_rng(2)
    imgs = (rng.random((4, P, P, 3)) * 255).astype(np.uint8)
    _, _, cen, par, val = _random_case(rng, 4)
    cen_b = np.tile(cen[None], (4, 1, 1))
    par_b = np.tile(par[None], (4, 1, 1))
    val_b = np.tile(val[None], (4, 1))
    out, c2, p2, v2 = jax.jit(augment_batch)(
        jax.random.PRNGKey(0), imgs, cen_b, par_b, val_b
    )
    assert out.shape == (4, P, P, 3) and out.dtype == jnp.float32
    assert float(jnp.min(out)) >= 0.0 and float(jnp.max(out)) <= 1.0
    # valid mask rides through; angles stay in [0, pi)
    np.testing.assert_array_equal(np.asarray(v2), val_b)
    ang = np.asarray(p2)[..., 2][np.asarray(v2)]
    assert np.all((ang >= 0) & (ang < np.pi + 1e-6))
