"""CNN-free contrast/gradient energies (reference classics.py) and the
contrast energy setup."""

import jax
import jax.numpy as jnp
import numpy as np

from mpp_cnn_rs_object_detection_tpu.data.label_processing import rect_mask
from mpp_cnn_rs_object_detection_tpu.mpp.classic_energies import (
    ContrastConfig,
    contrast_energy_points,
    gradient_energy_points,
)


def _scene():
    img = np.zeros((64, 64, 3), np.float32) + 0.2
    m = rect_mask((64, 64), (32, 32), 5, 10, 0.5)
    img[m] = 0.9
    return img


def test_contrast_energy_discriminates():
    img = jnp.asarray(_scene())
    xy = jnp.array([[32.0, 32.0], [10.0, 10.0]])
    marks = jnp.array([[7.5, 0.5, 0.5], [7.5, 0.5, 0.5]])
    for measure in ["craciun2", "craciun", "mean", "t-test", "lafarge"]:
        cfg = ContrastConfig(measure=measure, rgb=measure != "t-test")
        e = np.asarray(contrast_energy_points(img, xy, marks, cfg))
        assert e[0] < e[1], (measure, e)  # on-target rect = lower energy


def test_gradient_energy_discriminates():
    img = _scene()
    grad = np.stack(np.gradient(img.mean(-1)), axis=-1)
    xy = jnp.array([[32.0, 32.0], [10.0, 10.0]])
    marks = jnp.array([[7.5, 0.5, 0.5], [7.5, 0.5, 0.5]])
    g = np.asarray(gradient_energy_points(jnp.asarray(grad), xy, marks))
    assert g[0] < g[1], g


def test_contrast_setup_energy_vectors():
    from mpp_cnn_rs_object_detection_tpu.mpp.energies import energy_vectors
    from mpp_cnn_rs_object_detection_tpu.mpp.energy_setups import (
        ContrastMeasureEnergySetup,
    )
    from mpp_cnn_rs_object_detection_tpu.mpp.image_data import ImageWMaps
    from mpp_cnn_rs_object_detection_tpu.mpp.state import state_from_arrays
    from mpp_cnn_rs_object_detection_tpu.ops.mappings import default_mappings

    img = _scene()
    mappings = default_mappings(8, 0, 16)
    data = ImageWMaps(
        image=img,
        name="t",
        shape=img.shape[:2],
        detection_map=np.zeros(img.shape[:2], np.float32),
        param_dist_maps=[np.full((64, 64, 8), 1 / 8, np.float32)] * 3,
        mappings=mappings,
        labels={},
        gt_centers=np.array([[32.0, 32.0]]),
        gt_marks=np.array([[7.5, 0.5, 0.5]]),
    )
    setup = ContrastMeasureEnergySetup(contrast_type="craciun2")
    setup.calibrate([data], np.random.default_rng(0), save_path=None)
    maps = setup.make_maps(data)
    st = state_from_arrays([[32, 32]], [[7.5, 0.5, 0.5]], capacity=4)
    vec = np.asarray(energy_vectors(st, maps, setup.spec))
    assert vec.shape == (4, 5)
    assert vec[0, 0] < 0  # contrast term rewards the true rect
    assert vec[0, setup.spec.index("RatioPriorEnergy")] == 0.0  # |0.5-0.5|


def test_contrast_cache_consistency():
    """The cached sampler path must agree with the dense recompute for the
    contrast data term too."""
    from mpp_cnn_rs_object_detection_tpu.mpp import combinators as comb_lib
    from mpp_cnn_rs_object_detection_tpu.mpp.energies import total_energy
    from mpp_cnn_rs_object_detection_tpu.mpp.energy_setups import (
        ContrastMeasureEnergySetup,
    )
    from mpp_cnn_rs_object_detection_tpu.mpp.image_data import ImageWMaps
    from mpp_cnn_rs_object_detection_tpu.mpp.kernels import (
        apply_proposal,
        make_kernel_data,
        sample_proposal,
    )
    from mpp_cnn_rs_object_detection_tpu.mpp.rjmcmc import (
        build_cache,
        energy_from_cache,
        update_cache,
    )
    from mpp_cnn_rs_object_detection_tpu.mpp.state import state_from_arrays
    from mpp_cnn_rs_object_detection_tpu.ops.mappings import default_mappings

    img = _scene()
    mappings = default_mappings(8, 0, 16)
    data = ImageWMaps(
        image=img, name="t", shape=img.shape[:2],
        detection_map=np.full(img.shape[:2], 0.1, np.float32),
        param_dist_maps=[np.full((64, 64, 8), 1 / 8, np.float32)] * 3,
        mappings=mappings, labels={},
        gt_centers=np.array([[32.0, 32.0]]),
        gt_marks=np.array([[7.5, 0.5, 0.5]]),
    )
    setup = ContrastMeasureEnergySetup(contrast_type="craciun2")
    setup.calibrate([data], np.random.default_rng(0), save_path=None)
    maps = setup.make_maps(data)
    kd = make_kernel_data(
        data.detection_map, data.param_dist_maps, mappings, intensity=2.0
    )
    comb = comb_lib.sum_combiner(setup.spec.names)
    st = state_from_arrays(
        [[32, 32], [20, 20]], [[7.5, 0.5, 0.5], [6.0, 0.5, 0.0]], capacity=4
    )
    cache = build_cache(st, maps, setup.spec)
    key = jax.random.PRNGKey(0)
    for _ in range(12):
        key, k1, k2 = jax.random.split(key, 3)
        kidx = jax.random.randint(k1, (), 0, 8)
        prop = sample_proposal(k2, kidx, st, kd)
        st = apply_proposal(st, prop)
        cache = update_cache(
            st, maps, setup.spec, cache, jnp.clip(prop.slot, 0, 3)
        )
        e_cache = float(energy_from_cache(st, maps, setup.spec, comb, cache))
        e_full = float(total_energy(st, maps, setup.spec, comb))
        np.testing.assert_allclose(e_cache, e_full, rtol=1e-3, atol=1e-4)
