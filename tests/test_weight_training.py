"""Energy-combination weight learning: both criteria move the weights in a
direction that separates GT from perturbed configurations."""

import jax
import numpy as np
import pytest

from mpp_cnn_rs_object_detection_tpu.mpp import combinators as comb_lib
from mpp_cnn_rs_object_detection_tpu.mpp.energy_setups import (
    NoCalibrationEnergySetup,
)
from mpp_cnn_rs_object_detection_tpu.mpp.image_data import ImageWMaps
from mpp_cnn_rs_object_detection_tpu.ops.mappings import default_mappings

H = W = 64
C = 8


def _fake_crops(n=4, n_obj=6, seed=0):
    rng = np.random.default_rng(seed)
    mappings = default_mappings(C, 0, 16)
    crops = []
    for i in range(n):
        centers = rng.integers(8, H - 8, size=(n_obj, 2)).astype(np.float32)
        marks = np.stack(
            [
                rng.uniform(4, 10, n_obj),
                rng.uniform(0.3, 0.8, n_obj),
                rng.uniform(0, np.pi, n_obj),
            ],
            -1,
        ).astype(np.float32)
        gy, gx = np.mgrid[:H, :W]
        det = np.zeros((H, W), np.float32)
        for c in centers:
            det += np.exp(-((gy - c[0]) ** 2 + (gx - c[1]) ** 2) / 8.0)
        det = np.clip(det, 0, 1)
        dist = np.full((H, W, C), 1 / C, np.float32)
        crops.append(
            ImageWMaps(
                image=rng.random((H, W, 3)).astype(np.float32),
                name=f"c{i}",
                shape=(H, W),
                detection_map=det,
                param_dist_maps=[dist] * 3,
                mappings=mappings,
                labels={},
                gt_centers=centers,
                gt_marks=marks,
            )
        )
    return crops


@pytest.fixture(scope="module")
def setup():
    crops = _fake_crops()
    setup = NoCalibrationEnergySetup(ratio_prior=True)
    setup.calibrate(crops, np.random.default_rng(0), save_path=None)
    return crops, setup


def test_integral_criterion_learns(setup):
    from mpp_cnn_rs_object_detection_tpu.mpp.train_weights import (
        train_integral_criterion,
    )

    crops, es = setup
    comb = train_integral_criterion(
        crops, es, logger=None, save_dir=None, rng=np.random.default_rng(1),
        n_epochs=2, samples_per_image=4, weight_model_type="logistic",
        batch_size=2, capacity=32,
    )
    report = comb_lib.combiner_as_report_dict(comb)
    moved = [abs(v - 1.0) for k, v in report.items() if k.endswith("_weight")]
    assert max(moved) > 1e-3, report
    # GT should now have lower energy than strong perturbations on average
    from mpp_cnn_rs_object_detection_tpu.mpp.energies import (
        energy_vectors,
        total_energy,
    )
    from mpp_cnn_rs_object_detection_tpu.mpp.perturbations import (
        PERTURBATION_STRONG,
        sample_perturbed_batch,
    )
    from mpp_cnn_rs_object_detection_tpu.mpp.train_weights import prepare_batch

    maps_b, kd_b, gt_b = prepare_batch(crops[:2], es, capacity=32)
    u_gt = []
    u_neg = []
    for i in range(2):
        maps_i = jax.tree_util.tree_map(lambda x: x[i], maps_b)
        gt_i = jax.tree_util.tree_map(lambda x: x[i], gt_b)
        kd_i = jax.tree_util.tree_map(lambda x: x[i], kd_b)
        u_gt.append(float(total_energy(gt_i, maps_i, es.spec, comb)))
        negs = sample_perturbed_batch(
            jax.random.PRNGKey(i), gt_i, kd_i, (H, W), PERTURBATION_STRONG, 4
        )
        for s in range(4):
            neg_s = jax.tree_util.tree_map(lambda x: x[s], negs)
            u_neg.append(float(total_energy(neg_s, maps_i, es.spec, comb)))
    assert np.mean(u_gt) < np.mean(u_neg), (np.mean(u_gt), np.mean(u_neg))


def test_ordering_criterion_learns_separation(setup):
    """The flagship mpp_log mode: after training, kernel perturbations of GT
    must raise the combined energy on average (the criterion's objective,
    reference train_ordering_criterion.py:43-219) — and GT energy must sit
    below strong perturbations, as asserted for the integral criterion."""
    from mpp_cnn_rs_object_detection_tpu.mpp.energies import total_energy
    from mpp_cnn_rs_object_detection_tpu.mpp.perturbations import (
        PERTURBATION_STRONG,
        sample_perturbed_batch,
    )
    from mpp_cnn_rs_object_detection_tpu.mpp.train_weights import (
        prepare_batch,
        train_ordering_criterion,
    )

    crops, es = setup
    comb = train_ordering_criterion(
        crops, es, logger=None, save_dir=None, rng=np.random.default_rng(2),
        n_epochs=3, weight_model_type="logistic", batch_size=2, capacity=32,
    )
    report = comb_lib.combiner_as_report_dict(comb)
    moved = [abs(v - 1.0) for k, v in report.items() if k.endswith("_weight")]
    assert max(moved) > 1e-3, report

    maps_b, kd_b, gt_b = prepare_batch(crops[:2], es, capacity=32)
    u_gt, u_neg = [], []
    for i in range(2):
        maps_i = jax.tree_util.tree_map(lambda x: x[i], maps_b)
        gt_i = jax.tree_util.tree_map(lambda x: x[i], gt_b)
        kd_i = jax.tree_util.tree_map(lambda x: x[i], kd_b)
        u_gt.append(float(total_energy(gt_i, maps_i, es.spec, comb)))
        negs = sample_perturbed_batch(
            jax.random.PRNGKey(10 + i), gt_i, kd_i, (H, W),
            PERTURBATION_STRONG, 4,
        )
        for s in range(4):
            neg_s = jax.tree_util.tree_map(lambda x: x[s], negs)
            u_neg.append(float(total_energy(neg_s, maps_i, es.spec, comb)))
    assert np.mean(u_gt) < np.mean(u_neg), (np.mean(u_gt), np.mean(u_neg))
