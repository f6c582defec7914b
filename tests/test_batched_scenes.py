"""Batched multi-scene exact inference: N scenes share one shape-bucketed
program signature, vmapped into one launch sequence — results must be
BIT-IDENTICAL to per-scene sequential runs with the same seeds/capacity
(the same property the sharded scene pins vs single-device)."""

import numpy as np
import pytest

from mpp_cnn_rs_object_detection_tpu.mpp import combinators as comb_lib
from mpp_cnn_rs_object_detection_tpu.mpp.energy_setups import (
    NoCalibrationEnergySetup,
)
from mpp_cnn_rs_object_detection_tpu.mpp.image_data import ImageWMaps
from mpp_cnn_rs_object_detection_tpu.mpp.rjmcmc import RJMCMCParams
from mpp_cnn_rs_object_detection_tpu.mpp.scene import (
    run_exact_scene,
    run_exact_scenes_batched,
)
from mpp_cnn_rs_object_detection_tpu.ops.mappings import default_mappings

C = 8


def _scene(seed: int, n_obj: int = 6, hw=(64, 64)) -> ImageWMaps:
    rng = np.random.default_rng(seed)
    h, w = hw
    gy, gx = np.mgrid[:h, :w]
    centers = rng.integers(10, [h - 10, w - 10], size=(n_obj, 2)).astype(
        np.float32
    )
    det = np.zeros((h, w))
    for c in centers:
        det += np.exp(-((gy - c[0]) ** 2 + (gx - c[1]) ** 2) / (2 * 2.0**2))
    det = np.clip(det, 0, 1).astype(np.float32)
    dist = np.full((h, w, C), 1.0, np.float32)
    dist[..., 3] = 6.0
    dist /= dist.sum(-1, keepdims=True)
    mappings = default_mappings(C, 0, 16)
    marks = np.tile(np.asarray([[5.0, 0.5, 0.3]], np.float32), (n_obj, 1))
    return ImageWMaps(
        image=np.stack([det] * 3, -1), name=f"s{seed}", shape=(h, w),
        detection_map=det, param_dist_maps=[dist.copy() for _ in range(3)],
        mappings=mappings,
        labels={"centers": centers,
                "parameters": np.tile(np.asarray([[3.0, 7.0, 0.3]],
                                                 np.float32), (n_obj, 1)),
                "categories": np.zeros(n_obj, np.int32),
                "difficult": np.zeros(n_obj, bool)},
        gt_centers=centers, gt_marks=marks,
    )


@pytest.mark.quick
def test_batched_matches_sequential():
    rng = np.random.default_rng(0)
    datas_seq = [_scene(1), _scene(2, n_obj=4)]
    datas_bat = [_scene(1), _scene(2, n_obj=4)]
    setup = NoCalibrationEnergySetup()
    setup.calibrate(datas_seq, rng, save_path="")
    comb = comb_lib.sum_combiner(setup.spec.names)
    params = RJMCMCParams(
        n_steps=320, alpha_t=0.98, n_samples=0, samples_interval=16
    )
    seeds = [7, 11]

    seq = [
        run_exact_scene(d, setup, comb, params, seed=s, capacity=128,
                        segment_size=128)
        for d, s in zip(datas_seq, seeds)
    ]
    bat = run_exact_scenes_batched(
        datas_bat, setup, comb, params, seeds=seeds, capacity=128,
        segment_size=128,
    )

    assert len(bat) == len(seq) == 2
    for r_seq, r_bat in zip(seq, bat):
        assert len(r_seq.centers) > 0
        np.testing.assert_array_equal(r_bat.centers, r_seq.centers)
        np.testing.assert_array_equal(r_bat.marks, r_seq.marks)
        np.testing.assert_allclose(r_bat.scores, r_seq.scores, rtol=1e-5,
                                   atol=1e-6)


def test_batched_checkpoint_resume(tmp_path):
    rng = np.random.default_rng(0)
    datas_a = [_scene(3), _scene(4)]
    datas_b = [_scene(3), _scene(4)]
    setup = NoCalibrationEnergySetup()
    setup.calibrate(datas_a, rng, save_path="")
    comb = comb_lib.sum_combiner(setup.spec.names)
    params = RJMCMCParams(
        n_steps=320, alpha_t=0.98, n_samples=0, samples_interval=16
    )
    seeds = [5, 6]

    full = run_exact_scenes_batched(
        datas_a, setup, comb, params, seeds=seeds, capacity=128,
        segment_size=128,
    )

    # simulate a kill after the first segment: run with a checkpoint path,
    # truncating via a monkeypatched segment budget is intrusive — instead
    # resume from a manually saved mid-run is covered by fingerprint
    # matching; here we only pin that a completed run removes its checkpoint
    ck = str(tmp_path / "batch.ck.npz")
    again = run_exact_scenes_batched(
        datas_b, setup, comb, params, seeds=seeds, capacity=128,
        segment_size=128, checkpoint_path=ck,
    )
    import os

    assert not os.path.exists(ck)
    for r_full, r_again in zip(full, again):
        np.testing.assert_array_equal(r_full.centers, r_again.centers)


def test_batched_scenes_sharded_over_mesh():
    """The scenes axis shards over a device mesh with zero collectives —
    results bit-identical to the unsharded batched run."""
    import jax
    from jax.sharding import Mesh

    if len(jax.devices()) < 2:
        pytest.skip("needs the virtual multi-device mesh")

    rng = np.random.default_rng(0)
    datas_a = [_scene(8), _scene(9, n_obj=4)]
    datas_b = [_scene(8), _scene(9, n_obj=4)]
    setup = NoCalibrationEnergySetup()
    setup.calibrate(datas_a, rng, save_path="")
    comb = comb_lib.sum_combiner(setup.spec.names)
    params = RJMCMCParams(
        n_steps=320, alpha_t=0.98, n_samples=0, samples_interval=16
    )
    seeds = [13, 17]

    plain = run_exact_scenes_batched(
        datas_a, setup, comb, params, seeds=seeds, capacity=128,
        segment_size=128,
    )
    mesh = Mesh(np.asarray(jax.devices()[:2]), ("scenes",))
    sharded = run_exact_scenes_batched(
        datas_b, setup, comb, params, seeds=seeds, capacity=128,
        segment_size=128, mesh=mesh,
    )
    for r_p, r_s in zip(plain, sharded):
        assert len(r_p.centers) > 0
        np.testing.assert_array_equal(r_s.centers, r_p.centers)
        np.testing.assert_array_equal(r_s.marks, r_p.marks)
        np.testing.assert_allclose(r_s.scores, r_p.scores, rtol=1e-5,
                                   atol=1e-6)
