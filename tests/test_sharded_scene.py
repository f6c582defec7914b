"""Exact sharded-scene MPP: the row-sharded run must reproduce the
single-device whole-scene run exactly (no dedup heuristic anywhere), with
cross-band pair energies exact."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from mpp_cnn_rs_object_detection_tpu.mpp import combinators as comb_lib
from mpp_cnn_rs_object_detection_tpu.mpp.energies import (
    LEGACY_SPEC,
    make_energy_maps,
    total_energy,
)
from mpp_cnn_rs_object_detection_tpu.mpp.kernels import make_kernel_data
from mpp_cnn_rs_object_detection_tpu.mpp.state import (
    empty_state,
    state_from_arrays,
)
from mpp_cnn_rs_object_detection_tpu.ops.mappings import default_mappings
from mpp_cnn_rs_object_detection_tpu.parallel.sharded_scene import (
    run_exact_scene_chain,
)

H, W = 256, 192
C = 8


def _scene(centers):
    mappings = default_mappings(n_classes=C, size_min=0, size_max=16)
    gy, gx = np.mgrid[:H, :W]
    det = np.zeros((H, W))
    for c in centers:
        det += np.exp(-((gy - c[0]) ** 2 + (gx - c[1]) ** 2) / (2 * 2.0**2))
    det = np.clip(det, 0, 1)
    dist = np.full((H, W, C), 1.0 / C, np.float32)
    dist[..., 3] = 3.0 / C
    dist /= dist.sum(-1, keepdims=True)
    maps = make_energy_maps(det, [-dist] * 3, 0.5, 4.0, 200.0, mappings)
    kd = make_kernel_data(det, [dist] * 3, mappings, intensity=len(centers))
    comb = comb_lib.manual_hierarchical(
        LEGACY_SPEC.names,
        {
            "PositionEnergy": 1.0,
            "ShapeEnergy": 0.25,
            "RectangleOverlapEnergy": 0.75,
            "ShapeAlignmentEnergy": 0.1,
            "AreaPriorEnergy": 0.25,
        },
    )
    return maps, kd, comb, det


# centers straddling the 2-way (row 128) and 4-way (rows 64/192) band
# borders — cross-border interactions must be exact
CENTERS = [(30, 30), (126, 100), (131, 103), (63, 160), (66, 158),
           (200, 50), (192, 52), (100, 30)]


@pytest.mark.parametrize("n_dev", [2, 4])
def test_sharded_matches_single_device(n_dev):
    maps, kd, comb, det = _scene(CENTERS)
    init = empty_state(capacity=32)
    key = jax.random.PRNGKey(7)

    base_state, base_cache, base_stats = run_exact_scene_chain(
        key, init, maps, LEGACY_SPEC, comb, kd, n_supersteps=400,
        t0=1.0, alpha_t=0.985, t_target=0.0, mesh=None,
    )
    mesh = Mesh(np.asarray(jax.devices()[:n_dev]), ("rows",))
    sh_state, sh_cache, sh_stats = run_exact_scene_chain(
        key, init, maps, LEGACY_SPEC, comb, kd, n_supersteps=400,
        t0=1.0, alpha_t=0.985, t_target=0.0, mesh=mesh,
    )
    assert int(base_state.n_points) > 0  # the run actually did something
    np.testing.assert_array_equal(
        np.asarray(sh_state.alive), np.asarray(base_state.alive)
    )
    np.testing.assert_allclose(
        np.asarray(sh_state.xy), np.asarray(base_state.xy), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(sh_state.marks), np.asarray(base_state.marks), atol=1e-5
    )
    np.testing.assert_allclose(
        float(sh_stats.final_energy), float(base_stats.final_energy),
        rtol=1e-4, atol=1e-4,
    )
    assert int(sh_stats.accepted.sum()) == int(base_stats.accepted.sum())


def test_sharded_energy_bookkeeping_exact_across_borders():
    """Tracked energy after a sharded run equals a fresh full recompute —
    any missed cross-band pair interaction would break this."""
    maps, kd, comb, det = _scene(CENTERS)
    init = empty_state(capacity=32)
    mesh = Mesh(np.asarray(jax.devices()[:4]), ("rows",))
    state, cache, stats = run_exact_scene_chain(
        jax.random.PRNGKey(3), init, maps, LEGACY_SPEC, comb, kd,
        n_supersteps=400, t0=1.0, alpha_t=0.985, t_target=0.0, mesh=mesh,
    )
    u_fresh = float(total_energy(state, maps, LEGACY_SPEC, comb))
    np.testing.assert_allclose(
        float(stats.final_energy), u_fresh, rtol=1e-3, atol=1e-3
    )


def test_segmented_continuation_matches():
    """Two segments threading (state, cache) equal one combined run with the
    same key schedule per segment."""
    maps, kd, comb, det = _scene(CENTERS)
    init = empty_state(capacity=16)
    k1, k2 = jax.random.PRNGKey(0), jax.random.PRNGKey(1)
    mesh = Mesh(np.asarray(jax.devices()[:2]), ("rows",))

    s_a, c_a, _ = run_exact_scene_chain(
        k1, init, maps, LEGACY_SPEC, comb, kd, n_supersteps=60,
        alpha_t=0.99, mesh=mesh,
    )
    s_b, c_b, _ = run_exact_scene_chain(
        k2, s_a, maps, LEGACY_SPEC, comb, kd, n_supersteps=60,
        alpha_t=0.99, mesh=mesh, cache=c_a, t0=0.99**60,
    )
    # single-device continuation with identical schedule
    s_c, c_c, _ = run_exact_scene_chain(
        k1, init, maps, LEGACY_SPEC, comb, kd, n_supersteps=60,
        alpha_t=0.99, mesh=None,
    )
    s_d, _, _ = run_exact_scene_chain(
        k2, s_c, maps, LEGACY_SPEC, comb, kd, n_supersteps=60,
        alpha_t=0.99, mesh=None, cache=c_c, t0=0.99**60,
    )
    np.testing.assert_array_equal(
        np.asarray(s_b.alive), np.asarray(s_d.alive)
    )
    np.testing.assert_allclose(
        np.asarray(s_b.xy), np.asarray(s_d.xy), atol=1e-5
    )


def test_run_mpp_on_scene_exact_mode():
    """The product route: run_mpp_on_scene(scene_mode='exact') returns scored
    detections with no tiling/dedup, sharded or not."""
    from mpp_cnn_rs_object_detection_tpu.mpp.energy_setups import (
        NoCalibrationEnergySetup,
    )
    from mpp_cnn_rs_object_detection_tpu.mpp.image_data import ImageWMaps
    from mpp_cnn_rs_object_detection_tpu.mpp.rjmcmc import RJMCMCParams
    from mpp_cnn_rs_object_detection_tpu.mpp.scene import run_mpp_on_scene

    rng = np.random.default_rng(0)
    mappings = default_mappings(n_classes=C, size_min=0, size_max=16)
    centers = np.asarray(CENTERS, np.float32)
    gy, gx = np.mgrid[:H, :W]
    det = np.zeros((H, W), np.float32)
    for c in centers:
        det += np.exp(-((gy - c[0]) ** 2 + (gx - c[1]) ** 2) / 8.0)
    det = np.clip(det, 0, 1)
    dist = np.full((H, W, C), 1.0 / C, np.float32)
    marks = np.tile(np.asarray([[5.0, 0.5, 0.3]], np.float32),
                    (len(centers), 1))
    data = ImageWMaps(
        image=np.stack([det] * 3, -1), name="exact", shape=(H, W),
        detection_map=det, param_dist_maps=[dist] * 3, mappings=mappings,
        labels={"centers": centers,
                "parameters": np.tile(
                    np.asarray([[3.0, 7.0, 0.3]], np.float32),
                    (len(centers), 1)),
                "categories": np.zeros(len(centers), np.int32),
                "difficult": np.zeros(len(centers), bool)},
        gt_centers=centers, gt_marks=marks,
    )
    setup = NoCalibrationEnergySetup()
    setup.calibrate([data], rng, save_path="")
    comb = comb_lib.sum_combiner(setup.spec.names)
    params = RJMCMCParams(n_steps=3000, alpha_t=0.995, n_samples=0,
                          samples_interval=1)
    mesh = Mesh(np.asarray(jax.devices()[:2]), ("rows",))
    res = run_mpp_on_scene(
        data, setup, comb, params, seed=3, capacity=32,
        scene_mode="exact", mesh=mesh,
    )
    assert res is not None and res.n_tiles == 2
    assert np.all(np.isfinite(res.scores))
    res1 = run_mpp_on_scene(
        data, setup, comb, params, seed=3, capacity=32, scene_mode="exact",
    )
    np.testing.assert_allclose(res.centers, res1.centers, atol=1e-5)


def test_run_exact_scene_restarts_best_of_n(caplog):
    """inference.restarts: N vmapped annealing lanes, lowest final energy
    kept. Deterministic for a fixed seed; the selection log proves the
    batched path ran and picked the argmin lane."""
    import logging as _logging

    from mpp_cnn_rs_object_detection_tpu.mpp.energy_setups import (
        NoCalibrationEnergySetup,
    )
    from mpp_cnn_rs_object_detection_tpu.mpp.image_data import ImageWMaps
    from mpp_cnn_rs_object_detection_tpu.mpp.rjmcmc import RJMCMCParams
    from mpp_cnn_rs_object_detection_tpu.mpp.scene import run_mpp_on_scene

    rng = np.random.default_rng(0)
    mappings = default_mappings(n_classes=C, size_min=0, size_max=16)
    centers = np.asarray(CENTERS[:5], np.float32)
    gy, gx = np.mgrid[:H, :W]
    det = np.zeros((H, W), np.float32)
    for c in centers:
        det += np.exp(-((gy - c[0]) ** 2 + (gx - c[1]) ** 2) / 8.0)
    det = np.clip(det, 0, 1)
    dist = np.full((H, W, C), 1.0 / C, np.float32)
    marks = np.tile(np.asarray([[5.0, 0.5, 0.3]], np.float32),
                    (len(centers), 1))
    data = ImageWMaps(
        image=np.stack([det] * 3, -1), name="restarts", shape=(H, W),
        detection_map=det, param_dist_maps=[dist] * 3, mappings=mappings,
        labels={"centers": centers,
                "parameters": np.tile(
                    np.asarray([[3.0, 7.0, 0.3]], np.float32),
                    (len(centers), 1)),
                "categories": np.zeros(len(centers), np.int32),
                "difficult": np.zeros(len(centers), bool)},
        gt_centers=centers, gt_marks=marks,
    )
    setup = NoCalibrationEnergySetup()
    setup.calibrate([data], rng, save_path="")
    comb = comb_lib.sum_combiner(setup.spec.names)
    params = RJMCMCParams(n_steps=1500, alpha_t=0.995, n_samples=0,
                          samples_interval=1)
    with caplog.at_level(_logging.INFO):
        res = run_mpp_on_scene(
            data, setup, comb, params, seed=7, capacity=32,
            scene_mode="exact", restarts=3,
        )
    assert res is not None
    assert np.all(np.isfinite(res.scores)) and len(res.centers) > 0
    sel = [r for r in caplog.records if "best-of-3 restarts" in r.message]
    assert len(sel) == 1, [r.message for r in caplog.records]
    # the logged lane is the argmin of the logged energies
    msg = sel[0].message
    energies = eval(msg.split("energies ")[1].split(" -> ")[0])
    lane = int(msg.rsplit("lane ", 1)[1])
    assert lane == int(np.argmin(energies)) and len(energies) == 3

    res2 = run_mpp_on_scene(
        data, setup, comb, params, seed=7, capacity=32,
        scene_mode="exact", restarts=3,
    )
    np.testing.assert_allclose(res.centers, res2.centers, atol=1e-5)
    np.testing.assert_allclose(res.scores, res2.scores, atol=1e-4)


def test_scene_shape_bucket_signature_sharing():
    """Real scenes land on SQUARE pow2*256 buckets (one compile signature
    per val split); small scenes stay proportionate at the 2*CELL quantum."""
    from mpp_cnn_rs_object_detection_tpu.mpp.scene import scene_shape_bucket

    # the DOTA_gsd50 val split: three sizes, ONE shared signature
    assert {scene_shape_bucket(*hw) for hw in
            [(469, 753), (926, 958), (915, 925)]} == {(1024, 1024)}
    # small scenes (tests/crops) keep tight 2*CELL quanta, not pow2 squares
    assert scene_shape_bucket(256, 192) == (256, 192)
    assert scene_shape_bucket(200, 130) == (256, 192)
    # mesh divisibility: every band must hold >= 2*CELL rows per device
    th, tw = scene_shape_bucket(926, 958, n_dev=8)
    assert th % 8 == 0 and (th, tw) == (1024, 1024)
    th, _ = scene_shape_bucket(256, 192, n_dev=8)
    assert th % 8 == 0 and th >= 2 * 32 * 8


def test_sharded_matches_single_device_with_split_merge():
    """Bit-equality of sharded vs single-device chains holds with the
    superstep split/merge pair enabled (round 5): the two-slot proposal
    records (slot2/xy2/marks2 + second-point unaries) must psum-merge over
    the mesh exactly like the single-slot records."""
    maps, kd, comb, det = _scene(CENTERS)
    init = empty_state(capacity=32)
    key = jax.random.PRNGKey(11)

    base_state, _, base_stats = run_exact_scene_chain(
        key, init, maps, LEGACY_SPEC, comb, kd, n_supersteps=400,
        t0=1.0, alpha_t=0.985, t_target=0.0, mesh=None, split_merge=True,
    )
    mesh = Mesh(np.asarray(jax.devices()[:2]), ("rows",))
    sh_state, _, sh_stats = run_exact_scene_chain(
        key, init, maps, LEGACY_SPEC, comb, kd, n_supersteps=400,
        t0=1.0, alpha_t=0.985, t_target=0.0, mesh=mesh, split_merge=True,
    )
    assert int(base_state.n_points) > 0
    np.testing.assert_array_equal(
        np.asarray(sh_state.alive), np.asarray(base_state.alive)
    )
    np.testing.assert_allclose(
        np.asarray(sh_state.xy), np.asarray(base_state.xy), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(sh_state.marks), np.asarray(base_state.marks), atol=1e-5
    )
    np.testing.assert_allclose(
        float(sh_stats.final_energy), float(base_stats.final_energy),
        rtol=1e-4, atol=1e-4,
    )
