"""Energy attribution figures (reference ``show_shap_values.py`` re-derived
with integrated gradients), the image-sequence viewer, and mid-anneal scene
checkpoint/resume."""

import os

import jax
import numpy as np

from mpp_cnn_rs_object_detection_tpu.mpp import combinators as comb_lib
from mpp_cnn_rs_object_detection_tpu.mpp.figures import (
    attribution_summary_plot,
    energy_attribution,
    interaction_figure,
)
from mpp_cnn_rs_object_detection_tpu.ops.mappings import default_mappings

NAMES = ("PositionEnergy", "ShapeEnergy", "RectangleOverlapEnergy",
         "ShapeAlignmentEnergy", "AreaPriorEnergy")


def test_attribution_exact_for_linear():
    comb = comb_lib.linear(NAMES)
    comb = comb.replace(
        params={
            "weights": np.asarray([2.0, -1.0, 0.5, 0.0, 3.0], np.float32),
            "bias": np.asarray(0.7, np.float32),
        }
    )
    rng = np.random.default_rng(0)
    x = rng.standard_normal((12, 5)).astype(np.float32)
    attr = energy_attribution(comb, x)
    # IG of a linear model is exactly w * x, independent of step count
    np.testing.assert_allclose(
        attr, x * np.asarray(comb.params["weights"]), rtol=1e-5, atol=1e-5
    )


def test_attribution_completeness_mlp():
    """IG rows must sum to combine(x) - combine(0) (completeness axiom)."""
    comb = comb_lib.mlp(NAMES, hidden_features=6, hidden_layers=2, seed=3)
    rng = np.random.default_rng(1)
    x = rng.standard_normal((8, 5)).astype(np.float32) * 0.5
    attr = energy_attribution(comb, x, n_steps=256)
    f_x = np.asarray(comb_lib.combine(comb, x))
    f_0 = np.asarray(comb_lib.combine(comb, np.zeros_like(x)))
    np.testing.assert_allclose(attr.sum(-1), f_x - f_0, rtol=5e-2, atol=5e-3)


def test_attribution_summary_plot(tmp_path):
    comb = comb_lib.logistic(NAMES)
    x = np.random.default_rng(2).standard_normal((20, 5)).astype(np.float32)
    attr = energy_attribution(comb, x)
    out = str(tmp_path / "summary.png")
    attribution_summary_plot(attr, x, list(NAMES), out)
    assert os.path.getsize(out) > 0


def _small_scene():
    from mpp_cnn_rs_object_detection_tpu.mpp.image_data import ImageWMaps

    H = W = 64
    C = 8
    mappings = default_mappings(n_classes=C, size_min=0, size_max=16)
    centers = np.asarray([(16, 16), (44, 40), (16, 48)], np.float32)
    gy, gx = np.mgrid[:H, :W]
    det = np.zeros((H, W))
    for c in centers:
        det += np.exp(-((gy - c[0]) ** 2 + (gx - c[1]) ** 2) / (2 * 2.0**2))
    det = np.clip(det, 0, 1).astype(np.float32)
    dist = np.full((H, W, C), 1.0 / C, np.float32)
    dist[..., 3] = 3.0 / C
    dist /= dist.sum(-1, keepdims=True)
    marks = np.tile(np.asarray([[5.0, 0.5, 0.3]], np.float32), (3, 1))
    data = ImageWMaps(
        image=np.stack([det] * 3, -1),
        name="ck",
        shape=(H, W),
        detection_map=det,
        param_dist_maps=[dist] * 3,
        mappings=mappings,
        labels={
            "centers": centers,
            "parameters": np.tile(
                np.asarray([[3.0, 7.0, 0.3]], np.float32), (3, 1)
            ),
            "categories": np.zeros((3,), np.int32),
            "difficult": np.zeros((3,), bool),
        },
        gt_centers=centers,
        gt_marks=marks,
    )
    return data


def test_interaction_figure(tmp_path):
    from mpp_cnn_rs_object_detection_tpu.mpp.energies import LEGACY_SPEC
    from mpp_cnn_rs_object_detection_tpu.mpp.energy_setups import (
        NoCalibrationEnergySetup,
    )
    from mpp_cnn_rs_object_detection_tpu.mpp.rjmcmc import build_cache
    from mpp_cnn_rs_object_detection_tpu.mpp.state import state_from_arrays

    data = _small_scene()
    setup = NoCalibrationEnergySetup()
    setup.calibrate([data], np.random.default_rng(0), save_path="")
    maps = setup.make_maps(data)
    st = state_from_arrays(data.gt_centers, data.gt_marks, capacity=8)
    cache = build_cache(st, maps, setup.spec)
    out = str(tmp_path / "interactions.png")
    interaction_figure(data.image, st, cache, out, term="overlap")
    assert os.path.getsize(out) > 0


def test_export_frames(tmp_path):
    from mpp_cnn_rs_object_detection_tpu.utils.show_img_seq import export_frames

    frames = [{"img": np.random.rand(8, 8)} for _ in range(3)]

    def draw(i, ax, data):
        ax.imshow(data[i]["img"])

    paths = export_frames(frames, draw, str(tmp_path / "seq"))
    assert len(paths) == 3 and all(os.path.getsize(p) > 0 for p in paths)


def test_scene_mesh_sharded_matches_unsharded():
    """Tile batch sharded over the 8-device mesh must reproduce the
    single-device result exactly (same per-tile keys; tiles padded to the
    mesh size are dropped at merge)."""
    from jax.sharding import Mesh

    from mpp_cnn_rs_object_detection_tpu.mpp.energy_setups import (
        NoCalibrationEnergySetup,
    )
    from mpp_cnn_rs_object_detection_tpu.mpp.rjmcmc import RJMCMCParams
    from mpp_cnn_rs_object_detection_tpu.mpp.scene import run_mpp_on_scene

    data = _small_scene()
    setup = NoCalibrationEnergySetup()
    setup.calibrate([data], np.random.default_rng(0), save_path="")
    comb = comb_lib.sum_combiner(setup.spec.names)
    params = RJMCMCParams(
        n_steps=120, alpha_t=0.98, n_samples=0, samples_interval=8
    )
    common = dict(
        setup=setup, comb=comb, params=params, seed=9,
        patch_size=32, min_overlap=8, capacity=8,
    )
    base = run_mpp_on_scene(data, **common)
    assert base.n_tiles > 1  # actually exercises the tile batch

    mesh = Mesh(np.asarray(jax.devices()).reshape(-1), ("tiles",))
    sharded = run_mpp_on_scene(data, mesh=mesh, **common)
    np.testing.assert_allclose(sharded.centers, base.centers, atol=1e-5)
    np.testing.assert_allclose(sharded.scores, base.scores, rtol=1e-4,
                               atol=1e-5)


def test_scene_checkpoint_resume(tmp_path):
    """A run killed mid-anneal resumes from its segment checkpoint and lands
    exactly where the uninterrupted run does (same keys per segment)."""
    from mpp_cnn_rs_object_detection_tpu.mpp.energy_setups import (
        NoCalibrationEnergySetup,
    )
    from mpp_cnn_rs_object_detection_tpu.mpp.rjmcmc import RJMCMCParams
    from mpp_cnn_rs_object_detection_tpu.mpp.scene import run_mpp_on_scene

    data = _small_scene()
    setup = NoCalibrationEnergySetup()
    setup.calibrate([data], np.random.default_rng(0), save_path="")
    comb = comb_lib.sum_combiner(setup.spec.names)
    params = RJMCMCParams(
        n_steps=160, alpha_t=0.98, n_samples=0, samples_interval=16
    )
    common = dict(
        setup=setup, comb=comb, params=params, seed=5, patch_size=64,
        capacity=16, segment_size=64,
    )

    full = run_mpp_on_scene(data, **common)

    ck = str(tmp_path / "chains.npz")
    crashed = run_mpp_on_scene(data, checkpoint_path=ck, max_segments=1,
                               **common)
    assert crashed is None and os.path.exists(ck)

    resumed = run_mpp_on_scene(data, checkpoint_path=ck, **common)
    assert not os.path.exists(ck), "checkpoint must be removed on completion"
    np.testing.assert_allclose(resumed.centers, full.centers, atol=1e-5)
    np.testing.assert_allclose(resumed.scores, full.scores, rtol=1e-4,
                               atol=1e-5)


def test_scene_split_merge_auto_alpha_samples():
    """A scene run with the 10-kernel mixture (use_split_merge), 'auto'
    annealing, and post-burn-in sample collection exercises the full
    chain-semantics surface (reference sample_rjmcmc.py:38-102)."""
    from mpp_cnn_rs_object_detection_tpu.mpp.energy_setups import (
        NoCalibrationEnergySetup,
    )
    from mpp_cnn_rs_object_detection_tpu.mpp.rjmcmc import RJMCMCParams
    from mpp_cnn_rs_object_detection_tpu.mpp.scene import run_mpp_on_scene

    data = _small_scene()
    setup = NoCalibrationEnergySetup()
    setup.calibrate([data], np.random.default_rng(0), save_path="")
    comb = comb_lib.sum_combiner(setup.spec.names)
    params = RJMCMCParams(
        n_steps=150, t0=1.0, t_target=0.02, alpha_t="auto",
        n_samples=2, samples_interval=8,
    )
    res = run_mpp_on_scene(
        data, setup, comb, params, seed=5, patch_size=32, min_overlap=8,
        capacity=8, use_split_merge=True,
    )
    assert res is not None
    assert np.all(np.isfinite(res.scores))
    assert res.centers.shape[1] == 2 and res.marks.shape[1] == 3
