"""Full-pipeline MPP test on synthetic data: posnet + shapenet tiny training
-> result pickles -> MPP calibrate + manual weights -> scene inference -> DOTA
eval; plus the ordering-criterion weight learning path (SURVEY.md §3.2/§3.3
call stacks)."""

import json
import os
import pickle

import numpy as np
import pytest


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    ws = tmp_path_factory.mktemp("mpp_ws")
    (ws / "data").mkdir()
    (ws / "models_storage").mkdir()
    with open(ws / "paths_config.json", "w") as f:
        json.dump(
            {
                "dataset_path": [str(ws / "data")],
                "model_path": [str(ws / "models_storage")],
            },
            f,
        )
    old = os.getcwd()
    os.chdir(ws)
    from mpp_cnn_rs_object_detection_tpu.data.synth import make_synth_dataset

    make_synth_dataset(name="synth_m", n_items=3, shape=(64, 64), n_rect=14, seed=7)

    # tiny posnet + shapenet, trained 2 epochs each
    from mpp_cnn_rs_object_detection_tpu.models.posnet_model import PosNetModel
    from mpp_cnn_rs_object_detection_tpu.models.shapenet_model import ShapeNetModel

    pos_cfg = {
        "model_name": "pos_m",
        "data_loader": {
            "dataset": "synth_m",
            "dataset_update_interval": 8,
            "patch_maker_params": {
                "patch_size": 32, "n_patches": 24,
                "unf_sampler_weight": 0.4, "obj_sampler_weight": 0.6,
                "obj_sampler_sigma": 4,
            },
        },
        "trainer": {"n_epochs": 2, "batch_size": 4},
        "div_clf_model": True,
        "model": {"hidden_dims": [8, 16]},
        "loss": {
            "learning_rate": 2e-3, "target_mode": "uvec", "max_distance": 8,
            "learn_mask": True, "compute_relevant": True,
            "balanced_mask_loss": True, "focal_loss": False,
            "vec_loss_on_prod": True, "bin_map_dil": 0.6,
        },
        "mappings": {"size_mapping_min": 0, "size_mapping_max": 16},
    }
    shape_cfg = {
        "model_name": "shape_m",
        "data_loader": {
            "dataset": "synth_m",
            "dataset_update_interval": 8,
            "patch_maker_params": {
                "patch_size": 32, "n_patches": 24,
                "unf_sampler_weight": 0.4, "obj_sampler_weight": 0.6,
                "obj_sampler_sigma": 4,
            },
        },
        "trainer": {"n_epochs": 2, "n_classes": 8, "batch_size": 4},
        "model": {"hidden_dims": [8, 16]},
        "loss": {"learning_rate": 2e-3, "mask_mode": "shapes"},
        "mappings": {"size_mapping_min": 0, "size_mapping_max": 16},
        "inference": {"pos_model": "pos_m"},
    }
    m = PosNetModel(pos_cfg, overwrite=True, train=True)
    m.train()
    s = ShapeNetModel(shape_cfg, overwrite=True, train=True)
    s.train()
    yield ws
    os.chdir(old)


def _mpp_config(name="mpp_m", extra=None):
    cfg = {
        "model_name": name,
        "dataset": {
            "dataset": "synth_m",
            "position_model": "pos_m",
            "shape_model": "shape_m",
            "patch_size": 64,
        },
        "capacity": 48,
        "data_loader": {"batch_size": 2},
        "calibration": {"n_images": 3},
        "inference": {
            "rjmcmc_params": {
                "samples_interval": 1,
                "init_temperature": 1,
                "target_temperature": 0.0,
                "alpha_t": 0.995,
                "burn_in": 1200,
            },
            "max_score": 4.0,
            # exercise detection-map score blending (w=0 would be the
            # reference's pure-papangelou ranking)
            "score_map_blend": 2.0,
            # and detection-map backfill of chain-dropped peaks
            "backfill_threshold": 0.35,
        },
    }
    cfg.update(extra or {})
    return cfg


def test_mpp_manual_infer_eval(workspace):
    from mpp_cnn_rs_object_detection_tpu.mpp.mpp_model import MPPModel
    from mpp_cnn_rs_object_detection_tpu.utils.config import get_inference_path

    cfg = _mpp_config(
        "mpp_m",
        {
            "manual": {
                "threshold": 0.0,
                "Data": 0.5, "Prior": 0.5,
                "PositionEnergy": 0.8, "ShapeEnergy": 0.2,
                "RectangleOverlapEnergy": 0.6, "ShapeAlignmentEnergy": 0.05,
                "AreaPriorEnergy": 0.2,
            }
        },
    )
    model = MPPModel(cfg, phase="train", overwrite=True)
    model.train()
    assert os.path.exists(
        os.path.join(model.save_path, "energy_combination_model.json")
    )
    assert os.path.exists(os.path.join(model.save_path, "calibration.json"))

    model2 = MPPModel(cfg, load=True)
    model2.infer(subset="val", overwrite=True)
    results_dir = get_inference_path("mpp_m", "synth_m", "val")
    with open(os.path.join(results_dir, "0000_results.pkl"), "rb") as f:
        res = pickle.load(f)
    assert res["detection_type"] == "poly"
    assert res["detection_center"].shape[1] == 2
    model2.eval()
    assert os.path.exists(os.path.join(results_dir, "dota", "metrics0.25.json"))
    assert os.path.exists(
        os.path.join(results_dir, "dota-SV", "metrics0.25.json")
    )
    # detection quality sanity: at IoU 0.05 the MPP should find most synth
    # rectangles (they are high-contrast on a noise background)
    with open(os.path.join(results_dir, "dota", "metrics0.05.json")) as f:
        metrics = json.load(f)
    assert metrics["vehicle"]["ap"] > 0.1, metrics["vehicle"]["ap"]

    # resume replay: a second infer WITHOUT overwrite must reproduce both
    # DOTA translations (incl. -SV) from the existing result pickles
    from tests._dota_util import dota_snapshot

    first = dota_snapshot(results_dir)
    assert any(v.strip() for v in first.values())
    model2.infer(subset="val", overwrite=False)
    assert dota_snapshot(results_dir) == first


def test_mpp_ordering_criterion_train(workspace):
    from mpp_cnn_rs_object_detection_tpu.mpp.mpp_model import MPPModel

    cfg = _mpp_config(
        "mpp_log_m",
        {
            "energy_setup": "no-calibration",
            "energy_setup_params": {"ratio_prior": True},
            "ordering_criterion": {
                "n_epochs": 2,
                "samples_per_image": 4,
                "n_crops": 6,
                "optim": "adam",
                "learning_rate": 0.05,
                "weight_model_type": "logistic",
                "neg_pert_config": {"iter_per_point": 1.0},
            },
        },
    )
    model = MPPModel(cfg, phase="train", overwrite=True)
    model.train()
    assert model.energy_model is not None
    from mpp_cnn_rs_object_detection_tpu.mpp.combinators import (
        combiner_as_report_dict,
    )

    report = combiner_as_report_dict(model.energy_model)
    # weights moved away from init (1.0 everywhere)
    moved = [abs(v - 1.0) for k, v in report.items() if k.endswith("_weight")]
    assert max(moved) > 1e-3, report


def test_stale_cnn_results_are_regenerated(workspace):
    """A CNN result pickle older than its model's newest checkpoint must be
    deleted and re-inferred — resumed/extended trainings (the 256-epoch
    recipe) would otherwise silently feed the MPP maps from the previous
    training budget."""
    import time

    from mpp_cnn_rs_object_detection_tpu.mpp.mpp_model import (
        ensure_cnn_inference,
    )
    from mpp_cnn_rs_object_detection_tpu.utils.config import (
        get_inference_path,
    )

    ensure_cnn_inference("synth_m", "val", "pos_m", "shape_m")
    res_dir = get_inference_path("pos_m", "synth_m", "val")
    pkl = os.path.join(res_dir, "0000_results.pkl")
    assert os.path.exists(pkl)

    # fresh pickle: untouched
    ino0 = os.stat(pkl).st_ino
    mt0 = os.path.getmtime(pkl)
    ensure_cnn_inference("synth_m", "val", "pos_m", "shape_m")
    assert os.path.getmtime(pkl) == mt0 and os.stat(pkl).st_ino == ino0

    # backdate the pickle behind the checkpoint -> regenerated
    os.utime(pkl, (time.time() - 3600, time.time() - 3600))
    ensure_cnn_inference("synth_m", "val", "pos_m", "shape_m")
    assert os.path.getmtime(pkl) > mt0 - 3600 + 1


def test_mpp_exact_infer_config_stopping(workspace, caplog):
    """Config-driven early stop through ``MPPModel.infer``: an
    ``rjmcmc_params.stopping`` block is evaluated between exact-scene
    annealing segments (reference ``rjmcmc_sampler/stopping.py`` wiring)."""
    import logging

    from mpp_cnn_rs_object_detection_tpu.mpp.mpp_model import MPPModel

    cfg = _mpp_config(
        "mpp_mstop",
        {
            "manual": {
                "threshold": 0.0,
                "Data": 0.5, "Prior": 0.5,
                "PositionEnergy": 0.8, "ShapeEnergy": 0.2,
                "RectangleOverlapEnergy": 0.6, "ShapeAlignmentEnergy": 0.05,
                "AreaPriorEnergy": 0.2,
            }
        },
    )
    cfg["inference"]["scene_mode"] = "exact"
    cfg["inference"]["segment_size"] = 24
    # accept_rate <= 1.0 always holds -> fires right after the first segment,
    # proving the wiring without depending on chain convergence
    cfg["inference"]["rjmcmc_params"]["stopping"] = {
        "kind": "approval_rate", "target_rate": 1.0, "min_iter": 0,
    }
    model = MPPModel(cfg, phase="train", overwrite=True)
    model.train()
    model2 = MPPModel(cfg, load=True)
    with caplog.at_level(logging.INFO):
        model2.infer(subset="val", overwrite=True)
    assert any("stopping fired" in r.message for r in caplog.records)


def test_mpp_batched_exact_infer(workspace):
    """CLI-level batched exact inference: batch_scenes stacks the val scenes
    into one vmapped chain program and the per-scene post/export stage
    consumes the precomputed results."""
    from mpp_cnn_rs_object_detection_tpu.mpp.mpp_model import MPPModel
    from mpp_cnn_rs_object_detection_tpu.utils.config import get_inference_path

    cfg = _mpp_config(
        "mpp_mb",
        {
            "manual": {
                "threshold": 0.0,
                "Data": 0.5, "Prior": 0.5,
                "PositionEnergy": 0.8, "ShapeEnergy": 0.2,
                "RectangleOverlapEnergy": 0.6, "ShapeAlignmentEnergy": 0.05,
                "AreaPriorEnergy": 0.2,
            }
        },
    )
    cfg["inference"]["scene_mode"] = "exact"
    cfg["inference"]["batch_scenes"] = True
    model = MPPModel(cfg, phase="train", overwrite=True)
    model.train()
    model2 = MPPModel(cfg, load=True)
    model2.infer(subset="val", overwrite=True)
    model2.eval()
    results_dir = get_inference_path("mpp_mb", "synth_m", "val")
    with open(os.path.join(results_dir, "0000_results.pkl"), "rb") as f:
        res = pickle.load(f)
    assert res["detection_type"] == "poly"
    with open(os.path.join(results_dir, "dota", "metrics0.05.json")) as f:
        metrics = json.load(f)
    assert metrics["vehicle"]["ap"] > 0.1, metrics["vehicle"]["ap"]
