"""Baseline detectors (fasterrcnn HBB / bbavec OBB): train + infer + eval
round trip on synthetic data (SURVEY.md C29/C30)."""

import json
import os
import pickle

import numpy as np
import pytest


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    ws = tmp_path_factory.mktemp("det_ws")
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

    make_synth_dataset(name="synth_d", n_items=2, shape=(64, 64), n_rect=12, seed=5)
    yield ws
    os.chdir(old)


def _config(name, oriented):
    model = (
        {"depth": 18, "width": 8, "head_conv": 16, "down_ratio": 4,
         "dtype": "float32"}
        if oriented
        else {"depth": 18, "width": 8, "fpn_channels": 16, "box_hidden": 64,
              "anchor_sizes": (4, 8, 16, 32, 64), "pre_nms": 64,
              "post_nms_train": 16, "post_nms_infer": 32, "dtype": "float32"}
    )
    return {
        "model_name": name,
        "data_loader": {
            "dataset": "synth_d",
            "dataset_update_interval": 16,
            "patch_maker_params": {
                "patch_size": 32, "n_patches": 16, "max_objects": 16,
                "unf_sampler_weight": 0.5, "obj_sampler_weight": 0.5,
                "obj_sampler_sigma": 4,
            },
        },
        "trainer": {"n_epochs": 3, "batch_size": 4},
        "model": model,
        "loss": {"learning_rate": 2e-3},
    }


def test_fasterrcnn_hbb_roundtrip(workspace):
    from mpp_cnn_rs_object_detection_tpu.models.fasterrcnn_model import (
        FasterRCNNModel,
    )
    from mpp_cnn_rs_object_detection_tpu.utils.config import get_inference_path

    model = FasterRCNNModel(_config("frcnn_t", False), overwrite=True, train=True)
    model.train()
    m2 = FasterRCNNModel(_config("frcnn_t", False), load=True, train=False)
    m2.infer(subset="val", overwrite=True, min_confidence=0.05)
    results_dir = get_inference_path("frcnn_t", "synth_d", "val")
    with open(os.path.join(results_dir, "0000_results.pkl"), "rb") as f:
        res = pickle.load(f)
    assert res["detection_type"] == "bbox"
    m2.eval()
    assert os.path.exists(os.path.join(results_dir, "dota", "metrics0.25.json"))

    from tests._dota_util import dota_snapshot

    first = dota_snapshot(results_dir)
    assert any(v.strip() for v in first.values())
    m2.infer(subset="val", overwrite=False, min_confidence=0.05)
    assert dota_snapshot(results_dir) == first


def test_bbavec_obb_roundtrip(workspace):
    from mpp_cnn_rs_object_detection_tpu.models.fasterrcnn_model import BBAVecModel
    from mpp_cnn_rs_object_detection_tpu.utils.config import get_inference_path

    model = BBAVecModel(_config("bbavec_t", True), overwrite=True, train=True)
    model.train()
    m2 = BBAVecModel(_config("bbavec_t", True), load=True, train=False)
    m2.infer(subset="val", overwrite=True, min_confidence=0.05)
    results_dir = get_inference_path("bbavec_t", "synth_d", "val")
    with open(os.path.join(results_dir, "0000_results.pkl"), "rb") as f:
        res = pickle.load(f)
    assert res["detection_type"] == "poly"
    assert res["detection"].shape[1:] == (4, 2) or len(res["detection"]) == 0
    m2.eval()
    assert os.path.exists(os.path.join(results_dir, "dota", "metrics0.25.json"))

    from tests._dota_util import dota_snapshot

    first = dota_snapshot(results_dir)
    assert any(v.strip() for v in first.values())
    m2.infer(subset="val", overwrite=False, min_confidence=0.05)
    assert dota_snapshot(results_dir) == first
