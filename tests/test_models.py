"""End-to-end smoke tests of the CNN model layer on a tiny synthetic dataset:
train -> checkpoint -> infer -> result-pickle contract -> DOTA eval.
Covers SURVEY.md build-plan step 2/3 (posnet slice + shapenet handoff)."""

import json
import os
import pickle

import numpy as np
import pytest


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    ws = tmp_path_factory.mktemp("ws")
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

    make_synth_dataset(name="synth_t", n_items=2, shape=(64, 64), n_rect=12, seed=3)
    yield ws
    os.chdir(old)


def _pos_config(name="pos_tiny"):
    return {
        "model_name": name,
        "data_loader": {
            "dataset": "synth_t",
            "dataset_update_interval": 8,
            "patch_maker_params": {
                "patch_size": 32,
                "n_patches": 16,
                "unf_sampler_weight": 0.5,
                "obj_sampler_weight": 0.5,
                "obj_sampler_sigma": 4,
            },
        },
        "trainer": {"n_epochs": 1, "batch_size": 4},
        "div_clf_model": True,
        "model": {"hidden_dims": [8, 16]},
        "loss": {
            "learning_rate": 1e-3,
            "target_mode": "uvec",
            "max_distance": 8,
            "learn_mask": True,
            "compute_relevant": True,
            "balanced_mask_loss": True,
            "focal_loss": False,
            "vec_loss_on_prod": True,
            "bin_map_dil": 0.6,
        },
        "mappings": {"size_mapping_min": 0, "size_mapping_max": 16},
    }


def _shape_config(name="shape_tiny"):
    return {
        "model_name": name,
        "data_loader": {
            "dataset": "synth_t",
            "dataset_update_interval": 8,
            "patch_maker_params": {
                "patch_size": 32,
                "n_patches": 16,
                "unf_sampler_weight": 0.5,
                "obj_sampler_weight": 0.5,
                "obj_sampler_sigma": 4,
            },
        },
        "trainer": {"n_epochs": 1, "n_classes": 8, "batch_size": 4},
        "model": {"hidden_dims": [8, 16]},
        "loss": {"learning_rate": 1e-3, "mask_mode": "shapes"},
        "mappings": {"size_mapping_min": 0, "size_mapping_max": 16},
        "inference": {"pos_model": "pos_tiny"},
    }


def test_posnet_train_infer_eval(workspace):
    from mpp_cnn_rs_object_detection_tpu.models.posnet_model import PosNetModel

    model = PosNetModel(_pos_config(), overwrite=True, train=True)
    model.train()
    assert os.path.exists(os.path.join(model.save_path, "model.msgpack"))
    assert os.path.exists(os.path.join(model.save_path, "log.json"))

    model2 = PosNetModel(_pos_config(), load=True, train=False)
    model2.infer(subset="val", overwrite=True)
    from mpp_cnn_rs_object_detection_tpu.utils.config import get_inference_path

    results_dir = get_inference_path("pos_tiny", "synth_t", "val")
    with open(os.path.join(results_dir, "0000_results.pkl"), "rb") as f:
        res = pickle.load(f)
    assert res["detection_type"] == "center"
    assert res["detection_map"].shape == (64, 64)
    assert np.all(res["detection_map"] >= 0) and np.all(res["detection_map"] <= 1)
    model2.eval()  # writes metrics jsons
    assert os.path.exists(os.path.join(results_dir, "dota", "metrics0.50.json"))

    # resume replay: a second infer WITHOUT overwrite must reproduce the
    # DOTA translations from the existing pickles (not drop skipped images)
    from tests._dota_util import dota_snapshot

    first = dota_snapshot(results_dir)
    assert any(v.strip() for v in first.values())
    model2.infer(subset="val", overwrite=False)
    assert dota_snapshot(results_dir) == first


def test_shapenet_train_infer(workspace):
    from mpp_cnn_rs_object_detection_tpu.models.shapenet_model import ShapeNetModel

    model = ShapeNetModel(_shape_config(), overwrite=True, train=True)
    model.train()
    model2 = ShapeNetModel(_shape_config(), load=True, train=False)
    model2.infer(subset="val", overwrite=True, min_confidence=0.2)

    from mpp_cnn_rs_object_detection_tpu.utils.config import get_inference_path

    results_dir = get_inference_path("shape_tiny", "synth_t", "val")
    with open(os.path.join(results_dir, "0000_results.pkl"), "rb") as f:
        res = pickle.load(f)
    assert res["detection_type"] == "poly"
    assert len(res["output"]) == 3
    assert res["output"][0].shape == (1, 8, 64, 64)
    # per-pixel distributions sum to one
    np.testing.assert_allclose(res["output"][0][0].sum(axis=0), 1.0, atol=1e-4)
    assert len(res["mappings"]) == 3

    from tests._dota_util import dota_snapshot

    first = dota_snapshot(results_dir)
    assert any(v.strip() for v in first.values())
    model2.infer(subset="val", overwrite=False, min_confidence=0.2)
    assert dota_snapshot(results_dir) == first


def test_checkpoint_resume(workspace):
    from mpp_cnn_rs_object_detection_tpu.models.posnet_model import PosNetModel

    cfg = _pos_config("pos_resume")
    cfg["trainer"]["n_epochs"] = 1
    model = PosNetModel(cfg, overwrite=True, train=True)
    model.train()
    p0 = np.asarray(
        next(iter(model.state.params["net"].values()))["kernel"]
        if "kernel" in next(iter(model.state.params["net"].values()))
        else 0
    )
    model2 = PosNetModel(cfg, load=True, train=False)
    # restored params match saved params
    import jax

    leaves1 = jax.tree_util.tree_leaves(model.state.params)
    leaves2 = jax.tree_util.tree_leaves(model2.state.params)
    for a, b in zip(leaves1, leaves2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_posnet_device_pipeline_trains(workspace):
    """Device-resident pipeline (on-device augmentation + targets) trains and
    checkpoints through the same surface as the host pipeline."""
    from mpp_cnn_rs_object_detection_tpu.models.posnet_model import PosNetModel

    cfg = _pos_config("pos_tiny_dev")
    cfg["data_loader"]["device_pipeline"] = True
    cfg["trainer"]["n_epochs"] = 2
    model = PosNetModel(cfg, train=True, overwrite=True)
    model.train()
    assert os.path.exists(
        os.path.join(model.save_path, "model.msgpack")
    )
    log = json.load(open(os.path.join(model.save_path, "log.json")))
    assert len(log["train_loss"]) == 2
    assert np.isfinite(log["train_loss"][-1]) and np.isfinite(
        log["val_loss"][-1]
    )


def test_shapenet_device_pipeline_trains(workspace):
    from mpp_cnn_rs_object_detection_tpu.models.shapenet_model import (
        ShapeNetModel,
    )

    cfg = _shape_config("shape_tiny_dev")
    cfg["data_loader"]["device_pipeline"] = True
    cfg["trainer"]["n_epochs"] = 2
    model = ShapeNetModel(cfg, train=True, overwrite=True)
    model.train()
    assert os.path.exists(os.path.join(model.save_path, "model.msgpack"))
    log = json.load(open(os.path.join(model.save_path, "log.json")))
    assert len(log["train_loss"]) == 2 and np.isfinite(log["train_loss"][-1])


def test_infer_on_image_big_scene_pow2_pad(workspace):
    """Whole-image inference on a >256 scene pads to the square pow2 bucket
    (shared compile signature across a val split) and returns the original
    extent; the padded forward equals the tight-padded forward away from the
    pad-influenced bottom/right margin."""
    from mpp_cnn_rs_object_detection_tpu.models.posnet_model import PosNetModel
    from mpp_cnn_rs_object_detection_tpu.models.unet import infer_pad_hw

    assert infer_pad_hw(300, 290) == (512, 512)
    model = PosNetModel(_pos_config(), load=True, train=False)
    img = np.random.default_rng(5).random((300, 290, 3)).astype(np.float32)
    mask, vec = model.infer_on_image(img)
    assert mask.shape == (300, 290) and vec.shape == (300, 290, 2)
    assert len(model._infer_fn_cache) == 1
    assert (512, 512) in model._infer_fn_cache
    # a same-bucket second scene reuses the jitted forward
    img2 = np.random.default_rng(6).random((400, 330, 3)).astype(np.float32)
    model.infer_on_image(img2)
    assert len(model._infer_fn_cache) == 1


def test_checkpoint_restore_across_optimizer_change(tmp_path):
    """Checkpoints written under one optimizer stack restore (weights +
    epoch; optimizer reinitialised) into a model built with a different
    stack — round-4 regression: adding clip+schedule to the detectors broke
    inference restores of adam-era checkpoints."""
    import jax.numpy as jnp
    import optax

    from mpp_cnn_rs_object_detection_tpu.models.train_utils import (
        TrainState,
        load_checkpoint,
        save_checkpoint,
    )

    old = TrainState.create(
        {"params": {"w": jnp.ones((3,))}, "batch_stats": {}},
        optax.adam(1e-3),
    )
    save_checkpoint(str(tmp_path), old, epoch=7)
    path = str(tmp_path / "checkpoint_0007.msgpack")

    new_template = TrainState.create(
        {"params": {"w": jnp.zeros((3,))}, "batch_stats": {}},
        optax.chain(optax.clip_by_global_norm(1.0), optax.adam(1e-3)),
    )
    restored, epoch = load_checkpoint(path, new_template)
    assert epoch == 7
    assert float(restored.params["w"][0]) == 1.0

    # the matching-stack path still restores opt_state exactly
    same, epoch2 = load_checkpoint(
        path,
        TrainState.create(
            {"params": {"w": jnp.zeros((3,))}, "batch_stats": {}},
            optax.adam(1e-3),
        ),
    )
    assert epoch2 == 7 and float(same.params["w"][0]) == 1.0


def test_pixel_ce_label_smoothing():
    """Soft ordinal targets: sigma=0 is exact hard-CE parity; sigma>0
    prefers near-miss mass over far-miss mass, with cyclic wrap on the
    angle head (round-5 ratio/mark-quality lever)."""
    import jax.numpy as jnp

    from mpp_cnn_rs_object_detection_tpu.models.losses import pixel_ce_loss

    n_cls = 32
    tgt = jnp.zeros((1, 2, 2), jnp.int32)  # target bin 0 everywhere
    mask = jnp.full((1, 2, 2), 0.25, jnp.float32)

    def logits_peaked_at(b):
        z = jnp.full((1, 2, 2, n_cls), -5.0, jnp.float32)
        return z.at[..., b].set(5.0)

    # sigma=0 == hard CE, bit-for-bit
    for b in (0, 1, 16):
        hard = pixel_ce_loss([logits_peaked_at(b)], [tgt], mask)["loss"]
        soft0 = pixel_ce_loss([logits_peaked_at(b)], [tgt], mask,
                              label_smoothing_sigma=0.0)["loss"]
        assert float(hard) == float(soft0)

    # sigma>0 (non-cyclic head 0): near miss < far miss, exact hit smallest
    kw = dict(label_smoothing_sigma=1.0, cyclic_heads=())
    l_hit = pixel_ce_loss([logits_peaked_at(0)], [tgt], mask, **kw)["loss"]
    l_near = pixel_ce_loss([logits_peaked_at(1)], [tgt], mask, **kw)["loss"]
    l_far = pixel_ce_loss([logits_peaked_at(16)], [tgt], mask, **kw)["loss"]
    assert float(l_hit) < float(l_near) < float(l_far)

    # cyclic head: bin 31 is adjacent to target bin 0
    kwc = dict(label_smoothing_sigma=1.0, cyclic_heads=(0,))
    l_wrap = pixel_ce_loss([logits_peaked_at(31)], [tgt], mask, **kwc)["loss"]
    l_near_c = pixel_ce_loss([logits_peaked_at(1)], [tgt], mask, **kwc)["loss"]
    l_far_c = pixel_ce_loss([logits_peaked_at(16)], [tgt], mask, **kwc)["loss"]
    assert abs(float(l_wrap) - float(l_near_c)) < 1e-5
    assert float(l_wrap) < float(l_far_c)
